"""Label codec tests: frame math, strong/weak round trips, concat encoder."""

import numpy as np
import pandas as pd
import pytest

from desed_task_tpu.labels import (
    CatManyHotEncoder,
    ManyHotEncoder,
    find_contiguous_regions,
)

# DCASE frame grid: 10 s @ 16 kHz, hop 256, net pooling 4 -> 156 frames
ENC = ManyHotEncoder(
    labels=["Speech", "Dog", "Blender"],
    audio_len=10,
    frame_len=2048,
    frame_hop=256,
    net_pooling=4,
    fs=16000,
)


def test_n_frames_matches_reference_formula():
    # int(int(160000/256)/4) = int(625/4) = 156 (encoder.py:39-40)
    assert ENC.n_frames == 156


def test_time_frame_roundtrip_property(rng):
    # 156 frames * 4 pool * 256 hop / 16000 = 9.984 s: the frame grid covers
    # [0, 9.984]; times beyond that clip (matching the reference clip at
    # n_frames, encoder.py:71-74). Round trip is exact inside the grid.
    times = rng.uniform(0, 9.984, size=1000)
    frames = ENC._time_to_frame(times)
    back = ENC._frame_to_time(frames)
    np.testing.assert_allclose(back, times, atol=1e-9)
    assert ENC._frame_to_time(ENC._time_to_frame(9.999)) == pytest.approx(9.984)
    assert frames.min() >= 0 and frames.max() <= ENC.n_frames
    # clipping at the edges
    assert ENC._time_to_frame(99.0) == ENC.n_frames
    assert ENC._frame_to_time(1e9) == 10


def test_encode_strong_tuples_and_df_agree():
    events = [("Speech", 0.5, 2.0), ("Dog", 1.0, 1.5), ("Speech", 8.0, 10.0)]
    df = pd.DataFrame(events, columns=["event_label", "onset", "offset"])
    y1 = ENC.encode_strong(events)
    y2 = ENC.encode_strong_df(df)
    np.testing.assert_array_equal(y1, y2)
    assert y1.shape == (156, 3)
    # onset frame int(0.5*16000/256/4)=int(7.8125)=7; offset ceil(2*15.625)=ceil(31.25)=32
    assert y1[7, 0] == 1 and y1[6, 0] == 0
    assert y1[31, 0] == 1 and y1[32, 0] == 0


def test_encode_strong_confidence_and_weak_as_strong():
    y = ENC.encode_strong([("Dog", 0.0, 10.0, 0.25)])
    np.testing.assert_allclose(y[:, 1], 0.25)
    y2 = ENC.encode_strong(["Blender"])  # bare label -> active everywhere
    np.testing.assert_allclose(y2[:, 2], 1.0)
    assert (ENC.encode_strong("empty") == -1).all()


def test_weak_encode_decode():
    y = ENC.encode_weak(["Dog", "Blender"])
    np.testing.assert_array_equal(y, [0, 1, 1])
    assert ENC.decode_weak(y) == ["Dog", "Blender"]
    assert (ENC.encode_weak("empty") == -1).all()
    np.testing.assert_array_equal(ENC.encode_weak("Dog,Speech"), [1, 1, 0])


def test_decode_strong_roundtrip():
    events = [("Speech", 0.512, 2.048), ("Dog", 4.096, 5.12)]
    y = ENC.encode_strong(events)
    decoded = ENC.decode_strong(y)
    assert len(decoded) == 2
    by_label = {d[0]: d for d in decoded}
    # 0.512 s = exactly frame 8; decode maps frame edges back to seconds
    np.testing.assert_allclose(by_label["Speech"][1], 0.512, atol=0.064)
    np.testing.assert_allclose(by_label["Speech"][2], 2.048, atol=0.064)
    np.testing.assert_allclose(by_label["Dog"][1], 4.096, atol=0.064)


def test_find_contiguous_regions():
    a = np.array([1, 1, 0, 0, 1, 0, 1, 1, 1])
    np.testing.assert_array_equal(
        find_contiguous_regions(a), [[0, 2], [4, 5], [6, 9]]
    )
    assert find_contiguous_regions(np.zeros(5)).shape == (0, 2)
    np.testing.assert_array_equal(find_contiguous_regions(np.ones(3)), [[0, 3]])


def test_cat_encoder_dedup_and_state_dict():
    enc2 = ManyHotEncoder(["Dog", "Cat"], 10, 2048, 256, 4, 16000)
    cat = CatManyHotEncoder([ENC, enc2])
    assert cat.labels == ["Speech", "Dog", "Blender", "Cat"]
    assert cat.n_frames == 156
    restored = ManyHotEncoder.load_state_dict(cat.state_dict())
    assert restored.labels == cat.labels and restored.n_frames == 156
    with pytest.raises(AssertionError):
        CatManyHotEncoder(
            [ENC, ManyHotEncoder(["X"], 10, 2048, 128, 4, 16000)]
        )
    with pytest.raises(RuntimeError):
        CatManyHotEncoder([ENC, enc2], allow_same_classes=False)
