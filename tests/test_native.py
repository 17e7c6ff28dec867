"""Native C++ wav loader: build, parity with the Python reader, batch crops."""

import numpy as np
import pytest

from desed_task_tpu.data import read_wav, write_wav
from desed_task_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain to build native loader"
)


def test_native_decode_matches_python(tmp_path, rng):
    x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    write_wav(tmp_path / "a.wav", x, 16000)
    y_py, sr_py = read_wav(tmp_path / "a.wav")
    y_nat, sr_nat = native.decode(tmp_path / "a.wav")
    assert sr_nat == sr_py == 16000
    np.testing.assert_allclose(y_nat, y_py, atol=1e-7)
    # stereo downmix parity
    st = np.stack([x, -0.5 * x])
    write_wav(tmp_path / "b.wav", st, 8000)
    y_nat2, _ = native.decode(tmp_path / "b.wav")
    y_py2, _ = read_wav(tmp_path / "b.wav")
    np.testing.assert_allclose(y_nat2, y_py2.mean(0), atol=1e-6)


def test_native_info(tmp_path, rng):
    x = (rng.standard_normal(12345) * 0.1).astype(np.float32)
    write_wav(tmp_path / "c.wav", x, 22050)
    rate, ch, frames = native.info(tmp_path / "c.wav")
    assert (rate, ch, frames) == (22050, 1, 12345)


def test_native_batch_pad_and_crop(tmp_path, rng):
    short = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    long = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    write_wav(tmp_path / "short.wav", short, 16000)
    write_wav(tmp_path / "long.wav", long, 16000)
    paths = [tmp_path / "short.wav", tmp_path / "long.wav"]
    # compare against the PCM16-quantized decode, not the raw floats
    short_q, _ = read_wav(tmp_path / "short.wav")
    long_q, _ = read_wav(tmp_path / "long.wav")
    out, onsets = native.decode_batch(paths, 16000, test_mode=True)
    assert out.shape == (2, 16000)
    # short: padded with zeros
    np.testing.assert_allclose(out[0, :8000], short_q, atol=1e-7)
    assert (out[0, 8000:] == 0).all()
    assert onsets[0] == 0
    # long in test mode: left crop
    np.testing.assert_allclose(out[1], long_q[:16000], atol=1e-7)
    assert onsets[1] == 0
    # train mode: random crop with recorded onset, deterministic by seed
    out1, on1 = native.decode_batch(paths, 16000, test_mode=False, seed=5)
    out2, on2 = native.decode_batch(paths, 16000, test_mode=False, seed=5)
    np.testing.assert_array_equal(out1, out2)
    np.testing.assert_array_equal(on1, on2)
    s = int(on1[1])
    np.testing.assert_allclose(out1[1], long_q[s : s + 16000], atol=1e-7)


def test_native_batch_throughput_smoke(tmp_path, rng):
    paths = []
    for i in range(16):
        x = (rng.standard_normal(160000) * 0.1).astype(np.float32)
        p = tmp_path / f"f{i}.wav"
        write_wav(p, x, 16000)
        paths.append(p)
    out, _ = native.decode_batch(paths, 160000, test_mode=True, n_threads=4)
    assert out.shape == (16, 160000)
    assert np.isfinite(out).all()
