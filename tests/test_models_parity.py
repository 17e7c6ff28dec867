"""Golden parity tests: our flax models vs torch / the reference CRNN.

Strategy (SURVEY.md §4): the reference repo ships no tests; we use its model
code (run on random weights, CPU torch, eval mode) as a golden oracle for our
TPU-native reimplementation, via the weight converter in models/torch_convert.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desed_task_tpu.models import CRNN, BidirectionalGRU
from desed_task_tpu.models.torch_convert import (
    convert_crnn_state_dict,
    convert_gru_state_dict,
)

from _reference_loader import load_reference_crnn_module, reference_available

torch = pytest.importorskip("torch")


def test_bigru_matches_torch_gru(rng):
    torch.manual_seed(0)
    B, T, IN, H, L = 3, 17, 12, 8, 2
    ref = torch.nn.GRU(IN, H, num_layers=L, bidirectional=True, batch_first=True)
    x = rng.standard_normal((B, T, IN)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x))
    model = BidirectionalGRU(hidden=H, num_layers=L)
    params = convert_gru_state_dict(ref.state_dict())
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-5)


def _jax_crnn_kwargs(nclass=10, **over):
    kw = dict(
        nclass=nclass,
        attention=True,
        activation="glu",
        dropout=0.5,
        n_RNN_cell=32,
        n_layers_RNN=2,
        kernel_size=[3, 3, 3],
        padding=[1, 1, 1],
        stride=[1, 1, 1],
        nb_filters=[16, 16, 32],
        pooling=[[2, 4], [2, 4], [1, 4]],
    )
    kw.update(over)
    return kw


def _ref_crnn(**kw):
    mod = load_reference_crnn_module()
    torch.manual_seed(42)
    ref = mod.CRNN(**kw)
    ref.eval()
    return ref


@pytest.mark.skipif(not reference_available(), reason="reference checkout absent")
@pytest.mark.parametrize("activation", ["glu", "relu", "cg", "leakyrelu"])
def test_crnn_matches_reference_eval(activation, rng):
    kw = _jax_crnn_kwargs(activation=activation)
    ref = _ref_crnn(**kw)
    B, MELS, T = 2, 64, 100
    x = rng.standard_normal((B, MELS, T)).astype(np.float32)
    with torch.no_grad():
        ref_strong, ref_weak = ref(torch.from_numpy(x))
    model = CRNN(**kw)
    variables = convert_crnn_state_dict(ref.state_dict())
    strong, weak = model.apply(variables, jnp.asarray(x), train=False)
    assert strong.shape == ref_strong.shape and weak.shape == ref_weak.shape
    np.testing.assert_allclose(np.asarray(strong), ref_strong.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(weak), ref_weak.numpy(), atol=3e-5)


@pytest.mark.skipif(not reference_available(), reason="reference checkout absent")
def test_crnn_classes_mask_matches_reference(rng):
    kw = _jax_crnn_kwargs(nclass=6)
    ref = _ref_crnn(**kw)
    B, MELS, T = 3, 64, 80
    x = rng.standard_normal((B, MELS, T)).astype(np.float32)
    cmask = rng.integers(0, 2, size=(B, 6)).astype(bool)
    cmask[:, 0] = True  # at least one valid class
    with torch.no_grad():
        ref_strong, ref_weak = ref(
            torch.from_numpy(x), classes_mask=torch.from_numpy(cmask)
        )
    model = CRNN(**kw)
    variables = convert_crnn_state_dict(ref.state_dict())
    strong, weak = model.apply(
        variables, jnp.asarray(x), classes_mask=jnp.asarray(cmask), train=False
    )
    np.testing.assert_allclose(np.asarray(strong), ref_strong.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(weak), ref_weak.numpy(), atol=3e-5)


@pytest.mark.skipif(not reference_available(), reason="reference checkout absent")
@pytest.mark.parametrize("agg", ["global", "frame", "interpolate", "pool1d"])
def test_crnn_embedding_fusion_matches_reference(agg, rng):
    emb_size, emb_frames = 24, 31
    kw = _jax_crnn_kwargs(
        use_embeddings=True,
        embedding_size=emb_size,
        embedding_type="frame",
        aggregation_type=agg,
        # the reference hard-codes the frame encoder GRU hidden to 512
        # (CRNN.py:131-136) while sizing shrink_emb by frame_emb_enc_dim;
        # any value != 512 crashes there, so parity is only defined at 512.
        frame_emb_enc_dim=512,
    )
    ref = _ref_crnn(**kw)
    B, MELS, T = 2, 64, 100
    x = rng.standard_normal((B, MELS, T)).astype(np.float32)
    if agg == "global":
        emb = rng.standard_normal((B, emb_size)).astype(np.float32)
    else:
        emb = rng.standard_normal((B, emb_size, emb_frames)).astype(np.float32)
    model = CRNN(**kw)
    variables = convert_crnn_state_dict(ref.state_dict())
    strong, weak = model.apply(
        variables, jnp.asarray(x), embeddings=jnp.asarray(emb), train=False
    )
    if agg == "global":
        # the reference's own "global" fusion crashes on an undefined variable
        # (CRNN.py:285-301); we only check our path runs and is sane.
        assert strong.shape == (B, 6 if kw["nclass"] == 6 else 10, 25)
        assert np.isfinite(np.asarray(strong)).all()
        return
    with torch.no_grad():
        ref_strong, ref_weak = ref(torch.from_numpy(x), embeddings=torch.from_numpy(emb))
    # fp32 accumulation through the 1024-wide frame-encoder GRU dominates
    tol = 3e-4 if agg == "frame" else 5e-5
    np.testing.assert_allclose(np.asarray(strong), ref_strong.numpy(), atol=tol)
    np.testing.assert_allclose(np.asarray(weak), ref_weak.numpy(), atol=tol)


@pytest.mark.skipif(not reference_available(), reason="reference checkout absent")
def test_crnn_2024_flagship_shapes(rng):
    """Full 2024 config (pretrained.yaml net section) without embeddings run
    against the reference for output parity on the 10 s frame grid."""
    kw = dict(
        nclass=27,
        attention=True,
        activation="glu",
        dropout=0.5,
        n_RNN_cell=192,
        n_layers_RNN=1,
        kernel_size=[3] * 7,
        padding=[1] * 7,
        stride=[1] * 7,
        nb_filters=[16, 32, 64, 128, 128, 128, 128],
        pooling=[[2, 2], [2, 2], [1, 2], [1, 2], [1, 2], [1, 2], [1, 2]],
        use_embeddings=True,
        embedding_size=768,
        aggregation_type="pool1d",
        dropstep_recurrent=0.3,
        dropstep_recurrent_len=16,
    )
    ref = _ref_crnn(**kw)
    B = 2
    x = rng.standard_normal((B, 128, 626)).astype(np.float32)
    emb = rng.standard_normal((B, 768, 496)).astype(np.float32)
    with torch.no_grad():
        ref_strong, ref_weak = ref(torch.from_numpy(x), embeddings=torch.from_numpy(emb))
    assert ref_strong.shape == (B, 27, 156)
    model = CRNN(**kw)
    variables = convert_crnn_state_dict(ref.state_dict())
    strong, weak = model.apply(
        variables, jnp.asarray(x), embeddings=jnp.asarray(emb), train=False
    )
    np.testing.assert_allclose(np.asarray(strong), ref_strong.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(weak), ref_weak.numpy(), atol=5e-5)


def test_crnn_train_mode_runs_with_rngs(rng):
    """Train-mode smoke: dropout + specaugment + dropstep with PRNG keys."""
    kw = _jax_crnn_kwargs(
        specaugm_t_p=0.5, specaugm_f_p=0.5, dropstep_recurrent=0.3
    )
    model = CRNN(**kw)
    x = jnp.asarray(rng.standard_normal((2, 64, 100)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1), "augment": jax.random.key(2)},
        x,
        train=True,
    )
    (strong, weak), updates = model.apply(
        variables,
        x,
        train=True,
        rngs={"dropout": jax.random.key(3), "augment": jax.random.key(4)},
        mutable=["batch_stats"],
    )
    assert strong.shape[0] == 2 and np.isfinite(np.asarray(strong)).all()
    assert "batch_stats" in updates


def test_bilstm_matches_torch_lstm(rng):
    """BidirectionalLSTM (RNN.py:33-53 parity): BiLSTM(h//2 per direction)
    followed by a linear embedding."""
    from desed_task_tpu.models import BidirectionalLSTM
    from desed_task_tpu.models.torch_convert import _np

    torch.manual_seed(3)
    B, T, IN, H, OUT = 2, 9, 6, 8, 5
    ref_rnn = torch.nn.LSTM(IN, H // 2, bidirectional=True, batch_first=True)
    ref_fc = torch.nn.Linear(H, OUT)
    x = rng.standard_normal((B, T, IN)).astype(np.float32)
    with torch.no_grad():
        rec, _ = ref_rnn(torch.from_numpy(x))
        ref_out = ref_fc(rec).numpy()
    model = BidirectionalLSTM(hidden=H, n_out=OUT, num_layers=1)
    params = {
        "l0_fwd": {
            "weight_ih": _np(ref_rnn.weight_ih_l0),
            "weight_hh": _np(ref_rnn.weight_hh_l0),
            "bias_ih": _np(ref_rnn.bias_ih_l0),
            "bias_hh": _np(ref_rnn.bias_hh_l0),
        },
        "l0_bwd": {
            "weight_ih": _np(ref_rnn.weight_ih_l0_reverse),
            "weight_hh": _np(ref_rnn.weight_hh_l0_reverse),
            "bias_ih": _np(ref_rnn.bias_ih_l0_reverse),
            "bias_hh": _np(ref_rnn.bias_hh_l0_reverse),
        },
        "Dense_0": {"kernel": _np(ref_fc.weight).T, "bias": _np(ref_fc.bias)},
    }
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)


def test_fast_conv3x3_custom_vjp_exact():
    """Folded / shift-add conv paths (custom VJP): forward AND all gradients
    match the plain XLA conv to fp32 tolerance (the round-1 versions were
    forward-only; docs/performance.md)."""
    import jax
    import jax.numpy as jnp

    from desed_task_tpu.models.cnn import _plain_conv3x3, fast_conv3x3

    rng = np.random.default_rng(5)
    for path, (B, T, F, Cin, Cout) in [
        ("folded", (3, 16, 8, 16, 32)),
        ("folded", (2, 12, 4, 128, 128)),
        ("shift_add", (3, 16, 24, 1, 16)),
        ("shift_add", (2, 12, 128, 4, 8)),
    ]:
        x = jnp.asarray(rng.standard_normal((B, T, F, Cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32)
        dy = jnp.asarray(rng.standard_normal((B, T, F, Cout)), jnp.float32)

        ref = lambda x_, k_, b_: _plain_conv3x3(x_, k_) + b_
        fast = lambda x_, k_, b_: fast_conv3x3(x_, k_, b_, path)

        np.testing.assert_allclose(
            np.asarray(fast(x, k, b)), np.asarray(ref(x, k, b)),
            rtol=1e-5, atol=1e-5,
        )
        loss_ref = lambda *a: jnp.vdot(ref(*a), dy)
        loss_fast = lambda *a: jnp.vdot(fast(*a), dy)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
        g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(x, k, b)
        for a, c in zip(g_ref, g_fast):
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(a), rtol=1e-4, atol=1e-4,
            )


def test_bigru_fused_directions_matches_unfused():
    """The single-scan bidirectional path is numerically equivalent to the
    two-scan path (same params, same gate math)."""
    import numpy as np

    from desed_task_tpu.models.rnn import BidirectionalGRU

    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((3, 23, 16)), jnp.float32)
    fused = BidirectionalGRU(hidden=8, num_layers=2, fused_directions=True)
    plain = BidirectionalGRU(hidden=8, num_layers=2, fused_directions=False)
    v = fused.init(jax.random.key(0), x)
    # identical parameter trees
    ref_tree = jax.tree_util.tree_map(lambda a: a.shape, plain.init(jax.random.key(0), x))
    assert jax.tree_util.tree_map(lambda a: a.shape, v) == ref_tree
    y_f = fused.apply(v, x)
    y_p = plain.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p),
                               rtol=1e-5, atol=1e-6)
