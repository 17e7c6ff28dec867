"""TDCN++ separator + MixIT objective (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from desed_task_tpu.models.tdcn import TDCNPP
from desed_task_tpu.training.mixit import (
    _assignments,
    mixit_loss,
    mixture_of_mixtures,
    neg_thresholded_snr,
)


def tiny_model(n_src=4):
    return TDCNPP(
        n_src=n_src, enc_dim=32, win=16, bn_dim=16, h_dim=32,
        n_blocks=3, n_repeats=2,
    )


def test_forward_shapes_and_mixture_consistency():
    model = tiny_model()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 800)),
                    jnp.float32) * 0.1
    v = model.init(jax.random.key(0), x)
    s = model.apply(v, x)
    assert s.shape == (2, 4, 800)
    # mixture consistency: sources sum exactly to the input mixture
    np.testing.assert_allclose(np.asarray(s.sum(1)), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


def test_residual_scales_decay():
    model = tiny_model()
    v = model.init(jax.random.key(0), jnp.zeros((1, 400), jnp.float32))
    s0 = float(v["params"]["block_r0_b0"]["res_scale"][0])
    s5 = float(v["params"]["block_r1_b2"]["res_scale"][0])
    assert s0 == pytest.approx(0.9 ** 0)
    assert s5 == pytest.approx(0.9 ** 5)


def test_assignment_enumeration():
    A = _assignments(3)
    assert A.shape == (8, 2, 3)
    assert np.all(A.sum(1) == 1.0)  # each source goes to exactly one mixture
    assert len({a.tobytes() for a in A}) == 8


def test_mixit_picks_true_partition():
    rng = np.random.default_rng(1)
    s = rng.standard_normal((2, 4, 1000)).astype(np.float32)
    est = jnp.asarray(s)
    # mixtures built from sources {0, 2} and {1, 3}
    m1 = s[:, 0] + s[:, 2]
    m2 = s[:, 1] + s[:, 3]
    mixes = jnp.asarray(np.stack([m1, m2], 1))
    loss, idx = mixit_loss(est, mixes)
    # perfect remix exists -> loss at the SNR cap (-30 dB x 2 mixtures)
    assert float(loss) == pytest.approx(-60.0, abs=0.5)
    A = _assignments(4)[np.asarray(idx)]
    np.testing.assert_array_equal(A[0, 0], [1, 0, 1, 0])


def test_neg_snr_perfect_and_noisy():
    t = jnp.ones((1, 1000))
    assert float(neg_thresholded_snr(t, t)[0]) == pytest.approx(-30.0, abs=1e-3)
    bad = float(neg_thresholded_snr(t, jnp.zeros_like(t))[0])
    assert bad > -1.0


@pytest.mark.slow
def test_mixit_training_step_learns():
    rng = np.random.default_rng(2)
    t = np.arange(1600) / 16000.0
    tones = np.stack([np.sin(2 * np.pi * f * t) for f in (400, 900, 1700, 2600)])
    clips = (tones + 0.05 * rng.standard_normal(tones.shape)).astype(np.float32)
    audio = jnp.asarray(clips)  # 4 "mixtures" (single sources here)
    moms, pairs = mixture_of_mixtures(audio)

    model = tiny_model()
    params = model.init(jax.random.key(0), moms)

    def loss_fn(p):
        est = model.apply(p, moms)
        loss, _ = mixit_loss(est, pairs)
        return loss

    tx = optax.adam(1e-3)
    opt = tx.init(params)
    l0 = float(loss_fn(params))
    step = jax.jit(lambda p, o: _update(p, o, loss_fn, tx))
    for _ in range(30):
        params, opt, l = step(params, opt)
    assert float(l) < l0 - 1.0  # separation objective improves


def _update(p, o, loss_fn, tx):
    l, g = jax.value_and_grad(loss_fn)(p)
    up, o = tx.update(g, o, p)
    return optax.apply_updates(p, up), o, l


def test_jax_separation_model_interface(tmp_path):
    """JaxSeparationModel matches the TF1 runner's interface."""
    from desed_task_tpu.data import write_wav
    from desed_task_tpu.tools.separation import JaxSeparationModel

    rng = np.random.default_rng(3)
    (tmp_path / "in").mkdir()
    for i in range(2):
        write_wav(tmp_path / "in" / f"m{i}.wav",
                  rng.standard_normal(3200).astype(np.float32) * 0.1, 16000)
    model = JaxSeparationModel(
        None, n_src=2, enc_dim=16, win=16, bn_dim=8, h_dim=16,
        n_blocks=2, n_repeats=1,
    )
    out = model.separate(np.zeros(1600, np.float32))
    assert out.shape == (2, 1600)
    n = model.separate_folder(tmp_path / "in", tmp_path / "out")
    assert n == 2
    assert len(list((tmp_path / "out").glob("*_src*.wav"))) == 4
