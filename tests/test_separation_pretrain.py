"""SI-SNR metrics + MixIT pretraining loop (CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from desed_task_tpu.metrics.separation import (
    best_assignment_si_snr,
    si_snr,
    si_snr_improvement,
)


def test_si_snr_known_values():
    rng = np.random.default_rng(0)
    t = rng.standard_normal(8000).astype(np.float32)
    # perfect estimate: bounded only by eps
    assert float(si_snr(jnp.asarray(t), jnp.asarray(t))) > 60.0
    # scale invariance: 0.1x the target scores the same as the target
    val = float(si_snr(jnp.asarray(t), jnp.asarray(0.1 * t)))
    assert val > 60.0
    # known SNR: est = t + n with ||n||^2 = ||t||^2 / 10 -> ~10 dB
    n = rng.standard_normal(8000).astype(np.float32)
    n = n - n.mean()
    tc = t - t.mean()
    n = n - (n @ tc) / (tc @ tc) * tc  # orthogonal to target
    n *= np.linalg.norm(tc) / np.linalg.norm(n) / np.sqrt(10.0)
    got = float(si_snr(jnp.asarray(t), jnp.asarray(t + n)))
    assert got == pytest.approx(10.0, abs=0.1)


def test_best_assignment_recovers_permutation():
    rng = np.random.default_rng(1)
    src = rng.standard_normal((3, 2, 4000)).astype(np.float32)
    # estimates: 4 outputs, true sources hidden at slots 3 and 1 (swapped),
    # other slots near-silent garbage
    est = 0.001 * rng.standard_normal((3, 4, 4000)).astype(np.float32)
    est[:, 3] = src[:, 0]
    est[:, 1] = src[:, 1]
    scored = best_assignment_si_snr(jnp.asarray(src), jnp.asarray(est))
    assert np.all(np.asarray(scored) > 40.0)


def test_si_snri_positive_for_good_separation():
    rng = np.random.default_rng(2)
    src = rng.standard_normal((4, 2, 4000)).astype(np.float32)
    mix = src.sum(1)
    perfect = np.concatenate(
        [src, np.zeros((4, 2, 4000), np.float32)], axis=1
    )
    imp = si_snr_improvement(
        jnp.asarray(src), jnp.asarray(perfect), jnp.asarray(mix)
    )
    assert np.all(np.asarray(imp) > 40.0)
    # identity "separation" (copies of the mixture) improves nothing
    mix_est = np.repeat(mix[:, None], 2, axis=1)
    flat = si_snr_improvement(
        jnp.asarray(src), jnp.asarray(mix_est), jnp.asarray(mix)
    )
    assert np.all(np.asarray(flat) <= 1e-3)


@pytest.mark.slow
def test_pretrain_separator_end_to_end(tmp_path):
    """Tiny MixIT pretraining run: loss drops, best checkpoint loads into the
    JaxSeparationModel used by the 2021 run_separation CLI."""
    from desed_task_tpu.data.audio_io import write_wav
    from desed_task_tpu.tools.separation import JaxSeparationModel
    from desed_task_tpu.training.separation_pretrain import (
        MixITPretrainConfig,
        pretrain_separator,
    )

    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        d = tmp_path / split
        d.mkdir()
        for i in range(n):
            # tonal + noise material so separation is learnable in principle
            t = np.arange(4000) / 16000.0
            f = rng.uniform(200, 2000)
            sig = 0.2 * np.sin(2 * np.pi * f * t)
            sig += 0.05 * rng.standard_normal(4000)
            write_wav(d / f"{split}{i}.wav", sig.astype(np.float32), 16000)

    cfg = MixITPretrainConfig(
        n_src=3, segment_len=2000, batch_mixtures=4, steps_per_epoch=4,
        n_epochs=3, val_pairs=4, lr=1e-3,
    )
    model_kwargs = dict(enc_dim=16, win=16, bn_dim=8, h_dim=16,
                        n_blocks=2, n_repeats=1)
    params, best = pretrain_separator(
        [tmp_path / "train"], [tmp_path / "val"], tmp_path / "exp", cfg,
        model_kwargs=model_kwargs,
    )
    assert best.exists()
    import pandas as pd

    df = pd.read_csv(tmp_path / "exp" / "metrics.csv")
    losses = df[df.name == "train/mixit_loss"].value.to_numpy()
    assert len(losses) == 3 and np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # the objective is actually optimized

    sep = JaxSeparationModel(str(best), n_src=3, **model_kwargs)
    out = sep.separate(rng.standard_normal(3000).astype(np.float32))
    assert out.shape == (3, 3000)
