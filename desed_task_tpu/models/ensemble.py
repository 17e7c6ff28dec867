"""Separation-ensemble SED model (2021 recipe).

Re-design of the reference EnsembleModel
(recipes/dcase2021_task4_baseline/finetune_on_separated.py:24-70): a CRNN is
run on each separated source of a clip, per-source strong/weak predictions
are summed and clamped to 1 ("multisrc" branch), and a learned scalar q in
[0, 1] blends them with a frozen monaural CRNN applied to the mixture:

    p = q * p_multisrc + (1 - q) * p_mixture

The multisrc trainer semantics (sepsed_trainer.py:215-223) are covered by
`detect_multisrc`: features arrive as [B, n_src, n_mels, T]; the mixture
branch consumes the source-sum, the multisrc branch flattens sources into
the batch axis.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .crnn import CRNN


def flatten_sources(feats: jnp.ndarray) -> jnp.ndarray:
    """[B, S, F, T] -> [B*S, F, T]."""
    b, s = feats.shape[:2]
    return feats.reshape(b * s, *feats.shape[2:])


def unflatten_sum_clamp(strong, weak, n_src: int):
    """Per-source preds -> clip preds: sum over sources, clamp to [0, 1]
    (finetune_on_separated.py:40-52)."""
    bs = strong.shape[0] // n_src
    strong = strong.reshape(bs, n_src, *strong.shape[1:]).sum(1)
    weak = weak.reshape(bs, n_src, *weak.shape[1:]).sum(1)
    return jnp.clip(strong, 0.0, 1.0), jnp.clip(weak, 0.0, 1.0)


class EnsembleModel(nn.Module):
    """Blend of a multisrc CRNN (trainable) and a frozen monaural CRNN."""

    multisrc_crnn: CRNN
    monaural_crnn: CRNN
    init_q: float = 0.5

    @nn.compact
    def __call__(
        self,
        sources: jnp.ndarray,  # [B, S, n_mels, T] separated-source features
        mixture: jnp.ndarray,  # [B, n_mels, T] mixture features
        monaural_variables: Optional[dict] = None,  # frozen params+stats
        train: bool = False,
    ):
        n_src = sources.shape[1]
        strong_s, weak_s = self.multisrc_crnn(
            flatten_sources(sources), train=train
        )
        strong_ms, weak_ms = unflatten_sum_clamp(strong_s, weak_s, n_src)

        q = nn.sigmoid(
            self.param("q_logit", nn.initializers.constant(0.0), ())
        )  # learned blend in (0, 1)

        if monaural_variables is not None:
            strong_m, weak_m = self.monaural_crnn.apply(
                monaural_variables, mixture, train=False
            )
            strong = q * strong_ms + (1 - q) * strong_m
            weak = q * weak_ms + (1 - q) * weak_m
        else:
            strong, weak = strong_ms, weak_ms
        return strong, weak
