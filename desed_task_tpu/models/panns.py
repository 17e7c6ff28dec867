"""PANNs CNN14-16k embedder (flax.linen), TPU-native.

Ground-up JAX implementation of the frozen PANNs CNN14 the 2022 recipe uses
for pretrained embeddings (recipes/dcase2022_task4_baseline/local/panns/
models.py: Cnn14_16k :161-278, ConvBlock :27-76). Semantics matched:

  * torchlibrosa front-end: power spectrogram (hann 512, hop 160, center,
    reflect) -> librosa mel (64 bins, slaney scale + norm, fmin 50,
    fmax 8000) -> power_to_db (10*log10, amin 1e-10, ref 1.0, no top_db)
    (models.py:182-204).
  * bn0 BatchNorm over the mel-bin axis (models.py:240-242).
  * 6 double-conv blocks (3x3 conv no-bias + BN + ReLU, x2, then avg pool)
    64->128->256->512->1024->2048 channels (models.py:251-264).
  * outputs: "frame" = block-3 output reshaped to [B, 2048, T/8]
    (chan x freq flattened, models.py:271-274); "global" = block-6 features
    mean over freq then max+mean over time -> [B, 2048] (models.py:266-270).

Inference-only (the reference uses it strictly as a frozen embedding
extractor; fc_audioset removed, models.py:225-226).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.frontend import MelConfig, amplitude_to_db, mel_spectrogram

PANNS_MEL = MelConfig(
    sample_rate=16000,
    n_fft=512,
    win_length=512,
    hop_length=160,
    f_min=50.0,
    f_max=8000.0,
    n_mels=64,
    power=2.0,
    window="hann",
    periodic_window=True,  # torchlibrosa uses scipy/librosa periodic hann
    mel_scale="slaney",
    mel_norm="slaney",
    amin=1e-10,
    db_clamp_min=None,
    db_clamp_max=None,
)


class ConvBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, pool_size=(2, 2), train: bool = False):
        for i in (1, 2):
            x = nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        if pool_size != (1, 1):
            x = nn.avg_pool(x, pool_size, strides=pool_size, padding="VALID")
        return x


class Cnn14_16k(nn.Module):
    """waveform [B, N] -> {"global": [B, 2048], "frame": [B, 2048, T/8]}."""

    @nn.compact
    def __call__(self, audio, train: bool = False):
        mel = mel_spectrogram(audio, PANNS_MEL)  # [B, 64, T]
        logmel = amplitude_to_db(mel, PANNS_MEL)
        x = jnp.swapaxes(logmel, 1, 2)[..., None]  # [B, T, 64, 1] NHWC
        # bn0 normalizes over the 64 mel bins (reference transposes mels into
        # the channel axis, models.py:240-242): swap mels to the feature axis
        x = jnp.swapaxes(x, -1, -2)  # [B, T, 1, 64]
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn0"
        )(x)
        x = jnp.swapaxes(x, -1, -2)  # [B, T, 64, 1]

        x = ConvBlock(64, name="conv_block1")(x, train=train)
        x = ConvBlock(128, name="conv_block2")(x, train=train)
        x = ConvBlock(256, name="conv_block3")(x, train=train)
        frame = x  # [B, T/8, 64/8, 256]
        x = ConvBlock(512, name="conv_block4")(x, train=train)
        x = ConvBlock(1024, name="conv_block5")(x, train=train)
        x = ConvBlock(2048, name="conv_block6")(x, pool_size=(1, 1), train=train)

        x = x.mean(axis=2)  # mean over freq -> [B, T', 2048]
        global_emb = x.max(axis=1) + x.mean(axis=1)  # [B, 2048]
        bsz, t8, f8, ch = frame.shape
        # torch: frame_embedding [B, 256, T/8, 8].transpose(2, -1)
        #   -> [B, 256, 8, T/8].reshape(B, 2048, T/8): channel-major over
        # (chan, freq); our NHWC frame -> [B, ch, f8, t8] then flatten
        frame_out = jnp.moveaxis(frame, (3, 2, 1), (1, 2, 3)).reshape(
            bsz, ch * f8, t8
        )
        return {"global": global_emb, "frame": frame_out}
