"""Source-separation preprocessing (2021 recipe).

Replaces recipes/dcase2021_task4_baseline/local/apply_separation_model.py
(:28-104): loads the Google MixIT TDCN++ TensorFlow-v1 metagraph checkpoint
and runs `denoised_waveforms` on each mixture, writing per-source wavs.
This is offline host-side preprocessing (the separated clips feed the
ensemble fine-tune recipe) — TF stays on CPU, the TPU is untouched.

Gated: constructing SeparationModel requires the downloaded checkpoint
(the reference downloads it from google cloud storage; this environment has
no egress, so the class raises a clear error when the files are absent).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class SeparationModel:
    def __init__(self, checkpoint_path: str, metagraph_path: str):
        if not Path(metagraph_path).exists():
            raise FileNotFoundError(
                f"separation metagraph not found at {metagraph_path}; download "
                "the MixIT TDCN++ checkpoint (see the DCASE 2021 baseline "
                "instructions) before running separation"
            )
        import tensorflow.compat.v1 as tf

        tf.disable_v2_behavior()
        self.graph = tf.Graph()
        with self.graph.as_default():
            self.sess = tf.Session()
            new_saver = tf.train.import_meta_graph(metagraph_path)
            new_saver.restore(self.sess, checkpoint_path)
        self.input_placeholder = self.graph.get_tensor_by_name(
            "input_audio/receiver_audio:0"
        )
        self.output_tensor = self.graph.get_tensor_by_name("denoised_waveforms:0")

    def separate(self, mixture: np.ndarray) -> np.ndarray:
        """[N] mono waveform -> [n_src, N] separated sources."""
        mixture = np.asarray(mixture, np.float32)[None, None, :]
        sources = self.sess.run(
            self.output_tensor, feed_dict={self.input_placeholder: mixture}
        )
        return sources[0]

    def separate_folder(self, in_folder, out_folder, fs: int = 16000):
        from ..data.audio_io import read_wav, to_mono, write_wav

        in_folder, out_folder = Path(in_folder), Path(out_folder)
        out_folder.mkdir(parents=True, exist_ok=True)
        wavs = sorted(in_folder.glob("*.wav"))
        for wav in wavs:
            audio, _fs = read_wav(wav)
            audio = to_mono(audio)
            sources = self.separate(audio)
            for i, src in enumerate(sources):
                write_wav(out_folder / f"{wav.stem}_src{i}.wav", src, fs)
        return len(wavs)


class JaxSeparationModel:
    """TPU-native separator: the trainable TDCN++ (models/tdcn.py).

    Same interface as SeparationModel (separate / separate_folder) so the
    2021 recipe can swap backends (--backend jax). Params come from an
    ``orbax``/msgpack checkpoint produced by in-framework MixIT training
    (training/mixit.py); random init is allowed for smoke tests.
    """

    def __init__(self, checkpoint_path: str | None = None, n_src: int = 4,
                 **model_kwargs):
        import jax
        import jax.numpy as jnp

        from ..models.tdcn import TDCNPP

        self.model = TDCNPP(n_src=n_src, **model_kwargs)
        if checkpoint_path:
            from flax.serialization import msgpack_restore

            raw = Path(checkpoint_path).read_bytes()
            self.variables = msgpack_restore(raw)
        else:
            self.variables = self.model.init(
                jax.random.key(0), jnp.zeros((1, 16000), jnp.float32)
            )
        self._jit = jax.jit(self.model.apply)

    def separate(self, mixture: np.ndarray) -> np.ndarray:
        """[N] mono waveform -> [n_src, N] separated sources.

        Variable-length clips are zero-padded up to a power-of-two bucket
        (min 1 s) so a folder of assorted lengths triggers a handful of jit
        compiles instead of one ~2 min TPU compile per distinct length."""
        import jax.numpy as jnp

        n = int(np.asarray(mixture).shape[-1])
        bucket = max(16000, 1 << (n - 1).bit_length())
        padded = np.zeros(bucket, np.float32)
        padded[:n] = mixture
        out = self._jit(self.variables, jnp.asarray(padded)[None])
        return np.asarray(out[0])[:, :n]

    separate_folder = SeparationModel.separate_folder
