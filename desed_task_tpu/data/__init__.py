from .audio_io import pad_audio, read_audio, read_wav, resample, to_mono, write_wav  # noqa: F401
from .batcher import MultiSourceBatcher, collate  # noqa: F401
from .datasets import ConcatSet, StronglyAnnotatedSet, UnlabeledSet, WeakSet  # noqa: F401
