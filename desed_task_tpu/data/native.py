"""ctypes bindings for the native (C++) audio loader (native/wavio.cpp).

Builds the shared library on first use (g++ -O3, cached next to the source)
and exposes:
    decode(path, max_frames)                 -> (float32 [n], rate)
    decode_batch(paths, target_len, ...)     -> (float32 [B, target_len],
                                                 onsets [B] in samples)
The batch call releases the GIL for the entire decode+downmix+pad/crop of a
batch (threaded in C++), which is the hot host-side path during training.
Falls back cleanly: `available()` is False when no compiler is present.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "wavio.cpp"
_LIB = _SRC.parent / "build" / "libwavio.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    _LIB.parent.mkdir(parents=True, exist_ok=True)
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                "-o", str(_LIB), str(_SRC), "-lpthread",
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(str(_LIB))
        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_decode.restype = ctypes.c_long
        lib.wav_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
        ]
        lib.wav_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def info(path) -> tuple[int, int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    rate = ctypes.c_int()
    ch = ctypes.c_int()
    frames = ctypes.c_long()
    rc = lib.wav_info(str(path).encode(), ctypes.byref(rate), ctypes.byref(ch), ctypes.byref(frames))
    if rc != 0:
        raise ValueError(f"cannot parse wav {path}")
    return rate.value, ch.value, frames.value


def decode(path, max_frames: int | None = None) -> tuple[np.ndarray, int]:
    """Mono float32 decode (mean downmix)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    if max_frames is None:
        _, _, max_frames = info(path)
    out = np.zeros(max_frames, np.float32)
    rate = ctypes.c_int()
    ch = ctypes.c_int()
    n = lib.wav_decode(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_frames,
        ctypes.byref(rate),
        ctypes.byref(ch),
    )
    if n < 0:
        raise ValueError(f"cannot decode wav {path}")
    return out[:n], rate.value


def decode_batch(
    paths: list,
    target_len: int,
    test_mode: bool = False,
    seed: int = 0,
    n_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Parallel decode of a batch: [B, target_len] mono, crop onsets [B]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    n = len(paths)
    out = np.zeros((n, target_len), np.float32)
    onsets = np.zeros(n, np.int64)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    failures = lib.wav_decode_batch(
        arr,
        n,
        target_len,
        1 if test_mode else 0,
        seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        onsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads,
    )
    if failures:
        raise ValueError(f"{failures} files failed to decode in batch")
    return out, onsets
