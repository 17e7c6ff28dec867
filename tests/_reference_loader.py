"""Helpers to load the READ-ONLY upstream reference (torch) for golden parity
tests. The reference imports torchaudio, which is unavailable here; the only
symbols its model code touches at import/eval time are stubbed minimally.
Tests using this module must skip when the reference checkout is absent.

NOTE: reference code is treated as untrusted input — we only execute its
nn.Module graphs on random weights to produce golden outputs.
"""

import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE / "desed_task" / "nnet" / "CRNN.py").exists()


def _install_torchaudio_stub():
    if "torchaudio" in sys.modules:
        return
    import torch

    ta = types.ModuleType("torchaudio")
    transforms = types.ModuleType("torchaudio.transforms")

    class TimeMasking(torch.nn.Module):
        """Only constructed in train mode by the reference; eval-path parity
        tests never call it. Raise if ever invoked."""

        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            raise RuntimeError("stub TimeMasking must not run in eval parity tests")

    transforms.TimeMasking = TimeMasking
    ta.transforms = transforms
    # beats/BEATs.py imports torchaudio.compliance.kaldi at module level;
    # only its preprocess() path (never run in tests) touches it
    compliance = types.ModuleType("torchaudio.compliance")
    kaldi = types.ModuleType("torchaudio.compliance.kaldi")
    compliance.kaldi = kaldi
    ta.compliance = compliance
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = transforms
    sys.modules["torchaudio.compliance"] = compliance
    sys.modules["torchaudio.compliance.kaldi"] = kaldi


def load_reference_crnn_module():
    """Import desed_task.nnet.CRNN from the reference as a namespace package."""
    _install_torchaudio_stub()
    ref = str(REFERENCE)
    if ref not in sys.path:
        sys.path.insert(0, ref)
    import importlib

    return importlib.import_module("desed_task.nnet.CRNN")
