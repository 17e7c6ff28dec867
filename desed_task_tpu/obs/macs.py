"""Analytic model-complexity accounting (FLOPs / MACs).

Replaces the reference's THOP-based MAC counting (local/utils.py:226-256;
the 2023 README reports 930.902M MACs for 10 s of audio) with XLA's own cost
analysis of the compiled forward: exact for the program actually executed on
the device, no per-module hooks needed.
"""

from __future__ import annotations

import jax


def compiled_flops(fn, *example_args) -> dict:
    """Compile `fn` and return XLA cost analysis (flops, bytes accessed).

    MACs ~= flops / 2 for matmul/conv-dominated models.
    """
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    return {
        "flops": flops,
        "macs": flops / 2.0,
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)) if cost else 0.0,
    }


def macs_report(fn, *example_args) -> str:
    c = compiled_flops(fn, *example_args)
    return (
        f"forward pass: {c['macs'] / 1e6:.3f} MMACs ({c['flops'] / 1e9:.3f} GFLOPs), "
        f"{c['bytes_accessed'] / 1e6:.1f} MB accessed"
    )
