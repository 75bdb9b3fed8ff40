"""Shared wall-clock measurement protocol for the benchmark harnesses.

Round 3 shipped two throughput numbers for the identical model config that
disagreed by ~6% (bench.py 1028 vs scripts/bench_all.py 964 img/s) because
the harnesses used different iteration counts and sync tails.  Every
harness now times through this one helper: `iters` pipelined dispatches
per sample (amortizing the pipeline-fill + final-sync tail identically),
`repeats` independent samples, median reported with min/max spread.

The final `device_get` (not `block_until_ready`, which returns early over
the axon tunnel) forces materialization of one output leaf; all outputs of
a jitted call are computed regardless of which leaf is fetched, so this
does not let XLA drop work — dead-code concerns only apply to values
created and discarded *inside* a jitted graph.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict

import jax


def _default_sync(out: Any) -> None:
    jax.device_get(jax.tree_util.tree_leaves(out)[0])


def measure_ms(fn: Callable[..., Any], *args: Any, iters: int = 20,
               warmup: int = 3, repeats: int = 5,
               sync: Callable[[Any], None] = _default_sync) -> Dict[str, Any]:
    """Time ``fn(*args)``; returns per-call milliseconds.

    Returns {"ms": median, "ms_min": ..., "ms_max": ..., "samples": [...]}.
    """
    for _ in range(warmup):
        sync(fn(*args))
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        samples.append((time.perf_counter() - t0) / iters * 1000.0)
    ordered = sorted(samples)
    return {
        "ms": ordered[len(ordered) // 2],
        "ms_min": ordered[0],
        "ms_max": ordered[-1],
        "samples": samples,
    }
