"""FLOPs and latency measurement.

TPU-native replacement for the reference's JIT-trace FLOP counter and timed
forward (/root/reference/util/benchmark.py:41-629): XLA's
`compiled.cost_analysis()` replaces the ~35 hand-written aten op handlers,
and latency uses explicit result materialization (device_get) instead of
cuda synchronize.  Run at startup like the reference (main.py:263-268).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def flops_of(fn: Callable, *args) -> Optional[float]:
    """Total FLOPs of one call, from the compiled executable's cost model."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


def measure_latency(fn: Callable, args, warmup: int = 5, iters: int = 20) -> Dict[str, float]:
    """Median/mean wall latency of fn(*args) with forced materialization."""
    jitted = jax.jit(fn)

    def run_once():
        out = jitted(*args)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf)).ravel()[:1]
        return out

    run_once()  # compile
    for _ in range(warmup):
        run_once()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {
        "mean_ms": float(times.mean() * 1e3),
        "median_ms": float(np.median(times) * 1e3),
        "p95_ms": float(np.percentile(times, 95) * 1e3),
    }


def benchmark_model(model, variables, image_size: int = 640, batch: int = 1,
                    logger=print) -> Dict[str, float]:
    """Startup self-benchmark: params / GFLOPs / fps + per-op breakdown
    (reference util/benchmark.py:586-629 ``benchmark`` with its
    ``detailed_flops`` per-op-class dict, run at main.py:263-268)."""
    from lwdetr_tpu.utils.hlo_report import detailed_flops, format_report

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    images = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)

    def fwd(v, x):
        return model.apply(v, x, train=False)["pred_boxes"]

    compiled = jax.jit(fwd).lower(variables, images).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
    except Exception:
        flops = None
    report = detailed_flops(fwd, compiled=compiled)
    lat = measure_latency(fwd, (variables, images))
    stats = {
        "n_parameters": n_params,
        "gflops": (flops / 1e9 / batch) if flops else float("nan"),
        "fps": 1000.0 / lat["median_ms"] * batch,
        "detailed_flops": report["flops_by_op"],
        **lat,
    }
    logger(f"benchmark: {n_params/1e6:.1f}M params, "
           f"{stats['gflops']:.1f} GFLOPs/img, {stats['fps']:.1f} img/s "
           f"(median {lat['median_ms']:.2f} ms @ batch {batch})")
    logger(format_report(report))
    return stats
