"""Micro-bench attention variants at LW-DETR window/global shapes (dev tool).

Loops the op INSIDE jit (lax.scan with a data dependence so XLA can't CSE):
per-dispatch tunnel latency (~15 ms) would otherwise swamp sub-ms kernels.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

ITERS = 100


def scan_time(jfn, *args):
    import jax
    jax.device_get(jfn(*args))  # compile
    jax.device_get(jfn(*args))
    t0 = time.perf_counter()
    out = jfn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.ops import flash_attention as fa

    H = 12
    cases = [("window", 512, 100, 192), ("global", 32, 1600, 192)]
    rng = np.random.default_rng(0)

    def looped(fn, perturb):
        """fn(x) -> y; perturb(x, y) -> x' keeps a data dependence."""
        def run(x):
            def body(c, _):
                y = fn(c)
                return perturb(x, y), y[0, 0, 0].astype(jnp.float32)
            _, ys = jax.lax.scan(body, x, None, length=ITERS)
            return ys.sum()
        return jax.jit(run)

    for name, B, N, C in cases:
        D = C // H
        scale = D ** -0.5
        qkv_t = jnp.asarray(rng.standard_normal((B, 3 * C, N)), jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)

        # cm: (B, 3C, N) -> (B, C, N); tile output back to 3C
        t_cm = scan_time(looped(
            lambda t: fa.attention_cm(t, H, scale),
            lambda x, y: x + jnp.concatenate([y, y, y], 1) * jnp.bfloat16(1e-8)),
            qkv_t)
        # xla oracle over the same channel-major packing
        t_xla = scan_time(looped(
            lambda t: fa._xla_sdpa_cm(t, H, scale),
            lambda x, y: x + jnp.concatenate([y, y, y], 1) * jnp.bfloat16(1e-8)),
            qkv_t)
        flops = 4 * B * H * N * N * D
        ceil = flops / (197e12 / 8)  # 12.5% MXU ceiling at D=16
        print(f"{name:7} B={B} N={N}: cm {t_cm*1e3:7.3f}"
              f"  xla {t_xla*1e3:7.3f} ms   (D16-ceiling {ceil*1e3:6.3f} ms)")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
