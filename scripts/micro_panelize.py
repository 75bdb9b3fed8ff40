"""Micro-bench: producing the sep-kernel's per-level value panels.

The separable deform-attn kernel consumes per-level head-major panels
(B, H, hl, wl*D).  The projection GEMM can emit several intermediate
layouts; the panelization (slice + regroup) cost differs wildly because
(n_l, D) -> (hl, wl*D) merges a sublane dim into lanes (a relayout) and
D < 128 lane-pads every intermediate that keeps D minor.

Strategies (same math, same output):
  A  current: einsum bnc,chd->bhnd  -> per-level dynamic_slice -> reshape
  B  per-level GEMM on memory row-slices, then reshape
  C  per-level row-GEMM to (B, hl, wl, H*D) (packed minor) then
     transpose H out -> (B, H, hl, wl, D) -> bitcast reshape
  D  plain row-major GEMM (B, N, H*D), one fused
     reshape+transpose+reshape per level

Usage: python scripts/micro_panelize.py [--preset large] [--batch 32]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--levels", default="80x80,20x20",
                    help="large P3+P5 by default")
    ap.add_argument("--C", type=int, default=384)
    ap.add_argument("--H", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=30)
    ap.add_argument("--grad", action="store_true",
                    help="also time value-grad (train shape)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    levels = [tuple(map(int, s.split("x"))) for s in args.levels.split(",")]
    B, C, H = args.batch, args.C, args.H
    D = C // H
    N = sum(h * w for h, w in levels)
    rng = np.random.default_rng(0)
    mem = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
    W = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.bfloat16)

    def panels_a(mem, W):
        v = jnp.einsum("bnc,chd->bhnd", mem, W.reshape(C, H, D))
        out, start = [], 0
        for hl, wl in levels:
            s = jax.lax.dynamic_slice_in_dim(v, start, hl * wl, axis=2)
            start += hl * wl
            out.append(s.reshape(B, H, hl, wl * D))
        return out

    def panels_b(mem, W):
        out, start = [], 0
        for hl, wl in levels:
            m = jax.lax.dynamic_slice_in_dim(mem, start, hl * wl, axis=1)
            start += hl * wl
            v = jnp.einsum("bnc,chd->bhnd", m, W.reshape(C, H, D))
            out.append(v.reshape(B, H, hl, wl * D))
        return out

    def panels_c(mem, W):
        out, start = [], 0
        for hl, wl in levels:
            m = jax.lax.dynamic_slice_in_dim(mem, start, hl * wl, axis=1)
            start += hl * wl
            v = (m @ W).reshape(B, hl, wl, H, D)
            v = v.transpose(0, 3, 1, 2, 4)          # (B, H, hl, wl, D)
            out.append(v.reshape(B, H, hl, wl * D))
        return out

    def panels_d(mem, W):
        v = mem @ W                                  # (B, N, H*D) packed
        out, start = [], 0
        for hl, wl in levels:
            s = jax.lax.dynamic_slice_in_dim(v, start, hl * wl, axis=1)
            start += hl * wl
            s = s.reshape(B, hl, wl, H, D).transpose(0, 3, 1, 2, 4)
            out.append(s.reshape(B, H, hl, wl * D))
        return out

    def mk(fn):
        @jax.jit
        def f(mem, W):
            ps = fn(mem, W)
            return sum(jnp.sum(p.astype(jnp.float32)) for p in ps)
        return f

    def mk_grad(fn):
        @jax.jit
        def f(mem, W):
            def loss(W):
                ps = fn(mem, W)
                return sum(jnp.sum(p.astype(jnp.float32)) * 1e-3
                           for p in ps)
            return jax.grad(loss)(W)
        return f

    for name, fn in [("A einsum-bhnd + slice/reshape", panels_a),
                     ("B per-level einsum-bhnd", panels_b),
                     ("C per-level rowGEMM + transpose", panels_c),
                     ("D rowGEMM + fused panelize", panels_d)]:
        for tag, make in ([("fwd", mk)] + ([("fwd+Wgrad", mk_grad)]
                                           if args.grad else [])):
            f = make(fn)
            r = f(mem, W)
            jax.block_until_ready(r)
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                jax.block_until_ready(f(mem, W))
                ts.append((time.perf_counter() - t0) * 1e3)
            ts = sorted(ts)
            print(f"{name:36s} {tag:10s} median {ts[len(ts)//2]:7.3f} ms "
                  f"min {ts[0]:7.3f}")


if __name__ == "__main__":
    main()
