"""Micro-bench: patch-embed strategies at batch 1 and batch 32.

The 16x16/s16 'VALID' patch conv admits several lowerings:
  conv   nn.Conv-style conv_general_dilated (3-lane minor input)
  gemm   reshape -> transpose -> (N, 768) @ (768, C)   (PatchEmbedGEMM)
  einsum 'bhpwq,pqc->bhwc' on free views — XLA picks the layout

Usage: python scripts/micro_patch.py [--C 192] [--img 640]
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
    ap.add_argument("--C", type=int, default=192)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--P", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    P, C, S = args.P, args.C, args.img
    H = S // P
    rng = np.random.default_rng(0)
    kern = jnp.asarray(rng.standard_normal((P, P, 3, C)) * 0.05, jnp.bfloat16)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (P, P), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def gemm(x, k):
        B = x.shape[0]
        x = x.reshape(B, H, P, H, P * 3)
        x = x.transpose(0, 1, 3, 2, 4).reshape(B, H, H, P * P * 3)
        return jax.lax.dot_general(x, k.reshape(P * P * 3, C),
                                   (((3,), (0,)), ((), ())))

    def einsum(x, k):
        B = x.shape[0]
        x5 = x.reshape(B, H, P, H, P * 3)
        return jnp.einsum("bhpwq,pqc->bhwc", x5, k.reshape(P, P * 3, C))

    for B in (1, 32):
        x = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.bfloat16)
        for name, fn in [("conv", conv), ("gemm", gemm), ("einsum", einsum)]:
            f = jax.jit(lambda x, k, fn=fn: jnp.sum(
                fn(x, k).astype(jnp.float32)))
            jax.block_until_ready(f(x, kern))
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                jax.block_until_ready(f(x, kern))
                ts.append((time.perf_counter() - t0) * 1e3)
            ts.sort()
            print(f"B={B:2d} {name:7s} median {ts[len(ts)//2]:7.3f} ms "
                  f"min {ts[0]:7.3f}")


if __name__ == "__main__":
    main()
