"""Inference throughput across all five release sizes.

Counterpart of the reference's per-size latency table
(/root/reference/README.md:346-356, measured by deploy/benchmark.py).
Each size is jitted at square 640 in bf16 and timed batched.

Usage: python scripts/bench_all.py [--sizes tiny small ...] [--batch 32]
Prints one JSON line per size.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_TRT_MS = {  # reference TensorRT fp16 total latency (README)
    "tiny": 2.0, "small": 2.9, "medium": 5.6, "large": 8.8, "xlarge": 19.1}


def bench_size(size: str, batch: int) -> dict:
    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.config import get_config
    from lwdetr_tpu.models.lwdetr import build_model, post_process

    cfg = get_config(size)
    model = build_model(cfg.model, dtype=jnp.bfloat16)
    images_np = np.random.default_rng(0).standard_normal(
        (batch, 640, 640, 3)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 640, 640, 3), jnp.float32), train=True)

    @jax.jit
    def fwd(variables, images):
        out = model.apply(variables, images, train=False)
        sizes = jnp.full((images.shape[0], 2), 640.0)
        return post_process(out["pred_logits"], out["pred_boxes"], sizes,
                            num_select=cfg.model.num_select)

    def timed(imgs, n):
        jax.device_get(fwd(variables, imgs)[0])
        for _ in range(2):
            jax.device_get(fwd(variables, imgs)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(variables, imgs)
        jax.device_get(out[0])
        return (time.perf_counter() - t0) / n

    dt = timed(jax.device_put(jnp.asarray(images_np, jnp.bfloat16)), 10)
    # batch-1 latency: the reference table's column (TRT fp16 single image).
    # bs1_ms = per-dispatch wall (includes the host->device tunnel RPC);
    # bs1_device_ms = pure on-device latency via a K-deep in-jit chain where
    # each forward consumes a zero-valued function of the previous output
    # (no dispatch between iterations); the difference is the itemized
    # dispatch overhead of this setup.
    img1 = jax.device_put(jnp.asarray(images_np[:1], jnp.bfloat16))
    dt1 = timed(img1, 20)

    K = 20

    @jax.jit
    def chain(variables, img):
        def step(c, _):
            scores, _, _ = fwd(variables, c)
            return c + (jnp.sum(scores) * 0).astype(c.dtype), None
        out, _ = jax.lax.scan(step, img, None, length=K)
        return jnp.sum(out.astype(jnp.float32))

    jax.device_get(chain(variables, img1))
    t0 = time.perf_counter()
    for _ in range(3):
        out = chain(variables, img1)
    jax.device_get(out)
    dt1_dev = (time.perf_counter() - t0) / 3 / K

    return {
        "metric": f"lwdetr_{size}_640_bf16_infer_throughput",
        "value": round(batch / dt, 2),
        "unit": "img/s/chip",
        "batch_ms": round(dt * 1000, 2),
        "bs1_ms": round(dt1 * 1000, 2),
        "bs1_device_ms": round(dt1_dev * 1000, 2),
        "bs1_dispatch_overhead_ms": round((dt1 - dt1_dev) * 1000, 2),
        "ref_trt_fp16_ms_bs1": BASELINE_TRT_MS[size],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="+",
                    default=["tiny", "small", "medium", "large", "xlarge"])
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    for size in args.sizes:
        print(json.dumps(bench_size(size, args.batch)), flush=True)


if __name__ == "__main__":
    main()
