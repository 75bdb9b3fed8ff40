"""Inference throughput across all five release sizes.

Counterpart of the reference's per-size latency table
(/root/reference/README.md:346-356, measured by deploy/benchmark.py).
Each size is jitted at square 640 in bf16 and timed batched, through the
shared timing protocol (lwdetr_tpu.utils.timing.measure_ms — identical
iters/warmup/sync to bench.py, so the two harnesses agree up to run noise).

Usage: python scripts/bench_all.py [--sizes tiny small ...] [--batch 32]
Prints one JSON line per size.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_TRT_MS = {  # reference TensorRT fp16 total latency (README)
    "tiny": 2.0, "small": 2.9, "medium": 5.6, "large": 8.8, "xlarge": 19.1}


def bench_size(size: str, batch: int) -> dict:
    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.config import get_config
    from lwdetr_tpu.models.lwdetr import build_model, post_process
    from lwdetr_tpu.utils.timing import measure_ms

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

    imgs = jax.device_put(jnp.asarray(images_np, jnp.bfloat16))
    t_batch = measure_ms(fwd, variables, imgs)
    # batch-1 latency: the reference table's column (TRT fp16 single image).
    # bs1_ms = per-dispatch wall (includes the host->device tunnel RPC);
    # bs1_device_ms = pure on-device latency via a K-deep in-jit chain where
    # each forward consumes a zero-valued function of the previous output
    # (no dispatch between iterations); the difference is the itemized
    # dispatch overhead of this setup.
    img1 = jax.device_put(jnp.asarray(images_np[:1], jnp.bfloat16))
    t_bs1 = measure_ms(fwd, variables, img1)

    K = 20

    @jax.jit
    def chain(variables, img):
        def step(c, _):
            # fold ALL THREE post_process outputs into the carry so XLA
            # cannot dead-code-eliminate the box/label gather half of the
            # postprocess inside the scan (ADVICE r3)
            scores, labels, boxes = fwd(variables, c)
            z = (jnp.sum(scores) + jnp.sum(labels.astype(scores.dtype))
                 + jnp.sum(boxes)) * 0
            return c + z.astype(c.dtype), None
        out, _ = jax.lax.scan(step, img, None, length=K)
        return jnp.sum(out.astype(jnp.float32))

    t_chain = measure_ms(chain, variables, img1, iters=3, repeats=5)
    dev_ms = t_chain["ms"] / K

    return {
        "metric": f"lwdetr_{size}_640_bf16_infer_throughput",
        "value": round(batch / (t_batch["ms"] / 1000.0), 2),
        "unit": "img/s/chip",
        "batch_ms": round(t_batch["ms"], 2),
        "batch_ms_spread": [round(t_batch["ms_min"], 2),
                            round(t_batch["ms_max"], 2)],
        "bs1_ms": round(t_bs1["ms"], 2),
        "bs1_ms_spread": [round(t_bs1["ms_min"], 2),
                          round(t_bs1["ms_max"], 2)],
        "bs1_device_ms": round(dev_ms, 2),
        "bs1_device_ms_spread": [round(t_chain["ms_min"] / K, 2),
                                 round(t_chain["ms_max"] / K, 2)],
        "bs1_dispatch_overhead_ms": round(t_bs1["ms"] - dev_ms, 2),
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
