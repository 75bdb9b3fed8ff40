"""Throughput benchmark on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N, ...}

Metric: batched 640x640 inference throughput per chip for LW-DETR-small
(bf16 compute, jit, forward + NMS-free exact top-k postprocess), the
BASELINE.json north-star ("small ... >= 1000 img/s on a v5e-8" =>
125 img/s/chip).

"value" is the DEPLOYED eval configuration — bf16 host inputs, exactly
what the eval loader feeds under --bf16 (DetectionLoader image_dtype) and
what tests/test_micro_map_golden.py::test_micro_map_matches_golden_bf16
pins for accuracy.  The JSON line also carries "value_f32_host" (f32 host
inputs, the pre-round-4 primary: adds the H2D f32 traffic and an
on-device f32->bf16 image cast), plus the median/min/max spread of the
timing samples.  Both configs run the exact two-stage top-k; the
lax.approx_max_k path was removed in round 4 after the exact form
overtook it (BENCH_r03.json: 1028 vs 1013).

Timing protocol is the shared lwdetr_tpu.utils.timing.measure_ms (same
iters/warmup/sync-tail as scripts/bench_all.py — round 3's two harnesses
disagreed by 6% purely on protocol).
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

BASELINE_IMG_S_PER_CHIP = 125.0  # 1000 img/s on 8 chips (BASELINE.json)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int,
                    default=int(os.environ.get("BENCH_BATCH", 32)))
    ap.add_argument("--preset", default=os.environ.get("BENCH_PRESET", "small"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.config import get_config
    from lwdetr_tpu.models.lwdetr import build_model, post_process
    from lwdetr_tpu.utils.timing import measure_ms

    cfg = get_config(args.preset)
    model = build_model(cfg.model, dtype=jnp.bfloat16)

    batch = args.batch
    images_np = np.random.default_rng(0).standard_normal(
        (batch, 640, 640, 3)).astype(np.float32)
    init_images = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_images, train=True)

    @jax.jit
    def fwd(variables, images):
        out = model.apply(variables, images, train=False)
        sizes = jnp.full((images.shape[0], 2), 640.0)
        return post_process(out["pred_logits"], out["pred_boxes"], sizes,
                            num_select=cfg.model.num_select)

    n_chips = max(jax.device_count(), 1)

    def measure(host_dtype):
        images = jax.device_put(jnp.asarray(images_np, host_dtype))
        t = measure_ms(fwd, variables, images)
        return {k: batch / (v / 1000.0) / n_chips
                for k, v in t.items() if k != "samples"}

    deploy = measure(jnp.bfloat16)      # deployed config (bf16 host, golden-pinned)
    f32h = measure(jnp.float32)         # f32-host variant (pre-r4 primary)
    record = {
        "metric": f"lwdetr_{args.preset}_640_bf16_infer_throughput_exact",
        "value": round(deploy["ms"], 2),
        "unit": "img/s/chip",
        "vs_baseline": round(deploy["ms"] / BASELINE_IMG_S_PER_CHIP, 4),
        # ms_min sample -> max throughput and vice versa
        "value_spread": [round(deploy["ms_max"], 2),
                         round(deploy["ms_min"], 2)],
        "value_f32_host": round(f32h["ms"], 2),
        "value_f32_host_spread": [round(f32h["ms_max"], 2),
                                  round(f32h["ms_min"], 2)],
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
