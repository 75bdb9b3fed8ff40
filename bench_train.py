"""Training-step throughput benchmark (single chip).

Measures the FULL jitted train step — forward, Hungarian matching (on
device), IA-BCE + L1 + GIoU losses over last/aux/enc output sets, backward,
AdamW, EMA — on synthetic data, mirroring the reference's per-iteration
work (engine.py:40-86).  Reference per-GPU batch shapes: tiny/small 4,
medium/large/xlarge 2 (scripts/lwdetr_*_coco_train.sh); pass --batch to
measure a TPU-efficient batch instead.

Timing uses the shared protocol (lwdetr_tpu.utils.timing): median over
repeats with min/max spread; the step is stateful (donated train state)
so the loop threads state through a holder.

Prints ONE JSON line like bench.py. Usage:
  python bench_train.py [--preset small] [--batch 8] [--steps 10]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np

REF_PER_GPU_BATCH = {"tiny": 4, "small": 4, "medium": 2, "large": 2,
                     "xlarge": 2}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="small")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: the reference per-GPU batch for --preset")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--max_gt", type=int, default=100)
    ap.add_argument("--gt_per_img", type=int, default=7,
                    help="valid boxes per image (COCO mean ~7)")
    ap.add_argument("--grad_checkpointing", action="store_true")
    ap.add_argument("--chain", type=int, default=0,
                    help="run N steps inside ONE jit (lax.scan) — pure "
                         "on-device step time, no per-step dispatch. The "
                         "default per-step dispatch includes this setup's "
                         "tunnel RPC (~9 ms/step at small b8), which a "
                         "production loop overlaps with device compute.")
    ap.add_argument("--host_dtype", choices=["f32", "bf16"], default="f32",
                    help="image dtype fed from host; bf16 = what the "
                         "production loader feeds under --bf16 (drops the "
                         "in-graph f32->bf16 cast)")
    args = ap.parse_args()
    if args.batch is None:
        args.batch = REF_PER_GPU_BATCH[args.preset]

    import jax

    # Persistent compile cache: train-step compiles run minutes over the
    # tunnel; sweeping presets/batches shouldn't pay twice for one config.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", os.path.join(
                          os.path.expanduser("~"), ".cache",
                          "lwdetr_tpu_xla")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from lwdetr_tpu.config import get_config
    from lwdetr_tpu.models.criterion import SetCriterion
    from lwdetr_tpu.models.lwdetr import build_model
    from lwdetr_tpu.train.engine import build_train_step, create_train_state
    from lwdetr_tpu.train.optim import build_optimizer

    import dataclasses

    cfg = get_config(args.preset)
    if args.grad_checkpointing:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           grad_checkpointing=True))
    model = build_model(cfg.model, dtype=jnp.bfloat16)
    criterion = SetCriterion(cfg.model, cfg.train)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 640, 640, 3), jnp.float32)
    init = model.init({"params": rng, "dropout": rng}, sample, train=True)
    tx = build_optimizer(init["params"], cfg.model, cfg.train, 1000)
    state = create_train_state(model, tx, rng, sample, use_ema=True)
    step = build_train_step(model, criterion, tx, ema_decay=0.9997,
                            use_ema=True,
                            vit_depth=cfg.model.vit_encoder_num_layers,
                            static_zero_drop_path=cfg.model.drop_path == 0,
                            static_zero_dropout=cfg.model.dropout == 0)

    B, T = args.batch, args.max_gt
    img_dtype = jnp.bfloat16 if args.host_dtype == "bf16" else jnp.float32
    rngd = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rngd.standard_normal((B, 640, 640, 3)),
                              img_dtype),
        "labels": jnp.asarray(rngd.integers(0, cfg.model.num_classes, (B, T)),
                              jnp.int32),
        "boxes": jnp.asarray(rngd.uniform(0.2, 0.6, (B, T, 4)), jnp.float32),
        "valid": jnp.asarray(np.tile(np.arange(T) < args.gt_per_img, (B, 1))),
    }
    r = jax.random.PRNGKey(1)

    def one_step(i):
        nonlocal state
        state, m = step(state, batch, jax.random.fold_in(r, i),
                        jnp.float32(0.05), jnp.float32(0.0))
        return m["loss"]

    if args.chain:
        K = args.chain

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chain_fn(st, batch, r):
            def body(s, i):
                s2, m = step(s, batch, jax.random.fold_in(r, i),
                             jnp.float32(0.05), jnp.float32(0.0))
                return s2, m["loss"]
            st, losses = jax.lax.scan(body, st, jnp.arange(K))
            return st, losses[-1]

        for i in range(2):  # compile + 1 steady chain
            state, loss = chain_fn(state, batch, jax.random.fold_in(r, i))
            jax.device_get(loss)
        samples = []
        for rep in range(args.repeats):
            t0 = time.perf_counter()
            state, loss = chain_fn(state, batch,
                                   jax.random.fold_in(r, 100 + rep))
            jax.device_get(loss)
            samples.append((time.perf_counter() - t0) / K * 1000.0)
    else:
        # warmup: compile + 2 steady steps
        for i in range(3):
            jax.device_get(one_step(i))
        samples = []
        it = 100
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            loss = None
            for _ in range(args.steps):
                loss = one_step(it)
                it += 1
            jax.device_get(loss)
            samples.append((time.perf_counter() - t0) / args.steps * 1000.0)
    chron = list(samples)
    samples.sort()
    med = samples[len(samples) // 2]

    print(json.dumps({
        "metric": f"lwdetr_{args.preset}_640_bf16_train_throughput",
        "value": round(B / (med / 1000.0), 2),
        "unit": "img/s/chip",
        "batch": B,
        "step_ms": round(med, 1),
        "step_ms_spread": [round(samples[0], 1), round(samples[-1], 1)],
        # full per-repeat distribution (sorted): a lone 2x max with a tight
        # rest = one tunnel/host hiccup, a bimodal split = real recompile
        "step_ms_samples": [round(s, 1) for s in samples],
        # chronological order: outlier always first = warmup effect;
        # outlier at random positions = external (tunnel/host) hiccup
        "step_ms_chron": [round(s, 1) for s in chron],
        "grad_checkpointing": bool(args.grad_checkpointing),
        "chain": args.chain,
        "host_dtype": args.host_dtype,
    }))


if __name__ == "__main__":
    main()
