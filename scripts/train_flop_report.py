"""Per-stage FLOP breakdown of the FULL jitted train step (AOT, no execution).

Counterpart of the reference's per-op GFLOP report (util/benchmark.py) for
the training direction: the step is lowered with abstract
ShapeDtypeStructs (jax.eval_shape for the param tree — nothing touches the
device) and compiled for the active backend; FLOPs come from the optimized
HLO via lwdetr_tpu.utils.hlo_report.  Combined with the measured step time
(BENCH_TRAIN_r04.txt) this gives train-step MFU and says whether the step
is FLOP-bound before any trace is captured.

Usage: python scripts/train_flop_report.py [--preset small] [--batch 8]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="small")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: the reference per-GPU batch")
    ap.add_argument("--max_gt", type=int, default=100)
    ap.add_argument("--step_ms", type=float, default=None,
                    help="measured step time -> prints achieved TFLOP/s")
    ap.add_argument("--top", type=int, default=18)
    ap.add_argument("--dump", default=None,
                    help="also write the optimized HLO text to this path")
    args = ap.parse_args()
    if args.batch is None:
        from bench_train import REF_PER_GPU_BATCH

        args.batch = REF_PER_GPU_BATCH[args.preset]

    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.config import get_config
    from lwdetr_tpu.models.criterion import SetCriterion
    from lwdetr_tpu.models.lwdetr import build_model
    from lwdetr_tpu.train.engine import TrainState, build_train_step
    from lwdetr_tpu.train.optim import build_optimizer
    from lwdetr_tpu.utils.hlo_report import detailed_flops, format_report

    cfg = get_config(args.preset)
    model = build_model(cfg.model, dtype=jnp.bfloat16)
    criterion = SetCriterion(cfg.model, cfg.train)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 640, 640, 3), jnp.float32)

    # abstract param/opt trees: eval_shape runs no device computation
    init_shapes = jax.eval_shape(
        lambda r: model.init({"params": r, "dropout": r}, sample, train=True),
        rng)
    params_s = init_shapes["params"]
    bs_s = init_shapes.get("batch_stats", {})
    tx = build_optimizer(params_s, cfg.model, cfg.train, 1000)
    opt_s = jax.eval_shape(tx.init, params_s)
    state_s = TrainState(
        params=params_s, batch_stats=bs_s, opt_state=opt_s,
        ema=jax.eval_shape(lambda p, b: {"params": p, "batch_stats": b},
                           params_s, bs_s),
        step=jax.ShapeDtypeStruct((), jnp.int32))

    B, T = args.batch, args.max_gt
    batch_s = {
        "images": jax.ShapeDtypeStruct((B, 640, 640, 3), jnp.float32),
        "labels": jax.ShapeDtypeStruct((B, T), jnp.int32),
        "boxes": jax.ShapeDtypeStruct((B, T, 4), jnp.float32),
        "valid": jax.ShapeDtypeStruct((B, T), jnp.bool_),
    }
    step = build_train_step(model, criterion, tx, ema_decay=0.9997,
                            use_ema=True,
                            vit_depth=cfg.model.vit_encoder_num_layers,
                            donate=False,
                            static_zero_drop_path=cfg.model.drop_path == 0,
                            static_zero_dropout=cfg.model.dropout == 0)
    lowered = step.lower(state_s, batch_s,
                         jax.ShapeDtypeStruct((2,), jnp.uint32),
                         jax.ShapeDtypeStruct((), jnp.float32),
                         jax.ShapeDtypeStruct((), jnp.float32))
    compiled = lowered.compile()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(compiled.as_text())
    report = detailed_flops(None, compiled=compiled)
    print(f"== train step FLOPs: {args.preset} @ batch {B} (640x640 bf16) ==")
    print(format_report(report, top=args.top))
    total = report.get("total_flops_cost_analysis")
    if args.step_ms and total == total:
        tf = total / (args.step_ms / 1000.0) / 1e12
        print(f"  @ {args.step_ms} ms/step -> {tf:.2f} TFLOP/s achieved")


if __name__ == "__main__":
    main()
