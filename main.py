"""LW-DETR-TPU training / evaluation CLI.

Flag-compatible counterpart of /root/reference/main.py:39-433: the same
argparse surface (model size flags, loss flags, dataset flags, EMA, resume /
pretrain loading, eval mode, export subcommand), driving the TPU pipeline:
jitted train/eval steps over a data-parallel mesh, orbax checkpoints,
JSON-lines log.txt.

Usage (mirrors scripts/lwdetr_*_coco_*.sh):
  python main.py --preset tiny --coco_path /data/coco --output_dir out/
  python main.py --preset small --coco_path /data/coco --eval --resume ckpt
  python main.py ... export_model --shape 640 640
"""
from __future__ import annotations

import argparse
import dataclasses
import datetime
import json
import os
import time

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("LW-DETR TPU", add_help=False)
    p.add_argument("--preset", default=None,
                   choices=("tiny", "small", "medium", "large", "xlarge"),
                   help="release preset; individual flags override")
    # optimization (reference main.py:41-66)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--lr_encoder", default=1.5e-4, type=float)
    p.add_argument("--batch_size", default=2, type=int,
                   help="per-host global batch (sharded over local devices)")
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--epochs", default=12, type=int)
    p.add_argument("--lr_drop", default=11, type=int)
    p.add_argument("--clip_max_norm", default=0.1, type=float)
    p.add_argument("--lr_vit_layer_decay", default=0.8, type=float)
    p.add_argument("--lr_component_decay", default=1.0, type=float)
    p.add_argument("--dropout", default=0, type=float)
    p.add_argument("--drop_path", default=0, type=float)
    p.add_argument("--drop_mode", default="standard",
                   choices=("standard", "early", "late"))
    p.add_argument("--drop_schedule", default="constant",
                   choices=("constant", "linear"))
    p.add_argument("--cutoff_epoch", default=0, type=int)
    # model loading
    p.add_argument("--pretrained_encoder", default=None, type=str)
    p.add_argument("--pretrain_weights", default=None, type=str)
    p.add_argument("--pretrain_exclude_keys", default=None, type=str, nargs="+")
    p.add_argument("--pretrain_keys_modify_to_load", default=None, type=str, nargs="+")
    # backbone
    p.add_argument("--encoder", default="vit_tiny", type=str)
    p.add_argument("--vit_encoder_num_layers", default=12, type=int)
    p.add_argument("--window_block_indexes", default=None, type=int, nargs="+")
    p.add_argument("--position_embedding", default="sine", choices=("sine", "learned"))
    p.add_argument("--grad_checkpointing", action="store_true",
                   help="remat encoder blocks (recompute activations in the "
                        "backward) for larger per-chip train batches")
    p.add_argument("--shard_opt_state", action="store_true",
                   help="ZeRO-1: shard optimizer moments + EMA over the "
                        "data axis (multi-device; cuts per-chip optimizer "
                        "memory ~n_devices x)")
    p.add_argument("--out_feature_indexes", default=[-1], type=int, nargs="+")
    # transformer
    p.add_argument("--dec_layers", default=3, type=int)
    p.add_argument("--dim_feedforward", default=2048, type=int)
    p.add_argument("--hidden_dim", default=256, type=int)
    p.add_argument("--sa_nheads", default=8, type=int)
    p.add_argument("--ca_nheads", default=8, type=int)
    p.add_argument("--num_queries", default=300, type=int)
    p.add_argument("--group_detr", default=13, type=int)
    p.add_argument("--two_stage", action="store_true")
    p.add_argument("--projector_scale", default=["P4"], type=str, nargs="+",
                   choices=("P3", "P4", "P5", "P6"))
    p.add_argument("--lite_refpoint_refine", action="store_true")
    p.add_argument("--num_select", default=100, type=int)
    p.add_argument("--dec_n_points", default=4, type=int)
    p.add_argument("--decoder_norm", default="LN", type=str)
    p.add_argument("--bbox_reparam", action="store_true")
    # matcher / losses
    p.add_argument("--set_cost_class", default=2, type=float)
    p.add_argument("--set_cost_bbox", default=5, type=float)
    p.add_argument("--set_cost_giou", default=2, type=float)
    p.add_argument("--cls_loss_coef", default=2, type=float)
    p.add_argument("--bbox_loss_coef", default=5, type=float)
    p.add_argument("--giou_loss_coef", default=2, type=float)
    p.add_argument("--focal_alpha", default=0.25, type=float)
    p.add_argument("--no_aux_loss", dest="aux_loss", action="store_false")
    p.add_argument("--sum_group_losses", action="store_true")
    p.add_argument("--use_varifocal_loss", action="store_true")
    p.add_argument("--use_position_supervised_loss", action="store_true")
    p.add_argument("--ia_bce_loss", action="store_true")
    # data
    p.add_argument("--dataset_file", default="coco")
    p.add_argument("--coco_path", type=str)
    p.add_argument("--square_resize_div_64", action="store_true")
    p.add_argument("--per_image_scales", action="store_true",
                   help="sample the square train size per image and pad the "
                        "batch to its max with a mask (the reference recipe; "
                        "default samples one size per batch, mask-free)")
    # run control
    p.add_argument("--output_dir", default="output")
    p.add_argument("--checkpoint_interval", default=10, type=int)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--fp16_eval", action="store_true",
                   help="half-precision eval (bfloat16 on TPU; reference "
                        "engine.py:96-97 uses model.half())")
    p.add_argument("--sync_bn", action="store_true",
                   help="CLI parity with reference main.py:207-208; under "
                        "jit+sharding BatchNorm batch stats already reduce "
                        "over the GLOBAL batch, so this is always on")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--ema_decay", default=0.9997, type=float)
    p.add_argument("--num_workers", default=2, type=int)
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--max_gt", default=100, type=int)
    p.add_argument("--dont_bench", action="store_true")
    # accepted-for-compatibility flags (reference main.py:146-168): process
    # placement and comm backend are managed by jax.distributed on TPU, so
    # these parse but have no effect
    p.add_argument("--device", default="tpu", type=str,
                   help="compat no-op (reference: cuda device selection)")
    p.add_argument("--world_size", default=1, type=int,
                   help="compat no-op (process count comes from the TPU "
                        "runtime / jax.distributed)")
    p.add_argument("--dist_url", default="env://", type=str,
                   help="compat no-op (no rendezvous needed on TPU)")
    # subcommands
    sub = p.add_subparsers(title="sub-commands", dest="subcommand")
    pe = sub.add_parser("export_model", help="AOT-compile and serialize")
    pe.add_argument("--shape", type=int, nargs=2, default=(640, 640))
    pe.add_argument("--infer_dir", type=str, default=None)
    pe.add_argument("--batch", type=int, default=1)
    pe.add_argument("--dry-run", "--test", "-t", dest="dry_run",
                    action="store_true", help="just print what would run")
    return p


def config_from_args(args):
    from lwdetr_tpu.config import (Config, DataConfig, ModelConfig,
                                   TrainConfig, get_config)

    if args.preset:
        cfg = get_config(args.preset)
        # CLI data flags still apply
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data,
            coco_path=args.coco_path or "",
            dataset_file=args.dataset_file,
            num_workers=args.num_workers))
        # presets encode COCO's 91 classes; o365 pretraining needs the
        # 366-way head (reference datasets/__init__.py num_classes dispatch)
        if args.dataset_file == "o365":
            cfg = dataclasses.replace(cfg, model=dataclasses.replace(
                cfg.model, num_classes=366))
        return cfg

    num_classes = 91 if args.dataset_file == "coco" else (
        366 if args.dataset_file == "o365" else 20)
    model = ModelConfig(
        encoder=args.encoder,
        vit_encoder_num_layers=args.vit_encoder_num_layers,
        window_block_indexes=tuple(args.window_block_indexes or ()),
        out_feature_indexes=tuple(args.out_feature_indexes),
        position_embedding=args.position_embedding,
        drop_path=args.drop_path,
        dropout=args.dropout,
        grad_checkpointing=args.grad_checkpointing,
        projector_scale=tuple(args.projector_scale),
        dec_layers=args.dec_layers,
        dim_feedforward=args.dim_feedforward,
        hidden_dim=args.hidden_dim,
        sa_nheads=args.sa_nheads,
        ca_nheads=args.ca_nheads,
        num_queries=args.num_queries,
        group_detr=args.group_detr,
        two_stage=args.two_stage,
        lite_refpoint_refine=args.lite_refpoint_refine,
        dec_n_points=args.dec_n_points,
        decoder_norm=args.decoder_norm,
        bbox_reparam=args.bbox_reparam,
        aux_loss=args.aux_loss,
        num_classes=num_classes,
        num_select=args.num_select,
    )
    train = TrainConfig(
        lr=args.lr, lr_encoder=args.lr_encoder, batch_size=args.batch_size,
        weight_decay=args.weight_decay, epochs=args.epochs, lr_drop=args.lr_drop,
        clip_max_norm=args.clip_max_norm,
        lr_vit_layer_decay=args.lr_vit_layer_decay,
        lr_component_decay=args.lr_component_decay,
        drop_mode=args.drop_mode, drop_schedule=args.drop_schedule,
        cutoff_epoch=args.cutoff_epoch,
        set_cost_class=args.set_cost_class, set_cost_bbox=args.set_cost_bbox,
        set_cost_giou=args.set_cost_giou,
        cls_loss_coef=args.cls_loss_coef, bbox_loss_coef=args.bbox_loss_coef,
        giou_loss_coef=args.giou_loss_coef, focal_alpha=args.focal_alpha,
        sum_group_losses=args.sum_group_losses,
        use_varifocal_loss=args.use_varifocal_loss,
        use_position_supervised_loss=args.use_position_supervised_loss,
        ia_bce_loss=args.ia_bce_loss,
        use_ema=args.use_ema, ema_decay=args.ema_decay,
        seed=args.seed, max_gt=args.max_gt,
    )
    data = DataConfig(
        dataset_file=args.dataset_file, coco_path=args.coco_path or "",
        square_resize_div_64=args.square_resize_div_64,
        per_image_scales=args.per_image_scales,
        num_workers=args.num_workers)
    return Config(model=model, train=train, data=data,
                  output_dir=args.output_dir)


def _enable_compile_cache():
    """Persistent XLA compilation cache (~/.cache/lwdetr_tpu_xla unless
    JAX_CACHE_DIR set).

    Train-step compiles run minutes on a tunneled TPU; the reference's
    torch path has no such cost, so without this a resumed/re-launched run
    pays it every time.  JAX never evicts cache entries, so the directory
    grows with every distinct (shape, flag) combination compiled — delete
    it freely, or disable writing entirely with JAX_NO_COMPILE_CACHE=1."""
    if os.environ.get("JAX_NO_COMPILE_CACHE"):
        return
    import jax
    cache = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "lwdetr_tpu_xla"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main(args):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from lwdetr_tpu.config import Config
    from lwdetr_tpu.data.coco import build_dataset
    from lwdetr_tpu.data.coco_eval import CocoEvaluator
    from lwdetr_tpu.data.loader import DetectionLoader
    from lwdetr_tpu.models.criterion import SetCriterion
    from lwdetr_tpu.models.lwdetr import build_model
    from lwdetr_tpu.parallel.dist import (init_distributed,
                                          setup_print_for_distributed)
    from lwdetr_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from lwdetr_tpu.train import checkpoint as ckpt
    from lwdetr_tpu.train.engine import (build_eval_step, build_train_step,
                                         create_train_state, evaluate,
                                         train_one_epoch)
    from lwdetr_tpu.train.optim import build_optimizer, drop_scheduler
    from lwdetr_tpu.utils.benchmark import benchmark_model
    from lwdetr_tpu.utils.logging import (BestMetricHolder, is_main_process,
                                          write_log_line)

    # multi-host bootstrap BEFORE any other jax call (reference
    # init_distributed_mode, util/misc.py:417-439); no-op single-process
    rank, world = init_distributed()
    setup_print_for_distributed()
    if world > 1:
        print(f"distributed: process {rank}/{world}, "
              f"{jax.local_device_count()} local / {jax.device_count()} "
              f"global devices")

    cfg = config_from_args(args)
    mcfg, tcfg, dcfg = cfg.model, cfg.train, cfg.data
    print(f"config: {mcfg}")

    # fail fast on bad weight paths — model init takes minutes on TPU
    for flag, path in (("--pretrained_encoder", args.pretrained_encoder),
                       ("--pretrain_weights", args.pretrain_weights)):
        if path and not os.path.exists(path):
            raise FileNotFoundError(f"{flag}: no such file: {path}")

    rng = jax.random.PRNGKey(tcfg.seed)
    np.random.seed(tcfg.seed)

    mesh = make_mesh()
    n_data = mesh.shape.get("data", 1)
    if tcfg.batch_size % max(n_data, 1):
        raise ValueError(
            f"--batch_size {tcfg.batch_size} must be divisible by the "
            f"{n_data} local devices on the data mesh axis (per-host batch "
            f"is sharded over local devices)")
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = build_model(mcfg, dtype=dtype)
    criterion = SetCriterion(mcfg, tcfg)

    # data
    ds_val = build_dataset("val", dcfg)
    # bf16 eval feeds bf16 images from the loader: the cast runs in the
    # prefetch thread (overlapped), halves H2D bytes and removes the
    # on-device f32->bf16 convert; accuracy at this dtype is pinned by
    # tests/test_micro_map_golden.py::test_micro_map_matches_golden_bf16
    eval_image_dtype = (jnp.bfloat16 if (args.bf16 or args.fp16_eval)
                        else None)
    val_loader = DetectionLoader(
        ds_val, batch_size=max(tcfg.batch_size, 1), train=False,
        max_gt=tcfg.max_gt, square_div_64=dcfg.square_resize_div_64,
        num_workers=dcfg.num_workers, image_dtype=eval_image_dtype,
        process_index=jax.process_index(), process_count=jax.process_count())
    if not args.eval:
        ds_train = build_dataset("train", dcfg)
        train_loader = DetectionLoader(
            ds_train, batch_size=tcfg.batch_size, train=True,
            max_gt=tcfg.max_gt, seed=tcfg.seed,
            square_div_64=dcfg.square_resize_div_64,
            per_image_scales=dcfg.per_image_scales,
            num_workers=dcfg.num_workers,
            process_index=jax.process_index(), process_count=jax.process_count())
        niter_per_ep = len(train_loader)
    else:
        niter_per_ep = 1

    # state
    sample = jnp.zeros((1, 640, 640, 3), jnp.float32)
    init_params = model.init({"params": rng, "dropout": rng}, sample, train=True)
    tx = build_optimizer(init_params["params"], mcfg, tcfg, niter_per_ep)
    state = create_train_state(model, tx, rng, sample, use_ema=tcfg.use_ema)

    # pretrain / encoder weights (reference main.py:240-259, backbone.py:77-85)
    if args.pretrained_encoder:
        enc_vars = ckpt.load_pretrained_encoder(args.pretrained_encoder, mcfg)
        n_loaded = sum(1 for _ in jax.tree.leaves(enc_vars["params"]))
        state = state._replace(
            params=_merge(state.params, enc_vars["params"]))
        print(f"loaded {n_loaded} encoder arrays from {args.pretrained_encoder}")
    if args.pretrain_weights:
        state = _load_pretrain(state, args, mcfg, ckpt)
    if (args.pretrained_encoder or args.pretrain_weights) and tcfg.use_ema:
        # reference main.py:257-259: EMA is re-seeded from the loaded weights
        # (and the CAE encoder load happens before ModelEma is constructed)
        state = state._replace(ema=jax.tree.map(
            jnp.copy, {"params": state.params, "batch_stats": state.batch_stats}))
    if args.resume:
        if args.resume.endswith(".pth"):
            # reference main.py:270-278: strict model load from a torch
            # checkpoint (+ EMA weights when present). Optimizer/scheduler
            # state is torch-specific and not bridged; epoch resumes.
            state, start_epoch = _resume_pth(state, args.resume, mcfg, ckpt,
                                             use_ema=tcfg.use_ema)
            if start_epoch is not None and not args.eval:
                args.start_epoch = start_epoch
        else:
            restored, step = ckpt.restore_checkpoint(args.resume, state)
            if restored is not None:
                state = restored
                args.start_epoch = int(np.asarray(state.step)) // max(niter_per_ep, 1)
                print(f"resumed from {args.resume} at step {int(np.asarray(state.step))}")

    state = jax.device_put(state, replicated(mesh))
    if args.shard_opt_state and n_data > 1:
        # ZeRO-1: optimizer moments + EMA shard over the data axis; GSPMD
        # reduce-scatters grads into them and all-gathers the param update
        from lwdetr_tpu.parallel.mesh import zero1_sharding_tree

        state = state._replace(
            opt_state=jax.device_put(
                state.opt_state, zero1_sharding_tree(mesh, state.opt_state)),
            ema=(jax.device_put(
                state.ema, zero1_sharding_tree(mesh, state.ema))
                if state.ema is not None else None))

    if is_main_process() and not args.dont_bench:
        benchmark_model(model, {"params": state.params,
                                "batch_stats": state.batch_stats})

    # --fp16_eval: half-precision eval compute (reference engine.py:96-97);
    # bf16 is the TPU-native half type — same MXU speedup, wider exponent
    eval_model = (build_model(mcfg, dtype=jnp.bfloat16)
                  if (args.fp16_eval and not args.bf16) else model)
    eval_step = build_eval_step(eval_model, mcfg.num_select,
                                criterion=criterion)
    put = lambda b: shard_batch(mesh, b)

    last_eval = {}

    def run_eval(params, batch_stats):
        evaluator = CocoEvaluator(ds_val.coco)
        stats = evaluate(eval_step, params, batch_stats, val_loader, evaluator,
                         put_fn=put)
        last_eval["evaluator"] = evaluator
        return stats

    if args.eval:
        stats = run_eval(state.params, state.batch_stats)
        if tcfg.use_ema and state.ema is not None:
            print("EMA eval:")
            stats_ema = run_eval(state.ema["params"], state.ema["batch_stats"])
        print(json.dumps(stats))
        return

    # schedules (reference main.py:296-309)
    dp_sched = drop_scheduler(mcfg.drop_path, tcfg.epochs, niter_per_ep,
                              tcfg.cutoff_epoch, tcfg.drop_mode, tcfg.drop_schedule)
    do_sched = drop_scheduler(mcfg.dropout, tcfg.epochs, niter_per_ep,
                              tcfg.cutoff_epoch, tcfg.drop_mode, tcfg.drop_schedule)

    train_step = build_train_step(
        model, criterion, tx, ema_decay=tcfg.ema_decay, use_ema=tcfg.use_ema,
        vit_depth=mcfg.vit_encoder_num_layers,
        static_zero_drop_path=bool(np.all(dp_sched == 0)),
        static_zero_dropout=bool(np.all(do_sched == 0)),
        param_sharding=(replicated(mesh)
                        if args.shard_opt_state and n_data > 1 else None))

    # preemption support (TPU pools send SIGTERM with a grace window):
    # finish the in-flight step, checkpoint, exit cleanly; resume is
    # step-granular (start_epoch derives from state.step on --resume)
    import signal

    preempt = {"sig": None}

    def _on_term(signum, frame):
        preempt["sig"] = signum
        print(f"signal {signum}: draining current step, will checkpoint "
              f"and exit", flush=True)

    signal.signal(signal.SIGTERM, _on_term)

    best = BestMetricHolder(use_ema=tcfg.use_ema)
    start = time.time()
    for epoch in range(args.start_epoch, tcfg.epochs):
        train_loader.set_epoch(epoch)
        state, train_meters = train_one_epoch(
            train_step, state, train_loader, epoch, rng,
            dp_sched, do_sched, niter_per_ep, put_fn=put,
            should_stop=lambda: preempt["sig"] is not None)

        if preempt["sig"] is not None:
            if args.output_dir and is_main_process():
                ckpt.save_checkpoint(
                    os.path.join(args.output_dir, "ckpt"),
                    int(np.asarray(state.step)), state, block=True)
            ckpt.wait_for_checkpoints()
            print(f"preempted (signal {preempt['sig']}): checkpoint saved at "
                  f"step {int(np.asarray(state.step))}, exiting")
            return

        if args.output_dir and is_main_process():
            # the rolling dir is keyed by GLOBAL STEP (not epoch): mid-epoch
            # preempt saves and end-of-epoch saves stay monotonic with no
            # key collisions after a resume-and-redo; restore derives the
            # epoch from state.step either way (main.py resume path)
            ckpt.save_checkpoint(
                os.path.join(args.output_dir, "ckpt"),
                int(np.asarray(state.step)), state)
            # durable extra checkpoint before the LR drop and every
            # checkpoint_interval epochs (reference main.py:327-344)
            if ((epoch + 1) % tcfg.lr_drop == 0
                    or (epoch + 1) % args.checkpoint_interval == 0):
                ckpt.save_checkpoint(
                    os.path.join(args.output_dir, "ckpt_epochs"), epoch,
                    state, keep=None)

        stats = run_eval(state.params, state.batch_stats)
        if args.output_dir and is_main_process():
            # precision/recall tensor dump for offline analysis
            # (reference main.py:402-411 saves the eval dict per epoch)
            ev = getattr(last_eval.get("evaluator"), "eval", None)
            if ev:
                edir = os.path.join(args.output_dir, "eval")
                os.makedirs(edir, exist_ok=True)
                np.savez(os.path.join(edir, "latest.npz"), epoch=epoch, **ev)
        record = {"epoch": epoch,
                  **{f"train_{k}": v for k, v in train_meters.items()},
                  **{f"test_{k}": v for k, v in stats.items()}}
        map_regular = stats["AP"]
        if best.update(map_regular, epoch):
            # best-regular checkpoint on AP improvement (ref main.py:350-360)
            if args.output_dir and is_main_process():
                ckpt.save_checkpoint(
                    os.path.join(args.output_dir, "ckpt_best_regular"),
                    epoch, state, keep=1)
        if tcfg.use_ema:
            stats_ema = run_eval(state.ema["params"], state.ema["batch_stats"])
            record.update({f"ema_test_{k}": v for k, v in stats_ema.items()})
            if best.update(stats_ema["AP"], epoch, is_ema=True):
                # best-EMA checkpoint (ref main.py:370-380)
                if args.output_dir and is_main_process():
                    ckpt.save_checkpoint(
                        os.path.join(args.output_dir, "ckpt_best_ema"),
                        epoch, state, keep=1)
        record.update(best.summary())
        write_log_line(args.output_dir, record)

    # drain in-flight async checkpoint writes while the interpreter can
    # still spawn threads (atexit is too late for orbax's commit machinery)
    ckpt.wait_for_checkpoints()
    total = time.time() - start
    print(f"Training time {datetime.timedelta(seconds=int(total))}")


def _load_pretrain(state, args, mcfg, ckpt_mod):
    """--pretrain_weights with exclude/remap hooks (reference main.py:240-259)."""
    import torch

    from lwdetr_tpu.train.checkpoint import clean_state_dict, torch_to_flax
    from lwdetr_tpu.utils.obj365_remap import remap_torch_state_dict

    raw = torch.load(args.pretrain_weights, map_location="cpu", weights_only=False)
    sd = raw.get("model", raw)
    sd = clean_state_dict(
        {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
         for k, v in sd.items()})
    for k in args.pretrain_exclude_keys or []:
        sd.pop(k, None)
    if args.pretrain_keys_modify_to_load:
        from lwdetr_tpu.train.checkpoint import flax_to_torch

        cur_sd = flax_to_torch(
            {"params": state.params, "batch_stats": state.batch_stats}, mcfg)
        sd = remap_torch_state_dict(cur_sd, sd, args.pretrain_keys_modify_to_load)
    variables = torch_to_flax(sd, mcfg, strict=False)
    params = _merge(state.params, variables.get("params", {}))
    bs = _merge(state.batch_stats, variables.get("batch_stats", {}))
    print(f"loaded pretrain weights from {args.pretrain_weights}")
    return state._replace(params=params, batch_stats=bs)


def _resume_pth(state, path, mcfg, ckpt_mod, use_ema: bool):
    """--resume of a reference torch checkpoint (reference main.py:270-286):
    strict model load, EMA from 'ema_model' if present (else re-seeded from
    the model weights), epoch from the ckpt.  torch optimizer/lr_scheduler
    state has no optax counterpart and is not restored."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    variables = ckpt_mod.load_pth(path, mcfg, key="model")
    state = state._replace(
        params=_merge(state.params, variables.get("params", {})),
        batch_stats=_merge(state.batch_stats, variables.get("batch_stats", {})))
    if use_ema:
        import jax
        import jax.numpy as jnp

        if isinstance(raw, dict) and "ema_model" in raw:
            ema_sd = ckpt_mod.clean_state_dict(
                {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                 for k, v in raw["ema_model"].items()})
            ema_vars = ckpt_mod.torch_to_flax(ema_sd, mcfg, strict=False)
            ema = {"params": _merge(state.params, ema_vars.get("params", {})),
                   "batch_stats": _merge(state.batch_stats,
                                         ema_vars.get("batch_stats", {}))}
        else:
            ema = {"params": state.params, "batch_stats": state.batch_stats}
        state = state._replace(ema=jax.tree.map(jnp.copy, ema))
    start_epoch = None
    if isinstance(raw, dict) and "epoch" in raw:
        start_epoch = int(raw["epoch"]) + 1
    print(f"resumed model weights from {path}"
          + (f" (epoch {start_epoch - 1})" if start_epoch else ""))
    return state, start_epoch


def _merge(base, overlay):
    """Non-strict merge: overlay leaves replace base where both exist and
    shapes agree (reference load_state_dict(strict=False) semantics)."""
    if not isinstance(base, dict):
        if overlay is None:
            return base
        if hasattr(base, "shape") and hasattr(overlay, "shape") \
                and base.shape != overlay.shape:
            return base
        return overlay
    out = dict(base)
    for k, v in (overlay or {}).items():
        if k in out:
            out[k] = _merge(out[k], v)
    return out


def export_model(args):
    """AOT-compile the inference function and serialize it
    (deploy counterpart of reference deploy/export.py; ONNX/TRT become
    jax.export artifacts loadable without Python model code)."""
    from lwdetr_tpu.deploy.export import export_main

    _enable_compile_cache()
    if getattr(args, "dry_run", False):
        print(f"[dry-run] would AOT-compile preset={args.preset} "
              f"shape={tuple(args.shape)} batch={args.batch} "
              f"resume={args.resume!r} -> {args.output_dir}")
        return
    export_main(args, config_from_args(args))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "LW-DETR TPU", parents=[get_args_parser()],
        epilog="XLA compiles are cached persistently in ~/.cache/lwdetr_tpu_xla"
               " (override: JAX_CACHE_DIR; disable: JAX_NO_COMPILE_CACHE=1)."
               " The cache is never evicted; delete the directory to reclaim"
               " space.")
    args = parser.parse_args()
    if args.subcommand == "export_model":
        export_model(args)
    else:
        main(args)
