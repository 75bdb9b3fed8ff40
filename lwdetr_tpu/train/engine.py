"""Training and evaluation engine.

TPU-native re-design of /root/reference/engine.py: the per-batch work
(forward, matching, loss, backward, optimizer, EMA) is ONE jitted function
over the device mesh; the Python loop only feeds batches and logs.  Gradient
reduction across the data axis is inserted by XLA from the shardings — there
is no DDP wrapper to manage (reference main.py:206-210).
"""
from __future__ import annotations

import math
import time
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lwdetr_tpu.config import Config
from lwdetr_tpu.models.criterion import SetCriterion, Targets
from lwdetr_tpu.models.lwdetr import LWDETR, post_process
from lwdetr_tpu.train.optim import drop_path_rates_for, ema_update


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: Any  # {'params':…, 'batch_stats':…} or None
    step: jnp.ndarray


def create_train_state(model: LWDETR, tx, rng, sample_images, use_ema: bool):
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        sample_images, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # EMA must not alias the live params (donation would see the same buffer
    # twice); deep-copy like the reference's deepcopy (util/utils.py:12)
    ema = (jax.tree.map(jnp.copy, {"params": params, "batch_stats": batch_stats})
           if use_ema else None)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema=ema,
        step=jnp.zeros((), jnp.int32),
    )


def build_train_step(model: LWDETR, criterion: SetCriterion, tx,
                     ema_decay: float, use_ema: bool, vit_depth: int,
                     donate: bool = True,
                     static_zero_drop_path: bool = False,
                     static_zero_dropout: bool = False,
                     param_sharding=None):
    """Returns jitted train_step(state, batch, rng, drop_path_rate, dropout_rate).

    static_zero_drop_path / static_zero_dropout: set when the whole schedule
    is identically zero (all release configs for dropout; tiny/small/medium
    for drop-path) — the rates become trace-time constants and NO mask RNG
    enters the graph. A traced zero still generates threefry+bernoulli over
    every activation (~25 ms/step at small@640 batch 8).

    param_sharding: set (to the replicated NamedSharding) when the optimizer
    state is ZeRO-1-sharded — pins the updated params back to replicated so
    GSPMD all-gathers once at the step tail instead of re-sharding params."""

    def loss_fn(params, batch_stats, batch, rng, drop_path_rate, dropout_rate):
        dp_rates = (None if static_zero_drop_path
                    else drop_path_rates_for(drop_path_rate, vit_depth))
        if static_zero_dropout:
            dropout_rate = 0.0
        out, new_vars = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"],
            masks=batch.get("pad_mask"),
            drop_path_rates=dp_rates,
            dropout_rate=dropout_rate,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        targets = Targets(batch["labels"], batch["boxes"], batch["valid"])
        total, losses = criterion(out, targets, train=True)
        return total, (losses, new_vars.get("batch_stats", batch_stats))

    def train_step(state: TrainState, batch, rng, drop_path_rate, dropout_rate):
        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, rng,
                drop_path_rate, dropout_rate)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if param_sharding is not None:
            new_params = jax.lax.with_sharding_constraint(
                new_params, param_sharding)
        ema = state.ema
        if use_ema:
            ema = ema_update(
                state.ema, {"params": new_params, "batch_stats": new_bs}, ema_decay)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(new_params, new_bs, new_opt, ema, state.step + 1), metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def build_eval_step(model: LWDETR, num_select: int,
                    criterion: Optional[SetCriterion] = None):
    """Returns jitted eval_step(params, batch_stats, batch) ->
    ((scores, labels, boxes_xyxy_abs), losses) at original image scale.

    With `criterion`, eval losses are computed on the same forward (the
    reference logs loss components during evaluate, engine.py:128); losses
    is {} otherwise."""

    def eval_step(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], masks=batch.get("pad_mask"), train=False)
        losses = {}
        if criterion is not None:
            targets = Targets(batch["labels"], batch["boxes"], batch["valid"])
            total, losses = criterion(out, targets, train=False)
            losses = dict(losses)
            losses["loss"] = total
        dets = post_process(
            out["pred_logits"], out["pred_boxes"], batch["orig_size"],
            num_select=num_select)
        return dets, losses

    return jax.jit(eval_step)


def train_one_epoch(
    train_step, state: TrainState, loader, epoch: int, rng,
    drop_path_sched: Optional[np.ndarray], dropout_sched: Optional[np.ndarray],
    niter_per_ep: int, put_fn=None, log_every: int = 50, logger=print,
    should_stop=None,
):
    """Python-side epoch loop (reference engine.py:26-90).

    Every step's loss is checked for finiteness (reference aborts on the
    exact step, engine.py:71-74).  To keep the device pipeline full, step
    N's metrics are fetched AFTER step N+1 has been dispatched — by then
    they are ready, so the host never stalls the device; a NaN aborts one
    step late, which is already past the reference's guarantee (the
    poisoned optimizer update has been applied either way).

    `should_stop()` is polled once per step (preemption support: a SIGTERM
    handler sets a flag, the loop finishes the in-flight step and returns
    so the caller can checkpoint — resume is step-granular, main.py derives
    start_epoch from state.step).
    """
    from lwdetr_tpu.utils.logging import MetricLogger

    t0 = time.time()
    mlog = MetricLogger()
    pending = None  # (iteration, unfetched device metrics)

    def consume(it, dev_metrics):
        metrics = jax.device_get(dev_metrics)
        loss = float(metrics["loss"])
        if not math.isfinite(loss):
            logger(f"Loss is {loss}, stopping training (reference "
                   f"engine.py:71-74). Components: "
                   f"{ {k: float(v) for k, v in metrics.items()} }")
            raise FloatingPointError(f"Loss is {loss} at epoch {epoch} it {it}")
        mlog.update(**{k: float(v) for k, v in metrics.items()})
        if it % log_every == 0:
            logger(f"epoch {epoch} it {it}/{niter_per_ep} "
                   f"loss {loss:.4f} grad_norm {float(metrics['grad_norm']):.2f} "
                   f"({(time.time()-t0)/max(it+1,1):.2f}s/it)")

    for it, batch in enumerate(loader):
        gstep = epoch * niter_per_ep + it
        dp = float(drop_path_sched[min(gstep, len(drop_path_sched) - 1)]) \
            if drop_path_sched is not None else 0.0
        do = float(dropout_sched[min(gstep, len(dropout_sched) - 1)]) \
            if dropout_sched is not None else 0.0
        if put_fn is not None:
            batch = put_fn(batch)
        step_rng = jax.random.fold_in(rng, gstep)
        state, metrics = train_step(
            state, batch, step_rng, jnp.float32(dp), jnp.float32(do))
        if pending is not None:
            consume(*pending)
        pending = (it, metrics)
        if should_stop is not None and should_stop():
            logger(f"stop requested at epoch {epoch} it {it} — draining")
            break
    if pending is not None:
        consume(*pending)

    mlog.synchronize_between_processes()
    meters = {k: m.global_avg for k, m in mlog.meters.items()}
    meters["epoch_time"] = time.time() - t0
    return state, meters


def evaluate(eval_step, params, batch_stats, loader, evaluator, put_fn=None,
             logger=print, merge_hosts: bool = True):
    """Eval loop: forward + postprocess on device, COCO accumulation on host
    (reference engine.py:93-164).  When the eval_step was built with a
    criterion, loss components are metered and returned alongside the 12
    AP/AR stats.  Multi-host runs merge detections across processes before
    summarizing (reference coco_eval.py:181-200) unless merge_hosts=False."""
    from lwdetr_tpu.utils.logging import MetricLogger

    t0 = time.time()
    seen = set()
    mlog = MetricLogger()
    for batch in loader:
        dev_batch = put_fn(batch) if put_fn is not None else batch
        (scores, labels, boxes), losses = jax.device_get(
            eval_step(params, batch_stats, dev_batch))
        if losses:
            mlog.update(**{k: float(v) for k, v in losses.items()})
        results = {}
        for i, img_id in enumerate(batch["image_id"].tolist()):
            if img_id in seen:
                continue  # padded duplicate in final batch
            seen.add(img_id)
            results[img_id] = {
                "scores": scores[i], "labels": labels[i], "boxes": boxes[i]}
        evaluator.update(results)
    logger(f"eval forward done in {time.time()-t0:.1f}s ({len(seen)} images)")
    if merge_hosts:
        from lwdetr_tpu.parallel.dist import merge_evaluators

        evaluator = merge_evaluators(evaluator)
    mlog.synchronize_between_processes()
    stats = {k: m.global_avg for k, m in mlog.meters.items()}
    stats.update(evaluator.summarize())
    return stats
