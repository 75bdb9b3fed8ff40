"""Optimizer: AdamW with per-parameter lr/wd trees, EMA, drop schedules.

Reproduces the reference's three param regions
(/root/reference/util/get_param_dicts.py:41-72,
models/backbone/backbone.py:173-233):

* ViT encoder: lr = lr_encoder * layer_decay^(L+1-layer_id) * component_decay^2,
  wd zeroed for gamma/pos_embed/bias/norm params;
* decoder (decoder layers + ref_point_head + decoder norm):
  lr = lr * component_decay;
* everything else: base lr.

torch.optim.AdamW semantics are matched exactly: decoupled weight decay
multiplied by the per-param lr, gradient clipping before Adam, StepLR
(x0.1 every `lr_drop` epochs) folded into the step-indexed schedule.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lwdetr_tpu.config import ModelConfig, TrainConfig


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def _vit_layer_id(path: str, num_layers: int) -> int:
    """reference backbone.py:208-226."""
    if "pos_embed" in path or "patch_embed" in path:
        return 0
    if "/blocks_" in path:
        seg = path.split("/blocks_")[1].split("/")[0]
        return int(seg) + 1
    return num_layers + 1


def _vit_wd_rate(path: str) -> float:
    """reference backbone.py:229-233 (bias == leaf named 'bias' or cae biases)."""
    leaf = path.rsplit("/", 1)[-1]
    if ("gamma" in path or "pos_embed" in path or "rel_pos" in path
            or "bias" in leaf or "norm" in path.lower()):
        return 0.0
    return 1.0


def lr_wd_trees(params, mcfg: ModelConfig, tcfg: TrainConfig):
    """Per-leaf (lr, wd) matching the reference param groups."""
    L = mcfg.vit_encoder_num_layers

    def assign(path, leaf):
        p = _path_str(path)
        if p.startswith("backbone/encoder") and "vit" in mcfg.encoder:
            lr = (tcfg.lr_encoder
                  * tcfg.lr_vit_layer_decay ** (L + 1 - _vit_layer_id(p, L))
                  * tcfg.lr_component_decay ** 2)
            wd = tcfg.weight_decay * _vit_wd_rate(p)
        elif p.startswith("backbone/encoder"):
            lr = 0.1 * tcfg.lr  # PResNet rule (backbone.py:190-202)
            wd = tcfg.weight_decay * _vit_wd_rate(p)
        elif (p.startswith("transformer/layers_")
              or p.startswith("transformer/ref_point_head")
              or p.startswith("transformer/decoder_norm")):
            # reference 'transformer.decoder' region (get_param_dicts.py:49-59)
            lr = tcfg.lr * tcfg.lr_component_decay
            wd = tcfg.weight_decay
        else:
            lr = tcfg.lr
            wd = tcfg.weight_decay
        return lr, wd

    annotated = jax.tree_util.tree_map_with_path(assign, params)
    lr_tree = jax.tree.map(lambda x: x[0], annotated, is_leaf=lambda x: isinstance(x, tuple))
    wd_tree = jax.tree.map(lambda x: x[1], annotated, is_leaf=lambda x: isinstance(x, tuple))
    return lr_tree, wd_tree


class _State(NamedTuple):
    count: jnp.ndarray


def scale_by_param_lr_wd(lr_tree, wd_tree, schedule: Callable[[jnp.ndarray], jnp.ndarray]):
    """update <- -sched(t) * lr_leaf * (adam_update + wd_leaf * param)."""

    def init(params):
        return _State(count=jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        s = schedule(state.count)
        new = jax.tree.map(
            lambda u, p, lr, wd: -(s * lr) * (u + wd * p),
            updates, params, lr_tree, wd_tree)
        return new, _State(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def step_lr_schedule(lr_drop_epochs: int, niter_per_ep: int, gamma: float = 0.1):
    """torch StepLR: multiplier gamma^(epoch // lr_drop) (reference main.py:217)."""

    def sched(count):
        epoch = count // max(niter_per_ep, 1)
        return jnp.power(gamma, (epoch // lr_drop_epochs).astype(jnp.float32))

    return sched


def build_optimizer(params, mcfg: ModelConfig, tcfg: TrainConfig,
                    niter_per_ep: int) -> optax.GradientTransformation:
    lr_tree, wd_tree = lr_wd_trees(params, mcfg, tcfg)
    sched = step_lr_schedule(tcfg.lr_drop, niter_per_ep)
    return optax.chain(
        optax.clip_by_global_norm(tcfg.clip_max_norm),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        scale_by_param_lr_wd(lr_tree, wd_tree, sched),
    )


def ema_update(ema_tree, new_tree, decay: float):
    """reference util/utils.py:7-32 (applied to the full variable dict,
    i.e. params AND batch stats, like torch state_dict)."""
    return jax.tree.map(
        lambda e, m: decay * e + (1.0 - decay) * m, ema_tree, new_tree)


def drop_scheduler(drop_rate: float, epochs: int, niter_per_ep: int,
                   cutoff_epoch: int = 0, mode: str = "standard",
                   schedule: str = "constant") -> np.ndarray:
    """Per-iteration drop rates (port of /root/reference/util/drop_scheduler.py)."""
    assert mode in ("standard", "early", "late")
    total = epochs * niter_per_ep
    if mode == "standard":
        return np.full(total, drop_rate, np.float32)
    early_iters = cutoff_epoch * niter_per_ep
    late_iters = total - early_iters
    if mode == "early":
        assert schedule in ("constant", "linear")
        early = (np.full(early_iters, drop_rate, np.float32) if schedule == "constant"
                 else np.linspace(drop_rate, 0, early_iters, dtype=np.float32))
        return np.concatenate([early, np.zeros(late_iters, np.float32)])
    assert schedule == "constant"
    return np.concatenate([
        np.zeros(early_iters, np.float32), np.full(late_iters, drop_rate, np.float32)])


def drop_path_rates_for(rate, depth: int):
    """Linear ramp over ViT depth (reference lwdetr.py:205-210); `rate` may
    be a traced scalar."""
    ramp = jnp.linspace(0.0, 1.0, depth)
    return ramp * rate
