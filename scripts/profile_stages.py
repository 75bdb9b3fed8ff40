"""Stage-wise latency breakdown for the inference path (dev tool).

Times encoder / +projector / full forward / +postprocess at the bench
config (small, 640x640, bf16) by jitting progressively larger slices.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(out):
    # block_until_ready returns early over the axon tunnel; device_get of one
    # leaf forces real materialization (same trick as bench.py)
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf)


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.config import get_config
    from lwdetr_tpu.models.lwdetr import build_model, post_process

    size = os.environ.get("PROF_SIZE", "small")
    batch = int(os.environ.get("PROF_BATCH", 32))
    cfg = get_config(size)
    model = build_model(cfg.model, dtype=jnp.bfloat16)
    images = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 640, 640, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 640, 640, 3), jnp.float32), train=True)

    def _scalar(tree):
        # reduce to one scalar: uniform (tiny) output transfer, no DCE
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(tree))

    @jax.jit
    def enc_only(v, x):
        return _scalar(model.apply(
            v, x, train=False,
            method=lambda m, x, train: m.backbone.encoder(
                x, None, deterministic=True)))

    @jax.jit
    def backbone_only(v, x):
        return _scalar(model.apply(
            v, x, train=False,
            method=lambda m, x, train: m.backbone(x, train=train)))

    @jax.jit
    def full(v, x):
        return _scalar(model.apply(v, x, train=False)["pred_logits"])

    @jax.jit
    def full_pp(v, x):
        out = model.apply(v, x, train=False)
        sizes = jnp.full((x.shape[0], 2), 640.0)
        return _scalar(post_process(
            out["pred_logits"], out["pred_boxes"], sizes,
            num_select=cfg.model.num_select))

    t_enc = timeit(enc_only, variables, images)
    t_bb = timeit(backbone_only, variables, images)
    t_full = timeit(full, variables, images)
    t_pp = timeit(full_pp, variables, images)

    def row(name, t, prev=0.0):
        print(f"{name:<22} {t*1e3:8.2f} ms  (+{(t-prev)*1e3:6.2f})  "
              f"{batch/t:8.1f} img/s")

    row("encoder", t_enc)
    row("encoder+projector", t_bb, t_enc)
    row("full forward", t_full, t_bb)
    row("full+postprocess", t_pp, t_full)


if __name__ == "__main__":
    main()
