"""Encoder-only latency timer (dev tool): fast A/B for encoder changes."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.config import get_config
    from lwdetr_tpu.models.lwdetr import build_model

    size = os.environ.get("PROF_SIZE", "small")
    batch = int(os.environ.get("PROF_BATCH", 32))
    cfg = get_config(size)
    model = build_model(cfg.model, dtype=jnp.bfloat16)
    images = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 640, 640, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 640, 640, 3), jnp.float32), train=True)

    @jax.jit
    def enc_only(v, x):
        outs = model.apply(
            v, x, train=False,
            method=lambda m, x, train: m.backbone.encoder(
                x, None, deterministic=True))
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(outs))

    for _ in range(3):
        jax.device_get(enc_only(variables, images))
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = enc_only(variables, images)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"encoder {dt*1e3:.3f} ms  {batch/dt:.1f} img/s")


if __name__ == "__main__":
    main()
