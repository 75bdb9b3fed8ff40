"""Capture a jax.profiler trace of the inference step and dump top HLO ops.

Usage: python scripts/capture_trace.py [train]
"""
from __future__ import annotations

import glob
import os
import sys

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

TRACE_DIR = "/tmp/jaxtrace"


def _enable_compile_cache():
    # Train-step compiles run many minutes on the tunnel; cache them so a
    # re-profile (or a timeout retry) skips straight to the trace.
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     os.path.join(_REPO_ROOT, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.config import get_config
    from lwdetr_tpu.models.lwdetr import build_model, post_process

    cfg = get_config(os.environ.get("PROF_SIZE", "small"))
    model = build_model(cfg.model, dtype=jnp.bfloat16)
    batch = int(os.environ.get("PROF_BATCH", 32))
    # PROF_DTYPE=bf16 profiles the deployment config (bf16 host inputs,
    # what the loader feeds under --bf16); default f32 host inputs
    host_dtype = (jnp.bfloat16 if os.environ.get("PROF_DTYPE") == "bf16"
                  else jnp.float32)
    images = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 640, 640, 3)), host_dtype)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 640, 640, 3), jnp.float32), train=True)

    @jax.jit
    def fwd(v, x):
        out = model.apply(v, x, train=False)
        sizes = jnp.full((x.shape[0], 2), 640.0)
        return post_process(out["pred_logits"], out["pred_boxes"], sizes,
                            num_select=cfg.model.num_select)

    # warmup/compile
    jax.device_get(fwd(variables, images)[0])
    jax.device_get(fwd(variables, images)[0])

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            out = fwd(variables, images)
        jax.device_get(out[0])
    print("trace captured")

    dump_top_ops()


def dump_top_ops(n=40):
    files = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    assert files, "no xplane captured"
    xplane = files[0]
    from xprof.convert import raw_to_tool_data as rtd

    params = {"graph_viewer_options": {}}
    try:
        data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", params)
    except Exception as e:
        print("framework_op_stats failed:", e)
        data = None
    if data:
        import gzip, json
        try:
            text = gzip.decompress(data).decode()
        except Exception:
            text = data if isinstance(data, str) else data.decode()
        with open("/tmp/op_stats.json", "w") as f:
            f.write(text)
        print("wrote /tmp/op_stats.json")




def main_train():
    """Trace the full train step (forward+matcher+loss+backward+optimizer)."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.config import get_config
    from lwdetr_tpu.models.criterion import SetCriterion
    from lwdetr_tpu.models.lwdetr import build_model
    from lwdetr_tpu.train.engine import build_train_step, create_train_state
    from lwdetr_tpu.train.optim import build_optimizer

    cfg = get_config(os.environ.get("PROF_SIZE", "small"))
    batch_size = int(os.environ.get("PROF_BATCH", 8))
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
                            donate=False,
                            static_zero_drop_path=cfg.model.drop_path == 0,
                            static_zero_dropout=cfg.model.dropout == 0)
    B, T = batch_size, 100
    rngd = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rngd.standard_normal((B, 640, 640, 3)),
                              jnp.float32),
        "labels": jnp.asarray(rngd.integers(0, cfg.model.num_classes, (B, T)),
                              jnp.int32),
        "boxes": jnp.asarray(rngd.uniform(0.2, 0.6, (B, T, 4)), jnp.float32),
        "valid": jnp.asarray(np.tile(np.arange(T) < 7, (B, 1))),
    }
    args = (state, batch, jax.random.PRNGKey(1), jnp.float32(0.05),
            jnp.float32(0.0))
    jax.device_get(step(*args)[1]["loss"])
    jax.device_get(step(*args)[1]["loss"])
    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            out = step(*args)
        jax.device_get(out[1]["loss"])
    print("train trace captured")
    dump_top_ops()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "train":
        main_train()
    else:
        main()
