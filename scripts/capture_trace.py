"""Capture a jax.profiler trace of the inference step and dump top HLO ops.

Usage: python scripts/capture_trace.py [train]
"""
from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/jaxtrace"


def main():
    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.config import get_config
    from lwdetr_tpu.models.lwdetr import build_model, post_process

    cfg = get_config(os.environ.get("PROF_SIZE", "small"))
    model = build_model(cfg.model, dtype=jnp.bfloat16)
    batch = int(os.environ.get("PROF_BATCH", 32))
    images = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 640, 640, 3)).astype(np.float32))
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


if __name__ == "__main__":
    main()
