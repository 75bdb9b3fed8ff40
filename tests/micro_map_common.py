"""Shared pieces of the micro-mAP golden fixture (generator + test).

Defines the micro model configuration (the smallest configuration that still
exercises two-stage proposals, group queries, bbox reparam and the lite
refinement path) and the full-pipeline runner: on-disk COCO-format dir ->
DetectionLoader -> jitted eval_step -> CocoEvaluator, i.e. exactly the
`main.py --eval` path (reference protocol /root/reference/engine.py:93-164).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# (w, h) per image: varied non-square sizes exercise the resize + the
# orig-coordinate rescale in post_process. The two oversized images exist
# to populate the medium/large COCO area bins with TRUE matches: detections
# scale with original size (normalized wh ~0.05), so only a >~1600px image
# yields matched GT above the 32^2 / 96^2 area thresholds.
IMG_SPECS = [
    (320, 240), (640, 480), (480, 640), (400, 300), (300, 400),
    (512, 384), (384, 512), (640, 360), (360, 640), (448, 336),
    (560, 420), (420, 560), (600, 450), (336, 448), (520, 390),
    (280, 210), (640, 640), (240, 320), (1600, 1200), (3200, 2400),
]


def micro_config():
    from lwdetr_tpu.config import ModelConfig

    # keep in sync with gen_micro_map_fixture._MICRO_OVERRIDES (the same
    # shape is parsed through the reference argparse for the bridge check)
    return ModelConfig(
        encoder="vit_tiny", vit_encoder_num_layers=2,
        window_block_indexes=(0,), out_feature_indexes=(0, 1),
        projector_scale=("P4",), hidden_dim=64, dim_feedforward=128,
        sa_nheads=4, ca_nheads=8, dec_n_points=2, dec_layers=2,
        group_detr=2, num_queries=12, num_select=10,
        two_stage=True, lite_refpoint_refine=True, bbox_reparam=True)


def build_micro(seed: int = 0, dtype=jnp.float32):
    from lwdetr_tpu.models.lwdetr import build_model

    cfg = micro_config()
    model = build_model(cfg, dtype=dtype)
    variables = model.init(
        {"params": jax.random.PRNGKey(seed),
         "dropout": jax.random.PRNGKey(seed + 1)},
        jnp.zeros((1, 256, 256, 3), jnp.float32), train=True)
    return cfg, model, variables


def load_weights(variables, npz_path: str):
    """Restore a tree saved as {keystr: f16 array} into the init tree."""
    data = np.load(npz_path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    leaves = []
    for path, init_leaf in flat:
        arr = np.asarray(data[jax.tree_util.keystr(path)], np.float32)
        assert arr.shape == init_leaf.shape, (path, arr.shape, init_leaf.shape)
        leaves.append(jnp.asarray(arr, init_leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def run_pipeline(fixdir: str, variables=None, collect_dets: bool = False,
                 batch_size: int = 4, dtype=jnp.float32):
    """Loader -> eval_step -> evaluator over the fixture dir.

    Returns (dets_by_image_id or None, stats or None): with
    collect_dets=True only raw detections are gathered (phase A of the
    generator); otherwise the 12-stat dict is computed.

    dtype is the model COMPUTE dtype: jnp.bfloat16 reproduces the deployed
    bench configuration (bf16 matmuls, tanh-gelu, trace-time scale folding,
    bf16 images fed straight from the loader, the same wiring as
    `main.py --bf16 --eval`) while params stay f32 — exactly what bench.py
    measures.  Host-side f32->bf16 cast and the on-device convert are both
    round-to-nearest-even, so this matches the device-cast result bitwise.
    """
    from lwdetr_tpu.data.coco import CocoDetection
    from lwdetr_tpu.data.coco_eval import CocoEvaluator
    from lwdetr_tpu.data.loader import DetectionLoader
    from lwdetr_tpu.train.engine import build_eval_step

    cfg, model, init_vars = build_micro(seed=0, dtype=dtype)
    if variables is None:
        variables = init_vars

    ds = CocoDetection(os.path.join(fixdir, "val2017"),
                       os.path.join(fixdir, "annotations",
                                    "instances_val2017.json"))
    loader = DetectionLoader(ds, batch_size=batch_size, train=False,
                             max_gt=10, square_div_64=True, num_workers=0,
                             image_dtype=(jnp.bfloat16
                                          if dtype == jnp.bfloat16 else None))
    eval_step = build_eval_step(model, cfg.num_select)

    evaluator = None if collect_dets else CocoEvaluator(ds.coco)
    dets = {}
    seen = set()
    for batch in loader:
        (scores, labels, boxes), _losses = jax.device_get(
            eval_step(variables["params"],
                      variables.get("batch_stats", {}), batch))
        results = {}
        for i, img_id in enumerate(batch["image_id"].tolist()):
            if img_id in seen:
                continue
            seen.add(img_id)
            results[img_id] = {"scores": scores[i], "labels": labels[i],
                               "boxes": boxes[i]}
        if collect_dets:
            dets.update(results)
        else:
            evaluator.update(results)
    if collect_dets:
        return dets, None
    return None, evaluator.summarize()
