"""Generate the frozen micro-mAP fixture (tests/fixtures/micro_map/).

The north-star validation (BASELINE.md: COCO mAP with released weights) is
not runnable here — no COCO val2017, no HF checkpoints.  This fixture is the
committed stand-in: a 20-image synthetic COCO-format dataset plus frozen
model weights and the 12-stat AP/AR vector those weights produce through the
FULL repo pipeline (DetectionLoader -> jitted eval_step -> CocoEvaluator),
mirroring the reference eval protocol (/root/reference/engine.py:93-164).
Any future drift in resize/normalize numerics, collation, num_select
plumbing, postprocess or evaluator semantics changes the vector and fails
tests/test_micro_map_golden.py.

Ground truth is derived from the model's own predictions (exact matches,
~15% jittered matches, and unmatched decoys per image) so every stat is
strictly between 0 and 1 — a golden of all zeros would catch nothing.

The weights are a seeded flax init, verified at generation time to
round-trip through the torch checkpoint bridge into the actual reference
model with eval-forward parity (the same guarantee tests/test_full_parity.py
maintains continuously), then stored f16 (storage only; compute is f32).

Rerun (only when intentionally re-baselining):
    python tests/gen_micro_map_fixture.py
"""
from __future__ import annotations

import json
import os
import sys

os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

FIXDIR = os.path.join(REPO, "tests", "fixtures", "micro_map")

from micro_map_common import (IMG_SPECS, build_micro, run_pipeline)  # noqa: E402


def make_images():
    """20 deterministic smooth synthetic images (blobs over gradients) in
    varied non-square sizes; smooth content keeps committed JPEGs small."""
    img_dir = os.path.join(FIXDIR, "val2017")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    images_meta = []
    for img_id, (w, h) in enumerate(IMG_SPECS, start=1):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack([
            0.5 + 0.5 * xx / w,
            0.5 + 0.5 * yy / h,
            0.5 + 0.25 * np.sin(xx / 23.0) * np.cos(yy / 17.0),
        ], axis=-1)
        for _ in range(4):
            cx, cy = rng.uniform(0, w), rng.uniform(0, h)
            sx, sy = rng.uniform(w / 12, w / 4), rng.uniform(h / 12, h / 4)
            blob = np.exp(-(((xx - cx) / sx) ** 2 + ((yy - cy) / sy) ** 2))
            color = rng.uniform(-0.5, 0.5, size=3).astype(np.float32)
            base += blob[..., None] * color
        arr = np.clip(base * 255.0, 0, 255).astype(np.uint8)
        name = f"{img_id:012d}.jpg"
        Image.fromarray(arr).save(os.path.join(img_dir, name), quality=90)
        images_meta.append({"id": img_id, "file_name": name,
                            "width": w, "height": h})
    return images_meta


def write_ann(images_meta, annotations, categories):
    ann_dir = os.path.join(FIXDIR, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, "instances_val2017.json"), "w") as f:
        json.dump({"images": images_meta, "annotations": annotations,
                   "categories": categories}, f)


def verify_bridge(cfg, variables):
    """Round-trip the weights into the actual torch reference model and
    assert eval-forward parity (same check as tests/test_full_parity.py)."""
    import torch

    import ref_shims
    from lwdetr_tpu.train import checkpoint as ckpt

    ref_main, ref_models = ref_shims.import_reference()
    args = ref_shims.size_args(ref_main, "tiny", **_MICRO_OVERRIDES)
    ref_model, _crit, _post = ref_models.build_model(args)
    ref_model.eval()
    ref_shims.force_pure_deform_attn(ref_model)
    sd = ckpt.flax_to_torch(variables, cfg)
    tensors = {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = ref_model.load_state_dict(tensors, strict=False)
    missing = [k for k in missing if not k.endswith("num_batches_tracked")]
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    x = np.random.default_rng(3).standard_normal((1, 256, 256, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.tensor(x).permute(0, 3, 1, 2))
    from lwdetr_tpu.models.lwdetr import build_model

    model = build_model(cfg)
    out = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               ref_out["pred_logits"].numpy(),
                               atol=2e-4, rtol=1e-4)
    print("bridge parity vs torch reference: OK")


# reference-argparse overrides matching micro_map_common.micro_config()
_MICRO_OVERRIDES = dict(
    vit_encoder_num_layers=2, window_block_indexes=[0],
    out_feature_indexes=[0, 1], hidden_dim=64, dim_feedforward=128,
    sa_nheads=4, ca_nheads=8, dec_n_points=2, dec_layers=2, group_detr=2,
    num_queries=12,
)


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    images_meta = make_images()

    cfg, model, variables = build_micro(seed=0)
    verify_bridge(cfg, variables)

    # storage f16 (halves fixture size); compute path reloads as f32.
    # IMPORTANT: goldens below are computed with the RELOADED (truncated)
    # weights — exactly what the test will load.
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    np.savez_compressed(
        os.path.join(FIXDIR, "weights.npz"),
        **{jax.tree_util.keystr(p): np.asarray(v, np.float16)
           for p, v in flat})
    from micro_map_common import load_weights

    variables = load_weights(variables, os.path.join(FIXDIR, "weights.npz"))

    # phase A: dummy GT, collect detections at original-image coordinates
    write_ann(images_meta,
              [{"id": i, "image_id": m["id"], "category_id": 1,
                "bbox": [1.0, 1.0, 8.0, 8.0], "area": 64.0, "iscrowd": 0}
               for i, m in enumerate(images_meta, start=1)],
              [{"id": 1, "name": "c1"}])
    dets, _ = run_pipeline(FIXDIR, variables=variables, collect_dets=True)

    # phase B: ground truth derived from predictions
    rng = np.random.default_rng(7)
    annotations, cat_ids = [], set()
    ann_id = 1
    for m in images_meta:
        d = dets[m["id"]]
        order = np.argsort(-d["scores"])[:3]
        w, h = m["width"], m["height"]
        matched_cats = [int(d["labels"][j]) for j in order]
        for k, (mode, box_idx) in enumerate(
                [("exact", order[0]), ("jitter", order[1]),
                 ("grow", order[2]), ("decoy", None)]):
            if mode == "decoy":
                # same category as a matched GT: a hard false negative that
                # shapes that category's recall curve (a fresh random
                # category would only add an all-zero class to the mean)
                bw, bh = rng.uniform(16, w / 3), rng.uniform(16, h / 3)
                x0 = rng.uniform(0, w - bw)
                y0 = rng.uniform(0, h - bh)
                cat = matched_cats[int(rng.integers(0, 3))]
            else:
                x0, y0, x1, y1 = [float(v) for v in d["boxes"][box_idx]]
                if mode == "jitter":
                    bw0, bh0 = x1 - x0, y1 - y0
                    x0 += rng.uniform(-0.15, 0.15) * bw0
                    y0 += rng.uniform(-0.15, 0.15) * bh0
                    x1 += rng.uniform(-0.15, 0.15) * bw0
                    y1 += rng.uniform(-0.15, 0.15) * bh0
                elif mode == "grow":
                    # inflate around the center: partial-IoU match in the
                    # medium/large area bins
                    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
                    hw = max((x1 - x0), 40.0) * rng.uniform(1.6, 3.0) / 2
                    hh = max((y1 - y0), 40.0) * rng.uniform(1.6, 3.0) / 2
                    x0, x1, y0, y1 = cx - hw, cx + hw, cy - hh, cy + hh
                x0, x1 = sorted((max(0.0, x0), min(float(w), x1)))
                y0, y1 = sorted((max(0.0, y0), min(float(h), y1)))
                bw, bh = max(x1 - x0, 2.0), max(y1 - y0, 2.0)
                cat = int(d["labels"][box_idx])
            annotations.append({
                "id": ann_id, "image_id": m["id"], "category_id": cat,
                "bbox": [round(float(x0), 2), round(float(y0), 2),
                         round(float(bw), 2), round(float(bh), 2)],
                "area": round(float(bw * bh), 2), "iscrowd": 0})
            cat_ids.add(cat)
            ann_id += 1
    categories = [{"id": c, "name": f"c{c}"} for c in sorted(cat_ids)]
    write_ann(images_meta, annotations, categories)

    _, stats = run_pipeline(FIXDIR, variables=variables, collect_dets=False)
    golden = {
        "stats": {k: float(v) for k, v in stats.items()},
        "jax_version": jax.__version__,
        "note": "regenerate with tests/gen_micro_map_fixture.py only when "
                "intentionally re-baselining",
    }
    with open(os.path.join(FIXDIR, "golden_stats.json"), "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(json.dumps(golden["stats"], indent=1))
    nontrivial = [k for k, v in golden["stats"].items() if 0.02 < v < 0.98]
    assert len(nontrivial) >= 8, f"golden too degenerate: {golden['stats']}"
    print(f"fixture written to {FIXDIR} ({len(nontrivial)}/12 stats "
          "strictly informative)")


if __name__ == "__main__":
    main()
