"""Data pipeline integration: synthetic COCO json -> loader -> eval loop.

Builds a tiny on-disk COCO-format dataset, runs the DetectionLoader and the
jitted eval step end to end, and checks that a cheating "model" (one that
returns the ground truth) scores AP=1 through the whole pipeline —
validating dataset reader, transforms, collation, coordinate scaling and the
evaluator wiring together.
"""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from lwdetr_tpu.config import DataConfig
from lwdetr_tpu.data import transforms as T
from lwdetr_tpu.data.coco import CocoDetection
from lwdetr_tpu.data.coco_eval import CocoEvaluator
from lwdetr_tpu.data.loader import DetectionLoader


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "val2017"
    ann_dir = root / "annotations"
    img_dir.mkdir()
    ann_dir.mkdir()

    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 6):
        w, h = int(rng.integers(200, 400)), int(rng.integers(150, 300))
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"{img_id:012d}.jpg")
        images.append({"id": img_id, "file_name": f"{img_id:012d}.jpg",
                       "width": w, "height": h})
        for _ in range(int(rng.integers(1, 4))):
            bw, bh = float(rng.uniform(20, w / 2)), float(rng.uniform(20, h / 2))
            x = float(rng.uniform(0, w - bw))
            y = float(rng.uniform(0, h - bh))
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": int(rng.integers(1, 4)),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0})
            ann_id += 1
    categories = [{"id": i, "name": f"c{i}"} for i in range(1, 4)]
    with open(ann_dir / "instances_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    return str(root)


def test_dataset_and_loader_shapes(coco_dir):
    ds = CocoDetection(os.path.join(coco_dir, "val2017"),
                       os.path.join(coco_dir, "annotations/instances_val2017.json"))
    assert len(ds) == 5
    img, tgt = ds.load_raw(0)
    assert tgt["boxes"].shape[1] == 4
    assert (tgt["boxes"][:, 2] > tgt["boxes"][:, 0]).all()

    loader = DetectionLoader(ds, batch_size=2, train=False, max_gt=10,
                             eval_size=256)
    batches = list(loader)
    assert len(batches) == 3  # 5 imgs, last padded
    for b in batches:
        assert b["images"].shape == (2, 256, 256, 3)
        assert b["labels"].shape == (2, 10)
        assert b["boxes"].shape == (2, 10, 4)
        # normalized cxcywh
        valid_boxes = b["boxes"][b["valid"]]
        assert (valid_boxes >= 0).all() and (valid_boxes <= 1).all()
    ids = np.concatenate([b["image_id"] for b in batches])
    assert len(set(ids.tolist())) == 5


def test_train_loader_batch_shapes(coco_dir):
    ds = CocoDetection(os.path.join(coco_dir, "val2017"),
                       os.path.join(coco_dir, "annotations/instances_val2017.json"))
    loader = DetectionLoader(ds, batch_size=2, train=True, max_gt=10, seed=1)
    sizes = set()
    for epoch in range(3):
        loader.set_epoch(epoch)
        for b in loader:
            h, w = b["images"].shape[1:3]
            assert h == w and h % 64 == 0  # square_div_64 recipe
            sizes.add(h)
    assert len(sizes) >= 2, "batch sizes should vary across batches/epochs"


def test_train_loader_per_image_scales(coco_dir):
    """--per_image_scales: each image samples its own square size (the
    reference recipe, coco.py:123-147) and the batch pads to the max with a
    pad_mask (util/misc.py:317-339 semantics: True on padding)."""
    from lwdetr_tpu.data.transforms import SCALES_SQUARE

    ds = CocoDetection(os.path.join(coco_dir, "val2017"),
                       os.path.join(coco_dir, "annotations/instances_val2017.json"))
    loader = DetectionLoader(ds, batch_size=4, train=True, max_gt=10, seed=3,
                             drop_last=False, per_image_scales=True)
    per_image_sizes = set()
    for epoch in range(4):
        loader.set_epoch(epoch)
        for b in loader:
            assert "pad_mask" in b
            B, H, W = b["pad_mask"].shape
            assert b["images"].shape == (B, H, W, 3)
            assert H == W and H % 64 == 0 and H in SCALES_SQUARE
            for i in range(B):
                # each image's valid extent is square and a recipe size
                valid_rows = (~b["pad_mask"][i]).any(axis=1).sum()
                valid_cols = (~b["pad_mask"][i]).any(axis=0).sum()
                assert valid_rows == valid_cols and valid_rows in SCALES_SQUARE
                per_image_sizes.add(int(valid_rows))
                # padding is zero in the image tensor
                assert (b["images"][i][b["pad_mask"][i]] == 0).all()
    assert len(per_image_sizes) >= 3, "images should sample multiple sizes"


def test_loader_workers_deterministic(coco_dir):
    """--num_workers threads the per-image decode+transform; per-image rngs
    are spawned in index order so batches are bit-identical for any worker
    count (train with random augs AND eval)."""
    ds = CocoDetection(os.path.join(coco_dir, "val2017"),
                       os.path.join(coco_dir, "annotations/instances_val2017.json"))
    for train in (True, False):
        mk = lambda w: DetectionLoader(ds, batch_size=2, train=train,
                                       max_gt=10, seed=5, num_workers=w,
                                       per_image_scales=train)
        for b1, b4 in zip(mk(1), mk(4)):
            assert set(b1) == set(b4)
            for k in b1:
                np.testing.assert_array_equal(b1[k], b4[k])


@pytest.mark.slow
def test_legacy_recipe_shapes_are_model_compatible(coco_dir):
    """The legacy (non-square) recipe pads batches to 64-divisible extents:
    the window-major ViT needs H,W % 64 == 0 (16-px patches x 4 windows per
    side), and quantized pads bound the compiled shape set. Both train
    (multi-scale+crop) and eval (800/1333) paths, verified through a real
    model forward with the padding mask."""
    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.config import ModelConfig
    from lwdetr_tpu.models.lwdetr import build_model

    ds = CocoDetection(os.path.join(coco_dir, "val2017"),
                       os.path.join(coco_dir, "annotations/instances_val2017.json"))
    nano = ModelConfig(
        encoder="vit_tiny", vit_encoder_num_layers=2,
        window_block_indexes=(0,), out_feature_indexes=(0, 1),
        projector_scale=("P4",), hidden_dim=64, dim_feedforward=128,
        sa_nheads=4, ca_nheads=8, dec_n_points=2, dec_layers=2,
        group_detr=2, num_queries=12, num_select=10, num_classes=7,
        two_stage=True, bbox_reparam=True, lite_refpoint_refine=True)
    model = build_model(nano)

    for train in (True, False):
        loader = DetectionLoader(ds, batch_size=2, train=train, max_gt=10,
                                 seed=7, square_div_64=False,
                                 drop_last=False)
        b = next(iter(loader))
        H, W = b["images"].shape[1:3]
        assert H % 64 == 0 and W % 64 == 0, (train, H, W)
        assert "pad_mask" in b and b["pad_mask"].shape == (2, H, W)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(b["images"]), masks=jnp.asarray(b["pad_mask"]),
        train=False)
    out = model.apply(variables, jnp.asarray(b["images"]),
                      masks=jnp.asarray(b["pad_mask"]), train=False)
    assert np.isfinite(np.asarray(out["pred_logits"], np.float32)).all()


def test_cheating_model_gets_ap1(coco_dir):
    """GT-echo model through loader+eval: validates coordinate round trip."""
    ds = CocoDetection(os.path.join(coco_dir, "val2017"),
                       os.path.join(coco_dir, "annotations/instances_val2017.json"))
    loader = DetectionLoader(ds, batch_size=2, train=False, max_gt=10,
                             eval_size=256)
    evaluator = CocoEvaluator(ds.coco)
    seen = set()
    for batch in loader:
        # "model": output the padded GT as cxcywh normalized + scores
        from lwdetr_tpu.ops import box_ops

        boxes_xyxy = np.asarray(
            box_ops.box_cxcywh_to_xyxy(jnp.asarray(batch["boxes"])))
        # scale normalized xyxy to original size
        oh = batch["orig_size"][:, 0][:, None]
        ow = batch["orig_size"][:, 1][:, None]
        scale = np.stack([ow, oh, ow, oh], -1).reshape(-1, 1, 4)
        boxes_abs = boxes_xyxy * scale
        for i, img_id in enumerate(batch["image_id"].tolist()):
            if img_id in seen:
                continue
            seen.add(img_id)
            v = batch["valid"][i]
            evaluator.update({img_id: {
                "scores": np.linspace(0.9, 0.5, v.sum()),
                "labels": batch["labels"][i][v],
                "boxes": boxes_abs[i][v]}})
    stats = evaluator.summarize(verbose=False)
    assert stats["AP"] > 0.99, f"GT echo should give AP=1, got {stats['AP']}"
    assert stats["AR100"] > 0.99
