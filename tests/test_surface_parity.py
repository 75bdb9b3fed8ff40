"""Secondary-surface parity: o365 dataset path, preset num_classes dispatch,
and the learned position embedding variant.

Reference: datasets/o365.py:18-50 (COCO-format json under different names),
models/__init__.py num_classes dispatch, position_encoding.py:98-128.
"""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from lwdetr_tpu.config import DataConfig, ModelConfig
from lwdetr_tpu.models.lwdetr import build_model
from tests.test_train import NANO


@pytest.fixture(scope="module")
def o365_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("o365")
    (root / "train").mkdir()
    (root / "val").mkdir()
    rng = np.random.default_rng(1)
    for split, ann_name in (("train", "objects365_train.json"),
                            ("val", "objects365_minival5k.json")):
        images, annotations = [], []
        for img_id in range(1, 4):
            w, h = 64, 48
            arr = rng.integers(0, 255, (h, w, 3), np.uint8)
            Image.fromarray(arr).save(root / split / f"obj365_{img_id}.jpg")
            images.append({"id": img_id, "file_name": f"obj365_{img_id}.jpg",
                           "width": w, "height": h})
            annotations.append({
                "id": img_id, "image_id": img_id,
                "category_id": int(rng.integers(1, 366)),
                "bbox": [4.0, 4.0, 20.0, 16.0], "area": 320.0, "iscrowd": 0})
        with open(root / ann_name, "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": [{"id": i, "name": f"o{i}"}
                                      for i in range(1, 366)]}, f)
    return str(root)


def test_o365_dataset_loads(o365_dir):
    from lwdetr_tpu.data.coco import build_dataset
    from lwdetr_tpu.data.loader import DetectionLoader

    dcfg = DataConfig(dataset_file="o365", coco_path=o365_dir,
                      square_resize_div_64=True)
    for split in ("train", "val"):
        ds = build_dataset(split, dcfg)
        assert len(ds) == 3
    loader = DetectionLoader(build_dataset("val", dcfg), batch_size=2,
                             train=False, max_gt=8, eval_size=64)
    batch = next(iter(loader))
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["valid"][:, 0].all()


@pytest.mark.slow
def test_o365_eval_e2e(o365_dir, tmp_path):
    """Full CLI path on the o365 layout: build_dataset('o365') -> loader ->
    jitted eval (incl. criterion losses) -> evaluator. The pretrain
    launchers (scripts_pretrain/*.sh) drive exactly this surface with
    --dataset_file o365 (reference datasets/o365.py:18-50)."""
    from main import get_args_parser, main

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    args = parser.parse_args([
        "--encoder", "vit_tiny", "--vit_encoder_num_layers", "2",
        "--window_block_indexes", "0", "--out_feature_indexes", "0", "1",
        "--projector_scale", "P4", "--hidden_dim", "64",
        "--dim_feedforward", "128", "--sa_nheads", "4", "--ca_nheads", "8",
        "--dec_n_points", "2", "--dec_layers", "2", "--group_detr", "2",
        "--num_queries", "12", "--num_select", "10", "--two_stage",
        "--bbox_reparam", "--lite_refpoint_refine", "--ia_bce_loss",
        "--batch_size", "8", "--max_gt", "10", "--dataset_file", "o365",
        "--coco_path", o365_dir, "--square_resize_div_64", "--eval",
        "--dont_bench", "--output_dir", str(tmp_path)])
    cfg = __import__("main").config_from_args(args)
    assert cfg.model.num_classes == 366
    main(args)  # must complete: random weights -> AP 0.0 is fine


def test_preset_o365_sets_366_classes():
    from main import config_from_args, get_args_parser

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    args = parser.parse_args(
        ["--preset", "small", "--dataset_file", "o365", "--coco_path", "/x"])
    cfg = config_from_args(args)
    assert cfg.model.num_classes == 366
    args = parser.parse_args(
        ["--preset", "small", "--dataset_file", "coco", "--coco_path", "/x"])
    assert config_from_args(args).model.num_classes == 91


def test_learned_position_embedding_params_and_equivalence():
    """--position_embedding learned creates the reference's 50x50 row/col
    params; outputs are identical to sine because the decoder ignores pos
    (verified against reference transformer.py:466-517)."""
    import dataclasses

    cfg_l = dataclasses.replace(NANO, position_embedding="learned")
    model_s = build_model(NANO)
    model_l = build_model(cfg_l)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 2), (1, 128, 128, 3))

    vars_l = model_l.init({"params": rng, "dropout": rng}, x, train=False)
    pe = vars_l["params"]["pos_embedding"]
    assert pe["row_embed"].shape == (50, NANO.hidden_dim // 2)
    assert pe["col_embed"].shape == (50, NANO.hidden_dim // 2)

    # same seed init of the sine model shares every non-pos param;
    # outputs must agree exactly since pos embeds are unused
    vars_s = model_s.init({"params": rng, "dropout": rng}, x, train=False)
    out_l = model_l.apply(vars_l, x, train=False)
    params_sub = {k: v for k, v in vars_l["params"].items()
                  if k != "pos_embedding"}
    out_s = model_s.apply(
        {"params": params_sub, **{k: v for k, v in vars_l.items()
                                  if k != "params"}}, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_l["pred_logits"]),
                                  np.asarray(out_s["pred_logits"]))


def test_learned_pos_bridge_keys():
    """Checkpoint bridge covers backbone.1.{row,col}_embed.weight."""
    import dataclasses

    from lwdetr_tpu.train.checkpoint import build_mapping

    cfg_l = dataclasses.replace(NANO, position_embedding="learned")
    keys = {e[0] for e in build_mapping(cfg_l)}
    assert "backbone.1.row_embed.weight" in keys
    assert "backbone.1.col_embed.weight" in keys
    keys_sine = {e[0] for e in build_mapping(NANO)}
    assert "backbone.1.row_embed.weight" not in keys_sine
