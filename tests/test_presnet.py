"""PResNet alternative backbone: shapes, concat-feature semantics, and the
res-encoder Backbone wiring (reference models/backbone/presnet.py:331-350)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwdetr_tpu.config import ModelConfig
from lwdetr_tpu.models.presnet import PResNet


@pytest.mark.slow
def test_res18vd_feature_shapes():
    m = PResNet(depth=18, return_idx=(1, 2, 3), freeze_norm=False)
    x = jnp.zeros((1, 128, 128, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    feats = m.apply(variables, x, train=False)
    assert len(feats) == 1
    # stages 1/2/3 pooled+upsampled to stride 16: 128/16 = 8
    assert feats[0].shape == (1, 8, 8, 128 + 256 + 512)
    assert m.out_channels == [896]


def test_res50vd_bottleneck_channels():
    m = PResNet(depth=50, return_idx=(1, 2, 3))
    assert m.out_channels == [4 * (128 + 256 + 512)]


@pytest.mark.slow
def test_lwdetr_with_resnet_backbone():
    cfg = ModelConfig(
        encoder="res18vd", projector_scale=("P4",), hidden_dim=64,
        dim_feedforward=128, sa_nheads=4, ca_nheads=8, dec_n_points=2,
        dec_layers=2, group_detr=2, num_queries=16, num_select=10,
        num_classes=7, two_stage=True, bbox_reparam=True,
        lite_refpoint_refine=True)
    from lwdetr_tpu.models.lwdetr import build_model

    model = build_model(cfg)
    images = jnp.zeros((1, 256, 256, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, train=True)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, images)
    assert out["pred_boxes"].shape == (1, 16, 4)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
