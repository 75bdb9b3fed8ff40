"""Shape/finite-value/jit tests for the full LW-DETR model.

A reduced "nano" config keeps compiles fast on the CPU test mesh; the real
presets are exercised by the param-count test (eval_shape, no compile) and by
bench.py / __graft_entry__.py on hardware.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwdetr_tpu.config import ModelConfig, get_config
from lwdetr_tpu.models.lwdetr import build_model, post_process

NANO = ModelConfig(
    encoder="vit_tiny",
    vit_encoder_num_layers=2,
    window_block_indexes=(0,),
    out_feature_indexes=(0, 1),
    projector_scale=("P4",),
    hidden_dim=64,
    dim_feedforward=128,
    sa_nheads=4,
    ca_nheads=8,
    dec_n_points=2,
    dec_layers=2,
    group_detr=3,
    num_queries=12,
    num_select=10,
    num_classes=7,
    two_stage=True,
    bbox_reparam=True,
    lite_refpoint_refine=True,
)


@pytest.fixture(scope="module")
def nano_setup():
    model = build_model(NANO)
    images = jnp.zeros((2, 128, 128, 3), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, train=True)
    return model, params


def _count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


@pytest.mark.parametrize(
    "preset,expected_m",
    [("tiny", 12.1), ("small", 14.6), ("medium", 28.2), ("large", 46.8), ("xlarge", 118.0)],
)
def test_param_counts_match_reference(preset, expected_m):
    # reference README.md:352-356 params column; eval_shape avoids compiling
    cfg = get_config(preset)
    model = build_model(cfg.model)
    images = jax.ShapeDtypeStruct((1, 640, 640, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda img: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            img, train=True),
        images)
    n = _count(shapes["params"]) / 1e6
    assert abs(n - expected_m) / expected_m < 0.05, f"{preset}: {n:.2f}M vs {expected_m}M"


def test_eval_forward_shapes(nano_setup):
    model, params = nano_setup
    images = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 128, 128, 3)), jnp.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, train=False))(params, images)
    Q, K = NANO.num_queries, NANO.num_classes
    assert out["pred_logits"].shape == (2, Q, K)
    assert out["pred_boxes"].shape == (2, Q, 4)
    assert len(out["aux_outputs"]) == NANO.dec_layers - 1
    assert out["enc_outputs"]["pred_logits"].shape == (2, Q, K)
    for v in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(v)).all()
    assert (np.asarray(out["pred_boxes"])[..., 2:] > 0).all()  # wh positive


def test_train_forward_group_queries(nano_setup):
    model, params = nano_setup
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    out = jax.jit(lambda p, x: model.apply(
        p, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])[0])(params, images)
    G, Q = NANO.group_detr, NANO.num_queries
    assert out["pred_logits"].shape == (1, Q * G, NANO.num_classes)
    assert out["enc_outputs"]["pred_logits"].shape == (1, Q * G, NANO.num_classes)


def test_jit_and_post_process(nano_setup):
    model, params = nano_setup

    @jax.jit
    def fwd(p, x):
        out = model.apply(p, x, train=False)
        sizes = jnp.asarray([[480.0, 640.0], [320.0, 320.0]])
        return out, post_process(
            out["pred_logits"], out["pred_boxes"], sizes, num_select=NANO.num_select)

    out, (scores, labels, boxes) = fwd(params, jnp.zeros((2, 128, 128, 3), jnp.float32))
    assert scores.shape == (2, NANO.num_select)
    assert boxes.shape == (2, NANO.num_select, 4)
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all(), "scores must be sorted desc"


def test_masked_forward(nano_setup):
    model, params = nano_setup
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    masks = np.zeros((1, 128, 128), bool)
    masks[:, 96:, :] = True
    out = jax.jit(lambda p, x, m: model.apply(p, x, masks=m, train=False))(
        params, images, jnp.asarray(masks))
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_non_lite_iterative_refine():
    cfg = dataclasses.replace(NANO, lite_refpoint_refine=False)
    model = build_model(cfg)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, train=True)
    out = jax.jit(lambda p, x: model.apply(p, x, train=False))(params, images)
    assert out["pred_boxes"].shape == (1, cfg.num_queries, 4)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
