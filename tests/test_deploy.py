"""Export round-trip: serialized StableHLO artifact reproduces direct apply
(the deploy-parity check the reference does via ONNX/TRT mAP re-eval,
deploy/benchmark.py:555-583 — here exact output equality is testable)."""
import numpy as np
import jax
import pytest
import jax.numpy as jnp

from lwdetr_tpu.config import ModelConfig
from lwdetr_tpu.deploy.export import export_serialized, load_serialized, make_export_fn
from lwdetr_tpu.models.lwdetr import build_model

NANO = ModelConfig(
    encoder="vit_tiny", vit_encoder_num_layers=2,
    window_block_indexes=(0,), out_feature_indexes=(0, 1),
    projector_scale=("P4",), hidden_dim=64, dim_feedforward=128,
    sa_nheads=4, ca_nheads=8, dec_n_points=2, dec_layers=2,
    group_detr=3, num_queries=12, num_select=10, num_classes=7,
    two_stage=True, bbox_reparam=True, lite_refpoint_refine=True)


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    model = build_model(NANO)
    images = np.random.default_rng(0).standard_normal(
        (1, 128, 128, 3)).astype(np.float32)
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(images), train=True))

    path = export_serialized(model, variables, str(tmp_path / "m.pkl"),
                             input_hw=(128, 128), batch=1,
                             num_select=NANO.num_select)
    call, weights = load_serialized(path)
    s2, l2, b2 = call(weights, images)

    fn = make_export_fn(model, NANO.num_select, (128, 128))
    s1, l1, b1 = fn(variables, jnp.asarray(images))

    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)


def test_export_artifact_smoke_on_image(tmp_path):
    """--infer_dir equivalent: the exported artifact runs on a real image
    file (reference export.py:41-58 builds the example input from it)."""
    from PIL import Image

    from lwdetr_tpu.deploy.export import run_artifact_on_image

    model = build_model(NANO)
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 128, 128, 3), jnp.float32), train=True))
    path = export_serialized(model, variables, str(tmp_path / "m.pkl"),
                             input_hw=(128, 128), batch=1,
                             num_select=NANO.num_select)
    img_path = str(tmp_path / "x.jpg")
    Image.fromarray(np.random.default_rng(1).integers(
        0, 255, (200, 300, 3), dtype=np.uint8)).save(img_path)
    scores, labels, boxes = run_artifact_on_image(path, img_path, (128, 128))
    assert scores.shape == (1, NANO.num_select)
    assert labels.shape == (1, NANO.num_select)
    assert boxes.shape == (1, NANO.num_select, 4)
    assert np.isfinite(scores).all() and np.isfinite(boxes).all()
