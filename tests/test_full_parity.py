"""Full-model numeric parity vs the reference torch implementation.

Builds the reference LWDETR (tiny preset, /root/reference/models/lwdetr.py:562-619)
through the shims in ref_shims.py, transfers OUR randomly-initialized flax
weights into it via the checkpoint bridge (train/checkpoint.py flax_to_torch),
and asserts end-to-end eval- and train-mode outputs agree to fp32 tolerance.
This is the test that fails on any silent layout / half-pixel / transpose
error anywhere in the stack (VERDICT r1 "What's missing" #1).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import torch

import ref_shims

pytestmark = pytest.mark.slow  # torch reference build: ~80s setup
from lwdetr_tpu.config import get_config
from lwdetr_tpu.models.lwdetr import build_model, post_process
from lwdetr_tpu.train import checkpoint as ckpt


@pytest.fixture(scope="module")
def ref_tiny():
    ref_main, ref_models = ref_shims.import_reference()
    args = ref_shims.tiny_args(ref_main)
    model, _criterion, post = ref_models.build_model(args)
    model.eval()
    ref_shims.force_pure_deform_attn(model)
    return model, post


@pytest.fixture(scope="module")
def our_tiny():
    cfg = get_config("tiny")
    model = build_model(cfg.model)
    images = jnp.zeros((2, 256, 256, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, train=True)
    return cfg, model, variables


@pytest.fixture(scope="module")
def bridged(ref_tiny, our_tiny):
    """Load our flax init into the torch reference model; full coverage."""
    ref_model, _ = ref_tiny
    cfg, _model, variables = our_tiny
    sd = ckpt.flax_to_torch(variables, cfg.model)
    tensors = {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = ref_model.load_state_dict(tensors, strict=False)
    # BN num_batches_tracked counters are torch bookkeeping, not weights
    missing = [k for k in missing if not k.endswith("num_batches_tracked")]
    assert not missing, f"bridge does not cover torch keys: {missing[:10]}"
    assert not unexpected, f"bridge produces unknown keys: {unexpected[:10]}"
    return ref_model


def _images(batch=2, size=256, seed=3):
    rng = np.random.default_rng(seed)
    # normalized-image value range
    return rng.standard_normal((batch, size, size, 3)).astype(np.float32)


def test_eval_forward_parity(bridged, our_tiny):
    cfg, model, variables = our_tiny
    x = _images()

    with torch.no_grad():
        ref_out = bridged(torch.tensor(x).permute(0, 3, 1, 2))

    out = model.apply(variables, jnp.asarray(x), train=False)

    ref_logits = ref_out["pred_logits"].numpy()
    ref_boxes = ref_out["pred_boxes"].numpy()
    np.testing.assert_allclose(np.asarray(out["pred_logits"]), ref_logits,
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["pred_boxes"]), ref_boxes,
                               atol=2e-5, rtol=1e-4)


def test_eval_enc_outputs_parity(bridged, our_tiny):
    cfg, model, variables = our_tiny
    x = _images(seed=4)

    with torch.no_grad():
        ref_out = bridged(torch.tensor(x).permute(0, 3, 1, 2))
    out = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(
        np.asarray(out["enc_outputs"]["pred_logits"]),
        ref_out["enc_outputs"]["pred_logits"].numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["enc_outputs"]["pred_boxes"]),
        ref_out["enc_outputs"]["pred_boxes"].numpy(), atol=2e-5, rtol=1e-4)


def test_train_forward_parity(bridged, our_tiny):
    """Train mode: 13 query groups, aux outputs, BN batch stats.

    Deterministic because dropout=0 and drop_path=0 in the tiny config.
    """
    cfg, model, variables = our_tiny
    x = _images(seed=5)

    # train-mode forward updates BN running stats even under no_grad;
    # snapshot/restore so later tests see the bridged weights unchanged
    saved = {k: v.clone() for k, v in bridged.state_dict().items()}
    bridged.train()
    try:
        with torch.no_grad():
            ref_out = bridged(torch.tensor(x).permute(0, 3, 1, 2))
    finally:
        bridged.eval()
        bridged.load_state_dict(saved)

    out, _ = model.apply(
        variables, jnp.asarray(x), train=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
        mutable=["batch_stats"])

    assert out["pred_logits"].shape == tuple(ref_out["pred_logits"].shape)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               ref_out["pred_logits"].numpy(),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["pred_boxes"]),
                               ref_out["pred_boxes"].numpy(),
                               atol=5e-5, rtol=1e-4)
    assert len(out["aux_outputs"]) == len(ref_out["aux_outputs"])
    for ours, ref in zip(out["aux_outputs"], ref_out["aux_outputs"]):
        np.testing.assert_allclose(np.asarray(ours["pred_logits"]),
                                   ref["pred_logits"].numpy(),
                                   atol=5e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ours["pred_boxes"]),
                                   ref["pred_boxes"].numpy(),
                                   atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["enc_outputs"]["pred_logits"]),
        ref_out["enc_outputs"]["pred_logits"].numpy(), atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["enc_outputs"]["pred_boxes"]),
        ref_out["enc_outputs"]["pred_boxes"].numpy(), atol=5e-5, rtol=1e-4)


def test_eval_forward_parity_large():
    """Large preset: covers P3/P5 projector scales (ConvTranspose up / strided
    down paths), 4-point deformable attention, 12/24 heads, vit_small widths,
    drop_path flag plumbing (inactive at eval)."""
    ref_main, ref_models = ref_shims.import_reference()
    args = ref_shims.size_args(ref_main, "large")
    ref_model, _criterion, _post = ref_models.build_model(args)
    ref_model.eval()
    ref_shims.force_pure_deform_attn(ref_model)

    cfg = get_config("large")
    model = build_model(cfg.model)
    images = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)},
        images, train=True)

    sd = ckpt.flax_to_torch(variables, cfg.model)
    tensors = {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = ref_model.load_state_dict(tensors, strict=False)
    missing = [k for k in missing if not k.endswith("num_batches_tracked")]
    assert not missing, f"bridge does not cover torch keys: {missing[:10]}"
    assert not unexpected, f"bridge produces unknown keys: {unexpected[:10]}"

    x = _images(batch=1, seed=9)
    with torch.no_grad():
        ref_out = ref_model(torch.tensor(x).permute(0, 3, 1, 2))
    out = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               ref_out["pred_logits"].numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["pred_boxes"]),
                               ref_out["pred_boxes"].numpy(),
                               atol=2e-5, rtol=1e-4)


def test_postprocess_parity(bridged, our_tiny, ref_tiny):
    """PostProcess decode parity (reference lwdetr.py:509-544)."""
    _, ref_post = ref_tiny
    cfg, model, variables = our_tiny
    x = _images(seed=6)

    with torch.no_grad():
        ref_out = bridged(torch.tensor(x).permute(0, 3, 1, 2))
        sizes = torch.tensor([[480.0, 640.0], [480.0, 640.0]])
        ref_res = ref_post["bbox"](ref_out, sizes)

    out = model.apply(variables, jnp.asarray(x), train=False)
    scores, labels, boxes = post_process(
        out["pred_logits"], out["pred_boxes"],
        jnp.asarray([[480.0, 640.0], [480.0, 640.0]]),
        num_select=cfg.model.num_select)

    def _canonical(s, l, bx):
        # top-k order between the two stacks can differ on (near-)score
        # ties; canonicalize by (rounded -score, label, x0) before the
        # element-wise comparison so ties cannot flake the test
        order = np.lexsort((bx[:, 0], l, -np.round(s, 4)))
        return s[order], l[order], bx[order]

    for b in range(2):
        s0, l0, b0 = _canonical(np.asarray(scores[b]),
                                np.asarray(labels[b]), np.asarray(boxes[b]))
        s1, l1, b1 = _canonical(ref_res[b]["scores"].numpy(),
                                ref_res[b]["labels"].numpy(),
                                ref_res[b]["boxes"].numpy())
        np.testing.assert_allclose(s0, s1, atol=1e-4, rtol=1e-4)
        np.testing.assert_array_equal(l0, l1)
        np.testing.assert_allclose(b0, b1, atol=1e-2, rtol=1e-4)
