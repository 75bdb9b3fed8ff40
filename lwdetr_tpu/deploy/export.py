"""Deployment export: AOT compilation + StableHLO serialization.

TPU-native counterpart of the reference's ONNX -> TensorRT path
(/root/reference/deploy/export.py, deploy/_onnx/optimizer.py).  On TPU the
deployment artifact is a serialized `jax.export` StableHLO module — the
compiler-optimized equivalent of the folded/fused ONNX graph — plus the
weights.  The exported function mirrors the reference's export-mode forward
(lwdetr.py:176-195): mask-free, single query group, fused top-k postprocess,
returning (scores, labels, boxes).
"""
from __future__ import annotations

import os
import pickle

import numpy as np


def make_export_fn(model, num_select: int, input_hw, batch: int = 1):
    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.models.lwdetr import post_process

    h, w = input_hw

    def fn(variables, images):
        out = model.apply(variables, images, train=False)
        sizes = jnp.full((images.shape[0], 2), float(h), images.dtype)
        sizes = sizes.at[:, 1].set(float(w))
        return post_process(out["pred_logits"], out["pred_boxes"], sizes,
                            num_select=num_select)

    return fn


def export_serialized(model, variables, out_path: str, input_hw=(640, 640),
                      batch: int = 1, num_select: int = 300):
    """Serialize (StableHLO bytes, weights) to out_path.

    The StableHLO artifact is portable across hosts with the same jax
    version; weights ride alongside as a pickled numpy pytree.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    fn = make_export_fn(model, num_select, input_hw, batch)
    images = jax.ShapeDtypeStruct((batch, *input_hw, 3), jnp.float32)
    abstract_vars = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
    exported = jexport.export(jax.jit(fn))(abstract_vars, images)
    payload = {
        "stablehlo": exported.serialize(),
        "weights": jax.tree.map(np.asarray, variables),
        "input_hw": input_hw,
        "batch": batch,
        "num_select": num_select,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(payload, f)
    return out_path


def load_serialized(path: str):
    """Load an exported artifact; returns (callable, weights)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        payload = pickle.load(f)
    exported = jexport.deserialize(payload["stablehlo"])
    return exported.call, payload["weights"]


def export_main(args, cfg):
    """CLI entry (reference main.py:427-433 forces batch 1)."""
    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.models.lwdetr import build_model

    model = build_model(cfg.model, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, args.shape[0], args.shape[1], 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        sample, train=True)
    if getattr(args, "resume", ""):
        from lwdetr_tpu.train.checkpoint import load_pth

        variables = load_pth(args.resume, cfg.model)
    out = os.path.join(args.output_dir or "output", "lwdetr_export.stablehlo.pkl")
    path = export_serialized(
        model, dict(variables), out, input_hw=tuple(args.shape),
        batch=args.batch, num_select=cfg.model.num_select)
    print(f"exported to {path}")
    if getattr(args, "infer_dir", None):
        # smoke-run the serialized artifact on a real image (the reference
        # export.py:41-58 uses --infer_dir as the example input and checks
        # the exported graph runs)
        scores, labels, _ = run_artifact_on_image(
            path, args.infer_dir, tuple(args.shape))
        top = np.argsort(-scores[0])[:5]
        print("artifact smoke inference (top-5):",
              [(int(labels[0][i]), round(float(scores[0][i]), 4))
               for i in top])
    return path


def run_artifact_on_image(path: str, image_path: str, input_hw=(640, 640)):
    """Deserialize an exported artifact and run it on one image file.
    Returns (scores, labels, boxes) numpy arrays (batch 1)."""
    from PIL import Image

    from lwdetr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    fn, weights = load_serialized(path)
    img = Image.open(image_path).convert("RGB").resize(
        (input_hw[1], input_hw[0]), Image.BILINEAR)
    arr = (np.asarray(img, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    out = fn(weights, arr[None])
    return tuple(np.asarray(o) for o in out)
