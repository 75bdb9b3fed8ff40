"""Import the reference torch model with lightweight shims.

The reference (/root/reference) depends on torchvision, timm, fairscale,
pycocotools and the compiled MultiScaleDeformableAttention CUDA extension —
none available here. For full-model numeric parity tests we only need the
model graph, so we install minimal functional stand-ins:

* torchvision: box_area (util/box_ops.py:18), ops.misc.interpolate
  (util/misc.py:478), _is_tracing, datasets.CocoDetection (import-only).
* timm.models.layers: DropPath / Mlp / trunc_normal_ with timm's parameter
  naming (mlp.fc1/fc2 — the checkpoint namespace depends on it).
* fairscale checkpoint_wrapper: identity (only used with --use_checkpoint).
* MultiScaleDeformableAttention: import-only stub; tests force the pure
  grid_sample path by setting `_export=True` on each MSDeformAttn module
  (reference models/ops/modules/ms_deform_attn.py:133-136).
* pycocotools: import-only stubs so `import main` (argparse defaults) works.
"""
from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REF_ROOT = "/root/reference"


def _mk(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = []  # mark as package so `import pkg.sub` resolves
    sys.modules[name] = mod
    return mod


def install_shims() -> None:
    if "torchvision" in sys.modules and hasattr(sys.modules["torchvision"], "_lwdetr_shim"):
        return

    # ---- torchvision ----
    tv = _mk("torchvision")
    tv._lwdetr_shim = True
    tv.__version__ = "0.15.2"
    tv._is_tracing = lambda: False
    tv_ops = _mk("torchvision.ops")
    tv_boxes = _mk("torchvision.ops.boxes")

    def box_area(boxes: torch.Tensor) -> torch.Tensor:
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    tv_boxes.box_area = box_area
    tv_misc = _mk("torchvision.ops.misc")
    tv_misc.interpolate = lambda input, size, scale_factor, mode, align_corners: (
        F.interpolate(input, size, scale_factor, mode, align_corners))
    tv_ops.boxes = tv_boxes
    tv_ops.misc = tv_misc
    tv.ops = tv_ops
    tv_datasets = _mk("torchvision.datasets")

    class CocoDetection:  # import-only
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision shim: CocoDetection unavailable")

    tv_datasets.CocoDetection = CocoDetection
    tv.datasets = tv_datasets
    tv_transforms = _mk("torchvision.transforms")
    tv_transforms_f = _mk("torchvision.transforms.functional")
    tv_transforms.functional = tv_transforms_f
    tv.transforms = tv_transforms

    # ---- timm (param names must match the released checkpoints) ----
    timm = _mk("timm")
    timm_models = _mk("timm.models")
    timm_layers = _mk("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    timm_layers.DropPath = DropPath
    timm_layers.Mlp = Mlp
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm_models.layers = timm_layers
    timm.models = timm_models

    # ---- fairscale ----
    fairscale = _mk("fairscale")
    fs_nn = _mk("fairscale.nn")
    fs_ckpt = _mk("fairscale.nn.checkpoint")
    fs_ckpt.checkpoint_wrapper = lambda m, *a, **k: m
    fs_nn.checkpoint = fs_ckpt
    fairscale.nn = fs_nn

    # ---- compiled CUDA extension (import-only) ----
    msda = _mk("MultiScaleDeformableAttention")

    def _unavailable(*a, **k):
        raise RuntimeError("CUDA MSDA unavailable; set _export=True on "
                           "MSDeformAttn modules to use the pure-torch path")

    msda.ms_deform_attn_forward = _unavailable
    msda.ms_deform_attn_backward = _unavailable

    # reference transforms.py annotates with PIL.Image after a bare
    # `import PIL`; pre-import the submodule so the attribute exists
    import PIL.Image  # noqa: F401

    # ---- pycocotools (import-only) ----
    pct = _mk("pycocotools")
    pct_coco = _mk("pycocotools.coco")

    class COCO:
        def __init__(self, *a, **k):
            raise RuntimeError("pycocotools shim")

    pct_coco.COCO = COCO
    pct_eval = _mk("pycocotools.cocoeval")

    class COCOeval:
        def __init__(self, *a, **k):
            raise RuntimeError("pycocotools shim")

    pct_eval.COCOeval = COCOeval
    pct_mask = _mk("pycocotools.mask")
    pct.coco = pct_coco
    pct.cocoeval = pct_eval
    pct.mask = pct_mask


# Top-level module names the reference tree claims. Importing them naively
# would shadow the repo's own `main` (and any future top-level collisions)
# in sys.modules for the rest of the pytest process — `from main import
# get_args_parser` in a later test would silently get the REFERENCE CLI
# (order-dependent failures). We import once, cache the module objects,
# and scrub every reference entry back out of sys.modules.
_REF_TOP_LEVEL = ("main", "models", "util", "datasets", "engine", "deploy")
_REF_CACHE = None


def import_reference():
    """Import the reference tree without polluting sys.modules.

    Returns (ref_main, ref_models). The reference's internal cross-module
    references are bound at import time, so the module objects keep working
    after their sys.modules entries are removed."""
    global _REF_CACHE
    if _REF_CACHE is not None:
        return _REF_CACHE
    install_shims()
    saved = {}
    for key in list(sys.modules):
        if key.split(".", 1)[0] in _REF_TOP_LEVEL:
            saved[key] = sys.modules.pop(key)
    sys.path.insert(0, REF_ROOT)
    try:
        import main as ref_main  # noqa: F401  (argparse defaults)
        import models as ref_models
    finally:
        if REF_ROOT in sys.path:
            sys.path.remove(REF_ROOT)
        for key in list(sys.modules):
            if key.split(".", 1)[0] in _REF_TOP_LEVEL:
                del sys.modules[key]
        sys.modules.update(saved)

    _REF_CACHE = (ref_main, ref_models)
    return _REF_CACHE


_COMMON_FLAGS = [
    "--dec_layers", "3", "--group_detr", "13", "--two_stage",
    "--bbox_reparam", "--lite_refpoint_refine",
    "--ia_bce_loss", "--cls_loss_coef", "1",
    "--dataset_file", "coco", "--coco_path", "/nonexistent",
    "--square_resize_div_64", "--device", "cpu",
]

# scripts/lwdetr_{size}_coco_train.sh flag sets (model-shape subset)
_SIZE_FLAGS = {
    "tiny": [
        "--encoder", "vit_tiny", "--vit_encoder_num_layers", "6",
        "--window_block_indexes", "0", "2", "4",
        "--out_feature_indexes", "1", "3", "5",
        "--projector_scale", "P4", "--hidden_dim", "256",
        "--sa_nheads", "8", "--ca_nheads", "16", "--dec_n_points", "2",
        "--num_queries", "100", "--num_select", "100",
    ],
    "small": [
        "--encoder", "vit_tiny", "--vit_encoder_num_layers", "10",
        "--window_block_indexes", "0", "1", "3", "6", "7", "9",
        "--out_feature_indexes", "2", "4", "5", "9",
        "--projector_scale", "P4", "--hidden_dim", "256",
        "--sa_nheads", "8", "--ca_nheads", "16", "--dec_n_points", "2",
        "--num_queries", "300", "--num_select", "300",
    ],
    "large": [
        "--encoder", "vit_small", "--drop_path", "0.1",
        "--vit_encoder_num_layers", "10",
        "--window_block_indexes", "0", "1", "3", "6", "7", "9",
        "--out_feature_indexes", "2", "4", "5", "9",
        "--projector_scale", "P3", "P5", "--hidden_dim", "384",
        "--sa_nheads", "12", "--ca_nheads", "24", "--dec_n_points", "4",
        "--num_select", "300",
    ],
}


def size_args(ref_main, size: str = "tiny", **overrides):
    """Parse a release flag set (scripts/lwdetr_{size}_coco_train.sh)
    through the reference's own argparse for authentic defaults."""
    parser = ref_main.get_args_parser()
    import argparse

    args = argparse.ArgumentParser("wrap", parents=[parser]).parse_args(
        _SIZE_FLAGS[size] + _COMMON_FLAGS)
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def tiny_args(ref_main, **overrides):
    return size_args(ref_main, "tiny", **overrides)


def force_pure_deform_attn(model: nn.Module) -> None:
    """Route every MSDeformAttn through the grid_sample reference path
    (ms_deform_attn.py:133 `if self._export or ...`) — CPU-runnable."""
    for m in model.modules():
        if type(m).__name__ == "MSDeformAttn":
            m._export = True
