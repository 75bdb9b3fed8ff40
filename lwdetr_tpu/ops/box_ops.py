"""Box utilities on normalized or absolute coordinates (pure jnp).

Mirrors the semantics of the reference /root/reference/util/box_ops.py
(cxcywh<->xyxy conversion, pairwise IoU and generalized IoU) as pure,
vmappable JAX functions.  All functions are shape-polymorphic over leading
dims and operate on the trailing 4-dim.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; trailing dim 4 -> scalar."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of xyxy boxes.

    boxes1: (..., N, 4), boxes2: (..., M, 4) -> iou (..., N, M), union (..., N, M)
    """
    area1 = box_area(boxes1)  # (..., N)
    area2 = box_area(boxes2)  # (..., M)

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])

    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]  # (..., N, M)

    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / union
    return iou, union


def elementwise_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU between aligned boxes (..., 4) vs (..., 4) -> (...)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU (https://giou.stanford.edu/) of xyxy boxes.

    boxes1: (..., N, 4), boxes2: (..., M, 4) -> (..., N, M).
    Boxes are expected in [x0, y0, x1, y1] with x1>=x0, y1>=y0 (degenerate
    boxes produce NaN/Inf exactly like the reference; callers mask).
    """
    iou, union = box_iou(boxes1, boxes2)

    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])

    wh = jnp.clip(rb - lt, 0.0, None)
    area = wh[..., 0] * wh[..., 1]

    return iou - (area - union) / area


def elementwise_generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """GIoU between aligned boxes (..., 4) vs (..., 4) -> (...)."""
    iou = elementwise_box_iou(boxes1, boxes2)
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    lt_c = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_c = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0.0, None)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / area_c
