import numpy as np
import jax.numpy as jnp

from lwdetr_tpu.ops import box_ops


def _rand_boxes(n, rng):
    cxcywh = np.stack(
        [
            rng.uniform(0.2, 0.8, n),
            rng.uniform(0.2, 0.8, n),
            rng.uniform(0.05, 0.3, n),
            rng.uniform(0.05, 0.3, n),
        ],
        axis=-1,
    ).astype(np.float32)
    return cxcywh


def test_conversion_roundtrip():
    rng = np.random.default_rng(0)
    b = _rand_boxes(17, rng)
    xyxy = box_ops.box_cxcywh_to_xyxy(jnp.asarray(b))
    back = box_ops.box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), b, atol=1e-6)


def test_iou_giou_against_torch_reference():
    torch = __import__("torch")
    rng = np.random.default_rng(1)
    a = box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(9, rng)))
    b = box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(13, rng)))

    iou, _ = box_ops.box_iou(a, b)
    giou = box_ops.generalized_box_iou(a, b)

    # torch oracle implementing the reference util/box_ops.py math
    ta, tb = torch.tensor(np.asarray(a)), torch.tensor(np.asarray(b))

    def t_area(x):
        return (x[:, 2] - x[:, 0]) * (x[:, 3] - x[:, 1])

    area1, area2 = t_area(ta), t_area(tb)
    lt = torch.max(ta[:, None, :2], tb[None, :, :2])
    rb = torch.min(ta[:, None, 2:], tb[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    t_iou = inter / union
    lt2 = torch.min(ta[:, None, :2], tb[None, :, :2])
    rb2 = torch.max(ta[:, None, 2:], tb[None, :, 2:])
    wh2 = (rb2 - lt2).clamp(min=0)
    areac = wh2[..., 0] * wh2[..., 1]
    t_giou = t_iou - (areac - union) / areac

    np.testing.assert_allclose(np.asarray(iou), t_iou.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(giou), t_giou.numpy(), atol=1e-6)


def test_elementwise_matches_pairwise_diagonal():
    rng = np.random.default_rng(2)
    a = box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(8, rng)))
    b = box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(8, rng)))
    pair = box_ops.generalized_box_iou(a, b)
    elem = box_ops.elementwise_generalized_box_iou(a, b)
    np.testing.assert_allclose(np.asarray(elem), np.diag(np.asarray(pair)), atol=1e-6)
    pair_iou, _ = box_ops.box_iou(a, b)
    elem_iou = box_ops.elementwise_box_iou(a, b)
    np.testing.assert_allclose(np.asarray(elem_iou), np.diag(np.asarray(pair_iou)), atol=1e-6)
