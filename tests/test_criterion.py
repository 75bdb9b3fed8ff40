"""Criterion parity vs a torch oracle restating /root/reference/models/lwdetr.py:218-506.

The oracle uses unpadded per-image targets, scipy matching, and the
scatter-based loss formulation; ours uses padded targets and scatter-free
gathered corrections.  For random (tie-free) costs both must agree to fp32
tolerance, validating matcher + gather + all loss variants end to end.
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F
from scipy.optimize import linear_sum_assignment

from lwdetr_tpu.config import ModelConfig, TrainConfig
from lwdetr_tpu.models.criterion import SetCriterion, Targets

B, G, Qg, K, T = 2, 2, 8, 6, 5
N_VALID = [3, 5]


def t_cxcywh_to_xyxy(b):
    cx, cy, w, h = b.unbind(-1)
    return torch.stack([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], -1)


def t_box_iou(a, b):
    area1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union, union


def t_giou(a, b):
    iou, union = t_box_iou(a, b)
    lt = torch.min(a[:, None, :2], b[None, :, :2])
    rb = torch.max(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def oracle_match(logits, boxes, tgt_labels, tgt_boxes, group_detr):
    """reference matcher.py:49-111 (scipy, per image per group)."""
    bs, num_queries = logits.shape[:2]
    out_prob = logits.flatten(0, 1).sigmoid()
    out_bbox = boxes.flatten(0, 1)
    tgt_ids = torch.cat(tgt_labels)
    tgt_bbox = torch.cat(tgt_boxes)
    cost_giou = -t_giou(t_cxcywh_to_xyxy(out_bbox), t_cxcywh_to_xyxy(tgt_bbox))
    alpha, gamma = 0.25, 2.0
    neg = (1 - alpha) * (out_prob**gamma) * (-(1 - out_prob + 1e-8).log())
    pos = alpha * ((1 - out_prob) ** gamma) * (-(out_prob + 1e-8).log())
    cost_class = pos[:, tgt_ids] - neg[:, tgt_ids]
    cost_bbox = torch.cdist(out_bbox, tgt_bbox, p=1)
    C = 5 * cost_bbox + 2 * cost_class + 2 * cost_giou
    C = C.view(bs, num_queries, -1)
    sizes = [len(v) for v in tgt_boxes]
    g_num = num_queries // group_detr
    C_list = C.split(g_num, dim=1)
    indices = None
    for g in range(group_detr):
        Cg = C_list[g]
        ind_g = [linear_sum_assignment(c[i]) for i, c in enumerate(Cg.split(sizes, -1))]
        if g == 0:
            indices = ind_g
        else:
            indices = [
                (np.concatenate([i1[0], i2[0] + g_num * g]), np.concatenate([i1[1], i2[1]]))
                for i1, i2 in zip(indices, ind_g)
            ]
    return [(torch.as_tensor(i), torch.as_tensor(j)) for i, j in indices]


def oracle_losses(out, tgt_labels, tgt_boxes, num_boxes, group_detr, variant):
    logits, boxes = out["pred_logits"], out["pred_boxes"]
    indices = oracle_match(logits, boxes, tgt_labels, tgt_boxes, group_detr)
    batch_idx = torch.cat([torch.full_like(s, i) for i, (s, _) in enumerate(indices)])
    src_idx = torch.cat([s for (s, _) in indices])
    idx = (batch_idx, src_idx)
    target_classes_o = torch.cat([t[J] for t, (_, J) in zip(tgt_labels, indices)])
    src_boxes = boxes[idx]
    target_boxes = torch.cat([t[i] for t, (_, i) in zip(tgt_boxes, indices)], dim=0)

    # classification (reference lwdetr.py:266-339)
    alpha, gamma = 0.25, 2.0
    prob = logits.sigmoid()
    iou_t = torch.diag(t_box_iou(
        t_cxcywh_to_xyxy(src_boxes.detach()), t_cxcywh_to_xyxy(target_boxes))[0])
    pos_ind = [batch_idx, src_idx, target_classes_o]
    if variant == "ia_bce":
        pos_w = torch.zeros_like(logits)
        neg_w = prob**gamma
        t = prob[pos_ind].pow(alpha) * iou_t.pow(1 - alpha)
        t = torch.clamp(t, 0.01).detach()
        pos_w[pos_ind] = t
        neg_w[pos_ind] = 1 - t
        loss_ce = (-pos_w * prob.log() - neg_w * (1 - prob).log()).sum() / num_boxes
    elif variant == "focal":
        tc = torch.zeros_like(logits)
        tc[pos_ind] = 1.0
        ce = F.binary_cross_entropy_with_logits(logits, tc, reduction="none")
        p_t = prob * tc + (1 - prob) * (1 - tc)
        loss = ce * ((1 - p_t) ** gamma)
        loss = (alpha * tc + (1 - alpha) * (1 - tc)) * loss
        loss_ce = loss.mean(1).sum() / num_boxes * logits.shape[1]
    elif variant == "varifocal":
        tc = torch.zeros_like(logits)
        tc[pos_ind] = iou_t
        fw = tc * (tc > 0).float() + (1 - alpha) * (prob - tc).abs().pow(gamma) * (tc <= 0).float()
        ce = F.binary_cross_entropy_with_logits(logits, tc, reduction="none")
        loss_ce = (ce * fw).mean(1).sum() / num_boxes * logits.shape[1]
    elif variant == "position_supervised":
        tc = torch.zeros_like(logits)
        tc[pos_ind] = iou_t
        norm = tc / (tc.view(tc.shape[0], -1, 1).amax(1, True) + 1e-8)
        ce = F.binary_cross_entropy_with_logits(logits, norm, reduction="none")
        loss = ce * (torch.abs(norm - prob) ** gamma)
        loss = (alpha * (norm > 0).float() + (1 - alpha) * (norm <= 0).float()) * loss
        loss_ce = loss.mean(1).sum() / num_boxes * logits.shape[1]

    loss_bbox = F.l1_loss(src_boxes, target_boxes, reduction="none").sum() / num_boxes
    loss_giou = (1 - torch.diag(t_giou(
        t_cxcywh_to_xyxy(src_boxes), t_cxcywh_to_xyxy(target_boxes)))).sum() / num_boxes
    return {"loss_ce": loss_ce, "loss_bbox": loss_bbox, "loss_giou": loss_giou}


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    def rand_out(n):
        return {
            "pred_logits": rng.standard_normal((B, n, K)).astype(np.float32),
            "pred_boxes": np.stack([
                rng.uniform(0.3, 0.7, (B, n)), rng.uniform(0.3, 0.7, (B, n)),
                rng.uniform(0.1, 0.3, (B, n)), rng.uniform(0.1, 0.3, (B, n)),
            ], -1).astype(np.float32),
        }
    out = rand_out(G * Qg)
    out["aux_outputs"] = [rand_out(G * Qg)]
    out["enc_outputs"] = rand_out(G * Qg)
    labels = rng.integers(0, K, (B, T)).astype(np.int32)
    boxes = np.stack([
        rng.uniform(0.3, 0.7, (B, T)), rng.uniform(0.3, 0.7, (B, T)),
        rng.uniform(0.1, 0.3, (B, T)), rng.uniform(0.1, 0.3, (B, T)),
    ], -1).astype(np.float32)
    valid = np.zeros((B, T), bool)
    for b, n in enumerate(N_VALID):
        valid[b, :n] = True
    return out, labels, boxes, valid


def _to_jnp_out(out):
    r = {k: jnp.asarray(v) for k, v in out.items() if k.startswith("pred")}
    if "aux_outputs" in out:
        r["aux_outputs"] = [_to_jnp_out(a) for a in out["aux_outputs"]]
    if "enc_outputs" in out:
        r["enc_outputs"] = _to_jnp_out(out["enc_outputs"])
    return r


def _run_variant(variant):
    out, labels, boxes, valid = make_data()
    mcfg = ModelConfig(group_detr=G, num_queries=Qg, num_classes=K,
                       dec_layers=2, two_stage=True, aux_loss=True)
    tcfg = TrainConfig(
        ia_bce_loss=(variant == "ia_bce"),
        use_varifocal_loss=(variant == "varifocal"),
        use_position_supervised_loss=(variant == "position_supervised"),
        cls_loss_coef=1.0,
    )
    crit = SetCriterion(mcfg, tcfg)
    targets = Targets(jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid))
    total, losses = crit(_to_jnp_out(out), targets, train=True)

    # torch oracle
    t_labels = [torch.tensor(labels[b, :N_VALID[b]].astype(np.int64)) for b in range(B)]
    t_boxes = [torch.tensor(boxes[b, :N_VALID[b]]) for b in range(B)]
    num_boxes = sum(N_VALID) * G
    for key, o in [("", out), ("_0", out["aux_outputs"][0]), ("_enc", out["enc_outputs"])]:
        ref = oracle_losses(
            {k: torch.tensor(v) for k, v in o.items() if k.startswith("pred")},
            t_labels, t_boxes, num_boxes, G, variant)
        for name in ["loss_ce", "loss_bbox", "loss_giou"]:
            np.testing.assert_allclose(
                float(losses[name + key]), float(ref[name]), rtol=2e-4, atol=2e-5,
                err_msg=f"{variant} {name}{key}")


def test_ia_bce_parity():
    _run_variant("ia_bce")


def test_focal_parity():
    _run_variant("focal")


def test_varifocal_parity():
    _run_variant("varifocal")


def test_position_supervised_parity():
    _run_variant("position_supervised")
