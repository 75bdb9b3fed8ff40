"""Hungarian matching on device.

The reference copies the cost matrix to the CPU and runs scipy's
`linear_sum_assignment` per image per group
(/root/reference/models/matcher.py:94-111) — a host-sync serialization point
in the hot training loop (SURVEY.md §3 hot-loops #3).  Here the exact
Jonker-Volgenant shortest-augmenting-path algorithm runs on device with
`lax` control flow, vmapped over (batch x groups), so matching stays inside
the compiled training step.

Static-shape strategy: targets are padded to `max_gt` per image; padded rows
get a constant cost of 0, which preserves optimality of the valid
sub-assignment (a constant row shifts every complete assignment equally).
Matched indices for padded rows are discarded by the caller via the validity
mask.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lwdetr_tpu.ops import box_ops

_INF = jnp.float32(1e15)


def solve_assignment(cost: jnp.ndarray,
                     n_rows: jnp.ndarray | None = None) -> jnp.ndarray:
    """Exact rectangular assignment: rows -> distinct cols, min total cost.

    Args:
      cost: (T, Q) with T <= Q, float32.
      n_rows: optional traced scalar — only the first n_rows rows are
        augmented (the caller's padded rows return junk columns, discarded
        via the validity mask). Sequential depth on device is proportional
        to the number of augmented rows, so skipping padded rows is a
        ~(T/n_real)x training-step win.
    Returns:
      (T,) int32 — column assigned to each row.

    Jonker-Volgenant with dual potentials; O(T^2 Q) worst case but each
    augmenting Dijkstra step is an O(Q) vector op, so the device sees
    ~T^2/2 short vector steps. Works under vmap/jit.
    """
    T, Q = cost.shape
    assert T <= Q, "need at least as many columns as rows"
    # 1-indexed with virtual column 0 / row 0
    C = jnp.zeros((T + 1, Q + 1), cost.dtype)
    C = C.at[1:, 1:].set(cost)

    u0 = jnp.zeros((T + 1,), cost.dtype)
    v0 = jnp.zeros((Q + 1,), cost.dtype)
    p0 = jnp.zeros((Q + 1,), jnp.int32)  # p[j]: row matched to col j (0 = free)

    # All dynamic indexing in the inner loop is expressed as one-hot masks
    # and contractions instead of gather/scatter: under vmap over (B*G)
    # problems, XLA lowers `C[i0]` to a per-lane row gather running at
    # ~2 GB/s (it was ~20 ms/step of the training step); the one-hot
    # contraction form is a batched matvec on the MXU (~70x faster).
    col_idx = jnp.arange(Q + 1, dtype=jnp.int32)
    row_idx = jnp.arange(T + 1, dtype=jnp.int32)

    def augment_row(i, carry):
        u, v, p = carry
        p = p.at[0].set(i)
        minv = jnp.full((Q + 1,), _INF, cost.dtype)
        used = jnp.zeros((Q + 1,), bool)
        way = jnp.zeros((Q + 1,), jnp.int32)

        def _pick(vec, j):
            return jnp.sum(jnp.where(col_idx == j, vec, 0))

        def dijkstra_cond(st):
            _, _, p, _, _, _, j0 = st
            return _pick(p, j0) != 0

        def dijkstra_body(st):
            u, v, p, minv, used, way, j0 = st
            used = used | (col_idx == j0)
            i0 = _pick(p, j0)
            # cur = C[i0] - u[i0] - v via a one-hot row mix
            oh_i0 = (row_idx == i0).astype(cost.dtype)  # (T+1,)
            cur = oh_i0 @ C - jnp.sum(oh_i0 * u) - v  # (Q+1,)
            upd = (~used) & (cur < minv)
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, j0, way)
            masked = jnp.where(used, _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = jnp.min(masked)
            # u[p[j]] += delta for used j: one-hot scatter-add contraction
            oh_p = (p[:, None] == row_idx[None, :]).astype(cost.dtype)  # (Q+1, T+1)
            u = u + delta * (used.astype(cost.dtype) @ oh_p)
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, p, minv, used, way, j1

        u, v, p, minv, used, way, j0 = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body,
            (u, v, p, minv, used, way, jnp.int32(0)))

        def backtrack_cond(st):
            j0, _ = st
            return j0 != 0

        def backtrack_body(st):
            j0, p = st
            j1 = _pick(way, j0)
            p_j1 = _pick(p, j1)
            p = jnp.where(col_idx == j0, p_j1, p)
            return j1, p

        _, p = jax.lax.while_loop(backtrack_cond, backtrack_body, (j0, p))
        return u, v, p

    if n_rows is None:
        _, _, p = jax.lax.fori_loop(1, T + 1, augment_row, (u0, v0, p0))
    else:
        n_stop = jnp.minimum(n_rows.astype(jnp.int32), T) + 1

        def row_cond(st):
            i, _ = st
            return i < n_stop

        def row_body(st):
            i, carry = st
            return i + 1, augment_row(i, carry)

        _, (_, _, p) = jax.lax.while_loop(
            row_cond, row_body, (jnp.int32(1), (u0, v0, p0)))

    # invert p: row -> col (rows matched to distinct cols; p[0] is scratch)
    row4col = p  # (Q+1,)
    col_idx = jnp.arange(Q + 1, dtype=jnp.int32)
    col4row = jnp.zeros((T + 1,), jnp.int32).at[row4col].set(col_idx)
    return col4row[1:] - 1  # (T,), 0-indexed columns


def match_cost_matrix(
    pred_logits: jnp.ndarray,  # (Qg, K)
    pred_boxes: jnp.ndarray,  # (Qg, 4) cxcywh
    tgt_labels: jnp.ndarray,  # (T,) int32, padded arbitrary
    tgt_boxes: jnp.ndarray,  # (T, 4) cxcywh, padded to a valid dummy box
    tgt_valid: jnp.ndarray,  # (T,) bool
    cost_class: float,
    cost_bbox: float,
    cost_giou: float,
    focal_alpha: float = 0.25,
) -> jnp.ndarray:
    """(T, Qg) cost with focal class cost + L1 + GIoU (reference matcher.py:79-94);
    padded-target rows zeroed (constant rows preserve optimality)."""
    gamma = 2.0
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))  # (Qg, K)
    p_t = jnp.take(prob, tgt_labels, axis=1)  # (Qg, T)
    neg = (1 - focal_alpha) * (p_t**gamma) * (-jnp.log(1 - p_t + 1e-8))
    pos = focal_alpha * ((1 - p_t) ** gamma) * (-jnp.log(p_t + 1e-8))
    c_class = pos - neg  # (Qg, T)

    c_bbox = jnp.sum(
        jnp.abs(pred_boxes[:, None, :] - tgt_boxes[None, :, :]), axis=-1)  # (Qg, T)

    giou = box_ops.generalized_box_iou(
        box_ops.box_cxcywh_to_xyxy(pred_boxes),
        box_ops.box_cxcywh_to_xyxy(tgt_boxes))  # (Qg, T)
    c_giou = -giou

    C = cost_bbox * c_bbox + cost_class * c_class + cost_giou * c_giou  # (Qg, T)
    C = jnp.where(tgt_valid[None, :], C, 0.0)
    return C.T  # (T, Qg)


@partial(jax.jit, static_argnames=("group_detr", "cost_class", "cost_bbox",
                                   "cost_giou", "focal_alpha"))
def hungarian_match(
    pred_logits: jnp.ndarray,  # (B, G*Qg, K)
    pred_boxes: jnp.ndarray,  # (B, G*Qg, 4)
    tgt_labels: jnp.ndarray,  # (B, T)
    tgt_boxes: jnp.ndarray,  # (B, T, 4)
    tgt_valid: jnp.ndarray,  # (B, T) bool
    group_detr: int = 1,
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    focal_alpha: float = 0.25,
):
    """Per-group optimal assignment (reference matcher.py:49-111).

    Returns:
      matched_q: (B, G, T) int32 — global query index (into G*Qg) assigned to
        each target slot; meaningful only where tgt_valid.
    """
    B, Qt, K = pred_logits.shape
    G = group_detr
    Qg = Qt // G
    logits_g = pred_logits.reshape(B, G, Qg, K)
    boxes_g = pred_boxes.reshape(B, G, Qg, 4)

    def per_image_group(lg, bg, tl, tb, tv):
        C = match_cost_matrix(lg, bg, tl, tb, tv,
                              cost_class, cost_bbox, cost_giou, focal_alpha)
        # padded rows (constant 0 cost) are skipped: only valid targets are
        # augmented, cutting the sequential Dijkstra depth from max_gt to
        # the per-image ground-truth count
        return solve_assignment(C, n_rows=jnp.sum(tv.astype(jnp.int32)))

    # vmap over groups, then batch
    per_image = jax.vmap(per_image_group, in_axes=(0, 0, None, None, None))
    matched = jax.vmap(per_image)(logits_g, boxes_g, tgt_labels, tgt_boxes, tgt_valid)
    # (B, G, T) local -> global query index
    offsets = (jnp.arange(G, dtype=jnp.int32) * Qg)[None, :, None]
    return matched + offsets
