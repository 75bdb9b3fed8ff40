"""Device Hungarian matcher vs scipy.optimize.linear_sum_assignment."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from lwdetr_tpu.models.matcher import hungarian_match, match_cost_matrix, solve_assignment


def total_cost(C, rows, cols):
    return float(C[rows, cols].sum())


@pytest.mark.parametrize("t,q,seed", [(1, 5, 0), (4, 4, 1), (7, 20, 2), (30, 100, 3), (100, 300, 4)])
def test_solve_assignment_optimal(t, q, seed):
    rng = np.random.default_rng(seed)
    C = rng.standard_normal((t, q)).astype(np.float32) * 10
    col4row = np.asarray(solve_assignment(jnp.asarray(C)))
    assert len(set(col4row.tolist())) == t, "columns must be distinct"
    ri, ci = linear_sum_assignment(C)
    ours = total_cost(C, np.arange(t), col4row)
    scipy_cost = total_cost(C, ri, ci)
    np.testing.assert_allclose(ours, scipy_cost, rtol=1e-5, atol=1e-4)


def test_solve_assignment_with_constant_pad_rows():
    rng = np.random.default_rng(5)
    t_valid, t_pad, q = 6, 4, 15
    C_valid = rng.standard_normal((t_valid, q)).astype(np.float32)
    C = np.concatenate([C_valid, np.zeros((t_pad, q), np.float32)], axis=0)
    col4row = np.asarray(solve_assignment(jnp.asarray(C)))
    assert len(set(col4row.tolist())) == t_valid + t_pad
    # valid sub-assignment must be optimal for the valid block
    ri, ci = linear_sum_assignment(C_valid)
    np.testing.assert_allclose(
        total_cost(C_valid, np.arange(t_valid), col4row[:t_valid]),
        total_cost(C_valid, ri, ci), rtol=1e-5, atol=1e-4)


def test_hungarian_match_end_to_end_vs_scipy():
    """Full group-DETR matching parity with the reference's scipy path
    (/root/reference/models/matcher.py:94-111)."""
    rng = np.random.default_rng(7)
    B, G, Qg, K, T = 2, 3, 10, 6, 5
    logits = rng.standard_normal((B, G * Qg, K)).astype(np.float32)
    boxes = np.stack([
        rng.uniform(0.3, 0.7, (B, G * Qg)),
        rng.uniform(0.3, 0.7, (B, G * Qg)),
        rng.uniform(0.1, 0.2, (B, G * Qg)),
        rng.uniform(0.1, 0.2, (B, G * Qg)),
    ], axis=-1).astype(np.float32)
    n_valid = [3, 5]
    tgt_labels = rng.integers(0, K, (B, T)).astype(np.int32)
    tgt_boxes = np.stack([
        rng.uniform(0.3, 0.7, (B, T)),
        rng.uniform(0.3, 0.7, (B, T)),
        rng.uniform(0.1, 0.2, (B, T)),
        rng.uniform(0.1, 0.2, (B, T)),
    ], axis=-1).astype(np.float32)
    tgt_valid = np.zeros((B, T), bool)
    for b, n in enumerate(n_valid):
        tgt_valid[b, :n] = True

    matched = np.asarray(hungarian_match(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(tgt_labels),
        jnp.asarray(tgt_boxes), jnp.asarray(tgt_valid), group_detr=G))

    for b in range(B):
        n = n_valid[b]
        for g in range(G):
            C = np.asarray(match_cost_matrix(
                jnp.asarray(logits[b, g * Qg:(g + 1) * Qg]),
                jnp.asarray(boxes[b, g * Qg:(g + 1) * Qg]),
                jnp.asarray(tgt_labels[b]), jnp.asarray(tgt_boxes[b]),
                jnp.asarray(tgt_valid[b]), 2.0, 5.0, 2.0, 0.25))
            C_valid = C[:n]  # (n, Qg)
            ri, ci = linear_sum_assignment(C_valid)
            ours_cols = matched[b, g, :n] - g * Qg
            assert (ours_cols >= 0).all() and (ours_cols < Qg).all()
            np.testing.assert_allclose(
                C_valid[np.arange(n), ours_cols].sum(),
                C_valid[ri, ci].sum(), rtol=1e-4, atol=1e-4)
