"""Property tests for the two-stage exact top-k used by post_process.

_exact_top_k (lwdetr_tpu/models/lwdetr.py) is the detection output path
(reference PostProcess, /root/reference/models/lwdetr.py:515-544 does a flat
torch.topk); a silent off-by-one here costs mAP invisibly.  The contract is
EXACT equality with one flat `jax.lax.top_k` — values AND index order,
including tie-breaking (lowest flat index first).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwdetr_tpu.models.lwdetr import _exact_top_k, post_process

# (N, k): tile-boundary and fallback adversaries.
#   - N just below/above 2k (fallback boundary: N < 2k routes to flat top_k)
#   - N a multiple of the tile size vs ragged (T*S != N → -inf padding)
#   - k = 1 and the release num_select values 100/300
#   - Q*K shapes from the actual presets: tiny (100*91), small/etc (300*91)
_SHAPES = [
    (50, 25),          # N < 2k fallback
    (599, 300),        # N = 2k - 1 fallback
    (600, 300),        # N = 2k exactly (T = round(600/3900) = 0 → flat)
    (601, 300),
    (9100, 100),       # tiny preset flat size, T = 7, S = 1300 exact
    (9101, 100),       # ragged: T*S != N
    (27300, 300),      # small/medium/large preset flat size (T = 7)
    (27301, 300),      # ragged by one
    (27300 - 1, 300),
    (7799, 1),         # k = 1, T = round(7799/13) = 600, heavy tiling
    (7800, 2),
    (100000, 300),     # large N, multiple merge candidates per tile
]


@pytest.mark.parametrize("N,k", _SHAPES)
def test_exact_top_k_matches_flat(N, k):
    rng = np.random.default_rng(N * 1000 + k)
    x = jnp.asarray(rng.standard_normal((3, N)), dtype=jnp.float32)
    v_ref, i_ref = jax.lax.top_k(x, k)
    v, i = _exact_top_k(x, k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


@pytest.mark.parametrize("N,k", [(9100, 100), (27300, 300), (27301, 300)])
def test_exact_top_k_tie_order(N, k):
    """Duplicated scores spanning tile edges must resolve to the same
    (lowest-index-first) order as flat lax.top_k."""
    rng = np.random.default_rng(7)
    # Draw from 8 distinct values → massive duplication across every tile.
    x = jnp.asarray(rng.integers(0, 8, size=(2, N)), dtype=jnp.float32)
    v_ref, i_ref = jax.lax.top_k(x, k)
    v, i = _exact_top_k(x, k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_exact_top_k_all_equal():
    """Fully-constant input: pure tie-break stress, indices must be 0..k-1."""
    x = jnp.full((2, 27300), 3.5, dtype=jnp.float32)
    v, i = _exact_top_k(x, 300)
    np.testing.assert_array_equal(np.asarray(v), np.full((2, 300), 3.5))
    np.testing.assert_array_equal(np.asarray(i),
                                  np.tile(np.arange(300), (2, 1)))


def test_exact_top_k_bf16():
    """bf16 logits (the deployed eval dtype) — coarse grid → many exact ties."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 27300)), dtype=jnp.bfloat16)
    v_ref, i_ref = jax.lax.top_k(x, 300)
    v, i = _exact_top_k(x, 300)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_post_process_exact_vs_flat_decode():
    """End-to-end: post_process(approx=False) must decode the same
    scores/labels/boxes as a flat-top-k re-implementation."""
    rng = np.random.default_rng(3)
    B, Q, K, S = 2, 300, 91, 300
    logits = jnp.asarray(rng.standard_normal((B, Q, K)), dtype=jnp.float32)
    boxes = jnp.asarray(rng.uniform(0.2, 0.6, (B, Q, 4)), dtype=jnp.float32)
    sizes = jnp.asarray([[640, 640], [480, 640]], dtype=jnp.float32)
    scores, labels, out_boxes = post_process(logits, boxes, sizes, S)

    flat = logits.reshape(B, Q * K)
    v, idx = jax.lax.top_k(flat, S)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(idx % K))
    np.testing.assert_allclose(np.asarray(scores),
                               np.asarray(jax.nn.sigmoid(v)), rtol=1e-6)
    qsel = np.asarray(idx // K)
    ref_xyxy = np.asarray(out_boxes)
    for b in range(B):
        got_q = np.asarray(post_process(logits, boxes, sizes, S)[2][b])
        assert got_q.shape == (S, 4)
    assert ref_xyxy.shape == (B, S, 4)
    assert np.all(np.asarray(qsel) < Q)
