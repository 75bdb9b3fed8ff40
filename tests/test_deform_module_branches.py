"""Module-level parity for the TPU-only MSDeformAttnModule kernel branches.

The production dispatch routes by backend (`jax.default_backend() == "tpu"`),
so the `use_sep` (DenseBHND value proj + separable kernel) and
`channel_major` (DenseToCM/DenseCM + cm kernel) branches are unreachable on
the CPU test suite by default.  These tests use the `force_branch` /
`kernel_interpret` knobs to take each branch in Pallas interpret mode and
assert all three agree — outputs, grads, padding-mask semantics, and
checkpoint-compatible param trees.

Reference bar: the kernel-parity discipline of
/root/reference/models/ops/test.py:37-112, applied at the layer that uses
the kernel (/root/reference/models/ops/modules/ms_deform_attn.py:96-144).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from lwdetr_tpu.models.transformer import (DenseBHND, DenseToCM,
                                           MSDeformAttnModule)

SHAPES = ((16, 16), (8, 8))
LEN_IN = sum(h * w for h, w in SHAPES)
B, Q, C, HEADS, POINTS = 2, 20, 32, 2, 2


def _randomize(params, key, scale=0.1):
    """Replace every param with random noise so zero-init offset/weight
    kernels don't degenerate the branch comparison."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    new = [jax.random.normal(k, l.shape, l.dtype) * scale
           for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


def _inputs(seed=0, with_mask=True):
    rng = np.random.default_rng(seed)
    query = rng.standard_normal((B, Q, C)).astype(np.float32)
    memory = rng.standard_normal((B, LEN_IN, C)).astype(np.float32)
    refs = rng.uniform(0.1, 0.9, (B, Q, len(SHAPES), 2)).astype(np.float32)
    if with_mask:
        # pad the tail of the flattened sequence (True = padded), different
        # amount per batch row to catch broadcast-shape slips
        mask = np.zeros((B, LEN_IN), dtype=bool)
        mask[0, -40:] = True
        mask[1, -8:] = True
    else:
        mask = None
    return (jnp.asarray(query), jnp.asarray(refs), jnp.asarray(memory),
            None if mask is None else jnp.asarray(mask))


def _module(branch):
    return MSDeformAttnModule(
        d_model=C, n_levels=len(SHAPES), n_heads=HEADS, n_points=POINTS,
        force_branch=branch, kernel_interpret=(branch != "gather"))


def _apply(branch, params, inputs, train=False):
    query, refs, memory, mask = inputs
    return _module(branch).apply(
        {"params": params}, query, refs, memory, SHAPES,
        padding_mask=mask, train=train)


@pytest.fixture(scope="module")
def shared_params():
    inputs = _inputs(with_mask=False)
    query, refs, memory, _ = inputs
    variables = _module("gather").init(
        jax.random.PRNGKey(0), query, refs, memory, SHAPES)
    return _randomize(variables["params"], jax.random.PRNGKey(1))


def test_param_trees_identical_across_branches():
    """Checkpoint bridge: all three branches must expose the same param
    names/shapes/dtypes (DenseBHND/DenseToCM/DenseCM mimic nn.Dense)."""
    query, refs, memory, _ = _inputs(with_mask=False)
    trees = {}
    for branch in ("gather", "sep", "cm"):
        v = _module(branch).init(jax.random.PRNGKey(0), query, refs, memory,
                                 SHAPES)
        trees[branch] = jax.tree_util.tree_map(
            lambda x: (x.shape, x.dtype), v["params"])
    assert trees["gather"] == trees["sep"] == trees["cm"]


@pytest.mark.parametrize("branch", ["sep", "cm"])
@pytest.mark.parametrize("with_mask", [True, False])
def test_branch_output_parity(shared_params, branch, with_mask):
    inputs = _inputs(seed=2, with_mask=with_mask)
    ref = _apply("gather", shared_params, inputs)
    out = _apply(branch, shared_params, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("with_mask", [True, False])
def test_sep_memory_levels_parity(shared_params, with_mask):
    """The production sep path receives per-level memory chunks
    (memory_levels) and projects panels per level on shared params — must
    match both the concat-memory sep fallback and the gather reference."""
    inputs = _inputs(seed=4, with_mask=with_mask)
    query, refs, memory, mask = inputs
    levels = []
    start = 0
    for h, w in SHAPES:
        levels.append(memory[:, start:start + h * w])
        start += h * w
    out_lv = _module("sep").apply(
        {"params": shared_params}, query, refs, memory, SHAPES,
        padding_mask=mask, train=True, memory_levels=levels)
    ref = _apply("gather", shared_params, inputs, train=True)
    out_concat = _apply("sep", shared_params, inputs, train=True)
    np.testing.assert_allclose(np.asarray(out_lv), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_lv), np.asarray(out_concat),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("branch", ["sep", "cm"])
def test_branch_grad_parity(shared_params, branch):
    """Grads wrt params, query AND memory agree across kernel branches —
    this is what catches a wrong einsum order or mask broadcast in the
    branch-specific value projections (DenseBHND / DenseToCM)."""
    inputs = _inputs(seed=3, with_mask=True)
    query, refs, memory, mask = inputs

    def loss(params, q, m, br):
        out = _apply(br, params, (q, refs, m, mask), train=True)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(shared_params, query, memory,
                                              "gather")
    g_out = jax.grad(loss, argnums=(0, 1, 2))(shared_params, query, memory,
                                              branch)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_out = jax.tree_util.tree_leaves(g_out)
    for a, b in zip(flat_out, flat_ref):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=2e-3, rtol=2e-3)


def test_dense_bhnd_matches_nn_dense():
    """DenseBHND(x) == nn.Dense(x).reshape(B, N, H, D).transpose(0, 2, 1, 3)
    for values and grads with shared params (ADVICE r4 medium)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, 17, C)).astype(np.float32))
    dense = nn.Dense(C, kernel_init=nn.initializers.xavier_uniform())
    params = dense.init(jax.random.PRNGKey(0), x)["params"]
    params = _randomize(params, jax.random.PRNGKey(2), scale=0.5)
    bhnd = DenseBHND(C, HEADS)

    def f_ref(p, x):
        y = dense.apply({"params": p}, x)
        Bx, N, _ = y.shape
        return y.reshape(Bx, N, HEADS, C // HEADS).transpose(0, 2, 1, 3)

    def f_new(p, x):
        return bhnd.apply({"params": p}, x)

    np.testing.assert_allclose(np.asarray(f_new(params, x)),
                               np.asarray(f_ref(params, x)),
                               atol=1e-5, rtol=1e-5)

    def loss(f, p, x):
        return jnp.sum(f(p, x) ** 3)  # asymmetric: catches transposed grads

    g_ref = jax.grad(lambda p, x: loss(f_ref, p, x), argnums=(0, 1))(params, x)
    g_new = jax.grad(lambda p, x: loss(f_new, p, x), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_new),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_dense_to_cm_matches_nn_dense():
    """DenseToCM(x) == nn.Dense(x).transpose(0, 2, 1) — values and grads."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((3, 17, C)).astype(np.float32))
    dense = nn.Dense(C, kernel_init=nn.initializers.xavier_uniform())
    params = dense.init(jax.random.PRNGKey(0), x)["params"]
    params = _randomize(params, jax.random.PRNGKey(3), scale=0.5)
    tocm = DenseToCM(C)

    def f_ref(p, x):
        return dense.apply({"params": p}, x).transpose(0, 2, 1)

    def f_new(p, x):
        return tocm.apply({"params": p}, x)

    np.testing.assert_allclose(np.asarray(f_new(params, x)),
                               np.asarray(f_ref(params, x)),
                               atol=1e-5, rtol=1e-5)

    def loss(f, p, x):
        return jnp.sum(f(p, x) ** 3)

    g_ref = jax.grad(lambda p, x: loss(f_ref, p, x), argnums=(0, 1))(params, x)
    g_new = jax.grad(lambda p, x: loss(f_new, p, x), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_new),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
