"""Parity tests for the TPU deformable-attention core op.

Oracle: the reference's pure-PyTorch `ms_deform_attn_core_pytorch`
(/root/reference/models/ops/functions/ms_deform_attn_func.py:52-75),
re-stated here with torch.nn.functional.grid_sample — the same function the
reference uses to validate its CUDA kernel (models/ops/test.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from lwdetr_tpu.ops.deform_attn import (ms_deform_attn, ms_deform_attn_pallas,
                                         sampling_offsets_init_bias)


def torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """value: (B, heads, head_dim, Len_in) torch; returns (B, Len_q, heads*head_dim)."""
    B, n_heads, head_dim, _ = value.shape
    _, Len_q, _, L, P, _ = sampling_locations.shape
    value_list = value.split([H * W for H, W in spatial_shapes], dim=3)
    sampling_grids = 2 * sampling_locations - 1
    sampled = []
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value_list[lid].reshape(B * n_heads, head_dim, H, W)
        g = sampling_grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        sampled.append(s)
    attention_weights = attention_weights.transpose(1, 2).reshape(B * n_heads, 1, Len_q, L * P)
    sampled = torch.stack(sampled, dim=-2).flatten(-2)
    out = (sampled * attention_weights).sum(-1).view(B, n_heads * head_dim, Len_q)
    return out.transpose(1, 2).contiguous()


def make_inputs(rng, B=2, Q=7, n_heads=4, head_dim=8, shapes=((6, 4), (3, 2)), P=3,
                loc_low=-0.2, loc_high=1.2):
    L = len(shapes)
    Len_in = sum(h * w for h, w in shapes)
    value = rng.standard_normal((B, Len_in, n_heads, head_dim)).astype(np.float32)
    # include out-of-bounds locations to exercise zero-padding
    loc = rng.uniform(loc_low, loc_high, (B, Q, n_heads, L, P, 2)).astype(np.float32)
    w = rng.standard_normal((B, Q, n_heads, L * P)).astype(np.float32)
    w = np.exp(w) / np.exp(w).sum(-1, keepdims=True)
    w = w.reshape(B, Q, n_heads, L, P).astype(np.float32)
    return value, loc, w


@pytest.mark.parametrize("shapes", [((6, 4), (3, 2)), ((8, 8),), ((5, 7), (3, 3), (2, 2))])
def test_forward_parity(shapes):
    rng = np.random.default_rng(0)
    value, loc, w = make_inputs(rng, shapes=shapes)
    B, Len_in, n_heads, head_dim = value.shape

    out = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))

    t_value = torch.tensor(value).permute(0, 2, 3, 1)  # (B, heads, D, Len_in)
    t_out = torch_oracle(t_value, shapes, torch.tensor(loc), torch.tensor(w))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5, rtol=1e-4)


def test_forward_parity_inbounds_fp64():
    rng = np.random.default_rng(1)
    value, loc, w = make_inputs(rng, loc_low=0.05, loc_high=0.95)
    shapes = ((6, 4), (3, 2))
    with jax.enable_x64(True):
        out = ms_deform_attn(
            jnp.asarray(value, jnp.float64), shapes,
            jnp.asarray(loc, jnp.float64), jnp.asarray(w, jnp.float64))
    t_value = torch.tensor(value).double().permute(0, 2, 3, 1)
    t_out = torch_oracle(t_value, shapes, torch.tensor(loc).double(), torch.tensor(w).double())
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-12)


def test_gradients_match_torch():
    rng = np.random.default_rng(2)
    value, loc, w = make_inputs(rng, B=1, Q=4, n_heads=2, head_dim=4, shapes=((4, 4),), P=2)
    shapes = ((4, 4),)

    def f(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))

    tv = torch.tensor(value, requires_grad=True)
    tl = torch.tensor(loc, requires_grad=True)
    ta = torch.tensor(w, requires_grad=True)
    t_out = torch_oracle(tv.permute(0, 2, 3, 1), shapes, tl, ta)
    (t_out ** 2).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), atol=1e-4, rtol=1e-3)


def test_jit_and_vmap_compose():
    rng = np.random.default_rng(3)
    value, loc, w = make_inputs(rng)
    shapes = ((6, 4), (3, 2))
    f = jax.jit(lambda v, l, a: ms_deform_attn(v, shapes, l, a))
    out = f(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    assert out.shape == (2, 7, 4 * 8)
    assert np.isfinite(np.asarray(out)).all()


def test_sampling_offsets_init_bias_matches_reference_pattern():
    n_heads, n_levels, n_points = 8, 2, 4
    bias = np.asarray(sampling_offsets_init_bias(n_heads, n_levels, n_points))
    bias = bias.reshape(n_heads, n_levels, n_points, 2)

    thetas = torch.arange(n_heads, dtype=torch.float32) * (2.0 * np.pi / n_heads)
    grid = torch.stack([thetas.cos(), thetas.sin()], -1)
    grid = (grid / grid.abs().max(-1, keepdim=True)[0]).view(n_heads, 1, 1, 2).repeat(
        1, n_levels, n_points, 1)
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    np.testing.assert_allclose(bias, grid.numpy(), atol=1e-6)


def test_pallas_kernel_parity_interpret():
    """Fused one-hot-matmul sampler vs the XLA reference (interpret mode)."""
    from lwdetr_tpu.ops.deform_attn import ms_deform_attn_pallas

    rng = np.random.default_rng(11)
    shapes = ((16, 16), (8, 8))
    value, loc, w = make_inputs(rng, B=2, Q=20, n_heads=2, head_dim=16,
                                shapes=shapes, P=2)
    out = ms_deform_attn_pallas(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w),
        interpret=True)
    ref = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_pallas_kernel_grad_flows():

    rng = np.random.default_rng(12)
    shapes = ((16, 16),)
    value, loc, w = make_inputs(rng, B=1, Q=8, n_heads=2, head_dim=16,
                                shapes=shapes, P=2)

    def f_fused(v, l, a):
        return jnp.sum(ms_deform_attn_pallas(v, shapes, l, a, interpret=True) ** 2)

    def f_ref(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)


def _to_cm(value):
    """(B, Len_in, H, D) row-major -> (B, H*D, Len_in) channel-major."""
    B, Len_in, H, D = value.shape
    return jnp.asarray(value).transpose(0, 2, 3, 1).reshape(B, H * D, Len_in)


def test_cm_kernel_parity_interpret():
    """Channel-major sampler vs the XLA reference (interpret mode)."""
    from lwdetr_tpu.ops.deform_attn import ms_deform_attn_cm

    rng = np.random.default_rng(13)
    shapes = ((16, 16), (8, 8))
    value, loc, w = make_inputs(rng, B=2, Q=20, n_heads=2, head_dim=16,
                                shapes=shapes, P=2)
    out_t = ms_deform_attn_cm(_to_cm(value), shapes, jnp.asarray(loc),
                              jnp.asarray(w), n_heads=2, interpret=True)
    ref = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                         jnp.asarray(w))  # (B, Q, C)
    np.testing.assert_allclose(np.asarray(out_t.transpose(0, 2, 1)),
                               np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_cm_kernel_grad_flows():
    from lwdetr_tpu.ops.deform_attn import ms_deform_attn_cm

    rng = np.random.default_rng(14)
    shapes = ((16, 16),)
    value, loc, w = make_inputs(rng, B=1, Q=8, n_heads=2, head_dim=16,
                                shapes=shapes, P=2)
    value_t = _to_cm(value)

    def f_fused(vt, l, a):
        return jnp.sum(
            ms_deform_attn_cm(vt, shapes, l, a, n_heads=2, interpret=True) ** 2)

    def f_ref(vt, l, a):
        B, C, N = vt.shape
        v = vt.reshape(B, 2, C // 2, N).transpose(0, 3, 1, 2)
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(
        value_t, jnp.asarray(loc), jnp.asarray(w))
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(
        value_t, jnp.asarray(loc), jnp.asarray(w))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=2e-3)


def test_separable_kernel_parity_interpret():
    """Separable (factorized) sampler vs the XLA reference (interpret)."""
    from lwdetr_tpu.ops.deform_attn import ms_deform_attn_sep

    rng = np.random.default_rng(15)
    shapes = ((16, 16), (8, 8))
    value, loc, w = make_inputs(rng, B=2, Q=20, n_heads=2, head_dim=16,
                                shapes=shapes, P=2)
    out = ms_deform_attn_sep(jnp.asarray(value), shapes, jnp.asarray(loc),
                             jnp.asarray(w), interpret=True)
    ref = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                         jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_separable_kernel_parity_stacked_qblock():
    """Q >= 128 takes the point-stacked (P*q-row) panels in fwd and bwd
    (the path every real config hits on TPU; small Q falls back to the
    per-point loop - fractional-tile sublane concat stalls Mosaic)."""
    from lwdetr_tpu.ops.deform_attn import ms_deform_attn_sep

    rng = np.random.default_rng(19)
    shapes = ((10, 10),)
    value, loc, w = make_inputs(rng, B=1, Q=130, n_heads=2, head_dim=16,
                                shapes=shapes, P=2)
    out = ms_deform_attn_sep(jnp.asarray(value), shapes, jnp.asarray(loc),
                             jnp.asarray(w), interpret=True)
    ref = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                         jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)

    def f_fused(v, l, a):
        return jnp.sum(
            ms_deform_attn_sep(v, shapes, l, a, interpret=True) ** 2)

    def f_ref(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=2e-3)


def test_separable_kernel_parity_stacked_bf16_backward():
    """The STACKED backward branch only fires in bf16: f32 halves the
    backward q-block to 64 (VMEM) which re-routes to the per-point loop.
    bf16 + q_pad >= 128 is exactly what the real TPU training path runs;
    exercise it in interpret mode against the f32 oracle on the same
    bf16-rounded inputs (tolerance = bf16 rounding, not kernel logic)."""
    from lwdetr_tpu.ops.deform_attn import ms_deform_attn_sep

    rng = np.random.default_rng(21)
    shapes = ((10, 10),)
    value, loc, w = make_inputs(rng, B=1, Q=130, n_heads=2, head_dim=16,
                                shapes=shapes, P=2)
    vb = jnp.asarray(value).astype(jnp.bfloat16)
    lb = jnp.asarray(loc)
    wb = jnp.asarray(w)
    # oracle consumes the same bf16-rounded value in f32
    vf = vb.astype(jnp.float32)

    def f_fused(v, l, a):
        return jnp.sum(
            ms_deform_attn_sep(v, shapes, l, a,
                               interpret=True).astype(jnp.float32) ** 2)

    def f_ref(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(vb, lb, wb)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(vf, lb, wb)
    for a, b in zip(g1, g2):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-2)


def test_separable_kernel_parity_wide_level():
    """W_l*D >= 1024 takes the MXU lane-expansion (one-hot E) path in both
    fwd and bwd - the P3-class branch the large/xlarge decoders hit."""
    from lwdetr_tpu.ops.deform_attn import ms_deform_attn_sep

    rng = np.random.default_rng(18)
    shapes = ((6, 64),)
    value, loc, w = make_inputs(rng, B=1, Q=9, n_heads=2, head_dim=16,
                                shapes=shapes, P=2)
    out = ms_deform_attn_sep(jnp.asarray(value), shapes, jnp.asarray(loc),
                             jnp.asarray(w), interpret=True)
    ref = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                         jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)

    def f_fused(v, l, a):
        return jnp.sum(
            ms_deform_attn_sep(v, shapes, l, a, interpret=True) ** 2)

    def f_ref(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=2e-3)


@pytest.mark.slow
def test_separable_kernel_parity_4points_2levels():
    """The large/xlarge decoder shape class (n_points=4, two levels, P3+P5
    aspect): exercises the point-stacked mask panels in fwd AND bwd."""
    from lwdetr_tpu.ops.deform_attn import ms_deform_attn_sep

    rng = np.random.default_rng(17)
    shapes = ((12, 12), (3, 3))
    value, loc, w = make_inputs(rng, B=2, Q=10, n_heads=4, head_dim=16,
                                shapes=shapes, P=4)
    out = ms_deform_attn_sep(jnp.asarray(value), shapes, jnp.asarray(loc),
                             jnp.asarray(w), interpret=True)
    ref = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                         jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)

    def f_fused(v, l, a):
        return jnp.sum(
            ms_deform_attn_sep(v, shapes, l, a, interpret=True) ** 2)

    def f_ref(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=2e-3)


def test_separable_kernel_grad_flows():
    from lwdetr_tpu.ops.deform_attn import ms_deform_attn_sep

    rng = np.random.default_rng(16)
    shapes = ((16, 16),)
    value, loc, w = make_inputs(rng, B=1, Q=8, n_heads=2, head_dim=16,
                                shapes=shapes, P=2)

    def f_fused(v, l, a):
        return jnp.sum(
            ms_deform_attn_sep(v, shapes, l, a, interpret=True) ** 2)

    def f_ref(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=2e-3)
