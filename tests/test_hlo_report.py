"""Per-op HLO FLOP report (utils/hlo_report.py).

Counterpart of the reference's hand-written aten flop handlers
(/root/reference/util/benchmark.py:40-180: conv/matmul/einsum handlers,
validated there by construction).  Here the parser is validated against
analytically known FLOP counts of jitted conv/dot programs, including
batch dims and grouped convolutions.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lwdetr_tpu.utils.hlo_report import detailed_flops, parse_hlo_flops


def _report(fn, *args):
    return detailed_flops(fn, *args)


def test_dot_flops_exact():
    def f(a, b):
        return a @ b

    a = jnp.ones((64, 128), jnp.float32)
    b = jnp.ones((128, 32), jnp.float32)
    r = _report(f, a, b)
    assert abs(r["flops_by_op"]["dot"] - 2 * 64 * 128 * 32) < 1


def test_batched_dot_flops_exact():
    def f(a, b):
        return jnp.einsum("bij,bjk->bik", a, b)

    a = jnp.ones((4, 16, 32), jnp.float32)
    b = jnp.ones((4, 32, 8), jnp.float32)
    r = _report(f, a, b)
    # batch dims multiply through the output shape; contraction is j=32
    assert abs(r["flops_by_op"]["dot"] - 2 * 4 * 16 * 8 * 32) < 1


def test_conv_flops_exact():
    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.ones((2, 16, 16, 8), jnp.float32)
    k = jnp.ones((3, 3, 8, 4), jnp.float32)
    r = _report(f, x, k)
    # out 2x14x14x4, per output: 3*3*8 MACs
    assert abs(r["flops_by_op"]["convolution"]
               - 2 * 2 * 14 * 14 * 4 * 3 * 3 * 8) < 1


def test_grouped_conv_flops_exact():
    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", feature_group_count=4,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.ones((1, 8, 8, 16), jnp.float32)
    k = jnp.ones((3, 3, 4, 8), jnp.float32)  # i = 16/4 groups
    r = _report(f, x, k)
    # out 1x6x6x8; per output: 3*3*4 MACs (kernel 'i' is per-group C_in)
    assert abs(r["flops_by_op"]["convolution"]
               - 2 * 1 * 6 * 6 * 8 * 3 * 3 * 4) < 1


def test_coverage_and_stage_attribution():
    def f(x, w, k):
        y = jax.lax.conv_general_dilated(
            x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        z = jnp.einsum("bhwc,cd->bhwd", y, w)
        return jax.nn.relu(z).sum()

    x = jnp.ones((2, 32, 32, 8))
    w = jnp.ones((16, 24))
    k = jnp.ones((3, 3, 8, 16))
    r = _report(f, x, w, k)
    # parsed dot+conv should be within 15% of XLA's own total (the delta is
    # padding accounting + non-matmul FLOPs)
    assert r["coverage"] is not None and 0.85 < r["coverage"] < 1.15
    assert r["flops_by_stage"], "stage table empty"
    assert sum(r["flops_by_stage"].values()) == sum(r["flops_by_op"].values())


def test_parser_tolerates_unknown_lines():
    r = parse_hlo_flops("garbage\n%x = f32[2,2]{1,0} add(%a, %b)\n")
    assert r["flops_by_op"] == {}
    assert r["counts_by_op"]["add"] == 1


def test_parser_strips_tpu_layout_annotations():
    """TPU-backend as_text() annotates every shape with a layout whose
    ':'/'(' broke the instruction regex (round-4 fix): dots lower to
    spatial-free convolutions with dim_labels=bf_io->bf and layouts like
    {0,1:T(8,128)S(1)}. Attribute braces (contracting dims) must survive
    the strip."""
    txt = "\n".join([
        "  %w = f32[256,64]{0,1:T(8,128)} parameter(1)",
        "  ROOT %convolution.1 = f32[128,64]{0,1:T(8,128)S(1)} "
        "convolution(%fusion.1, %w), dim_labels=bf_io->bf, "
        'metadata={op_name="jit(f)/stage_a/dot_general"}',
        "  %d = f32[128,64]{0,1:T(8,128)} dot(%a, %w), "
        "lhs_contracting_dims={1}, rhs_contracting_dims={0}, "
        'metadata={op_name="jit(f)/stage_b/dot_general"}',
        "  %a = f32[128,256]{0,1:T(8,128)(2,1)} parameter(0)",
    ])
    r = parse_hlo_flops(txt)
    expect = 2 * 128 * 64 * 256
    assert r["flops_by_op"]["convolution"] == expect
    assert r["flops_by_op"]["dot"] == expect
    assert r["flops_by_stage"]["stage_a/dot_general"] == expect
    assert r["flops_by_stage"]["stage_b/dot_general"] == expect


def test_windowed_gradient_conv_flops():
    """The TPU backend expresses einsum transposes and gradient convs as
    fully-padded correlations (window={size=S pad=S-1_S-1 rhs_reversal=1}
    over a spatial-1 input): each output position overlaps exactly one
    valid tap, so FLOPs are 2*out_nonspatial*k_i*O — NOT scaled by the
    window size (the round-4 overcount was 104x on decoder self-attn)."""
    txt = "\n".join([
        "  %lhs = bf16[256,8,1]{2,1,0:T(8,128)(2,1)} parameter(0)",
        "  %krn = bf16[4,300,256]{2,1,0:T(8,128)(2,1)} parameter(1)",
        "  %convolution.9 = bf16[8,4,300]{2,0,1:T(8,128)(2,1)} "
        "convolution(%lhs, %krn), window={size=4 pad=3_3 rhs_reversal=1}, "
        "dim_labels=fb0_0oi->b0f, "
        'metadata={op_name="jit(f)/attn/einsum_t"}',
    ])
    r = parse_hlo_flops(txt)
    # out nonspatial = 8*300, k_i = 256, taps along the spatial dim = 4
    # out positions x 1 valid tap each
    assert r["flops_by_op"]["convolution"] == 2 * (8 * 300) * 256 * 4


def test_strided_patch_conv_window_exact():
    """A stride-S non-overlapping patch conv must count exactly
    2*B*Oc*ki*prod(spatial_out*spatial_kernel) — the windowed formula must
    reproduce the dense formula when every tap is valid."""
    txt = "\n".join([
        "  %x = f32[2,64,64,3]{3,2,1,0} parameter(0)",
        "  %k = f32[16,16,3,96]{3,2,1,0} parameter(1)",
        "  %convolution.1 = f32[2,4,4,96]{3,2,1,0} convolution(%x, %k), "
        "window={size=16x16 stride=16x16}, dim_labels=b01f_01io->b01f, "
        'metadata={op_name="jit(f)/patch_embed/conv"}',
    ])
    r = parse_hlo_flops(txt)
    assert r["flops_by_op"]["convolution"] == 2 * 2 * 96 * 3 * (4 * 16) ** 2
