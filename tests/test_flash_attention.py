"""Pallas fused-attention kernel parity (interpret mode on CPU) and vjp.

`attention_cm` is the model's single attention entry point (ViT window +
global blocks and the decoder self-attention all route through it); it is
tested here across every LW-DETR shape class against the XLA SDPA oracle.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lwdetr_tpu.ops import flash_attention as fa


def _pack_cm(rng, B, N, H, D):
    C = H * D
    return jnp.asarray(rng.standard_normal((B, 3 * C, N)), jnp.float32)


@pytest.mark.parametrize(
    "B,N,H,D",
    [
        (4, 100, 12, 16),   # ViT window block (small@640: hw=100)
        (2, 1600, 12, 16),  # ViT global block (40x40 tokens)
        (2, 1600, 12, 32),  # vit_small head_dim
        (3, 104, 4, 48),    # non-divisor N, odd head count
        (2, 300, 8, 32),    # decoder self-attention (num_queries=300)
        (1, 512, 2, 64),    # power-of-two tall case
        (1, 1600, 12, 16),  # bs1 serving: whole-N q-block branch (B<=2)
    ])
def test_attention_cm_parity(B, N, H, D):
    rng = np.random.default_rng(0)
    qkv_t = _pack_cm(rng, B, N, H, D)
    scale = D ** -0.5
    out = fa.attention_cm(qkv_t, H, scale, interpret=True)
    ref = fa._xla_sdpa_cm(qkv_t, H, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("B,N,H,D", [(2, 256, 4, 16), (4, 100, 4, 16)])
def test_attention_cm_bwd_pallas_parity(B, N, H, D):
    """Pallas channel-major attention backward vs the XLA SDPA backward,
    both the long-N path (256) and the window path (100, padded to 128)."""
    C = H * D
    rng = np.random.default_rng(21)
    qkv_t = _pack_cm(rng, B, N, H, D)
    scale = D ** -0.5

    def loss_pallas(t):
        return jnp.sum(fa.attention_cm(t, H, scale, interpret=True) ** 2)

    def loss_ref(t):
        return jnp.sum(fa._xla_sdpa_cm(t, H, scale) ** 2)

    g1 = jax.grad(loss_pallas)(qkv_t)
    g2 = jax.grad(loss_ref)(qkv_t)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-3,
                               rtol=2e-3)


@pytest.mark.parametrize("B,N,H,D", [(4, 100, 12, 16), (3, 104, 4, 48)])
def test_attention_cm_bias_fused_parity(B, N, H, D):
    """The bias-fused window kernel (_attn_cm_bias_diff, N<=128) vs adding
    the qkv bias inline then calling the XLA oracle.  This is the path every
    ViT window block takes on TPU (attention_cm bias= + N<=128)."""
    C = H * D
    rng = np.random.default_rng(5)
    qkv_t = _pack_cm(rng, B, N, H, D)
    bias = jnp.asarray(rng.standard_normal(3 * C), jnp.float32)
    scale = D ** -0.5
    out = fa.attention_cm(qkv_t, H, scale, interpret=True, bias=bias)
    ref = fa._xla_sdpa_cm(qkv_t + bias[:, None], H, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_attention_cm_bias_fused_grads():
    """custom-vjp of the bias-fused kernel: d(qkv) via the Pallas backward
    and the hand-written dbias reduction, both vs jax.grad of the inline-add
    XLA path."""
    B, N, H, D = 4, 100, 4, 16
    C = H * D
    rng = np.random.default_rng(17)
    qkv_t = _pack_cm(rng, B, N, H, D)
    bias = jnp.asarray(rng.standard_normal(3 * C), jnp.float32)
    scale = D ** -0.5

    def loss_pallas(t, b):
        return jnp.sum(fa.attention_cm(t, H, scale, interpret=True,
                                       bias=b) ** 2)

    def loss_ref(t, b):
        return jnp.sum(fa._xla_sdpa_cm(t + b[:, None], H, scale) ** 2)

    g1_t, g1_b = jax.grad(loss_pallas, argnums=(0, 1))(qkv_t, bias)
    g2_t, g2_b = jax.grad(loss_ref, argnums=(0, 1))(qkv_t, bias)
    np.testing.assert_allclose(np.asarray(g1_t), np.asarray(g2_t),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(g1_b), np.asarray(g2_b),
                               atol=2e-3, rtol=2e-3)


def test_attention_cm_bf16():
    rng = np.random.default_rng(3)
    B, N, H, D = 2, 100, 4, 16
    qkv_t = _pack_cm(rng, B, N, H, D).astype(jnp.bfloat16)
    scale = D ** -0.5
    out = fa.attention_cm(qkv_t, H, scale, interpret=True)
    ref = fa._xla_sdpa_cm(qkv_t.astype(jnp.float32), H, scale)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)
