"""Pallas fused-attention kernel parity (interpret mode on CPU) and vjp."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lwdetr_tpu.ops.flash_attention import _xla_sdpa, flash_attention, sdpa


@pytest.mark.parametrize("shape", [(2, 256, 2, 16), (2, 100, 3, 16), (1, 512, 2, 32)])
def test_kernel_parity_interpret(shape):
    B, N, H, D = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    out = flash_attention(q, k, v, interpret=True)
    ref = _xla_sdpa(q, k, v, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sdpa_grad_flows():
    B, N, H, D = 1, 256, 2, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(sdpa(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_sdpa(q, k, v, 1.0 / np.sqrt(D)) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("B,N,H,D", [(4, 100, 12, 16), (2, 1600, 12, 16),
                                     (2, 1600, 12, 32), (3, 104, 4, 48)])
def test_mha_packed_parity(B, N, H, D):
    """Heads-packed kernel == per-head XLA reference (window N=100 and
    global N=1600 LW-DETR shapes, incl. non-divisor N)."""
    from lwdetr_tpu.ops.flash_attention import mha_packed, _xla_sdpa

    rng = np.random.default_rng(0)
    C = H * D
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
               for _ in range(3))
    out = mha_packed(q, k, v, H, interpret=True)
    ref = _xla_sdpa(q.reshape(B, N, H, D), k.reshape(B, N, H, D),
                    v.reshape(B, N, H, D), 1.0 / np.sqrt(D)).reshape(B, N, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_mha_packed_grad():
    from lwdetr_tpu.ops.flash_attention import mha_packed, _xla_sdpa_packed

    rng = np.random.default_rng(1)
    B, N, H, D = 2, 100, 4, 16
    C = H * D
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
               for _ in range(3))

    def loss_pk(q, k, v):
        return jnp.sum(mha_packed(q, k, v, H, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_sdpa_packed(q, k, v, H, 1.0 / np.sqrt(D)) ** 2)

    g1 = jax.grad(loss_pk, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fused_layer_norm_parity():
    from lwdetr_tpu.ops.fused_ln import layer_norm, _ln_ref

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((512, 100, 192)) * 3 + 1, jnp.float32)
    s = jnp.asarray(rng.standard_normal(192), jnp.float32)
    b = jnp.asarray(rng.standard_normal(192), jnp.float32)
    got = layer_norm(x, s, b, interpret=True)
    ref = _ln_ref(x, s, b, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # grad parity (custom_vjp recompute path)
    g1 = jax.grad(lambda x: jnp.sum(layer_norm(x, s, b, interpret=True) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(_ln_ref(x, s, b, 1e-6) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    # ragged rows fall back to the XLA reference
    x2 = jnp.asarray(rng.standard_normal((7, 13, 192)), jnp.float32)
    got2 = layer_norm(x2, s, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got2),
                               np.asarray(_ln_ref(x2, s, b, 1e-6)), atol=1e-5)


def test_attention_cm_bwd_pallas_parity():
    """Pallas channel-major attention backward (long N path, interpret) vs
    the XLA SDPA backward."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lwdetr_tpu.ops import flash_attention as fa

    B, N, H, D = 2, 256, 4, 16  # N % 128 == 0 -> pallas backward path
    C = H * D
    rng = np.random.default_rng(21)
    qkv_t = jnp.asarray(rng.standard_normal((B, 3 * C, N)), jnp.float32)
    scale = D ** -0.5

    def loss_pallas(t):
        return jnp.sum(fa.attention_cm(t, H, scale, interpret=True) ** 2)

    def loss_ref(t):
        return jnp.sum(fa._xla_sdpa_cm(t, H, scale) ** 2)

    g1 = jax.grad(loss_pallas)(qkv_t)
    g2 = jax.grad(loss_ref)(qkv_t)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-3,
                               rtol=2e-3)
