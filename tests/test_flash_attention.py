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
