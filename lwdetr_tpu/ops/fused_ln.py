"""Fused LayerNorm Pallas kernel.

XLA lowers each encoder LayerNorm to a 3-pass convert/reduce/normalize
chain over HBM (profiled at ~0.4 ms per LN on LW-DETR-small@640 batch 32 —
~10x the bandwidth-ideal cost, ~19% of the whole forward across the 20
encoder LNs). This kernel does one read + one write per token block with
fp32 statistics in VMEM, matching flax nn.LayerNorm numerics (reference
uses torch nn.LayerNorm eps=1e-6: /root/reference/models/backbone/vit.py).

Backward runs through the XLA reference implementation via custom_vjp
(recompute; LN backward is bandwidth-bound either way).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (rows, C)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * g_ref[...].astype(jnp.float32)
                  + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _ln_ref(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _ln_impl(x, scale, bias, eps, interpret):
    orig_shape = x.shape
    C = orig_shape[-1]
    rows = x.size // C
    x2 = x.reshape(rows, C)

    blk = 1024
    while rows % blk and blk > 8:
        blk //= 2
    if rows % blk:
        return _ln_ref(x, scale, bias, eps)

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rows // blk,),
        in_specs=[
            pl.BlockSpec((blk, C), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, C), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, C), bias.reshape(1, C))
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_diff(x, scale, bias, eps, interpret):
    return _ln_impl(x, scale, bias, eps, interpret)


def _ln_fwd(x, scale, bias, eps, interpret):
    return _ln_impl(x, scale, bias, eps, interpret), (x, scale, bias)


def _ln_bwd(eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x, s, b: _ln_ref(x, s, b, eps), x, scale, bias)
    return vjp(g)


_ln_diff.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(x, scale, bias, eps: float = 1e-6, use_pallas: bool = True,
               interpret: bool = False):
    """LayerNorm over the last axis with fp32 stats (flax/torch semantics)."""
    on_tpu = jax.default_backend() == "tpu"
    if interpret or (use_pallas and on_tpu and x.shape[-1] % 128 != 1):
        return _ln_diff(x, scale, bias, eps, interpret)
    return _ln_ref(x, scale, bias, eps)
