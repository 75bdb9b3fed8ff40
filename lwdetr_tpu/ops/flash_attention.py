"""Fused multi-head attention Pallas kernel for the ViT encoder.

The reference computes attention naively — materializing the (B, H, N, N)
score tensor through HBM three times (QK^T write, softmax read/write, PV
read; /root/reference/models/backbone/vit.py:130-137).  At LW-DETR sizes
(N<=6400 global tokens, head_dim 16..64) that score tensor is the encoder's
dominant HBM traffic: ~2 GB per global block at 640px batch 32.

This kernel fuses QK^T + softmax + PV in VMEM.  Because head_dim is small
(16-64) and N is moderate, each (batch, head) slice's full K and V panels
fit comfortably in VMEM (N=6400, hd=64, bf16 -> 0.8 MB each), so the kernel
is SINGLE-PASS per query block: no online-softmax state machine, exact
softmax, fp32 accumulation.  Grid = (batch, heads, q_blocks) directly over
the (B, N, H, D) layout — no head transpose passes.  Scores live only in
VMEM tiles of (block_q, N).

Sequence lengths that don't tile cleanly (the 4x4-window path has N=hw,
e.g. 100) are zero-padded to the tile size and masked with -inf scores
inside the kernel.

Falls back to the XLA einsum path for shapes where the score tile would not
fit VMEM (N > ~12k) — not reachable in LW-DETR configs.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    # head-major: q (g, blk_q, hd); k, v (g, Npad, hd); o (g, blk_q, hd)
    # g > 1 batches several (batch, head) slices per program — amortizes grid
    # overhead for the many tiny window-attention slices.
    g, blk_q, hd = q_ref.shape
    n_pad = k_ref.shape[1]
    # keep matmul INPUTS in the storage dtype (bf16 feeds the MXU at full
    # rate); accumulate fp32; scale the fp32 scores after the dot
    s = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, blk_q, Npad)
    s = s * scale
    if n_pad != kv_len:
        col = jax.lax.broadcasted_iota(jnp.int32, (g, blk_q, n_pad), 2)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    interpret: bool = False,
    head_major: bool = False,
) -> jnp.ndarray:
    """Fused attention (no mask — the encoder never masks: reference
    vit.py:361 always passes mask=None).

    Layouts: (B, N, H, D) by default; with head_major=True inputs AND output
    are (B, H, N, D) and the kernel does no transposes at all (callers fuse
    the layout change into the qkv unpacking, one HBM pass instead of four).
    """
    if head_major:
        B, H, N, D = q.shape
    else:
        B, N, H, D = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    # prefer an EXACT divisor block (multiple of 8 sublanes): padding N to
    # the block grid costs real MXU work (1600 -> 2048 is +28% FLOPs)
    blk_q = 0
    for cand in range(512, 7, -8):
        if N % cand == 0:
            blk_q = cand
            break
    if blk_q >= 64:
        n_pad = N
    else:
        blk_q = min(_round_up(N, 128), 512)
        n_pad = _round_up(N, blk_q)

    # score tile (blk_q, Npad) fp32 + K/V panels must fit VMEM (~16 MB)
    vmem_need = blk_q * n_pad * 4 + 3 * n_pad * max(D, 128) * 4
    if vmem_need > 13 * 1024 * 1024:
        return _xla_sdpa(q, k, v, scale)

    # head-major (B*H, N, D): the hd=16..64 head dim is the FULL last block
    # dim (Pallas requires last-two block dims (÷8, ÷128) or full)
    if head_major:
        qh = q.reshape(B * H, N, D)
        kh = k.reshape(B * H, N, D)
        vh = v.reshape(B * H, N, D)
    else:
        qh = q.transpose(0, 2, 1, 3).reshape(B * H, N, D)
        kh = k.transpose(0, 2, 1, 3).reshape(B * H, N, D)
        vh = v.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    if n_pad != N:
        pad = [(0, 0), (0, n_pad - N), (0, 0)]
        qh, kh, vh = jnp.pad(qh, pad), jnp.pad(kh, pad), jnp.pad(vh, pad)

    # group size g: batch several (b, h) slices per program when slices are
    # small (window attention: B*H can be ~6k programs of 128x128 work)
    if n_pad == blk_q:
        budget = 6 * 1024 * 1024
        # Mosaic pads the last dim to 128 lanes; assume fp32 casts + double
        # buffering for the 4 q/k/v/o panels plus the fp32 score tile
        d_pad = max(D, 128)
        per_slice = blk_q * n_pad * 4 + 4 * n_pad * d_pad * 8
        g = max(1, min(64, budget // per_slice))
        while (B * H) % g:
            g -= 1
    else:
        g = 1
    grid = (B * H // g, n_pad // blk_q)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, blk_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, blk_q, D), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * n_pad * n_pad * D,
            bytes_accessed=4 * B * H * n_pad * D * q.dtype.itemsize,
            transcendentals=B * H * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qh, kh, vh)
    if n_pad != N:
        out = out[:, :N]
    out = out.reshape(B, H, N, D)
    return out if head_major else out.transpose(0, 2, 1, 3)


def _xla_sdpa(q, k, v, scale):
    s = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", a, v)


def _xla_sdpa_hm(q, k, v, scale):
    """head-major (B, H, N, D) reference."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", a, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_diff(q, k, v, scale, interpret, head_major=False):
    return flash_attention(q, k, v, scale=scale, interpret=interpret,
                           head_major=head_major)


def _flash_fwd(q, k, v, scale, interpret, head_major=False):
    return flash_attention(q, k, v, scale=scale, interpret=interpret,
                           head_major=head_major), (q, k, v)


def _flash_bwd(scale, interpret, head_major, res, g):
    # Recompute-based backward through the XLA formulation: the training
    # step's grad graph materializes scores only in backward (the reference
    # materializes them in BOTH directions). A Pallas backward kernel can
    # replace this without touching callers.
    q, k, v = res
    ref = _xla_sdpa_hm if head_major else _xla_sdpa
    _, vjp = jax.vjp(lambda q, k, v: ref(q, k, v, scale), q, k, v)
    return vjp(g)


_flash_attention_diff.defvjp(_flash_fwd, _flash_bwd)


def sdpa(q, k, v, scale=None, use_pallas: bool = True, interpret: bool = False):
    """Scaled dot-product attention dispatcher.

    Pallas fused kernel for long sequences on TPU (the global-attention
    blocks, where the materialized score tensor dominates HBM traffic); XLA
    einsum for short windows, where per-program grid overhead and head-dim
    lane padding make the fused kernel slower than XLA's batched matmuls.
    """
    B, N, H, D = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    on_tpu = jax.default_backend() == "tpu"
    if interpret or (use_pallas and on_tpu and N >= 512):
        return _flash_attention_diff(q, k, v, scale, interpret, False)
    return _xla_sdpa(q, k, v, scale)


def sdpa_head_major(q, k, v, scale=None, use_pallas: bool = True,
                    interpret: bool = False):
    """Attention over head-major (B, H, N, D) q/k/v, returning head-major."""
    B, H, N, D = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    on_tpu = jax.default_backend() == "tpu"
    if interpret or (use_pallas and on_tpu and N >= 512):
        return _flash_attention_diff(q, k, v, scale, interpret, True)
    return _xla_sdpa_hm(q, k, v, scale)
