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


def _attn_cm_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # channel-major refs: q (g, D, blk_q); k/v (g, D, N); o (g, D, blk_q).
    # Heads are SUBLANE blocks selected by the grid — no lane slicing, no
    # (N, H) transposes anywhere.
    s = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, blk_q, N)
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v_ref.dtype)
    o_ref[...] = jax.lax.dot_general(
        v_ref[...], p, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_cm_allheads_kernel(qkv_ref, o_ref, *, num_heads: int, scale: float):
    # qkv_ref (g, 3C, N); o_ref (g, C, N).  All heads of g images per
    # program: the qkv DMA is one CONTIGUOUS (3C, N) panel per image
    # (the per-head (D, N) blocks of the grid-over-heads kernel are 3.2 KB
    # strided strips at N=100 — DMA-bound at ~140 GB/s).  Heads are static
    # sublane slices; per-head matmuls batch over g on the MXU.
    g, ZC, N = qkv_ref.shape
    C = ZC // 3
    D = C // num_heads
    for h in range(num_heads):
        q = qkv_ref[:, h * D:(h + 1) * D, :]            # (g, D, N)
        k = qkv_ref[:, C + h * D:C + (h + 1) * D, :]
        v = qkv_ref[:, 2 * C + h * D:2 * C + (h + 1) * D, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (g, Nq, Nk)
        s = s * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v.dtype)
        o_ref[:, h * D:(h + 1) * D, :] = jax.lax.dot_general(
            v, p, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_cm_impl(qkv_t, num_heads, scale, interpret):
    """Attention over channel-major packed qkv (B, 3C, N) -> (B, C, N).

    The qkv GEMM emits (B, 3C, N) natively (einsum 'bnc,cz->bzn' — XLA
    writes the MXU output in this orientation without a copy), and the
    out-projection consumes (B, C, N) natively ('cz,bcn->bnz'), so the
    full attention sandwich runs with ZERO layout copies. Per-head q/k/v
    panels are (D, N) sublane-blocks of qkv_t — legal BlockSpec blocks
    (sublane blocks need only 8-divisibility, D >= 16)."""
    B, ZC, N = qkv_t.shape
    C = ZC // 3
    D = C // num_heads
    H = num_heads

    # SHORT sequences (window attention, N<=128): all heads of g images per
    # program, whole (3C, N) panels — one contiguous DMA per image instead
    # of 3H strided (D, N) strips
    if N <= 128:
        panel = ZC * N * qkv_t.dtype.itemsize
        g = max(1, min(16, (4 * 1024 * 1024) // max(panel, 1)))
        while B % g:
            g -= 1
        out = pl.pallas_call(
            functools.partial(_attn_cm_allheads_kernel, num_heads=H,
                              scale=scale),
            grid=(B // g,),
            in_specs=[pl.BlockSpec((g, ZC, N), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((g, C, N), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, C, N), qkv_t.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * N * N * D,
                bytes_accessed=4 * B * ZC * N * qkv_t.dtype.itemsize,
                transcendentals=B * H * N * N,
            ),
            interpret=interpret,
        )(qkv_t)
        return out

    # q lane-block: Mosaic pads the ragged tail block internally; K/V
    # panels span the full (unpadded) N so no masking is ever needed.
    blk_q = min(_round_up(N, 128), 128)
    n_q = (N + blk_q - 1) // blk_q

    # batch g images per program: amortizes grid overhead for windows AND
    # for global blocks (measured 5.9 -> 4.1 ms at g=8 on small@640)
    budget = 10 * 1024 * 1024
    n_r = _round_up(N, 128)
    per_slice = 6 * blk_q * n_r + 4 * max(D, 8) * n_r * 4
    g = max(1, min(16, budget // max(per_slice, 1)))
    while B % g:
        g -= 1

    vmem_need = g * per_slice
    if vmem_need > 13 * 1024 * 1024:
        q = qkv_t[:, :C].reshape(B, H, D, N).transpose(0, 3, 1, 2)
        k = qkv_t[:, C:2 * C].reshape(B, H, D, N).transpose(0, 3, 1, 2)
        v = qkv_t[:, 2 * C:].reshape(B, H, D, N).transpose(0, 3, 1, 2)
        out = _xla_sdpa(q, k, v, scale)  # (B, N, H, D)
        return out.transpose(0, 2, 3, 1).reshape(B, C, N)

    grid = (B // g, H, n_q)
    out = pl.pallas_call(
        functools.partial(_attn_cm_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, D, blk_q), lambda b, h, qi: (b, h, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, D, N), lambda b, h, qi: (b, H + h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, D, N), lambda b, h, qi: (b, 2 * H + h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, D, blk_q), lambda b, h, qi: (b, h, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, N), qkv_t.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * D,
            bytes_accessed=4 * B * H * N * D * qkv_t.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
        interpret=interpret,
    )(qkv_t, qkv_t, qkv_t)
    return out


def _xla_sdpa_cm(qkv_t, num_heads, scale):
    B, ZC, N = qkv_t.shape
    C = ZC // 3
    D = C // num_heads
    q = qkv_t[:, :C].reshape(B, num_heads, D, N).transpose(0, 3, 1, 2)
    k = qkv_t[:, C:2 * C].reshape(B, num_heads, D, N).transpose(0, 3, 1, 2)
    v = qkv_t[:, 2 * C:].reshape(B, num_heads, D, N).transpose(0, 3, 1, 2)
    out = _xla_sdpa(q, k, v, scale)  # (B, N, H, D)
    return out.transpose(0, 2, 3, 1).reshape(B, C, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _attn_cm_diff(qkv_t, num_heads, scale, interpret):
    return _attn_cm_impl(qkv_t, num_heads, scale, interpret)


def _attn_cm_fwd(qkv_t, num_heads, scale, interpret):
    return _attn_cm_impl(qkv_t, num_heads, scale, interpret), (qkv_t,)


def _attn_cm_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                        dk_acc, dv_acc, *, scale: float, n_q: int,
                        kv_len: int):
    """Channel-major attention backward: recomputes the softmax tile in VMEM
    (the XLA backward materializes the (B, H, N, N) score tensor in HBM
    twice). q/do blocks (g, D, blk_q); k/v panels (g, D, N_pad)."""
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    g_, _, blk_q = q.shape
    n_pad = k.shape[2]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, blk_q, N_pad)
    s = s * scale
    if n_pad != kv_len:  # padded keys never win the softmax
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (g, blk_q, N_pad)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, blk_q, N_pad)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row) * scale  # (g, blk_q, N_pad)
    if n_pad != kv_len:
        # padded QUERY rows must not contribute to dk/dv
        qrow = qi * blk_q + jax.lax.broadcasted_iota(
            jnp.int32, (g_, blk_q, 1), 1)
        live = qrow < kv_len
        ds = jnp.where(live, ds, 0.0)
        p = jnp.where(live, p, 0.0)
    ds = ds.astype(q.dtype)

    dq_ref[...] = jax.lax.dot_general(
        k, ds, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)  # (g, D, blk_q)
    dk_acc[...] += jax.lax.dot_general(
        q, ds, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, D, N)
    dv_acc[...] += jax.lax.dot_general(
        do, p.astype(do.dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, D, N)

    @pl.when(qi == n_q - 1)
    def _():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _attn_cm_bwd_pallas(qkv_t, dout_t, num_heads, scale, interpret):
    """(B, 3C, N), (B, C, N) -> d(qkv_t) (B, 3C, N)."""
    B, ZC, N = qkv_t.shape
    C = ZC // 3
    D = C // num_heads
    H = num_heads

    blk_q = min(_round_up(N, 128), 128)
    n_pad = _round_up(N, blk_q)
    n_q = n_pad // blk_q

    # VMEM: 3 (g, blk_q, N) f32 tiles + 4 bf16 panels + 2 f32 scratches
    budget = 11 * 1024 * 1024
    per_slice = 3 * blk_q * n_pad * 4 + 4 * D * n_pad * 2 + 2 * D * n_pad * 4
    g = max(1, min(8, budget // max(per_slice, 1)))
    while B % g:
        g -= 1
    if g * per_slice > 13 * 1024 * 1024:
        return None

    N_orig = N
    if n_pad != N:
        qkv_t = jnp.pad(qkv_t, [(0, 0), (0, 0), (0, n_pad - N)])
        dout_t = jnp.pad(dout_t, [(0, 0), (0, 0), (0, n_pad - N)])
        N = n_pad

    grid = (B // g, H, n_q)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_cm_bwd_kernel, scale=scale, n_q=n_q,
                          kv_len=N_orig),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, D, blk_q), lambda b, h, qi: (b, h, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, D, N), lambda b, h, qi: (b, H + h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, D, N), lambda b, h, qi: (b, 2 * H + h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, D, blk_q), lambda b, h, qi: (b, h, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, D, blk_q), lambda b, h, qi: (b, h, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, D, N), lambda b, h, qi: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, D, N), lambda b, h, qi: (b, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, C, N), qkv_t.dtype)] * 3,
        scratch_shapes=[pltpu.VMEM((g, D, N), jnp.float32),
                        pltpu.VMEM((g, D, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * N * N * D,
            bytes_accessed=8 * B * H * N * D * qkv_t.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
        interpret=interpret,
    )(qkv_t, qkv_t, qkv_t, dout_t)
    out = jnp.concatenate([dq, dk, dv], axis=1)
    return out[:, :, :N_orig] if N != N_orig else out


def _attn_cm_bwd(num_heads, scale, interpret, res, g):
    (qkv_t,) = res
    B, ZC, N = qkv_t.shape
    if interpret or (N >= 256 and jax.default_backend() == "tpu"):
        out = _attn_cm_bwd_pallas(qkv_t, g, num_heads, scale, interpret)
        if out is not None:
            return (out,)
    _, vjp = jax.vjp(lambda t: _xla_sdpa_cm(t, num_heads, scale), qkv_t)
    return vjp(g)


_attn_cm_diff.defvjp(_attn_cm_fwd, _attn_cm_bwd)


def attention_cm(qkv_t, num_heads: int, scale: Optional[float] = None,
                 use_pallas: bool = True, interpret: bool = False):
    """Fused attention over channel-major packed qkv (B, 3*C, N) -> (B, C, N)."""
    B, ZC, N = qkv_t.shape
    assert ZC % (3 * num_heads) == 0
    if scale is None:
        scale = 1.0 / math.sqrt(ZC // 3 // num_heads)
    on_tpu = jax.default_backend() == "tpu"
    if interpret or (use_pallas and on_tpu):
        return _attn_cm_diff(qkv_t, num_heads, scale, interpret)
    return _xla_sdpa_cm(qkv_t, num_heads, scale)


def _qkv_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    # refs: q (g, blk_q, 1, 1, D); k/v (g, n_pad, 1, 1, D); o (g, blk_q, 1, D)
    g, blk_q, _, _, D = q_ref.shape
    n_pad = k_ref.shape[1]
    q = q_ref[:, :, 0, 0, :]
    k = k_ref[:, :, 0, 0, :]
    v = v_ref[:, :, 0, 0, :]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * scale
    if n_pad != kv_len:
        col = jax.lax.broadcasted_iota(jnp.int32, (g, blk_q, n_pad), 2)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[:, :, 0, :] = (o / l).astype(o_ref.dtype)


def _flash_qkv_impl(qkv, scale, interpret):
    """Attention straight off the packed (B, N, 3, H, D) qkv tensor.

    The head and q/k/v axes are GRID/BlockSpec dimensions, not data
    movement: XLA never materializes transposed (B*H, N, D) copies (those
    copies cost ~7% of the whole LW-DETR-small forward). Output is
    (B, N, H, D) — contiguous for the .reshape(B, N, C) the out-proj wants.
    """
    B, N, _, H, D = qkv.shape

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
    if n_pad != N:
        qkv = jnp.pad(qkv, [(0, 0), (0, n_pad - N), (0, 0), (0, 0), (0, 0)])

    # batch g images per program for short sequences (window attention)
    if n_pad == blk_q:
        budget = 6 * 1024 * 1024
        d_pad = max(D, 128)
        per_slice = blk_q * n_pad * 4 + 4 * n_pad * d_pad * 8
        g = max(1, min(64, budget // per_slice))
        while B % g:
            g -= 1
    else:
        g = 1

    vmem_need = g * (blk_q * n_pad * 4 + 3 * n_pad * max(D, 128) * 4)
    if vmem_need > 13 * 1024 * 1024:
        q, k, v = qkv[:, :N, 0], qkv[:, :N, 1], qkv[:, :N, 2]
        return _xla_sdpa(q, k, v, scale)

    grid = (B // g, H, n_pad // blk_q)
    out = pl.pallas_call(
        functools.partial(_qkv_attn_kernel, scale=scale, kv_len=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, blk_q, 1, 1, D), lambda b, h, qi: (b, qi, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, 1, 1, D), lambda b, h, qi: (b, 0, 1, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, 1, 1, D), lambda b, h, qi: (b, 0, 2, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, blk_q, 1, D), lambda b, h, qi: (b, qi, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, H, D), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * n_pad * n_pad * D,
            bytes_accessed=4 * B * H * n_pad * D * qkv.dtype.itemsize,
            transcendentals=B * H * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    if n_pad != N:
        out = out[:, :N]
    return out


def _xla_sdpa_qkv(qkv, scale):
    return _xla_sdpa(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _flash_qkv_diff(qkv, scale, interpret):
    return _flash_qkv_impl(qkv, scale, interpret)


def _flash_qkv_fwd(qkv, scale, interpret):
    return _flash_qkv_impl(qkv, scale, interpret), (qkv,)


def _flash_qkv_bwd(scale, interpret, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(lambda t: _xla_sdpa_qkv(t, scale), qkv)
    return vjp(g)


_flash_qkv_diff.defvjp(_flash_qkv_fwd, _flash_qkv_bwd)


def flash_attention_qkv(qkv, scale: Optional[float] = None,
                        use_pallas: bool = True, interpret: bool = False):
    """Fused attention over the packed (B, N, 3, H, D) qkv projection output.

    Returns (B, N, H, D).
    """
    B, N, three, H, D = qkv.shape
    assert three == 3
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    on_tpu = jax.default_backend() == "tpu"
    if interpret or (use_pallas and on_tpu):
        return _flash_qkv_diff(qkv, scale, interpret)
    return _xla_sdpa_qkv(qkv, scale)


def _mha_packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                       kv_len: int, num_heads: int, blk_k: int):
    """Heads-packed attention: refs are (g, blk, H*D); the head loop lives
    INSIDE the kernel as static lane slices, so callers never transpose the
    (B, N, H, D) axes — q/k/v arrive exactly as the qkv GEMM wrote them.

    K/V panels are VMEM-resident; the kv-chunk loop (flash-style online
    softmax) only bounds the live fp32 score tile to (g, blk_q, blk_k) so
    the unrolled head loop can't blow the VMEM stack."""
    g, blk_q, C = q_ref.shape
    n_pad = k_ref.shape[1]
    D = C // num_heads
    n_chunks = n_pad // blk_k
    for h in range(num_heads):
        sl = slice(h * D, (h + 1) * D)
        qh = q_ref[:, :, sl]
        m = jnp.full((g, blk_q, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((g, blk_q, 1), jnp.float32)
        acc = jnp.zeros((g, blk_q, D), jnp.float32)
        for kc in range(n_chunks):
            krows = slice(kc * blk_k, (kc + 1) * blk_k)
            s = jax.lax.dot_general(
                qh, k_ref[:, krows, sl], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (g, blk_q, blk_k)
            s = s * scale
            if (kc + 1) * blk_k > kv_len:  # only the tail chunk is masked
                col = kc * blk_k + jax.lax.broadcasted_iota(
                    jnp.int32, (g, blk_q, blk_k), 2)
                s = jnp.where(col >= kv_len, NEG_INF, s)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[:, krows, sl],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            m = m_new
        o_ref[:, :, sl] = (acc / l).astype(o_ref.dtype)


def _mha_packed_impl(q, k, v, num_heads, scale, interpret):
    B, N, C = q.shape

    # full-M MXU tiles: blk_q = 128 (pad N up); short sequences (windows)
    # run as one block so g-batching can amortize the grid
    if N <= 128:
        blk_q = n_pad = _round_up(N, 128)
    else:
        blk_q = 128
        n_pad = _round_up(N, 128)

    if n_pad != N:
        pad = [(0, 0), (0, n_pad - N), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    # kv chunk: bounds the live fp32 score tile; K/V panels stay resident
    blk_k = n_pad
    for cand in range(512, 127, -128):
        if n_pad % cand == 0:
            blk_k = cand
            break

    # batch g rows per program when each row is small (window attention)
    if n_pad == blk_q:
        budget = 5 * 1024 * 1024
        # a few head iterations' score tiles stay live under Mosaic's
        # scheduler; budget ~4 of them plus the bf16+fp32 panel copies
        per_slice = 4 * blk_q * blk_k * 4 + 4 * n_pad * C * 4
        g = max(1, min(32, budget // per_slice))
        while B % g:
            g -= 1
    else:
        g = 1

    # q/k/v/o panels + a few live score tiles must fit VMEM
    vmem_need = g * (4 * blk_q * blk_k * 4 + 4 * n_pad * C * 4)
    if vmem_need > 13 * 1024 * 1024:
        D = C // num_heads
        qh = q[:, :N].reshape(B, N, num_heads, D)
        kh = k[:, :N].reshape(B, N, num_heads, D)
        vh = v[:, :N].reshape(B, N, num_heads, D)
        return _xla_sdpa(qh, kh, vh, scale).reshape(B, N, C)

    grid = (B // g, n_pad // blk_q)
    out = pl.pallas_call(
        functools.partial(_mha_packed_kernel, scale=scale, kv_len=N,
                          num_heads=num_heads, blk_k=blk_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, blk_q, C), lambda b, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, C), lambda b, qi: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, C), lambda b, qi: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, blk_q, C), lambda b, qi: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n_pad * n_pad * C,
            bytes_accessed=4 * B * n_pad * C * q.dtype.itemsize,
            transcendentals=B * num_heads * n_pad * n_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    if n_pad != N:
        out = out[:, :N]
    return out


def _xla_sdpa_packed(q, k, v, num_heads, scale):
    B, N, C = q.shape
    D = C // num_heads
    return _xla_sdpa(q.reshape(B, N, num_heads, D), k.reshape(B, N, num_heads, D),
                     v.reshape(B, N, num_heads, D), scale).reshape(B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _mha_packed_diff(q, k, v, num_heads, scale, interpret):
    return _mha_packed_impl(q, k, v, num_heads, scale, interpret)


def _mha_packed_fwd(q, k, v, num_heads, scale, interpret):
    return _mha_packed_impl(q, k, v, num_heads, scale, interpret), (q, k, v)


def _mha_packed_bwd(num_heads, scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_sdpa_packed(q, k, v, num_heads, scale), q, k, v)
    return vjp(g)


_mha_packed_diff.defvjp(_mha_packed_fwd, _mha_packed_bwd)


def mha_packed(q, k, v, num_heads: int, scale: Optional[float] = None,
               use_pallas: bool = True, interpret: bool = False):
    """Multi-head attention over heads-packed (B, N, H*D) q/k/v.

    The layout matches the qkv projection GEMM's natural output, so the
    encoder does zero (N, H) transposes around the attention op — the
    profiler showed those XLA layout copies costing ~15% of the whole
    LW-DETR-small forward when q/k/v were split to (B, N, H, D) first.
    """
    B, N, C = q.shape
    assert C % num_heads == 0
    if scale is None:
        scale = 1.0 / math.sqrt(C // num_heads)
    on_tpu = jax.default_backend() == "tpu"
    if interpret or (use_pallas and on_tpu):
        return _mha_packed_diff(q, k, v, num_heads, scale, interpret)
    return _xla_sdpa_packed(q, k, v, num_heads, scale)


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
