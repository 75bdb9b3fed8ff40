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



def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_cm_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # channel-major refs: q (g, D, blk_q); k/v (g, D, N); o (g, D, blk_q).
    # Heads are SUBLANE blocks selected by the grid — no lane slicing, no
    # (N, H) transposes anywhere.
    s = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, blk_q, N)
    if scale != 1.0:  # callers fold scale into q upstream when they can
        s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1)  # (g, blk_q)
    # normalize AFTER the PV matmul: one (g, D, blk_q) divide instead of a
    # (g, blk_q, N) one — the softmax VPU chain is the exposed latency here
    o = jax.lax.dot_general(
        v_ref[...], p.astype(v_ref.dtype), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (g, D, blk_q)
    o_ref[...] = (o / l[:, None, :]).astype(o_ref.dtype)


def _allheads_body(qkv, o_ref, num_heads: int, scale: float):
    # qkv (g, 3C, N) array; o_ref (g, C, N).  Heads are static sublane
    # slices; per-head matmuls batch over g on the MXU.
    g, ZC, N = qkv.shape
    C = ZC // 3
    D = C // num_heads
    for h in range(num_heads):
        q = qkv[:, h * D:(h + 1) * D, :]                # (g, D, N)
        k = qkv[:, C + h * D:C + (h + 1) * D, :]
        v = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (g, Nq, Nk)
        if scale != 1.0:
            s = s * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1)  # (g, Nq)
        o = jax.lax.dot_general(
            v, p.astype(v.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (g, D, Nq)
        o_ref[:, h * D:(h + 1) * D, :] = (
            o / l[:, None, :]).astype(o_ref.dtype)


def _attn_cm_allheads_kernel(qkv_ref, o_ref, *, num_heads: int, scale: float):
    # qkv_ref (g, 3C, N): one CONTIGUOUS (3C, N) panel DMA per image
    # (the per-head (D, N) blocks of the grid-over-heads kernel are 3.2 KB
    # strided strips at N=100 — DMA-bound at ~140 GB/s).
    _allheads_body(qkv_ref[...], o_ref, num_heads, scale)


def _attn_cm_allheads_bias_kernel(qkv_ref, b_ref, o_ref, *, num_heads: int,
                                  scale: float):
    # bias-fused variant: the (3C,) qkv bias is added on the VMEM panel,
    # saving the standalone (B, 3C, N) HBM add pass the XLA graph would
    # otherwise run between the qkv GEMM and this kernel.
    qkv = qkv_ref[...] + b_ref[...][None, :, :].astype(qkv_ref.dtype)
    _allheads_body(qkv, o_ref, num_heads, scale)


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
    # BATCH-1 serving (global N~1600): B*H*n_q with blk_q=128 fragments
    # into ~156 latency-bound micro-programs (measured 0.159 ms/global
    # block at tiny bs1 = ~1 TFLOP/s).  Take the whole N in one q-block —
    # H programs; the (N, N) f32 score panel lives in scoped VMEM and its
    # buffer is reused across grid steps.  Strictly B == 1: at B = 2 the
    # fragmented path already pipelines well and whole-N measured SLOWER
    # (medium b2 train fwd: 35.9 -> 43.7 ms/step when this fired).
    serving = B == 1 and N <= 2048
    if serving:
        blk_q = _round_up(N, 128)
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
    if vmem_need > (40 if serving else 13) * 1024 * 1024:
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
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=(64 * 1024 * 1024 if serving else None)),
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


def _attn_cm_allheads_bias_call(qkv_t, bias2d, num_heads, scale, interpret):
    B, ZC, N = qkv_t.shape
    C = ZC // 3
    panel = ZC * N * qkv_t.dtype.itemsize
    g = max(1, min(16, (4 * 1024 * 1024) // max(panel, 1)))
    while B % g:
        g -= 1
    return pl.pallas_call(
        functools.partial(_attn_cm_allheads_bias_kernel, num_heads=num_heads,
                          scale=scale),
        grid=(B // g,),
        in_specs=[pl.BlockSpec((g, ZC, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ZC, 1), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, C, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, N), qkv_t.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * N * N * (C // num_heads),
            bytes_accessed=4 * B * ZC * N * qkv_t.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(qkv_t, bias2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _attn_cm_bias_diff(qkv_t, bias2d, num_heads, scale, interpret):
    return _attn_cm_allheads_bias_call(qkv_t, bias2d, num_heads, scale,
                                       interpret)


def _attn_cm_bias_fwd(qkv_t, bias2d, num_heads, scale, interpret):
    out = _attn_cm_allheads_bias_call(qkv_t, bias2d, num_heads, scale,
                                      interpret)
    return out, (qkv_t, bias2d)


def _attn_cm_bias_bwd(num_heads, scale, interpret, res, g):
    qkv_t, bias2d = res
    # materialize qkv+bias once for the backward recompute; the fusion only
    # needs to win on the forward/eval path
    qkvb = qkv_t + bias2d[None, :, :].astype(qkv_t.dtype)
    if interpret or jax.default_backend() == "tpu":
        dqkv = _attn_cm_bwd_pallas(qkvb, g, num_heads, scale, interpret)
    else:
        dqkv = None
    if dqkv is None:
        _, vjp = jax.vjp(lambda t: _xla_sdpa_cm(t, num_heads, scale), qkvb)
        (dqkv,) = vjp(g)
    dbias = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 2),
                    keepdims=False)[:, None].astype(bias2d.dtype)
    return dqkv, dbias


_attn_cm_bias_diff.defvjp(_attn_cm_bias_fwd, _attn_cm_bias_bwd)


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


def _attn_cm_bwd_allheads_kernel(qkv_ref, do_ref, dqkv_ref, *,
                                 num_heads: int, scale: float, kv_len: int):
    """Single-shot backward for short sequences (N<=128, one query block):
    all heads of g images per program, one contiguous (3C, N) panel DMA per
    image (mirrors _attn_cm_allheads_kernel — per-head (D, N) strips are
    DMA-bound at window sizes).  Zero-padded query rows self-cancel: their
    dout is zero, so ds and the dv contribution vanish; padded KEY columns
    are masked out of the softmax."""
    g, ZC, n_pad = qkv_ref.shape
    C = ZC // 3
    D = C // num_heads
    for h in range(num_heads):
        q = qkv_ref[:, h * D:(h + 1) * D, :]                 # (g, D, N)
        k = qkv_ref[:, C + h * D:C + (h + 1) * D, :]
        v = qkv_ref[:, 2 * C + h * D:2 * C + (h + 1) * D, :]
        do = do_ref[:, h * D:(h + 1) * D, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)               # (g, Nq, Nk)
        s = s * scale
        if n_pad != kv_len:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)               # (g, Nq, Nk)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row) * scale).astype(q.dtype)         # (g, Nq, Nk)
        pq = p.astype(do.dtype)
        dqkv_ref[:, h * D:(h + 1) * D, :] = jax.lax.dot_general(
            k, ds, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)
        dqkv_ref[:, C + h * D:C + (h + 1) * D, :] = jax.lax.dot_general(
            q, ds, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)
        dqkv_ref[:, 2 * C + h * D:2 * C + (h + 1) * D, :] = jax.lax.dot_general(
            do, pq, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)


def _attn_cm_bwd_pallas(qkv_t, dout_t, num_heads, scale, interpret):
    """(B, 3C, N), (B, C, N) -> d(qkv_t) (B, 3C, N)."""
    B, ZC, N = qkv_t.shape
    C = ZC // 3
    D = C // num_heads
    H = num_heads

    if N <= 128:
        n_pad = _round_up(N, 128)
        N_orig = N
        if n_pad != N:
            qkv_t = jnp.pad(qkv_t, [(0, 0), (0, 0), (0, n_pad - N)])
            dout_t = jnp.pad(dout_t, [(0, 0), (0, 0), (0, n_pad - N)])
        # panels + per-head f32 (Nq, Nk) intermediates
        per_slice = (2 * ZC + C) * n_pad * qkv_t.dtype.itemsize \
            + 5 * n_pad * n_pad * 4
        g = max(1, min(16, (8 * 1024 * 1024) // max(per_slice, 1)))
        while B % g:
            g -= 1
        try:
            out = pl.pallas_call(
                functools.partial(_attn_cm_bwd_allheads_kernel,
                                  num_heads=H, scale=scale, kv_len=N_orig),
                grid=(B // g,),
                in_specs=[
                    pl.BlockSpec((g, ZC, n_pad), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((g, C, n_pad), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((g, ZC, n_pad), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, ZC, n_pad), qkv_t.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
                cost_estimate=pl.CostEstimate(
                    flops=10 * B * H * n_pad * n_pad * D,
                    bytes_accessed=2 * B * ZC * n_pad * qkv_t.dtype.itemsize,
                    transcendentals=B * H * n_pad * n_pad,
                ),
                interpret=interpret,
            )(qkv_t, dout_t)
        except Exception:
            return None
        return out[:, :, :N_orig] if n_pad != N_orig else out

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
    try:
        dq, dk, dv = _attn_cm_bwd_pallas_call(
            qkv_t, dout_t, grid, g, D, H, N, blk_q, n_q, N_orig, scale,
            interpret)
    except Exception:
        # trace-time spec/shape failure: report "no kernel" so the caller
        # falls back to the XLA VJP instead of dying (ADVICE r1)
        return None
    out = jnp.concatenate([dq, dk, dv], axis=1)
    return out[:, :, :N_orig] if N != N_orig else out


def _attn_cm_bwd_pallas_call(qkv_t, dout_t, grid, g, D, H, N, blk_q, n_q,
                             N_orig, scale, interpret):
    B = qkv_t.shape[0]
    C = D * H
    return pl.pallas_call(
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


def _attn_cm_bwd(num_heads, scale, interpret, res, g):
    (qkv_t,) = res
    B, ZC, N = qkv_t.shape
    # window blocks (N=hw, e.g. 100) take the Pallas path too: the XLA vjp
    # re-materializes the (B, H, N, N) scores through HBM even at small N,
    # and the window path is the majority of encoder blocks
    if interpret or jax.default_backend() == "tpu":
        out = _attn_cm_bwd_pallas(qkv_t, g, num_heads, scale, interpret)
        if out is not None:
            return (out,)
    _, vjp = jax.vjp(lambda t: _xla_sdpa_cm(t, num_heads, scale), qkv_t)
    return vjp(g)


_attn_cm_diff.defvjp(_attn_cm_fwd, _attn_cm_bwd)


def attention_cm(qkv_t, num_heads: int, scale: Optional[float] = None,
                 use_pallas: bool = True, interpret: bool = False,
                 bias: Optional[jnp.ndarray] = None):
    """Fused attention over channel-major packed qkv (B, 3*C, N) -> (B, C, N).

    `bias` is an optional (3C,) qkv bias.  On the short-sequence (window)
    kernel it is added on the VMEM panel inside the kernel — the standalone
    (B, 3C, N) add costs a full HBM round trip per block (~0.12 ms x 6
    window blocks at small@640 b32).  Longer sequences add it inline (XLA
    fuses it into the qkv GEMM epilogue there)."""
    B, ZC, N = qkv_t.shape
    assert ZC % (3 * num_heads) == 0
    if scale is None:
        scale = 1.0 / math.sqrt(ZC // 3 // num_heads)
    on_tpu = jax.default_backend() == "tpu"
    if interpret or (use_pallas and on_tpu):
        if bias is not None and N <= 128:
            return _attn_cm_bias_diff(qkv_t, bias[:, None].astype(jnp.float32),
                                      num_heads, scale, interpret)
        if bias is not None:
            qkv_t = qkv_t + bias.astype(qkv_t.dtype)[:, None]
        return _attn_cm_diff(qkv_t, num_heads, scale, interpret)
    if bias is not None:
        qkv_t = qkv_t + bias.astype(qkv_t.dtype)[:, None]
    return _xla_sdpa_cm(qkv_t, num_heads, scale)


def _xla_sdpa(q, k, v, scale):
    s = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", a, v)

