"""DETR decoder stack with two-stage proposal selection and deformable cross-attention.

TPU-native re-design of /root/reference/models/transformer.py:128-534 and the
MSDeformAttn module wrapper (/root/reference/models/ops/modules/
ms_deform_attn.py:37-144).  Everything is static-shape and jit-compatible:

* spatial shapes are Python tuples (compile-time constants);
* group-DETR self-attention splits queries into `group_detr` chunks folded
  into the batch axis (transformer.py:486-495) — a pure reshape;
* two-stage proposal generation is top_k + gather, all on device
  (transformer.py:224-264);
* dropout rates are traced scalars so the per-iteration drop scheduler
  (util/drop_scheduler.py) changes rates without recompilation.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lwdetr_tpu.ops.deform_attn import (_sample_blocks, _sep_vmem_need,
                                        ms_deform_attn_cm,
                                        ms_deform_attn_fast,
                                        ms_deform_attn_sep_panels,
                                        sampling_offsets_init_bias)
from lwdetr_tpu.ops.embeddings import query_sine_embed
from lwdetr_tpu.utils import is_static_zero


def _dropout(x, rate, deterministic: bool, rng):
    """Dropout with a (possibly traced) rate.

    A CONCRETE rate of 0.0 (all release configs) skips mask generation
    entirely (see utils.is_static_zero)."""
    if deterministic or is_static_zero(rate):
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape).astype(x.dtype)
    return x * mask / jnp.maximum(keep, 1e-8).astype(x.dtype)


class MLPHead(nn.Module):
    """num_layers-deep ReLU MLP (reference transformer.py:27-39)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    zero_init_last: bool = False
    last_bias_init: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            features = self.output_dim if last else self.hidden_dim
            kernel_init = (
                nn.initializers.zeros if (last and self.zero_init_last)
                else nn.initializers.xavier_uniform()
            )
            if last and self.last_bias_init is not None:
                bias_init = nn.initializers.constant(self.last_bias_init)
            elif last and self.zero_init_last:
                bias_init = nn.initializers.zeros
            else:
                bias_init = nn.initializers.zeros
            x = nn.Dense(features, dtype=self.dtype, kernel_init=kernel_init,
                         bias_init=bias_init, name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x


class MultiheadSelfAttention(nn.Module):
    """Standard MHA with fused in-projection, matching the reference's custom
    MultiheadAttention math (/root/reference/models/attention.py:563-606)."""

    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, dropout_rate=0.0, deterministic: bool = True):
        C = self.d_model
        head_dim = C // self.num_heads
        in_kernel = self.param("in_proj_kernel", nn.initializers.xavier_uniform(),
                               (C, 3 * C), jnp.float32)
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,), jnp.float32)
        ik = in_kernel.astype(self.dtype)
        ib = in_bias.astype(self.dtype)

        no_drop = deterministic or is_static_zero(dropout_rate)
        if (jax.default_backend() == "tpu" and no_drop
                and q.shape[1] == k.shape[1]):
            # channel-major sandwich into the fused Pallas attention (see
            # ops/flash_attention.attention_cm): the in-projections write
            # (B, *, N) natively and out_proj reads (B, C, N) natively.
            # Attention-weight dropout (rate>0) needs the einsum path.
            from lwdetr_tpu.ops.flash_attention import attention_cm

            if q is k:
                qk_t = jnp.einsum("bnc,cz->bzn", q, ik[:, :2 * C])
                qk_t = qk_t + ib[:2 * C, None]
            else:
                qp_t = jnp.einsum("bnc,cz->bzn", q, ik[:, :C]) + ib[:C, None]
                kp_t = (jnp.einsum("bnc,cz->bzn", k, ik[:, C:2 * C])
                        + ib[C:2 * C, None])
                qk_t = jnp.concatenate([qp_t, kp_t], axis=1)
            vp_t = (jnp.einsum("bnc,cz->bzn", v, ik[:, 2 * C:])
                    + ib[2 * C:, None])
            qkv_t = jnp.concatenate([qk_t, vp_t], axis=1)  # (B, 3C, N)
            out_t = attention_cm(qkv_t, self.num_heads, scale=head_dim**-0.5)
            from lwdetr_tpu.models.vit import DenseCM
            return DenseCM(C, dtype=self.dtype, name="out_proj",
                           kernel_init=nn.initializers.xavier_uniform())(out_t)

        qp = q @ ik[:, :C] + ib[:C]
        kp = k @ ik[:, C:2 * C] + ib[C:2 * C]
        vp = v @ ik[:, 2 * C:] + ib[2 * C:]

        B, Nq, _ = qp.shape
        Nk = kp.shape[1]
        qp = qp.reshape(B, Nq, self.num_heads, head_dim)
        kp = kp.reshape(B, Nk, self.num_heads, head_dim)
        vp = vp.reshape(B, Nk, self.num_heads, head_dim)

        attn = jnp.einsum("bnhd,bmhd->bhnm", qp * (head_dim**-0.5), kp)
        attn = jax.nn.softmax(attn, axis=-1)
        if not deterministic:
            attn = _dropout(attn, dropout_rate, deterministic, self.make_rng("dropout"))
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vp).reshape(B, Nq, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj",
                        kernel_init=nn.initializers.xavier_uniform())(out)


class DenseToCM(nn.Module):
    """Dense layer consuming row-major (B, N, C_in) and emitting CHANNEL-
    MAJOR (B, C_out, N) — the GEMM writes its MXU output in this orientation
    without a layout copy. Param names/shapes match nn.Dense (checkpoint
    bridge unaffected)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        out = jnp.einsum("bnc,cz->bzn", x.astype(self.dtype),
                         kernel.astype(self.dtype))
        return out + bias.astype(self.dtype)[:, None]


class DenseBHND(nn.Module):
    """Dense layer consuming row-major (B, N, C_in) and emitting HEAD-MAJOR
    (B, H, N, D) — the layout the separable deform-attn kernel's per-level
    value panels slice without a transpose (and whose VJP is again a pure
    GEMM). Param names/shapes match nn.Dense (checkpoint bridge
    unaffected)."""

    features: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        H = self.num_heads
        D = self.features // H
        kernel = self.param("kernel", self.kernel_init,
                            (c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        out = jnp.einsum("bnc,chd->bhnd", x.astype(self.dtype),
                         kernel.astype(self.dtype).reshape(c_in, H, D))
        return out + bias.astype(self.dtype).reshape(H, D)[:, None]


class MSDeformAttnModule(nn.Module):
    """Projection wrapper around the deformable-attention core op
    (reference models/ops/modules/ms_deform_attn.py:96-144)."""

    d_model: int
    n_levels: int
    n_heads: int
    n_points: int
    dtype: jnp.dtype = jnp.float32
    # Test knob: force a specific kernel branch ("sep" | "cm" | "gather")
    # instead of the backend-based dispatch below, optionally running the
    # Pallas kernels in interpret mode so the TPU-only branches are
    # exercisable on CPU. Production call sites leave these at defaults.
    force_branch: Optional[str] = None
    kernel_interpret: bool = False

    @nn.compact
    def __call__(self, query, reference_points, memory, spatial_shapes,
                 padding_mask=None, train: bool = False,
                 memory_levels=None):
        """query (B, Q, C); reference_points (B, Q, L, 2|4) in [0,1];
        memory (B, Len_in, C); spatial_shapes static [(H, W)]*L;
        memory_levels: optional list of per-level (B, H_l*W_l, C) views of
        memory (pre-concatenation) — lets the sep branch project per-level
        value panels directly instead of slicing the concat buffer (an XLA
        dynamic_slice COPY, strided over B*H: 1.9 ms/slice/layer at
        large@640 b32)."""
        B, Q, C = query.shape
        Len_in = memory.shape[1]
        D = C // self.n_heads

        if self.force_branch is not None:
            assert self.force_branch in ("sep", "cm", "gather")
            use_sep = self.force_branch == "sep"
            channel_major = self.force_branch == "cm"
        else:
            on_tpu = jax.default_backend() == "tpu" and Len_in >= 128
            # Kernel dispatch (both measured at small@640 on v5e):
            # * inference: channel-major sparse-matrix sampler — at Q=300 the
            #   (q, n) one-hot sweep is cheap and the zero-copy value layout
            #   wins; the separable path pays an unavoidable per-layer value
            #   relayout that the small Q cannot amortize.
            # * training (group-DETR Q = num_queries*groups, e.g. 3904): the
            #   (q, n) sweep scales with Q in forward AND both backward
            #   kernels, while the separable factorization's value prep is
            #   Q-independent — sep wins there.
            # * large token counts (P3 levels, Len_in ~ 6800): the cm sweep
            #   is O(q·n·cp) regardless of mode and dominates the whole
            #   forward (measured 41 ms/call at large@640 b32 eval) — sep in
            #   both modes.
            use_sep = on_tpu and (train or Len_in >= 4096)
            if use_sep:
                vmem = _sep_vmem_need(tuple(spatial_shapes), self.n_heads, D,
                                      128,
                                      self.n_levels * self.n_points * 2,
                                      self.n_points,
                                      val_bytes=jnp.dtype(self.dtype).itemsize)
                use_sep = vmem <= 40 * 1024 * 1024
            channel_major = on_tpu and not use_sep

        # pad queries to the kernel q-block at the SOURCE: a wide-lane
        # (B, Q, C) pad is ~free, while padding the narrow per-point
        # index/weight arrays downstream costs ~0.65 ms/layer of strided DMA
        Q0 = Q
        if use_sep:
            q_blk = min(128, -(-Q // 8) * 8)
            q_pad = -(-Q // q_blk) * q_blk
        elif channel_major:
            q_pad = _sample_blocks(Q, Len_in)[1]
        else:
            q_pad = Q
        if q_pad != Q:
            query = jnp.pad(query, [(0, 0), (0, q_pad - Q), (0, 0)])
            rp_pad = [(0, 0), (0, q_pad - Q)] + [(0, 0)] * (reference_points.ndim - 2)
            reference_points = jnp.pad(reference_points, rp_pad)
            Q = q_pad

        if channel_major:
            # (B, C, Len_in): the GEMM writes channel-major natively; the
            # sampler and the output projection consume it without transposes.
            # DenseToCM/DenseCM use the same param names/shapes as nn.Dense,
            # so the torch<->flax checkpoint bridge holds for either branch.
            value_t = DenseToCM(C, dtype=self.dtype, name="value_proj")(memory)
            if padding_mask is not None:
                value_t = jnp.where(padding_mask[:, None, :], 0.0, value_t)
        elif use_sep:
            # head-major straight out of the GEMM, one GEMM per level on the
            # SAME DenseBHND instance (shared params, checkpoint bridge
            # unaffected): each (B, N_l, C) chunk projects to (B, H, N_l, D)
            # whose (N_l, D) -> (H_l, W_l*D) panel regroup is a contiguous
            # view — no per-level slice of a concat buffer anywhere
            vp = DenseBHND(C, self.n_heads, dtype=self.dtype,
                           name="value_proj")
            if memory_levels is None:
                memory_levels = []
                start = 0
                for hl, wl in spatial_shapes:
                    memory_levels.append(
                        jax.lax.slice_in_dim(memory, start, start + hl * wl,
                                             axis=1))
                    start += hl * wl
            vals = []
            start = 0
            for (hl, wl), mem_l in zip(spatial_shapes, memory_levels):
                v_l = vp(mem_l)  # (B, H, hl*wl, D)
                if padding_mask is not None:
                    m_l = jax.lax.slice_in_dim(padding_mask, start,
                                               start + hl * wl, axis=1)
                    v_l = jnp.where(m_l[:, None, :, None], 0.0, v_l)
                start += hl * wl
                vals.append(v_l.reshape(B, self.n_heads, hl, wl * D))
        else:
            value = nn.Dense(C, dtype=self.dtype, name="value_proj",
                             kernel_init=nn.initializers.xavier_uniform())(memory)
            if padding_mask is not None:
                value = jnp.where(padding_mask[..., None], 0.0, value)
            value = value.reshape(B, Len_in, self.n_heads, C // self.n_heads)

        offsets = nn.Dense(
            self.n_heads * self.n_levels * self.n_points * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: sampling_offsets_init_bias(
                self.n_heads, self.n_levels, self.n_points).astype(dtype),
            name="sampling_offsets",
        )(query).reshape(B, Q, self.n_heads, self.n_levels, self.n_points, 2)

        weights = nn.Dense(
            self.n_heads * self.n_levels * self.n_points,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(B, Q, self.n_heads, self.n_levels * self.n_points)
        weights = jax.nn.softmax(weights, axis=-1)
        weights = weights.reshape(B, Q, self.n_heads, self.n_levels, self.n_points)

        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], dtype=offsets.dtype)
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / normalizer[None, None, None, :, None, :])
        elif reference_points.shape[-1] == 4:
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / self.n_points
                   * reference_points[:, :, None, :, None, 2:] * 0.5)
        else:
            raise ValueError("reference_points last dim must be 2 or 4")

        if channel_major:
            out_t = ms_deform_attn_cm(value_t, spatial_shapes, loc, weights,
                                      self.n_heads,
                                      interpret=self.kernel_interpret)  # (B, C, Q)
            from lwdetr_tpu.models.vit import DenseCM
            out = DenseCM(C, dtype=self.dtype, name="output_proj",
                          kernel_init=nn.initializers.xavier_uniform())(out_t)
        else:
            if use_sep:
                out = ms_deform_attn_sep_panels(
                    tuple(vals), spatial_shapes, loc, weights,
                    interpret=self.kernel_interpret)
            else:
                out = ms_deform_attn_fast(value, spatial_shapes, loc, weights,
                                          interpret=self.kernel_interpret)
            out = nn.Dense(C, dtype=self.dtype, name="output_proj",
                           kernel_init=nn.initializers.xavier_uniform())(out)
        return out[:, :Q0] if Q != Q0 else out


class DecoderLayer(nn.Module):
    """Self-attn (group-split) -> deformable cross-attn -> FFN, post-norm
    (reference transformer.py:430-534)."""

    d_model: int
    sa_nheads: int
    ca_nheads: int
    dim_feedforward: int
    group_detr: int
    n_levels: int
    n_points: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos, reference_points, spatial_shapes,
                 padding_mask=None, dropout_rate=0.0, train: bool = False,
                 memory_levels=None):
        B, Q, C = tgt.shape
        det = not train

        q = k = tgt + query_pos
        v = tgt
        if train and self.group_detr > 1:
            # fold groups into batch so groups don't attend across. BATCH-
            # major (B*g, Qg, C) — a pure reshape, queries are already
            # ordered groups-within-batch. (The reference's chunk+cat to
            # group-major (g*B, ...) at transformer.py:486-495 is an
            # arbitrary ordering choice; attention math is per-slice either
            # way, and the transpose costs ~20 ms/step fwd+bwd on TPU.)
            def split(x):
                return x.reshape(B * self.group_detr, Q // self.group_detr, C)
            q, k, v = split(q), split(k), split(v)

        tgt2 = MultiheadSelfAttention(self.d_model, self.sa_nheads, dtype=self.dtype,
                                      name="self_attn")(q, k, v, dropout_rate, det)
        if train and self.group_detr > 1:
            tgt2 = tgt2.reshape(B, Q, C)

        if not det:
            tgt2 = _dropout(tgt2, dropout_rate, det, self.make_rng("dropout"))
        tgt = tgt + tgt2
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)

        tgt2 = MSDeformAttnModule(
            self.d_model, self.n_levels, self.ca_nheads, self.n_points,
            dtype=self.dtype, name="cross_attn",
        )(tgt + query_pos, reference_points, memory, spatial_shapes,
          padding_mask, train=train, memory_levels=memory_levels)
        if not det:
            tgt2 = _dropout(tgt2, dropout_rate, det, self.make_rng("dropout"))
        tgt = tgt + tgt2
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)

        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1",
                     kernel_init=nn.initializers.xavier_uniform())(tgt)
        h = nn.relu(h)
        if not det:
            h = _dropout(h, dropout_rate, det, self.make_rng("dropout"))
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2",
                     kernel_init=nn.initializers.xavier_uniform())(h)
        if not det:
            h = _dropout(h, dropout_rate, det, self.make_rng("dropout"))
        tgt = tgt + h
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)
        return tgt


def box_reparam_combine(base: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """bbox reparameterization: cxcy = d_xy * base_wh + base_xy, wh = exp(d_wh) * base_wh
    (reference lwdetr.py:149-155 / transformer.py:317-326)."""
    cxcy = delta[..., :2] * base[..., 2:] + base[..., :2]
    wh = jnp.exp(delta[..., 2:]) * base[..., 2:]
    return jnp.concatenate([cxcy, wh], axis=-1)


def gen_encoder_output_proposals(
    memory: jnp.ndarray,
    padding_mask: Optional[jnp.ndarray],
    spatial_shapes: Sequence[Tuple[int, int]],
    unsigmoid: bool,
):
    """Anchor-grid proposals per memory position (reference transformer.py:71-125).

    memory (B, S, C); padding_mask (B, S) True=padded or None.
    Returns (output_memory (B, S, C), output_proposals (B, S, 4)).
    """
    B, S, C = memory.shape
    proposals = []
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        if padding_mask is not None:
            m = padding_mask[:, start:start + H * W].reshape(B, H, W)
            valid_h = jnp.sum(~m[:, :, 0], axis=1).astype(jnp.float32)  # (B,)
            valid_w = jnp.sum(~m[:, 0, :], axis=1).astype(jnp.float32)
        else:
            valid_h = jnp.full((B,), float(H))
            valid_w = jnp.full((B,), float(W))
        gy, gx = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
            indexing="ij")
        grid = jnp.stack([gx, gy], axis=-1)  # (H, W, 2)
        scale = jnp.stack([valid_w, valid_h], axis=-1).reshape(B, 1, 1, 2)
        grid = (grid[None] + 0.5) / scale
        wh = jnp.ones_like(grid) * (0.05 * (2.0 ** lvl))
        proposals.append(jnp.concatenate([grid, wh], axis=-1).reshape(B, -1, 4))
        start += H * W

    output_proposals = jnp.concatenate(proposals, axis=1)
    valid = jnp.all(
        (output_proposals > 0.01) & (output_proposals < 0.99), axis=-1, keepdims=True)

    if unsigmoid:
        output_proposals = jnp.log(output_proposals / (1 - output_proposals))
        fill = jnp.inf
    else:
        fill = 0.0
    if padding_mask is not None:
        output_proposals = jnp.where(padding_mask[..., None], fill, output_proposals)
    output_proposals = jnp.where(~valid, fill, output_proposals)

    output_memory = memory
    if padding_mask is not None:
        output_memory = jnp.where(padding_mask[..., None], 0.0, output_memory)
    output_memory = jnp.where(~valid, 0.0, output_memory)
    return output_memory, output_proposals


class Transformer(nn.Module):
    """Decoder-only transformer with two-stage proposal init
    (reference transformer.py:128-288)."""

    d_model: int
    sa_nheads: int
    ca_nheads: int
    num_queries: int
    dec_layers: int
    dim_feedforward: int
    group_detr: int
    two_stage: bool
    num_feature_levels: int
    dec_n_points: int
    lite_refpoint_refine: bool
    bbox_reparam: bool
    decoder_norm: str = "LN"
    num_classes: int = 91
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            DecoderLayer(
                d_model=self.d_model, sa_nheads=self.sa_nheads,
                ca_nheads=self.ca_nheads, dim_feedforward=self.dim_feedforward,
                group_detr=self.group_detr, n_levels=self.num_feature_levels,
                n_points=self.dec_n_points, dtype=self.dtype, name=f"layers_{i}",
            )
            for i in range(self.dec_layers)
        ]
        self.ref_point_head = MLPHead(self.d_model, self.d_model, 2,
                                      dtype=self.dtype, name="ref_point_head")
        if self.decoder_norm == "LN":
            self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        else:
            self.norm = lambda x: x
        if self.two_stage:
            self.enc_output = [
                nn.Dense(self.d_model, dtype=self.dtype, name=f"enc_output_{g}",
                         kernel_init=nn.initializers.xavier_uniform())
                for g in range(self.group_detr)
            ]
            self.enc_output_norm = [
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"enc_output_norm_{g}")
                for g in range(self.group_detr)
            ]
            # independent per-group heads, init-identical to the main heads
            # (reference lwdetr.py:95-99: deepcopies of class_embed/bbox_embed)
            prior = -math.log((1 - 0.01) / 0.01)
            self.enc_out_class_embed = [
                nn.Dense(self.num_classes, dtype=self.dtype,
                         bias_init=nn.initializers.constant(prior),
                         name=f"enc_out_class_embed_{g}")
                for g in range(self.group_detr)
            ]
            self.enc_out_bbox_embed = [
                MLPHead(self.d_model, 4, 3, zero_init_last=True, dtype=self.dtype,
                        name=f"enc_out_bbox_embed_{g}")
                for g in range(self.group_detr)
            ]

        # non-lite iterative refinement shares the top bbox head; the shared
        # module instance is passed in by LWDETR via module attribute
        # (see models/lwdetr.py).

    def _get_reference(self, refpoints, valid_ratios):
        """sine-embed refpoints -> query_pos; expand refpoints per level
        (reference transformer.py:344-357)."""
        obj_center = refpoints[..., :4]
        if valid_ratios is not None:
            vr = jnp.concatenate([valid_ratios, valid_ratios], axis=-1)  # (B, L, 4)
            refpoints_input = obj_center[:, :, None] * vr[:, None]  # (B, Q, L, 4)
        else:
            refpoints_input = jnp.broadcast_to(
                obj_center[:, :, None],
                obj_center.shape[:2] + (self.num_feature_levels, 4))
        qse = query_sine_embed(refpoints_input[:, :, 0, :], dim=self.d_model // 2)
        query_pos = self.ref_point_head(qse.astype(self.dtype))
        return obj_center, refpoints_input, query_pos

    def __call__(self, srcs, masks, pos_embeds, refpoint_embed, query_feat,
                 bbox_embed=None, dropout_rate=0.0, train: bool = False):
        """
        srcs: list[(B, H, W, C)] projector outputs;
        masks: list[(B, H, W) bool] padding masks or None;
        pos_embeds: list[(B, H, W, C)];
        refpoint_embed: (num_queries*G, 4) learned (raw);
        query_feat: (num_queries*G, C);
        bbox_embed: shared box head module for iterative refinement (non-lite).
        Returns hs (L, B, Q, C), references, memory_ts, boxes_ts.
        """
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        B = srcs[0].shape[0]

        # NOTE: per-level sine pos embeds (`pos_embeds`) are accepted for API
        # parity but unused — the reference decoder never reads them
        # (transformer.py:466-517 ignores `pos`).
        memory_levels = [s.reshape(B, -1, s.shape[-1]) for s in srcs]
        memory = jnp.concatenate(memory_levels, axis=1)
        if masks is not None:
            mask_flat = jnp.concatenate([m.reshape(B, -1) for m in masks], axis=1)
            valid_ratios = jnp.stack(
                [self._valid_ratio(m) for m in masks], axis=1)  # (B, L, 2)
        else:
            mask_flat = None
            valid_ratios = None

        group_detr = self.group_detr if train else 1

        memory_ts = boxes_ts = None
        if self.two_stage:
            output_memory, output_proposals = gen_encoder_output_proposals(
                memory, mask_flat, spatial_shapes, unsigmoid=not self.bbox_reparam)
            refpoint_ts, mem_ts, box_ts = [], [], []
            for g in range(group_detr):
                mem_g = self.enc_output_norm[g](self.enc_output[g](output_memory))
                cls_g = self.enc_out_class_embed[g](mem_g)  # (B, S, K)
                if self.bbox_reparam:
                    delta_g = self.enc_out_bbox_embed[g](mem_g)
                    coords_g = box_reparam_combine(output_proposals, delta_g)
                else:
                    coords_g = self.enc_out_bbox_embed[g](mem_g) + output_proposals

                topk_scores = jnp.max(cls_g, axis=-1)  # (B, S)
                _, topk_idx = jax.lax.top_k(topk_scores, self.num_queries)  # (B, nq)
                ref_undetach = jnp.take_along_axis(
                    coords_g, topk_idx[..., None], axis=1)  # (B, nq, 4)
                tgt_undetach = jnp.take_along_axis(
                    mem_g, topk_idx[..., None], axis=1)  # (B, nq, C)

                refpoint_ts.append(jax.lax.stop_gradient(ref_undetach))
                mem_ts.append(tgt_undetach)
                box_ts.append(ref_undetach)
            refpoint_embed_ts = jnp.concatenate(refpoint_ts, axis=1)
            memory_ts = jnp.concatenate(mem_ts, axis=1)
            boxes_ts = jnp.concatenate(box_ts, axis=1)

        nq_total = self.num_queries * group_detr
        tgt = jnp.broadcast_to(
            query_feat[None, :nq_total], (B, nq_total, self.d_model)).astype(self.dtype)
        refpoints = jnp.broadcast_to(
            refpoint_embed[None, :nq_total], (B, nq_total, 4)).astype(jnp.float32)

        if self.two_stage:
            if self.bbox_reparam:
                refpoints = box_reparam_combine(refpoint_embed_ts, refpoints)
            else:
                refpoints = refpoints + refpoint_embed_ts

        # --- decoder loop (reference transformer.py:328-427) ---
        intermediates = []
        ref_list = [refpoints]

        if self.lite_refpoint_refine:
            base = refpoints if self.bbox_reparam else jax.nn.sigmoid(refpoints)
            obj_center, refpoints_input, query_pos = self._get_reference(base, valid_ratios)

        output = tgt
        for layer_id, layer in enumerate(self.layers):
            if not self.lite_refpoint_refine:
                base = refpoints if self.bbox_reparam else jax.nn.sigmoid(refpoints)
                obj_center, refpoints_input, query_pos = self._get_reference(base, valid_ratios)

            output = layer(
                output, memory, query_pos, refpoints_input.astype(self.dtype),
                spatial_shapes, padding_mask=mask_flat,
                dropout_rate=dropout_rate, train=train,
                memory_levels=memory_levels)

            if not self.lite_refpoint_refine:
                assert bbox_embed is not None, "non-lite refine needs shared bbox head"
                delta = bbox_embed(output)
                if self.bbox_reparam:
                    new_ref = box_reparam_combine(refpoints, delta)
                else:
                    new_ref = refpoints + delta
                if layer_id != self.dec_layers - 1:
                    ref_list.append(new_ref)
                refpoints = jax.lax.stop_gradient(new_ref)

            intermediates.append(self.norm(output))

        hs = jnp.stack(intermediates)  # (L, B, Q, C)
        if not self.lite_refpoint_refine:
            # ref_list holds [init, refined_0, ..., refined_{L-2}]: layer i's
            # output box decodes against ref_list[i] (reference
            # transformer.py:389-395, lwdetr.py:149-157)
            references = jnp.stack(ref_list)  # (L, B, Q, 4)
        else:
            references = refpoints[None]  # (1, B, Q, 4) broadcast over layers

        if self.two_stage and not self.bbox_reparam and boxes_ts is not None:
            boxes_ts = jax.nn.sigmoid(boxes_ts)
        return hs, references, memory_ts, boxes_ts

    @staticmethod
    def _valid_ratio(mask):
        """(B, H, W) True=pad -> (B, 2) [w_ratio, h_ratio]
        (reference transformer.py:189-196)."""
        H, W = mask.shape[1], mask.shape[2]
        valid_h = jnp.sum(~mask[:, :, 0], axis=1).astype(jnp.float32)
        valid_w = jnp.sum(~mask[:, 0, :], axis=1).astype(jnp.float32)
        return jnp.stack([valid_w / W, valid_h / H], axis=-1)
