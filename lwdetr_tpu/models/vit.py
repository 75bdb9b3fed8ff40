"""ViTDet-style plain ViT encoder with interleaved window/global attention.

TPU-native re-design of /root/reference/models/backbone/vit.py:26-365:

* channel-last (B, H, W, C) feature maps throughout (TPU conv layout);
* the reference's window-major trick is kept verbatim in spirit — the token
  buffer is reorganized ONCE into 16 windows (reshape-only, XLA-free), window
  blocks attend over (B*16, hw, C) and global blocks view the same buffer as
  (B, 16*hw, C) (vit.py:353-358, 201-214);
* absolute position embeddings are resized from the pretraining grid with an
  exact torch-bicubic matrix product (ops/resize.py) instead of an
  interpolation primitive (vit.py:26-54);
* CAE mode: fused qkv projection with bias = concat(q_bias, 0, v_bias) and
  layer-scale gamma_1/gamma_2 (vit.py:111-126, 189-193);
* stochastic depth rates are runtime inputs so the reference's per-iteration
  drop scheduler (util/drop_scheduler.py) works without recompilation.

All attention here is exact softmax attention. On TPU it runs through the
fused channel-major Pallas kernel (`ops/flash_attention.py::attention_cm`):
window blocks use the all-heads variant over (B*16, hw) panels, global
blocks grid over (batch, head) at N = 16*hw; scores never touch HBM in
either pass. Off-TPU (and as the test oracle) the plain XLA einsum-softmax
form is used.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lwdetr_tpu.ops.resize import bicubic_resize_2d
from lwdetr_tpu.utils import is_static_zero

NUM_WINDOWS_SIDE = 4  # fixed 4x4 = 16 windows (reference vit.py:353-358)


def get_abs_pos(pos_embed: jnp.ndarray, has_cls_token: bool, hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize (1, num_pos, C) pretraining pos-embed to (1, H, W, C)."""
    h, w = hw
    if has_cls_token:
        pos_embed = pos_embed[:, 1:]
    xy_num = pos_embed.shape[1]
    size = int(math.sqrt(xy_num))
    assert size * size == xy_num, "pos_embed grid must be square"
    grid = pos_embed.reshape(1, size, size, -1)
    return bicubic_resize_2d(grid, (h, w))


def _drop_path(x: jnp.ndarray, rate: jnp.ndarray, deterministic: bool, rng) -> jnp.ndarray:
    """Per-sample stochastic depth; `rate` may be a traced scalar.
    A CONCRETE rate of 0.0 skips mask generation (no RNG in the graph)."""
    if deterministic or is_static_zero(rate):
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / jnp.maximum(keep, 1e-8).astype(x.dtype)


class Attention(nn.Module):
    """Fused-qkv multi-head self-attention with CAE bias trick.

    The softmax-attention core goes through ops/flash_attention.attention_cm:
    a channel-major Pallas kernel fusing QK^T+softmax+PV in VMEM, used by
    both window and global blocks.
    """

    dim: int
    num_heads: int
    use_cae: bool = True
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 out_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from lwdetr_tpu.ops.flash_attention import attention_cm

        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.truncated_normal(0.02), (C, 3 * C), jnp.float32
        )
        if self.use_cae:
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,), jnp.float32)
            qkv_bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        else:
            qkv_bias = self.param("qkv_bias", nn.initializers.zeros, (3 * C,), jnp.float32)

        # fold the softmax scale into the q projection (an O(C^2) weight
        # multiply at trace time): the in-kernel s*scale elementwise pass
        # over every (blk_q, N) score tile is pure exposed VPU latency
        fold = jnp.concatenate(
            [jnp.full((C,), scale), jnp.ones((2 * C,))]).astype(jnp.float32)
        qkv_kernel = qkv_kernel * fold[None, :]
        qkv_bias = qkv_bias * fold

        # channel-major attention sandwich: the qkv GEMM writes (B, 3C, N)
        # natively and the out-proj GEMM reads (B, C, N) natively, so the
        # whole attention runs with ZERO layout copies; per-head panels are
        # sublane blocks inside the Pallas kernel (see attention_cm)
        qkv_t = jnp.einsum("bnc,cz->bzn", x, qkv_kernel.astype(self.dtype))
        out_t = attention_cm(qkv_t, self.num_heads, scale=1.0,
                             use_pallas=self.use_flash, bias=qkv_bias)
        # CAE layer-scale folds into the out-projection (gamma*(xW+b) =
        # x(W*gamma) + b*gamma) — the standalone (B, N, C) multiply is an
        # unfused HBM pass at eval
        out = DenseCM(C, dtype=self.dtype, name="proj",
                      out_scale=out_scale)(out_t)
        return out


class DenseCM(nn.Module):
    """Dense layer consuming channel-major (B, C_in, N) and emitting
    row-major (B, N, C_out). Same param names/shapes as nn.Dense, so the
    torch<->flax checkpoint bridge is unaffected."""

    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.truncated_normal(0.02)
    out_scale: Optional[jnp.ndarray] = None

    @nn.compact
    def __call__(self, x_t: jnp.ndarray) -> jnp.ndarray:
        c_in = x_t.shape[1]
        kernel = self.param("kernel", self.kernel_init,
                            (c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if self.out_scale is not None:
            kernel = kernel * self.out_scale[None, :]
            bias = bias * self.out_scale
        out = jnp.einsum("cz,bcn->bnz", kernel.astype(self.dtype),
                         x_t.astype(self.dtype))
        return out + bias.astype(self.dtype)


class DenseFolded(nn.Module):
    """nn.Dense (same param names/shapes) with an optional (features,)
    output scale folded into kernel and bias at trace time."""

    features: int
    dtype: jnp.dtype = jnp.float32
    out_scale: Optional[jnp.ndarray] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.truncated_normal(0.02),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if self.out_scale is not None:
            kernel = kernel * self.out_scale[None, :]
            bias = bias * self.out_scale
        return x @ kernel.astype(self.dtype) + bias.astype(self.dtype)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 out_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1",
                     kernel_init=nn.initializers.truncated_normal(0.02))(x)
        # torch nn.GELU is exact erf; in bf16 the tanh approximation is within
        # one bf16 ulp of erf-gelu everywhere and XLA's erf expansion costs
        # ~2.7x the whole MLP fusion on TPU (0.86 vs 0.32 ms at small/b32),
        # so bf16 compute uses tanh and f32 (the parity dtype) keeps erf.
        x = nn.gelu(x, approximate=self.dtype == jnp.bfloat16)
        # CAE layer-scale folded into fc2 (see DenseCM.out_scale)
        return DenseFolded(self.dim, dtype=self.dtype, name="fc2",
                           out_scale=out_scale)(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    window: bool
    mlp_ratio: float = 4.0
    use_cae: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, drop_path_rate, deterministic: bool):
        # x: (B*16, hw, C) window-major token buffer
        Bw, HW, C = x.shape
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)

        if not self.window:
            h = h.reshape(Bw // 16, 16 * HW, C)

        gamma_1 = gamma_2 = None
        if self.use_cae:
            gamma_1 = self.param("gamma_1", nn.initializers.constant(0.1), (C,), jnp.float32)
            gamma_2 = self.param("gamma_2", nn.initializers.constant(0.1), (C,), jnp.float32)

        h = Attention(self.dim, self.num_heads, use_cae=self.use_cae,
                      dtype=self.dtype, name="attn")(h, out_scale=gamma_1)

        if not self.window:
            h = h.reshape(Bw, HW, C)

        if not deterministic:
            h = _drop_path(h, drop_path_rate, deterministic, self.make_rng("dropout"))
        x = shortcut + h

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = Mlp(self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(h, out_scale=gamma_2)
        if not deterministic:
            h = _drop_path(h, drop_path_rate, deterministic, self.make_rng("dropout"))
        return x + h


class PatchEmbedGEMM(nn.Module):
    """stride==kernel 'VALID' patch-embed conv as patch-regroup + GEMM.

    A non-overlapping 16x16 patch conv is exactly a (P*P*Cin, C) matmul
    over regrouped patches; XLA's conv lowering of the (B, 640, 640, 3)
    input (3-lane minor dim, 42x lane padding) leaves huge MXU headroom —
    measured 0.50 ms at tiny bs1 (0.5% MXU, 37% of the whole forward's op
    time).  Param names/shapes match nn.Conv ('kernel' (kh, kw, cin, cout),
    'bias' (cout,)): the torch<->flax checkpoint bridge is unchanged
    (reference vit.py:57-83 uses the same conv layout)."""

    features: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, Hi, Wi, Cin = x.shape
        P = self.patch_size
        H, W = Hi // P, Wi // P
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (P, P, Cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        # (B, H, P, W, P*Cin) is a free view of the row-major image; the
        # patch-row dim (P) and packed patch-col dim (P*Cin) contract
        # jointly against the kernel — no explicit transpose, XLA picks
        # the layout inside the contraction.  A/B-measured in-model
        # against the conv lowering and an explicit transpose+GEMM: the
        # einsum form is the only one fast in BOTH directions (conv fwd
        # was 0.5 ms at bs1; the transpose+GEMM's backward regressed
        # medium's train step 35.9 -> 51.6 ms).
        x5 = x.reshape(B, H, P, W, P * Cin)
        y = jnp.einsum(
            "bhpwq,pqc->bhwc", x5.astype(self.dtype),
            kernel.astype(self.dtype).reshape(P, P * Cin, self.features))
        return y + bias.astype(self.dtype)


class ViT(nn.Module):
    """Plain ViT with multi-level feature taps.

    Returns a list of (B, H, W, C) maps at `out_feature_indexes`.
    """

    embed_dim: int
    depth: int
    num_heads: int = 12
    patch_size: int = 16
    mlp_ratio: float = 4.0
    window_block_indexes: Tuple[int, ...] = ()
    out_feature_indexes: Tuple[int, ...] = (-1,)
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    use_cae: bool = True
    # jax.checkpoint each block: recompute block activations in the backward
    # instead of holding them in HBM (enables larger per-chip train batches)
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        num_patches = (self.pretrain_img_size // self.patch_size) ** 2
        num_positions = num_patches + 1 if self.pretrain_use_cls_token else num_patches
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, num_positions, self.embed_dim), jnp.float32,
        )
        self.patch_proj = PatchEmbedGEMM(
            self.embed_dim,
            patch_size=self.patch_size,
            dtype=self.dtype,
            name="patch_embed",
        )
        out_idx = [i if i >= 0 else i + self.depth for i in self.out_feature_indexes]
        self._out_flags = tuple(i in out_idx for i in range(self.depth))
        assert self._out_flags[-1], "last block must be an output feature"
        # nn.remat counts __call__ args with self at 0: deterministic (3) is
        # static (python bool selects the dropout-free path at trace time)
        block_cls = nn.remat(Block, static_argnums=(3,)) if self.remat else Block
        self.blocks = [
            block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                window=(i in self.window_block_indexes),
                mlp_ratio=self.mlp_ratio,
                use_cae=self.use_cae,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]

    def __call__(
        self,
        x: jnp.ndarray,
        drop_path_rates: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """x: (B, H_img, W_img, 3) -> list[(B, H, W, C)], H = H_img // patch."""
        x = self.patch_proj(x)  # (B, H, W, C)
        B, H, W, C = x.shape
        pos = get_abs_pos(self.pos_embed, self.pretrain_use_cls_token, (H, W))
        x = x + pos.astype(x.dtype)

        assert H % NUM_WINDOWS_SIDE == 0 and W % NUM_WINDOWS_SIDE == 0
        h, w = H // NUM_WINDOWS_SIDE, W // NUM_WINDOWS_SIDE

        # window-major reorganization: one reshape+transpose, shared by all blocks
        x = x.reshape(B, NUM_WINDOWS_SIDE, h, NUM_WINDOWS_SIDE, w, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B * 16, h * w, C)

        if drop_path_rates is None:
            # concrete zeros: blocks skip stochastic depth at trace time
            drop_path_rates = [0.0] * self.depth

        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x, drop_path_rates[i], deterministic)
            if self._out_flags[i]:
                o = x.reshape(B, NUM_WINDOWS_SIDE, NUM_WINDOWS_SIDE, h, w, C)
                o = o.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
                outs.append(o)
        return outs
