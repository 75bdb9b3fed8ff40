"""Multi-scale projector: per-scale resampling + C2f (CSP bottleneck) fusion.

TPU-native NHWC re-design of /root/reference/models/backbone/projector.py:
each ViT output level is resampled to the target scale (transposed convs for
up, strided convs for down), levels are concatenated along channels and fused
by a YOLOv8-style C2f block followed by a channel LayerNorm
(projector.py:165-209).  BatchNorm carries cross-replica statistics via
``axis_name`` (the reference converts to SyncBN, main.py:207-208).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _act(name: Optional[str]):
    if name == "silu":
        return nn.silu
    if name == "relu":
        return nn.relu
    if name is None:
        return lambda x: x
    raise ValueError(f"unsupported activation {name}")


class ConvX(nn.Module):
    """Conv(bias=False) + BatchNorm + activation (reference projector.py:85-98)."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: Optional[str] = "relu"
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch Conv2d(padding=k//2) == symmetric explicit padding
        p = self.kernel // 2
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.bn_axis_name if train else None,
            dtype=self.dtype,
            name="bn",
        )(x)
        return _act(self.act)(x)


class Bottleneck(nn.Module):
    """Two 3x3 ConvX with optional residual (reference projector.py:101-114)."""

    features: int
    shortcut: bool = False
    expand: float = 1.0
    act: str = "silu"
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expand)
        y = ConvX(hidden, 3, act=self.act, bn_axis_name=self.bn_axis_name,
                  dtype=self.dtype, name="cv1")(x, train)
        y = ConvX(self.features, 3, act=self.act, bn_axis_name=self.bn_axis_name,
                  dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            return x + y
        return y


class C2f(nn.Module):
    """CSP bottleneck with 2 convolutions (reference projector.py:117-132)."""

    features: int
    num_blocks: int = 3
    shortcut: bool = False
    act: str = "silu"
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2  # hidden channels (e=0.5)
        y = ConvX(2 * c, 1, act=self.act, bn_axis_name=self.bn_axis_name,
                  dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.num_blocks):
            parts.append(
                Bottleneck(c, shortcut=self.shortcut, expand=1.0, act=self.act,
                           bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                           name=f"m_{i}")(parts[-1], train)
            )
        y = jnp.concatenate(parts, axis=-1)
        return ConvX(self.features, 1, act=self.act, bn_axis_name=self.bn_axis_name,
                     dtype=self.dtype, name="cv2")(y, train)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels of NHWC maps (reference projector.py:21-47, eps 1e-6)."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        u = xf.mean(axis=-1, keepdims=True)
        s = jnp.square(xf - u).mean(axis=-1, keepdims=True)
        xf = (xf - u) / jnp.sqrt(s + self.epsilon)
        return (weight * xf + bias).astype(self.dtype)


class _UpSample4x(nn.Module):
    """scale 4.0: ConvT(2,2) -> channel-LN -> GELU -> ConvT(2,2); C -> C/4."""

    in_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.in_dim // 2, kernel_size=(2, 2), strides=(2, 2),
                             dtype=self.dtype, name="up1")(x)
        x = ChannelLayerNorm(dtype=self.dtype, name="ln")(x)
        # same dtype gate as vit.Mlp: tanh-gelu is sub-ulp-accurate in bf16
        # and much cheaper than XLA's erf expansion; f32 parity keeps erf
        x = nn.gelu(x, approximate=self.dtype == jnp.bfloat16)
        x = nn.ConvTranspose(self.in_dim // 4, kernel_size=(2, 2), strides=(2, 2),
                             dtype=self.dtype, name="up2")(x)
        return x


class _UpSample2x(nn.Module):
    """scale 2.0: [1x1 reduce if C>512] -> ConvT(2,2)."""

    in_dim: int
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.in_dim > 512:
            x = ConvX(self.in_dim // 2, 1, bn_axis_name=self.bn_axis_name,
                      dtype=self.dtype, name="reduce")(x, train)
            x = nn.ConvTranspose(self.in_dim // 4, kernel_size=(2, 2), strides=(2, 2),
                                 dtype=self.dtype, name="up")(x)
        else:
            x = nn.ConvTranspose(self.in_dim // 2, kernel_size=(2, 2), strides=(2, 2),
                                 dtype=self.dtype, name="up")(x)
        return x


class _DownSample2x(nn.Module):
    """scale 0.5: stride-2 3x3 ConvX, channels preserved."""

    in_dim: int
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvX(self.in_dim, 3, stride=2, bn_axis_name=self.bn_axis_name,
                     dtype=self.dtype, name="down")(x, train)


class MultiScaleProjector(nn.Module):
    """Projector over ViT multi-level outputs.

    Args (call): list of (B, H, W, C) maps (all same H, W for ViT).
    Returns: list of (B, H_s, W_s, out_channels), one per scale factor, plus
    an extra stride-2 subsample if scale 0.25 is requested
    (reference projector.py:237-240: max_pool(kernel=1, stride=2)).
    """

    in_channels: Sequence[int]
    out_channels: int
    scale_factors: Sequence[float]
    num_blocks: int = 3
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        use_extra_pool = False
        results = []
        for si, scale in enumerate(self.scale_factors):
            if scale == 0.25:
                use_extra_pool = True
                continue
            fused = []
            for li, in_dim in enumerate(self.in_channels):
                name = f"sampling_{si}_{li}"
                x = feats[li]
                if scale == 4.0:
                    x = _UpSample4x(in_dim, dtype=self.dtype, name=name)(x, train)
                elif scale == 2.0:
                    x = _UpSample2x(in_dim, bn_axis_name=self.bn_axis_name,
                                    dtype=self.dtype, name=name)(x, train)
                elif scale == 1.0:
                    pass
                elif scale == 0.5:
                    x = _DownSample2x(in_dim, bn_axis_name=self.bn_axis_name,
                                      dtype=self.dtype, name=name)(x, train)
                else:
                    raise NotImplementedError(f"unsupported scale {scale}")
                fused.append(x)
            x = jnp.concatenate(fused, axis=-1) if len(fused) > 1 else fused[0]
            x = C2f(self.out_channels, self.num_blocks, bn_axis_name=self.bn_axis_name,
                    dtype=self.dtype, name=f"stage_{si}")(x, train)
            x = ChannelLayerNorm(dtype=self.dtype, name=f"stage_ln_{si}")(x)
            results.append(x)
        if use_extra_pool:
            results.append(results[-1][:, ::2, ::2, :])
        return results
