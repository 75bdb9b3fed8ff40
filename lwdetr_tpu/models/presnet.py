"""PResNet (ResNet-vd) alternative backbone.

NHWC flax re-design of /root/reference/models/backbone/presnet.py:40-351.
Selected via `--encoder res18vd/res50vd` (reference backbone.py:86-108); a
secondary path not used by any release config but part of the capability
surface.  Returns a single concatenated feature map: stages {1,2,3} pooled /
upsampled to a common stride-16 grid (presnet.py:331-350).

Freezing semantics: the reference freezes parameters via requires_grad and
swaps BatchNorm for FrozenBatchNorm (running stats only).  Here
`freeze_norm=True` makes every BatchNorm use running statistics even in
train mode; parameter freezing (`freeze_at`) is an optimizer concern — see
train/optim.py `lr_wd_trees` (frozen paths get lr 0 via the PResNet rule).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

RESNET_CFG = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


class ConvNorm(nn.Module):
    features: int
    kernel: int
    stride: int
    act: Optional[str] = None
    freeze_norm: bool = False
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        use_running = (not train) or self.freeze_norm
        x = nn.BatchNorm(use_running_average=use_running, momentum=0.9,
                         epsilon=1e-5,
                         axis_name=self.bn_axis_name if not use_running else None,
                         dtype=self.dtype, name="norm")(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "silu":
            x = nn.silu(x)
        return x


def _avg_pool_2x_ceil(x):
    """AvgPool2d(2, 2, ceil_mode=True) on NHWC."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        # ceil_mode counts only valid elements; replicate-pad + mean matches
        # only when the padded cell duplicates the edge — for even inputs
        # (the only case reachable at stride-16 grids) no padding occurs.
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _max_pool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class BasicBlock(nn.Module):
    ch_out: int
    stride: int
    shortcut: bool
    variant: str = "d"
    act: str = "relu"
    freeze_norm: bool = False
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(freeze_norm=self.freeze_norm, bn_axis_name=self.bn_axis_name,
                  dtype=self.dtype)
        out = ConvNorm(self.ch_out, 3, self.stride, act=self.act,
                       name="branch2a", **kw)(x, train)
        out = ConvNorm(self.ch_out, 3, 1, act=None, name="branch2b", **kw)(out, train)
        if self.shortcut:
            short = x
        elif self.variant == "d" and self.stride == 2:
            short = _avg_pool_2x_ceil(x)
            short = ConvNorm(self.ch_out, 1, 1, name="short_conv", **kw)(short, train)
        else:
            short = ConvNorm(self.ch_out, 1, self.stride, name="short", **kw)(x, train)
        return nn.relu(out + short)


class BottleNeck(nn.Module):
    ch_out: int
    stride: int
    shortcut: bool
    variant: str = "d"
    act: str = "relu"
    freeze_norm: bool = False
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(freeze_norm=self.freeze_norm, bn_axis_name=self.bn_axis_name,
                  dtype=self.dtype)
        s1, s2 = (self.stride, 1) if self.variant == "a" else (1, self.stride)
        out = ConvNorm(self.ch_out, 1, s1, act=self.act, name="branch2a", **kw)(x, train)
        out = ConvNorm(self.ch_out, 3, s2, act=self.act, name="branch2b", **kw)(out, train)
        out = ConvNorm(self.ch_out * 4, 1, 1, act=None, name="branch2c", **kw)(out, train)
        if self.shortcut:
            short = x
        elif self.variant == "d" and self.stride == 2:
            short = _avg_pool_2x_ceil(x)
            short = ConvNorm(self.ch_out * 4, 1, 1, name="short_conv", **kw)(short, train)
        else:
            short = ConvNorm(self.ch_out * 4, 1, self.stride, name="short", **kw)(x, train)
        return nn.relu(out + short)


class PResNet(nn.Module):
    depth: int = 50
    variant: str = "d"
    return_idx: Tuple[int, ...] = (1, 2, 3)
    act: str = "relu"
    freeze_norm: bool = True
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self):
        block_exp = 4 if self.depth >= 50 else 1
        total = sum(block_exp * (64, 128, 256, 512)[i] for i in self.return_idx)
        return [total]

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_nums = RESNET_CFG[self.depth]
        block_cls = BottleNeck if self.depth >= 50 else BasicBlock
        kw = dict(freeze_norm=self.freeze_norm, bn_axis_name=self.bn_axis_name,
                  dtype=self.dtype)

        # deep stem (variant c/d): three 3x3 convs
        x = ConvNorm(32, 3, 2, act=self.act, name="conv1_1", **kw)(x, train)
        x = ConvNorm(32, 3, 1, act=self.act, name="conv1_2", **kw)(x, train)
        x = ConvNorm(64, 3, 1, act=self.act, name="conv1_3", **kw)(x, train)
        x = _max_pool_3x3_s2(x)

        ch_out_list = (64, 128, 256, 512)
        outs = []
        for i in range(4):
            stage_num = i + 2
            for b in range(block_nums[i]):
                x = block_cls(
                    ch_out=ch_out_list[i],
                    stride=2 if (b == 0 and stage_num != 2) else 1,
                    shortcut=b != 0,
                    variant=self.variant,
                    act=self.act,
                    name=f"res{i}_{b}",
                    **kw,
                )(x, train)
            if i in self.return_idx:
                assert i > 0
                if i == 1:
                    outs.append(_max_pool_3x3_s2(x))
                elif i == 3:
                    # nearest 2x upsample (reference presnet.py:345-347)
                    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                    outs.append(up)
                else:
                    outs.append(x)
        return [jnp.concatenate(outs, axis=-1)]
