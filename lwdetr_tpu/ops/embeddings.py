"""Sinusoidal positional embeddings.

Two variants, matching the reference numerics exactly:

* `sine_position_embedding` — image-grid embedding computed from the padding
  mask by cumulative sums, normalized to [0, 2pi]
  (reference /root/reference/models/position_encoding.py:45-70).
* `query_sine_embed` — per-query embedding of (cx, cy[, w, h]) reference
  points (reference /root/reference/models/transformer.py:42-68).

Both interleave (sin, cos) pairs over a temperature-10000 frequency ladder.
Implemented channel-last for TPU-friendly layouts.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def _interleave_sin_cos(pos: jnp.ndarray) -> jnp.ndarray:
    """pos (..., D) with D even and pos[..., 2i] == pos[..., 2i+1] up to
    frequency; returns (..., D) where out[2i]=sin(pos[2i]), out[2i+1]=cos(pos[2i+1])."""
    s = jnp.sin(pos[..., 0::2])
    c = jnp.cos(pos[..., 1::2])
    return jnp.stack([s, c], axis=-1).reshape(*pos.shape[:-1], -1)


def _dim_t(num_pos_feats: int, temperature: float, dtype=jnp.float32) -> jnp.ndarray:
    i = jnp.arange(num_pos_feats, dtype=dtype)
    return temperature ** (2.0 * jnp.floor(i / 2.0) / num_pos_feats)


def sine_position_embedding(
    mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """Image-grid sine embedding.

    Args:
      mask: (B, H, W) bool, True on PADDED pixels (reference NestedTensor.mask).
      num_pos_feats: channels per axis; output has 2*num_pos_feats channels.

    Returns:
      (B, H, W, 2*num_pos_feats) float32, channels ordered [y-emb, x-emb]
      (channel-last analogue of the reference's (bs, C, H, W)).
    """
    if scale is None:
        scale = 2.0 * math.pi
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = _dim_t(num_pos_feats, temperature)
    pos_x = x_embed[..., None] / dim_t  # (B, H, W, D)
    pos_y = y_embed[..., None] / dim_t
    return jnp.concatenate(
        [_interleave_sin_cos(pos_y), _interleave_sin_cos(pos_x)], axis=-1
    )


def query_sine_embed(pos: jnp.ndarray, dim: int = 128) -> jnp.ndarray:
    """Sine embedding of reference points.

    Args:
      pos: (..., 2) or (..., 4) normalized (cx, cy[, w, h]).
      dim: channels per coordinate.

    Returns:
      (..., 2*dim) for 2-coord input ordered [y, x];
      (..., 4*dim) for 4-coord input ordered [y, x, w, h].
    """
    scale = 2.0 * math.pi
    dim_t = _dim_t(dim, 10000.0)

    def emb(coord):  # (...,) -> (..., dim)
        return _interleave_sin_cos(coord[..., None] * scale / dim_t)

    pos_x = emb(pos[..., 0])
    pos_y = emb(pos[..., 1])
    if pos.shape[-1] == 2:
        return jnp.concatenate([pos_y, pos_x], axis=-1)
    if pos.shape[-1] == 4:
        pos_w = emb(pos[..., 2])
        pos_h = emb(pos[..., 3])
        return jnp.concatenate([pos_y, pos_x, pos_w, pos_h], axis=-1)
    raise ValueError(f"pos last dim must be 2 or 4, got {pos.shape[-1]}")


class PositionEmbeddingLearned:
    """Learned 50x50 row/col embedding (reference position_encoding.py:98-128).

    Provided for API parity with `--position_embedding learned`; note the
    decoder never consumes image position embeddings (see models/lwdetr.py
    docstring), so this only matters for architecture variants that do.
    """

    def __init__(self, num_pos_feats: int = 256):
        self.num_pos_feats = num_pos_feats

    def init_params(self, rng):
        import jax

        r1, r2 = jax.random.split(rng)
        return {
            "row_embed": jax.random.uniform(r1, (50, self.num_pos_feats)),
            "col_embed": jax.random.uniform(r2, (50, self.num_pos_feats)),
        }

    def __call__(self, params, h: int, w: int):
        """-> (h, w, 2*num_pos_feats): concat(col_embed[x], row_embed[y])."""
        x_emb = params["col_embed"][:w]  # (w, C)
        y_emb = params["row_embed"][:h]  # (h, C)
        grid_x = jnp.broadcast_to(x_emb[None, :, :], (h, w, self.num_pos_feats))
        grid_y = jnp.broadcast_to(y_emb[:, None, :], (h, w, self.num_pos_feats))
        return jnp.concatenate([grid_x, grid_y], axis=-1)
