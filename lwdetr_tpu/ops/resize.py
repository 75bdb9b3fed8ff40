"""Exact torch-style bicubic interpolation as static matrix products.

The reference resizes the pretrained 224-grid absolute position embedding to
the runtime token grid with ``F.interpolate(mode='bicubic',
align_corners=False)`` (/root/reference/models/backbone/vit.py:44-52).
``jax.image.resize`` uses a different cubic kernel (Catmull-Rom, a=-0.5)
than torch (Keys, a=-0.75), so instead we build the interpolation weights in
numpy at trace time (shapes are static under jit) and apply them as two small
matmuls — exact to torch and MXU-friendly.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (torch's bicubic uses a=-0.75)."""
    at = np.abs(t)
    at2 = at * at
    at3 = at2 * at
    w = np.where(
        at <= 1.0,
        (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0,
        np.where(at < 2.0, a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a, 0.0),
    )
    return w


def bicubic_resize_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) matrix M with out = M @ in along one axis,
    matching torch F.interpolate(mode='bicubic', align_corners=False)."""
    M = np.zeros((dst, src), dtype=np.float64)
    if src == dst:
        np.fill_diagonal(M, 1.0)
        return M.astype(np.float32)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        t = x - x0
        idx = np.array([x0 - 1, x0, x0 + 1, x0 + 2])
        w = _cubic_kernel(np.array([t + 1.0, t, t - 1.0, t - 2.0]))
        # torch clamps source indices to the border (replicate)
        idx = np.clip(idx, 0, src - 1)
        for j, wj in zip(idx, w):
            M[i, j] += wj
    return M.astype(np.float32)


def bicubic_resize_2d(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bicubic-resize (..., H, W, C) -> (..., H', W', C), torch semantics."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    Mh = jnp.asarray(bicubic_resize_matrix(h, oh))
    Mw = jnp.asarray(bicubic_resize_matrix(w, ow))
    x = jnp.einsum("Hh,...hwc->...Hwc", Mh, x)
    x = jnp.einsum("Ww,...hwc->...hWc", Mw, x)
    return x


def nearest_resize_index(src: int, dst: int) -> np.ndarray:
    """Index vector matching torch F.interpolate(mode='nearest')."""
    return np.minimum((np.arange(dst) * src // dst), src - 1).astype(np.int32)
