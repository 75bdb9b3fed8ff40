"""Shared small utilities."""
from __future__ import annotations

import jax


def is_static_zero(rate) -> bool:
    """True when `rate` is a compile-time-known 0.0.

    Dropout/drop-path rates arrive either as Python/numpy scalars (static:
    all release configs set them to 0) or as traced scalars fed by the
    per-iteration drop scheduler.  A concrete zero lets the caller skip mask
    generation entirely — a traced zero would still emit threefry+bernoulli
    over the full activation (~25 ms/step at small@640 batch 8).  The float()
    cast also catches np.float32/np.float64 scalars, which may or may not
    pass isinstance(., float).
    """
    return not isinstance(rate, jax.core.Tracer) and float(rate) == 0.0
