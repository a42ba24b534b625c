"""Vector2DOps — named surface (geo/src/algorithm/vector_ops.rs).

Vectorized over ``(N, 2)`` float arrays (or broadcastable pairs of
x/y arrays) so a ``map_batches`` stage can apply them to whole coord
columns.  Semantics follow the reference trait exactly:

* ``wedge_product`` — the 2D exterior product ``a.x*b.y - a.y*b.x``
  (vector_ops.rs:99,126): positive when b is left of a.
* ``left`` / ``right`` — 90-degree rotations (y-axis-up convention).
* ``try_normalize`` — returns NaN rows (the Option::None analogue)
  when the result would not be finite: zero-magnitude or non-finite
  input (vector_ops.rs:158-171).
"""

from __future__ import annotations

import numpy as np


def _xy(v) -> np.ndarray:
    a = np.asarray(v, dtype=np.float64)
    if a.ndim == 1:
        a = a.reshape(1, 2)
    return a


def dot_product(a, b) -> np.ndarray:
    a, b = _xy(a), _xy(b)
    return a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1]


def wedge_product(a, b) -> np.ndarray:
    a, b = _xy(a), _xy(b)
    return a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]


def magnitude_squared(a) -> np.ndarray:
    a = _xy(a)
    return a[:, 0] ** 2 + a[:, 1] ** 2


def magnitude(a) -> np.ndarray:
    a = _xy(a)
    return np.hypot(a[:, 0], a[:, 1])


def left(a) -> np.ndarray:
    """Rotate 90 deg counter-clockwise: (x, y) -> (-y, x)."""
    a = _xy(a)
    return np.column_stack([-a[:, 1], a[:, 0]])


def right(a) -> np.ndarray:
    """Rotate 90 deg clockwise: (x, y) -> (y, -x)."""
    a = _xy(a)
    return np.column_stack([a[:, 1], -a[:, 0]])


def try_normalize(a) -> np.ndarray:
    """Unit vectors; rows where normalization is impossible (zero or
    non-finite magnitude, or a non-finite result) become NaN — the
    vectorized Option::None."""
    a = _xy(a)
    m = magnitude(a)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = a / m[:, None]
    bad = ~np.isfinite(out).all(axis=1)
    out[bad] = np.nan
    return out


def is_finite(a) -> np.ndarray:
    a = _xy(a)
    return np.isfinite(a).all(axis=1)
