"""Affine transforms over flat coord buffers (affine_ops.rs:36,138-480).

An affine transform is the 2x3 matrix [[a, b, xoff], [d, e, yoff]]
applied as x' = a*x + b*y + xoff, y' = d*x + e*y + yoff — the same
parameterization (and composition order) as the reference's
AffineTransform.  Compositions chain on the DRIVER (compose_many,
affine_ops.rs:196) so the kernel applies ONE matrix multiply over the
whole coord buffer per batch — never a chain of passes.

Rotate/Scale/Skew/Translate are sugar constructors around it
(rotate.rs, scale.rs, skew.rs, translate.rs), anchored at a point.
MapCoords (map_coords.rs:31) is the generic per-coord UDF hook: in Ray
terms, any user fn over the (x, y) arrays inside map_batches.
"""

from __future__ import annotations

import math

import numpy as np

IDENTITY = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)  # a, b, xoff, d, e, yoff


def compose(m1, m2):
    """m1 ∘ m2 (apply m2 first) — affine_ops.rs compose semantics."""
    a1, b1, x1, d1, e1, y1 = m1
    a2, b2, x2, d2, e2, y2 = m2
    return (
        a1 * a2 + b1 * d2,
        a1 * b2 + b1 * e2,
        a1 * x2 + b1 * y2 + x1,
        d1 * a2 + e1 * d2,
        d1 * b2 + e1 * e2,
        d1 * x2 + e1 * y2 + y1,
    )


def compose_many(*ms):
    out = IDENTITY
    for m in ms:
        out = compose(out, m)
    return out


def translate(xoff: float, yoff: float):
    return (1.0, 0.0, xoff, 0.0, 1.0, yoff)


def scale(sx: float, sy: float, origin=(0.0, 0.0)):
    ox, oy = origin
    return (sx, 0.0, ox - sx * ox, 0.0, sy, oy - sy * oy)


def rotate(degrees: float, origin=(0.0, 0.0)):
    ox, oy = origin
    c, s = math.cos(math.radians(degrees)), math.sin(math.radians(degrees))
    return (c, -s, ox - c * ox + s * oy, s, c, oy - s * ox - c * oy)


def skew(xs_deg: float, ys_deg: float, origin=(0.0, 0.0)):
    ox, oy = origin
    tx, ty = math.tan(math.radians(xs_deg)), math.tan(math.radians(ys_deg))
    return (1.0, tx, -tx * oy, ty, 1.0, -ty * ox)


def inverse(m):
    a, b, x, d, e, y = m
    det = a * e - b * d
    if det == 0.0:
        raise ValueError("affine transform is not invertible")
    return (
        e / det,
        -b / det,
        (b * y - e * x) / det,
        -d / det,
        a / det,
        (d * x - a * y) / det,
    )


def apply(m, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One fused pass over the flat coord buffers."""
    a, b, xoff, d, e, yoff = m
    return a * x + b * y + xoff, d * x + e * y + yoff
