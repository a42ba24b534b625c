"""HasDimensions — named surface (geo/src/algorithm/dimensions.rs).

``Dimensions`` is encoded as an int ordered exactly like the reference
enum (Empty < ZeroDimensional < OneDimensional < TwoDimensional):
EMPTY=-1, ZERO=0, ONE=1, TWO=2 — so ``max()`` composes multi-geometry
rules the same way ``Dimensions::max`` does.

Scalar functions operate on the ``(kind, value)`` representation of
:func:`georay.io.parse_wkt`; the vectorized dataset path for the
engine's native polygon/line tables lives in the oracled
``geom_dimensions`` query (same rules over count-distinct-vertices —
note the reference polygon rule counts DISTINCT coordinates, it never
checks collinearity: dimensions.rs:236-259).
"""

from __future__ import annotations

import numpy as np

EMPTY = -1
ZERO = 0
ONE = 1
TWO = 2


def _coords_empty(c) -> bool:
    return c is None or len(c) == 0


def _distinct_count(coords: np.ndarray, cap: int = 3) -> int:
    """Number of distinct coordinates, early-capped (the rules only
    ever need 'one / two / three or more')."""
    seen: list[tuple[float, float]] = []
    for x, y in np.asarray(coords).reshape(-1, 2):
        if not any(x == sx and y == sy for sx, sy in seen):
            seen.append((x, y))
            if len(seen) >= cap:
                break
    return len(seen)


def is_empty(kind: str, value) -> bool:
    if kind == "point":
        return value is None
    if kind in ("linestring", "multipoint"):
        return _coords_empty(value)
    if kind == "polygon":
        return not value or _coords_empty(value[0])
    if kind == "multilinestring":
        return all(_coords_empty(ls) for ls in value)
    if kind == "multipolygon":
        return all(not p or _coords_empty(p[0]) for p in value)
    if kind == "geometrycollection":
        return all(is_empty(k, v) for k, v in value)
    raise ValueError(kind)


def dimensions(kind: str, value) -> int:
    if kind == "point":
        return EMPTY if value is None else ZERO
    if kind == "multipoint":
        return EMPTY if _coords_empty(value) else ZERO
    if kind == "linestring":
        if _coords_empty(value):
            return EMPTY
        return ONE if _distinct_count(value, 2) > 1 else ZERO
    if kind == "multilinestring":
        dims = [dimensions("linestring", ls) for ls in value]
        return max(dims, default=EMPTY)
    if kind == "polygon":
        if not value or _coords_empty(value[0]):
            return EMPTY
        n = _distinct_count(value[0], 3)
        return {1: ZERO, 2: ONE}.get(n, TWO)
    if kind == "multipolygon":
        dims = [dimensions("polygon", p) for p in value]
        return max(dims, default=EMPTY)
    if kind == "geometrycollection":
        dims = [dimensions(k, v) for k, v in value]
        return max(dims, default=EMPTY)
    raise ValueError(kind)


def _is_closed(coords) -> bool:
    c = np.asarray(coords)
    return len(c) > 0 and bool(np.all(c[0] == c[-1]))


def boundary_dimensions(kind: str, value) -> int:
    if kind in ("point", "multipoint"):
        return EMPTY
    if kind == "linestring":
        if _is_closed(value):
            return EMPTY
        d = dimensions(kind, value)
        return ZERO if d == ONE else EMPTY
    if kind == "multilinestring":
        if all(_is_closed(ls) for ls in value if not _coords_empty(ls)):
            return EMPTY
        d = dimensions(kind, value)
        return ZERO if d == ONE else EMPTY
    if kind in ("polygon", "multipolygon"):
        d = dimensions(kind, value)
        return {TWO: ONE, ONE: ZERO}.get(d, EMPTY)
    if kind == "geometrycollection":
        out = EMPTY
        for k, v in value:
            d = boundary_dimensions(k, v)
            if d == ONE:
                return ONE
            out = max(out, d)
        return out
    raise ValueError(kind)
