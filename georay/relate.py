"""DE-9IM relate for point-dimensional operands (the first slice of the
reference's Relate surface, geo/src/algorithm/relate/mod.rs:61-77).

Full polygon-x-polygon Relate needs the noded GeometryGraph (deferred;
COVERAGE.md) — but the point x point / point x polygon matrices are
closed-form from the exact CoordinatePosition kernel, and EVERY named
predicate (intersection_matrix.rs:436-799) is just a pattern match over
the 9 cells, so the pattern machinery built here is the reusable half.

Matrix encoding: 9-char string over {F, 0, 1, 2}, row-major
(interior, boundary, exterior) of A crossed with the same of B.
Patterns use T (any non-F), * (anything), F, 0, 1, 2 — matches(spec)
follows intersection_matrix.rs:192 semantics.
"""

from __future__ import annotations

import numpy as np

from .oracle import BOUNDARY, INSIDE, OUTSIDE, polygon_position


def transpose(matrix: str) -> str:
    """Swap the roles of A and B (matrix[i][j] -> matrix[j][i])."""
    return "".join(matrix[3 * (i % 3) + i // 3] for i in range(9))


def matches(matrix: str, spec: str) -> bool:
    """intersection_matrix.rs matches(spec): T=non-F, *=any, else exact."""
    for m, s in zip(matrix, spec):
        if s == "*":
            continue
        if s == "T":
            if m == "F":
                return False
        elif m != s:
            return False
    return True


def relate_point_point(a: tuple[float, float], b: tuple[float, float]) -> str:
    return "0FFFFFFF2" if a == b else "FF0FFF0F2"


def relate_points_polygon(points: np.ndarray, rings: list[np.ndarray]) -> str:
    """(Multi)Point A vs Polygon B.  Points have empty boundary, so the
    middle row is FFF... wait — row 2 is A's boundary (empty -> all F);
    A's exterior covers everything, so row 3 is always (2, 1, 2) for a
    non-degenerate polygon."""
    pts = np.atleast_2d(np.asarray(points, dtype=np.float64))
    pos = [polygon_position(float(x), float(y), rings) for x, y in pts]
    ii = "0" if any(p == INSIDE for p in pos) else "F"
    ib = "0" if any(p == BOUNDARY for p in pos) else "F"
    ie = "0" if any(p == OUTSIDE for p in pos) else "F"
    return f"{ii}{ib}{ie}FFF212"


def relate_polygon_points(rings: list[np.ndarray], points: np.ndarray) -> str:
    return transpose(relate_points_polygon(points, rings))


# named predicates (intersection_matrix.rs:436-799)

def is_disjoint(m: str) -> bool:
    return matches(m, "FF*FF****")


def is_intersects(m: str) -> bool:
    return not is_disjoint(m)


def is_within(m: str) -> bool:
    return matches(m, "T*F**F***")


def is_contains(m: str) -> bool:
    return is_within(transpose(m))


def is_coveredby(m: str) -> bool:
    return any(
        matches(m, p) for p in ("T*F**F***", "*TF**F***", "**FT*F***", "**F*TF***")
    )


def is_covers(m: str) -> bool:
    return is_coveredby(transpose(m))


def is_equal_topo(m: str) -> bool:
    return matches(m, "T*F**FFF*")


def is_touches(m: str) -> bool:
    return any(matches(m, p) for p in ("FT*******", "F**T*****", "F***T****"))


def is_crosses(m: str, dim_a: int, dim_b: int) -> bool:
    if dim_a < dim_b:
        return matches(m, "T*T******")
    if dim_a > dim_b:
        return matches(m, "T*****T**")
    if dim_a == 1:
        return matches(m, "0********")
    return False


def is_overlaps(m: str, dim_a: int, dim_b: int) -> bool:
    if dim_a != dim_b:
        return False
    if dim_a == 1:
        return matches(m, "1*T***T**")
    return matches(m, "T*T***T**")
