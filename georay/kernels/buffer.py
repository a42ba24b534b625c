"""Buffer: offset a geometry's boundary by a distance (ST_Buffer).

Reference: geo/src/algorithm/buffer.rs (Buffer / buffer_with_style,
BufferStyle with LineCap {Butt, Round, Square} and LineJoin {Bevel,
Miter, Round}; default join angle 0.20 rad, buffer.rs:240-247) — the
reference delegates curve assembly to i_overlay's stroke/outline; here
the buffer region is assembled EXPLICITLY as a union of convex pieces
and resolved by the overlay engine (kernels/overlay.py):

* each segment contributes its offset rectangle;
* each line end contributes its cap (round sector / square / butt);
* each convex corner contributes its join (round sector / miter quad /
  bevel triangle) fanned FROM THE EDGE NORMAL with the JTS fillet rule
  (nSegs = int(angle/quantum + 0.5), evenly spaced) so vertices land on
  the same angles JTS's OffsetSegmentGenerator emits — required to stay
  inside the xor-area conformance ratio of 0.0014
  (jts-test-runner/src/lib.rs:52-96);
* positive polygon buffers union the pieces WITH the polygon; negative
  polygon buffers subtract the boundary dilation (rects + vertex discs
  = exact Minkowski erosion structuring) FROM the polygon.

Point round buffers replicate buffer.rs:284-305 exactly: a full circle
of ceil(2*pi/angle) vertices starting at angle pi, CCW.
"""

from __future__ import annotations

import numpy as np

from . import overlay as ov

DEFAULT_JOIN_ANGLE = float(np.float32(0.20))  # buffer.rs:240-247 (f32 constant)


class BufferStyle:
    """distance + cap/join configuration (buffer.rs:123-260)."""

    def __init__(self, distance: float,
                 cap: str = "round", join: str = "round",
                 cap_angle: float = DEFAULT_JOIN_ANGLE,
                 join_angle: float = DEFAULT_JOIN_ANGLE,
                 miter_limit: float = 2.0):
        assert cap in ("round", "square", "butt")
        assert join in ("round", "miter", "bevel")
        self.distance = float(distance)
        self.cap = cap
        self.join = join
        self.cap_angle = cap_angle
        self.join_angle = join_angle
        self.miter_limit = miter_limit


def _circle_ring(cx, cy, r, angle) -> np.ndarray:
    """Full circle, ceil(2*pi/angle) verts, start angle pi, CCW
    (buffer.rs:284-305)."""
    n = int(np.ceil(2 * np.pi / angle))
    th = 2 * np.pi / n * np.arange(n) + np.pi
    pts = np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])
    return np.vstack([pts, pts[:1]])


def _sector(v, r, a_start, a_end, quantum) -> np.ndarray | None:
    """Circular-sector piece centred at v sweeping CW from a_start to
    a_end (both exact), vertices per the JTS fillet rule.  Returns a
    closed ring or None when the sweep is below one quantum (the caller
    falls back to a bevel chord, matching JTS's addDirectedFillet)."""
    total = (a_start - a_end) % (2 * np.pi)  # CW sweep magnitude
    n = int(total / quantum + 0.5)
    if n < 1:
        return None
    inc = total / n
    th = a_start - inc * np.arange(n + 1)
    pts = np.column_stack([v[0] + r * np.cos(th), v[1] + r * np.sin(th)])
    ring = np.vstack([[v], pts, [v]])
    return ring


def _tri(a, b, c) -> np.ndarray:
    return np.asarray([a, b, c, a], dtype=np.float64)


def _seg_pieces(p1, p2, d) -> list:
    """Offset rectangle of one segment (piece = [ring])."""
    dx, dy = p2[0] - p1[0], p2[1] - p1[1]
    ln = float(np.hypot(dx, dy))
    nx, ny = -dy / ln * d, dx / ln * d
    ring = np.asarray(
        [
            [p1[0] + nx, p1[1] + ny],
            [p2[0] + nx, p2[1] + ny],
            [p2[0] - nx, p2[1] - ny],
            [p1[0] - nx, p1[1] - ny],
            [p1[0] + nx, p1[1] + ny],
        ]
    )
    return [ring]


def _cap_pieces(p, dirv, d, style: BufferStyle, at_end: bool) -> list:
    """Cap at a line end.  dirv = unit direction of travel AT the end
    (pointing out of the line for at_end=True, into it for start)."""
    if style.cap == "butt":
        return []
    dx, dy = dirv
    nlx, nly = -dy, dx  # left normal
    if style.cap == "square":
        ex, ey = (dx * d, dy * d) if at_end else (-dx * d, -dy * d)
        ring = np.asarray(
            [
                [p[0] + nlx * d, p[1] + nly * d],
                [p[0] + nlx * d + ex, p[1] + nly * d + ey],
                [p[0] - nlx * d + ex, p[1] - nly * d + ey],
                [p[0] - nlx * d, p[1] - nly * d],
                [p[0] + nlx * d, p[1] + nly * d],
            ]
        )
        return [ring]
    # round: CW half-circle from the left normal through the tip
    if at_end:
        a0 = np.arctan2(nly, nlx)
    else:
        a0 = np.arctan2(-nly, -nlx)
    a1 = a0 - np.pi
    s = _sector(p, d, a0, a1, style.cap_angle)
    return [s] if s is not None else []


def _join_pieces(v, dir_in, dir_out, d, style: BufferStyle) -> list:
    """Join at a corner, on the OUTER side of the turn.  dir_in/dir_out
    are unit directions of the incoming/outgoing segments."""
    cross = dir_in[0] * dir_out[1] - dir_in[1] * dir_out[0]
    if cross == 0:
        return []
    if cross > 0:  # left turn -> outer side is the RIGHT normals
        n1 = np.asarray([dir_in[1], -dir_in[0]])
        n2 = np.asarray([dir_out[1], -dir_out[0]])
        # outer normal rotates CCW from n1 to n2; fan CW from n2 back to n1
        a_start, a_end = np.arctan2(n2[1], n2[0]), np.arctan2(n1[1], n1[0])
    else:  # right turn -> outer side is the LEFT normals
        n1 = np.asarray([-dir_in[1], dir_in[0]])
        n2 = np.asarray([-dir_out[1], dir_out[0]])
        # outer normal rotates CW from n1 to n2; fan CW from n1 to n2
        a_start, a_end = np.arctan2(n1[1], n1[0]), np.arctan2(n2[1], n2[0])
    c1 = v + d * n1
    c2 = v + d * n2
    if style.join == "bevel":
        return [_tri(v, c1, c2)]
    if style.join == "miter":
        # intersection of the two offset edge lines
        denom = dir_in[0] * dir_out[1] - dir_in[1] * dir_out[0]
        q = c2 - c1
        t = (q[0] * dir_out[1] - q[1] * dir_out[0]) / denom
        m = c1 + t * np.asarray(dir_in)
        if float(np.hypot(*(m - v))) > style.miter_limit * abs(d):
            return [_tri(v, c1, c2)]
        return [np.asarray([v, c1, m, c2, v], dtype=np.float64)]
    s = _sector(v, abs(d), a_start, a_end, style.join_angle)
    return [s] if s is not None else [_tri(v, c1, c2)]


def _polyline_pieces(coords: np.ndarray, d, style: BufferStyle, closed: bool) -> list:
    """All stroke pieces of one polyline (no union yet)."""
    pts = np.asarray(coords, dtype=np.float64)
    # drop consecutive duplicates
    keep = np.ones(len(pts), bool)
    keep[1:] = (pts[1:, 0] != pts[:-1, 0]) | (pts[1:, 1] != pts[:-1, 1])
    pts = pts[keep]
    pieces = []
    n = len(pts)
    if n < 2:
        return pieces
    dirs = pts[1:] - pts[:-1]
    lens = np.hypot(dirs[:, 0], dirs[:, 1])
    dirs = dirs / lens[:, None]
    for i in range(n - 1):
        pieces.append(_seg_pieces(pts[i], pts[i + 1], d))
    for i in range(1, n - 1):
        pieces.append(_join_pieces(pts[i], dirs[i - 1], dirs[i], d, style))
    if closed:
        pieces.append(_join_pieces(pts[0], dirs[-1], dirs[0], d, style))
    else:
        pieces.append(_cap_pieces(pts[0], dirs[0], d, style, at_end=False))
        pieces.append(_cap_pieces(pts[-1], dirs[-1], d, style, at_end=True))
    return [p for p in pieces if p]


def buffer_point(x, y, style: BufferStyle) -> list:
    """buffer.rs:270-308: butt -> empty, square -> square, round ->
    approximated circle.  Returns overlay-result polygons."""
    d = style.distance
    if d <= 0:
        return []
    if style.cap == "butt":
        return []
    if style.cap == "square":
        ring = np.asarray(
            [[x - d, y - d], [x + d, y - d], [x + d, y + d], [x - d, y + d], [x - d, y - d]]
        )
        return [(ring, [])]
    return [(_circle_ring(x, y, d, style.cap_angle), [])]


def buffer_linestring(coords, style: BufferStyle) -> list:
    """LineString / Line buffer (buffer.rs:334-355).  Degenerate
    (single-point) lines buffer like points, per the reference."""
    d = style.distance
    if d <= 0:
        return []
    pts = np.asarray(coords, dtype=np.float64)
    distinct = np.unique(pts, axis=0)
    if len(distinct) == 0:
        return []
    if len(distinct) == 1:
        return buffer_point(distinct[0, 0], distinct[0, 1], style)
    closed = bool((pts[0] == pts[-1]).all()) and len(pts) > 3
    pieces = _polyline_pieces(pts, d, style, closed)
    return ov.unary_union(pieces)


def buffer_multilinestring(lines, style: BufferStyle) -> list:
    d = style.distance
    if d <= 0:
        return []
    pieces = []
    for coords in lines:
        pts = np.asarray(coords, dtype=np.float64)
        distinct = np.unique(pts, axis=0)
        if len(distinct) == 0:
            continue
        if len(distinct) == 1:
            for shell, holes in buffer_point(distinct[0, 0], distinct[0, 1], style):
                pieces.append([shell, *holes])
            continue
        closed = bool((pts[0] == pts[-1]).all()) and len(pts) > 3
        pieces.extend(_polyline_pieces(pts, d, style, closed))
    return ov.unary_union(pieces)


def buffer_multipoint(points, style: BufferStyle) -> list:
    if style.distance <= 0:
        return []
    pieces = []
    for x, y in np.asarray(points, dtype=np.float64).reshape(-1, 2):
        for shell, holes in buffer_point(x, y, style):
            pieces.append([shell, *holes])
    return ov.unary_union(pieces)


def _oriented(rings) -> list[np.ndarray]:
    """Shell CCW, holes CW (interior on the left along each ring)."""
    out = []
    for i, r in enumerate(rings):
        r = np.asarray(r, dtype=np.float64)
        a = ov._signed_area(r)
        want_ccw = i == 0
        if (a > 0) != want_ccw and a != 0:
            r = r[::-1].copy()
        out.append(r)
    return out


def buffer_polygon(rings, style: BufferStyle) -> list:
    """Polygon buffer (buffer.rs:391-401 outline semantics): rings[0] =
    shell, rest holes.  d > 0 dilates, d < 0 erodes, d == 0 returns the
    polygon unchanged (normalized orientation)."""
    d = style.distance
    rings = _oriented(rings)
    if d == 0:
        return [(rings[0], list(rings[1:]))]
    boundary_pieces = []
    for r in rings:
        if d > 0:
            boundary_pieces.extend(_polyline_pieces(r, d, style, closed=True))
        else:
            # erosion structuring: rects + a full disc at every vertex
            boundary_pieces.extend(
                _seg_pieces(r[i], r[i + 1], -d)
                for i in range(len(r) - 1)
                if (r[i] != r[i + 1]).any()
            )
            boundary_pieces.extend(
                [_circle_ring(r[i, 0], r[i, 1], -d, style.join_angle)]
                for i in range(len(r) - 1)
            )
    poly_piece = [rings[0], *rings[1:]]
    if d > 0:
        return ov.overlay([poly_piece] + boundary_pieces, [], "union")
    return ov.overlay([poly_piece], boundary_pieces, "difference")


def buffer_multipolygon(polys, style: BufferStyle) -> list:
    """polys: list of ring-lists.  Buffered independently then dissolved
    (equivalent to the reference's joint outline of all rings)."""
    d = style.distance
    if d == 0:
        return [( _oriented(rings)[0], _oriented(rings)[1:]) for rings in polys]
    results = []
    for rings in polys:
        results.extend(buffer_polygon(rings, style))
    if len(results) <= 1:
        return results
    return ov.unary_union(ov.polys_to_region(results))
