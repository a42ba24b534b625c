"""Delaunay triangulation + Voronoi diagram (triangulate_delaunay.rs,
voronoi.rs roles — the reference delegates to `spade`; we carry our own
implementations).

* Delaunay: Bowyer-Watson incremental insertion with a super-triangle,
  deterministic lexicographic insertion order, float in-circle test
  with an exact rational fallback inside an error band (same adaptive
  strategy as the orient2d kernel).  O(n^2) worst case — per-partition
  scale, which is how the engine uses it (one partition's points per
  map_groups call).
* Voronoi: per-site half-plane clipping of the clip envelope
  (voronoi.rs:187-216 exposes a clip envelope the same way): cell(p) =
  envelope ∩ {x : |x - p| <= |x - q|} over all other sites q.  O(n) per
  site; exact tiling of the envelope is the property test.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

_INCIRCLE_ERRBOUND = (10.0 + 96.0 * 2.0**-53) * 2.0**-53


def _incircle(ax, ay, bx, by, cx, cy, dx, dy) -> float:
    """> 0 iff d lies inside the circumcircle of CCW triangle (a, b, c)."""
    adx, ady = ax - dx, ay - dy
    bdx, bdy = bx - dx, by - dy
    cdx, cdy = cx - dx, cy - dy
    ad = adx * adx + ady * ady
    bd = bdx * bdx + bdy * bdy
    cd = cdx * cdx + cdy * cdy
    det = (
        ad * (bdx * cdy - bdy * cdx)
        - bd * (adx * cdy - ady * cdx)
        + cd * (adx * bdy - ady * bdx)
    )
    permanent = (
        abs(ad) * (abs(bdx * cdy) + abs(bdy * cdx))
        + abs(bd) * (abs(adx * cdy) + abs(ady * cdx))
        + abs(cd) * (abs(adx * bdy) + abs(ady * bdx))
    )
    if abs(det) > _INCIRCLE_ERRBOUND * permanent:
        return det
    # exact rational fallback
    fa = [Fraction(v) for v in (ax, ay, bx, by, cx, cy, dx, dy)]
    adx, ady = fa[0] - fa[6], fa[1] - fa[7]
    bdx, bdy = fa[2] - fa[6], fa[3] - fa[7]
    cdx, cdy = fa[4] - fa[6], fa[5] - fa[7]
    ad = adx * adx + ady * ady
    bd = bdx * bdx + bdy * bdy
    cd = cdx * cdx + cdy * cdy
    d = (
        ad * (bdx * cdy - bdy * cdx)
        - bd * (adx * cdy - ady * cdx)
        + cd * (adx * bdy - ady * bdx)
    )
    return 0.0 if d == 0 else (1.0 if d > 0 else -1.0)


def _ccw(ax, ay, bx, by, cx, cy) -> float:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


# symbolic super-vertex directions (points at infinity; any three
# pairwise-independent directions in CCW order work)
_SUPD = ((-20.0, -1.0), (20.0, -1.0), (0.0, 20.0))


def _orient_exact(ax, ay, bx, by, cx, cy) -> float:
    """Robust scalar orient2d: float filter + rational fallback."""
    l = (bx - ax) * (cy - ay)
    r = (by - ay) * (cx - ax)
    det = l - r
    if abs(det) > 3.331e-16 * (abs(l) + abs(r)):
        return det
    fa = [Fraction(v) for v in (ax, ay, bx, by, cx, cy)]
    d = (fa[2] - fa[0]) * (fa[5] - fa[1]) - (fa[3] - fa[1]) * (fa[4] - fa[0])
    return 0.0 if d == 0 else (1.0 if d > 0 else -1.0)


def _rot_sup_last(t: tuple, n: int) -> tuple:
    """Cyclically rotate a triangle so super vertices sit at the end
    (cyclic rotation preserves orientation and in-circle signs)."""
    for _ in range(3):
        sup0 = t[0] >= n
        sup2 = t[2] >= n
        ns = sum(x >= n for x in t)
        if (ns == 1 and sup2) or (ns == 2 and not sup0) or ns in (0, 3):
            return t
        t = (t[1], t[2], t[0])
    return t


def _sym_ccw(t: tuple, allp: np.ndarray, n: int) -> float:
    """Orientation of a triangle whose super vertices are AT INFINITY
    in the _SUPD directions (limit of the finite test as R -> inf)."""
    t = _rot_sup_last(t, n)
    ns = sum(x >= n for x in t)
    if ns == 0:
        a, b, c = t
        return _orient_exact(*allp[a], *allp[b], *allp[c])
    if ns == 1:
        a, b, s = t
        dsx, dsy = _SUPD[s - n]
        return (allp[b, 0] - allp[a, 0]) * dsy - (allp[b, 1] - allp[a, 1]) * dsx
    if ns == 2:
        _, si, sj = t
        dix, diy = _SUPD[si - n]
        djx, djy = _SUPD[sj - n]
        return dix * djy - diy * djx
    d0, d1, d2 = _SUPD
    return (d1[0] - d0[0]) * (d2[1] - d0[1]) - (d1[1] - d0[1]) * (d2[0] - d0[0])


def _sym_incircle(t: tuple, px: float, py: float, allp: np.ndarray, n: int) -> float:
    """In-circumcircle test of finite point p against a CCW triangle
    with 0-3 super vertices at infinity.  Limits of the incircle
    determinant as the super radius R -> inf:

    * one super (a, b, s): the circle degenerates to the half-plane
      left of a->b  ->  orient(a, b, p) > 0.
    * two supers (a, s_i, s_j): leading R^3 term of the determinant ->
      (ax-px)(d_iy L_j - d_jy L_i) - (ay-py)(d_ix L_j - d_jx L_i)
      with L = |d|^2.
    * three supers: every finite point is inside.
    """
    t = _rot_sup_last(t, n)
    ns = sum(x >= n for x in t)
    if ns == 0:
        a, b, c = t
        return _incircle(*allp[a], *allp[b], *allp[c], px, py)
    if ns == 1:
        a, b, _ = t
        return _orient_exact(*allp[a], *allp[b], px, py)
    if ns == 2:
        a, si, sj = t
        dix, diy = _SUPD[si - n]
        djx, djy = _SUPD[sj - n]
        li = dix * dix + diy * diy
        lj = djx * djx + djy * djy
        ax, ay = allp[a]
        return (ax - px) * (diy * lj - djy * li) - (ay - py) * (dix * lj - djx * li)
    return 1.0


def delaunay(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer-Watson Delaunay triangulation; returns index triples into
    `points`.

    Super-triangle vertices are SYMBOLIC points at infinity (r3): the
    orientation / in-circle predicates use the exact R -> inf limit
    forms instead of far-but-finite coordinates, so no finite
    circumcircle can ever "contain" a super vertex — the construction
    that previously dropped sliver hull triangles (near-collinear hull
    chains have circumradii larger than any finite super triangle,
    which poisoned them into the discarded super-adjacent set and
    violated hull coverage)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return []
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    allp = pts
    S0, S1, S2 = n, n + 1, n + 2
    tris: list[tuple[int, int, int]] = [(S0, S1, S2)]
    for pi in order:
        px, py = allp[pi]
        bad, good = [], []
        for t in tris:
            a, b, c = t
            # ensure CCW for the in-circle orientation convention
            if _sym_ccw((a, b, c), allp, n) < 0:
                a, b = b, a
            if _sym_incircle((a, b, c), px, py, allp, n) > 0:
                bad.append(t)
            else:
                good.append(t)
        # cavity boundary = edges appearing exactly once among bad tris
        edge_count: dict[tuple[int, int], int] = {}
        for a, b, c in bad:
            for e in ((a, b), (b, c), (c, a)):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        boundary = [e for e, cnt in edge_count.items() if cnt == 1]
        tris = good
        for a, b in boundary:
            # orient new triangle CCW (p is finite; a/b may be super)
            if _sym_ccw((a, b, int(pi)), allp, n) < 0:
                a, b = b, a
            tris.append((a, b, int(pi)))
    return [t for t in tris if max(t) < n]


def circumcenter(a, b, c) -> tuple[float, float]:
    ax, ay = a
    bx, by = b
    cx, cy = c
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return (ax + bx + cx) / 3.0, (ay + by + cy) / 3.0
    ux = (
        (ax * ax + ay * ay) * (by - cy)
        + (bx * bx + by * by) * (cy - ay)
        + (cx * cx + cy * cy) * (ay - by)
    ) / d
    uy = (
        (ax * ax + ay * ay) * (cx - bx)
        + (bx * bx + by * by) * (ax - cx)
        + (cx * cx + cy * cy) * (bx - ax)
    ) / d
    return ux, uy


def _clip_halfplane(ring: np.ndarray, a: float, b: float, c: float) -> np.ndarray:
    """Keep the region a*x + b*y <= c of a closed ring (convex clip)."""
    pts = ring[:-1] if len(ring) and np.array_equal(ring[0], ring[-1]) else ring
    if len(pts) == 0:
        return np.empty((0, 2))
    out = []
    vals = a * pts[:, 0] + b * pts[:, 1] - c
    for i in range(len(pts)):
        cur, prv = pts[i], pts[i - 1]
        vc, vp = vals[i], vals[i - 1]
        if vc <= 0:
            if vp > 0:
                t = vp / (vp - vc)
                out.append(prv + t * (cur - prv))
            out.append(cur)
        elif vp <= 0:
            t = vp / (vp - vc)
            out.append(prv + t * (cur - prv))
    if len(out) < 3:
        return np.empty((0, 2))
    out = np.asarray(out)
    return np.vstack([out, out[:1]])


def voronoi_cells(
    points: np.ndarray, envelope: tuple[float, float, float, float]
) -> list[np.ndarray]:
    """Voronoi cell (closed ring, clipped to the envelope rect) per site.

    cell(p) = envelope ∩_q {x : 2(q-p)·x <= |q|^2 - |p|^2} — successive
    half-plane clips of the envelope ring (bisector of p, q)."""
    pts = np.asarray(points, dtype=np.float64)
    minx, miny, maxx, maxy = envelope
    env = np.asarray(
        [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)]
    )
    cells_out = []
    for i in range(len(pts)):
        ring = env
        px, py = pts[i]
        for j in range(len(pts)):
            if j == i or len(ring) == 0:
                continue
            qx, qy = pts[j]
            a, b = 2.0 * (qx - px), 2.0 * (qy - py)
            c = qx * qx + qy * qy - px * px - py * py
            ring = _clip_halfplane(ring, a, b, c)
        cells_out.append(ring)
    return cells_out


# ---------------------------------------------------------------------------
# r5: CONSTRAINED Delaunay (TriangulateSpade parity — the reference's
# triangulate_delaunay.rs:3,63-75 triangulates POLYGONS via spade's CDT;
# the unconstrained Bowyer-Watson above covers only point sets).
# Constraint-edge insertion is Anglada's algorithm (public, "An improved
# incremental algorithm for constructing restricted Delaunay
# triangulations", 1997): walk the channel of triangles crossed by the
# missing edge, remove them, re-triangulate the upper/lower
# pseudo-polygons recursively with the empty-circumcircle choice.  No
# Steiner points are added, so a polygon with V distinct ring vertices
# and H holes triangulates into exactly V + 2H - 2 triangles (Euler) —
# the cdt_stats oracle checks that count, the exact area partition, and
# that every ring edge is present in the output.
# ---------------------------------------------------------------------------


def _edge_map(tris: list[tuple[int, int, int]]) -> dict:
    em: dict[tuple[int, int], list[int]] = {}
    for ti, (a, b, c) in enumerate(tris):
        for e in ((a, b), (b, c), (c, a)):
            em.setdefault((min(e), max(e)), []).append(ti)
    return em


def _tri_pseudo(chain: list[int], a: int, b: int, pts: np.ndarray,
                out: list[tuple[int, int, int]]) -> None:
    """Triangulate the pseudo-polygon bounded by base edge (a -> b) and
    the vertex chain on its left, preserving the Delaunay criterion
    (Anglada 1997 fig. 5)."""
    if not chain:
        return
    ci = 0
    if len(chain) > 1:
        ax, ay = pts[a]
        bx, by = pts[b]
        for i in range(1, len(chain)):
            cx, cy = pts[chain[ci]]
            if _incircle(ax, ay, bx, by, cx, cy, *pts[chain[i]]) > 0:
                ci = i
    c = chain[ci]
    _tri_pseudo(chain[:ci], a, c, pts, out)
    _tri_pseudo(chain[ci + 1:], c, b, pts, out)
    out.append((a, b, c))


def _on_segment(u: int, v: int, pts: np.ndarray) -> list[int]:
    """Vertices lying exactly on the open segment (u, v), ordered along
    it.  Float-exact semantics (det == 0.0, 0 < s < |uv|^2) mirrored by
    the cdt_stats SQL oracle."""
    ux, uy = pts[u]
    vx, vy = pts[v]
    dx, dy = vx - ux, vy - uy
    out = []
    for w in range(len(pts)):
        if w in (u, v):
            continue
        px, py = pts[w]
        if dx * (py - uy) - dy * (px - ux) == 0.0:
            s = (px - ux) * dx + (py - uy) * dy
            if 0.0 < s < dx * dx + dy * dy:
                out.append((s, w))
    return [w for _, w in sorted(out)]


def _insert_constraint(tris: list[tuple[int, int, int]], u: int, v: int,
                       pts: np.ndarray) -> list[tuple[int, int, int]]:
    """Force edge (u, v) into a triangulation (vertices already
    present).  Splits the constraint at any vertex lying exactly on it."""
    key = (min(u, v), max(u, v))
    em = _edge_map(tris)
    if key in em:
        return tris
    ux, uy = pts[u]
    vx, vy = pts[v]
    # collinear-vertex split (pinch point: a ring vertex exactly ON the
    # constraint).  The predicate is the PLAIN float determinant == 0 —
    # deliberately not the exact-rational orient — so the SQL oracle's
    # identical expression makes the identical split decision.
    for w in _on_segment(u, v, pts):
        tris = _insert_constraint(tris, u, w, pts)
        return _insert_constraint(tris, w, v, pts)
    # starting triangle: incident to u, ray u->v exits its opposite edge
    start = None
    for ti, t in enumerate(tris):
        if u not in t:
            continue
        i = t.index(u)
        p, q = t[(i + 1) % 3], t[(i + 2) % 3]  # CCW opposite edge p->q
        # for a CCW triangle the interior ray u->v exiting through p->q
        # has p strictly on its RIGHT and q strictly on its LEFT
        op = _orient_exact(ux, uy, vx, vy, *pts[p])
        oq = _orient_exact(ux, uy, vx, vy, *pts[q])
        if op < 0 < oq:
            # crossing point of pq with line uv must lie in the v direction
            r = op / (op - oq)
            zx = pts[p, 0] + r * (pts[q, 0] - pts[p, 0])
            zy = pts[p, 1] + r * (pts[q, 1] - pts[p, 1])
            if (zx - ux) * (vx - ux) + (zy - uy) * (vy - uy) > 0.0:
                start = (ti, q, p)
                break
    if start is None:
        raise ValueError(f"constraint ({u},{v}) walk found no starting triangle")
    ti, up, lo = start  # up strictly left of u->v, lo strictly right
    crossed = {ti}
    upper, lower = [up], [lo]
    while True:
        e = (min(up, lo), max(up, lo))
        nxt = [t for t in em[e] if t not in crossed]
        if not nxt:
            raise ValueError(f"constraint ({u},{v}) walk left the triangulation")
        ti = nxt[0]
        crossed.add(ti)
        w = next(x for x in tris[ti] if x not in (up, lo))
        if w == v:
            break
        o = _orient_exact(ux, uy, vx, vy, *pts[w])
        if o > 0:
            upper.append(w)
            up = w
        else:
            lower.append(w)
            lo = w
    new: list[tuple[int, int, int]] = []
    _tri_pseudo(upper, u, v, pts, new)  # upper chain is left of u->v
    _tri_pseudo(list(reversed(lower)), v, u, pts, new)  # left of v->u
    return [t for ti, t in enumerate(tris) if ti not in crossed] + new


def _point_in_rings(x: float, y: float, rings: list[np.ndarray]) -> bool:
    """Even-odd raycast over all rings (holes flip parity)."""
    inside = False
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        for i in range(len(r) - 1):
            x1, y1 = r[i]
            x2, y2 = r[i + 1]
            if (y1 > y) != (y2 > y):
                xc = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
                if xc > x:
                    inside = not inside
    return inside


def constrained_delaunay(
    rings: list[np.ndarray],
) -> tuple[np.ndarray, list[tuple[int, int, int]], set[tuple[int, int]]]:
    """CDT of a polygon (rings[0] exterior, rest holes; closed or open
    rings accepted).  Returns (vertex array, interior CCW triangles,
    constraint edge set as sorted index pairs).  Triangles exactly
    partition the polygon interior."""
    pts_list: list[tuple[float, float]] = []
    index: dict[tuple[float, float], int] = {}
    ring_idxs: list[list[int]] = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) and np.array_equal(r[0], r[-1]):
            r = r[:-1]
        idxs = []
        for xy in r:
            key = (float(xy[0]), float(xy[1]))
            if key not in index:
                index[key] = len(pts_list)
                pts_list.append(key)
            idxs.append(index[key])
        ring_idxs.append(idxs)
    pts = np.asarray(pts_list, dtype=np.float64)
    if len(pts) < 3:
        return pts, [], set()
    tris = delaunay(pts)
    tris = [
        t if _orient_exact(*pts[t[0]], *pts[t[1]], *pts[t[2]]) > 0 else (t[0], t[2], t[1])
        for t in tris
    ]
    constraints: set[tuple[int, int]] = set()
    for idxs in ring_idxs:
        k = len(idxs)
        for i in range(k):
            u, v = idxs[i], idxs[(i + 1) % k]
            if u != v:
                constraints.add((min(u, v), max(u, v)))
    for u, v in sorted(constraints):
        tris = _insert_constraint(tris, u, v, pts)
    # resolved constraints: each ring edge split at any pinch vertices
    # lying exactly on it (same predicate as _insert_constraint).  Every
    # resolved edge MUST be an edge of the full CDT — internal invariant
    # checked here, before the interior filter (a zero-width overlapped
    # boundary correctly has no interior triangle on it afterwards).
    resolved: set[tuple[int, int]] = set()
    for u, v in constraints:
        chain = [u] + _on_segment(u, v, pts) + [v]
        for a, b in zip(chain, chain[1:]):
            resolved.add((min(a, b), max(a, b)))
    full_em = _edge_map(tris)
    missing = [e for e in resolved if e not in full_em]
    if missing:
        raise ValueError(f"CDT invariant violated: constraints {missing} absent")
    constraints = resolved
    keep = []
    for a, b, c in tris:
        cx = (pts[a, 0] + pts[b, 0] + pts[c, 0]) / 3.0
        cy = (pts[a, 1] + pts[b, 1] + pts[c, 1]) / 3.0
        if _point_in_rings(cx, cy, rings):
            keep.append((a, b, c))
    return pts, keep, constraints
