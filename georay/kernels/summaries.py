"""Per-geometry summary kernels: area, centroid, bounding rect, winding.

Vectorized shoelace with the reference's first-coord shift for numerical
stability (geo/src/algorithm/area.rs:33-52: every ring is translated so
its first coordinate is the origin before the determinant sum), centroid
via the shifted ring formula (centroid.rs:604-633) with holes subtracted
(centroid.rs:684-694), bbox via grouped min/max (bounding_rect.rs:8-33).
"""

from __future__ import annotations

import numpy as np

from ..geom import PolygonLayer


def _ring_shifted_terms(layer: PolygonLayer):
    """Per-edge shifted shoelace terms + the owning ring of each edge."""
    x1, y1, x2, y2, seg_ring = layer.segments()
    sx = layer.coords[layer.ring_offsets[seg_ring], 0]
    sy = layer.coords[layer.ring_offsets[seg_ring], 1]
    ax, ay = x1 - sx, y1 - sy
    bx, by = x2 - sx, y2 - sy
    cross = ax * by - ay * bx
    return ax, ay, bx, by, cross, seg_ring


def twice_signed_ring_areas(layer: PolygonLayer) -> np.ndarray:
    """float64[num_rings] of 2*signed area per ring (area.rs:33-52)."""
    *_, cross, seg_ring = _ring_shifted_terms(layer)
    a2 = np.zeros(layer.num_rings)
    np.add.at(a2, seg_ring, cross)
    return a2


def signed_area(layer: PolygonLayer) -> np.ndarray:
    """Signed area per polygon: exterior + holes as stored (area.rs:80-88)."""
    a2 = twice_signed_ring_areas(layer)
    out = np.zeros(layer.num_polys)
    np.add.at(out, layer.ring_poly, a2)
    return out / 2.0


def unsigned_area(layer: PolygonLayer) -> np.ndarray:
    """|exterior| - sum |holes| per polygon."""
    a2 = twice_signed_ring_areas(layer)
    contrib = np.where(layer.ring_is_hole, -np.abs(a2), np.abs(a2))
    out = np.zeros(layer.num_polys)
    np.add.at(out, layer.ring_poly, contrib)
    return out / 2.0


def ring_centroids(layer: PolygonLayer) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cx, cy, 2*area) per ring via the shifted formula (centroid.rs:604-633)."""
    ax, ay, bx, by, cross, seg_ring = _ring_shifted_terms(layer)
    a2 = np.zeros(layer.num_rings)
    np.add.at(a2, seg_ring, cross)
    sumx = np.zeros(layer.num_rings)
    sumy = np.zeros(layer.num_rings)
    np.add.at(sumx, seg_ring, (ax + bx) * cross)
    np.add.at(sumy, seg_ring, (ay + by) * cross)
    sx = layer.coords[layer.ring_offsets[:-1], 0]
    sy = layer.coords[layer.ring_offsets[:-1], 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        cx = np.where(a2 != 0.0, sx + sumx / (3.0 * a2), sx)
        cy = np.where(a2 != 0.0, sy + sumy / (3.0 * a2), sy)
    return cx, cy, a2


def polygon_centroids(layer: PolygonLayer) -> tuple[np.ndarray, np.ndarray]:
    """Area-weighted polygon centroid, holes subtracted (centroid.rs:442-695).

    Degenerate (zero-area) polygons fall back to the exterior ring's
    first coordinate; the reference's full dimension-promotion ladder
    (centroid.rs:497-527) applies to lines/points we don't generate.
    """
    cx, cy, a2 = ring_centroids(layer)
    ext_sign = np.ones(layer.num_polys)
    ext_mask = ~layer.ring_is_hole
    ext_sign[layer.ring_poly[ext_mask]] = np.sign(a2[ext_mask]) + (a2[ext_mask] == 0)
    w = np.where(layer.ring_is_hole, -np.abs(a2) * ext_sign[layer.ring_poly], a2)
    num_x = np.zeros(layer.num_polys)
    num_y = np.zeros(layer.num_polys)
    den = np.zeros(layer.num_polys)
    np.add.at(num_x, layer.ring_poly, cx * w)
    np.add.at(num_y, layer.ring_poly, cy * w)
    np.add.at(den, layer.ring_poly, w)
    fallback_x = layer.coords[layer.ring_offsets[layer.poly_ring_offsets[:-1]], 0]
    fallback_y = layer.coords[layer.ring_offsets[layer.poly_ring_offsets[:-1]], 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        out_x = np.where(den != 0.0, num_x / den, fallback_x)
        out_y = np.where(den != 0.0, num_y / den, fallback_y)
    return out_x, out_y


def bounding_rects(layer: PolygonLayer) -> np.ndarray:
    """(P, 4) minx/miny/maxx/maxy recomputed from coords (bounding_rect.rs:8-33)."""
    n_coords = np.diff(layer.ring_offsets)
    coord_poly = np.repeat(layer.ring_poly, n_coords)
    out = np.empty((layer.num_polys, 4))
    out[:, 0] = np.full(layer.num_polys, np.inf)
    out[:, 1] = np.full(layer.num_polys, np.inf)
    out[:, 2] = np.full(layer.num_polys, -np.inf)
    out[:, 3] = np.full(layer.num_polys, -np.inf)
    np.minimum.at(out[:, 0], coord_poly, layer.coords[:, 0])
    np.minimum.at(out[:, 1], coord_poly, layer.coords[:, 1])
    np.maximum.at(out[:, 2], coord_poly, layer.coords[:, 0])
    np.maximum.at(out[:, 3], coord_poly, layer.coords[:, 1])
    return out


def winding_order(layer: PolygonLayer) -> np.ndarray:
    """Per-ring winding: +1 CCW, -1 CW, 0 degenerate (winding_order.rs:63-116;
    robust orientation via the signed area's sign, as geo derives it for
    closed rings)."""
    a2 = twice_signed_ring_areas(layer)
    return np.sign(a2).astype(np.int8)


def orient_polygons(layer: PolygonLayer) -> PolygonLayer:
    """Orient (geo/src/algorithm/orient.rs:5): normalize every polygon to
    the OGC convention — exterior CCW, holes CW — by reversing rings
    with the wrong winding.  Returns a new layer (coords copied)."""
    w = winding_order(layer)
    coords = layer.coords.copy()
    for r in range(layer.num_rings):
        want_ccw = not layer.ring_is_hole[r]
        if (w[r] > 0) != want_ccw and w[r] != 0:
            lo, hi = layer.ring_offsets[r], layer.ring_offsets[r + 1]
            coords[lo:hi] = coords[lo:hi][::-1]
    return PolygonLayer(
        coords=coords,
        ring_offsets=layer.ring_offsets,
        ring_poly=layer.ring_poly,
        ring_is_hole=layer.ring_is_hole,
        poly_ring_offsets=layer.poly_ring_offsets,
        poly_ids=layer.poly_ids,
        bbox=layer.bbox,
    )
