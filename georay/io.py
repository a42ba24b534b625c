"""Sources/sinks: WKT and GeoJSON <-> the engine's Arrow polygon layout.

The reference delegates I/O to ecosystem crates (WKT/GeoJSON/WKB via
geozero — geo/src/lib.rs:254-260); its own fixtures are WKT
(geo-test-fixtures/src/lib.rs).  This module supplies the equivalent
interop for the Ray engine with zero external deps:

* `parse_wkt` / `to_wkt` for POINT / LINESTRING / POLYGON /
  MULTIPOLYGON (the fixture subset);
* `read_wkt_polygons(path)` -> the Arrow polygon-layer table
  (POLYGON_SCHEMA) ready for `ray.data.from_arrow` / broadcast;
* `polygons_to_geojson` / `geojson_to_polygons` (RFC 7946
  FeatureCollection, rings closed).

Rings are force-closed on ingest, mirroring the ring-closing invariant
(geo-types/src/geometry/polygon.rs:123-131).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa

from . import geom

_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"


def _parse_coord_seq(body: str) -> np.ndarray:
    pairs = re.findall(rf"({_NUM})\s+({_NUM})", body)
    return np.asarray([(float(a), float(b)) for a, b in pairs])


def _split_top(body: str) -> list[str]:
    """Split 'a),(b' style ring/polygon lists at depth-0 commas."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def parse_wkt(text: str):
    """WKT -> ("point", (x, y)) | ("linestring", coords) |
    ("polygon", [rings]) | ("multipolygon", [[rings], ...])."""
    t = text.strip()
    up = t.upper()
    if up.startswith("GEOMETRYCOLLECTION"):
        if "EMPTY" in up and "(" not in t:
            return ("geometrycollection", [])
        inner = t[t.index("(") + 1 : t.rindex(")")]
        return ("geometrycollection", [parse_wkt(p) for p in _split_top(inner)])
    if up.startswith("MULTIPOINT"):
        return ("multipoint", _parse_coord_seq(t))
    if up.startswith("POINT"):
        c = _parse_coord_seq(t)
        if len(c) == 0:
            return ("point", None)  # POINT EMPTY
        return ("point", (float(c[0, 0]), float(c[0, 1])))
    if up.startswith("MULTILINESTRING"):
        inner = t[t.index("(") + 1 : t.rindex(")")]
        return ("multilinestring", [_parse_coord_seq(p) for p in _split_top(inner)])
    if up.startswith("LINESTRING"):
        return ("linestring", _parse_coord_seq(t))
    if up.startswith("POLYGON"):
        inner = t[t.index("(") + 1 : t.rindex(")")]
        rings = [geom.close_ring(_parse_coord_seq(r)) for r in _split_top(inner)]
        return ("polygon", rings)
    if up.startswith("MULTIPOLYGON"):
        inner = t[t.index("(") + 1 : t.rindex(")")]
        polys = []
        for poly_body in _split_top(inner):
            pb = poly_body.strip()
            pb = pb[pb.index("(") + 1 : pb.rindex(")")]
            polys.append([geom.close_ring(_parse_coord_seq(r)) for r in _split_top(pb)])
        return ("multipolygon", polys)
    raise ValueError(f"unsupported WKT: {t[:40]}...")


def _ring_wkt(ring: np.ndarray) -> str:
    return "(" + ", ".join(f"{x:.17g} {y:.17g}" for x, y in ring) + ")"


def to_wkt(kind: str, value) -> str:
    if kind == "geometrycollection":
        if not value:
            return "GEOMETRYCOLLECTION EMPTY"
        return (
            "GEOMETRYCOLLECTION ("
            + ", ".join(to_wkt(k, v) for k, v in value)
            + ")"
        )
    if kind == "multipoint":
        return "MULTIPOINT " + _ring_wkt(np.asarray(value))
    if kind == "multilinestring":
        return (
            "MULTILINESTRING ("
            + ", ".join(_ring_wkt(np.asarray(ls)) for ls in value)
            + ")"
        )
    if kind == "point":
        if value is None:
            return "POINT EMPTY"
        return f"POINT ({value[0]:.17g} {value[1]:.17g})"
    if kind == "linestring":
        return "LINESTRING " + _ring_wkt(np.asarray(value))
    if kind == "polygon":
        return "POLYGON (" + ", ".join(_ring_wkt(r) for r in value) + ")"
    if kind == "multipolygon":
        return (
            "MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(_ring_wkt(r) for r in rings) + ")" for rings in value)
            + ")"
        )
    raise ValueError(kind)


def polygons_to_table(polys: list[list[np.ndarray]], ids: list[str] | None = None) -> pa.Table:
    """[rings...] -> Arrow polygon-layer table (geom.POLYGON_SCHEMA)."""
    ids = ids or [f"poly-{i:06d}" for i in range(len(polys))]
    bbox = np.asarray(
        [
            (
                np.vstack(r)[:, 0].min(), np.vstack(r)[:, 1].min(),
                np.vstack(r)[:, 0].max(), np.vstack(r)[:, 1].max(),
            )
            for r in polys
        ]
    ) if polys else np.empty((0, 4))
    return pa.table(
        {
            "polygon_id": pa.array(ids, pa.string()),
            "rings": geom.rings_to_arrow(polys),
            "minx": pa.array(bbox[:, 0], pa.float64()),
            "miny": pa.array(bbox[:, 1], pa.float64()),
            "maxx": pa.array(bbox[:, 2], pa.float64()),
            "maxy": pa.array(bbox[:, 3], pa.float64()),
        }
    )


def read_wkt_polygons(path: str) -> pa.Table:
    """One WKT POLYGON/MULTIPOLYGON per line -> polygon-layer table
    (multipolygons are flattened to member polygons, ids suffixed)."""
    polys: list[list[np.ndarray]] = []
    ids: list[str] = []
    with open(path) as f:
        for lineno, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            kind, val = parse_wkt(line)
            if kind == "polygon":
                polys.append(val)
                ids.append(f"poly-{lineno:06d}")
            elif kind == "multipolygon":
                for j, rings in enumerate(val):
                    polys.append(rings)
                    ids.append(f"poly-{lineno:06d}-{j}")
            else:
                raise ValueError(f"line {lineno}: expected polygonal WKT, got {kind}")
    return polygons_to_table(polys, ids)


def polygons_to_geojson(table: pa.Table) -> str:
    """Polygon-layer table -> GeoJSON FeatureCollection string."""
    layer = geom.PolygonLayer.from_arrow(table)
    feats = []
    for p in range(layer.num_polys):
        rings = [r.tolist() for r in layer.poly_rings(p)]
        feats.append(
            {
                "type": "Feature",
                "properties": {"polygon_id": str(layer.poly_ids[p])},
                "geometry": {"type": "Polygon", "coordinates": rings},
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})


def geojson_to_polygons(text: str) -> pa.Table:
    """GeoJSON FeatureCollection (Polygon/MultiPolygon features) ->
    polygon-layer table; rings force-closed."""
    doc = json.loads(text)
    polys, ids = [], []
    for i, feat in enumerate(doc.get("features", [])):
        g = feat.get("geometry", {})
        pid = str(feat.get("properties", {}).get("polygon_id", f"poly-{i:06d}"))
        if g.get("type") == "Polygon":
            polys.append([geom.close_ring(np.asarray(r, dtype=np.float64)) for r in g["coordinates"]])
            ids.append(pid)
        elif g.get("type") == "MultiPolygon":
            for j, rings in enumerate(g["coordinates"]):
                polys.append([geom.close_ring(np.asarray(r, dtype=np.float64)) for r in rings])
                ids.append(f"{pid}-{j}")
    return polygons_to_table(polys, ids)


# ---------------------------------------------------------------------------
# OGC WKB (r4c) — ISO 19125 / OGC 06-103r4 well-known binary, 2-D
# subset, same (kind, value) model as parse_wkt/to_wkt.  Encode emits
# little-endian (byte-order flag 1); decode honors either byte order,
# per the spec.  The reference delegates this to geozero
# (geo/src/lib.rs:254-260); here it is ~90 lines of struct packing.
# ---------------------------------------------------------------------------

_WKB_TYPES = {
    "point": 1, "linestring": 2, "polygon": 3, "multipoint": 4,
    "multilinestring": 5, "multipolygon": 6, "geometrycollection": 7,
}
_WKB_KINDS = {v: k for k, v in _WKB_TYPES.items()}


def to_wkb(kind: str, value) -> bytes:
    import struct

    head = struct.pack("<BI", 1, _WKB_TYPES[kind])

    def coords(a) -> bytes:
        a = np.ascontiguousarray(np.asarray(a, dtype="<f8"))
        return struct.pack("<I", len(a)) + a.tobytes()

    if kind == "point":
        if value is None:  # POINT EMPTY: NaN coords per common practice
            return head + struct.pack("<dd", float("nan"), float("nan"))
        return head + struct.pack("<dd", float(value[0]), float(value[1]))
    if kind in ("linestring", "multipoint"):
        if kind == "multipoint":
            # spec: a sequence of nested point geometries
            pts = [to_wkb("point", (float(x), float(y))) for x, y in np.asarray(value)]
            return head + struct.pack("<I", len(pts)) + b"".join(pts)
        return head + coords(value)
    if kind == "polygon":
        return head + struct.pack("<I", len(value)) + b"".join(coords(r) for r in value)
    if kind == "multilinestring":
        parts = [to_wkb("linestring", ls) for ls in value]
        return head + struct.pack("<I", len(parts)) + b"".join(parts)
    if kind == "multipolygon":
        parts = [to_wkb("polygon", rings) for rings in value]
        return head + struct.pack("<I", len(parts)) + b"".join(parts)
    if kind == "geometrycollection":
        parts = [to_wkb(k, v) for k, v in value]
        return head + struct.pack("<I", len(parts)) + b"".join(parts)
    raise ValueError(kind)


def parse_wkb(blob: bytes):
    """WKB -> (kind, value), same shapes as parse_wkt."""
    val, pos = _parse_wkb_at(blob, 0)
    if pos != len(blob):
        raise ValueError(f"trailing bytes after WKB geometry ({len(blob) - pos})")
    return val


def _parse_wkb_at(blob: bytes, pos: int):
    import struct

    bo = blob[pos]
    if bo not in (0, 1):
        raise ValueError(f"bad WKB byte-order flag {bo}")
    e = "<" if bo == 1 else ">"
    (gtype,) = struct.unpack_from(e + "I", blob, pos + 1)
    kind = _WKB_KINDS.get(gtype & 0xFF)
    if kind is None:
        raise ValueError(f"unsupported WKB geometry type {gtype}")
    pos += 5

    def read_coords(n):
        a = np.frombuffer(blob, dtype=e + "f8", count=2 * n, offset=pos).reshape(n, 2)
        return a.astype(np.float64, copy=True)

    if kind == "point":
        xy = read_coords(1)[0]
        pos += 16
        if np.isnan(xy[0]) and np.isnan(xy[1]):
            return ("point", None), pos
        return ("point", (float(xy[0]), float(xy[1]))), pos
    (n,) = struct.unpack_from(e + "I", blob, pos)
    pos += 4
    if kind == "linestring":
        a = read_coords(n)
        return ("linestring", a), pos + 16 * n
    if kind == "polygon":
        rings = []
        import struct as _s

        for _ in range(n):
            (m,) = _s.unpack_from(e + "I", blob, pos)
            pos += 4
            rings.append(read_coords(m))
            pos += 16 * m
        return ("polygon", rings), pos
    # nested-geometry containers
    parts = []
    for _ in range(n):
        val, pos = _parse_wkb_at(blob, pos)
        parts.append(val)
    if kind == "multipoint":
        pts = np.asarray([[v[0], v[1]] for _, v in parts], dtype=np.float64)
        return ("multipoint", pts.reshape(-1, 2)), pos
    if kind == "multilinestring":
        return ("multilinestring", [v for _, v in parts]), pos
    if kind == "multipolygon":
        return ("multipolygon", [v for _, v in parts]), pos
    return ("geometrycollection", parts), pos
