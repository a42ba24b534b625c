"""Line-layer dataset joins + line clipping (georay.linejoin).

Reference semantics: intersects/ per-type impls, contains/mod.rs:63-80
(Relate delegation for non-point Contains), bool_ops/mod.rs:44-110
(ClipRule).  Golden cases are hand-derived; corpus invariants run on
the deterministic synthetic line layer.
"""

import numpy as np
import pyarrow as pa
import pytest

from georay import datagen, geom, linejoin


def _line_table(lines: dict[str, list[tuple[float, float]]]) -> pa.Table:
    ids, offs, fx, fy, bbox = [], [0], [], [], []
    for lid, pts in lines.items():
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        ids.append(lid)
        fx.extend(xs)
        fy.extend(ys)
        offs.append(offs[-1] + len(pts))
        bbox.append((min(xs), min(ys), max(xs), max(ys)))
    coords = pa.StructArray.from_arrays(
        [pa.array(fx, pa.float64()), pa.array(fy, pa.float64())], names=["x", "y"]
    )
    path = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), coords)
    b = np.asarray(bbox)
    return pa.table(
        {
            "line_id": pa.array(ids, pa.string()),
            "path": path,
            "minx": pa.array(b[:, 0]),
            "miny": pa.array(b[:, 1]),
            "maxx": pa.array(b[:, 2]),
            "maxy": pa.array(b[:, 3]),
        }
    )


def _poly_table(polys: dict[str, list[list[tuple[float, float]]]]) -> pa.Table:
    ids, ringsets, bbox = [], [], []
    for pid, rings in polys.items():
        closed = []
        for r in rings:
            arr = np.asarray(r, dtype=np.float64)
            if not np.array_equal(arr[0], arr[-1]):
                arr = np.vstack([arr, arr[:1]])
            closed.append(arr)
        ids.append(pid)
        ringsets.append(closed)
        allc = np.vstack(closed)
        bbox.append((allc[:, 0].min(), allc[:, 1].min(), allc[:, 0].max(), allc[:, 1].max()))
    b = np.asarray(bbox)
    return pa.table(
        {
            "polygon_id": pa.array(ids, pa.string()),
            "rings": geom.rings_to_arrow(ringsets),
            "minx": pa.array(b[:, 0]),
            "miny": pa.array(b[:, 1]),
            "maxx": pa.array(b[:, 2]),
            "maxy": pa.array(b[:, 3]),
        }
    )


SQUARE = {"sq": [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]]}
HOLED = {
    "holed": [
        [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)],
        [(4.0, 4.0), (4.0, 6.0), (6.0, 6.0), (6.0, 4.0)],
    ]
}
LINES = {
    "through": [(-5.0, 5.0), (15.0, 5.0)],  # crosses the square twice
    "inside": [(2.0, 2.0), (8.0, 8.0)],  # fully within
    "far": [(20.0, 20.0), (30.0, 25.0)],  # disjoint
    "poke": [(5.0, 5.0), (5.0, 15.0)],  # one vertex in, exits north
}


def _pairs(ds):
    df = ds.to_pandas()
    if len(df) == 0:
        return set()
    return set(zip(df["line_id"], df["polygon_id"]))


def test_line_poly_predicates_golden(ray_session):
    import ray.data as rd

    lines = rd.from_arrow(_line_table(LINES))
    polys = _poly_table(SQUARE)
    assert _pairs(linejoin.line_poly_join(lines, polys, "intersects")) == {
        ("through", "sq"),
        ("inside", "sq"),
        ("poke", "sq"),
    }
    assert _pairs(linejoin.line_poly_join(lines, polys, "crosses")) == {
        ("through", "sq"),
        ("poke", "sq"),
    }
    assert _pairs(linejoin.line_poly_join(lines, polys, "within")) == {("inside", "sq")}


def test_line_poly_hole_semantics(ray_session):
    """Entering a hole counts as leaving the polygon: a line through
    the hole crosses, and is not within."""
    import ray.data as rd

    lines = rd.from_arrow(_line_table({"mid": [(1.0, 5.0), (9.0, 5.0)]}))
    polys = _poly_table(HOLED)
    assert _pairs(linejoin.line_poly_join(lines, polys, "intersects")) == {("mid", "holed")}
    assert _pairs(linejoin.line_poly_join(lines, polys, "crosses")) == {("mid", "holed")}
    assert _pairs(linejoin.line_poly_join(lines, polys, "within")) == set()


def test_clip_pieces_golden(ray_session):
    import ray.data as rd

    lines = rd.from_arrow(_line_table(LINES))
    got = linejoin.clip_lines_to_polygons(lines, _poly_table(SQUARE)).to_pandas()
    by = {r.line_id: r for r in got.itertuples()}
    assert set(by) == {"through", "inside", "poke"}  # disjoint pair dropped
    assert by["through"].n_pieces_in == 1 and by["through"].n_pieces_out == 2
    assert by["through"].len_in == pytest.approx(10.0)
    assert by["through"].len_out == pytest.approx(10.0)
    assert by["inside"].n_pieces_in == 1 and by["inside"].n_pieces_out == 0
    assert by["inside"].len_in == pytest.approx(np.hypot(6.0, 6.0), abs=1e-6)
    assert by["poke"].len_in == pytest.approx(5.0)
    assert by["poke"].len_out == pytest.approx(5.0)


def test_clip_pieces_hole(ray_session):
    import ray.data as rd

    lines = rd.from_arrow(_line_table({"mid": [(1.0, 5.0), (9.0, 5.0)]}))
    got = linejoin.clip_lines_to_polygons(lines, _poly_table(HOLED)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["n_pieces_in"] == 2 and r["n_pieces_out"] == 1
    assert r["len_in"] == pytest.approx(6.0)  # 1->4 and 6->9
    assert r["len_out"] == pytest.approx(2.0)  # the hole span 4->6


def _corpus_lines(sf_dir):
    import pyarrow.parquet as pq

    paths = datagen.ensure_tables(sf_dir)
    return pq.read_table(paths["lines"])


def _line_lengths(table: pa.Table) -> dict[str, float]:
    ll = linejoin.LineLayer.from_arrow(table)
    out = {}
    for i in range(ll.num_lines):
        c = ll.line_coords(i)
        out[ll.ids[i]] = float(np.hypot(*np.diff(c, axis=0).T).sum())
    return out


def test_tile_clip_conservation(ray_session, tiny_sf):
    """Sum of in-tile lengths over all tiles == the line's length (the
    tile grid tiles the plane)."""
    import ray.data as rd

    sf_dir, _ = tiny_sf
    table = _corpus_lines(sf_dir)
    got = linejoin.clip_lines_to_tiles(rd.from_arrow(table), tile_deg=8.0).to_pandas()
    want = _line_lengths(table)
    sums = got.groupby("line_id")["len_in"].sum()
    assert set(sums.index) == set(want)
    for lid, s in sums.items():
        assert s == pytest.approx(want[lid], abs=5e-6 * max(1, len(got)))


def test_clip_polygons_conservation(ray_session, tiny_sf):
    """len_in + len_out == line length for every clipped pair on the
    synthetic corpus."""
    import pyarrow.parquet as pq

    import ray.data as rd

    sf_dir, paths = tiny_sf
    table = _corpus_lines(sf_dir)
    polys = pq.read_table(paths["polygons"])
    got = linejoin.clip_lines_to_polygons(rd.from_arrow(table), polys).to_pandas()
    assert len(got) > 0
    want = _line_lengths(table)
    for r in got.itertuples():
        assert r.len_in + r.len_out == pytest.approx(want[r.line_id], abs=1e-5)
        assert r.n_pieces_in >= 1


def test_join_predicate_containment(ray_session, tiny_sf):
    """within and crosses are disjoint subsets of intersects on the
    corpus layers."""
    import pyarrow.parquet as pq

    import ray.data as rd

    sf_dir, paths = tiny_sf
    lines = rd.from_arrow(_corpus_lines(sf_dir))
    polys = pq.read_table(paths["polygons"])
    inter = _pairs(linejoin.line_poly_join(lines, polys, "intersects"))
    lines2 = rd.from_arrow(_corpus_lines(sf_dir))
    cross = _pairs(linejoin.line_poly_join(lines2, polys, "crosses"))
    lines3 = rd.from_arrow(_corpus_lines(sf_dir))
    within = _pairs(linejoin.line_poly_join(lines3, polys, "within"))
    assert cross <= inter
    assert within <= inter
    assert not (within & cross)


def _parcels(G, jitter, seed):
    import numpy as np
    import pyarrow as pa

    rs = np.random.RandomState(seed)
    ids, rings = [], []
    for i in range(G):
        for j in range(G):
            x0, y0 = i * 1.0, j * 1.0
            d = jitter * rs.uniform(-1, 1, 8)
            ring = [
                {"x": x0 + d[0], "y": y0 + d[1]},
                {"x": x0 + 1 + d[2], "y": y0 + d[3]},
                {"x": x0 + 1 + d[4], "y": y0 + 1 + d[5]},
                {"x": x0 + d[6], "y": y0 + 1 + d[7]},
            ]
            ring.append(ring[0])
            ids.append(f"p-{i}-{j}")
            rings.append([ring])
    coord_t = pa.struct([("x", pa.float64()), ("y", pa.float64())])
    return pa.table({
        "polygon_id": pa.array(ids),
        "rings": pa.array(rings, pa.list_(pa.list_(coord_t))),
        "minx": [min(c["x"] for c in r[0]) for r in rings],
        "miny": [min(c["y"] for c in r[0]) for r in rings],
        "maxx": [max(c["x"] for c in r[0]) for r in rings],
        "maxy": [max(c["y"] for c in r[0]) for r in rings],
    })


def test_batched_crossings_parcels_worst_case():
    """r4 (VERDICT r3 #3): a parcels-style grid — every bbox touches its
    neighbours, almost no vertex containment — must give the same pairs
    as the per-pair reference loop, through the batched product kernel."""
    import numpy as np

    from georay import polyjoin
    from georay.geom import PolygonLayer

    la = PolygonLayer.from_arrow(_parcels(10, 0.03, 1))
    lb = PolygonLayer.from_arrow(_parcels(10, 0.03, 2))
    ia, ib = polyjoin._candidate_pairs(la, lb, False)
    assert len(ia) > 500  # dense bbox overlap
    got = polyjoin.pairs_intersect(la, lb, ia, ib)
    ref = polyjoin._pairs_vertex_in(la, ia, lb, ib)
    rem = np.nonzero(~ref)[0]
    ref[rem[polyjoin._pairs_vertex_in(lb, ib[rem], la, ia[rem])]] = True
    for j in np.nonzero(~ref)[0]:
        if polyjoin._edges_cross(la, int(ia[j]), lb, int(ib[j])):
            ref[j] = True
    assert (got == ref).all()


def test_batched_crossings_chunking_invariance():
    """Tiny product-chunk sizes must not change any pair's verdict."""
    import numpy as np

    from georay import crossings, polyjoin
    from georay.geom import PolygonLayer

    la = PolygonLayer.from_arrow(_parcels(6, 0.05, 3))
    lb = PolygonLayer.from_arrow(_parcels(6, 0.05, 4))
    ia, ib = polyjoin._candidate_pairs(la, lb, False)
    sa, sb = crossings.poly_soup(la), crossings.poly_soup(lb)
    full = crossings.pairs_any_cross(sa, sb, ia, ib)
    for chunk in (1, 7, 33):
        assert (crossings.pairs_any_cross(sa, sb, ia, ib, chunk=chunk) == full).all()


def test_line_poly_crossing_batched_matches_reference(ray_session, tiny_sf):
    """line x polygon joins: batched kernel == per-pair reference on the
    same candidates."""
    import numpy as np
    import pyarrow.parquet as pq

    from georay import crossings, linejoin
    from georay.geom import PolygonLayer

    sf_dir, paths = tiny_sf
    lt = pq.read_table(paths["lines"]) if "lines" in paths else None
    if lt is None:
        import pytest

        pytest.skip("no lines table")
    pl = PolygonLayer.from_arrow(pq.read_table(paths["polygons"]))
    ll = linejoin.LineLayer.from_arrow(lt)
    il, ip = linejoin._candidates(ll, pl)
    got = crossings.pairs_any_cross(crossings.line_soup(ll), crossings.poly_soup(pl), il, ip)
    want = np.array([
        linejoin._line_poly_cross(ll, int(il[t]), pl, int(ip[t])) for t in range(len(il))
    ], dtype=bool) if len(il) else np.zeros(0, bool)
    assert (got == want).all()


def test_clip_batched_matches_per_pair_reference(ray_session, tiny_sf):
    """r4: the batched ClipOp must reproduce the per-pair reference
    (clip_line_to_polygon) exactly — piece counts and lengths."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from georay import linejoin
    from georay.geom import PolygonLayer

    sf_dir, paths = tiny_sf
    lt = pq.read_table(paths["lines"])
    polys = pq.read_table(paths["polygons"])
    got = (
        linejoin.clip_lines_to_polygons(rd.from_arrow(lt), polys)
        .to_pandas()
        .sort_values(["line_id", "polygon_id"])
        .reset_index(drop=True)
    )
    ll = linejoin.LineLayer.from_arrow(lt)
    pl = PolygonLayer.from_arrow(polys)
    il, ip = linejoin._candidates(ll, pl)
    rows = []
    for t in range(len(il)):
        line = ll.line_coords(int(il[t]))
        ins, outs = linejoin.clip_line_to_polygon(line, pl, int(ip[t]))
        if not ins:
            continue
        li = sum(float(np.hypot(*np.diff(p, axis=0).T).sum()) for p in ins)
        lo = sum(float(np.hypot(*np.diff(p, axis=0).T).sum()) for p in outs)
        rows.append((str(ll.ids[int(il[t])]), str(pl.poly_ids[int(ip[t])]),
                     len(ins), len(outs), li, lo))
    rows.sort()
    assert len(got) == len(rows)
    for r, (lid, pid, ni, no, li, lo) in zip(got.itertuples(), rows):
        assert (r.line_id, r.polygon_id, r.n_pieces_in, r.n_pieces_out) == (lid, pid, ni, no)
        assert abs(r.len_in - li) < 1e-6 and abs(r.len_out - lo) < 1e-6
