"""Hull, simplify (RDP/VW), Chaikin, densify, affine, validation kernels."""

import numpy as np
import pytest

from georay import datagen, geom, oracle
from georay.kernels import affine, hull, simplify, validation


# ---------------------------------------------------------------------------
# convex hull
# ---------------------------------------------------------------------------

def test_hull_l_shape_golden():
    """convex_hull/mod.rs:11-41: L-shaped polygon -> its bounding triangle-ish hull."""
    pts = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0), (1.0, 4.0), (0.0, 4.0)])
    h = hull.convex_hull_points(pts)
    assert np.array_equal(h[0], h[-1])  # closed
    verts = {tuple(p) for p in h[:-1]}
    assert verts == {(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 4.0), (0.0, 4.0)}
    # CCW orientation: positive signed area
    assert oracle.signed_area([h]) > 0


def test_hull_interior_point_dropped():
    pts = np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (1.0, 1.0)])
    h = hull.convex_hull_points(pts)
    assert (1.0, 1.0) not in {tuple(p) for p in h}


def test_hull_two_points_closed_ring():
    """2 distinct points -> CLOSED ring [p0, p1, p0], not [p0, p1, p1]."""
    pts = np.array([(0.0, 0.0), (3.0, 1.0)])
    h = hull.convex_hull_points(pts)
    assert len(h) == 3
    assert np.array_equal(h[0], h[-1])
    assert {tuple(p) for p in h} == {(0.0, 0.0), (3.0, 1.0)}


def test_hull_collinear_degenerate():
    pts = np.array([(0.0, 0.0), (1.0, 1.0), (2.0, 2.0)])
    h = hull.convex_hull_points(pts)
    verts = {tuple(p) for p in h}
    assert verts == {(0.0, 0.0), (2.0, 2.0)}


def test_hull_distributive_merge():
    """Dataset-level hull: split -> partial hulls -> merge == global hull."""
    rs = np.random.RandomState(11)
    pts = rs.uniform(-50, 50, (5000, 2))
    full = hull.convex_hull_points(pts)
    agg = hull.HullAggregator()
    for chunk in np.array_split(pts, 7):
        agg.update(chunk)
    merged = agg.result()
    assert np.array_equal(np.sort(full, axis=0), np.sort(merged, axis=0))


# ---------------------------------------------------------------------------
# simplification
# ---------------------------------------------------------------------------

RDP_INPUT = np.array([(0.0, 0.0), (5.0, 4.0), (11.0, 5.5), (17.3, 3.2), (27.8, 0.1)])


def test_rdp_doc_golden():
    """simplify.rs doc-test: epsilon=1.0 keeps indices [0, 1, 2, 4]."""
    mask = simplify.rdp_mask(RDP_INPUT, 1.0)
    assert list(np.nonzero(mask)[0]) == [0, 1, 2, 4]
    out = simplify.rdp(RDP_INPUT, 1.0)
    assert np.array_equal(out, RDP_INPUT[[0, 1, 2, 4]])


def test_rdp_epsilon_nonpositive_identity():
    """simplify.rs:28-31."""
    assert np.array_equal(simplify.rdp(RDP_INPUT, 0.0), RDP_INPUT)
    assert np.array_equal(simplify.rdp(RDP_INPUT, -3.0), RDP_INPUT)


def test_rdp_matches_scalar_oracle_random():
    rs = np.random.RandomState(5)
    for _ in range(20):
        n = rs.randint(3, 40)
        coords = rs.uniform(-10, 10, (n, 2))
        eps = rs.uniform(0.01, 3.0)
        assert np.array_equal(simplify.rdp(coords, eps), oracle.rdp(coords, eps))


def test_vw_doc_golden():
    """simplify_vw.rs doc-test: epsilon=30 keeps indices [0, 3, 4]."""
    coords = np.array([(5.0, 2.0), (3.0, 8.0), (6.0, 20.0), (7.0, 25.0), (10.0, 10.0)])
    mask = simplify.vw_mask(coords, 30.0)
    assert list(np.nonzero(mask)[0]) == [0, 3, 4]


def test_chaikin_preserves_endpoints_open():
    coords = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)])
    out = simplify.chaikin(coords, 1)
    assert np.array_equal(out[0], coords[0])
    assert np.array_equal(out[-1], coords[-1])
    assert len(out) > len(coords)


def test_remove_repeated_points():
    coords = np.array([(0.0, 0.0), (0.0, 0.0), (1.0, 1.0), (1.0, 1.0), (2.0, 2.0)])
    out = simplify.remove_repeated_points(coords)
    assert np.array_equal(out, np.array([(0.0, 0.0), (1.0, 1.0), (2.0, 2.0)]))


def test_densify():
    coords = np.array([(0.0, 0.0), (10.0, 0.0)])
    out = simplify.densify(coords, 3.0)
    # 10/3 -> 4 pieces -> 3 inserted points
    assert len(out) == 5
    seg = np.hypot(np.diff(out[:, 0]), np.diff(out[:, 1]))
    assert (seg <= 3.0 + 1e-12).all()
    # identity when nothing exceeds max_len
    assert len(simplify.densify(coords, 100.0)) == 2


# ---------------------------------------------------------------------------
# affine
# ---------------------------------------------------------------------------

def test_affine_rotate_about_origin():
    x, y = affine.apply(affine.rotate(90.0), np.array([1.0]), np.array([0.0]))
    assert x[0] == pytest.approx(0.0, abs=1e-15)
    assert y[0] == pytest.approx(1.0, abs=1e-15)


def test_affine_scale_about_center():
    m = affine.scale(2.0, 2.0, origin=(5.0, 5.0))
    x, y = affine.apply(m, np.array([5.0, 6.0]), np.array([5.0, 5.0]))
    assert (x[0], y[0]) == (5.0, 5.0)  # anchor fixed
    assert (x[1], y[1]) == (7.0, 5.0)


def test_affine_compose_order():
    """compose applies the SECOND argument first (affine_ops.rs compose)."""
    m = affine.compose(affine.translate(10.0, 0.0), affine.scale(2.0, 2.0))
    x, y = affine.apply(m, np.array([3.0]), np.array([4.0]))
    assert (x[0], y[0]) == (16.0, 8.0)  # scale then translate


def test_affine_inverse_roundtrip():
    m = affine.compose_many(affine.rotate(33.0, (2.0, 1.0)), affine.scale(3.0, 0.5), affine.translate(-4.0, 9.0))
    inv = affine.inverse(m)
    x = np.array([1.0, -5.0, 3.25])
    y = np.array([2.0, 7.0, -0.5])
    xx, yy = affine.apply(inv, *affine.apply(m, x, y))
    assert np.allclose(xx, x, atol=1e-12) and np.allclose(yy, y, atol=1e-12)


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------

def _layer_of(polys):
    import pyarrow as pa

    rings = geom.rings_to_arrow(polys)
    bbox = np.asarray(
        [
            (np.vstack(r)[:, 0].min(), np.vstack(r)[:, 1].min(),
             np.vstack(r)[:, 0].max(), np.vstack(r)[:, 1].max())
            for r in polys
        ]
    )
    return geom.PolygonLayer.from_arrow(
        pa.table(
            {
                "polygon_id": pa.array([f"p{i}" for i in range(len(polys))]),
                "rings": rings,
                "minx": pa.array(bbox[:, 0]), "miny": pa.array(bbox[:, 1]),
                "maxx": pa.array(bbox[:, 2]), "maxy": pa.array(bbox[:, 3]),
            }
        )
    )


def test_validation_codes():
    square = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    hole_in = np.array([(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)])
    hole_out = hole_in + 10.0
    # self-crossing ring with nonzero net area (a symmetric bowtie nets
    # to zero area and is reported as ZeroArea first)
    bowtie = np.array([(0.0, 0.0), (4.0, 0.0), (1.0, 3.0), (3.0, 3.0), (0.0, 0.0)])
    degenerate = np.array([(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (0.0, 0.0)])
    codes = validation.validate(
        _layer_of([[square], [square, hole_in], [square, hole_out], [bowtie], [degenerate]])
    )
    assert list(codes) == [
        validation.VALID,
        validation.VALID,
        validation.HOLE_OUTSIDE_SHELL,
        validation.SELF_INTERSECTION,
        validation.ZERO_AREA,
    ]


def test_generated_layer_is_valid():
    layer = geom.PolygonLayer.from_arrow(datagen.generate_polygons(48))
    codes = validation.validate(layer, check_self_intersection=False)
    assert (codes == validation.VALID).all()


def test_concave_hull_contains_all_and_tightens():
    """KNearestConcaveHull: contains every point; area <= convex hull
    (strictly smaller for a concave cloud)."""
    from georay.kernels.hull import concave_hull_knn, convex_hull_points

    rs = np.random.RandomState(8)
    # C-shaped cloud: concave hull should carve the notch
    t = rs.uniform(0.25 * np.pi, 1.75 * np.pi, 120)
    r = rs.uniform(4.0, 5.0, 120)
    pts = np.column_stack([r * np.cos(t), r * np.sin(t)])
    ring = concave_hull_knn(pts, k=7)
    assert np.array_equal(ring[0], ring[-1])
    for x, y in pts:
        assert oracle.polygon_position(x, y, [ring]) != oracle.OUTSIDE
    chull = convex_hull_points(pts)
    assert abs(oracle.signed_area([ring])) < abs(oracle.signed_area([chull]))


def test_concave_hull_degenerate_falls_back():
    from georay.kernels.hull import concave_hull_knn

    tri = np.array([(0.0, 0.0), (4.0, 0.0), (2.0, 3.0)])
    ring = concave_hull_knn(tri, k=3)
    assert len(ring) == 4


def test_kernel_registry_and_map_coords(ray_session, tiny_sf):
    """§2.10 extension surface: register a batch kernel by name, apply
    it as a stage; map_coords applies a flat-array UDF to a ragged
    geometry column and refreshes bboxes."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from georay import functions as F

    @F.register_kernel("test-double-x")
    def _double(t: pa.Table) -> pa.Table:
        import numpy as np

        v = t.column("minx").to_numpy(zero_copy_only=False)
        return t.set_column(t.column_names.index("minx"), "minx", pa.array(v * 2))

    sf_dir, paths = tiny_sf
    ds = rd.read_parquet(paths["polygons"])
    out = F.apply_kernel(ds, "test-double-x").to_pandas()
    orig = pq.read_table(paths["polygons"]).to_pandas()
    merged = out.merge(orig, on="polygon_id", suffixes=("_k", "_o"))
    assert (merged["minx_k"] == merged["minx_o"] * 2).all()

    # map_coords: rotate 180deg about origin -> bbox mirrors
    rot = F.map_coords(rd.read_parquet(paths["polygons"]), lambda x, y: (-x, -y))
    got = rot.to_pandas().merge(orig, on="polygon_id", suffixes=("_r", "_o"))
    assert (got["minx_r"] == -got["maxx_o"]).all()
    assert (got["maxy_r"] == -got["miny_o"]).all()
    # duplicate registration rejected
    import pytest as _pt

    with _pt.raises(ValueError):
        F.register_kernel("test-double-x")(lambda t: t)
