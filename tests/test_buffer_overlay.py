"""Buffer + general-overlay engine: JTS corpus replay and unit gates.

Replays the reference's own conformance corpora:
* every `buffer` op in *Buffer*.xml under general/ + misc/ (the same
  glob the reference wires at geo/src/algorithm/buffer.rs:863), judged
  by the xor-area ratio <= 0.0014 rule (jts-test-runner/src/lib.rs:52-96);
* the areal `union` / `intersection` / `difference` / `symdifference`
  cases of TestOverlayAA.xml + TestUnaryUnion.xml (wired in the
  reference at bool_ops/tests.rs:130), judged by xor-area ratio <= 1e-6
  (the runner uses equal_topo; area-xor is the same bar for areal
  results up to collinear vertices).

Full-corpus counts (2026-08-17 run): 138/138 buffer cases pass — the
reference itself expected-fails TestBuffer.xml case 6 (collapsed flat
polygon, runner.rs:58-66); this engine handles it.
"""

import os
import re

import numpy as np
import pytest

from georay import io as gio
from georay.kernels import buffer as gb
from georay.kernels import overlay as ov

CORPUS = "/root/reference/jts-test-runner/resources/testxml"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="JTS conformance corpus not available"
)


def _buffer_cases(fname):
    text = open(os.path.join(CORPUS, fname)).read()
    for ci, case in enumerate(re.findall(r"<case>(.*?)</case>", text, re.S)):
        a = re.search(r"<a>\s*(.*?)\s*</a>", case, re.S)
        ops = re.findall(
            r"<op\s+name=['\"]buffer['\"]\s+arg1=['\"][Aa]['\"]\s+"
            r"arg2=['\"]([^'\"]+)['\"](?:\s+arg3=['\"]\s*([^'\"]*)['\"])?\s*>"
            r"\s*(.*?)\s*</op>",
            case,
            re.S,
        )
        for ti, (dist, arg3, expected) in enumerate(ops):
            # the reference's serde ignores arg3 (quadrant segments) and
            # still passes; replicate that behavior
            yield ci, ti, a.group(1).strip(), float(dist), expected.strip()


def _to_polys(parsed):
    kind, data = parsed
    if kind == "polygon":
        return [(data[0], list(data[1:]))]
    if kind == "multipolygon":
        return [(rings[0], list(rings[1:])) for rings in data]
    raise ValueError(kind)


def run_buffer(parsed, dist, style=None):
    kind, data = parsed
    style = style or gb.BufferStyle(dist)
    if kind == "point":
        return [] if data is None else gb.buffer_point(data[0], data[1], style)
    if kind == "multipoint":
        return gb.buffer_multipoint(data, style)
    if kind == "linestring":
        return gb.buffer_linestring(data, style)
    if kind == "multilinestring":
        return gb.buffer_multilinestring(data, style)
    if kind == "polygon":
        return gb.buffer_polygon(data, style)
    if kind == "multipolygon":
        return gb.buffer_multipolygon(data, style)
    raise ValueError(kind)


def _replay_buffer_file(fname, sample_stride=1):
    npass = nfail = 0
    failures = []
    for ci, ti, a_wkt, dist, exp_wkt in _buffer_cases(fname):
        if (ci + ti) % sample_stride:
            continue
        subj = gio.parse_wkt(a_wkt)
        actual = run_buffer(subj, dist)
        if "EMPTY" in exp_wkt.upper():
            ok = (not actual) or abs(ov.mp_area(actual)) < 2e-6
        else:
            ratio = ov.xor_area_ratio(actual, _to_polys(gio.parse_wkt(exp_wkt)))
            ok = ratio <= 0.0014
        if ok:
            npass += 1
        else:
            nfail += 1
            failures.append(f"{fname}#{ci}.{ti} d={dist}")
    assert nfail == 0, failures
    return npass


def test_jts_buffer_corpus_general():
    assert _replay_buffer_file("general/TestBuffer.xml") == 26


def test_jts_buffer_corpus_misc_small():
    n = 0
    for f in (
        "misc/GEOSBuffer.xml",
        "misc/TestBufferJagged.xml",
        "misc/geos-bug356-buffer.xml",
        "misc/TestBufferExternal.xml",
    ):
        n += _replay_buffer_file(f)
    assert n >= 12


def test_jts_buffer_corpus_external2_sampled():
    """100-case file; every 4th case in CI (full run: 100/100 green)."""
    assert _replay_buffer_file("misc/TestBufferExternal2.xml", sample_stride=4) >= 25


# ---------------------------------------------------------------------------
# general boolean overlay corpus (areal operands)
# ---------------------------------------------------------------------------

_BOOL_OPS = {
    "union": "union",
    "intersection": "intersection",
    "difference": "difference",
    "symdifference": "xor",
}


def _areal(parsed):
    if parsed is None:
        return None
    kind, data = parsed
    if kind == "polygon":
        return [list(data)]
    if kind == "multipolygon":
        return [list(rings) for rings in data]
    return None


def test_jts_overlay_aa_corpus():
    """TestOverlayAA.xml: every areal boolean case (bool_ops/tests.rs:130)."""
    text = open(os.path.join(CORPUS, "general/TestOverlayAA.xml")).read()
    npass = nrun = 0
    failures = []
    for ci, case in enumerate(re.findall(r"<case>(.*?)</case>", text, re.S)):
        a = re.search(r"<a>\s*(.*?)\s*</a>", case, re.S)
        b = re.search(r"<b>\s*(.*?)\s*</b>", case, re.S)
        ops = re.findall(
            r"<op\s+name=['\"](\w+)['\"][^>]*>\s*(.*?)\s*</op>", case, re.S
        )
        for ti, (opname, exp_wkt) in enumerate(ops):
            if opname.lower() not in _BOOL_OPS:
                continue
            try:
                ga = _areal(gio.parse_wkt(a.group(1).strip())) if a else None
                gbm = _areal(gio.parse_wkt(b.group(1).strip())) if b else None
                exp_parsed = (
                    []
                    if "EMPTY" in exp_wkt.upper()
                    else _to_polys(gio.parse_wkt(exp_wkt.strip()))
                )
            except ValueError:
                continue  # non-areal operand or expectation: runner skips too
            if ga is None or gbm is None:
                continue
            nrun += 1
            got = ov.overlay(ga, gbm, _BOOL_OPS[opname.lower()])
            ea = ov.mp_area(exp_parsed) if exp_parsed else 0.0
            ga_area = ov.mp_area(got) if got else 0.0
            if ea == 0.0:
                ok = abs(ga_area) <= 2e-6
            else:
                ok = ov.xor_area_ratio(got, exp_parsed) <= 1e-6
            if ok:
                npass += 1
            else:
                failures.append(f"case{ci}.{ti} {opname}")
    assert nrun >= 20 and not failures, (nrun, failures)


def test_jts_unary_union_corpus():
    text = open(os.path.join(CORPUS, "general/TestUnaryUnion.xml")).read()
    npass = nrun = 0
    failures = []
    for ci, case in enumerate(re.findall(r"<case>(.*?)</case>", text, re.S)):
        a = re.search(r"<a>\s*(.*?)\s*</a>", case, re.S)
        ops = re.findall(
            r"<op\s+name=['\"]union['\"]\s+arg1=['\"][Aa]['\"]\s*>\s*(.*?)\s*</op>",
            case,
            re.S,
        )
        for ti, exp_wkt in enumerate(ops):
            try:
                region = _areal(gio.parse_wkt(a.group(1).strip()))
                exp_parsed = (
                    []
                    if "EMPTY" in exp_wkt.upper()
                    else _to_polys(gio.parse_wkt(exp_wkt.strip()))
                )
            except ValueError:
                continue
            if region is None:
                continue
            nrun += 1
            got = ov.unary_union(region)
            if not exp_parsed:
                ok = (not got) or abs(ov.mp_area(got)) < 2e-6
            else:
                ok = ov.xor_area_ratio(got, exp_parsed) <= 1e-6
            if ok:
                npass += 1
            else:
                failures.append(f"case{ci}.{ti}")
    assert nrun >= 1 and not failures, (nrun, failures)


# ---------------------------------------------------------------------------
# style unit gates (caps/joins) — analytic expectations
# ---------------------------------------------------------------------------

N32 = 16 * np.sin(np.pi / 16)  # area factor of the unit 32-gon


def test_cap_styles_analytic():
    line = [(0.0, 0.0), (10.0, 0.0)]
    d = 2.0
    butt = gb.buffer_linestring(line, gb.BufferStyle(d, cap="butt"))
    assert abs(ov.mp_area(butt) - 40.0) < 2e-6
    square = gb.buffer_linestring(line, gb.BufferStyle(d, cap="square"))
    assert abs(ov.mp_area(square) - (40.0 + 2 * 2 * d * d)) < 2e-6
    rnd = gb.buffer_linestring(line, gb.BufferStyle(d, cap="round"))
    assert abs(ov.mp_area(rnd) - (40.0 + N32 * d * d)) < 2e-6


def test_join_styles_analytic():
    # right-angle turn; joins differ exactly by the corner piece area
    path = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]
    d = 2.0
    base = 2 * (10 * 2 * d) - d * d  # two rects minus inner overlap
    bevel = gb.buffer_linestring(path, gb.BufferStyle(d, cap="butt", join="bevel"))
    assert abs(ov.mp_area(bevel) - (base + d * d / 2)) < 2e-6
    miter = gb.buffer_linestring(path, gb.BufferStyle(d, cap="butt", join="miter"))
    assert abs(ov.mp_area(miter) - (base + d * d)) < 2e-6
    rnd = gb.buffer_linestring(path, gb.BufferStyle(d, cap="butt", join="round"))
    # quarter-circle fan: 8 segments of the 32-gon
    assert abs(ov.mp_area(rnd) - (base + 8 * (d * d / 2) * np.sin(np.pi / 2 / 8))) < 2e-6


def test_miter_limit_falls_back_to_bevel():
    # sharp spike: miter length exceeds the limit -> bevel triangle
    path = [(0.0, 0.0), (10.0, 0.0), (0.0, 1.0)]
    d = 1.0
    lim = gb.buffer_linestring(path, gb.BufferStyle(d, cap="butt", join="miter", miter_limit=1.5))
    bev = gb.buffer_linestring(path, gb.BufferStyle(d, cap="butt", join="bevel"))
    assert abs(ov.mp_area(lim) - ov.mp_area(bev)) < 2e-6


def test_negative_buffer_creates_multipolygon_split():
    # dumbbell: two squares joined by a thin neck; erosion splits it
    ring = np.asarray(
        [
            (0, 0), (4, 0), (4, 1.8), (6, 1.8), (6, 0), (10, 0),
            (10, 4), (6, 4), (6, 2.2), (4, 2.2), (4, 4), (0, 4), (0, 0),
        ],
        dtype=float,
    )
    res = gb.buffer_polygon([ring], gb.BufferStyle(-0.5))
    assert len(res) == 2  # the neck (width 0.4 < 1.0) is gone


# ---------------------------------------------------------------------------
# dataset-level dissolve
# ---------------------------------------------------------------------------


def test_dissolve_matches_single_node_union(ray_session):
    """Distributed dissolve (per-cell partials -> merge) == single-node
    unary_union of the same layer, in area and component count."""
    import ray.data as rd

    from georay import dissolve as gdis
    from georay import geom

    rs = np.random.RandomState(42)
    polys = []
    for i in range(40):
        cx, cy = rs.uniform(-100, 100), rs.uniform(-40, 40)
        w, h = rs.uniform(2, 8), rs.uniform(2, 8)
        ring = np.asarray(
            [(cx, cy), (cx + w, cy), (cx + w, cy + h), (cx, cy + h), (cx, cy)]
        )
        polys.append([ring])
    arr = geom.rings_to_arrow(polys)
    import pyarrow as pa2

    t = pa2.table(
        {
            "polygon_id": pa2.array([f"p{i}" for i in range(len(polys))]),
            "rings": arr,
            "minx": pa2.array([r[0][:, 0].min() for r in polys]),
            "miny": pa2.array([r[0][:, 1].min() for r in polys]),
            "maxx": pa2.array([r[0][:, 0].max() for r in polys]),
            "maxy": pa2.array([r[0][:, 1].max() for r in polys]),
        }
    )
    got = gdis.dissolve(rd.from_arrow(t), cell_deg=45.0).to_pandas()
    direct = ov.unary_union([[r[0]] for r in polys])
    got_area = 0.0
    for rings in got["rings"]:
        shell = np.asarray([(c["x"], c["y"]) for c in rings[0]])
        got_area += abs(ov._signed_area(shell))
        for h in rings[1:]:
            hh = np.asarray([(c["x"], c["y"]) for c in h])
            got_area -= abs(ov._signed_area(hh))
    assert abs(got_area - ov.mp_area(direct)) / ov.mp_area(direct) < 2e-6
    assert len(got) == len(direct)


# ---------------------------------------------------------------------------
# MakeValid (repair_polygon/mod.rs doc goldens, odd-even prepair rule)
# ---------------------------------------------------------------------------


def _ring(*pts):
    a = np.asarray(pts, float)
    return np.vstack([a, a[:1]]) if not np.array_equal(a[0], a[-1]) else a


def test_make_valid_reference_doc_goldens():
    # bowtie -> two triangles (mod.rs:44-53)
    r = ov.make_valid([_ring((0, 0), (0, 10), (10, 0), (10, 10))])
    assert len(r) == 2 and abs(ov.mp_area(r) - 50.0) < 2e-6
    # dangling edge cancels (mod.rs:57-68)
    r = ov.make_valid([_ring((0, 0), (10, 0), (15, 5), (10, 0), (10, 10), (0, 10))])
    assert abs(ov.mp_area(r) - 100.0) < 2e-6
    # hole sharing an edge with the shell (mod.rs:71-85)
    r = ov.make_valid(
        [_ring((0, 0), (10, 0), (10, 10), (0, 10)), _ring((5, 2), (5, 7), (10, 7), (10, 2))]
    )
    assert abs(ov.mp_area(r) - 75.0) < 2e-6
    # hole equal to shell annihilates (mod.rs:88-101)
    sq = _ring((10, 90), (90, 90), (90, 10), (10, 10))
    r = ov.make_valid([sq, sq.copy()])
    assert (not r) or abs(ov.mp_area(r)) < 2e-6
    # nested shells -> annulus (mod.rs:104-119)
    r = ov.make_valid(
        [_ring((30, 70), (70, 70), (70, 30), (30, 30)), _ring((10, 90), (90, 90), (90, 10), (10, 10))]
    )
    assert abs(ov.mp_area(r) - 4800.0) < 2e-6 and len(r) == 1 and len(r[0][1]) == 1
    # banana: hole touching the shell at one vertex (mod.rs:122-138)
    r = ov.make_valid(
        [_ring((0, 0), (10, 0), (10, 10), (0, 10)), _ring((5, 0), (8, 3), (2, 3))]
    )
    assert abs(ov.mp_area(r) - 91.0) < 2e-6


def test_make_valid_output_is_valid():
    """Repaired bowties pass the validation kernel."""
    from georay import geom
    from georay.kernels import validation

    r = ov.make_valid([_ring((0, 0), (0, 10), (10, 0), (10, 10))])
    polys = [[geom.close_ring(shell), *[geom.close_ring(h) for h in holes]] for shell, holes in r]
    arr = geom.rings_to_arrow(polys)
    import pyarrow as pa2

    t = pa2.table(
        {
            "polygon_id": pa2.array([f"r{i}" for i in range(len(polys))]),
            "rings": arr,
            "minx": pa2.array([p[0][:, 0].min() for p in polys]),
            "miny": pa2.array([p[0][:, 1].min() for p in polys]),
            "maxx": pa2.array([p[0][:, 0].max() for p in polys]),
            "maxy": pa2.array([p[0][:, 1].max() for p in polys]),
        }
    )
    layer = geom.PolygonLayer.from_arrow(t)
    codes = validation.validate(layer)
    assert not codes.any(), codes


# ---------------------------------------------------------------------------
# snap-rounding hardening (round 3): adversarial sub-tolerance inputs
# ---------------------------------------------------------------------------


def _sq(x0, y0, s):
    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]]
    )


def test_overlay_epsilon_gap_welds():
    """Two unit squares separated by a sub-snap 1e-13 gap: snap
    rounding welds them into ONE piece with no sliver artifacts."""
    from georay.kernels import overlay as ov

    a = [[_sq(0.0, 0.0, 1.0)]]
    b = [[_sq(1.0 + 1e-13, 0.0, 1.0)]]
    got = ov.overlay(a, b, "union")
    assert len(got) == 1  # welded
    assert ov.mp_area(got) == pytest.approx(2.0, abs=1e-6)
    # and the intersection of the same pair is empty or sliver-free
    inter = ov.overlay(a, b, "intersection")
    assert ov.mp_area(inter) <= 2e-6


def test_overlay_epsilon_sliver_overlap():
    """Overlap of width 1e-12 (below snap of the unit extent): must not
    produce a negative/NaN area or a crossing ring — either empty or
    a sub-snap sliver."""
    from georay.kernels import overlay as ov

    a = [[_sq(0.0, 0.0, 1.0)]]
    b = [[_sq(1.0 - 1e-12, 0.0, 1.0)]]
    inter = ov.overlay(a, b, "intersection")
    ar = ov.mp_area(inter)
    assert 0.0 <= ar <= 1e-8
    un = ov.overlay(a, b, "union")
    assert ov.mp_area(un) == pytest.approx(2.0, abs=1e-6)


def test_overlay_near_tangent_buffers():
    """unary_union of two near-tangent discs (gap 1e-11 of a ~2 unit
    extent — far below the old 1e-7 probe delta): inclusion-exclusion
    must hold to snap precision and the weld must not create bowties."""
    import numpy as np

    from georay.kernels import overlay as ov

    th = np.linspace(0.0, 2.0 * np.pi, 257)
    c1 = np.column_stack([np.cos(th), np.sin(th)])
    c2 = np.column_stack([2.0 + 1e-11 + np.cos(th), np.sin(th)])
    area1 = abs(ov.mp_area(ov.overlay([[c1]], [], "union")))
    un = ov.overlay([[c1]], [[c2]], "union")
    inter = ov.overlay([[c1]], [[c2]], "intersection")
    assert ov.mp_area(un) + ov.mp_area(inter) == pytest.approx(2 * area1, rel=1e-6)
    # every output ring is simple enough to re-union to the same area
    again = ov.unary_union([[s] + list(h) for s, h in un])
    assert ov.mp_area(again) == pytest.approx(ov.mp_area(un), rel=1e-9)


def test_overlay_thin_feature_preserved():
    """A legitimate thin rectangle (1e-5 of the extent — far above
    snap, below the OLD probe delta regime x extent) must survive a
    union with its exact area, not be swallowed."""
    from georay.kernels import overlay as ov

    thin = [[_sq(0.0, 0.0, 1.0) * np.array([1.0, 1e-5])]]  # 1 x 1e-5
    far = [[_sq(5.0, 5.0, 1.0)]]
    un = ov.overlay(thin, far, "union")
    assert ov.mp_area(un) == pytest.approx(1.0 + 1e-5, rel=1e-4)


def test_overlay_collinear_stacked_edges_snapped():
    """Three boxes sharing one collinear edge chain with vertices at
    sub-snap perturbations: union area exact to snap tolerance."""
    from georay.kernels import overlay as ov

    a = [[_sq(0.0, 0.0, 2.0)]]
    b = [[_sq(2.0 + 5e-13, 0.0, 2.0)], [_sq(4.0 - 5e-13, 0.0, 2.0)]]
    un = ov.overlay(a, b, "union")
    assert ov.mp_area(un) == pytest.approx(12.0, abs=1e-6)
    assert len(un) == 1


def test_union_sweep_bounds_dissolve(ray_session, tiny_sf):
    """The exact sweep union area and the overlay-constructed dissolve
    area must agree within the overlay's snap quantization — an
    independent end-to-end check on the whole overlay engine."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from georay import dissolve as gdis, sweeparea
    from georay.kernels import overlay as govl

    sf_dir, paths = tiny_sf
    polys = rd.read_parquet(paths["polygons"])
    exact = sweeparea.union_area_sweep(polys).to_pandas()["union_area"].iloc[0]
    out = gdis.dissolve(rd.read_parquet(paths["polygons"])).to_pandas()
    total = 0.0
    for rings in out["rings"]:
        shell = np.asarray([(c["x"], c["y"]) for c in rings[0]])
        total += abs(govl._signed_area(shell))
        for h in rings[1:]:
            total -= abs(govl._signed_area(np.asarray([(c["x"], c["y"]) for c in h])))
    # snap quantization bound: 1e-9 * extent(360) * total boundary length
    assert exact > 0
    assert abs(exact - total) < 1e-4 * max(1.0, exact)


def test_cell_sweep_clamp_kink_exact():
    """ADVICE r3 high: a segment crossing the cell's horizontal boundary
    kinks the clamped coverage mid-strip; the crossing x's must be
    breakpoints.  Triangle crossing y=0 + a small square that adds
    vertex breakpoints in only one of the two cells."""
    from georay.sweeparea import _cell_sweep_area

    def segs(coords, pid):
        c = np.array(coords + [coords[0]], float)
        return c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1], np.full(len(c) - 1, pid)

    tri = segs([(0, -4), (8, -4), (4, 6)], 0)
    sq_hi = segs([(1, 8), (3, 8), (3, 9), (1, 9)], 1)
    x1, y1, x2, y2, poly = (
        np.concatenate([tri[i], sq_hi[i]]) for i in range(5)
    )
    a = _cell_sweep_area(x1, y1, x2, y2, poly.astype(np.int64), 0.0, 0.0, 10.0, 10.0)
    # triangle part above y=0 is (1.6,0),(6.4,0),(4,6): 14.4; square: 2
    assert a == pytest.approx(16.4, abs=1e-9)

    # lower cell with an overlapping square straddling the triangle edge
    sq_lo = segs([(1, -3), (3, -3), (3, -1), (1, -1)], 1)
    x1, y1, x2, y2, poly = (
        np.concatenate([tri[i], sq_lo[i]]) for i in range(5)
    )
    a_lo = _cell_sweep_area(x1, y1, x2, y2, poly.astype(np.int64), 0.0, -10.0, 10.0, 0.0)
    a_hi = _cell_sweep_area(x1, y1, x2, y2, poly.astype(np.int64), 0.0, 0.0, 10.0, 10.0)
    # analytic: triangle below y=0 is a trapezoid area 40-14.4=25.6; the
    # square [1,3]x[-3,-1] sticks out of the triangle left of its left
    # edge x(y)=(y+4)/2.5 -> outside area = int_{-3}^{-1} max(0,(y+4)/2.5-1) dy
    # = int 0.4y+0.6 dy from -3(x=0.4)..-1(x=1.2): left edge enters square at
    # y where (y+4)/2.5=1 -> y=-1.5; outside = int_{-1.5}^{-1}((y+4)/2.5-1)dy = 0.05
    assert a_lo == pytest.approx(25.65, abs=1e-9)
    assert a_hi == pytest.approx(14.4, abs=1e-9)
