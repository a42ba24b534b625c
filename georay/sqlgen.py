"""DuckDB oracle SQL for every driver-checked query.

Each builder returns ANSI-ish SQL DuckDB 1.0 runs over (a) the driver's
pre-registered testdata views and (b) the derived image/polygon parquet
(read_parquet on the deterministic cache — byte-identical input to the
Ray side).  The SQL recomputes results INDEPENDENTLY: geolocation via
the splitmix64 HUGEINT emitters (georay.rng), point-in-polygon via
crossing-number parity over the flat segment table, distances via the
haversine formula, areas/centroids via shoelace sums — not by reading
any golden produced by the engine.

Float-output policy (driver hashes values exactly): outputs are either
IEEE-exact (lon/lat, extents: identical arithmetic both sides) or
rounded with a step many orders above the cross-engine noise
(haversine ~1e-9 m noise -> 0.1 m step; shoelace ~1e-12 -> 1e-6 step);
rank-style outputs drop the float entirely.
"""

from __future__ import annotations

from . import datagen
from .rng import sql_lonlat_cte

R = 6_371_008.8
CELL_RES = 6
TILE_RES = 4
HOT_LON, HOT_LAT = 10.0, 20.0
KNN_K = 5
KNN_SAMPLE_MOD = 50
EMB_SAMPLE_MOD = 50
EMB_K = 5


def _pts_cte(sf_dir: str) -> str:
    images = datagen.images_path(sf_dir)
    return sql_lonlat_cte(f"read_parquet('{images}')")


def _hav_expr(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Identical operation order to kernels.measures.haversine_distance."""
    return (
        f"2.0 * asin(sqrt(least("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2.0), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2.0), 2), 1.0))) * {R!r}"
    )


def q_phash_lonlat(sf_dir: str) -> str:
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}) "
        f"SELECT image_id, lon, lat FROM pts"
    )


def q_cell_assign(sf_dir: str) -> str:
    n = 1 << CELL_RES
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}) "
        f"SELECT image_id, "
        f"LEAST(GREATEST(floor((lon + 180.0) / 360.0 * {float(n)}), 0), {n - 1})::BIGINT AS cell_x, "
        f"LEAST(GREATEST(floor((lat + 90.0) / 180.0 * {float(n)}), 0), {n - 1})::BIGINT AS cell_y "
        f"FROM pts"
    )


def q_tile_assign(sf_dir: str) -> str:
    n = 1 << TILE_RES
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}) "
        f"SELECT image_id, "
        f"(LEAST(GREATEST(floor((lat + 90.0) / 180.0 * {float(n)}), 0), {n - 1})::BIGINT * {n} + "
        f" LEAST(GREATEST(floor((lon + 180.0) / 360.0 * {float(n)}), 0), {n - 1})::BIGINT) AS tile_id "
        f"FROM pts"
    )


def _pip_pairs_cte(sf_dir: str) -> str:
    """CTEs pts/cand/hits: crossing-number parity PiP (half-open edge rule;
    equivalent to the winding test for the simple rings the generator
    emits, boundary cases having measure zero for random points)."""
    polys = datagen.polygons_path(sf_dir)
    segs = datagen.segments_path(sf_dir)
    return (
        f"{_pts_cte(sf_dir)}), "
        f"cand AS (SELECT p.image_id, p.lon, p.lat, b.polygon_id "
        f"  FROM pts p JOIN read_parquet('{polys}') b "
        f"  ON p.lon >= b.minx AND p.lon <= b.maxx AND p.lat >= b.miny AND p.lat <= b.maxy), "
        f"hits AS (SELECT c.image_id, c.polygon_id "
        f"  FROM cand c JOIN read_parquet('{segs}') s ON s.polygon_id = c.polygon_id "
        f"  WHERE ((s.y1 <= c.lat AND s.y2 > c.lat) OR (s.y2 <= c.lat AND s.y1 > c.lat)) "
        f"    AND c.lon < s.x1 + (c.lat - s.y1) * (s.x2 - s.x1) / (s.y2 - s.y1) "
        f"  GROUP BY c.image_id, c.polygon_id HAVING count(*) % 2 = 1"
    )


def q_pip_contains(sf_dir: str) -> str:
    return f"WITH pts AS ({_pip_pairs_cte(sf_dir)}) SELECT image_id, polygon_id FROM hits"


def q_pip_count_by_polygon(sf_dir: str) -> str:
    return (
        f"WITH pts AS ({_pip_pairs_cte(sf_dir)}) "
        f"SELECT polygon_id, count(*)::BIGINT AS n_images FROM hits GROUP BY polygon_id"
    )


def q_tile_counts(sf_dir: str) -> str:
    n = 1 << TILE_RES
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}), t AS ("
        f"SELECT (LEAST(GREATEST(floor((lat + 90.0) / 180.0 * {float(n)}), 0), {n - 1})::BIGINT * {n} + "
        f" LEAST(GREATEST(floor((lon + 180.0) / 360.0 * {float(n)}), 0), {n - 1})::BIGINT) AS tile_id "
        f"FROM pts) SELECT tile_id, count(*)::BIGINT AS n_images FROM t GROUP BY tile_id"
    )


def q_haversine_to_hot(sf_dir: str) -> str:
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}) "
        f"SELECT image_id, round({_hav_expr('lon', 'lat', str(HOT_LON), str(HOT_LAT))}, 1) AS dist_m "
        f"FROM pts"
    )


def q_euclidean_to_hot(sf_dir: str) -> str:
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}) "
        f"SELECT image_id, round(sqrt((lon - {HOT_LON}) * (lon - {HOT_LON}) + "
        f"(lat - {HOT_LAT}) * (lat - {HOT_LAT})), 6) AS dist_deg FROM pts"
    )


def q_bearing_to_hot(sf_dir: str) -> str:
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}) "
        f"SELECT image_id, round(("
        f"degrees(atan2(cos(radians({HOT_LAT})) * sin(radians({HOT_LON} - lon)), "
        f"cos(radians(lat)) * sin(radians({HOT_LAT})) - "
        f"sin(radians(lat)) * cos(radians({HOT_LAT})) * cos(radians({HOT_LON} - lon)))) "
        f"+ 360.0) % 360.0, 4) AS bearing_deg FROM pts"
    )


def q_extent(sf_dir: str) -> str:
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}) "
        f"SELECT min(lon) AS min_lon, max(lon) AS max_lon, "
        f"min(lat) AS min_lat, max(lat) AS max_lat FROM pts"
    )


def q_poly_area(sf_dir: str) -> str:
    segs = datagen.segments_path(sf_dir)
    # shoelace over the segment table; holes are stored with their own
    # winding so the plain signed sum matches area.rs:80-88 semantics
    return (
        f"SELECT polygon_id, "
        f"round(sum((x1 * y2 - x2 * y1)) / 2.0, 6) AS area "
        f"FROM read_parquet('{segs}') GROUP BY polygon_id"
    )


def q_poly_bbox(sf_dir: str) -> str:
    segs = datagen.segments_path(sf_dir)
    return (
        f"SELECT polygon_id, min(LEAST(x1, x2)) AS minx, min(LEAST(y1, y2)) AS miny, "
        f"max(GREATEST(x1, x2)) AS maxx, max(GREATEST(y1, y2)) AS maxy "
        f"FROM read_parquet('{segs}') GROUP BY polygon_id"
    )


def q_knn_sample(sf_dir: str) -> str:
    hav = _hav_expr("q.qlon", "q.qlat", "p.lon", "p.lat")
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}), "
        f"q AS (SELECT image_id AS qid, lon AS qlon, lat AS qlat FROM pts "
        f"  WHERE CAST(substr(image_id, 5) AS BIGINT) % {KNN_SAMPLE_MOD} = 0), "
        f"d AS (SELECT q.qid, p.image_id AS neighbor_id, {hav} AS dist "
        f"  FROM q CROSS JOIN pts p WHERE p.image_id <> q.qid), "
        f"r AS (SELECT qid, neighbor_id, "
        f"  row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS rank FROM d) "
        f"SELECT qid AS image_id, neighbor_id, rank::BIGINT AS rank FROM r WHERE rank <= {KNN_K}"
    )


# ---------------------------------------------------------------------------
# training-data ops over the driver's testdata views
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str) -> str:
    return (
        "SELECT md5(text) AS content_hash, min(doc_id)::BIGINT AS keep_doc_id, "
        "count(*)::BIGINT AS n_dups FROM documents GROUP BY md5(text)"
    )


def q_token_stats(sf_dir: str) -> str:
    return (
        "SELECT doc_id, length(text)::BIGINT AS n_chars, "
        "CASE WHEN trim(text) = '' THEN 0 "
        "ELSE length(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT AS n_tokens "
        "FROM documents"
    )


def q_quality_score(sf_dir: str) -> str:
    # punctuation+digit density and mean token length, rounded coarse
    return (
        "SELECT doc_id, "
        "round(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE / "
        "GREATEST(length(text), 1), 4) AS punct_ratio, "
        "CASE WHEN trim(text) = '' THEN 0.0 ELSE "
        "round(length(regexp_replace(trim(text), '\\s+', '', 'g'))::DOUBLE / "
        "length(regexp_split_to_array(trim(text), '\\s+')), 2) END AS mean_tok_len "
        "FROM documents"
    )


def q_embed_knn(sf_dir: str) -> str:
    return (
        f"WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings "
        f"  WHERE vec_id % {EMB_SAMPLE_MOD} = 0), "
        f"d AS (SELECT q.qid, e.vec_id AS neighbor_id, "
        f"  list_cosine_similarity(e.embedding, q.qv) AS sim "
        f"  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid), "
        f"r AS (SELECT qid, neighbor_id, "
        f"  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank FROM d) "
        f"SELECT qid, neighbor_id, rank::BIGINT AS rank FROM r WHERE rank <= {EMB_K}"
    )


ANN_CENT_MOD = 32
ANN_NPROBE = 2


def q_embed_ann_ivf(sf_dir: str) -> str:
    """Deterministic IVF-ANN (r4, georay.ann): codebook = id-sampled
    corpus rows, assignment = max-cosine centroid (ties to the smaller
    centroid index), search = cosine top-k among the query's nprobe
    cells, self excluded, ranked (sim desc, neighbor asc) like
    q_embed_knn."""
    return (
        f"WITH cent AS (SELECT vec_id, embedding, "
        f"  row_number() OVER (ORDER BY vec_id) - 1 AS cidx "
        f"  FROM embeddings WHERE vec_id % {ANN_CENT_MOD} = 0), "
        f"asg AS (SELECT e.vec_id, c.cidx, row_number() OVER ("
        f"  PARTITION BY e.vec_id ORDER BY "
        f"  list_cosine_similarity(e.embedding, c.embedding) DESC, c.cidx) AS rn "
        f"  FROM embeddings e CROSS JOIN cent c), "
        f"cell AS (SELECT vec_id, cidx FROM asg WHERE rn = 1), "
        f"q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings "
        f"  WHERE vec_id % {EMB_SAMPLE_MOD} = 0), "
        f"probe AS (SELECT q.qid, c.cidx, row_number() OVER ("
        f"  PARTITION BY q.qid ORDER BY "
        f"  list_cosine_similarity(q.qv, c.embedding) DESC, c.cidx) AS rn "
        f"  FROM q CROSS JOIN cent c), "
        f"pr AS (SELECT qid, cidx FROM probe WHERE rn <= {ANN_NPROBE}), "
        f"d AS (SELECT q.qid, e.vec_id AS neighbor_id, "
        f"  list_cosine_similarity(e.embedding, q.qv) AS sim "
        f"  FROM q JOIN pr ON pr.qid = q.qid "
        f"  JOIN cell ON cell.cidx = pr.cidx "
        f"  JOIN embeddings e ON e.vec_id = cell.vec_id "
        f"  WHERE e.vec_id <> q.qid), "
        f"r AS (SELECT qid, neighbor_id, row_number() OVER ("
        f"  PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank FROM d) "
        f"SELECT qid, neighbor_id, rank::BIGINT AS rank FROM r WHERE rank <= {EMB_K}"
    )


def q_events_window(sf_dir: str) -> str:
    return (
        "SELECT user_id, (epoch_us(ts) // 3600000000)::BIGINT AS win, "
        "count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value "
        "FROM events GROUP BY user_id, (epoch_us(ts) // 3600000000)"
    )


ORACLE_BUILDERS = {
    "phash_lonlat": q_phash_lonlat,
    "cell_assign": q_cell_assign,
    "tile_assign": q_tile_assign,
    "pip_contains": q_pip_contains,
    "pip_count_by_polygon": q_pip_count_by_polygon,
    "tile_counts": q_tile_counts,
    "haversine_to_hot": q_haversine_to_hot,
    "euclidean_to_hot": q_euclidean_to_hot,
    "bearing_to_hot": q_bearing_to_hot,
    "extent": q_extent,
    "poly_area": q_poly_area,
    "poly_bbox": q_poly_bbox,
    "knn_sample": q_knn_sample,
    "dedup_exact": q_dedup_exact,
    "token_stats": q_token_stats,
    "quality_score": q_quality_score,
    "embed_knn": q_embed_knn,
    "embed_ann_ivf": q_embed_ann_ivf,
    "events_window": q_events_window,
}


# ---------------------------------------------------------------------------
# phase 2: measures over polygons, transforms, relational/streaming ops
# ---------------------------------------------------------------------------

def q_poly_perimeter(sf_dir: str) -> str:
    segs = datagen.segments_path(sf_dir)
    return (
        f"SELECT polygon_id, "
        f"round(sum(sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))), 6) AS perimeter "
        f"FROM read_parquet('{segs}') WHERE ring_idx = 0 GROUP BY polygon_id"
    )


DENSIFY_MAX_LEN = 0.25


def q_densify_counts(sf_dir: str) -> str:
    # Densify semantics (line_measures/densify.rs): each segment longer
    # than max_len gains ceil(len/max_len)-1 interior points
    segs = datagen.segments_path(sf_dir)
    return (
        f"SELECT polygon_id, "
        f"(count(*) + sum(GREATEST(ceil(sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) "
        f"/ {DENSIFY_MAX_LEN}) - 1, 0)))::BIGINT AS n_densified_edges "
        f"FROM read_parquet('{segs}') WHERE ring_idx = 0 GROUP BY polygon_id"
    )


AFF_A, AFF_B, AFF_XOFF = 0.5, 0.25, 10.0
AFF_D, AFF_E, AFF_YOFF = -0.125, 2.0, -3.0


def q_affine_bbox(sf_dir: str) -> str:
    # one affine pass over every ring coord, then bbox — exact IEEE
    # arithmetic, identical expression both engines, no rounding
    segs = datagen.segments_path(sf_dir)
    ax = f"({AFF_A!r} * x1 + {AFF_B!r} * y1 + {AFF_XOFF!r})"
    ay = f"({AFF_D!r} * x1 + {AFF_E!r} * y1 + {AFF_YOFF!r})"
    return (
        f"SELECT polygon_id, min({ax}) AS minx, min({ay}) AS miny, "
        f"max({ax}) AS maxx, max({ay}) AS maxy "
        f"FROM read_parquet('{segs}') GROUP BY polygon_id"
    )


def q_ring_winding(sf_dir: str) -> str:
    segs = datagen.segments_path(sf_dir)
    return (
        f"SELECT polygon_id, ring_idx::BIGINT AS ring_idx, "
        f"CASE WHEN sum(x1 * y2 - x2 * y1) > 0 THEN 1 "
        f"WHEN sum(x1 * y2 - x2 * y1) < 0 THEN -1 ELSE 0 END::BIGINT AS winding "
        f"FROM read_parquet('{segs}') GROUP BY polygon_id, ring_idx"
    )


def q_poly_validity(sf_dir: str) -> str:
    # SQL-expressible subset of the validation flags: ring size, closure
    # (last segment returns to first vertex by construction), zero area
    segs = datagen.segments_path(sf_dir)
    return (
        f"SELECT polygon_id, "
        f"CASE WHEN min(cnt) < 3 THEN 1 WHEN min(absarea) = 0 THEN 3 ELSE 0 END::BIGINT AS code "
        f"FROM (SELECT polygon_id, ring_idx, count(*) AS cnt, abs(sum(x1 * y2 - x2 * y1)) AS absarea "
        f"      FROM read_parquet('{segs}') GROUP BY polygon_id, ring_idx) "
        f"GROUP BY polygon_id"
    )


def q_asof_join(sf_dir: str) -> str:
    # for each event: the most recent order of customer user_id at ts;
    # the right side is deduped to one row per (custkey, orderdate) so
    # equal-timestamp ties are deterministic in both engines
    return (
        "WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey "
        "FROM orders GROUP BY o_custkey, o_orderdate) "
        "SELECT e.event_id, o.o_orderkey "
        "FROM events e ASOF JOIN o "
        "ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"
    )


SESSION_GAP_US = 1_800_000_000  # 30 min


def q_sessionize(sf_dir: str) -> str:
    # session windows: a new session starts when the gap to the previous
    # event of the same user exceeds 30 min; session_id = first event_id
    return (
        f"WITH w AS (SELECT event_id, user_id, epoch_us(ts) AS t, "
        f"  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER "
        f"    (PARTITION BY user_id ORDER BY ts, event_id) > {SESSION_GAP_US} "
        f"  THEN 1 ELSE 0 END AS brk "
        f"  FROM events), "
        f"s AS (SELECT event_id, user_id, t, "
        f"  sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id "
        f"  ROWS UNBOUNDED PRECEDING) AS sess_no FROM w) "
        f"SELECT event_id, user_id, "
        f"min(event_id) OVER (PARTITION BY user_id, sess_no) AS session_id FROM s"
    )


def q_lineitem_pricing(sf_dir: str) -> str:
    # TPC-H Q1-shaped relational aggregate (generic engine surface)
    return (
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 6) AS sum_qty, "
        "round(sum(l_extendedprice), 4) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price, "
        "count(*)::BIGINT AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    )


ORACLE_BUILDERS.update(
    {
        "poly_perimeter": q_poly_perimeter,
        "densify_counts": q_densify_counts,
        "affine_bbox": q_affine_bbox,
        "ring_winding": q_ring_winding,
        "poly_validity": q_poly_validity,
        "asof_join": q_asof_join,
        "sessionize": q_sessionize,
        "lineitem_pricing": q_lineitem_pricing,
    }
)


# ---------------------------------------------------------------------------
# phase 3: text / similarity oracles
# ---------------------------------------------------------------------------

def q_lang_guess(sf_dir: str) -> str:
    # generated from georay.text.STOPWORDS — single source of truth for
    # both engines; argmax with lexicographic tie-break
    from .text import STOPWORDS

    toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    score_exprs = {}
    for lang, words in sorted(STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in words)
        score_exprs[lang] = (
            f"(len(list_filter({toks}, x -> x IN ({lst})))::DOUBLE / "
            f"GREATEST(len({toks}), 1))"
        )
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang in sorted(score_exprs)) + ")"
    case = "CASE WHEN trim(text) = '' OR " + best + " = 0 THEN 'und' "
    for lang in sorted(score_exprs):
        case += f"WHEN s_{lang} = {best} THEN '{lang}' "
    case += "ELSE 'und' END"
    selects = ", ".join(f"{expr} AS s_{lang}" for lang, expr in sorted(score_exprs.items()))
    return (
        f"WITH s AS (SELECT doc_id, text, {selects} FROM documents) "
        f"SELECT doc_id, {case} AS lang_guess FROM s"
    )


NGRAM_SAMPLE_MOD = 25
EMB_NEARDUP_T = 0.35  # synthetic embeddings: ~top-0.3% of random-pair cosines
EMB_DIM = 64


def q_embed_lsh_candidates(sf_dir: str) -> str:
    """The LSH CANDIDATE set recomputed exactly (r4, VERDICT r3 #8):
    hyperplane weights come from the datagen-exported planes parquet
    (dedup.lsh_planes is the single source), signs from a plain dot
    product per (vec, table, bit), bucket keys from the packed sign
    bits, candidates from a self-join on (table, key).  The final
    embed_neardup_lsh op stays recall<1 by design; its candidate stage
    no longer is."""
    planes = datagen.lsh_planes_path(sf_dir)
    return (
        f"WITH e AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v, "
        f"  generate_subscripts(embedding, 1) - 1 AS dim_idx FROM embeddings), "
        f"dot AS (SELECT e.vec_id, p.table_idx, p.bit_idx, "
        f"  sum(e.v * p.w) AS d "
        f"  FROM e JOIN read_parquet('{planes}') p ON p.dim_idx = e.dim_idx "
        f"  GROUP BY e.vec_id, p.table_idx, p.bit_idx), "
        f"keys AS (SELECT vec_id, table_idx, "
        f"  sum(CASE WHEN d > 0 THEN power(2, bit_idx)::BIGINT ELSE 0 END) AS k "
        f"  FROM dot GROUP BY vec_id, table_idx) "
        f"SELECT DISTINCT least(a.vec_id, b.vec_id) AS a, "
        f"greatest(a.vec_id, b.vec_id) AS b "
        f"FROM keys a JOIN keys b ON a.table_idx = b.table_idx "
        f"AND a.k = b.k AND a.vec_id < b.vec_id"
    )


ORACLE_BUILDERS["embed_lsh_candidates"] = q_embed_lsh_candidates


def q_embed_neardup_lsh(sf_dir: str) -> str:
    """The FINAL LSH near-dup op as an ALGORITHM-equality oracle (r5b,
    promoting the last rows-only LLM op): the q_embed_lsh_candidates
    bucket self-join composed with the exact cosine verify.  This does
    not claim recall 1 against the exact all-pairs set — the
    recall-vs-exact bound stays pytest-gated — it claims the engine
    computes exactly the algorithm it documents: verified pairs =
    candidates ∩ {cosine >= t}."""
    planes = datagen.lsh_planes_path(sf_dir)
    return (
        f"WITH e AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v, "
        f"  generate_subscripts(embedding, 1) - 1 AS dim_idx FROM embeddings), "
        f"dot AS (SELECT e.vec_id, p.table_idx, p.bit_idx, "
        f"  sum(e.v * p.w) AS d "
        f"  FROM e JOIN read_parquet('{planes}') p ON p.dim_idx = e.dim_idx "
        f"  GROUP BY e.vec_id, p.table_idx, p.bit_idx), "
        f"keys AS (SELECT vec_id, table_idx, "
        f"  sum(CASE WHEN d > 0 THEN power(2, bit_idx)::BIGINT ELSE 0 END) AS k "
        f"  FROM dot GROUP BY vec_id, table_idx), "
        f"cand AS (SELECT DISTINCT least(a.vec_id, b.vec_id) AS a, "
        f"  greatest(a.vec_id, b.vec_id) AS b "
        f"  FROM keys a JOIN keys b ON a.table_idx = b.table_idx "
        f"  AND a.k = b.k AND a.vec_id < b.vec_id) "
        f"SELECT c.a, c.b FROM cand c "
        f"JOIN embeddings ea ON ea.vec_id = c.a "
        f"JOIN embeddings eb ON eb.vec_id = c.b "
        f"WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {EMB_NEARDUP_T}"
    )


ORACLE_BUILDERS["embed_neardup_lsh"] = q_embed_neardup_lsh


def q_ngram_jaccard(sf_dir: str) -> str:
    # distinct char-3-gram Jaccard for a deterministic doc-pair sample;
    # pairs with zero overlap are omitted (inner join) on both sides
    return (
        f"WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % {NGRAM_SAMPLE_MOD} = 0), "
        f"e AS (SELECT doc_id, text, unnest(range(1, GREATEST(length(text) - 2, 0) + 1)) AS i FROM d), "
        f"g AS (SELECT DISTINCT doc_id, substr(text, i::INTEGER, 3) AS gram FROM e), "
        f"cnt AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id), "
        f"inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS ni "
        f"  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id "
        f"  GROUP BY a.doc_id, b.doc_id) "
        f"SELECT i.a, i.b, round(i.ni::DOUBLE / (ca.n + cb.n - i.ni), 6) AS jaccard "
        f"FROM inter i JOIN cnt ca ON ca.doc_id = i.a JOIN cnt cb ON cb.doc_id = i.b"
    )


def q_embed_neardup(sf_dir: str) -> str:
    return (
        f"SELECT a.vec_id AS a, b.vec_id AS b "
        f"FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        f"WHERE list_cosine_similarity(a.embedding, b.embedding) >= {EMB_NEARDUP_T}"
    )


ORACLE_BUILDERS.update(
    {
        "lang_guess": q_lang_guess,
        "ngram_jaccard": q_ngram_jaccard,
        "embed_neardup": q_embed_neardup,
        # the blocked triangle-join scale path computes the SAME pair
        # set as the broadcast validation path — one oracle, two engines
        "embed_neardup_blocked": q_embed_neardup,
    }
)


# ---------------------------------------------------------------------------
# phase 4: breadth-operator oracles (seg_idx-ordered SQL)
# ---------------------------------------------------------------------------

HAUS_A_MOD, HAUS_B_MOD = 10, 5


def q_poly_is_convex(sf_dir: str) -> str:
    # consecutive-segment cross-product signs over the exterior ring
    # (is_convex.rs): convex iff no two nonzero signs differ
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH s AS (SELECT polygon_id, seg_idx, x1, y1, x2, y2, "
        f"  count(*) OVER (PARTITION BY polygon_id) AS n "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0), "
        f"x AS (SELECT a.polygon_id, "
        f"  CASE WHEN (a.x2 - a.x1) * (b.y2 - b.y1) - (a.y2 - a.y1) * (b.x2 - b.x1) > 0 THEN 1 "
        f"       WHEN (a.x2 - a.x1) * (b.y2 - b.y1) - (a.y2 - a.y1) * (b.x2 - b.x1) < 0 THEN -1 "
        f"       ELSE 0 END AS s "
        f"  FROM s a JOIN s b ON a.polygon_id = b.polygon_id AND b.seg_idx = (a.seg_idx + 1) % a.n) "
        f"SELECT polygon_id, (max(CASE WHEN s = 1 THEN 1 ELSE 0 END) + "
        f"max(CASE WHEN s = -1 THEN 1 ELSE 0 END) <= 1) AS is_convex FROM x GROUP BY polygon_id"
    )


def q_closest_point_to_hot(sf_dir: str) -> str:
    # clamped projection onto each exterior segment; argmin by
    # (distance, seg_idx) — mirrors kernels.more.closest_point_on_segments
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH s AS (SELECT polygon_id, seg_idx, x1, y1, x2 - x1 AS dx, y2 - y1 AS dy "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0), "
        f"t AS (SELECT polygon_id, seg_idx, x1, y1, dx, dy, "
        f"  LEAST(GREATEST(CASE WHEN dx * dx + dy * dy > 0.0 "
        f"    THEN (({HOT_LON} - x1) * dx + ({HOT_LAT} - y1) * dy) / (dx * dx + dy * dy) "
        f"    ELSE 0.0 END, 0.0), 1.0) AS tt FROM s), "
        f"c AS (SELECT polygon_id, seg_idx, x1 + tt * dx AS cx, y1 + tt * dy AS cy FROM t), "
        f"r AS (SELECT polygon_id, cx, cy, "
        f"  sqrt(({HOT_LON} - cx) * ({HOT_LON} - cx) + ({HOT_LAT} - cy) * ({HOT_LAT} - cy)) AS dist, "
        f"  row_number() OVER (PARTITION BY polygon_id ORDER BY "
        f"  sqrt(({HOT_LON} - cx) * ({HOT_LON} - cx) + ({HOT_LAT} - cy) * ({HOT_LAT} - cy)), seg_idx) AS rn FROM c) "
        f"SELECT polygon_id, round(cx, 9) AS cx, round(cy, 9) AS cy, round(dist, 6) AS dist "
        f"FROM r WHERE rn = 1"
    )


def q_hausdorff_pairs(sf_dir: str) -> str:
    # symmetric pointwise max-min over exterior VERTEX sets
    # (hausdorff_distance.rs:28-55) for a deterministic polygon-pair sample
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH v AS (SELECT polygon_id, x1 AS x, y1 AS y FROM read_parquet('{segs}') WHERE ring_idx = 0), "
        f"pa AS (SELECT * FROM v WHERE CAST(substr(polygon_id, 6) AS BIGINT) % {HAUS_A_MOD} = 0), "
        f"pb AS (SELECT * FROM v WHERE CAST(substr(polygon_id, 6) AS BIGINT) % {HAUS_A_MOD} = {HAUS_B_MOD}), "
        f"dab AS (SELECT a.polygon_id AS a, b.polygon_id AS b, a.x AS ax, a.y AS ay, "
        f"  min(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))) AS dmin "
        f"  FROM pa a CROSS JOIN pb b GROUP BY a.polygon_id, b.polygon_id, a.x, a.y), "
        f"hab AS (SELECT a, b, max(dmin) AS h1 FROM dab GROUP BY a, b), "
        f"dba AS (SELECT a.polygon_id AS a, b.polygon_id AS b, b.x AS bx, b.y AS by, "
        f"  min(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))) AS dmin "
        f"  FROM pa a CROSS JOIN pb b GROUP BY a.polygon_id, b.polygon_id, b.x, b.y), "
        f"hba AS (SELECT a, b, max(dmin) AS h2 FROM dba GROUP BY a, b) "
        f"SELECT hab.a, hab.b, round(GREATEST(h1, h2), 6) AS hausdorff "
        f"FROM hab JOIN hba ON hab.a = hba.a AND hab.b = hba.b"
    )


def q_cd_area(sf_dir: str) -> str:
    # Chamberlain-Duquette spherical area per polygon exterior
    segs = datagen.segments_path(sf_dir)
    return (
        f"SELECT polygon_id, round(sum(radians(x2 - x1) * "
        f"(2.0 + sin(radians(y1)) + sin(radians(y2)))) * {R!r} * {R!r} / 2.0, 0) AS cd_area "
        f"FROM read_parquet('{segs}') WHERE ring_idx = 0 GROUP BY polygon_id"
    )


def q_earcut_area(sf_dir: str) -> str:
    # triangulation partitions the polygon: sum(|tri|) == |shoelace|
    segs = datagen.segments_path(sf_dir)
    return (
        f"SELECT polygon_id, round(abs(sum(x1 * y2 - x2 * y1)) / 2.0, 6) AS tri_area "
        f"FROM read_parquet('{segs}') WHERE ring_idx = 0 GROUP BY polygon_id"
    )


def q_line_locate_hot(sf_dir: str) -> str:
    # fraction-along-exterior-ring of the closest point to HOT
    # (line_locate_point.rs:38) — mirrors kernels.more.line_locate_point
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH s AS (SELECT polygon_id, seg_idx, x1, y1, x2 - x1 AS dx, y2 - y1 AS dy, "
        f"  sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS slen "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0), "
        f"w AS (SELECT *, sum(slen) OVER (PARTITION BY polygon_id ORDER BY seg_idx "
        f"    ROWS UNBOUNDED PRECEDING) - slen AS prior, "
        f"  sum(slen) OVER (PARTITION BY polygon_id) AS total, "
        f"  LEAST(GREATEST(CASE WHEN dx * dx + dy * dy > 0.0 "
        f"    THEN (({HOT_LON} - x1) * dx + ({HOT_LAT} - y1) * dy) / (dx * dx + dy * dy) "
        f"    ELSE 0.0 END, 0.0), 1.0) AS tt FROM s), "
        f"c AS (SELECT polygon_id, prior, total, tt, slen, "
        f"  ({HOT_LON} - (x1 + tt * dx)) * ({HOT_LON} - (x1 + tt * dx)) + "
        f"  ({HOT_LAT} - (y1 + tt * dy)) * ({HOT_LAT} - (y1 + tt * dy)) AS d2, seg_idx FROM w), "
        f"r AS (SELECT polygon_id, (prior + tt * slen) / total AS frac, "
        f"  row_number() OVER (PARTITION BY polygon_id ORDER BY d2, seg_idx) AS rn FROM c) "
        f"SELECT polygon_id, round(frac, 6) AS frac FROM r WHERE rn = 1"
    )


def q_wkt_roundtrip(sf_dir: str) -> str:
    # I/O check: ring + coord counts after WKT export/reparse must equal
    # the segment-table-derived counts
    segs = datagen.segments_path(sf_dir)
    return (
        f"SELECT polygon_id, count(DISTINCT ring_idx)::BIGINT AS n_rings, "
        f"(count(*) + count(DISTINCT ring_idx))::BIGINT AS n_coords "
        f"FROM read_parquet('{segs}') GROUP BY polygon_id"
    )


ORACLE_BUILDERS.update(
    {
        "poly_is_convex": q_poly_is_convex,
        "closest_point_to_hot": q_closest_point_to_hot,
        "hausdorff_pairs": q_hausdorff_pairs,
        "cd_area": q_cd_area,
        "earcut_area": q_earcut_area,
        "line_locate_hot": q_line_locate_hot,
        "wkt_roundtrip": q_wkt_roundtrip,
    }
)


# ---------------------------------------------------------------------------
# phase 5: cross-track oracle
# ---------------------------------------------------------------------------

XT_B_LON, XT_B_LAT = 30.0, 40.0  # arc end; arc start is the hot centre


def _bearing_expr(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Mirrors kernels.measures.haversine_bearing (degrees, [0, 360))."""
    return (
        f"((degrees(atan2(cos(radians({lat2})) * sin(radians(({lon2}) - ({lon1}))), "
        f"cos(radians({lat1})) * sin(radians({lat2})) - "
        f"sin(radians({lat1})) * cos(radians({lat2})) * cos(radians(({lon2}) - ({lon1}))))) "
        f"+ 360.0) % 360.0)"
    )


def q_cross_track(sf_dir: str) -> str:
    d13 = f"(({_hav_expr(str(HOT_LON), str(HOT_LAT), 'lon', 'lat')}) / {R!r})"
    t13 = f"radians({_bearing_expr(str(HOT_LON), str(HOT_LAT), 'lon', 'lat')})"
    t12 = f"radians({_bearing_expr(str(HOT_LON), str(HOT_LAT), str(XT_B_LON), str(XT_B_LAT))})"
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}) "
        f"SELECT image_id, round({R!r} * abs(asin(sin({d13}) * sin({t12} - {t13}))), 1) AS xt_m "
        f"FROM pts"
    )


ORACLE_BUILDERS["cross_track"] = q_cross_track


def q_poly_intersect_pairs(sf_dir: str) -> str:
    """Polygon-x-polygon intersects self-join: vertex-in-polygon parity
    (over all rings) OR strict edge crossing — the same decision
    procedure as georay.polyjoin (boundary-only touches measure-zero)."""
    polys = datagen.polygons_path(sf_dir)
    segs = datagen.segments_path(sf_dir)
    cross = (
        "sign((sa.x2 - sa.x1) * (sb.y1 - sa.y1) - (sa.y2 - sa.y1) * (sb.x1 - sa.x1)) * "
        "sign((sa.x2 - sa.x1) * (sb.y2 - sa.y1) - (sa.y2 - sa.y1) * (sb.x2 - sa.x1)) < 0 AND "
        "sign((sb.x2 - sb.x1) * (sa.y1 - sb.y1) - (sb.y2 - sb.y1) * (sa.x1 - sb.x1)) * "
        "sign((sb.x2 - sb.x1) * (sa.y2 - sb.y1) - (sb.y2 - sb.y1) * (sa.x2 - sb.x1)) < 0"
    )
    return (
        f"WITH p AS (SELECT polygon_id, minx, miny, maxx, maxy FROM read_parquet('{polys}')), "
        f"cand AS (SELECT a.polygon_id AS a, b.polygon_id AS b FROM p a JOIN p b "
        f"  ON a.polygon_id < b.polygon_id AND a.minx <= b.maxx AND a.maxx >= b.minx "
        f"  AND a.miny <= b.maxy AND a.maxy >= b.miny), "
        f"segs AS (SELECT * FROM read_parquet('{segs}')), "
        f"vin_ab AS (SELECT DISTINCT a, b FROM ("
        f"  SELECT c.a, c.b, v.x1, v.y1 FROM cand c "
        f"  JOIN segs v ON v.polygon_id = c.a "
        f"  JOIN segs s ON s.polygon_id = c.b "
        f"  WHERE ((s.y1 <= v.y1 AND s.y2 > v.y1) OR (s.y2 <= v.y1 AND s.y1 > v.y1)) "
        f"    AND v.x1 < s.x1 + (v.y1 - s.y1) * (s.x2 - s.x1) / (s.y2 - s.y1) "
        f"  GROUP BY c.a, c.b, v.x1, v.y1 HAVING count(*) % 2 = 1)), "
        f"vin_ba AS (SELECT DISTINCT a, b FROM ("
        f"  SELECT c.a, c.b, v.x1, v.y1 FROM cand c "
        f"  JOIN segs v ON v.polygon_id = c.b "
        f"  JOIN segs s ON s.polygon_id = c.a "
        f"  WHERE ((s.y1 <= v.y1 AND s.y2 > v.y1) OR (s.y2 <= v.y1 AND s.y1 > v.y1)) "
        f"    AND v.x1 < s.x1 + (v.y1 - s.y1) * (s.x2 - s.x1) / (s.y2 - s.y1) "
        f"  GROUP BY c.a, c.b, v.x1, v.y1 HAVING count(*) % 2 = 1)), "
        f"xcr AS (SELECT DISTINCT c.a, c.b FROM cand c "
        f"  JOIN segs sa ON sa.polygon_id = c.a JOIN segs sb ON sb.polygon_id = c.b "
        f"  WHERE {cross}) "
        f"SELECT DISTINCT a, b FROM (SELECT * FROM vin_ab UNION SELECT * FROM vin_ba "
        f"UNION SELECT * FROM xcr)"
    )


ORACLE_BUILDERS["poly_intersect_pairs"] = q_poly_intersect_pairs


def q_pip_semi_join(sf_dir: str) -> str:
    # images with at least one containing polygon (semi join)
    return (
        f"WITH pts AS ({_pip_pairs_cte(sf_dir)}) "
        f"SELECT DISTINCT image_id FROM hits"
    )


def q_pip_anti_join(sf_dir: str) -> str:
    # images with NO containing polygon (anti join)
    return (
        f"WITH pts AS ({_pip_pairs_cte(sf_dir)}) "
        f"SELECT p.image_id FROM pts p WHERE p.image_id NOT IN (SELECT image_id FROM hits)"
    )


ORACLE_BUILDERS.update({"pip_semi_join": q_pip_semi_join, "pip_anti_join": q_pip_anti_join})


def q_bool_pair_areas(sf_dir: str) -> str:
    """BooleanOps oracle via the inclusion-exclusion identity:
    |A∩B| + |A∪B| == |A| + |B| — the right side is SQL shoelace, the
    left is the engine's boolean_op output, so a hash match proves the
    clipper's areas are exact (same pair sample as hausdorff_pairs)."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH ar AS (SELECT polygon_id, abs(sum(x1 * y2 - x2 * y1)) / 2.0 AS area "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0 GROUP BY polygon_id), "
        f"pa AS (SELECT * FROM ar WHERE CAST(substr(polygon_id, 6) AS BIGINT) % {HAUS_A_MOD} = 0), "
        f"pb AS (SELECT * FROM ar WHERE CAST(substr(polygon_id, 6) AS BIGINT) % {HAUS_A_MOD} = {HAUS_B_MOD}) "
        f"SELECT a.polygon_id AS a, b.polygon_id AS b, round(a.area + b.area, 6) AS area_sum "
        f"FROM pa a CROSS JOIN pb b"
    )


ORACLE_BUILDERS["bool_pair_areas"] = q_bool_pair_areas


SLIDE_WINDOW_US = 3_600_000_000  # 1 h


def q_sliding_window(sf_dir: str) -> str:
    # per event: count + sum of the user's events in the trailing hour
    return (
        f"SELECT event_id, user_id, "
        f"count(*) OVER w::BIGINT AS n_in_window, "
        f"round(sum(value) OVER w, 6) AS sum_in_window "
        f"FROM events "
        f"WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) "
        f"RANGE BETWEEN {SLIDE_WINDOW_US} PRECEDING AND CURRENT ROW)"
    )


ORACLE_BUILDERS["sliding_window"] = q_sliding_window


def q_orient_normalize(sf_dir: str) -> str:
    """After Orient, every exterior is CCW (+1) and every hole CW (-1);
    the oracle recomputes the EXPECTED winding per ring plus the area
    magnitude (orientation must not change |area|)."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"SELECT polygon_id, ring_idx::BIGINT AS ring_idx, "
        f"CASE WHEN ring_idx = 0 THEN 1 ELSE -1 END::BIGINT AS winding, "
        f"round(abs(sum(x1 * y2 - x2 * y1)) / 2.0, 6) AS abs_area "
        f"FROM read_parquet('{segs}') GROUP BY polygon_id, ring_idx"
    )


ORACLE_BUILDERS["orient_normalize"] = q_orient_normalize


# ---------------------------------------------------------------------------
# buffer (round 2: kernels/buffer.py)
# ---------------------------------------------------------------------------

BUF_PT_SAMPLE_MOD = 10
BUF_POLY_D = 0.1
# BufferStyle.default_join_angle: f32 0.20 (buffer.rs:240-247)
BUF_QUANTUM = 0.20000000298023224


def q_buffer_point_area(sf_dir: str) -> str:
    # inscribed-32-gon circle area: (n/2) sin(2*pi/n) r^2 with n=32
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}) "
        f"SELECT image_id, "
        f"round(16.0 * sin(pi() / 16.0) * r * r, 6) AS buf_area, "
        f"32::BIGINT AS buf_nverts "
        f"FROM (SELECT image_id, 0.05 + (lat + 90.0) * 0.001 AS r FROM pts "
        f"      WHERE CAST(substr(image_id, 5) AS BIGINT) % {BUF_PT_SAMPLE_MOD} = 0)"
    )


def q_poly_buffer_convex(sf_dir: str) -> str:
    """Exact area identity for convex hole-free polygons: buffered area
    = A + P*d + sum over corners of the normal-anchored fan area with
    the JTS fillet rule n_i = floor(theta_i/quantum + 0.5), fan area
    n_i * d^2/2 * sin(theta_i/n_i) (bevel d^2/2*sin(theta) when n_i<1;
    convex => pieces are interior-disjoint so the identity is exact)."""
    segs = datagen.segments_path(sf_dir)
    d = BUF_POLY_D
    q = BUF_QUANTUM
    return (
        f"WITH s AS (SELECT polygon_id, seg_idx, x1, y1, x2, y2, "
        f"  count(*) OVER (PARTITION BY polygon_id) AS n "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0), "
        f"holed AS (SELECT DISTINCT polygon_id FROM read_parquet('{segs}') WHERE ring_idx > 0), "
        f"x AS (SELECT a.polygon_id, "
        f"  CASE WHEN (a.x2 - a.x1) * (b.y2 - b.y1) - (a.y2 - a.y1) * (b.x2 - b.x1) > 0 THEN 1 "
        f"       WHEN (a.x2 - a.x1) * (b.y2 - b.y1) - (a.y2 - a.y1) * (b.x2 - b.x1) < 0 THEN -1 "
        f"       ELSE 0 END AS sgn, "
        f"  atan2(abs((a.x2 - a.x1) * (b.y2 - b.y1) - (a.y2 - a.y1) * (b.x2 - b.x1)), "
        f"        (a.x2 - a.x1) * (b.x2 - b.x1) + (a.y2 - a.y1) * (b.y2 - b.y1)) AS theta "
        f"  FROM s a JOIN s b ON a.polygon_id = b.polygon_id "
        f"    AND b.seg_idx = (a.seg_idx + 1) % a.n), "
        f"conv AS (SELECT polygon_id, "
        f"  (max(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) + "
        f"   max(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) <= 1) AS is_convex, "
        f"  sum(CASE WHEN floor(theta / {q!r} + 0.5) < 1 "
        f"        THEN {d!r} * {d!r} / 2.0 * sin(theta) "
        f"        ELSE floor(theta / {q!r} + 0.5) * {d!r} * {d!r} / 2.0 * "
        f"             sin(theta / floor(theta / {q!r} + 0.5)) END) AS fan_area "
        f"  FROM x GROUP BY polygon_id), "
        f"ap AS (SELECT polygon_id, abs(sum(x1 * y2 - x2 * y1)) / 2.0 AS area, "
        f"  sum(sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))) AS perim "
        f"  FROM s GROUP BY polygon_id) "
        f"SELECT ap.polygon_id, round(ap.area + ap.perim * {d!r} + conv.fan_area, 6) AS buf_area "
        f"FROM ap JOIN conv ON ap.polygon_id = conv.polygon_id "
        f"WHERE conv.is_convex AND ap.polygon_id NOT IN (SELECT polygon_id FROM holed)"
    )


ORACLE_BUILDERS.update(
    {
        "buffer_point_area": q_buffer_point_area,
        "poly_buffer_convex": q_poly_buffer_convex,
    }
)


def q_relate_line_poly(sf_dir: str) -> str:
    """Oracle for the horizontal probe-line relate: the DE-9IM matrix of
    (line from bbox-left-minus-1 to bbox-x-mid at bbox-y-mid) vs the
    polygon is fully determined by the horizontal crossing parity —
    0 crossings left of mid-x -> no contact 'FF1FF0212'; odd ->
    endpoint lands inside '1010F0212' (BI=0); even>0 -> passes through
    and exits '101FF0212' (both endpoints outside)."""
    segs = datagen.segments_path(sf_dir)
    polys = datagen.polygons_path(sf_dir)
    return (
        f"WITH bb AS (SELECT polygon_id, (miny + maxy) / 2.0 AS c, "
        f"  (minx + maxx) / 2.0 AS midx FROM read_parquet('{polys}')), "
        f"xc AS (SELECT s.polygon_id, "
        f"  s.x1 + (bb.c - s.y1) * (s.x2 - s.x1) / (s.y2 - s.y1) AS x "
        f"  FROM read_parquet('{segs}') s JOIN bb ON s.polygon_id = bb.polygon_id "
        f"  WHERE (s.y1 <= bb.c AND s.y2 > bb.c) OR (s.y2 <= bb.c AND s.y1 > bb.c)), "
        f"agg AS (SELECT bb.polygon_id, "
        f"  count(CASE WHEN xc.x < bb.midx THEN 1 END) AS n_before "
        f"  FROM bb LEFT JOIN xc ON bb.polygon_id = xc.polygon_id GROUP BY bb.polygon_id) "
        f"SELECT polygon_id, "
        f"CASE WHEN n_before = 0 THEN 'FF1FF0212' "
        f"     WHEN n_before % 2 = 1 THEN '1010F0212' "
        f"     ELSE '101FF0212' END AS de9im, "
        f"(n_before > 0) AS crosses, (n_before > 0) AS intersects "
        f"FROM agg"
    )


ORACLE_BUILDERS["relate_line_poly"] = q_relate_line_poly


# ---------------------------------------------------------------------------
# round-2 breadth oracles
# ---------------------------------------------------------------------------

RHUMB_DEST_MOD = 10


def q_rhumb_dest_pts(sf_dir: str) -> str:
    """Loxodrome destination (rhumb/mod.rs:135-176 calculate_destination)
    replayed in SQL: bearing/distance derived from the point's coords."""
    R = 6371008.8
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}), "
        f"inp AS (SELECT image_id, radians(lon) AS lam1, radians(lat) AS phi1, "
        f"  radians((lat + 90.0) * 2.0 % 360.0) AS theta, "
        f"  (50000.0 + (lon + 180.0) * 500.0) / {R!r} AS delta "
        f"  FROM pts WHERE CAST(substr(image_id, 5) AS BIGINT) % {RHUMB_DEST_MOD} = 0), "
        f"s1 AS (SELECT *, delta * cos(theta) AS dphi, phi1 + delta * cos(theta) AS phi2r FROM inp), "
        f"s2 AS (SELECT *, CASE WHEN abs(phi2r) > pi() / 2 THEN "
        f"  CASE WHEN phi2r > 0 THEN pi() - phi2r ELSE -pi() - phi2r END ELSE phi2r END AS phi2 FROM s1), "
        f"s3 AS (SELECT *, ln(tan(phi2 / 2 + pi() / 4) / tan(phi1 / 2 + pi() / 4)) AS dpsi FROM s2), "
        f"s4 AS (SELECT *, CASE WHEN abs(dpsi) > 10.0e-12 THEN dphi / dpsi ELSE cos(phi1) END AS q FROM s3), "
        f"s5 AS (SELECT image_id, phi2, lam1 + (delta * sin(theta)) / q AS lam2 FROM s4) "
        f"SELECT image_id, "
        f"round((degrees(lam2) + 540.0) % 360.0 - 180.0, 6) AS dest_lon, "
        f"round(degrees(phi2), 6) AS dest_lat FROM s5"
    )


def q_segment_crossings(sf_dir: str) -> str:
    """Exhaustive self-join crossing oracle for the cell-partitioned
    sweep: proper crossings between exterior segments of DIFFERENT
    polygons, intersection point from the lexicographically smaller
    segment's parametrization (rounded past either side's float noise)."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH s AS (SELECT polygon_id || '#' || lpad(seg_idx::VARCHAR, 4, '0') AS sid, "
        f"  polygon_id, x1, y1, x2, y2 FROM read_parquet('{segs}') WHERE ring_idx = 0), "
        f"pairs AS (SELECT a.sid AS a, b.sid AS b, "
        f"  a.x1 AS ax1, a.y1 AS ay1, a.x2 AS ax2, a.y2 AS ay2, "
        f"  b.x1 AS bx1, b.y1 AS by1, b.x2 AS bx2, b.y2 AS by2 "
        f"  FROM s a JOIN s b ON a.sid < b.sid AND a.polygon_id <> b.polygon_id), "
        f"x AS (SELECT *, "
        f"  (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1) AS d1, "
        f"  (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1) AS d2, "
        f"  (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1) AS d3, "
        f"  (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1) AS d4 "
        f"  FROM pairs), "
        f"hit AS (SELECT * FROM x WHERE d1 * d2 < 0 AND d3 * d4 < 0), "
        f"pt AS (SELECT a, b, "
        f"  ((bx1 - ax1) * (by2 - by1) - (by1 - ay1) * (bx2 - bx1)) / "
        f"  ((ax2 - ax1) * (by2 - by1) - (ay2 - ay1) * (bx2 - bx1)) AS t, "
        f"  ax1, ay1, ax2, ay2 FROM hit) "
        f"SELECT a, b, round(ax1 + t * (ax2 - ax1), 6) AS ix, "
        f"round(ay1 + t * (ay2 - ay1), 6) AS iy FROM pt"
    )


def q_stitch_area(sf_dir: str) -> str:
    """Triangulate->stitch roundtrip must reproduce the exterior ring's
    shoelace area exactly (up to rounding)."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"SELECT polygon_id, round(abs(sum(x1 * y2 - x2 * y1)) / 2.0, 6) AS stitched_area "
        f"FROM read_parquet('{segs}') WHERE ring_idx = 0 GROUP BY polygon_id"
    )


ORACLE_BUILDERS.update(
    {
        "rhumb_dest_pts": q_rhumb_dest_pts,
        "segment_crossings": q_segment_crossings,
        "stitch_area": q_stitch_area,
    }
)


def q_interior_points(sf_dir: str) -> str:
    """Replay of the deterministic scanline rule (interior_point.rs /
    kernels.more.interior_point): y = bbox-mid over ALL rings, crossing
    xs sorted; sorted-order parity makes every odd-indexed gap interior,
    so the answer is the midpoint of the WIDEST odd gap (first wins)."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH ym AS (SELECT polygon_id, "
        f"  (least(min(y1), min(y2)) + greatest(max(y1), max(y2))) / 2.0 AS y FROM read_parquet('{segs}') "
        f"  GROUP BY polygon_id), "
        f"xc AS (SELECT s.polygon_id, ym.y, "
        f"  s.x1 + (ym.y - s.y1) / (s.y2 - s.y1) * (s.x2 - s.x1) AS x "
        f"  FROM read_parquet('{segs}') s JOIN ym ON s.polygon_id = ym.polygon_id "
        f"  WHERE (s.y1 <= ym.y AND s.y2 > ym.y) OR (s.y2 <= ym.y AND s.y1 > ym.y)), "
        f"ordered AS (SELECT polygon_id, y, x, "
        f"  row_number() OVER (PARTITION BY polygon_id ORDER BY x) AS rn FROM xc), "
        f"gaps AS (SELECT a.polygon_id, a.y, (a.x + b.x) / 2.0 AS mx, b.x - a.x AS w "
        f"  FROM ordered a JOIN ordered b ON a.polygon_id = b.polygon_id AND b.rn = a.rn + 1 "
        f"  WHERE a.rn % 2 = 1), "
        f"best AS (SELECT polygon_id, y, mx, "
        f"  row_number() OVER (PARTITION BY polygon_id ORDER BY w DESC, mx ASC) AS pick FROM gaps) "
        f"SELECT polygon_id, round(mx, 9) AS x, round(y, 9) AS y FROM best WHERE pick = 1"
    )


def q_mrr_area(sf_dir: str) -> str:
    """MinimumRotatedRect area oracle: the optimal direction aligns with
    a convex-hull edge, and every hull edge joins two polygon vertices,
    so min over ALL vertex-pair directions of the rotated-extent product
    reaches the same minimum (rotating calipers reaches a subset)."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH v AS (SELECT DISTINCT polygon_id, x1 AS x, y1 AS y "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0), "
        f"d AS (SELECT a.polygon_id, "
        f"  (b.x - a.x) / sqrt((b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)) AS nx, "
        f"  (b.y - a.y) / sqrt((b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)) AS ny "
        f"  FROM v a JOIN v b ON a.polygon_id = b.polygon_id "
        f"    AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))), "
        f"proj AS (SELECT d.polygon_id, d.nx, d.ny, "
        f"  (max(v.x * d.nx + v.y * d.ny) - min(v.x * d.nx + v.y * d.ny)) * "
        f"  (max(-v.x * d.ny + v.y * d.nx) - min(-v.x * d.ny + v.y * d.nx)) AS area "
        f"  FROM d JOIN v ON v.polygon_id = d.polygon_id GROUP BY d.polygon_id, d.nx, d.ny) "
        f"SELECT polygon_id, round(min(area), 6) AS mrr_area FROM proj GROUP BY polygon_id"
    )


ORACLE_BUILDERS.update(
    {"interior_points": q_interior_points, "mrr_area": q_mrr_area}
)


def q_tile_clip_sum(sf_dir: str) -> str:
    segs = datagen.segments_path(sf_dir)
    return (
        f"SELECT polygon_id, round(abs(sum(x1 * y2 - x2 * y1)) / 2.0, 6) AS clip_area_sum "
        f"FROM read_parquet('{segs}') WHERE ring_idx = 0 GROUP BY polygon_id"
    )


ORACLE_BUILDERS["tile_clip_sum"] = q_tile_clip_sum

ORACLE_BUILDERS["poly_intersect_pairs_shuffle"] = q_poly_intersect_pairs


# ---------------------------------------------------------------------------
# round-3 oracles: haversine interpolation family
# ---------------------------------------------------------------------------

HAV_INTERP_MOD = 10
HAV_DENSIFY_MAX_LEN = 20_000.0


def q_hav_interp_pts(sf_dir: str) -> str:
    """Replay of the great-circle slerp (haversine.rs:417-481
    HaversineIntermediateFillCalculation) in closed-form trig."""
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}), "
        f"inp AS (SELECT image_id, radians(lon) AS la1, radians(lat) AS ph1, "
        f"  radians({HOT_LON!r}) AS la2, radians({HOT_LAT!r}) AS ph2, "
        f"  (((CAST(substr(image_id, 5) AS BIGINT) // {HAV_INTERP_MOD}) % 9) + 1) / 10.0 AS r "
        f"  FROM pts WHERE CAST(substr(image_id, 5) AS BIGINT) % {HAV_INTERP_MOD} = 0), "
        f"s1 AS (SELECT *, 2.0 * asin(sqrt(pow(sin((ph1 - ph2) / 2.0), 2) + "
        f"  cos(ph1) * cos(ph2) * pow(sin((la1 - la2) / 2.0), 2))) AS d FROM inp), "
        f"s2 AS (SELECT *, sin((1.0 - r) * d) / sin(d) AS a, sin(r * d) / sin(d) AS b FROM s1), "
        f"s3 AS (SELECT image_id, "
        f"  a * cos(ph1) * cos(la1) + b * cos(ph2) * cos(la2) AS x, "
        f"  a * cos(ph1) * sin(la1) + b * cos(ph2) * sin(la2) AS y, "
        f"  a * sin(ph1) + b * sin(ph2) AS z FROM s2) "
        f"SELECT image_id, round(degrees(atan2(y, x)), 6) AS interp_lon, "
        f"round(degrees(atan2(z, sqrt(x * x + y * y))), 6) AS interp_lat FROM s3"
    )


def q_densify_hav_counts(sf_dir: str) -> str:
    """densify.rs:138-168 over the Haversine metric: per exterior-ring
    segment, ceil(hav_len / max) - 1 interior points."""
    segs = datagen.segments_path(sf_dir)
    hav = _hav_expr("x1", "y1", "x2", "y2")
    return (
        f"SELECT polygon_id, "
        f"(count(*) + sum(GREATEST(ceil(({hav}) / {HAV_DENSIFY_MAX_LEN!r}) - 1, 0)))::BIGINT "
        f"AS n_hav_densified_edges "
        f"FROM read_parquet('{segs}') WHERE ring_idx = 0 GROUP BY polygon_id"
    )


ORACLE_BUILDERS.update(
    {
        "hav_interp_pts": q_hav_interp_pts,
        "densify_hav_counts": q_densify_hav_counts,
    }
)


# ---------------------------------------------------------------------------
# line-layer joins + tile clip oracles
# ---------------------------------------------------------------------------

_LINE_CROSS = (
    "sign((sa.x2 - sa.x1) * (sb.y1 - sa.y1) - (sa.y2 - sa.y1) * (sb.x1 - sa.x1)) * "
    "sign((sa.x2 - sa.x1) * (sb.y2 - sa.y1) - (sa.y2 - sa.y1) * (sb.x2 - sa.x1)) < 0 AND "
    "sign((sb.x2 - sb.x1) * (sa.y1 - sb.y1) - (sb.y2 - sb.y1) * (sa.x1 - sb.x1)) * "
    "sign((sb.x2 - sb.x1) * (sa.y2 - sb.y1) - (sb.y2 - sb.y1) * (sa.x2 - sb.x1)) < 0"
)


def _line_join_ctes(sf_dir: str) -> str:
    """Shared CTEs: line bbox candidates, distinct line vertices with
    odd-parity (strictly inside) classification, strict edge
    crossings — mirrors linejoin._pair_bits / _line_poly_cross."""
    lines = datagen.lines_path(sf_dir)
    lsegs = datagen.line_segments_path(sf_dir)
    polys = datagen.polygons_path(sf_dir)
    segs = datagen.segments_path(sf_dir)
    return (
        f"l AS (SELECT line_id, minx, miny, maxx, maxy FROM read_parquet('{lines}')), "
        f"p AS (SELECT polygon_id, minx, miny, maxx, maxy FROM read_parquet('{polys}')), "
        f"ls AS (SELECT * FROM read_parquet('{lsegs}')), "
        f"segs AS (SELECT * FROM read_parquet('{segs}')), "
        f"lv AS (SELECT line_id, x1 AS x, y1 AS y FROM ls "
        f"       UNION SELECT line_id, x2, y2 FROM ls), "
        f"cand AS (SELECT l.line_id, p.polygon_id FROM l JOIN p "
        f"  ON l.minx <= p.maxx AND l.maxx >= p.minx "
        f"  AND l.miny <= p.maxy AND l.maxy >= p.miny), "
        f"vin_rows AS (SELECT c.line_id, c.polygon_id, v.x, v.y FROM cand c "
        f"  JOIN lv v ON v.line_id = c.line_id "
        f"  JOIN segs s ON s.polygon_id = c.polygon_id "
        f"  WHERE ((s.y1 <= v.y AND s.y2 > v.y) OR (s.y2 <= v.y AND s.y1 > v.y)) "
        f"    AND v.x < s.x1 + (v.y - s.y1) * (s.x2 - s.x1) / (s.y2 - s.y1) "
        f"  GROUP BY c.line_id, c.polygon_id, v.x, v.y HAVING count(*) % 2 = 1), "
        f"xcr AS (SELECT DISTINCT c.line_id, c.polygon_id FROM cand c "
        f"  JOIN ls sa ON sa.line_id = c.line_id "
        f"  JOIN segs sb ON sb.polygon_id = c.polygon_id "
        f"  WHERE {_LINE_CROSS})"
    )


def q_line_poly_intersects(sf_dir: str) -> str:
    return (
        f"WITH {_line_join_ctes(sf_dir)} "
        f"SELECT DISTINCT line_id, polygon_id FROM "
        f"(SELECT line_id, polygon_id FROM vin_rows UNION SELECT * FROM xcr)"
    )


def q_line_poly_crosses(sf_dir: str) -> str:
    return f"WITH {_line_join_ctes(sf_dir)} SELECT line_id, polygon_id FROM xcr"


def q_line_poly_within(sf_dir: str) -> str:
    return (
        f"WITH {_line_join_ctes(sf_dir)}, "
        f"vtot AS (SELECT line_id, count(*) AS nv FROM lv GROUP BY line_id), "
        f"vin_cnt AS (SELECT line_id, polygon_id, count(*) AS ni "
        f"  FROM vin_rows GROUP BY line_id, polygon_id) "
        f"SELECT c.line_id, c.polygon_id FROM vin_cnt c "
        f"JOIN vtot t ON t.line_id = c.line_id AND c.ni = t.nv "
        f"LEFT JOIN xcr x ON x.line_id = c.line_id AND x.polygon_id = c.polygon_id "
        f"WHERE x.line_id IS NULL"
    )


ORACLE_BUILDERS.update(
    {
        "line_poly_intersects": q_line_poly_intersects,
        "line_poly_crosses": q_line_poly_crosses,
        "line_poly_within": q_line_poly_within,
    }
)

LINE_TILE_DEG = 8.0


def q_line_tile_clip(sf_dir: str) -> str:
    """Liang-Barsky in SQL: per (segment, overlapped tile) the clipped
    parametric interval, summed per (line, tile) and rounded at 1e-6
    (identical formula order to linejoin.clip_segments_to_rect;
    degenerate axes via +-1e308 sentinels == the numpy +-inf)."""
    lsegs = datagen.line_segments_path(sf_dir)
    d = LINE_TILE_DEG
    return (
        f"WITH s AS (SELECT line_id, x1, y1, x2, y2 FROM read_parquet('{lsegs}')), "
        # static world-bounded tile axes (lon/lat extent / tile size);
        # DuckDB's generate_series cannot take lateral column args, so
        # the per-segment tile fan is a range join against these
        f"gx AS (SELECT tx FROM generate_series(-23, 22) AS gx(tx)), "
        f"gy AS (SELECT ty FROM generate_series(-12, 11) AS gy(ty)), "
        f"f AS (SELECT s.*, gx.tx AS tx, gy.ty AS ty FROM s "
        f"  JOIN gx ON gx.tx BETWEEN CAST(floor(least(x1, x2) / {d!r}) AS BIGINT) "
        f"                       AND CAST(floor(greatest(x1, x2) / {d!r}) AS BIGINT) "
        f"  JOIN gy ON gy.ty BETWEEN CAST(floor(least(y1, y2) / {d!r}) AS BIGINT) "
        f"                       AND CAST(floor(greatest(y1, y2) / {d!r}) AS BIGINT)), "
        f"t AS (SELECT line_id, tx, ty, "
        f"  CASE WHEN x2 = x1 THEN CASE WHEN x1 >= tx * {d!r} AND x1 <= (tx + 1) * {d!r} "
        f"    THEN -1e308 ELSE 1e308 END "
        f"    ELSE least((tx * {d!r} - x1) / (x2 - x1), ((tx + 1) * {d!r} - x1) / (x2 - x1)) END AS tx0, "
        f"  CASE WHEN x2 = x1 THEN CASE WHEN x1 >= tx * {d!r} AND x1 <= (tx + 1) * {d!r} "
        f"    THEN 1e308 ELSE -1e308 END "
        f"    ELSE greatest((tx * {d!r} - x1) / (x2 - x1), ((tx + 1) * {d!r} - x1) / (x2 - x1)) END AS tx1, "
        f"  CASE WHEN y2 = y1 THEN CASE WHEN y1 >= ty * {d!r} AND y1 <= (ty + 1) * {d!r} "
        f"    THEN -1e308 ELSE 1e308 END "
        f"    ELSE least((ty * {d!r} - y1) / (y2 - y1), ((ty + 1) * {d!r} - y1) / (y2 - y1)) END AS ty0, "
        f"  CASE WHEN y2 = y1 THEN CASE WHEN y1 >= ty * {d!r} AND y1 <= (ty + 1) * {d!r} "
        f"    THEN 1e308 ELSE -1e308 END "
        f"    ELSE greatest((ty * {d!r} - y1) / (y2 - y1), ((ty + 1) * {d!r} - y1) / (y2 - y1)) END AS ty1, "
        f"  sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS seg_len "
        f"  FROM f) "
        f"SELECT line_id, tx AS tile_x, ty AS tile_y, "
        f"round(sum(seg_len * greatest(least(tx1, ty1, 1.0) - greatest(tx0, ty0, 0.0), 0.0)), 6) AS len_in "
        f"FROM t GROUP BY line_id, tx, ty "
        f"HAVING sum(seg_len * greatest(least(tx1, ty1, 1.0) - greatest(tx0, ty0, 0.0), 0.0)) > 0"
    )


ORACLE_BUILDERS["line_tile_clip"] = q_line_tile_clip


# ---------------------------------------------------------------------------
# CRS transform oracles (kernels.crs closed forms re-evaluated in SQL)
# ---------------------------------------------------------------------------


def q_webmercator_pts(sf_dir: str) -> str:
    from .kernels.crs import MERC_R

    r = repr(MERC_R)
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}) "
        f"SELECT image_id, "
        f"round({r} * radians(lon), 2) AS merc_x, "
        f"round({r} * ln(tan(pi() / 4.0 + radians(lat) / 2.0)), 2) AS merc_y "
        f"FROM pts"
    )


def q_utm_pts(sf_dir: str) -> str:
    """Snyder forward series, identical expression tree to
    kernels.crs.lonlat_to_utm (constants interpolated from the same
    module; 0.1 m rounding vs ~1e-8 m cross-engine trig noise)."""
    from .kernels import crs

    a = repr(crs.WGS84_A)
    e2 = crs._E2
    ep2 = repr(crs._EP2)
    k0 = repr(crs.UTM_K0)
    c1 = repr(1.0 - e2 / 4.0 - 3.0 * e2**2 / 64.0 - 5.0 * e2**3 / 256.0)
    c2 = repr(3.0 * e2 / 8.0 + 3.0 * e2**2 / 32.0 + 45.0 * e2**3 / 1024.0)
    c3 = repr(15.0 * e2**2 / 256.0 + 45.0 * e2**3 / 1024.0)
    c4 = repr(35.0 * e2**3 / 3072.0)
    e2 = repr(e2)
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}), "
        f"z AS (SELECT image_id, lon, lat, "
        f"  ((CAST(floor((lon + 180.0) / 6.0) AS BIGINT) % 60) + 1) AS zone "
        f"  FROM pts), "
        f"b AS (SELECT image_id, zone, radians(lat) AS phi, "
        f"  radians(lon) - radians(zone * 6.0 - 183.0) AS dlam, "
        f"  sin(radians(lat)) AS sphi, cos(radians(lat)) AS cphi FROM z), "
        f"c AS (SELECT image_id, zone, phi, sphi, cphi, "
        f"  {a} / sqrt(1.0 - {e2} * sphi * sphi) AS n_rad, "
        f"  pow(sphi / cphi, 2) AS t, "
        f"  {ep2} * cphi * cphi AS c, "
        f"  dlam * cphi AS aa, "
        f"  {a} * ({c1} * phi - {c2} * sin(2.0 * phi) + {c3} * sin(4.0 * phi) "
        f"       - {c4} * sin(6.0 * phi)) AS m "
        f"  FROM b) "
        f"SELECT image_id, zone, "
        f"round({k0} * n_rad * (aa + (1.0 - t + c) * pow(aa, 3) / 6.0 "
        f"  + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * {ep2}) * pow(aa, 5) / 120.0) "
        f"  + 500000.0, 1) AS easting, "
        f"round({k0} * (m + n_rad * (sphi / cphi) * (aa * aa / 2.0 "
        f"  + (5.0 - t + 9.0 * c + 4.0 * c * c) * pow(aa, 4) / 24.0 "
        f"  + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * {ep2}) * pow(aa, 6) / 720.0)) "
        f"  + CASE WHEN phi < 0.0 THEN 10000000.0 ELSE 0.0 END, 1) AS northing "
        f"FROM c"
    )


ORACLE_BUILDERS.update(
    {
        "webmercator_pts": q_webmercator_pts,
        "utm_pts": q_utm_pts,
    }
)


WR_RADIUS_M = 500_000.0


def q_within_radius(sf_dir: str) -> str:
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}), "
        f"q AS (SELECT image_id AS qid, lon AS qlon, lat AS qlat FROM pts "
        f"  WHERE CAST(substr(image_id, 5) AS BIGINT) % {KNN_SAMPLE_MOD} = 0) "
        f"SELECT q.qid, p.image_id AS neighbor_id, "
        f"round({_hav_expr('q.qlon', 'q.qlat', 'p.lon', 'p.lat')}, 1) AS dist_m "
        f"FROM q CROSS JOIN pts p "
        f"WHERE p.image_id <> q.qid "
        f"AND {_hav_expr('q.qlon', 'q.qlat', 'p.lon', 'p.lat')} <= {WR_RADIUS_M!r}"
    )


ORACLE_BUILDERS["within_radius"] = q_within_radius


def q_geom_dimensions(sf_dir: str) -> str:
    """dimensions.rs counting rules in SQL: distinct exterior-ring
    vertices for polygons (segments ring_idx=0 starts), distinct path
    vertices + closed test for lines."""
    segs = datagen.segments_path(sf_dir)
    lsegs = datagen.line_segments_path(sf_dir)
    return (
        f"WITH pv AS (SELECT polygon_id, count(DISTINCT (x1, y1)) AS n "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0 GROUP BY polygon_id), "
        f"pd AS (SELECT polygon_id AS geom_id, "
        f"  CASE WHEN n = 1 THEN 0 WHEN n = 2 THEN 1 ELSE 2 END AS dims FROM pv), "
        f"lss AS (SELECT * FROM read_parquet('{lsegs}')), "
        f"lv AS (SELECT line_id, count(DISTINCT (x, y)) AS n FROM "
        f"  (SELECT line_id, x1 AS x, y1 AS y FROM lss "
        f"   UNION ALL SELECT line_id, x2, y2 FROM lss) GROUP BY line_id), "
        f"lends AS (SELECT s.line_id, "
        f"  first(x1 ORDER BY seg_idx) AS fx, first(y1 ORDER BY seg_idx) AS fy, "
        f"  last(x2 ORDER BY seg_idx) AS lx, last(y2 ORDER BY seg_idx) AS ly "
        f"  FROM lss s GROUP BY s.line_id), "
        f"ld AS (SELECT v.line_id AS geom_id, "
        f"  CASE WHEN v.n = 1 THEN 0 ELSE 1 END AS dims, "
        f"  (e.fx = e.lx AND e.fy = e.ly) AS closed "
        f"  FROM lv v JOIN lends e ON e.line_id = v.line_id) "
        f"SELECT geom_id, dims, "
        f"  CASE WHEN dims = 2 THEN 1 WHEN dims = 1 THEN 0 ELSE -1 END AS boundary_dims "
        f"FROM pd "
        f"UNION ALL "
        f"SELECT geom_id, dims, "
        f"  CASE WHEN closed OR dims = 0 THEN -1 ELSE 0 END AS boundary_dims "
        f"FROM ld"
    )


ORACLE_BUILDERS["geom_dimensions"] = q_geom_dimensions


def q_segment_vector_ops(sf_dir: str) -> str:
    lsegs = datagen.line_segments_path(sf_dir)
    return (
        f"WITH s AS (SELECT line_id, seg_idx, x2 - x1 AS ax, y2 - y1 AS ay, "
        f"  lead(x2 - x1) OVER w AS bx, lead(y2 - y1) OVER w AS by "
        f"  FROM read_parquet('{lsegs}') "
        f"  WINDOW w AS (PARTITION BY line_id ORDER BY seg_idx)) "
        f"SELECT line_id, seg_idx, "
        f"round(ax * bx + ay * by, 9) AS dot, "
        f"round(ax * by - ay * bx, 9) AS wedge, "
        f"round(sqrt(ax * ax + ay * ay), 9) AS mag_in "
        f"FROM s WHERE bx IS NOT NULL"
    )


ORACLE_BUILDERS["segment_vector_ops"] = q_segment_vector_ops


def q_frechet_pairs(sf_dir: str) -> str:
    """Discrete Frechet DP as a recursive anti-diagonal CTE (r3):
    working set carries two diagonals (age 0 = newest, age 1 =
    previous); each new cell (i,j) takes min over its three
    predecessors via one grouped scan, then max with the local
    distance — the exact frechet_distance.rs recurrence.  Rings are
    the CLOSED exterior rings (duplicate endpoint), matching
    kernels.more.frechet_distance input."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH RECURSIVE "
        f"s AS (SELECT polygon_id, seg_idx, x1, y1 FROM read_parquet('{segs}') "
        f"  WHERE ring_idx = 0), "
        f"nv AS (SELECT polygon_id, count(*) AS k FROM s GROUP BY polygon_id), "
        # closed ring: vertices 0..k (vertex k duplicates vertex 0)
        f"v AS (SELECT polygon_id, seg_idx AS i, x1 AS x, y1 AS y FROM s "
        f"  UNION ALL SELECT s.polygon_id, nv.k, s.x1, s.y1 FROM s "
        f"  JOIN nv ON nv.polygon_id = s.polygon_id WHERE s.seg_idx = 0), "
        f"pa AS (SELECT * FROM v WHERE CAST(substr(polygon_id, 6) AS BIGINT) % {HAUS_A_MOD} = 0), "
        f"pb AS (SELECT * FROM v WHERE CAST(substr(polygon_id, 6) AS BIGINT) % {HAUS_A_MOD} = {HAUS_B_MOD}), "
        f"d AS (SELECT pa.polygon_id AS a, pb.polygon_id AS b, pa.i AS i, pb.i AS j, "
        f"  sqrt((pa.x - pb.x) * (pa.x - pb.x) + (pa.y - pb.y) * (pa.y - pb.y)) AS dist "
        f"  FROM pa JOIN pb ON true), "
        f"dp(a, b, i, j, ca, age) AS ("
        f"  SELECT a, b, i, j, dist, 0 FROM d WHERE i = 0 AND j = 0 "
        f"  UNION ALL ("
        f"    SELECT n.a, n.b, n.i, n.j, greatest(d.dist, n.pmin), 0 "
        f"    FROM (SELECT a, b, i + di AS i, j + dj AS j, min(ca) AS pmin "
        f"          FROM dp, (VALUES (1, 0, 0), (0, 1, 0), (1, 1, 1)) AS o(di, dj, na) "
        f"          WHERE age = na GROUP BY a, b, i + di, j + dj) n "
        f"    JOIN d ON d.a = n.a AND d.b = n.b AND d.i = n.i AND d.j = n.j "
        f"    UNION ALL "
        f"    SELECT a, b, i, j, ca, 1 FROM dp WHERE age = 0)) "
        f"SELECT dp.a, dp.b, round(dp.ca, 6) AS frechet FROM dp "
        f"JOIN nv na ON na.polygon_id = dp.a JOIN nv nb ON nb.polygon_id = dp.b "
        f"WHERE dp.age = 0 AND dp.i = na.k AND dp.j = nb.k"
    )


ORACLE_BUILDERS["frechet_pairs"] = q_frechet_pairs


def q_doc_fingerprints(sf_dir: str) -> str:
    """Winnowing in SQL (r3): k-gram md5-prefix hashes, rightmost-min
    per w-window via a packed (hash, reversed-position) key and a
    window MIN, DISTINCT positions == the consecutive-dedup rule
    (picked positions are non-decreasing).  k=5, w=4 as in
    georay.text.winnow_fingerprints."""
    B = 4294967296
    return (
        f"WITH d0 AS (SELECT doc_id, text, length(text) AS n FROM documents), "
        f"ser AS (SELECT unnest(range(0, (SELECT coalesce(max(n), 1) FROM d0))) AS i), "
        f"g AS (SELECT d.doc_id, s.i, "
        f"  ('0x' || substr(md5(substr(d.text, s.i + 1, 5)), 1, 8))::BIGINT AS h "
        f"  FROM d0 d JOIN ser s ON s.i <= d.n - 5 WHERE d.n >= 5), "
        f"gn AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id), "
        f"key AS (SELECT doc_id, i, h, "
        f"  h::HUGEINT * {B} + ({B - 1} - i) AS k FROM g), "
        f"win AS (SELECT doc_id, i, "
        f"  min(k) OVER (PARTITION BY doc_id ORDER BY i "
        f"    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wk FROM key), "
        f"big AS (SELECT doc_id, count(*)::BIGINT AS n_fingerprints, min(h) AS min_fp FROM "
        f"  (SELECT DISTINCT w.doc_id, {B - 1} - (w.wk % {B})::BIGINT AS pos, "
        f"     (w.wk // {B})::BIGINT AS h "
        f"   FROM win w JOIN gn ON gn.doc_id = w.doc_id AND gn.ng > 4 "
        f"   WHERE w.i <= gn.ng - 4) GROUP BY doc_id), "
        f"one AS (SELECT k.doc_id, 1::BIGINT, (min(k.k) // {B})::BIGINT "
        f"  FROM key k JOIN gn ON gn.doc_id = k.doc_id AND gn.ng <= 4 GROUP BY k.doc_id), "
        f"tiny AS (SELECT doc_id, 1::BIGINT, ('0x' || substr(md5(text), 1, 8))::BIGINT "
        f"  FROM d0 WHERE n > 0 AND n < 5), "
        f"zero AS (SELECT doc_id, 0::BIGINT, 0::BIGINT FROM d0 WHERE n = 0) "
        f"SELECT * FROM big UNION ALL SELECT * FROM one "
        f"UNION ALL SELECT * FROM tiny UNION ALL SELECT * FROM zero"
    )


ORACLE_BUILDERS["doc_fingerprints"] = q_doc_fingerprints


RDP_EPS = 0.05


def q_simplify_rdp(sf_dir: str) -> str:
    """RDP as a recursive interval CTE (r3): each round computes every
    open interval's farthest vertex (row_number over d DESC, i ASC ==
    np.argmax first-max tie rule) and splits where d > eps.  Kept
    vertices = 2 endpoints + one per split, so n_after = 2 + splits.
    The top interval of a CLOSED ring has seg == 0 -> distance to the
    endpoint (kernels/simplify.py:36-39)."""
    segs = datagen.segments_path(sf_dir)
    e = RDP_EPS
    return (
        f"WITH RECURSIVE "
        f"s AS (SELECT polygon_id, seg_idx, x1, y1 FROM read_parquet('{segs}') "
        f"  WHERE ring_idx = 0), "
        f"nv AS (SELECT polygon_id, count(*) AS k FROM s GROUP BY polygon_id), "
        f"v AS (SELECT polygon_id, seg_idx AS i, x1 AS x, y1 AS y FROM s "
        f"  UNION ALL SELECT s.polygon_id, nv.k, s.x1, s.y1 FROM s "
        f"  JOIN nv ON nv.polygon_id = s.polygon_id WHERE s.seg_idx = 0), "
        f"iv(pid, a, b) AS ("
        f"  SELECT polygon_id, 0, k FROM nv "
        f"  UNION ALL ("
        f"  WITH cand AS ("
        f"    SELECT w.pid, w.a, w.b, vi.i, "
        f"      CASE WHEN va.x = vb.x AND va.y = vb.y "
        f"        THEN sqrt((vi.x - va.x) * (vi.x - va.x) + (vi.y - va.y) * (vi.y - va.y)) "
        f"        ELSE abs((vb.x - va.x) * (va.y - vi.y) - (va.x - vi.x) * (vb.y - va.y)) "
        f"             / sqrt((vb.x - va.x) * (vb.x - va.x) + (vb.y - va.y) * (vb.y - va.y)) "
        f"      END AS d "
        f"    FROM iv w "
        f"    JOIN v va ON va.polygon_id = w.pid AND va.i = w.a "
        f"    JOIN v vb ON vb.polygon_id = w.pid AND vb.i = w.b "
        f"    JOIN v vi ON vi.polygon_id = w.pid AND vi.i > w.a AND vi.i < w.b "
        f"    WHERE w.b - w.a >= 2), "
        f"  best AS (SELECT * FROM ("
        f"    SELECT pid, a, b, i, d, "
        f"      row_number() OVER (PARTITION BY pid, a, b ORDER BY d DESC, i ASC) AS rn "
        f"    FROM cand) WHERE rn = 1 AND d > {e!r}) "
        f"  SELECT pid, CASE WHEN o.side = 0 THEN a ELSE i END, "
        f"         CASE WHEN o.side = 0 THEN i ELSE b END "
        f"  FROM best, (VALUES (0), (1)) AS o(side))) "
        f"SELECT nv.polygon_id, (nv.k + 1)::BIGINT AS n_before, "
        f"  (2 + (count(*) - 1) // 2)::BIGINT AS n_after "
        f"FROM iv JOIN nv ON nv.polygon_id = iv.pid "
        f"GROUP BY nv.polygon_id, nv.k"
    )


ORACLE_BUILDERS["simplify_rdp"] = q_simplify_rdp


def q_hav_closest_line(sf_dir: str) -> str:
    """HaversineClosestPoint in SQL (r3): cross-track projection when
    both course differences face inward, else nearest endpoint —
    identical expression order to kernels.measures.haversine_closest_point
    including the double degree<->radian round-trips, floor-mod
    longitude normalization and the first-min tie rule."""
    from .queries import HCP_LINE, RHUMB_DEST_MOD

    R = 6_371_008.8
    segs_vals = ", ".join(
        f"({i}, {HCP_LINE[i][0]!r}, {HCP_LINE[i][1]!r}, {HCP_LINE[i+1][0]!r}, {HCP_LINE[i+1][1]!r})"
        for i in range(len(HCP_LINE) - 1)
    )

    def brg(lon1, lat1, lon2, lat2):
        # radians((degrees(atan2(s, c)) + 360) % 360) with the numpy
        # positive-range fmod (arguments are positive, so % is safe)
        s = f"cos(radians({lat2})) * sin(radians({lon2}) - radians({lon1}))"
        c = (
            f"cos(radians({lat1})) * sin(radians({lat2})) - "
            f"sin(radians({lat1})) * cos(radians({lat2})) * cos(radians({lon2}) - radians({lon1}))"
        )
        return f"radians(fmod(degrees(atan2({s}, {c})) + 360.0, 360.0))"

    hav = _hav_expr
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}), "
        f"q AS (SELECT image_id, lon, lat FROM pts "
        f"  WHERE CAST(substr(image_id, 5) AS BIGINT) % {RHUMB_DEST_MOD} = 0), "
        f"sg AS (SELECT * FROM (VALUES {segs_vals}) AS t(seg, ax, ay, bx, by)), "
        f"c1 AS (SELECT q.image_id, q.lon, q.lat, sg.seg, sg.ax, sg.ay, sg.bx, sg.by, "
        f"  {brg('sg.ax', 'sg.ay', 'q.lon', 'q.lat')} AS crs_ad, "
        f"  {brg('sg.ax', 'sg.ay', 'sg.bx', 'sg.by')} AS crs_ab, "
        f"  {brg('sg.bx', 'sg.by', 'sg.ax', 'sg.ay')} AS crs_ba, "
        f"  {brg('sg.bx', 'sg.by', 'q.lon', 'q.lat')} AS crs_bd, "
        f"  {hav('sg.ax', 'sg.ay', 'q.lon', 'q.lat')} AS d1, "
        f"  {hav('sg.bx', 'sg.by', 'q.lon', 'q.lat')} AS d2 "
        f"  FROM q CROSS JOIN sg), "
        f"c2 AS (SELECT *, "
        f"  abs(asin(greatest(least(sin(d1 / {R!r}) * sin(crs_ad - crs_ab), 1.0), -1.0))) AS xtd "
        f"  FROM c1), "
        f"c3 AS (SELECT *, "
        f"  {R!r} * abs(acos(greatest(least(cos(d1 / {R!r}) / "
        f"    (CASE WHEN cos(xtd) = 0 THEN 1.0 ELSE cos(xtd) END), 1.0), -1.0))) AS atd "
        f"  FROM c2), "
        f"c4 AS (SELECT *, "
        f"  radians(degrees(crs_ab)) AS theta, atd / {R!r} AS rad, radians(ay) AS phi1 "
        f"  FROM c3), "
        f"c5 AS (SELECT *, "
        f"  asin(sin(phi1) * cos(rad) + cos(phi1) * sin(rad) * cos(theta)) AS phi2 "
        f"  FROM c4), "
        f"c6 AS (SELECT *, "
        f"  degrees(atan2(sin(theta) * sin(rad) * cos(phi1), "
        f"                cos(rad) - sin(phi1) * sin(phi2)) + radians(ax)) AS lon2r "
        f"  FROM c5), "
        f"c7 AS (SELECT *, "
        f"  (lon2r + 180.0) - floor((lon2r + 180.0) / 360.0) * 360.0 - 180.0 AS plon, "
        f"  degrees(phi2) AS plat, "
        f"  (cos(crs_ad - crs_ab) >= 0 AND cos(crs_bd - crs_ba) >= 0) AS inward "
        f"  FROM c6), "
        f"c8 AS (SELECT image_id, lon, lat, seg, "
        f"  CASE WHEN inward THEN plon WHEN d1 < d2 THEN ax ELSE bx END AS cx, "
        f"  CASE WHEN inward THEN plat WHEN d1 < d2 THEN ay ELSE by END AS cy "
        f"  FROM c7), "
        f"c9 AS (SELECT image_id, cx, cy, {hav('cx', 'cy', 'lon', 'lat')} AS dist, "
        f"  row_number() OVER (PARTITION BY image_id ORDER BY {hav('cx', 'cy', 'lon', 'lat')} ASC, seg ASC) AS rn "
        f"  FROM c8) "
        f"SELECT image_id, round(cx, 6) AS cx, round(cy, 6) AS cy, "
        f"round(dist, 3) AS dist_m FROM c9 WHERE rn = 1"
    )


ORACLE_BUILDERS["hav_closest_line"] = q_hav_closest_line


def q_poly_hull(sf_dir: str) -> str:
    """Convex hull in SQL (r3): directed edge (u, w) is a hull edge iff
    every other vertex is strictly left of it, or collinear AND
    strictly between u and w (strict hull — collinear boundary points
    excluded, matching qhull.rs).  hull_n = number of hull edges;
    hull area = shoelace sum over the edge cycle (order-free)."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH v AS (SELECT polygon_id, seg_idx AS i, x1 AS x, y1 AS y "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0), "
        f"e AS (SELECT u.polygon_id, u.i AS ui, w.i AS wi, "
        f"  u.x AS ux, u.y AS uy, w.x AS wx, w.y AS wy "
        f"  FROM v u JOIN v w ON w.polygon_id = u.polygon_id AND w.i <> u.i), "
        f"hull_e AS (SELECT e.* FROM e WHERE NOT EXISTS ("
        f"  SELECT 1 FROM v p WHERE p.polygon_id = e.polygon_id "
        f"    AND p.i <> e.ui AND p.i <> e.wi "
        f"    AND NOT ((e.wx - e.ux) * (p.y - e.uy) - (e.wy - e.uy) * (p.x - e.ux) > 0 "
        f"      OR ((e.wx - e.ux) * (p.y - e.uy) - (e.wy - e.uy) * (p.x - e.ux) = 0 "
        f"        AND (p.x - e.ux) * (e.wx - e.ux) + (p.y - e.uy) * (e.wy - e.uy) > 0 "
        f"        AND (p.x - e.wx) * (e.ux - e.wx) + (p.y - e.wy) * (e.uy - e.wy) > 0)))) "
        f"SELECT polygon_id, count(*)::BIGINT AS hull_n, "
        f"round(sum(ux * wy - wx * uy) / 2.0, 6) AS hull_area "
        f"FROM hull_e GROUP BY polygon_id"
    )


ORACLE_BUILDERS["poly_hull"] = q_poly_hull


DBSCAN_EPS = 0.5
DBSCAN_MIN_PTS = 5


def q_dbscan_hot(sf_dir: str) -> str:
    """DBSCAN in SQL (r3): eps-grid equi-join for neighbor pairs
    (count includes self, core = count >= min_pts), recursive
    min-core-id label propagation over core-core edges (pruned to
    downward-moving labels), border points take the min final label of
    their core neighbors, noise = ''."""
    e = DBSCAN_EPS
    return (
        f"WITH RECURSIVE pts AS ({_pts_cte(sf_dir)}), "
        f"g AS (SELECT image_id, lon, lat, "
        f"  CAST(floor(lon / {e!r}) AS BIGINT) AS cx, "
        f"  CAST(floor(lat / {e!r}) AS BIGINT) AS cy FROM pts), "
        f"pairs AS (SELECT a.image_id AS ia, b.image_id AS ib "
        f"  FROM g a JOIN g b ON b.cx BETWEEN a.cx - 1 AND a.cx + 1 "
        f"    AND b.cy BETWEEN a.cy - 1 AND a.cy + 1 "
        f"    AND (b.lon - a.lon) * (b.lon - a.lon) + (b.lat - a.lat) * (b.lat - a.lat) "
        f"        <= {e * e!r}), "
        f"core AS (SELECT ia AS id FROM pairs GROUP BY ia "
        f"  HAVING count(*) >= {DBSCAN_MIN_PTS}), "
        f"ce AS (SELECT p.ia, p.ib FROM pairs p "
        f"  JOIN core c1 ON c1.id = p.ia JOIN core c2 ON c2.id = p.ib), "
        f"reach(id, lbl) AS ("
        f"  SELECT id, id FROM core "
        f"  UNION "
        f"  SELECT e.ib, r.lbl FROM reach r JOIN ce e ON e.ia = r.id "
        f"  WHERE r.lbl < e.ib), "
        f"lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id), "
        f"border AS (SELECT p.ia AS id, min(l.lbl) AS lbl FROM pairs p "
        f"  JOIN lab l ON l.id = p.ib AND p.ib <> p.ia "
        f"  WHERE p.ia NOT IN (SELECT id FROM core) GROUP BY p.ia) "
        f"SELECT pts.image_id, "
        f"  coalesce(lab.lbl, border.lbl, '') AS cluster, "
        f"  (lab.id IS NOT NULL) AS is_core "
        f"FROM pts LEFT JOIN lab ON lab.id = pts.image_id "
        f"LEFT JOIN border ON border.id = pts.image_id"
    )


ORACLE_BUILDERS["dbscan_hot"] = q_dbscan_hot


def q_vincenty_to_hot(sf_dir: str) -> str:
    """Vincenty inverse as a per-point recursive fixed-point CTE (r3):
    state = (lam, lamP, n); the converged row's output quantities
    derive from lamP — exactly the Python loop, which breaks AFTER
    computing the iteration's trig from the OLD lambda
    (kernels/measures.py:144-165).  Non-converged rows (n=100) surface
    as NULL like the reference Err; sinSigma == 0 short-circuits to
    0.0 (coincident points)."""
    from .kernels.measures import (
        EARTH_FLATTENING,
        EQUATORIAL_EARTH_RADIUS,
        POLAR_EARTH_RADIUS,
    )

    a, bb, f = EQUATORIAL_EARTH_RADIUS, POLAR_EARTH_RADIUS, EARTH_FLATTENING

    def trig(lam: str) -> str:
        """Columns sinSigma/cosSigma/sigma/sinAlpha/cosSqAlpha/
        cos2SigmaM/C derived from a lambda column, as chained selects."""
        return (
            f"SELECT *, sin({lam}) AS sinL, cos({lam}) AS cosL FROM __IN__ "
            f"), t2 AS (SELECT *, "
            f"sqrt((cosU2 * sinL) * (cosU2 * sinL) + "
            f"  (cosU1 * sinU2 - sinU1 * cosU2 * cosL) * (cosU1 * sinU2 - sinU1 * cosU2 * cosL)) AS sinSigma, "
            f"sinU1 * sinU2 + cosU1 * cosU2 * cosL AS cosSigma FROM t1 "
            f"), t3 AS (SELECT *, atan2(sinSigma, cosSigma) AS sigma, "
            f"CASE WHEN sinSigma = 0 THEN 0.0 ELSE cosU1 * cosU2 * sinL / sinSigma END AS sinAlpha FROM t2 "
            f"), t4 AS (SELECT *, 1.0 - sinAlpha * sinAlpha AS cosSqAlpha FROM t3 "
            f"), t5 AS (SELECT *, "
            f"CASE WHEN cosSqAlpha <> 0 THEN cosSigma - 2.0 * sinU1 * sinU2 / cosSqAlpha ELSE 0.0 END AS cos2SigmaM, "
            f"{f!r} / 16.0 * cosSqAlpha * (4.0 + {f!r} * (4.0 - 3.0 * cosSqAlpha)) AS C FROM t4"
        )

    return (
        f"WITH RECURSIVE pts AS ({_pts_cte(sf_dir)}), "
        f"base AS (SELECT image_id, radians({HOT_LON!r} - lon) AS L, "
        f"  sin(atan((1.0 - {f!r}) * tan(radians(lat)))) AS sinU1, "
        f"  cos(atan((1.0 - {f!r}) * tan(radians(lat)))) AS cosU1, "
        f"  sin(atan((1.0 - {f!r}) * tan(radians({HOT_LAT!r})))) AS sinU2, "
        f"  cos(atan((1.0 - {f!r}) * tan(radians({HOT_LAT!r})))) AS cosU2 "
        f"  FROM pts), "
        f"it(image_id, L, sinU1, cosU1, sinU2, cosU2, lam, lamP, n, zero) AS ("
        f"  SELECT image_id, L, sinU1, cosU1, sinU2, cosU2, L, NULL::DOUBLE, 0, false FROM base "
        f"  UNION ALL ("
        f"  WITH live AS (SELECT * FROM it "
        f"    WHERE NOT zero AND n < 100 AND (n = 0 OR abs(lam - lamP) > 1e-12)), "
        f"  t1 AS ({trig('lam').replace('__IN__', 'live')}) "
        f"  SELECT image_id, L, sinU1, cosU1, sinU2, cosU2, "
        f"    CASE WHEN sinSigma = 0 THEN lam ELSE "
        f"    L + (1.0 - C) * {f!r} * sinAlpha * (sigma + C * sinSigma * "
        f"      (cos2SigmaM + C * cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM))) END, "
        f"    lam, n + 1, sinSigma = 0 FROM t5)), "
        f"fin AS (SELECT *, row_number() OVER (PARTITION BY image_id ORDER BY n) AS rn FROM it "
        f"  WHERE zero OR (n > 0 AND abs(lam - lamP) <= 1e-12)), "
        f"sel AS (SELECT * FROM fin WHERE rn = 1), "
        f"t1 AS ({trig('lamP').replace('__IN__', 'sel')}), "
        f"d1 AS (SELECT *, cosSqAlpha * ({a * a - bb * bb!r}) / ({bb * bb!r}) AS uSq FROM t5), "
        f"d2 AS (SELECT *, "
        f"  1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq))) AS bigA, "
        f"  uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq))) AS bigB FROM d1), "
        f"d3 AS (SELECT *, "
        f"  bigB * sinSigma * (cos2SigmaM + bigB / 4.0 * (cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM) "
        f"    - bigB / 6.0 * cos2SigmaM * (-3.0 + 4.0 * sinSigma * sinSigma) "
        f"    * (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM))) AS deltaSigma FROM d2) "
        f"SELECT p.image_id, "
        f"  CASE WHEN d3.zero THEN 0.0 "
        f"       WHEN d3.image_id IS NULL THEN NULL "
        f"       ELSE round({bb!r} * d3.bigA * (d3.sigma - d3.deltaSigma), 1) END AS vincenty_m "
        f"FROM pts p LEFT JOIN d3 ON d3.image_id = p.image_id"
    )


ORACLE_BUILDERS["vincenty_to_hot"] = q_vincenty_to_hot


KMEANS_K = 16
KMEANS_MAX_ITER = 5


def q_kmeans_assign(sf_dir: str) -> str:
    """Lloyd iterations as a recursive CTE with per-round aggregates
    (r3): seeds = first k stride-sampled ids (cluster index = seed
    rank), each round reassigns by argmin (d2, cluster) and averages,
    empty clusters keep their centroid, stop at max_iter or when the
    max centroid shift drops below tolerance 1e-4 — mirroring
    georay.cluster.kmeans."""
    k, mi = KMEANS_K, KMEANS_MAX_ITER
    return (
        f"WITH RECURSIVE pts AS ({_pts_cte(sf_dir)}), "
        f"n AS (SELECT count(*) AS n FROM pts), "
        f"seeds AS (SELECT image_id, lon, lat FROM pts "
        f"  WHERE CAST(substr(image_id, 5) AS BIGINT) % "
        f"    (SELECT greatest(n // {k}, 1) FROM n) = 0 "
        f"  ORDER BY image_id LIMIT {k}), "
        f"cent(r, cluster, cx, cy, stop) AS ("
        f"  SELECT 0, row_number() OVER (ORDER BY image_id) - 1, lon, lat, false FROM seeds "
        f"  UNION ALL ("
        f"  WITH cur AS (SELECT * FROM cent WHERE r < {mi} AND NOT stop), "
        f"  asg AS (SELECT p.image_id, p.lon, p.lat, c.cluster, "
        f"    row_number() OVER (PARTITION BY p.image_id ORDER BY "
        f"      (p.lon - c.cx) * (p.lon - c.cx) + (p.lat - c.cy) * (p.lat - c.cy), c.cluster) AS rn "
        f"    FROM pts p CROSS JOIN cur c), "
        f"  agg AS (SELECT cluster, sum(lon) AS sx, sum(lat) AS sy, count(*) AS cnt "
        f"    FROM asg WHERE rn = 1 GROUP BY cluster), "
        f"  nxt AS (SELECT c.r + 1 AS r, c.cluster, "
        f"    CASE WHEN a.cnt > 0 THEN a.sx / a.cnt ELSE c.cx END AS cx, "
        f"    CASE WHEN a.cnt > 0 THEN a.sy / a.cnt ELSE c.cy END AS cy, "
        f"    c.cx AS ox, c.cy AS oy "
        f"    FROM cur c LEFT JOIN agg a ON a.cluster = c.cluster), "
        f"  sh AS (SELECT max(sqrt((cx - ox) * (cx - ox) + (cy - oy) * (cy - oy))) AS shift FROM nxt) "
        f"  SELECT r, cluster, cx, cy, (SELECT shift FROM sh) < 1e-4 FROM nxt)), "
        f"fin AS (SELECT * FROM cent WHERE r = (SELECT max(r) FROM cent)) "
        f"SELECT image_id, cluster FROM ("
        f"  SELECT p.image_id, c.cluster, "
        f"    row_number() OVER (PARTITION BY p.image_id ORDER BY "
        f"      (p.lon - c.cx) * (p.lon - c.cx) + (p.lat - c.cy) * (p.lat - c.cy), c.cluster) AS rn "
        f"  FROM pts p CROSS JOIN fin c) WHERE rn = 1"
    )


ORACLE_BUILDERS["kmeans_assign"] = q_kmeans_assign


def q_lof_outliers(sf_dir: str) -> str:
    """LOF in SQL (r3) over an exact euclidean 10-NN: a 4-degree-cell
    3x3-halo candidate pass certifies points whose 10th distance fits
    inside the halo margin; the sparse residue brute-forces against
    the full table.  Then the standard kdist -> reachability -> lrd ->
    LOF chain (outlier_detection.rs semantics; ties by (dist,
    neighbor_id))."""
    k = 10
    c = 4.0
    dist = (
        "sqrt((a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat))"
    )
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}), "
        f"g AS (SELECT image_id, lon, lat, "
        f"  CAST(floor(lon / {c!r}) AS BIGINT) AS cx, "
        f"  CAST(floor(lat / {c!r}) AS BIGINT) AS cy FROM pts), "
        f"cand AS (SELECT a.image_id AS pid, b.image_id AS nid, {dist} AS d, "
        f"  a.lon AS alon, a.lat AS alat, a.cx AS acx, a.cy AS acy "
        f"  FROM g a JOIN g b ON b.cx BETWEEN a.cx - 1 AND a.cx + 1 "
        f"    AND b.cy BETWEEN a.cy - 1 AND a.cy + 1 AND b.image_id <> a.image_id), "
        f"rk AS (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY d, nid) AS rn, "
        f"  count(*) OVER (PARTITION BY pid) AS cnt FROM cand), "
        f"top AS (SELECT * FROM rk WHERE rn <= {k}), "
        f"cert AS (SELECT pid, max(d) AS d10, any_value(alon) AS alon, any_value(alat) AS alat, "
        f"  any_value(acx) AS acx, any_value(acy) AS acy, any_value(cnt) AS cnt "
        f"  FROM top GROUP BY pid), "
        f"certified AS (SELECT pid FROM cert WHERE cnt >= {k} AND d10 <= least("
        f"  alon - (acx - 1) * {c!r}, (acx + 2) * {c!r} - alon, "
        f"  alat - (acy - 1) * {c!r}, (acy + 2) * {c!r} - alat)), "
        f"knn_a AS (SELECT pid, nid, d FROM top WHERE pid IN (SELECT pid FROM certified)), "
        f"rest AS (SELECT image_id, lon, lat FROM g "
        f"  WHERE image_id NOT IN (SELECT pid FROM certified)), "
        f"bf AS (SELECT a.image_id AS pid, b.image_id AS nid, {dist} AS d, "
        f"  row_number() OVER (PARTITION BY a.image_id ORDER BY {dist}, b.image_id) AS rn "
        f"  FROM rest a JOIN pts b ON b.image_id <> a.image_id), "
        f"knn AS (SELECT pid, nid, d FROM bf WHERE rn <= {k} UNION ALL SELECT * FROM knn_a), "
        f"kd AS (SELECT pid AS id, max(d) AS kdist FROM knn GROUP BY pid), "
        f"reach AS (SELECT n.pid, n.nid, greatest(n.d, kd.kdist) AS reach "
        f"  FROM knn n JOIN kd ON kd.id = n.nid), "
        f"lrd AS (SELECT pid AS id, count(*) / sum(reach) AS lrd FROM reach GROUP BY pid), "
        f"nm AS (SELECT n.pid AS id, sum(l.lrd) / count(*) AS nbr_mean "
        f"  FROM knn n JOIN lrd l ON l.id = n.nid GROUP BY n.pid) "
        f"SELECT nm.id AS image_id, round(nm.nbr_mean / lrd.lrd, 6) AS lof "
        f"FROM nm JOIN lrd ON lrd.id = nm.id"
    )


ORACLE_BUILDERS["lof_outliers"] = q_lof_outliers


MINHASH_T = 0.8


def q_minhash_dedup(sf_dir: str) -> str:
    """Near-dup groups via EXACT Jaccard over distinct byte-5-gram
    sets + recursive connected components (r3).  The Ray side is
    MinHash-LSH-accelerated, but at J >= 0.8 with 128 perms / 32 bands
    the miss probability is <= 1e-7 per pair, and equality against the
    exact pipeline is verified on the fixed corpora (pytest); so the
    exact pipeline is a sound oracle for the driver's deterministic
    inputs.  group = min doc_id of the component, keep = (doc == group)."""
    t = MINHASH_T
    return (
        f"WITH RECURSIVE docs0 AS (SELECT doc_id, text, length(text) AS n FROM documents), "
        f"ser AS (SELECT unnest(range(0, (SELECT coalesce(max(n), 1) FROM docs0))) AS i), "
        f"sh AS (SELECT DISTINCT d.doc_id, substr(d.text, s.i + 1, 5) AS gr "
        f"  FROM docs0 d JOIN ser s ON s.i <= d.n - 5 WHERE d.n >= 5 "
        f"  UNION SELECT doc_id, text FROM docs0 WHERE n < 5), "
        f"ssz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id), "
        f"inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni "
        f"  FROM sh a JOIN sh b ON b.gr = a.gr AND b.doc_id > a.doc_id "
        f"  GROUP BY a.doc_id, b.doc_id), "
        f"edges AS (SELECT da, db FROM inter "
        f"  JOIN ssz sa ON sa.doc_id = da JOIN ssz sb ON sb.doc_id = db "
        f"  WHERE ni::DOUBLE / (sa.sz + sb.sz - ni) >= {t!r}), "
        f"bi AS (SELECT da AS a, db AS b FROM edges UNION ALL SELECT db, da FROM edges), "
        f"reach(id, lbl) AS ("
        f"  SELECT DISTINCT a, a FROM bi "
        f"  UNION SELECT e.b, r.lbl FROM reach r JOIN bi e ON e.a = r.id WHERE r.lbl < e.b), "
        f"lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id) "
        f"SELECT d.doc_id, coalesce(lab.lbl, d.doc_id) AS \"group\", "
        f"(coalesce(lab.lbl, d.doc_id) = d.doc_id) AS keep "
        f"FROM docs0 d LEFT JOIN lab ON lab.id = d.doc_id"
    )


ORACLE_BUILDERS["minhash_dedup"] = q_minhash_dedup


def q_simhash_sig(sf_dir: str) -> str:
    """SimHash in SQL (r3): whitespace tokens -> rolling-polynomial
    token hash (B = FNV prime, length-salted, splitmix64-finalized —
    texthash.py:_span_hash/_mix64, recomputed with HUGEINT mod-2^64
    arithmetic and a BIGINT bridge for xor) -> per-bit majority ->
    packed signature; groups = connected components over ALL pairs at
    Hamming <= 3 (the 4x16 banding is pigeonhole-exact, so all-pairs
    == the banded candidates)."""
    B = 0x100000001B3
    C1 = 0xBF58476D1CE4E5B9
    C2 = 0x94D049BB133111EB
    SALT = 0x9E3779B97F4A7C15
    M = 1 << 64
    H = 1 << 63

    def xoru(u1: str, u2: str) -> str:
        """xor of two HUGEINT uint64 values via the BIGINT bridge."""
        b1 = f"(CASE WHEN ({u1}) >= {H} THEN ({u1}) - {M} ELSE ({u1}) END)::BIGINT"
        b2 = f"(CASE WHEN ({u2}) >= {H} THEN ({u2}) - {M} ELSE ({u2}) END)::BIGINT"
        x = f"xor({b1}, {b2})"
        return f"(CASE WHEN {x} < 0 THEN {x}::HUGEINT + {M} ELSE {x}::HUGEINT END)"

    return (
        f"WITH RECURSIVE docs0 AS (SELECT doc_id, text FROM documents), "
        f"tl0 AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), "
        f"  x -> x <> '') AS toks FROM docs0), "
        f"ser AS (SELECT unnest(range(0, (SELECT coalesce(max(len(toks)), 1) FROM tl0))) AS i), "
        f"tok AS (SELECT doc_id, s.i AS ti, toks[s.i + 1] AS tk, "
        f"  length(toks[s.i + 1]) AS tl FROM tl0 JOIN ser s ON s.i < len(toks)), "
        f"mx AS (SELECT coalesce(max(tl), 1) AS m FROM tok), "
        f"powb(e, v) AS (SELECT 0, 1::HUGEINT "
        f"  UNION ALL SELECT e + 1, (v * {B}) % {M} FROM powb WHERE e < (SELECT m FROM mx)), "
        f"cser AS (SELECT unnest(range(0, (SELECT m FROM mx))) AS j), "
        f"ch AS (SELECT t.doc_id, t.ti, t.tl, c.j, "
        f"  ascii(substr(t.tk, c.j + 1, 1))::HUGEINT AS byte "
        f"  FROM tok t JOIN cser c ON c.j < t.tl), "
        f"core AS (SELECT ch.doc_id, ch.ti, any_value(ch.tl) AS tl, "
        f"  sum(ch.byte * p.v) % {M} AS hcore "
        f"  FROM ch JOIN powb p ON p.e = ch.tl - 1 - ch.j "
        f"  GROUP BY ch.doc_id, ch.ti), "
        f"z0 AS (SELECT doc_id, ti, "
        f"  {xoru('hcore', f'(tl::HUGEINT * {SALT}) % {M}')} AS z FROM core), "
        f"z1 AS (SELECT doc_id, ti, {xoru('z', 'z // 1073741824')} AS z FROM z0), "
        f"z2 AS (SELECT doc_id, ti, ((z % 4294967296) * {C1} "
        f"  + (((z // 4294967296) * {C1}) % 4294967296) * 4294967296) % {M} AS z FROM z1), "
        f"z3 AS (SELECT doc_id, ti, {xoru('z', 'z // 134217728')} AS z FROM z2), "
        f"z4 AS (SELECT doc_id, ti, ((z % 4294967296) * {C2} "
        f"  + (((z // 4294967296) * {C2}) % 4294967296) * 4294967296) % {M} AS z FROM z3), "
        f"th AS (SELECT doc_id, ti, {xoru('z', 'z // 2147483648')} AS h FROM z4), "
        f"bser AS (SELECT unnest(range(0, 64)) AS j), "
        f"bits AS (SELECT t.doc_id, b.j, sum((t.h // (1::HUGEINT << b.j)) % 2) AS ones, "
        f"  count(*) AS n FROM th t CROSS JOIN bser b GROUP BY t.doc_id, b.j), "
        f"sigu AS (SELECT doc_id, sum(CASE WHEN 2 * ones > n "
        f"  THEN (1::HUGEINT << j) ELSE 0::HUGEINT END) AS u FROM bits GROUP BY doc_id), "
        f"sig AS (SELECT d.doc_id, coalesce("
        f"  (CASE WHEN s.u >= {H} THEN s.u - {M} ELSE s.u END)::BIGINT, 0) AS simhash "
        f"  FROM docs0 d LEFT JOIN sigu s ON s.doc_id = d.doc_id), "
        f"edges AS (SELECT a.doc_id AS da, b.doc_id AS db "
        f"  FROM sig a JOIN sig b ON b.doc_id > a.doc_id "
        f"  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3), "
        f"bi AS (SELECT da AS a, db AS b FROM edges UNION ALL SELECT db, da FROM edges), "
        f"reach(id, lbl) AS ("
        f"  SELECT DISTINCT a, a FROM bi "
        f"  UNION SELECT e.b, r.lbl FROM reach r JOIN bi e ON e.a = r.id WHERE r.lbl < e.b), "
        f"lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id) "
        f"SELECT sig.doc_id, sig.simhash, coalesce(lab.lbl, sig.doc_id) AS \"group\" "
        f"FROM sig LEFT JOIN lab ON lab.id = sig.doc_id"
    )


ORACLE_BUILDERS["simhash_sig"] = q_simhash_sig


ORACLE_BUILDERS["line_poly_intersects_shuffle"] = q_line_poly_intersects


def q_knn_all(sf_dir: str) -> str:
    """Exact self-5NN in SQL (r3): 4-degree 3x3-halo candidates with a
    certified margin — exact sphere distances to the halo's bounding
    parallels (R * dphi) and meridians (R * asin(cos(phi) * sin(dlam)),
    conservative: nearest point of the FULL meridian circle) — halo
    cells touching a pole or the antimeridian are never certified;
    the uncertified sliver brute-forces against the whole table.
    Ties by (dist, neighbor_id) like ball_tree.rs."""
    k = KNN_K
    c = 4.0
    hav = _hav_expr
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}), "
        f"g AS (SELECT image_id, lon, lat, "
        f"  CAST(floor(lon / {c!r}) AS BIGINT) AS cx, "
        f"  CAST(floor(lat / {c!r}) AS BIGINT) AS cy FROM pts), "
        f"cand AS (SELECT a.image_id AS pid, b.image_id AS nid, "
        f"  {hav('a.lon', 'a.lat', 'b.lon', 'b.lat')} AS d, "
        f"  a.lon AS alon, a.lat AS alat, a.cx AS acx, a.cy AS acy "
        f"  FROM g a JOIN g b ON b.cx BETWEEN a.cx - 1 AND a.cx + 1 "
        f"    AND b.cy BETWEEN a.cy - 1 AND a.cy + 1 AND b.image_id <> a.image_id), "
        f"rk AS (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY d, nid) AS rn, "
        f"  count(*) OVER (PARTITION BY pid) AS cnt FROM cand), "
        f"top AS (SELECT * FROM rk WHERE rn <= {k}), "
        f"cert0 AS (SELECT pid, max(d) AS dk, any_value(alon) AS alon, "
        f"  any_value(alat) AS alat, any_value(acx) AS acx, any_value(acy) AS acy, "
        f"  any_value(cnt) AS cnt FROM top GROUP BY pid), "
        f"certified AS (SELECT pid FROM cert0 WHERE cnt >= {k} "
        f"  AND (acy + 2) * {c!r} <= 90.0 AND (acy - 1) * {c!r} >= -90.0 "
        f"  AND (acx + 2) * {c!r} <= 180.0 AND (acx - 1) * {c!r} >= -180.0 "
        f"  AND dk <= least("
        f"    {R!r} * radians(alat - (acy - 1) * {c!r}), "
        f"    {R!r} * radians((acy + 2) * {c!r} - alat), "
        f"    {R!r} * asin(cos(radians(alat)) * sin(radians(alon - (acx - 1) * {c!r}))), "
        f"    {R!r} * asin(cos(radians(alat)) * sin(radians((acx + 2) * {c!r} - alon))))), "
        f"knn_c AS (SELECT pid, nid, d, rn FROM top "
        f"  WHERE pid IN (SELECT pid FROM certified)), "
        f"rest AS (SELECT image_id, lon, lat FROM g "
        f"  WHERE image_id NOT IN (SELECT pid FROM certified)), "
        f"bf AS (SELECT a.image_id AS pid, b.image_id AS nid, "
        f"  {hav('a.lon', 'a.lat', 'b.lon', 'b.lat')} AS d, "
        f"  row_number() OVER (PARTITION BY a.image_id "
        f"    ORDER BY {hav('a.lon', 'a.lat', 'b.lon', 'b.lat')}, b.image_id) AS rn "
        f"  FROM rest a JOIN pts b ON b.image_id <> a.image_id) "
        f"SELECT pid AS image_id, nid AS neighbor_id, rn AS rank, round(d, 1) AS dist_m "
        f"FROM (SELECT pid, nid, d, rn FROM bf WHERE rn <= {k} "
        f"      UNION ALL SELECT pid, nid, d, rn FROM knn_c)"
    )


ORACLE_BUILDERS["knn_all"] = q_knn_all


def q_tile_clip_areas(sf_dir: str) -> str:
    """Polygon x tile clipped AREA via a per-edge clamped Green's
    integral (r3): clamping the curve to the tile's x-slab preserves
    winding for interior points (the straight-line homotopy never
    crosses them), so

        area(P ∩ box) = | Σ_edges ∫ (clamp(y, Y0, Y1) - Y0) d(clamp(x, X0, X1)) |

    with the per-edge integral in closed form through the relu
    antiderivative H(u) = Y0*u + relu(u-Y0)^2/2 - relu(u-Y1)^2/2 — no
    Sutherland-Hodgman vertex list needed.  Equal to the engine's
    S-H + shoelace up to fp noise; both sides drop |area| <= 1e-12."""
    segs = datagen.segments_path(sf_dir)
    polys = datagen.polygons_path(sf_dir)
    n = 1 << TILE_RES
    w = 360.0 / n
    h = 180.0 / n
    # closed-form per-piece integral pieces (SQL fragments)
    H = (
        lambda u: f"(y0t * ({u}) + pow(greatest(({u}) - y0t, 0.0), 2) / 2.0 "
        f"- pow(greatest(({u}) - y1t, 0.0), 2) / 2.0)"
    )
    return (
        f"WITH s AS (SELECT polygon_id, x1 AS xa, y1 AS ya, x2 AS xb, y2 AS yb "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0), "
        f"pb AS (SELECT polygon_id, minx, miny, maxx, maxy FROM read_parquet('{polys}')), "
        f"g AS (SELECT unnest(range(0, {n})) AS i), "
        f"pt AS (SELECT pb.polygon_id, gx.i AS ix, gy.i AS iy FROM pb "
        f"  JOIN g gx ON gx.i BETWEEN "
        f"    greatest(0, least({n - 1}, CAST(floor((pb.minx + 180.0) / 360.0 * {n}) AS BIGINT))) AND "
        f"    greatest(0, least({n - 1}, CAST(floor((pb.maxx + 180.0) / 360.0 * {n}) AS BIGINT))) "
        f"  JOIN g gy ON gy.i BETWEEN "
        f"    greatest(0, least({n - 1}, CAST(floor((pb.miny + 90.0) / 180.0 * {n}) AS BIGINT))) AND "
        f"    greatest(0, least({n - 1}, CAST(floor((pb.maxy + 90.0) / 180.0 * {n}) AS BIGINT)))), "
        f"et AS (SELECT s.*, pt.ix, pt.iy, "
        f"  pt.ix * {w!r} - 180.0 AS x0t, pt.ix * {w!r} - 180.0 + {w!r} AS x1t, "
        f"  pt.iy * {h!r} - 90.0 AS y0t, pt.iy * {h!r} - 90.0 + {h!r} AS y1t "
        f"  FROM s JOIN pt ON pt.polygon_id = s.polygon_id), "
        f"c1 AS (SELECT *, xb - xa AS dx, yb - ya AS dy FROM et WHERE xb <> xa), "
        f"c2 AS (SELECT *, "
        f"  greatest(least((x0t - xa) / dx, (x1t - xa) / dx), 0.0) AS tlo, "
        f"  least(greatest((x0t - xa) / dx, (x1t - xa) / dx), 1.0) AS thi "
        f"  FROM c1), "
        f"c3 AS (SELECT *, ya + tlo * dy AS ylo_v, ya + thi * dy AS yhi_v "
        f"  FROM c2 WHERE thi > tlo), "
        f"c4 AS (SELECT polygon_id, iy * {n} + ix AS tile_id, "
        f"  dx * (CASE WHEN dy = 0 "
        f"    THEN (least(greatest(ya, y0t), y1t) - y0t) * (thi - tlo) "
        f"    ELSE ({H('yhi_v')} - {H('ylo_v')}) / dy - y0t * (thi - tlo) END) AS contrib "
        f"  FROM c3) "
        f"SELECT polygon_id, tile_id, round(abs(sum(contrib)), 6) AS clip_area "
        f"FROM c4 GROUP BY polygon_id, tile_id HAVING abs(sum(contrib)) > 1e-12"
    )


ORACLE_BUILDERS["tile_clip_areas"] = q_tile_clip_areas


def q_delaunay_stats(sf_dir: str) -> str:
    """Delaunay stats without triangulating (r3): for a point set in
    general position every Delaunay triangulation has exactly
    2n - 2 - h triangles (Euler's formula, h = strict hull vertices)
    and covers the convex hull, so tri_area == hull area.  Hull edges
    via the same strictly-left characterization as q_poly_hull, over
    the DISTINCT exterior vertices (the engine uniques them too)."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH v AS (SELECT DISTINCT polygon_id, x1 AS x, y1 AS y "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0), "
        f"vn AS (SELECT polygon_id, row_number() OVER (PARTITION BY polygon_id "
        f"  ORDER BY x, y) AS i, x, y FROM v), "
        f"nv AS (SELECT polygon_id, count(*) AS n FROM vn GROUP BY polygon_id), "
        f"e AS (SELECT u.polygon_id, u.i AS ui, w.i AS wi, "
        f"  u.x AS ux, u.y AS uy, w.x AS wx, w.y AS wy "
        f"  FROM vn u JOIN vn w ON w.polygon_id = u.polygon_id AND w.i <> u.i), "
        f"hull_e AS (SELECT e.* FROM e WHERE NOT EXISTS ("
        f"  SELECT 1 FROM vn p WHERE p.polygon_id = e.polygon_id "
        f"    AND p.i <> e.ui AND p.i <> e.wi "
        f"    AND NOT ((e.wx - e.ux) * (p.y - e.uy) - (e.wy - e.uy) * (p.x - e.ux) > 0 "
        f"      OR ((e.wx - e.ux) * (p.y - e.uy) - (e.wy - e.uy) * (p.x - e.ux) = 0 "
        f"        AND (p.x - e.ux) * (e.wx - e.ux) + (p.y - e.uy) * (e.wy - e.uy) > 0 "
        f"        AND (p.x - e.wx) * (e.ux - e.wx) + (p.y - e.wy) * (e.uy - e.wy) > 0)))), "
        f"h AS (SELECT polygon_id, count(*) AS h, "
        f"  abs(sum(ux * wy - wx * uy) / 2.0) AS harea FROM hull_e GROUP BY polygon_id), "
        # Euler counts every point on the hull BOUNDARY, including
        # collinear mid-edge points the strict hull excludes
        f"onedge AS (SELECT DISTINCT e.polygon_id, p.i FROM hull_e e "
        f"  JOIN vn p ON p.polygon_id = e.polygon_id "
        f"    AND p.i <> e.ui AND p.i <> e.wi "
        f"    AND (e.wx - e.ux) * (p.y - e.uy) - (e.wy - e.uy) * (p.x - e.ux) = 0 "
        f"    AND (p.x - e.ux) * (e.wx - e.ux) + (p.y - e.uy) * (e.wy - e.uy) > 0 "
        f"    AND (p.x - e.wx) * (e.ux - e.wx) + (p.y - e.wy) * (e.uy - e.wy) > 0), "
        f"oe AS (SELECT polygon_id, count(*) AS extra FROM onedge GROUP BY polygon_id) "
        f"SELECT nv.polygon_id, "
        f"(2 * nv.n - 2 - h.h - coalesce(oe.extra, 0))::BIGINT AS n_tri, "
        f"round(h.harea, 6) AS tri_area "
        f"FROM nv JOIN h ON h.polygon_id = nv.polygon_id "
        f"LEFT JOIN oe ON oe.polygon_id = nv.polygon_id"
    )


ORACLE_BUILDERS["delaunay_stats"] = q_delaunay_stats


def _img_decoded_bytes_ctes(sf_dir: str, mod: int, residue: int = 0) -> str:
    """Shared oracle CTE chain (r4c, factored from q_image_stats):
    regenerates the DECODED byte stream of every sampled image in SQL —
    counter-mode splitmix64 source pixels (datagen._pixels_for), PNG
    rows pass through losslessly, JPEG rows run the full lossy pipeline
    (RGB->YCbCr, separable 8x8 DCT with the numpy basis as literals,
    half-away Q98 quantization, IDCT, YCbCr->RGB, round+clamp).  Emits
    CTEs through ``bt(image_id, w, h, m, v)`` — byte m of the decoded
    stream with value v — for a ``WITH <this> <rollups...>`` suffix."""
    import numpy as np

    from . import rng as _rng
    from .datagen import TAG_PIXEL

    base = int(_rng.splitmix64(np.uint64(TAG_PIXEL)))
    images = datagen.images_path(sf_dir)
    u = f"(({base} + i * 4096 + k.k) % {M64})"
    word = _rng.sql_splitmix64(u)
    return (
        f"im AS (SELECT image_id, CAST(substr(image_id, 5) AS BIGINT) AS i "
        f"  FROM read_parquet('{images}') "
        f"  WHERE CAST(substr(image_id, 5) AS BIGINT) % {mod} = {residue}), "
        f"d AS (SELECT *, "
        f"  CASE i % 3 WHEN 0 THEN 16 WHEN 1 THEN 24 ELSE 32 END AS w, "
        f"  CASE (i + 1) % 3 WHEN 0 THEN 16 WHEN 1 THEN 24 ELSE 32 END AS h "
        f"  FROM im), "
        f"ks AS (SELECT unnest(range(0, 384)) AS k), "
        f"wd AS (SELECT d.image_id, d.i % 2 AS lossy, d.w, d.h, k.k, {word} AS word "
        f"  FROM d JOIN ks k ON k.k < (d.w * d.h * 3) // 8), "
        + _lossy_chain_ctes()
    )


M64 = 18446744073709551616


def _lossy_chain_ctes() -> str:
    """The decode chain shared by the image AND video oracles (r5,
    factored so q_video_frames reuses the exact DCT pipeline): given a
    ``wd(image_id, lossy, w, h, k, word)`` CTE of 8-byte rng words,
    explodes bytes and emits ``bt(image_id, w, h, m, v)`` — byte m of
    the DECODED stream with value v (lossy=0 rows pass through
    losslessly, lossy=1 rows run the full RGB->YCbCr / DCT / Q98
    quantize / IDCT / clamp round trip)."""
    from .imagecodec import _D8, jpeg_quant_tables

    dvals = ", ".join(
        f"({u_}, {x_}, {_D8[u_, x_]!r})" for u_ in range(8) for x_ in range(8)
    )
    qy, qc = jpeg_quant_tables()
    qvals = ", ".join(
        f"({cls}, {u_}, {v_}, {int((qy if cls == 0 else qc)[u_, v_])})"
        for cls in (0, 1) for u_ in range(8) for v_ in range(8)
    )
    rha = "floor(abs({x}) + 0.5) * sign({x})"
    return (
        f"raw AS (SELECT image_id, lossy, w, h, k * 8 + o.b AS m, "
        f"  ((word // (1::HUGEINT << (8 * o.b))) % 256)::DOUBLE AS v "
        f"  FROM wd, (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) AS o(b)), "
        # ---- lossless PNG rows pass straight through --------------------
        f"bt_png AS (SELECT image_id, w, h, m, v FROM raw WHERE lossy = 0), "
        # ---- JPEG rows: the full lossy pipeline in SQL ------------------
        f"dctb(u, x, dv) AS (SELECT * FROM (VALUES {dvals})), "
        f"qtab(cls, qu, qv, q) AS (SELECT * FROM (VALUES {qvals})), "
        f"jpx AS (SELECT image_id, w, h, (m // 3) // w AS y, (m // 3) % w AS x, "
        f"  m % 3 AS c, v FROM raw WHERE lossy = 1), "
        f"jrgb AS (SELECT image_id, w, h, y, x, "
        f"  max(CASE WHEN c = 0 THEN v END) AS r, "
        f"  max(CASE WHEN c = 1 THEN v END) AS g, "
        f"  max(CASE WHEN c = 2 THEN v END) AS b "
        f"  FROM jpx GROUP BY image_id, w, h, y, x), "
        f"jycc AS (SELECT image_id, w, h, y, x, ch.c, ch.val FROM jrgb, LATERAL (VALUES "
        f"  (0, 0.299 * r + 0.587 * g + 0.114 * b - 128.0), "
        f"  (1, -0.168735892 * r - 0.331264108 * g + 0.5 * b), "
        f"  (2, 0.5 * r - 0.418687589 * g - 0.081312411 * b)) AS ch(c, val)), "
        f"jblk AS (SELECT image_id, w, h, c, y // 8 AS by, x // 8 AS bx, "
        f"  y % 8 AS iy, x % 8 AS ix, val FROM jycc), "
        # separable DCT: columns (over ix) then rows (over iy)
        f"p1 AS (SELECT image_id, w, h, c, by, bx, iy, t.u AS v, "
        f"  sum(t.dv * val) AS s FROM jblk JOIN dctb t ON t.x = jblk.ix "
        f"  GROUP BY image_id, w, h, c, by, bx, iy, t.u), "
        f"p2 AS (SELECT image_id, w, h, c, by, bx, t.u AS u, v, "
        f"  sum(t.dv * s) AS s FROM p1 JOIN dctb t ON t.x = p1.iy "
        f"  GROUP BY image_id, w, h, c, by, bx, t.u, v), "
        # quantize (half away from zero) + dequantize in one step
        f"qs AS (SELECT image_id, w, h, c, by, bx, u, v, "
        f"  ({rha.format(x='s / q')}) * q AS s "
        f"  FROM p2 JOIN qtab ON qtab.cls = (CASE WHEN c = 0 THEN 0 ELSE 1 END) "
        f"  AND qtab.qu = u AND qtab.qv = v), "
        # inverse separable DCT: rows (over u) then columns (over v)
        f"r1 AS (SELECT image_id, w, h, c, by, bx, t.x AS iy, v, "
        f"  sum(t.dv * s) AS s FROM qs JOIN dctb t ON t.u = qs.u "
        f"  GROUP BY image_id, w, h, c, by, bx, t.x, v), "
        f"r2 AS (SELECT image_id, w, h, c, by, bx, iy, t.x AS ix, "
        f"  sum(t.dv * s) AS s FROM r1 JOIN dctb t ON t.u = r1.v "
        f"  GROUP BY image_id, w, h, c, by, bx, iy, t.x), "
        f"jout AS (SELECT image_id, w, h, by * 8 + iy AS y, bx * 8 + ix AS x, "
        f"  max(CASE WHEN c = 0 THEN s END) + 128.0 AS yv, "
        f"  max(CASE WHEN c = 1 THEN s END) AS cb, "
        f"  max(CASE WHEN c = 2 THEN s END) AS cr "
        f"  FROM r2 GROUP BY image_id, w, h, by * 8 + iy, bx * 8 + ix), "
        f"jdec AS (SELECT image_id, w, h, y, x, ch.c, "
        f"  least(greatest({rha.format(x='ch.fv')}, 0.0), 255.0) AS v "
        f"  FROM jout, LATERAL (VALUES "
        f"  (0, yv + 1.402 * cr), "
        f"  (1, yv - 0.344136286 * cb - 0.714136286 * cr), "
        f"  (2, yv + 1.772 * cb)) AS ch(c, fv)), "
        f"bt AS (SELECT image_id, w, h, m, v FROM bt_png "
        f"  UNION ALL SELECT image_id, w, h, (y * w + x) * 3 + c AS m, v FROM jdec), "
    )


def q_image_stats(sf_dir: str) -> str:
    """Image channel means + aHash WITHOUT decoding (see
    _img_decoded_bytes_ctes for the shared pixel-regeneration chain):
    one pass over the exploded decoded bytes, then channel means and
    the integer-exact aHash as tiny rollups."""
    from .queries import IMG_STATS_MOD

    M = 18446744073709551616
    return (
        f"WITH {_img_decoded_bytes_ctes(sf_dir, IMG_STATS_MOD, 0)} "
        # ONE pass over the exploded bytes: partial integer sums per
        # (image, cell, channel); channel means and the aHash cell sums
        # are tiny rollups of it (the byte table is ~33M rows at sf0.01
        # — aggregating it twice doubled oracle latency)
        f"g1 AS (SELECT image_id, max(w) AS w, max(h) AS h, "
        f"  (((m // 3) // w) * 8) // h AS cy, (((m // 3) % w) * 8) // w AS cx, "
        f"  m % 3 AS c, sum(v)::BIGINT AS s, count(*) AS n "
        f"  FROM bt GROUP BY image_id, (((m // 3) // w) * 8) // h, "
        f"  (((m // 3) % w) * 8) // w, m % 3), "
        f"ch AS (SELECT image_id, c, sum(s)::DOUBLE / sum(n) AS mv "
        f"  FROM g1 GROUP BY image_id, c), "
        # integer-exact aHash (matches multimodal.DecodeStats._ahash):
        # cell bit = cell_sum * n_total > total_sum * n_cell, all exact
        # integer sums — no float summation order on either side
        f"cell AS (SELECT image_id, max(w) AS w, max(h) AS h, cy, cx, "
        f"  sum(s)::BIGINT AS s FROM g1 GROUP BY image_id, cy, cx), "
        f"tot AS (SELECT image_id, sum(s) AS st FROM cell GROUP BY image_id), "
        f"ah AS (SELECT c.image_id, "
        f"  sum(CASE WHEN c.s * (c.w * c.h) > tot.st * ((c.w * c.h) // 64) "
        f"      THEN (1::HUGEINT << (c.cy * 8 + c.cx)) ELSE 0::HUGEINT END) AS u "
        f"  FROM cell c JOIN tot ON tot.image_id = c.image_id GROUP BY c.image_id) "
        f"SELECT im.image_id, "
        f"round(max(CASE WHEN ch.c = 0 THEN ch.mv END), 4) AS mean_r, "
        f"round(max(CASE WHEN ch.c = 1 THEN ch.mv END), 4) AS mean_g, "
        f"round(max(CASE WHEN ch.c = 2 THEN ch.mv END), 4) AS mean_b, "
        f"max((CASE WHEN ah.u >= 9223372036854775808::HUGEINT "
        f"  THEN ah.u - {M} ELSE ah.u END)::BIGINT) AS ahash "
        f"FROM im JOIN ch ON ch.image_id = im.image_id "
        f"JOIN ah ON ah.image_id = im.image_id "
        f"GROUP BY im.image_id"
    )


ORACLE_BUILDERS["image_stats"] = q_image_stats


def q_voronoi_sample(sf_dir: str) -> str:
    """Voronoi cells in SQL (r3) by direct half-plane intersection:
    cell(p) = envelope ∩_q {2(q-p)·x <= |q|²-|p|²}.  Candidate
    vertices are pairwise boundary-line intersections kept iff they
    satisfy every other constraint (eps 1e-7 — sites are in general
    position); the convex cell's area comes from an angle-sorted
    shoelace around the site.  Vertex count == active-constraint count
    == the engine's Sutherland-Hodgman ring length (rings verified
    duplicate/collinear-free)."""
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}), "
        f"sites AS (SELECT image_id, lon, lat FROM pts "
        f"  WHERE CAST(substr(image_id, 5) AS BIGINT) % 400 = 0), "
        f"cons AS ("
        f"  SELECT i.image_id AS sid, 'b' || j.image_id AS cid, "
        f"    2.0 * (j.lon - i.lon) AS a, 2.0 * (j.lat - i.lat) AS b, "
        f"    j.lon * j.lon + j.lat * j.lat - i.lon * i.lon - i.lat * i.lat AS c "
        f"  FROM sites i JOIN sites j ON j.image_id <> i.image_id "
        f"  UNION ALL SELECT image_id, e.cid, e.a, e.b, e.c FROM sites, "
        f"    (VALUES ('e0', -1.0, 0.0, 180.0), ('e1', 1.0, 0.0, 180.0), "
        f"            ('e2', 0.0, -1.0, 90.0), ('e3', 0.0, 1.0, 90.0)) AS e(cid, a, b, c)), "
        f"verts AS (SELECT c1.sid, "
        f"  (c1.c * c2.b - c2.c * c1.b) / (c1.a * c2.b - c2.a * c1.b) AS x, "
        f"  (c1.a * c2.c - c2.a * c1.c) / (c1.a * c2.b - c2.a * c1.b) AS y "
        f"  FROM cons c1 JOIN cons c2 ON c2.sid = c1.sid AND c2.cid > c1.cid "
        f"  WHERE c1.a * c2.b - c2.a * c1.b <> 0), "
        f"feas AS (SELECT v.sid, v.x, v.y FROM verts v WHERE NOT EXISTS ("
        f"  SELECT 1 FROM cons k WHERE k.sid = v.sid "
        f"    AND k.a * v.x + k.b * v.y > k.c + 1e-7)), "
        f"ring AS (SELECT f.sid, f.x, f.y, "
        f"  row_number() OVER (PARTITION BY f.sid "
        f"    ORDER BY atan2(f.y - s.lat, f.x - s.lon)) AS rn, "
        f"  count(*) OVER (PARTITION BY f.sid) AS nv "
        f"  FROM (SELECT DISTINCT sid, x, y FROM feas) f "
        f"  JOIN sites s ON s.image_id = f.sid), "
        f"shoe AS (SELECT sid, max(nv) AS nv, sum(x * ny - nx * y) / 2.0 AS sa FROM ("
        f"  SELECT sid, x, y, nv, "
        f"    coalesce(lead(x) OVER w, first_value(x) OVER w2) AS nx, "
        f"    coalesce(lead(y) OVER w, first_value(y) OVER w2) AS ny "
        f"  FROM ring WINDOW w AS (PARTITION BY sid ORDER BY rn), "
        f"  w2 AS (PARTITION BY sid ORDER BY rn "
        f"    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) "
        f"  GROUP BY sid) "
        f"SELECT s.image_id, round(abs(coalesce(shoe.sa, 0.0)), 6) AS cell_area, "
        f"coalesce(shoe.nv, 0)::BIGINT AS cell_n_vertices "
        f"FROM sites s LEFT JOIN shoe ON shoe.sid = s.image_id"
    )


ORACLE_BUILDERS["voronoi_sample"] = q_voronoi_sample


def q_geodesic_to_hot(sf_dir: str) -> str:
    """Karney inverse in SQL (r3): the canonical-frame equation
    h(alpha1) = lambda12(alpha1) - lambda_target is monotone on
    (0, pi), so 60 recursive-CTE bisection rounds find the SAME root
    the engine's safeguarded Newton converges to; each round evaluates
    lambda12 through the identical 32-node Gauss-Legendre I3 integral
    (nodes/weights interpolated from kernels/geodesic.py).  Distance
    s12 = b * I1 and the forward azimuth reverse the same
    swap/lonsign/latsign canonicalization.  Random points vs the fixed
    hot point never hit the coincident/equatorial/meridional branches
    (the lon grid cannot produce lambda == 0 exactly)."""
    import numpy as np

    from .kernels.geodesic import _NODES, _WEIGHTS, WGS84_A, WGS84_F

    f = WGS84_F
    b = WGS84_A * (1 - f)
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    glw = ", ".join(f"({x!r}, {w!r})" for x, w in zip(_NODES, _WEIGHTS))

    def tri(alpha: str) -> str:
        """Chained selects computing sa0/ca0/k2/sigma1/omega1/salp2/
        calp2/sigma2/omega2 from an alpha column over __IN__."""
        return (
            f"SELECT *, sin({alpha}) AS sal, cos({alpha}) AS cal FROM __IN__"
            f"), y2 AS (SELECT *, sal * cb1 AS sa0, "
            f"  sqrt(cal * cal + (sal * sb1) * (sal * sb1)) AS ca0 FROM y1"
            f"), y3 AS (SELECT *, {ep2!r} * ca0 * ca0 AS k2, "
            f"  atan2(sb1, cal * cb1) AS sigma1, "
            f"  atan2(sa0 * sb1, cal * cb1) AS omega1, "
            f"  least(greatest(sa0 / cb2, -1.0), 1.0) AS salp2 FROM y2"
            f"), y4 AS (SELECT *, sqrt(greatest(0.0, 1.0 - salp2 * salp2)) AS calp2 FROM y3"
            f"), y5 AS (SELECT *, atan2(sb2, calp2 * cb2) AS sigma2, "
            f"  atan2(sa0 * sb2, calp2 * cb2) AS omega2 FROM y4"
        )

    i3 = (
        "SELECT t.image_id, "
        "  0.5 * (t.sigma2 - t.sigma1) * sum(g.w * (2.0 - {f}) / "
        "    (1.0 + (1.0 - {f}) * sqrt(1.0 + t.k2 * "
        "     pow(sin(0.5 * (t.sigma1 + t.sigma2) + 0.5 * (t.sigma2 - t.sigma1) * g.x), 2)))) AS i3 "
        "  FROM __T__ t CROSS JOIN glw g GROUP BY t.image_id, t.sigma1, t.sigma2, t.k2"
    ).replace("{f}", repr(f))
    return (
        f"WITH RECURSIVE pts AS ({_pts_cte(sf_dir)}), "
        f"glw(x, w) AS (SELECT * FROM (VALUES {glw})), "
        f"base AS (SELECT image_id, lon, lat, "
        f"  ({HOT_LON!r} - lon + 180.0) - floor(({HOT_LON!r} - lon + 180.0) / 360.0) * 360.0 - 180.0 AS lon12 "
        f"  FROM pts WHERE CAST(substr(image_id, 5) AS BIGINT) % 20 = 0), "
        f"cn0 AS (SELECT image_id, "
        f"  (CASE WHEN lon12 < 0 THEN -1.0 ELSE 1.0 END) * "
        f"  (CASE WHEN abs(lat) < abs({HOT_LAT!r}) THEN -1.0 ELSE 1.0 END) AS lonsign, "
        f"  CASE WHEN abs(lat) < abs({HOT_LAT!r}) THEN -1.0 ELSE 1.0 END AS swapp, "
        f"  CASE WHEN abs(lat) < abs({HOT_LAT!r}) THEN {HOT_LAT!r} ELSE lat END AS lt1r, "
        f"  CASE WHEN abs(lat) < abs({HOT_LAT!r}) THEN lat ELSE {HOT_LAT!r} END AS lt2r, "
        f"  radians(abs(lon12)) AS lam_t FROM base), "
        f"cn AS (SELECT image_id, lonsign, swapp, lam_t, "
        f"  CASE WHEN (CASE WHEN lt1r > 0 THEN -1.0 ELSE 1.0 END) * lt1r > 0 THEN 1 ELSE 1 END AS _dummy, "
        f"  CASE WHEN lt1r > 0 THEN -1.0 ELSE 1.0 END AS latsign, "
        f"  lt1r * (CASE WHEN lt1r > 0 THEN -1.0 ELSE 1.0 END) AS lt1, "
        f"  lt2r * (CASE WHEN lt1r > 0 THEN -1.0 ELSE 1.0 END) AS lt2 FROM cn0), "
        f"tb AS (SELECT image_id, lonsign, swapp, latsign, lam_t, "
        f"  atan2((1.0 - {f!r}) * sin(radians(lt1)), cos(radians(lt1))) AS beta1, "
        f"  atan2((1.0 - {f!r}) * sin(radians(lt2)), cos(radians(lt2))) AS beta2 FROM cn), "
        f"tc AS (SELECT *, sin(beta1) AS sb1, cos(beta1) AS cb1, "
        f"  sin(beta2) AS sb2, cos(beta2) AS cb2 FROM tb), "
        f"it(image_id, sb1, cb1, sb2, cb2, lam_t, swapp, lonsign, latsign, lo, hi, r) AS ("
        f"  SELECT image_id, sb1, cb1, sb2, cb2, lam_t, swapp, lonsign, latsign, "
        f"    1e-12, pi() - 1e-12, 0 FROM tc "
        f"  UNION ALL ("
        f"  WITH cur AS (SELECT *, (lo + hi) / 2.0 AS mid FROM it WHERE r < 60), "
        f"  y1 AS ({tri('mid').replace('__IN__', 'cur')}), "
        f"  iv AS ({i3.replace('__T__', 'y5')}), "
        f"  hh AS (SELECT y5.*, "
        f"    (y5.omega2 - y5.omega1) - {f!r} * y5.sa0 * iv.i3 - y5.lam_t AS h "
        f"    FROM y5 JOIN iv ON iv.image_id = y5.image_id) "
        f"  SELECT image_id, sb1, cb1, sb2, cb2, lam_t, swapp, lonsign, latsign, "
        f"    CASE WHEN h < 0 THEN mid ELSE lo END, "
        f"    CASE WHEN h < 0 THEN hi ELSE mid END, r + 1 FROM hh)), "
        f"fin0 AS (SELECT *, (lo + hi) / 2.0 AS alpha FROM it WHERE r = 60), "
        f"y1 AS ({tri('alpha').replace('__IN__', 'fin0')}), "
        f"i1v AS (SELECT t.image_id, "
        f"  0.5 * (t.sigma2 - t.sigma1) * sum(g.w * sqrt(1.0 + t.k2 * "
        f"    pow(sin(0.5 * (t.sigma1 + t.sigma2) + 0.5 * (t.sigma2 - t.sigma1) * g.x), 2))) AS i1 "
        f"  FROM y5 t CROSS JOIN glw g GROUP BY t.image_id, t.sigma1, t.sigma2, t.k2), "
        f"az AS (SELECT y5.image_id, y5.swapp, y5.lonsign, y5.latsign, "
        f"  CASE WHEN y5.swapp < 0 THEN y5.salp2 ELSE y5.sal END * y5.swapp * y5.lonsign AS s1f, "
        f"  CASE WHEN y5.swapp < 0 THEN y5.calp2 ELSE y5.cal END * y5.swapp * y5.latsign AS c1f "
        f"  FROM y5) "
        f"SELECT az.image_id, "
        f"round({b!r} * i1v.i1, 3) AS geodesic_m, "
        f"round(degrees(atan2(az.s1f, az.c1f)) - "
        f"  floor(degrees(atan2(az.s1f, az.c1f)) / 360.0) * 360.0, 6) AS geodesic_azi "
        f"FROM az JOIN i1v ON i1v.image_id = az.image_id"
    )


ORACLE_BUILDERS["geodesic_to_hot"] = q_geodesic_to_hot


def q_geodesic_dest_pts(sf_dir: str) -> str:
    """Karney DIRECT problem in SQL (r3): g(sigma2) = I1(sigma1,
    sigma2) - s12/b has g' = sqrt(1 + k2 sin^2) >= 1, so sigma2 is
    bracketed by [sigma1 + tgt/sqrt(1+k2), sigma1 + tgt] and 50
    recursive bisections converge to the engine's Newton root; the
    destination then follows in closed form (same GL-32 I3 for the
    longitude integral)."""
    import numpy as np

    from .kernels.geodesic import _NODES, _WEIGHTS, WGS84_A, WGS84_F

    f = WGS84_F
    b = WGS84_A * (1 - f)
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    glw = ", ".join(f"({x!r}, {w!r})" for x, w in zip(_NODES, _WEIGHTS))
    return (
        f"WITH RECURSIVE pts AS ({_pts_cte(sf_dir)}), "
        f"glw(x, w) AS (SELECT * FROM (VALUES {glw})), "
        f"base AS (SELECT image_id, lon, lat, "
        f"  fmod((lat + 90.0) * 2.0, 360.0) AS brg, "
        f"  50000.0 + (lon + 180.0) * 500.0 AS dist "
        f"  FROM pts WHERE CAST(substr(image_id, 5) AS BIGINT) % 10 = 0), "
        f"t1 AS (SELECT *, "
        f"  atan2((1.0 - {f!r}) * sin(radians(lat)), cos(radians(lat))) AS beta1, "
        f"  sin(radians(brg)) AS salp1, cos(radians(brg)) AS calp1, "
        f"  dist / {b!r} AS tgt FROM base), "
        f"t2 AS (SELECT *, sin(beta1) AS sb1, cos(beta1) AS cb1 FROM t1), "
        f"t3 AS (SELECT *, salp1 * cb1 AS sa0, "
        f"  sqrt(calp1 * calp1 + (salp1 * sb1) * (salp1 * sb1)) AS ca0 FROM t2), "
        f"t4 AS (SELECT *, {ep2!r} * ca0 * ca0 AS k2, "
        f"  atan2(sb1, calp1 * cb1) AS sigma1, "
        f"  atan2(sa0 * sb1, calp1 * cb1) AS omega1 FROM t3), "
        f"it(image_id, lon, sa0, ca0, k2, sigma1, omega1, tgt, lo, hi, r) AS ("
        f"  SELECT image_id, lon, sa0, ca0, k2, sigma1, omega1, tgt, "
        f"    sigma1 + tgt / sqrt(1.0 + k2), sigma1 + tgt, 0 FROM t4 "
        f"  UNION ALL ("
        f"  WITH cur AS (SELECT *, (lo + hi) / 2.0 AS mid FROM it WHERE r < 50), "
        f"  gv AS (SELECT c.image_id, "
        f"    0.5 * (c.mid - c.sigma1) * sum(g.w * sqrt(1.0 + c.k2 * "
        f"      pow(sin(0.5 * (c.sigma1 + c.mid) + 0.5 * (c.mid - c.sigma1) * g.x), 2))) "
        f"    - max(c.tgt) AS gval "
        f"    FROM cur c CROSS JOIN glw g GROUP BY c.image_id, c.sigma1, c.mid, c.k2) "
        f"  SELECT c.image_id, c.lon, c.sa0, c.ca0, c.k2, c.sigma1, c.omega1, c.tgt, "
        f"    CASE WHEN gv.gval < 0 THEN c.mid ELSE c.lo END, "
        f"    CASE WHEN gv.gval < 0 THEN c.hi ELSE c.mid END, c.r + 1 "
        f"  FROM cur c JOIN gv ON gv.image_id = c.image_id)), "
        f"fin AS (SELECT *, (lo + hi) / 2.0 AS sigma2 FROM it WHERE r = 50), "
        f"d1 AS (SELECT *, sin(sigma2) AS ss2, cos(sigma2) AS cs2 FROM fin), "
        f"d2 AS (SELECT *, ca0 * ss2 AS sb2, "
        f"  sqrt(cs2 * cs2 + (sa0 * ss2) * (sa0 * ss2)) AS cb2, "
        f"  atan2(sa0 * ss2, cs2) AS omega2 FROM d1), "
        f"i3v AS (SELECT t.image_id, "
        f"  0.5 * (t.sigma2 - t.sigma1) * sum(g.w * (2.0 - {f!r}) / "
        f"    (1.0 + (1.0 - {f!r}) * sqrt(1.0 + t.k2 * "
        f"     pow(sin(0.5 * (t.sigma1 + t.sigma2) + 0.5 * (t.sigma2 - t.sigma1) * g.x), 2)))) AS i3 "
        f"  FROM d2 t CROSS JOIN glw g GROUP BY t.image_id, t.sigma1, t.sigma2, t.k2), "
        f"lam AS (SELECT d2.*, (d2.omega2 - d2.omega1) - {f!r} * d2.sa0 * i3v.i3 AS lam12 "
        f"  FROM d2 JOIN i3v ON i3v.image_id = d2.image_id) "
        f"SELECT image_id, "
        f"round((lon + degrees(lam12) + 180.0) - "
        f"  floor((lon + degrees(lam12) + 180.0) / 360.0) * 360.0 - 180.0, 6) AS dest_lon, "
        f"round(degrees(atan2(sb2, (1.0 - {f!r}) * cb2)), 6) AS dest_lat "
        f"FROM lam"
    )


ORACLE_BUILDERS["geodesic_dest_pts"] = q_geodesic_dest_pts


GEO_DENSIFY_MAX_LEN = 20_000.0  # meters
GEO_DENSIFY_POLY_MOD = 5


def q_densify_geo_counts(sf_dir: str) -> str:
    """Metric-generic densify over the GEODESIC metric (r4, VERDICT r3
    missing #4): the per-segment Karney inverse DISTANCE recomputed in
    SQL — same canonicalization + 60-round bisection + GL-32 I1 as
    q_geodesic_to_hot, generalized from (point, hot) to arbitrary
    segment endpoints keyed by polygon_id|seg_idx; azimuth stages
    dropped (s12 is canonicalization-invariant).  Counts mirror
    q_densify_hav_counts."""
    import numpy as np

    from .kernels.geodesic import _NODES, _WEIGHTS, WGS84_A, WGS84_F

    f = WGS84_F
    b = WGS84_A * (1 - f)
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    glw = ", ".join(f"({x!r}, {w!r})" for x, w in zip(_NODES, _WEIGHTS))
    segs = datagen.segments_path(sf_dir)

    def tri(alpha: str) -> str:
        return (
            f"SELECT *, sin({alpha}) AS sal, cos({alpha}) AS cal FROM __IN__"
            f"), y2 AS (SELECT *, sal * cb1 AS sa0, "
            f"  sqrt(cal * cal + (sal * sb1) * (sal * sb1)) AS ca0 FROM y1"
            f"), y3 AS (SELECT *, {ep2!r} * ca0 * ca0 AS k2, "
            f"  atan2(sb1, cal * cb1) AS sigma1, "
            f"  atan2(sa0 * sb1, cal * cb1) AS omega1, "
            f"  least(greatest(sa0 / cb2, -1.0), 1.0) AS salp2 FROM y2"
            f"), y4 AS (SELECT *, sqrt(greatest(0.0, 1.0 - salp2 * salp2)) AS calp2 FROM y3"
            f"), y5 AS (SELECT *, atan2(sb2, calp2 * cb2) AS sigma2, "
            f"  atan2(sa0 * sb2, calp2 * cb2) AS omega2 FROM y4"
        )

    i3 = (
        "SELECT t.k, "
        "  0.5 * (t.sigma2 - t.sigma1) * sum(g.w * (2.0 - {f}) / "
        "    (1.0 + (1.0 - {f}) * sqrt(1.0 + t.k2 * "
        "     pow(sin(0.5 * (t.sigma1 + t.sigma2) + 0.5 * (t.sigma2 - t.sigma1) * g.x), 2)))) AS i3 "
        "  FROM __T__ t CROSS JOIN glw g GROUP BY t.k, t.sigma1, t.sigma2, t.k2"
    ).replace("{f}", repr(f))
    return (
        f"WITH RECURSIVE src AS ("
        f"  SELECT polygon_id || '|' || seg_idx AS k, polygon_id, "
        f"    x1 AS ln1, y1 AS lt1i, x2 AS ln2, y2 AS lt2i "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0 "
        f"    AND CAST(substr(polygon_id, 6) AS BIGINT) % {GEO_DENSIFY_POLY_MOD} = 0), "
        f"glw(x, w) AS (SELECT * FROM (VALUES {glw})), "
        f"base AS (SELECT k, lt1i, lt2i, "
        f"  (ln2 - ln1 + 180.0) - floor((ln2 - ln1 + 180.0) / 360.0) * 360.0 - 180.0 AS lon12 "
        f"  FROM src), "
        f"cn0 AS (SELECT k, "
        f"  CASE WHEN abs(lt1i) < abs(lt2i) THEN lt2i ELSE lt1i END AS lt1r, "
        f"  CASE WHEN abs(lt1i) < abs(lt2i) THEN lt1i ELSE lt2i END AS lt2r, "
        f"  radians(abs(lon12)) AS lam_t FROM base), "
        f"cn AS (SELECT k, lam_t, "
        f"  lt1r * (CASE WHEN lt1r > 0 THEN -1.0 ELSE 1.0 END) AS lt1, "
        f"  lt2r * (CASE WHEN lt1r > 0 THEN -1.0 ELSE 1.0 END) AS lt2 FROM cn0), "
        f"tb AS (SELECT k, lam_t, "
        f"  atan2((1.0 - {f!r}) * sin(radians(lt1)), cos(radians(lt1))) AS beta1, "
        f"  atan2((1.0 - {f!r}) * sin(radians(lt2)), cos(radians(lt2))) AS beta2 FROM cn), "
        f"tc AS (SELECT *, sin(beta1) AS sb1, cos(beta1) AS cb1, "
        f"  sin(beta2) AS sb2, cos(beta2) AS cb2 FROM tb), "
        f"it(k, sb1, cb1, sb2, cb2, lam_t, lo, hi, r) AS ("
        f"  SELECT k, sb1, cb1, sb2, cb2, lam_t, 1e-12, pi() - 1e-12, 0 FROM tc "
        f"  UNION ALL ("
        f"  WITH cur AS (SELECT *, (lo + hi) / 2.0 AS mid FROM it WHERE r < 60), "
        f"  y1 AS ({tri('mid').replace('__IN__', 'cur')}), "
        f"  iv AS ({i3.replace('__T__', 'y5')}), "
        f"  hh AS (SELECT y5.*, "
        f"    (y5.omega2 - y5.omega1) - {f!r} * y5.sa0 * iv.i3 - y5.lam_t AS h "
        f"    FROM y5 JOIN iv ON iv.k = y5.k) "
        f"  SELECT k, sb1, cb1, sb2, cb2, lam_t, "
        f"    CASE WHEN h < 0 THEN mid ELSE lo END, "
        f"    CASE WHEN h < 0 THEN hi ELSE mid END, r + 1 FROM hh)), "
        f"fin0 AS (SELECT *, (lo + hi) / 2.0 AS alpha FROM it WHERE r = 60), "
        f"y1 AS ({tri('alpha').replace('__IN__', 'fin0')}), "
        f"i1v AS (SELECT t.k, "
        f"  0.5 * (t.sigma2 - t.sigma1) * sum(g.w * sqrt(1.0 + t.k2 * "
        f"    pow(sin(0.5 * (t.sigma1 + t.sigma2) + 0.5 * (t.sigma2 - t.sigma1) * g.x), 2))) AS i1 "
        f"  FROM y5 t CROSS JOIN glw g GROUP BY t.k, t.sigma1, t.sigma2, t.k2) "
        f"SELECT src.polygon_id, "
        f"(count(*) + sum(GREATEST(ceil(({b!r} * i1v.i1) / {GEO_DENSIFY_MAX_LEN!r}) - 1, 0)))::BIGINT "
        f"AS n_geo_densified_edges "
        f"FROM i1v JOIN src ON src.k = i1v.k GROUP BY src.polygon_id"
    )


ORACLE_BUILDERS["densify_geo_counts"] = q_densify_geo_counts


SEGMENTIZE_N = 7
SEGMENTIZE_LINE_MOD = 4


def q_segmentize_hav_pieces(sf_dir: str) -> str:
    """LineStringSegmentizeHaversine oracle (r4): pieces are equal
    haversine length by construction, so piece_len = total/n recomputed
    from the raw segment table; per-piece vertex count = 2 + original
    vertices whose cumulative length falls strictly inside the piece
    interval (j*L/n, (j+1)*L/n)."""
    segs = datagen.line_segments_path(sf_dir)
    n = SEGMENTIZE_N
    hav = _hav_expr("x1", "y1", "x2", "y2")
    return (
        f"WITH sl AS (SELECT line_id, seg_idx, ({hav}) AS hlen "
        f"  FROM read_parquet('{segs}') "
        f"  WHERE CAST(substr(line_id, 6) AS BIGINT) % {SEGMENTIZE_LINE_MOD} = 0), "
        f"tot AS (SELECT line_id, sum(hlen) AS L FROM sl GROUP BY line_id), "
        # cumulative length at the END vertex of each segment == the
        # cumulative position of interior vertex (seg_idx + 1)
        f"cum AS (SELECT line_id, seg_idx, "
        f"  sum(hlen) OVER (PARTITION BY line_id ORDER BY seg_idx "
        f"    ROWS UNBOUNDED PRECEDING) AS c FROM sl), "
        f"pieces AS (SELECT t.line_id, u.j AS piece_idx, t.L "
        f"  FROM tot t CROSS JOIN (SELECT unnest(range(0, {n})) AS j) u), "
        # interior vertices strictly inside each piece interval: the end
        # vertex of segment s (s < last) at cumulative c
        f"inner_v AS (SELECT c.line_id, "
        f"  CAST(floor(c.c / (t.L / {n})) AS BIGINT) AS piece_idx "
        f"  FROM cum c JOIN tot t USING (line_id) "
        f"  JOIN (SELECT line_id, max(seg_idx) AS mx FROM sl GROUP BY line_id) m "
        f"    ON m.line_id = c.line_id AND c.seg_idx < m.mx "
        f"  WHERE fmod(c.c, t.L / {n}) > 0), "
        f"cnt AS (SELECT line_id, piece_idx, count(*) AS nin FROM inner_v "
        f"  GROUP BY line_id, piece_idx) "
        f"SELECT p.line_id, p.piece_idx, "
        f"(2 + coalesce(cnt.nin, 0))::BIGINT AS n_vertices, "
        f"round(p.L / {n}, 3) AS piece_len_m "
        f"FROM pieces p LEFT JOIN cnt ON cnt.line_id = p.line_id "
        f"AND cnt.piece_idx = p.piece_idx"
    )


ORACLE_BUILDERS["segmentize_hav_pieces"] = q_segmentize_hav_pieces


def q_geodesic_poly_area(sf_dir: str) -> str:
    """Ellipsoidal ring area in SQL (r3): per EDGE, the same
    canonicalization + bisection alpha solve as q_geodesic_to_hot,
    then the Green's-theorem integrand F(phi)*(omega' - f*sa0*i3)
    through the 32-node GL rule; signed edge contributions sum per
    polygon (lonsign*latsign), |total| in km^2 at 4dp.  atanh via
    0.5*ln((1+x)/(1-x))."""
    import numpy as np

    from .kernels.geodesic import _NODES, _WEIGHTS, WGS84_A, WGS84_F

    f = WGS84_F
    a = WGS84_A
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    e1 = float(np.sqrt(e2))
    fconst = a * a * (1 - e2) / 2.0
    glw = ", ".join(f"({x!r}, {w!r})" for x, w in zip(_NODES, _WEIGHTS))
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH RECURSIVE glw(x, w) AS (SELECT * FROM (VALUES {glw})), "
        f"e0 AS (SELECT polygon_id, seg_idx, x1 AS lo1, y1 AS la1, x2 AS lo2, y2 AS la2 "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0), "
        f"c0 AS (SELECT *, "
        f"  (lo2 - lo1 + 180.0) - floor((lo2 - lo1 + 180.0) / 360.0) * 360.0 - 180.0 AS lon12 "
        f"  FROM e0), "
        f"c1 AS (SELECT polygon_id, seg_idx, "
        f"  (CASE WHEN lon12 < 0 THEN -1.0 ELSE 1.0 END) AS lonsign, "
        f"  radians(abs(lon12)) AS lam_t, "
        f"  CASE WHEN abs(la1) < abs(la2) THEN la2 ELSE la1 END AS lt1r, "
        f"  CASE WHEN abs(la1) < abs(la2) THEN la1 ELSE la2 END AS lt2r FROM c0), "
        f"c2 AS (SELECT polygon_id, seg_idx, lonsign, lam_t, "
        f"  CASE WHEN lt1r > 0 THEN -1.0 ELSE 1.0 END AS latsign, "
        f"  lt1r * (CASE WHEN lt1r > 0 THEN -1.0 ELSE 1.0 END) AS lt1, "
        f"  lt2r * (CASE WHEN lt1r > 0 THEN -1.0 ELSE 1.0 END) AS lt2 FROM c1), "
        f"c3 AS (SELECT *, "
        f"  atan2((1.0 - {f!r}) * sin(radians(lt1)), cos(radians(lt1))) AS beta1, "
        f"  atan2((1.0 - {f!r}) * sin(radians(lt2)), cos(radians(lt2))) AS beta2 FROM c2), "
        f"c4 AS (SELECT *, sin(beta1) AS sb1, cos(beta1) AS cb1, "
        f"  sin(beta2) AS sb2, cos(beta2) AS cb2 FROM c3 "
        f"  WHERE lam_t >= 1e-15 AND NOT (abs(beta1) < 1e-15 AND abs(beta2) < 1e-15)), "
        f"it(polygon_id, seg_idx, lonsign, latsign, sb1, cb1, sb2, cb2, lam_t, lo, hi, r) AS ("
        f"  SELECT polygon_id, seg_idx, lonsign, latsign, sb1, cb1, sb2, cb2, lam_t, "
        f"    1e-12, pi() - 1e-12, 0 FROM c4 "
        f"  UNION ALL ("
        f"  WITH cur AS (SELECT *, (lo + hi) / 2.0 AS mid FROM it WHERE r < 60), "
        f"  y1 AS (SELECT *, sin(mid) AS sal, cos(mid) AS cal FROM cur), "
        f"  y2 AS (SELECT *, sal * cb1 AS sa0, "
        f"    sqrt(cal * cal + (sal * sb1) * (sal * sb1)) AS ca0 FROM y1), "
        f"  y3 AS (SELECT *, {ep2!r} * ca0 * ca0 AS k2, "
        f"    atan2(sb1, cal * cb1) AS sigma1, atan2(sa0 * sb1, cal * cb1) AS omega1, "
        f"    least(greatest(sa0 / cb2, -1.0), 1.0) AS salp2 FROM y2), "
        f"  y4 AS (SELECT *, sqrt(greatest(0.0, 1.0 - salp2 * salp2)) AS calp2 FROM y3), "
        f"  y5 AS (SELECT *, atan2(sb2, calp2 * cb2) AS sigma2, "
        f"    atan2(sa0 * sb2, calp2 * cb2) AS omega2 FROM y4), "
        f"  iv AS (SELECT t.polygon_id, t.seg_idx, "
        f"    0.5 * (t.sigma2 - t.sigma1) * sum(g.w * (2.0 - {f!r}) / "
        f"      (1.0 + (1.0 - {f!r}) * sqrt(1.0 + t.k2 * "
        f"       pow(sin(0.5 * (t.sigma1 + t.sigma2) + 0.5 * (t.sigma2 - t.sigma1) * g.x), 2)))) AS i3 "
        f"    FROM y5 t CROSS JOIN glw g "
        f"    GROUP BY t.polygon_id, t.seg_idx, t.sigma1, t.sigma2, t.k2) "
        f"  SELECT y5.polygon_id, y5.seg_idx, y5.lonsign, y5.latsign, "
        f"    y5.sb1, y5.cb1, y5.sb2, y5.cb2, y5.lam_t, "
        f"    CASE WHEN (y5.omega2 - y5.omega1) - {f!r} * y5.sa0 * iv.i3 - y5.lam_t < 0 "
        f"      THEN y5.mid ELSE y5.lo END, "
        f"    CASE WHEN (y5.omega2 - y5.omega1) - {f!r} * y5.sa0 * iv.i3 - y5.lam_t < 0 "
        f"      THEN y5.hi ELSE y5.mid END, y5.r + 1 "
        f"  FROM y5 JOIN iv ON iv.polygon_id = y5.polygon_id AND iv.seg_idx = y5.seg_idx)), "
        f"f0 AS (SELECT *, (lo + hi) / 2.0 AS alpha FROM it WHERE r = 60), "
        f"z1 AS (SELECT *, sin(alpha) AS sal, cos(alpha) AS cal FROM f0), "
        f"z2 AS (SELECT *, sal * cb1 AS sa0, "
        f"  sqrt(cal * cal + (sal * sb1) * (sal * sb1)) AS ca0 FROM z1), "
        f"z3 AS (SELECT *, {ep2!r} * ca0 * ca0 AS k2, "
        f"  atan2(sb1, cal * cb1) AS sigma1, "
        f"  least(greatest(sa0 / cb2, -1.0), 1.0) AS salp2 FROM z2), "
        f"z4 AS (SELECT *, atan2(sb2, sqrt(greatest(0.0, 1.0 - salp2 * salp2)) * cb2) AS sigma2 "
        f"  FROM z3), "
        f"nodes AS (SELECT z4.polygon_id, z4.seg_idx, z4.lonsign, z4.latsign, "
        f"  z4.sa0, z4.ca0, z4.k2, 0.5 * (z4.sigma2 - z4.sigma1) AS half, "
        f"  sin(0.5 * (z4.sigma1 + z4.sigma2) + 0.5 * (z4.sigma2 - z4.sigma1) * g.x) AS ss, "
        f"  cos(0.5 * (z4.sigma1 + z4.sigma2) + 0.5 * (z4.sigma2 - z4.sigma1) * g.x) AS cs, "
        f"  g.w AS w FROM z4 CROSS JOIN glw g), "
        f"nd2 AS (SELECT *, "
        f"  atan2(ca0 * ss, (1.0 - {f!r}) * sqrt(cs * cs + (sa0 * ss) * (sa0 * ss))) AS phi, "
        f"  sa0 / (cs * cs + sa0 * sa0 * ss * ss) AS omega_p, "
        f"  (2.0 - {f!r}) / (1.0 + (1.0 - {f!r}) * sqrt(1.0 + k2 * ss * ss)) AS i3n FROM nodes), "
        # per-ring reference level F(phi_0), mirrored by latsign — the
        # same conditioning fix as the engine (kernels/geodesic.py)
        f"cref AS (SELECT polygon_id, "
        f"  {fconst!r} * (sin(radians(y1)) / (1.0 - {e2!r} * sin(radians(y1)) * sin(radians(y1))) "
        f"    + 0.5 * ln((1.0 + {e1!r} * sin(radians(y1))) / (1.0 - {e1!r} * sin(radians(y1)))) / {e1!r}) AS c "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0 AND seg_idx = 0), "
        f"edge AS (SELECT n.polygon_id, n.seg_idx, "
        f"  max(n.lonsign * n.latsign) * max(n.half) * sum(n.w * "
        f"    (({fconst!r} * (sin(n.phi) / (1.0 - {e2!r} * sin(n.phi) * sin(n.phi)) "
        f"      + 0.5 * ln((1.0 + {e1!r} * sin(n.phi)) / (1.0 - {e1!r} * sin(n.phi))) / {e1!r})) "
        f"     - n.latsign * cref.c) "
        f"    * (n.omega_p - {f!r} * n.sa0 * n.i3n)) AS ic "
        f"  FROM nd2 n JOIN cref ON cref.polygon_id = n.polygon_id "
        f"  GROUP BY n.polygon_id, n.seg_idx) "
        f"SELECT polygon_id, round(abs(sum(ic)) / 1e6, 4) AS geodesic_area_km2 "
        f"FROM edge GROUP BY polygon_id"
    )


ORACLE_BUILDERS["geodesic_poly_area"] = q_geodesic_poly_area


def q_line_clip_pieces(sf_dir: str) -> str:
    """Exact LineString/Polygon ClipOp in SQL (r3): per candidate
    (line, polygon) pair, split every line segment at its strict
    crossings with ANY ring edge (identical t = d3/(d3-d4) formula to
    linejoin.clip_line_to_polygon), classify piece midpoints by
    crossing parity over the polygon's full segment table, then count
    maximal same-side RUNS with a LAG window (pieces merge across
    segment joints exactly like the engine's cur_inside/cur_outside
    accumulators).  Pairs emitted iff at least one inside piece."""
    lines = datagen.lines_path(sf_dir)
    lsegs = datagen.line_segments_path(sf_dir)
    polys = datagen.polygons_path(sf_dir)
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH l AS (SELECT line_id, minx, miny, maxx, maxy FROM read_parquet('{lines}')), "
        f"p AS (SELECT polygon_id, minx, miny, maxx, maxy FROM read_parquet('{polys}')), "
        f"cand AS (SELECT l.line_id, p.polygon_id FROM l JOIN p "
        f"  ON l.minx <= p.maxx AND l.maxx >= p.minx "
        f"  AND l.miny <= p.maxy AND l.maxy >= p.miny), "
        f"ls AS (SELECT * FROM read_parquet('{lsegs}')), "
        f"es AS (SELECT * FROM read_parquet('{segs}')), "
        f"xs AS (SELECT c.line_id, c.polygon_id, a.seg_idx, "
        f"  (b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1) AS d3, "
        f"  (b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1) AS d4 "
        f"  FROM cand c "
        f"  JOIN ls a ON a.line_id = c.line_id "
        f"  JOIN es b ON b.polygon_id = c.polygon_id "
        f"  WHERE sign((a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1)) * "
        f"        sign((a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1)) < 0 "
        f"    AND sign((b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1)) * "
        f"        sign((b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1)) < 0), "
        f"cuts AS (SELECT DISTINCT line_id, polygon_id, seg_idx, "
        f"  d3 / (CASE WHEN d3 - d4 = 0 THEN 1.0 ELSE d3 - d4 END) AS t FROM xs "
        f"  UNION SELECT line_id, polygon_id, seg_idx, 0.0 "
        f"    FROM cand JOIN ls USING (line_id) "
        f"  UNION SELECT line_id, polygon_id, seg_idx, 1.0 "
        f"    FROM cand JOIN ls USING (line_id)), "
        f"pieces AS (SELECT c.line_id, c.polygon_id, c.seg_idx, c.t AS a, "
        f"  lead(c.t) OVER (PARTITION BY c.line_id, c.polygon_id, c.seg_idx ORDER BY c.t) AS b "
        f"  FROM cuts c), "
        f"pc AS (SELECT pz.*, s.x1 + 0.5 * (a + b) * (s.x2 - s.x1) AS mx, "
        f"  s.y1 + 0.5 * (a + b) * (s.y2 - s.y1) AS my, "
        f"  sqrt((s.x2 - s.x1) * (s.x2 - s.x1) + (s.y2 - s.y1) * (s.y2 - s.y1)) * (b - a) AS plen "
        f"  FROM pieces pz JOIN ls s ON s.line_id = pz.line_id AND s.seg_idx = pz.seg_idx "
        f"  WHERE pz.b IS NOT NULL AND pz.b > pz.a), "
        f"cls AS (SELECT pc.line_id, pc.polygon_id, pc.seg_idx, pc.a, pc.plen, "
        f"  (SELECT count(*) FROM es s WHERE s.polygon_id = pc.polygon_id "
        f"    AND ((s.y1 <= pc.my AND s.y2 > pc.my) OR (s.y2 <= pc.my AND s.y1 > pc.my)) "
        f"    AND pc.mx < s.x1 + (pc.my - s.y1) * (s.x2 - s.x1) / (s.y2 - s.y1)) % 2 = 1 AS inside "
        f"  FROM pc), "
        f"runs AS (SELECT *, CASE WHEN inside = lag(inside) OVER w THEN 0 ELSE 1 END AS brk "
        f"  FROM cls WINDOW w AS (PARTITION BY line_id, polygon_id ORDER BY seg_idx, a)), "
        f"agg AS (SELECT line_id, polygon_id, "
        f"  sum(CASE WHEN inside AND coalesce(brk, 1) = 1 THEN 1 ELSE 0 END)::BIGINT AS n_pieces_in, "
        f"  sum(CASE WHEN NOT inside AND coalesce(brk, 1) = 1 THEN 1 ELSE 0 END)::BIGINT AS n_pieces_out, "
        f"  round(sum(CASE WHEN inside THEN plen ELSE 0.0 END), 6) AS len_in, "
        f"  round(sum(CASE WHEN NOT inside THEN plen ELSE 0.0 END), 6) AS len_out "
        f"  FROM runs GROUP BY line_id, polygon_id) "
        f"SELECT * FROM agg WHERE n_pieces_in >= 1"
    )


ORACLE_BUILDERS["line_clip_pieces"] = q_line_clip_pieces


def q_kmeans_radius(sf_dir: str) -> str:
    """KMeans + max_radius subdivision in SQL (r3): the Lloyd phase is
    the recursive CTE of q_kmeans_assign; the up-to-10 split rounds
    are UNROLLED as generated CTE chains (a round with no oversized
    cluster degenerates to a no-op, which mirrors the engine's early
    break).  Each round: per-cluster farthest point (ties by
    (d, lon, lat) — the engine's lexicographic max), 5 inner 2-means
    iterations over the oversized clusters with the same global
    tolerance stop, then label/center updates with new ids assigned in
    sorted-cluster order starting at the running center count."""
    k, mi = KMEANS_K, KMEANS_MAX_ITER
    rmax = 12.0
    tol = 1e-4
    parts = [
        f"WITH RECURSIVE pts AS MATERIALIZED ({_pts_cte(sf_dir)}), ",
        f"n AS (SELECT count(*) AS n FROM pts), ",
        f"seeds AS (SELECT image_id, lon, lat FROM pts "
        f"  WHERE CAST(substr(image_id, 5) AS BIGINT) % "
        f"    (SELECT greatest(n // {k}, 1) FROM n) = 0 "
        f"  ORDER BY image_id LIMIT {k}), ",
        f"cent(r, cluster, cx, cy, stop) AS ("
        f"  SELECT 0, row_number() OVER (ORDER BY image_id) - 1, lon, lat, false FROM seeds "
        f"  UNION ALL ("
        f"  WITH cur AS (SELECT * FROM cent WHERE r < {mi} AND NOT stop), "
        f"  asg AS (SELECT p.image_id, p.lon, p.lat, c.cluster, "
        f"    row_number() OVER (PARTITION BY p.image_id ORDER BY "
        f"      (p.lon - c.cx) * (p.lon - c.cx) + (p.lat - c.cy) * (p.lat - c.cy), c.cluster) AS rn "
        f"    FROM pts p CROSS JOIN cur c), "
        f"  agg AS (SELECT cluster, sum(lon) AS sx, sum(lat) AS sy, count(*) AS cnt "
        f"    FROM asg WHERE rn = 1 GROUP BY cluster), "
        f"  nxt AS (SELECT c.r + 1 AS r, c.cluster, "
        f"    CASE WHEN a.cnt > 0 THEN a.sx / a.cnt ELSE c.cx END AS cx, "
        f"    CASE WHEN a.cnt > 0 THEN a.sy / a.cnt ELSE c.cy END AS cy, "
        f"    c.cx AS ox, c.cy AS oy "
        f"    FROM cur c LEFT JOIN agg a ON a.cluster = c.cluster), "
        f"  sh AS (SELECT max(sqrt((cx - ox) * (cx - ox) + (cy - oy) * (cy - oy))) AS shift FROM nxt) "
        f"  SELECT r, cluster, cx, cy, (SELECT shift FROM sh) < {tol!r} FROM nxt)), ",
        # frozen parents + initial labels/centers
        f"cb AS (SELECT cluster, cx, cy FROM cent WHERE r = (SELECT max(r) FROM cent)), ",
        f"lbl_0 AS MATERIALIZED (SELECT image_id, lon, lat, cluster FROM ("
        f"  SELECT p.image_id, p.lon, p.lat, c.cluster, "
        f"    row_number() OVER (PARTITION BY p.image_id ORDER BY "
        f"      (p.lon - c.cx) * (p.lon - c.cx) + (p.lat - c.cy) * (p.lat - c.cy), c.cluster) AS rn "
        f"  FROM pts p CROSS JOIN cb c) WHERE rn = 1), ",
        f"cen_0 AS MATERIALIZED (SELECT cluster, cx, cy FROM cb), ",
    ]
    for r in range(10):
        # radius pass: farthest member per cluster, ties (d, lon, lat)
        parts.append(
            f"rad_{r} AS MATERIALIZED (SELECT cluster, maxd, flon, flat FROM ("
            f"  SELECT l.cluster, "
            f"    sqrt((l.lon - c.cx) * (l.lon - c.cx) + (l.lat - c.cy) * (l.lat - c.cy)) AS maxd, "
            f"    l.lon AS flon, l.lat AS flat, "
            f"    row_number() OVER (PARTITION BY l.cluster ORDER BY "
            f"      sqrt((l.lon - c.cx) * (l.lon - c.cx) + (l.lat - c.cy) * (l.lat - c.cy)) DESC, "
            f"      l.lon DESC, l.lat DESC) AS rn "
            f"  FROM lbl_{r} l JOIN cen_{r} c ON c.cluster = l.cluster) WHERE rn = 1), "
        )
        parts.append(
            f"bad_{r} AS MATERIALIZED (SELECT rad_{r}.cluster, c.cx AS c0x, c.cy AS c0y, "
            f"  rad_{r}.flon AS c1x, rad_{r}.flat AS c1y, "
            f"  row_number() OVER (ORDER BY rad_{r}.cluster) - 1 AS j "
            f"  FROM rad_{r} JOIN cen_{r} c ON c.cluster = rad_{r}.cluster "
            f"  WHERE rad_{r}.maxd > {rmax!r}), "
        )
        # 5 inner 2-means iterations with global tolerance stop
        parts.append(f"ch_{r}_0 AS MATERIALIZED (SELECT cluster, c0x, c0y, c1x, c1y, false AS stop FROM bad_{r}), ")
        for t in range(5):
            parts.append(
                f"up_{r}_{t} AS MATERIALIZED (SELECT b.cluster, "
                f"  sum(CASE WHEN (l.lon - b.c1x) * (l.lon - b.c1x) + (l.lat - b.c1y) * (l.lat - b.c1y) "
                f"       < (l.lon - b.c0x) * (l.lon - b.c0x) + (l.lat - b.c0y) * (l.lat - b.c0y) "
                f"      THEN 0.0 ELSE l.lon END) AS sx0, "
                f"  sum(CASE WHEN (l.lon - b.c1x) * (l.lon - b.c1x) + (l.lat - b.c1y) * (l.lat - b.c1y) "
                f"       < (l.lon - b.c0x) * (l.lon - b.c0x) + (l.lat - b.c0y) * (l.lat - b.c0y) "
                f"      THEN 0.0 ELSE l.lat END) AS sy0, "
                f"  sum(CASE WHEN (l.lon - b.c1x) * (l.lon - b.c1x) + (l.lat - b.c1y) * (l.lat - b.c1y) "
                f"       < (l.lon - b.c0x) * (l.lon - b.c0x) + (l.lat - b.c0y) * (l.lat - b.c0y) "
                f"      THEN 0 ELSE 1 END) AS n0, "
                f"  sum(CASE WHEN (l.lon - b.c1x) * (l.lon - b.c1x) + (l.lat - b.c1y) * (l.lat - b.c1y) "
                f"       < (l.lon - b.c0x) * (l.lon - b.c0x) + (l.lat - b.c0y) * (l.lat - b.c0y) "
                f"      THEN l.lon ELSE 0.0 END) AS sx1, "
                f"  sum(CASE WHEN (l.lon - b.c1x) * (l.lon - b.c1x) + (l.lat - b.c1y) * (l.lat - b.c1y) "
                f"       < (l.lon - b.c0x) * (l.lon - b.c0x) + (l.lat - b.c0y) * (l.lat - b.c0y) "
                f"      THEN l.lat ELSE 0.0 END) AS sy1, "
                f"  sum(CASE WHEN (l.lon - b.c1x) * (l.lon - b.c1x) + (l.lat - b.c1y) * (l.lat - b.c1y) "
                f"       < (l.lon - b.c0x) * (l.lon - b.c0x) + (l.lat - b.c0y) * (l.lat - b.c0y) "
                f"      THEN 1 ELSE 0 END) AS n1 "
                f"  FROM ch_{r}_{t} b JOIN lbl_{r} l ON l.cluster = b.cluster GROUP BY b.cluster), "
            )
            parts.append(
                f"nx_{r}_{t} AS MATERIALIZED (SELECT c.cluster, "
                f"  CASE WHEN c.stop OR u.n0 = 0 THEN c.c0x ELSE u.sx0 / u.n0 END AS c0x, "
                f"  CASE WHEN c.stop OR u.n0 = 0 THEN c.c0y ELSE u.sy0 / u.n0 END AS c0y, "
                f"  CASE WHEN c.stop OR u.n1 = 0 THEN c.c1x ELSE u.sx1 / u.n1 END AS c1x, "
                f"  CASE WHEN c.stop OR u.n1 = 0 THEN c.c1y ELSE u.sy1 / u.n1 END AS c1y, "
                f"  c.c0x AS o0x, c.c0y AS o0y, c.c1x AS o1x, c.c1y AS o1y, c.stop AS ostop "
                f"  FROM ch_{r}_{t} c LEFT JOIN up_{r}_{t} u ON u.cluster = c.cluster), "
            )
            parts.append(
                f"ch_{r}_{t + 1} AS MATERIALIZED (SELECT cluster, c0x, c0y, c1x, c1y, "
                f"  ostop OR (SELECT coalesce(max(greatest("
                f"    sqrt((c0x - o0x) * (c0x - o0x) + (c0y - o0y) * (c0y - o0y)), "
                f"    sqrt((c1x - o1x) * (c1x - o1x) + (c1y - o1y) * (c1y - o1y)))), 0.0) "
                f"    FROM nx_{r}_{t}) < {tol!r} AS stop "
                f"  FROM nx_{r}_{t}), "
            )
        parts.append(
            f"spl_{r} AS MATERIALIZED (SELECT c.cluster, c.c0x, c.c0y, c.c1x, c.c1y, "
            f"  (SELECT count(*) FROM cen_{r}) + b.j AS new_id "
            f"  FROM ch_{r}_5 c JOIN bad_{r} b ON b.cluster = c.cluster), "
        )
        parts.append(
            f"lbl_{r + 1} AS MATERIALIZED (SELECT l.image_id, l.lon, l.lat, "
            f"  CASE WHEN s.cluster IS NULL THEN l.cluster "
            f"    WHEN (l.lon - s.c1x) * (l.lon - s.c1x) + (l.lat - s.c1y) * (l.lat - s.c1y) "
            f"       < (l.lon - s.c0x) * (l.lon - s.c0x) + (l.lat - s.c0y) * (l.lat - s.c0y) "
            f"    THEN s.new_id ELSE l.cluster END AS cluster "
            f"  FROM lbl_{r} l LEFT JOIN spl_{r} s ON s.cluster = l.cluster), "
        )
        parts.append(
            f"cen_{r + 1} AS MATERIALIZED (SELECT c.cluster, "
            f"  coalesce(s.c0x, c.cx) AS cx, coalesce(s.c0y, c.cy) AS cy "
            f"  FROM cen_{r} c LEFT JOIN spl_{r} s ON s.cluster = c.cluster "
            f"  UNION ALL SELECT new_id, c1x, c1y FROM spl_{r}), "
        )
    sql = "".join(parts)
    sql = sql.rstrip().rstrip(",")
    return sql + " SELECT image_id, cluster FROM lbl_10"


ORACLE_BUILDERS["kmeans_radius"] = q_kmeans_radius


def q_union_area_sweep(sf_dir: str) -> str:
    """Global vertical-strip sweep in SQL (r3): breakpoints = all
    vertex x's + pairwise proper-crossing x's; per strip, events are
    segment y's at the strip midpoint, occurrence parity per
    (strip, polygon) gives +1/-1 toggles, a windowed running sum
    counts covering polygons, and gaps with count > 0 accumulate.
    Extra/missing ulp-level breakpoints cannot change the integral, so
    this matches the engine's cell-decomposed sweep to fp noise."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH s AS (SELECT polygon_id, x1, y1, x2, y2, "
        f"  least(x1, x2) AS xlo, greatest(x1, x2) AS xhi, "
        f"  least(y1, y2) AS ylo, greatest(y1, y2) AS yhi "
        f"  FROM read_parquet('{segs}')), "
        f"bx AS (SELECT x1 AS x FROM s UNION SELECT x2 FROM s "
        f"  UNION SELECT a.x1 + (a.d3 / (a.d3 - a.d4)) * (a.x2 - a.x1) FROM ("
        f"    SELECT a.x1, a.x2, "
        f"      (b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1) AS d3, "
        f"      (b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1) AS d4 "
        f"    FROM s a JOIN s b ON a.xlo <= b.xhi AND a.xhi >= b.xlo "
        f"      AND a.ylo <= b.yhi AND a.yhi >= b.ylo "
        f"    WHERE sign((a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1)) * "
        f"          sign((a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1)) < 0 "
        f"      AND sign((b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1)) * "
        f"          sign((b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1)) < 0) a "
        f"  WHERE a.d3 - a.d4 <> 0), "
        f"strips AS (SELECT x AS xl, lead(x) OVER (ORDER BY x) AS xr, "
        f"  row_number() OVER (ORDER BY x) AS sid FROM (SELECT DISTINCT x FROM bx)), "
        f"st2 AS (SELECT sid, xl, xr, (xl + xr) / 2.0 AS mid FROM strips WHERE xr IS NOT NULL), "
        f"ev AS (SELECT t.sid, t.xl, t.xr, s.polygon_id, "
        f"  s.y1 + (t.mid - s.x1) * (s.y2 - s.y1) / (s.x2 - s.x1) AS y "
        f"  FROM st2 t JOIN s ON s.xlo <= t.mid AND s.xhi > t.mid AND s.x1 <> s.x2), "
        f"tog AS (SELECT *, CASE WHEN row_number() OVER "
        f"  (PARTITION BY sid, polygon_id ORDER BY y) % 2 = 1 THEN 1 ELSE -1 END AS delta "
        f"  FROM ev), "
        f"cov AS (SELECT sid, xl, xr, y, "
        f"  sum(delta) OVER (PARTITION BY sid ORDER BY y, polygon_id, delta "
        f"    ROWS UNBOUNDED PRECEDING) AS cnt, "
        f"  lead(y) OVER (PARTITION BY sid ORDER BY y, polygon_id, delta) AS ny "
        f"  FROM tog) "
        f"SELECT round(coalesce(sum(CASE WHEN cnt > 0 AND ny IS NOT NULL "
        f"  THEN (xr - xl) * (ny - y) ELSE 0 END), 0.0), 6) AS union_area FROM cov"
    )


ORACLE_BUILDERS["union_area_sweep"] = q_union_area_sweep


def q_map_coords_shift(sf_dir: str) -> str:
    polys = datagen.polygons_path(sf_dir)
    return (
        f"SELECT polygon_id, minx + 3.5 AS minx, miny - 1.25 AS miny, "
        f"maxx + 3.5 AS maxx, maxy - 1.25 AS maxy FROM read_parquet('{polys}')"
    )


ORACLE_BUILDERS["map_coords_shift"] = q_map_coords_shift


# ---------------------------------------------------------------------------
# r4b: corpus-hygiene LLM-pipeline oracles
# ---------------------------------------------------------------------------

def q_dup_ngram_cov(sf_dir: str) -> str:
    """Duplicate char-k-gram coverage: grams via substr string
    equality (the Ray side packs the same k bytes losslessly into
    uint64 words, so both sides compare exact substrings); per-doc
    interval union via lag + gaps-and-islands.  ASCII corpus: SQL char
    positions == Ray byte positions (same assumption as the simhash /
    winnowing oracles)."""
    from .llmtext import DUP_K as K

    return (
        f"WITH e AS (SELECT doc_id, text, "
        f"  unnest(range(1, GREATEST(length(text) - {K - 1}, 0) + 1)) AS i FROM documents), "
        f"g AS (SELECT doc_id, i, substr(text, i::INTEGER, {K}) AS gram FROM e), "
        f"dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2), "
        f"d AS (SELECT g.doc_id, g.i FROM g JOIN dup USING (gram)), "
        f"w AS (SELECT doc_id, i, lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS pi FROM d), "
        f"isl AS (SELECT doc_id, i, CASE WHEN pi IS NULL OR i > pi + {K} THEN 1 ELSE 0 END AS ni FROM w), "
        f"gid AS (SELECT doc_id, i, sum(ni) OVER (PARTITION BY doc_id ORDER BY i) AS isl_id FROM isl), "
        f"ilen AS (SELECT doc_id, isl_id, max(i) - min(i) + {K} AS clen, count(*) AS cnt "
        f"  FROM gid GROUP BY doc_id, isl_id), "
        f"agg AS (SELECT doc_id, sum(clen)::BIGINT AS dup_cov, sum(cnt)::BIGINT AS n_dup "
        f"  FROM ilen GROUP BY doc_id) "
        f"SELECT doc.doc_id, GREATEST(length(doc.text) - {K - 1}, 0)::BIGINT AS n_grams, "
        f"coalesce(agg.n_dup, 0)::BIGINT AS n_dup, coalesce(agg.dup_cov, 0)::BIGINT AS dup_cov "
        f"FROM documents doc LEFT JOIN agg ON agg.doc_id = doc.doc_id"
    )


ORACLE_BUILDERS["dup_ngram_cov"] = q_dup_ngram_cov


def q_token_rep_stats(sf_dir: str) -> str:
    """Token repetition stats with token STRING identity — agrees with
    the Ray side's 64-bit span hashes unless two distinct tokens
    collide in 64 bits."""
    return (
        "WITH t AS (SELECT doc_id, unnest(list_filter("
        "  regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok FROM documents), "
        "c AS (SELECT doc_id, tok, count(*) AS n FROM t GROUP BY doc_id, tok), "
        "a AS (SELECT doc_id, sum(n)::BIGINT AS n_tokens, count(*)::BIGINT AS n_distinct, "
        "  max(n)::BIGINT AS mx, sum(CASE WHEN n >= 2 THEN n ELSE 0 END)::BIGINT AS dup "
        "  FROM c GROUP BY doc_id) "
        "SELECT doc_id, n_tokens, n_distinct, "
        "round(mx::DOUBLE / n_tokens, 6) AS top_tok_frac, "
        "round(dup::DOUBLE / n_tokens, 6) AS dup_tok_frac FROM a"
    )


ORACLE_BUILDERS["token_rep_stats"] = q_token_rep_stats


def q_pii_scrub(sf_dir: str) -> str:
    """PII scrub: identical deterministic augmentation, then RE2
    count/replace (DuckDB's regexp engine is also RE2, so match
    semantics are shared with Arrow's kernels)."""
    from .llmtext import PII_EMAIL, PII_IPV4, PII_PHONE

    return (
        f"WITH aug AS (SELECT doc_id, text "
        f"  || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id::VARCHAR "
        f"       || '@example.com now' ELSE '' END "
        f"  || CASE WHEN doc_id % 7 = 0 THEN ' call +1-555-' "
        f"       || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END "
        f"  || CASE WHEN doc_id % 11 = 0 THEN ' host 10.0.' || (doc_id % 256)::VARCHAR "
        f"       || '.' || ((doc_id // 256) % 256)::VARCHAR ELSE '' END AS t "
        f"  FROM documents), "
        f"s1 AS (SELECT doc_id, "
        f"  len(regexp_extract_all(t, '{PII_EMAIL}'))::BIGINT AS n_email, "
        f"  len(regexp_extract_all(t, '{PII_PHONE}'))::BIGINT AS n_phone, "
        f"  regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1 FROM aug), "
        f"s2 AS (SELECT doc_id, n_email, n_phone, "
        f"  len(regexp_extract_all(t1, '{PII_IPV4}'))::BIGINT AS n_ip, "
        f"  regexp_replace(regexp_replace(t1, '{PII_PHONE}', '<PHONE>', 'g'), "
        f"    '{PII_IPV4}', '<IP>', 'g') AS scrubbed FROM s1) "
        f"SELECT doc_id, n_email, n_phone, n_ip, "
        f"length(scrubbed)::BIGINT AS scrubbed_len, scrubbed FROM s2"
    )


ORACLE_BUILDERS["pii_scrub"] = q_pii_scrub


def q_stratified_sample(sf_dir: str) -> str:
    from . import rng as _r
    from .llmtext import DEFAULT_RATE, SAMPLE_MOD, STRATA_RATES

    sm = _r.sql_splitmix64(_r.sql_u64("doc_id"))
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(r * SAMPLE_MOD))}" for s, r in STRATA_RATES.items()
    )
    dflt = int(round(DEFAULT_RATE * SAMPLE_MOD))
    return (
        f"SELECT doc_id, lang FROM documents "
        f"WHERE ({sm} % {SAMPLE_MOD}) < (CASE lang {cases} ELSE {dflt} END)::HUGEINT"
    )


ORACLE_BUILDERS["stratified_sample"] = q_stratified_sample


VW_EPS = 0.02


def q_simplify_vw_stats(sf_dir: str) -> str:
    """Visvalingam-Whyatt as a recursive CTE (r4b): each round computes
    every surviving interior vertex's effective triangle area (lag/lead
    over the alive set) and removes the per-polygon argmin — provided
    its area < eps and >3 vertices remain — which is exactly the
    reference heap's remove-smallest-first order (stale entries in the
    heap are skipped, so the heap's next FRESH pop IS the global argmin
    of the current alive set; ties break by vertex index like the
    (area, i, ...) tuples).  The float expression matches
    kernels/simplify.vw_mask term for term, so comparisons and the
    < eps test agree bit for bit."""
    segs = datagen.segments_path(sf_dir)
    e = VW_EPS
    return (
        f"WITH RECURSIVE "
        f"s AS (SELECT polygon_id, seg_idx, x1, y1 FROM read_parquet('{segs}') "
        f"  WHERE ring_idx = 0), "
        f"nv AS (SELECT polygon_id, count(*) AS k FROM s GROUP BY polygon_id), "
        f"v AS (SELECT polygon_id, seg_idx AS i, x1 AS x, y1 AS y FROM s "
        f"  UNION ALL SELECT s.polygon_id, nv.k, s.x1, s.y1 FROM s "
        f"  JOIN nv ON nv.polygon_id = s.polygon_id WHERE s.seg_idx = 0), "
        f"alive(r, pid, i, x, y) AS ("
        f"  SELECT 0, polygon_id, i, x, y FROM v "
        f"  UNION ALL ("
        f"  WITH cur AS (SELECT * FROM alive), "
        f"  cnt AS (SELECT pid, count(*) AS n FROM cur GROUP BY pid), "
        f"  tri AS (SELECT pid, i, x, y, "
        f"    lag(x) OVER w AS px, lag(y) OVER w AS py, "
        f"    lead(x) OVER w AS nx, lead(y) OVER w AS ny "
        f"    FROM cur WINDOW w AS (PARTITION BY pid ORDER BY i)), "
        f"  area AS (SELECT pid, i, "
        f"    abs((x - px) * (ny - py) - (y - py) * (nx - px)) / 2.0 AS a "
        f"    FROM tri WHERE px IS NOT NULL AND nx IS NOT NULL), "
        f"  mn AS (SELECT pid, i FROM ("
        f"    SELECT area.pid, area.i, "
        f"      row_number() OVER (PARTITION BY area.pid ORDER BY area.a, area.i) AS rn "
        f"    FROM area JOIN cnt ON cnt.pid = area.pid "
        f"    WHERE area.a < {e!r} AND cnt.n > 3) WHERE rn = 1) "
        f"  SELECT cur.r + 1, cur.pid, cur.i, cur.x, cur.y "
        f"  FROM cur JOIN mn ON mn.pid = cur.pid AND cur.i <> mn.i)), "
        f"fin AS (SELECT * FROM ("
        f"  SELECT pid, i, x, y, r, max(r) OVER (PARTITION BY pid) AS mr FROM alive) "
        f"  WHERE r = mr) "
        f"SELECT fin.pid AS polygon_id, (nv.k + 1)::BIGINT AS n_before, "
        f"count(*)::BIGINT AS n_after, "
        f"round(sum(fin.x), 6) AS sum_x, round(sum(fin.y), 6) AS sum_y "
        f"FROM fin JOIN nv ON nv.polygon_id = fin.pid "
        f"GROUP BY fin.pid, nv.k"
    )


ORACLE_BUILDERS["simplify_vw_stats"] = q_simplify_vw_stats


def q_lcc_pts(sf_dir: str) -> str:
    """Snyder LCC forward with the derived constants (n, F, rho0)
    interpolated as the exact doubles the kernel computed."""
    from .kernels import crs

    n, F, rho0 = crs._lcc_params()

    def D(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    a, e = D(crs.WGS84_A), D(float(crs._E))
    lam0 = D(crs.CONIC_LON0)
    t = (
        f"(tan(pi() / 4.0 - radians(lat) / 2.0) / "
        f"power((1.0 - {e} * sin(radians(lat))) / (1.0 + {e} * sin(radians(lat))), {e} / 2.0))"
    )
    rho = f"({a} * {D(F)} * power({t}, {D(n)}))"
    th = f"({D(n)} * radians(lon - {lam0}))"
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}) "
        f"SELECT image_id, "
        f"round({rho} * sin({th}), 2) AS lcc_x, "
        f"round({D(rho0)} - {rho} * cos({th}), 2) AS lcc_y "
        f"FROM pts"
    )


ORACLE_BUILDERS["lcc_pts"] = q_lcc_pts


def q_albers_pts(sf_dir: str) -> str:
    from .kernels import crs

    n, C, rho0 = crs._albers_params()

    def D(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    a, e = D(crs.WGS84_A), D(float(crs._E))
    e2 = D(float(crs._E2))
    lam0 = D(crs.CONIC_LON0)
    q = (
        f"((1.0 - {e2}) * (sin(radians(lat)) / (1.0 - {e2} * sin(radians(lat)) * sin(radians(lat))) "
        f"- ln((1.0 - {e} * sin(radians(lat))) / (1.0 + {e} * sin(radians(lat)))) / (2.0 * {e})))"
    )
    rho = f"({a} * sqrt({D(C)} - {D(n)} * {q}) / {D(n)})"
    th = f"({D(n)} * radians(lon - {lam0}))"
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}) "
        f"SELECT image_id, "
        f"round({rho} * sin({th}), 2) AS alb_x, "
        f"round({D(rho0)} - {rho} * cos({th}), 2) AS alb_y "
        f"FROM pts"
    )


ORACLE_BUILDERS["albers_pts"] = q_albers_pts


def q_winnow_neardup_groups(sf_dir: str) -> str:
    """Winnowing near-dup groups: per-doc DISTINCT fingerprint hashes
    (same selection CTEs as q_doc_fingerprints), df-capped rare-
    fingerprint pair counts, threshold, recursive min-label components
    (same shape as q_minhash_dedup)."""
    from .dedup import WINNOW_DF_CAP, WINNOW_T_SHARED

    B = 4294967296
    return (
        f"WITH RECURSIVE d0 AS (SELECT doc_id, text, length(text) AS n FROM documents), "
        f"ser AS (SELECT unnest(range(0, (SELECT coalesce(max(n), 1) FROM d0))) AS i), "
        f"g AS (SELECT d.doc_id, s.i, "
        f"  ('0x' || substr(md5(substr(d.text, s.i + 1, 5)), 1, 8))::BIGINT AS h "
        f"  FROM d0 d JOIN ser s ON s.i <= d.n - 5 WHERE d.n >= 5), "
        f"gn AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id), "
        f"key AS (SELECT doc_id, i, h, "
        f"  h::HUGEINT * {B} + ({B - 1} - i) AS k FROM g), "
        f"win AS (SELECT doc_id, i, "
        f"  min(k) OVER (PARTITION BY doc_id ORDER BY i "
        f"    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wk FROM key), "
        f"fps AS ("
        f"  SELECT DISTINCT w.doc_id, (w.wk // {B})::BIGINT AS h "
        f"    FROM win w JOIN gn ON gn.doc_id = w.doc_id AND gn.ng > 4 "
        f"    WHERE w.i <= gn.ng - 4 "
        f"  UNION SELECT k.doc_id, (min(k.k) // {B})::BIGINT "
        f"    FROM key k JOIN gn ON gn.doc_id = k.doc_id AND gn.ng <= 4 GROUP BY k.doc_id "
        f"  UNION SELECT doc_id, ('0x' || substr(md5(text), 1, 8))::BIGINT "
        f"    FROM d0 WHERE n > 0 AND n < 5), "
        f"df AS (SELECT h FROM fps GROUP BY h "
        f"  HAVING count(*) BETWEEN 2 AND {WINNOW_DF_CAP}), "
        f"pairs AS (SELECT a.doc_id AS a, b.doc_id AS b "
        f"  FROM fps a JOIN df ON df.h = a.h "
        f"  JOIN fps b ON b.h = a.h AND b.doc_id > a.doc_id "
        f"  GROUP BY a.doc_id, b.doc_id HAVING count(*) >= {WINNOW_T_SHARED}), "
        f"bi AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs), "
        f"reach(id, lbl) AS ("
        f"  SELECT DISTINCT a, a FROM bi "
        f"  UNION SELECT e.b, r.lbl FROM reach r JOIN bi e ON e.a = r.id WHERE r.lbl < e.b), "
        f"lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id) "
        f"SELECT d.doc_id, coalesce(lab.lbl, d.doc_id) AS \"group\", "
        f"(coalesce(lab.lbl, d.doc_id) = d.doc_id) AS keep "
        f"FROM d0 d LEFT JOIN lab ON lab.id = d.doc_id"
    )


ORACLE_BUILDERS["winnow_neardup_groups"] = q_winnow_neardup_groups


def q_normalize_text(sf_dir: str) -> str:
    return (
        "SELECT doc_id, "
        "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text, "
        "length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))::BIGINT AS norm_len "
        "FROM documents"
    )


ORACLE_BUILDERS["normalize_text"] = q_normalize_text


def q_semantic_dedup(sf_dir: str) -> str:
    """SemDeDup in SQL (r4c, dedup.semantic_dedup): deterministic
    id-sampled codebook (== q_embed_ann_ivf's cent CTE), max-cosine
    cell per vector (ties to the smaller centroid index), in-cell
    pairs at cosine >= EMB_NEARDUP_T, recursive min-label connected
    components (== q_minhash_dedup's reach CTE), group = min vec_id,
    keep = (vec_id = group)."""
    return (
        f"WITH RECURSIVE cent AS (SELECT vec_id, embedding, "
        f"  row_number() OVER (ORDER BY vec_id) - 1 AS cidx "
        f"  FROM embeddings WHERE vec_id % {ANN_CENT_MOD} = 0), "
        f"asg AS (SELECT e.vec_id, c.cidx, row_number() OVER ("
        f"  PARTITION BY e.vec_id ORDER BY "
        f"  list_cosine_similarity(e.embedding, c.embedding) DESC, c.cidx) AS rn "
        f"  FROM embeddings e CROSS JOIN cent c), "
        f"cell AS (SELECT vec_id, cidx FROM asg WHERE rn = 1), "
        f"edges AS (SELECT a.vec_id AS da, b.vec_id AS db "
        f"  FROM cell ca JOIN cell cb ON cb.cidx = ca.cidx AND cb.vec_id > ca.vec_id "
        f"  JOIN embeddings a ON a.vec_id = ca.vec_id "
        f"  JOIN embeddings b ON b.vec_id = cb.vec_id "
        f"  WHERE list_cosine_similarity(a.embedding, b.embedding) >= {EMB_NEARDUP_T}), "
        f"bi AS (SELECT da AS a, db AS b FROM edges UNION ALL SELECT db, da FROM edges), "
        f"reach(id, lbl) AS ("
        f"  SELECT DISTINCT a, a FROM bi "
        f"  UNION SELECT e.b, r.lbl FROM reach r JOIN bi e ON e.a = r.id WHERE r.lbl < e.b), "
        f"lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id) "
        f"SELECT e.vec_id, coalesce(lab.lbl, e.vec_id) AS \"group\", "
        f"(coalesce(lab.lbl, e.vec_id) = e.vec_id) AS keep "
        f"FROM embeddings e LEFT JOIN lab ON lab.id = e.vec_id"
    )


ORACLE_BUILDERS["semantic_dedup"] = q_semantic_dedup


def q_ngram_lm_score(sf_dir: str) -> str:
    """Corpus-trained add-1 bigram LM score in SQL (r4c,
    lmscore.ngram_lm_score): whitespace tokens (the token_rep_stats
    list_filter convention), bigrams via lead() per doc, counts /
    contexts / vocab by GROUP BY, per-bigram micro-nat logprob
    floor(1e6 * ln((C+1)/(ctx+V))) summed as exact BIGINTs.  Token
    identity is strings here vs 64-bit hashes on the Ray side — the
    documented collision caveat."""
    return (
        "WITH tk AS (SELECT doc_id, list_filter("
        "  regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ts FROM documents), "
        "e AS (SELECT doc_id, unnest(ts) AS tok, "
        "  unnest(range(1, length(ts) + 1)) AS i FROM tk), "
        "bg AS (SELECT doc_id, tok AS l, "
        "  lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS r FROM e), "
        "b2 AS (SELECT doc_id, l, r FROM bg WHERE r IS NOT NULL), "
        "c2 AS (SELECT l, r, count(*) AS c FROM b2 GROUP BY l, r), "
        "ctx AS (SELECT l, sum(c) AS cn FROM c2 GROUP BY l), "
        "vocab AS (SELECT count(DISTINCT tok) AS v FROM e), "
        "q AS (SELECT c2.l, c2.r, floor(1000000.0 * ln((c2.c + 1)::DOUBLE / "
        "  (ctx.cn + vocab.v)))::BIGINT AS q FROM c2 "
        "  JOIN ctx ON ctx.l = c2.l CROSS JOIN vocab), "
        "sc AS (SELECT b2.doc_id, sum(q.q)::BIGINT AS sum_q, "
        "  count(*)::BIGINT AS n_bigrams FROM b2 "
        "  JOIN q ON q.l = b2.l AND q.r = b2.r GROUP BY b2.doc_id) "
        "SELECT d.doc_id, coalesce(sc.n_bigrams, 0)::BIGINT AS n_bigrams, "
        "coalesce(sc.sum_q, 0)::BIGINT AS sum_q, "
        "CASE WHEN sc.n_bigrams > 0 THEN "
        "  ((-sc.sum_q) // sc.n_bigrams)::DOUBLE / 1000000.0 "
        "ELSE 0.0 END AS avg_nll "
        "FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id"
    )


ORACLE_BUILDERS["ngram_lm_score"] = q_ngram_lm_score


def q_decontam_overlap(sf_dir: str) -> str:
    """Train-eval char-k-gram overlap in SQL (r4c,
    llmtext.decontam_plan): eval grams via substr, DISTINCT; train
    positions joined against them; per-doc interval union via the
    q_dup_ngram_cov gaps-and-islands."""
    from .llmtext import DUP_K as K
    from .queries import DECONTAM_EVAL_MOD as MOD

    return (
        f"WITH tr AS (SELECT doc_id, text FROM documents WHERE doc_id % {MOD} <> 0), "
        f"ev AS (SELECT text FROM documents WHERE doc_id % {MOD} = 0), "
        f"ee AS (SELECT text, unnest(range(1, GREATEST(length(text) - {K - 1}, 0) + 1)) AS i FROM ev), "
        f"evg AS (SELECT DISTINCT substr(text, i::INTEGER, {K}) AS gram FROM ee), "
        f"te AS (SELECT doc_id, text, unnest(range(1, GREATEST(length(text) - {K - 1}, 0) + 1)) AS i FROM tr), "
        f"tg AS (SELECT doc_id, i, substr(text, i::INTEGER, {K}) AS gram FROM te), "
        f"d AS (SELECT tg.doc_id, tg.i FROM tg JOIN evg USING (gram)), "
        f"w AS (SELECT doc_id, i, lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS pi FROM d), "
        f"isl AS (SELECT doc_id, i, CASE WHEN pi IS NULL OR i > pi + {K} THEN 1 ELSE 0 END AS ni FROM w), "
        f"gid AS (SELECT doc_id, i, sum(ni) OVER (PARTITION BY doc_id ORDER BY i) AS isl_id FROM isl), "
        f"ilen AS (SELECT doc_id, isl_id, max(i) - min(i) + {K} AS clen, count(*) AS cnt "
        f"  FROM gid GROUP BY doc_id, isl_id), "
        f"agg AS (SELECT doc_id, sum(clen)::BIGINT AS hit_cov, sum(cnt)::BIGINT AS n_hit "
        f"  FROM ilen GROUP BY doc_id) "
        f"SELECT t.doc_id, GREATEST(length(t.text) - {K - 1}, 0)::BIGINT AS n_grams, "
        f"coalesce(agg.n_hit, 0)::BIGINT AS n_hit, "
        f"coalesce(agg.hit_cov, 0)::BIGINT AS hit_cov, "
        f"(coalesce(agg.n_hit, 0) > 0) AS contaminated "
        f"FROM tr t LEFT JOIN agg ON agg.doc_id = t.doc_id"
    )


ORACLE_BUILDERS["decontam_overlap"] = q_decontam_overlap


def q_image_dhash(sf_dir: str) -> str:
    """dHash in SQL (r4c, multimodal.DHash): the shared decoded-byte
    regeneration chain, rolled up to the 8x9 brightness grid, bits by
    the identical integer cross-multiplied comparison (cell pixel
    counts differ when 9 does not divide w, so means are compared as
    s2 * n1 > s1 * n2)."""
    from .queries import IMG_STATS_MOD

    M = 18446744073709551616
    return (
        f"WITH {_img_decoded_bytes_ctes(sf_dir, IMG_STATS_MOD, 1)} "
        f"g1 AS (SELECT image_id, "
        f"  (((m // 3) // w) * 8) // h AS cy, (((m // 3) % w) * 9) // w AS cx, "
        f"  sum(v)::BIGINT AS s, (count(*) // 3)::BIGINT AS n "
        f"  FROM bt GROUP BY image_id, (((m // 3) // w) * 8) // h, "
        f"  (((m // 3) % w) * 9) // w), "
        f"dh AS (SELECT a.image_id, "
        f"  sum(CASE WHEN b.s * a.n > a.s * b.n "
        f"      THEN (1::HUGEINT << (a.cy * 8 + a.cx)) ELSE 0::HUGEINT END) AS u "
        f"  FROM g1 a JOIN g1 b ON b.image_id = a.image_id "
        f"  AND b.cy = a.cy AND b.cx = a.cx + 1 WHERE a.cx <= 7 "
        f"  GROUP BY a.image_id) "
        f"SELECT im.image_id, "
        f"(CASE WHEN dh.u >= 9223372036854775808::HUGEINT "
        f"  THEN dh.u - {M} ELSE dh.u END)::BIGINT AS dhash "
        f"FROM im JOIN dh ON dh.image_id = im.image_id"
    )


ORACLE_BUILDERS["image_dhash"] = q_image_dhash


def q_image_neardup(sf_dir: str) -> str:
    """Image near-dup pairs in SQL (r5, multimodal.DHashVariants +
    dedup.hamming_neardup_pairs): the shared decoded-byte chain rolls
    up to TWO 8x9 grids per image — original sums and
    least(v+delta, 255) brightness-shifted sums — producing hash keys
    2*i and 2*i+1; the all-pairs join then keeps every key pair within
    Hamming distance IMG_NEARDUP_DIST (bit_count of the xor).  The
    banded engine path has exact recall at that distance by pigeonhole,
    so the two result sets are identical."""
    from .queries import IMG_NEARDUP_DIST

    return (
        f"WITH {_img_dhash_union_ctes(sf_dir)} "
        f"xx AS (SELECT 1) "
        f"SELECT a.key AS a, b.key AS b, "
        f"bit_count(xor(a.h, b.h))::BIGINT AS dist "
        f"FROM u a JOIN u b ON a.key < b.key "
        f"WHERE bit_count(xor(a.h, b.h)) <= {IMG_NEARDUP_DIST}"
    )


def _img_dhash_union_ctes(sf_dir: str) -> str:
    """Shared CTE chain for the image near-dup family: decoded-byte
    regeneration -> original + brightness-variant dHash grids ->
    ``u(key, h)`` with key = 2*image_index + variant.  Emits CTEs for a
    ``WITH <this> <suffix...>`` continuation (trailing comma)."""
    from .queries import IMG_STATS_MOD

    M = 18446744073709551616
    return (
        f"{_img_decoded_bytes_ctes(sf_dir, IMG_STATS_MOD, 1)} "
        f"g1 AS (SELECT image_id, "
        f"  (((m // 3) // w) * 8) // h AS cy, (((m // 3) % w) * 9) // w AS cx, "
        f"  sum(v)::BIGINT AS s, sum(least(v + 8, 255))::BIGINT AS sv, "
        f"  (count(*) // 3)::BIGINT AS n "
        f"  FROM bt GROUP BY image_id, (((m // 3) // w) * 8) // h, "
        f"  (((m // 3) % w) * 9) // w), "
        # MATERIALIZED: dh feeds BOTH branches of the u UNION — inlined,
        # the decoded-byte chain would run once per branch
        f"dh AS MATERIALIZED (SELECT a.image_id, "
        f"  sum(CASE WHEN b.s * a.n > a.s * b.n "
        f"      THEN (1::HUGEINT << (a.cy * 8 + a.cx)) ELSE 0::HUGEINT END) AS u0, "
        f"  sum(CASE WHEN b.sv * a.n > a.sv * b.n "
        f"      THEN (1::HUGEINT << (a.cy * 8 + a.cx)) ELSE 0::HUGEINT END) AS u1 "
        f"  FROM g1 a JOIN g1 b ON b.image_id = a.image_id "
        f"  AND b.cy = a.cy AND b.cx = a.cx + 1 WHERE a.cx <= 7 "
        f"  GROUP BY a.image_id), "
        # MATERIALIZED: u is self-joined below — inlined, DuckDB would
        # re-run the whole decoded-byte chain once per join side
        f"u AS MATERIALIZED (SELECT 2 * im.i AS key, "
        f"  (CASE WHEN dh.u0 >= 9223372036854775808::HUGEINT "
        f"    THEN dh.u0 - {M} ELSE dh.u0 END)::BIGINT AS h "
        f"  FROM im JOIN dh ON dh.image_id = im.image_id "
        f"  UNION ALL SELECT 2 * im.i + 1 AS key, "
        f"  (CASE WHEN dh.u1 >= 9223372036854775808::HUGEINT "
        f"    THEN dh.u1 - {M} ELSE dh.u1 END)::BIGINT AS h "
        f"  FROM im JOIN dh ON dh.image_id = im.image_id), "
    )


ORACLE_BUILDERS["image_neardup"] = q_image_neardup


def q_image_dedup_groups(sf_dir: str) -> str:
    """Image dedup groups in SQL (r5b, image_dedup_groups): the shared
    dHash-union chain, pairs at Hamming <= IMG_NEARDUP_DIST, then the
    same recursive min-label component propagation as q_minhash_dedup /
    q_semantic_dedup; group = min key of the component, keep = (key ==
    group), singletons keep themselves."""
    from .queries import IMG_NEARDUP_DIST

    return (
        f"WITH RECURSIVE {_img_dhash_union_ctes(sf_dir)} "
        f"ed AS (SELECT a.key AS ka, b.key AS kb "
        f"  FROM u a JOIN u b ON a.key < b.key "
        f"  WHERE bit_count(xor(a.h, b.h)) <= {IMG_NEARDUP_DIST}), "
        f"bi AS (SELECT ka AS a, kb AS b FROM ed UNION ALL SELECT kb, ka FROM ed), "
        f"reach(id, lbl) AS ("
        f"  SELECT DISTINCT a, a FROM bi "
        f"  UNION SELECT e.b, r.lbl FROM reach r JOIN bi e ON e.a = r.id WHERE r.lbl < e.b), "
        f"lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id) "
        f"SELECT u.key, coalesce(lab.lbl, u.key) AS \"group\", "
        f"(coalesce(lab.lbl, u.key) = u.key) AS keep "
        f"FROM u LEFT JOIN lab ON lab.id = u.key"
    )


ORACLE_BUILDERS["image_dedup_groups"] = q_image_dedup_groups


def q_image_resize_stats(sf_dir: str) -> str:
    """2x2 box-mean resize in SQL (r5b, multimodal.Resize + the
    image_resize_stats chain): per-channel 2x2 box sums k of the
    regenerated decoded pixels; numpy's round-half-to-EVEN of k/4 is
    the exact integer expression (k//4) + 1 iff k%4 = 3 or (k%4 = 2
    and k//4 odd) — k/4 is exactly representable in float64, so the
    numpy and integer forms agree bit-for-bit.  PNG re-encode/decode
    is lossless, so the engine's re-decoded pixels must equal these;
    means use the same half-away 4dp as q_image_stats (identical
    IEEE-double division on both sides)."""
    from .queries import IMG_STATS_MOD

    return (
        f"WITH {_img_decoded_bytes_ctes(sf_dir, IMG_STATS_MOD, 4)} "
        f"bx AS (SELECT image_id, max(w) AS w, max(h) AS h, "
        f"  ((m // 3) // w) // 2 AS ry, ((m // 3) % w) // 2 AS rx, m % 3 AS c, "
        f"  sum(v)::BIGINT AS k "
        f"  FROM bt GROUP BY image_id, ((m // 3) // w) // 2, "
        f"  ((m // 3) % w) // 2, m % 3), "
        f"rp AS (SELECT image_id, w, h, c, "
        f"  (k // 4) + (CASE WHEN k % 4 = 3 THEN 1 "
        f"    WHEN k % 4 = 2 AND (k // 4) % 2 = 1 THEN 1 ELSE 0 END) AS rv "
        f"  FROM bx), "
        f"ag AS (SELECT image_id, max(w) AS w, max(h) AS h, c, "
        f"  sum(rv)::BIGINT AS s, count(*)::BIGINT AS n FROM rp "
        f"  GROUP BY image_id, c) "
        f"SELECT image_id, (max(w) // 2)::INT AS w, (max(h) // 2)::INT AS h, "
        f"floor(max(CASE WHEN c = 0 THEN s END)::DOUBLE / max(n) * 10000 + 0.5) / 10000 AS mean_r, "
        f"floor(max(CASE WHEN c = 1 THEN s END)::DOUBLE / max(n) * 10000 + 0.5) / 10000 AS mean_g, "
        f"floor(max(CASE WHEN c = 2 THEN s END)::DOUBLE / max(n) * 10000 + 0.5) / 10000 AS mean_b "
        f"FROM ag GROUP BY image_id"
    )


ORACLE_BUILDERS["image_resize_stats"] = q_image_resize_stats


def q_audio_features(sf_dir: str) -> str:
    """Windowed audio features WITHOUT decoding (r4c,
    multimodal.AudioFeatures): the PCM samples are an integer triangle
    carrier plus bounded splitmix64 noise (datagen._samples_for), so
    every sample is regenerated exactly in SQL; energies / crossings /
    peaks are integer rollups per 512-sample window.  Independently
    checks synth -> WAV encode -> store -> RIFF chunk-walk decode ->
    features."""
    import numpy as np

    from . import rng as _rng
    from .datagen import AUDIO_GATE as GATE
    from .datagen import AUDIO_NOISE, TAG_AUDIO, audio_path
    from .queries import AUDIO_SAMPLE_MOD, AUDIO_WINDOW

    base = int(_rng.splitmix64(np.uint64(TAG_AUDIO)))
    M = 18446744073709551616
    half = (AUDIO_NOISE - 1) // 2
    u = f"(({base} + i * 1048576 + t.t) % {M})"
    word = _rng.sql_splitmix64(u)
    W = AUDIO_WINDOW
    return (
        f"WITH aud AS (SELECT audio_id, CAST(substr(audio_id, 5) AS BIGINT) AS i, "
        f"  n_samples FROM read_parquet('{audio_path(sf_dir)}') "
        f"  WHERE CAST(substr(audio_id, 5) AS BIGINT) % {AUDIO_SAMPLE_MOD} = 0), "
        f"pr AS (SELECT *, 40 + i % 193 AS p, 4000 + (i % 37) * 500 AS amp "
        f"  FROM aud), "
        f"ts AS (SELECT unnest(range(0, (SELECT coalesce(max(n_samples), 1) "
        f"  FROM aud))) AS t), "
        f"s AS (SELECT a.audio_id, a.i, t.t, least(greatest("
        f"  (CASE WHEN (t.t // {W}) % {GATE} = {GATE - 1} THEN 0 ELSE "
        f"  (abs(2 * (t.t % a.p) - a.p) * 2 * a.amp) // a.p - a.amp END) "
        f"  + (({word}) % {AUDIO_NOISE})::BIGINT - {half}, -32768), 32767) AS v "
        f"  FROM pr a JOIN ts t ON t.t < (a.n_samples // {W}) * {W}), "
        f"x AS (SELECT audio_id, t, v, t // {W} AS win, "
        f"  lead(v) OVER (PARTITION BY audio_id ORDER BY t) AS nxt FROM s) "
        f"SELECT audio_id, win, sum(v * v)::BIGINT AS sum_sq, "
        f"sum(CASE WHEN (t + 1) % {W} <> 0 AND nxt IS NOT NULL "
        f"  AND (v < 0) <> (nxt < 0) THEN 1 ELSE 0 END)::BIGINT AS n_zc, "
        f"max(abs(v))::BIGINT AS peak "
        f"FROM x GROUP BY audio_id, win"
    )


ORACLE_BUILDERS["audio_features"] = q_audio_features


def q_topk_docs_per_lang(sf_dir: str) -> str:
    return (
        "WITH r AS (SELECT lang, doc_id, n_chars, row_number() OVER ("
        "  PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rank "
        "  FROM documents) "
        "SELECT lang, doc_id, n_chars, rank::BIGINT AS rank FROM r WHERE rank <= 3"
    )


ORACLE_BUILDERS["topk_docs_per_lang"] = q_topk_docs_per_lang


def q_hll_distinct(sf_dir: str) -> str:
    """HyperLogLog in SQL (r4c, sketch.hll_distinct): item hash =
    md5_number_lower (== the Ray side's little-endian low-64 md5),
    rho via printf('%b') integer bit length (no float log2), harmonic
    sum as the EXACT HUGEINT sum 2^(64-rho) with empty registers
    contributing 2^64, then the identical finalize expression."""
    from .sketch import ESTIMATE_NUM, HLL_B, HLL_M

    m = HLL_M
    maxr = 64 - HLL_B + 1
    return (
        f"WITH h0 AS (SELECT lang, md5_number_lower(text)::HUGEINT AS h "
        f"  FROM documents), "
        f"r0 AS (SELECT lang, h, h % {m} AS idx, h // {m} AS w FROM h0), "
        f"rr AS (SELECT lang, idx, max(CASE WHEN w = 0 THEN {maxr} "
        f"  ELSE {maxr} - length(printf('%b', w::BIGINT)) END) AS rho "
        f"  FROM r0 GROUP BY lang, idx), "
        f"ag AS (SELECT lang, sum(1::HUGEINT << (64 - rho))::HUGEINT AS zp, "
        f"  count(*) AS np FROM rr GROUP BY lang), "
        f"fin AS (SELECT lang, "
        f"  zp + ({m} - np) * (1::HUGEINT << 64) AS zi, {m} - np AS v FROM ag), "
        f"est AS (SELECT lang, "
        f"  CASE WHEN {ESTIMATE_NUM!r} / zi::DOUBLE <= 2.5 * {m} AND v > 0 "
        f"  THEN {m} * ln({m}::DOUBLE / v) "
        f"  ELSE {ESTIMATE_NUM!r} / zi::DOUBLE END AS e FROM fin), "
        f"ex AS (SELECT lang, count(DISTINCT h)::BIGINT AS n_exact "
        f"  FROM h0 GROUP BY lang) "
        f"SELECT ex.lang, ex.n_exact, floor(est.e * 1000000.0) / 1000000.0 AS hll_est "
        f"FROM ex JOIN est ON est.lang = ex.lang"
    )


ORACLE_BUILDERS["hll_distinct_docs"] = q_hll_distinct


def q_len_quantiles(sf_dir: str) -> str:
    """Exact quantiles in SQL (r4c, sketch.exact_quantiles): value
    counts + window cumsum; quantile q = smallest v with cum >=
    (num*n + den - 1) // den — identical integer thresholds."""
    parts = []
    for num, den in ((1, 2), (9, 10), (99, 100)):
        parts.append(
            f"min(CASE WHEN cum >= ({num} * n + {den - 1}) // {den} "
            f"THEN v END)::BIGINT AS p{100 * num // den}"
        )
    sel = ", ".join(parts)
    return (
        "WITH c AS (SELECT lang, n_chars AS v, count(*) AS cnt "
        "  FROM documents GROUP BY lang, n_chars), "
        "w AS (SELECT lang, v, "
        "  sum(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum, "
        "  sum(cnt) OVER (PARTITION BY lang) AS n FROM c) "
        f"SELECT lang, max(n)::BIGINT AS n, {sel} FROM w GROUP BY lang"
    )


ORACLE_BUILDERS["len_quantiles"] = q_len_quantiles


def q_tfidf_docs(sf_dir: str) -> str:
    """TF-IDF in SQL (r4c, lmscore.tfidf_score): token strings vs the
    Ray side's 64-bit hashes (the documented collision caveat);
    identical floor(1e6 * ln(N/df)) idf quantization and integer
    aggregation."""
    return (
        "WITH t AS (SELECT doc_id, unnest(list_filter("
        "  regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok FROM documents), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok), "
        "df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok), "
        "n AS (SELECT count(*) AS n FROM documents), "
        "idf AS (SELECT tok, floor(1000000.0 * ln(n.n::DOUBLE / df))::BIGINT AS idf "
        "  FROM df CROSS JOIN n), "
        "sc AS (SELECT tf.doc_id, sum(tf.tf * idf.idf)::BIGINT AS tfidf_sum, "
        "  sum(tf.tf)::BIGINT AS n_tokens FROM tf "
        "  JOIN idf ON idf.tok = tf.tok GROUP BY tf.doc_id) "
        "SELECT d.doc_id, coalesce(sc.n_tokens, 0)::BIGINT AS n_tokens, "
        "coalesce(sc.tfidf_sum, 0)::BIGINT AS tfidf_sum, "
        "CASE WHEN sc.n_tokens > 0 THEN sc.tfidf_sum // sc.n_tokens "
        "ELSE 0 END::BIGINT AS tfidf_avg "
        "FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id"
    )


ORACLE_BUILDERS["tfidf_docs"] = q_tfidf_docs


def q_reservoir_docs_per_lang(sf_dir: str) -> str:
    """Reservoir sample in SQL (r4c): identical splitmix64 priority
    (signed-BIGINT bit pattern, matching the Ray side's .view(int64))
    + row_number window."""
    from . import rng as _rng

    z = _rng.sql_splitmix64(_rng.sql_u64("doc_id"))
    prio = (
        f"(CASE WHEN ({z}) >= 9223372036854775808::HUGEINT "
        f"THEN ({z}) - 18446744073709551616::HUGEINT ELSE ({z}) END)::BIGINT"
    )
    return (
        f"WITH p AS (SELECT lang, doc_id, {prio} AS prio FROM documents), "
        f"r AS (SELECT lang, doc_id, prio, row_number() OVER ("
        f"  PARTITION BY lang ORDER BY prio, doc_id) AS rank FROM p) "
        f"SELECT lang, doc_id, prio, rank::BIGINT AS rank FROM r WHERE rank <= 2"
    )


ORACLE_BUILDERS["reservoir_docs_per_lang"] = q_reservoir_docs_per_lang


def q_wkb_roundtrip(sf_dir: str) -> str:
    """WKB roundtrip oracle (r4c): counts + structural byte length
    (9-byte header + 4 per ring + 16 per coord) + the integer-exact
    floor-coordinate checksum from the segment table (each ring's
    coords = its segment starts plus one closing repeat of the first
    vertex)."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH r AS (SELECT polygon_id, ring_idx, count(*) AS n_seg, "
        f"  (sum(floor(x1) + floor(y1)) + "
        f"  min(CASE WHEN seg_idx = 0 THEN floor(x1) + floor(y1) END))::BIGINT AS rsum "
        f"  FROM read_parquet('{segs}') GROUP BY polygon_id, ring_idx) "
        f"SELECT polygon_id, count(*)::BIGINT AS n_rings, "
        f"(sum(n_seg) + count(*))::BIGINT AS n_coords, "
        f"(9 + 4 * count(*) + 16 * (sum(n_seg) + count(*)))::BIGINT AS n_bytes, "
        f"sum(rsum)::BIGINT AS coord_sum FROM r GROUP BY polygon_id"
    )


ORACLE_BUILDERS["wkb_roundtrip"] = q_wkb_roundtrip


def q_events_pruned_agg(sf_dir: str) -> str:
    return (
        "SELECT user_id, count(*)::BIGINT AS n_events, "
        "(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::DOUBLE / 100.0) AS sum_value "
        "FROM events WHERE value > 250.0 GROUP BY user_id"
    )


ORACLE_BUILDERS["events_pruned_agg"] = q_events_pruned_agg


def q_customers_wo_orders(sf_dir: str) -> str:
    return (
        "SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')"
    )


ORACLE_BUILDERS["customers_wo_orders"] = q_customers_wo_orders


def q_zscore_len(sf_dir: str) -> str:
    """z-score in SQL (r4c, queries.zscore_len): identical exact
    integer moments and the identical float expression
    floor(1e6 * (n*x - S) / sqrt(n*SS - S^2))."""
    return (
        "WITH m AS (SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS s, "
        "  sum(n_chars * n_chars)::BIGINT AS ss FROM documents GROUP BY lang) "
        "SELECT d.doc_id, d.lang, "
        "CASE WHEN m.n * m.ss - m.s * m.s = 0 THEN 0 ELSE "
        "floor(1000000.0 * (m.n * d.n_chars - m.s)::DOUBLE "
        "  / sqrt((m.n * m.ss - m.s * m.s)::DOUBLE)) END::BIGINT AS z_micro "
        "FROM documents d JOIN m ON m.lang = d.lang"
    )


ORACLE_BUILDERS["zscore_len"] = q_zscore_len


def q_audio_silence(sf_dir: str) -> str:
    """Silence segmentation in SQL (r4c): the q_audio_features window
    energies (regenerated samples, exact integers) -> gaps-and-islands
    over windows with sum_sq < threshold."""
    from .multimodal import SILENCE_THRESHOLD

    inner = q_audio_features(sf_dir)
    return (
        f"WITH feat AS ({inner}), "
        f"sil AS (SELECT audio_id, win FROM feat WHERE sum_sq < {SILENCE_THRESHOLD}), "
        f"w AS (SELECT audio_id, win, lag(win) OVER ("
        f"  PARTITION BY audio_id ORDER BY win) AS pw FROM sil), "
        f"isl AS (SELECT audio_id, win, CASE WHEN pw IS NULL OR win > pw + 1 "
        f"  THEN 1 ELSE 0 END AS ni FROM w), "
        f"gid AS (SELECT audio_id, win, sum(ni) OVER ("
        f"  PARTITION BY audio_id ORDER BY win) AS g FROM isl) "
        f"SELECT audio_id, (g - 1)::BIGINT AS seg_idx, min(win)::BIGINT AS start_win, "
        f"count(*)::BIGINT AS n_win FROM gid GROUP BY audio_id, g"
    )


ORACLE_BUILDERS["audio_silence"] = q_audio_silence


def q_bpe_top_pairs(sf_dir: str) -> str:
    from .llmtext import BPE_TOP_K

    return (
        f"WITH t AS (SELECT unnest(list_filter(regexp_split_to_array(text, "
        f"  '\\s+'), x -> x <> '')) AS tok FROM documents), "
        f"e AS (SELECT tok, unnest(range(1, length(tok))) AS i FROM t "
        f"  WHERE length(tok) >= 2), "
        f"pr AS (SELECT ord(substr(tok, i::INTEGER, 1)) AS b1, "
        f"  ord(substr(tok, (i + 1)::INTEGER, 1)) AS b2 FROM e), "
        f"c AS (SELECT b1, b2, count(*) AS cnt FROM pr GROUP BY b1, b2), "
        f"r AS (SELECT b1, b2, cnt, row_number() OVER ("
        f"  ORDER BY cnt DESC, b1, b2) AS rank FROM c) "
        f"SELECT rank::BIGINT AS rank, b1::BIGINT AS b1, b2::BIGINT AS b2, "
        f"cnt::BIGINT AS cnt FROM r WHERE rank <= {BPE_TOP_K}"
    )


ORACLE_BUILDERS["bpe_top_pairs"] = q_bpe_top_pairs


def q_dedup_spans(sf_dir: str) -> str:
    """Substring-dedup rewrite in SQL (r4c, llmtext.dedup_spans_plan):
    non-owner duplicate gram positions -> merged removal islands ->
    kept segments via lag() -> ordered string_agg reconstruction."""
    from .llmtext import DUP_K as K

    return (
        f"WITH e AS (SELECT doc_id, text, "
        f"  unnest(range(1, GREATEST(length(text) - {K - 1}, 0) + 1)) AS i FROM documents), "
        f"g AS (SELECT doc_id, i, substr(text, i::INTEGER, {K}) AS gram FROM e), "
        f"own AS (SELECT gram, count(DISTINCT doc_id) AS c, min(doc_id) AS md "
        f"  FROM g GROUP BY gram), "
        f"d AS (SELECT g.doc_id, g.i FROM g JOIN own ON own.gram = g.gram "
        f"  WHERE own.c >= 2 AND g.doc_id <> own.md), "
        f"w AS (SELECT doc_id, i, lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS pi FROM d), "
        f"isl AS (SELECT doc_id, i, CASE WHEN pi IS NULL OR i > pi + {K} THEN 1 ELSE 0 END AS ni FROM w), "
        f"gid AS (SELECT doc_id, i, sum(ni) OVER (PARTITION BY doc_id ORDER BY i) AS g2 FROM isl), "
        f"iv AS (SELECT doc_id, g2, min(i) AS s, max(i) + {K} AS e2 "
        f"  FROM gid GROUP BY doc_id, g2), "
        # kept segments: before/between/after islands (1-based, e2 exclusive)
        f"seg AS (SELECT doc_id, coalesce(lag(e2) OVER ("
        f"  PARTITION BY doc_id ORDER BY s), 1) AS a, s AS b FROM iv "
        f"  UNION ALL SELECT doc_id, max(e2), NULL FROM iv GROUP BY doc_id), "
        f"pieces AS (SELECT seg.doc_id, seg.a, substr(doc.text, seg.a::INTEGER, "
        f"  (coalesce(seg.b, length(doc.text) + 1) - seg.a)::INTEGER) AS piece "
        f"  FROM seg JOIN documents doc ON doc.doc_id = seg.doc_id), "
        f"rebuilt AS (SELECT doc_id, string_agg(piece, '' ORDER BY a) AS clean_text "
        f"  FROM pieces GROUP BY doc_id), "
        f"rem AS (SELECT doc_id, sum(e2 - s)::BIGINT AS removed_chars FROM iv GROUP BY doc_id) "
        f"SELECT doc.doc_id, "
        f"coalesce(rebuilt.clean_text, doc.text) AS clean_text, "
        f"coalesce(rem.removed_chars, 0)::BIGINT AS removed_chars "
        f"FROM documents doc "
        f"LEFT JOIN rebuilt ON rebuilt.doc_id = doc.doc_id "
        f"LEFT JOIN rem ON rem.doc_id = doc.doc_id"
    )


ORACLE_BUILDERS["dedup_spans"] = q_dedup_spans


def q_image_tiles(sf_dir: str) -> str:
    """Per-quadrant channel means from the regenerated decoded pixels
    (r4c, multimodal.TileCrop): quadrant of pixel (y, x) = ((y*2)//h,
    (x*2)//w); identical half-away 4dp rounding."""
    from .queries import IMG_STATS_MOD

    return (
        f"WITH {_img_decoded_bytes_ctes(sf_dir, IMG_STATS_MOD, 2)} "
        f"g1 AS (SELECT image_id, max(w) AS w, max(h) AS h, "
        f"  (((m // 3) // w) * 2) // h AS qy, (((m // 3) % w) * 2) // w AS qx, "
        f"  m % 3 AS c, sum(v)::BIGINT AS s, count(*) AS n "
        f"  FROM bt GROUP BY image_id, (((m // 3) // w) * 2) // h, "
        f"  (((m // 3) % w) * 2) // w, m % 3) "
        f"SELECT image_id, (qy * 2 + qx)::BIGINT AS tile_idx, "
        f"max(w // 2)::BIGINT AS tw, max(h // 2)::BIGINT AS th, "
        f"round(max(CASE WHEN c = 0 THEN s END)::DOUBLE / max(n), 4) AS mean_r, "
        f"round(max(CASE WHEN c = 1 THEN s END)::DOUBLE / max(n), 4) AS mean_g, "
        f"round(max(CASE WHEN c = 2 THEN s END)::DOUBLE / max(n), 4) AS mean_b "
        f"FROM g1 GROUP BY image_id, qy * 2 + qx"
    )


ORACLE_BUILDERS["image_tiles"] = q_image_tiles


def q_events_jsonl_agg(sf_dir: str) -> str:
    return (
        "SELECT event_type, count(*)::BIGINT AS n, "
        "(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::DOUBLE / 100.0) AS sum_value "
        "FROM events GROUP BY event_type"
    )


ORACLE_BUILDERS["events_jsonl_agg"] = q_events_jsonl_agg


def q_corr_len_tokens(sf_dir: str) -> str:
    """Pearson r in SQL (r4c, queries.corr_len_tokens): identical
    exact integer moments, identical float expression
    floor(1e6 * (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2)))."""
    return (
        "WITH d AS (SELECT lang, n_chars AS x, "
        "  length(list_filter(regexp_split_to_array(text, '\\s+'), "
        "  xx -> xx <> '')) AS y FROM documents), "
        "m AS (SELECT lang, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, "
        "  sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx, "
        "  sum(y * y)::BIGINT AS syy, sum(x * y)::BIGINT AS sxy "
        "  FROM d GROUP BY lang) "
        "SELECT lang, n, "
        "CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0 THEN 0 "
        "ELSE floor(1000000.0 * (n * sxy - sx * sy)::DOUBLE / "
        "  (sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE))) "
        "END::BIGINT AS r_micro FROM m"
    )


ORACLE_BUILDERS["corr_len_tokens"] = q_corr_len_tokens


def q_poly_raster_cov(sf_dir: str) -> str:
    """Rasterization oracle (r4c, queries.poly_raster_cov): identical
    center coordinates, parity crossing rule per center."""
    from .queries import RASTER_G as G

    polys = datagen.polygons_path(sf_dir)
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH g AS (SELECT unnest(range(0, {G})) AS j), "
        f"ctr AS (SELECT b.polygon_id, jx.j AS jx, jy.j AS jy, "
        f"  b.minx + (b.maxx - b.minx) * ((jx.j + 0.5) / {G}.0) AS lon, "
        f"  b.miny + (b.maxy - b.miny) * ((jy.j + 0.5) / {G}.0) AS lat "
        f"  FROM read_parquet('{polys}') b, g jx, g jy), "
        f"hits AS (SELECT c.polygon_id, c.jx, c.jy "
        f"  FROM ctr c JOIN read_parquet('{segs}') s ON s.polygon_id = c.polygon_id "
        f"  WHERE ((s.y1 <= c.lat AND s.y2 > c.lat) OR (s.y2 <= c.lat AND s.y1 > c.lat)) "
        f"    AND c.lon < s.x1 + (c.lat - s.y1) * (s.x2 - s.x1) / (s.y2 - s.y1) "
        f"  GROUP BY c.polygon_id, c.jx, c.jy HAVING count(*) % 2 = 1), "
        f"agg AS (SELECT polygon_id, count(*)::BIGINT AS n_inside FROM hits "
        f"  GROUP BY polygon_id) "
        f"SELECT b.polygon_id, {G * G}::BIGINT AS n_cells, "
        f"coalesce(agg.n_inside, 0)::BIGINT AS n_inside, "
        f"coalesce(agg.n_inside, 0)::DOUBLE / {G * G}.0 AS cov_frac "
        f"FROM read_parquet('{polys}') b LEFT JOIN agg ON agg.polygon_id = b.polygon_id"
    )


ORACLE_BUILDERS["poly_raster_cov"] = q_poly_raster_cov


def q_top_tokens_per_lang(sf_dir: str) -> str:
    return (
        "WITH t AS (SELECT lang, unnest(list_filter("
        "  regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok FROM documents), "
        "c AS (SELECT lang, tok, count(*) AS cnt FROM t GROUP BY lang, tok), "
        "r AS (SELECT lang, tok, cnt, row_number() OVER ("
        "  PARTITION BY lang ORDER BY cnt DESC, tok) AS rank FROM c) "
        "SELECT lang, tok, cnt::BIGINT AS cnt, rank::BIGINT AS rank "
        "FROM r WHERE rank <= 5"
    )


ORACLE_BUILDERS["top_tokens_per_lang"] = q_top_tokens_per_lang


def q_corpus_pipeline(sf_dir: str) -> str:
    """The corpus-preparation chain composed in SQL (r4c,
    pipelines/corpus.py): eval holdout (doc_id % MOD), decontamination
    grams, token floor, exact-Jaccard near-dup groups (the
    q_minhash_dedup construction over the TRAINING side), stratified
    sampling thresholds — one row per training doc with per-stage
    flags and the final keep."""
    from . import rng as _r
    from .llmtext import DEFAULT_RATE, SAMPLE_MOD, STRATA_RATES
    from .llmtext import DUP_K as K
    from .pipelines.corpus import MIN_TOKENS
    from .queries import DECONTAM_EVAL_MOD as MOD

    t = MINHASH_T
    sm = _r.sql_splitmix64(_r.sql_u64("d.doc_id"))
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(r * SAMPLE_MOD))}" for s, r in STRATA_RATES.items()
    )
    dflt = int(round(DEFAULT_RATE * SAMPLE_MOD))
    return (
        f"WITH RECURSIVE tr AS (SELECT doc_id, lang, text FROM documents "
        f"  WHERE doc_id % {MOD} <> 0), "
        f"ev AS (SELECT text FROM documents WHERE doc_id % {MOD} = 0), "
        # --- decontamination (q_decontam_overlap's gram join) ---
        f"ee AS (SELECT text, unnest(range(1, GREATEST(length(text) - {K - 1}, 0) + 1)) AS i FROM ev), "
        f"evg AS (SELECT DISTINCT substr(text, i::INTEGER, {K}) AS gram FROM ee), "
        f"te AS (SELECT doc_id, text, unnest(range(1, GREATEST(length(text) - {K - 1}, 0) + 1)) AS i FROM tr), "
        f"tg AS (SELECT doc_id, substr(text, i::INTEGER, {K}) AS gram FROM te), "
        f"cont AS (SELECT DISTINCT tg.doc_id FROM tg JOIN evg USING (gram)), "
        # --- exact-Jaccard near-dup groups over the TRAINING side ---
        f"docs0 AS (SELECT doc_id, text, length(text) AS n FROM tr), "
        f"ser AS (SELECT unnest(range(0, (SELECT coalesce(max(n), 1) FROM docs0))) AS i), "
        f"sh AS (SELECT DISTINCT d.doc_id, substr(d.text, s.i + 1, 5) AS gr "
        f"  FROM docs0 d JOIN ser s ON s.i <= d.n - 5 WHERE d.n >= 5 "
        f"  UNION SELECT doc_id, text FROM docs0 WHERE n < 5), "
        f"ssz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id), "
        f"inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni "
        f"  FROM sh a JOIN sh b ON b.gr = a.gr AND b.doc_id > a.doc_id "
        f"  GROUP BY a.doc_id, b.doc_id), "
        f"edges AS (SELECT da, db FROM inter "
        f"  JOIN ssz sa ON sa.doc_id = da JOIN ssz sb ON sb.doc_id = db "
        f"  WHERE ni::DOUBLE / (sa.sz + sb.sz - ni) >= {t!r}), "
        f"bi AS (SELECT da AS a, db AS b FROM edges UNION ALL SELECT db, da FROM edges), "
        f"reach(id, lbl) AS ("
        f"  SELECT DISTINCT a, a FROM bi "
        f"  UNION SELECT e.b, r.lbl FROM reach r JOIN bi e ON e.a = r.id WHERE r.lbl < e.b), "
        f"lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id), "
        # --- per-doc flags ---
        f"fl AS (SELECT d.doc_id, d.lang, "
        f"  length(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x <> ''))::BIGINT AS n_tokens, "
        f"  (cont.doc_id IS NOT NULL) AS contaminated, "
        f"  (coalesce(lab.lbl, d.doc_id) = d.doc_id) AS dedup_keep, "
        f"  (({sm}) % {SAMPLE_MOD}) < (CASE d.lang {cases} ELSE {dflt} END)::HUGEINT AS sampled "
        f"  FROM tr d LEFT JOIN cont ON cont.doc_id = d.doc_id "
        f"  LEFT JOIN lab ON lab.id = d.doc_id) "
        f"SELECT doc_id, lang, n_tokens, (n_tokens >= {MIN_TOKENS}) AS quality_ok, "
        f"sampled, contaminated, dedup_keep, "
        f"((n_tokens >= {MIN_TOKENS}) AND NOT contaminated AND dedup_keep AND sampled) AS keep "
        f"FROM fl"
    )


ORACLE_BUILDERS["corpus_pipeline"] = q_corpus_pipeline


def q_docs_rollup(sf_dir: str) -> str:
    return (
        "SELECT coalesce(lang, '') AS lang, coalesce(source, '') AS source, "
        "count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars "
        "FROM documents GROUP BY ROLLUP (lang, source)"
    )


ORACLE_BUILDERS["docs_rollup"] = q_docs_rollup


def q_geohash_pts(sf_dir: str) -> str:
    """Geohash in SQL (r4c, cells.geohash_encode): identical integer
    quantization, an unrolled 40-bit interleave, base32 chars via
    substr over the alphabet."""
    precision = 8
    nbits = precision * 5
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    terms = []
    xi, yi = lon_bits, lat_bits
    for j in range(nbits):
        shift = nbits - 1 - j
        if j % 2 == 0:
            xi -= 1
            terms.append(f"(((xq >> {xi}) & 1) << {shift})")
        else:
            yi -= 1
            terms.append(f"(((yq >> {yi}) & 1) << {shift})")
    code = " + ".join(terms)
    chars = " || ".join(
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"(((code >> {5 * (precision - 1 - i)}) & 31) + 1)::INTEGER, 1)"
        for i in range(precision)
    )
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}), "
        f"q AS (SELECT image_id, "
        f"  LEAST(GREATEST(floor((lon + 180.0) / 360.0 * {1 << lon_bits}), 0), "
        f"    {(1 << lon_bits) - 1})::BIGINT AS xq, "
        f"  LEAST(GREATEST(floor((lat + 90.0) / 180.0 * {1 << lat_bits}), 0), "
        f"    {(1 << lat_bits) - 1})::BIGINT AS yq FROM pts), "
        f"c AS (SELECT image_id, ({code})::BIGINT AS code FROM q) "
        f"SELECT image_id, {chars} AS geohash FROM c"
    )


ORACLE_BUILDERS["geohash_pts"] = q_geohash_pts


def q_interval_join(sf_dir: str) -> str:
    from .queries import IVJ_BASE_US, IVJ_N, IVJ_STEP_US

    return (
        f"WITH iv AS (SELECT unnest(range(0, {IVJ_N})) AS interval_id), "
        f"b AS (SELECT interval_id, "
        f"  {IVJ_BASE_US} + interval_id * {IVJ_STEP_US} AS lo, "
        f"  {IVJ_BASE_US} + interval_id * {IVJ_STEP_US} "
        f"    + (1 + interval_id % 5) * 3600000000 AS hi FROM iv) "
        f"SELECT e.event_id, b.interval_id FROM events e JOIN b "
        f"ON epoch_us(e.ts) >= b.lo AND epoch_us(e.ts) < b.hi"
    )


ORACLE_BUILDERS["interval_join"] = q_interval_join


# ---------------------------------------------------------------------------
# r5: EPSG-table reprojection oracles.  Each evaluates the IDENTICAL
# closed-form expression tree as kernels.crs (constants interpolated as
# the exact doubles the kernel derives; hyperbolics via exp/ln); the
# domain fold matches queries._fold verbatim (non-negative dividends so
# DuckDB fmod % == numpy mod bitwise).
# ---------------------------------------------------------------------------

def _Dc(v: float) -> str:
    return f"CAST({float(v)!r} AS DOUBLE)"


def _fold_cte(sf_dir: str, fold: tuple) -> str:
    lon_lo, lon_w, lat_lo, lat_w = fold
    return (
        f"WITH pts AS ({_pts_cte(sf_dir)}), "
        f"f AS (SELECT image_id, "
        f"  {_Dc(lon_lo)} + ((lon + 180.0) % {_Dc(lon_w)}) AS lon, "
        f"  {_Dc(lat_lo)} + ((lat + 90.0) % {_Dc(lat_w)}) AS lat FROM f0) "
    ).replace("FROM f0", "FROM pts")


def _kruger_sql(sf_dir: str, code: int, fold: tuple, xname: str, yname: str) -> str:
    """Krüger order-6 TM forward as SQL (crs.tm_forward's tree): exact
    conformal latitude (sinh/atanh via exp/ln), 6 alpha terms, scale +
    false offsets."""
    from .kernels import crs

    # reproduce the kernel's parameter resolution for this code
    if code == 27700:
        kw = dict(lon0=-2.0, lat0=49.0, k0=0.9996012717,
                  fe=400000.0, fn=-100000.0, ell="AIRY1830")
    else:
        zone = code % 100
        south = code >= 32701
        kw = dict(lon0=zone * 6.0 - 183.0, lat0=0.0, k0=crs.UTM_K0,
                  fe=crs.UTM_FALSE_EASTING,
                  fn=crs.UTM_FALSE_NORTHING_S if south else 0.0, ell="WGS84")
    import numpy as _np

    A, alpha, _, e = crs._kruger_consts(kw["ell"])
    lam0 = _np.radians(kw["lon0"])
    if kw["lat0"] != 0.0:
        xi0 = float(crs._kruger_xieta(_np.asarray(lam0),
                                      _np.asarray(_np.radians(kw["lat0"])),
                                      lam0, kw["ell"])[0])
    else:
        xi0 = 0.0
    eD, kA = _Dc(float(e)), _Dc(kw["k0"])
    AD = _Dc(float(A))
    sinh = lambda t: f"((exp({t}) - exp(-({t}))) / 2.0)"
    cosh = lambda t: f"((exp({t}) + exp(-({t}))) / 2.0)"
    series_xi = " + ".join(
        f"{_Dc(float(aj))} * sin({2*j}.0 * xip) * {cosh(f'{2*j}.0 * etap')}"
        for j, aj in enumerate(alpha, start=1)
    )
    series_eta = " + ".join(
        f"{_Dc(float(aj))} * cos({2*j}.0 * xip) * {sinh(f'{2*j}.0 * etap')}"
        for j, aj in enumerate(alpha, start=1)
    )
    atanh_v = "0.5 * ln((1.0 + v) / (1.0 - v))"
    w = "(sdl / sqrt(taup * taup + cdl * cdl))"
    return (
        _fold_cte(sf_dir, fold)
        + f", g AS (SELECT image_id, radians(lon - {_Dc(kw['lon0'])}) AS dlam, "
        f"  tan(radians(lat)) AS tau FROM f), "
        f"h AS (SELECT *, {eD} * tau / sqrt(1.0 + tau * tau) AS v FROM g), "
        f"i AS (SELECT *, {sinh(f'{eD} * ({atanh_v})')} AS sigma FROM h), "
        f"j AS (SELECT image_id, dlam, "
        f"  tau * sqrt(1.0 + sigma * sigma) - sigma * sqrt(1.0 + tau * tau) AS taup "
        f"  FROM i), "
        f"k AS (SELECT image_id, taup, cos(dlam) AS cdl, sin(dlam) AS sdl FROM j), "
        f"l AS (SELECT image_id, atan2(taup, cdl) AS xip, "
        f"  ln({w} + sqrt({w} * {w} + 1.0)) AS etap FROM k), "
        f"m AS (SELECT image_id, xip + {series_xi} AS xi, "
        f"  etap + {series_eta} AS eta FROM l) "
        f"SELECT image_id, "
        f"round({_Dc(kw['fe'])} + {kA} * {AD} * eta, 3) AS {xname}, "
        f"round({_Dc(kw['fn'])} + {kA} * {AD} * (xi - {_Dc(xi0)}), 3) AS {yname} "
        f"FROM m"
    )


def q_crs_bng_pts(sf_dir: str) -> str:
    from .queries import CRS_FOLDS

    code, fold, xn, yn = CRS_FOLDS["crs_bng_pts"]
    return _kruger_sql(sf_dir, code, fold, xn, yn)


def q_crs_utm33s_pts(sf_dir: str) -> str:
    from .queries import CRS_FOLDS

    code, fold, xn, yn = CRS_FOLDS["crs_utm33s_pts"]
    return _kruger_sql(sf_dir, code, fold, xn, yn)


def q_crs_polar_pts(sf_dir: str) -> str:
    """EPSG:3413 variant-B polar stereographic (crs.polar_stereo_forward
    north, lat_ts=70, lon0=-45): rho = a*mc*t/tc with mc/tc constants
    derived by the kernel."""
    import numpy as _np

    from .kernels import crs
    from .queries import CRS_FOLDS

    _, fold, xn, yn = CRS_FOLDS["crs_polar_pts"]
    a, e2, e = crs._ell("WGS84")
    mc = float(crs._m_factor(_np.radians(70.0), e2))
    tc = float(crs._t_of(_np.radians(70.0), e))
    eD = _Dc(float(e))
    t = (
        f"(tan(pi() / 4.0 - radians(lat) / 2.0) / "
        f"power((1.0 - {eD} * sin(radians(lat))) / (1.0 + {eD} * sin(radians(lat))), "
        f"{eD} / 2.0))"
    )
    rho = f"({_Dc(a)} * {_Dc(mc)} * {t} / {_Dc(tc)})"
    th = f"radians(lon - {_Dc(-45.0)})"
    return (
        _fold_cte(sf_dir, fold)
        + f"SELECT image_id, "
        f"round(0.0 + {rho} * sin({th}), 3) AS {xn}, "
        f"round(0.0 - {rho} * cos({th}), 3) AS {yn} FROM f"
    )


def q_crs_laea_pts(sf_dir: str) -> str:
    """EPSG:3035 LAEA Europe (crs.laea_forward, Snyder 24-2..24-14):
    authalic q per row; qp/beta0/rq/d constants from the kernel."""
    import numpy as _np

    from .kernels import crs
    from .queries import CRS_FOLDS

    _, fold, xn, yn = CRS_FOLDS["crs_laea_pts"]
    a, e2, e = crs._ell("GRS80")
    qp = float(crs._q_of(_np.asarray(_np.pi / 2.0), e, e2))
    q0 = float(crs._q_of(_np.radians(52.0), e, e2))
    beta0 = float(_np.arcsin(_np.clip(q0 / qp, -1.0, 1.0)))
    rq = float(a * _np.sqrt(qp / 2.0))
    d = float(a * crs._m_factor(_np.radians(52.0), e2) / (rq * _np.cos(beta0)))
    sb0, cb0 = float(_np.sin(beta0)), float(_np.cos(beta0))
    eD, e2D = _Dc(float(e)), _Dc(float(e2))
    q = (
        f"((1.0 - {e2D}) * (s / (1.0 - {e2D} * s * s) "
        f"- ln((1.0 - {eD} * s) / (1.0 + {eD} * s)) / (2.0 * {eD})))"
    )
    return (
        _fold_cte(sf_dir, fold)
        + f", g AS (SELECT image_id, sin(radians(lat)) AS s, "
        f"  radians(lon - {_Dc(10.0)}) AS dlam FROM f), "
        f"h AS (SELECT image_id, asin({q} / {_Dc(qp)}) AS beta, dlam FROM g), "
        f"i AS (SELECT image_id, beta, dlam, "
        f"  {_Dc(rq)} * sqrt(2.0 / (1.0 + {_Dc(sb0)} * sin(beta) "
        f"    + {_Dc(cb0)} * cos(beta) * cos(dlam))) AS b FROM h) "
        f"SELECT image_id, "
        f"round({_Dc(4321000.0)} + b * {_Dc(d)} * cos(beta) * sin(dlam), 3) AS {xn}, "
        f"round({_Dc(3210000.0)} + (b / {_Dc(d)}) * ({_Dc(cb0)} * sin(beta) "
        f"  - {_Dc(sb0)} * cos(beta) * cos(dlam)), 3) AS {yn} FROM i"
    )


def q_crs_merc_pts(sf_dir: str) -> str:
    """EPSG:3395 ellipsoidal Mercator (crs.mercator_forward):
    y = -a ln(t(phi)) with the exact conformal factor."""
    from .kernels import crs
    from .queries import CRS_FOLDS

    _, fold, xn, yn = CRS_FOLDS["crs_merc_pts"]
    a, _, e = crs._ell("WGS84")
    eD = _Dc(float(e))
    t = (
        f"(tan(pi() / 4.0 - radians(lat) / 2.0) / "
        f"power((1.0 - {eD} * sin(radians(lat))) / (1.0 + {eD} * sin(radians(lat))), "
        f"{eD} / 2.0))"
    )
    return (
        _fold_cte(sf_dir, fold)
        + f"SELECT image_id, "
        f"round(0.0 + {_Dc(a)} * 1.0 * radians(lon - 0.0), 3) AS {xn}, "
        f"round(0.0 - {_Dc(a)} * 1.0 * ln({t}), 3) AS {yn} FROM f"
    )


def q_crs_swiss_pts(sf_dir: str) -> str:
    """EPSG:2056 Swiss LV95, Hotine oblique Mercator variant B
    (crs.hom_forward): constants B/A/H/gamma0/lam0/uc folded from the
    kernel; per-row t, Q = H/t^B, S/T, V = sin(B(lam-lam0)),
    U = (-V cos g0 + S sin g0)/T, v = A ln((1-U)/(1+U))/(2B),
    u = A atan2(S cos g0 + V sin g0, cos(B(lam-lam0)))/B - uc; with
    gamma_c = 90: E = ec + u, N = nc - v.  The Swiss fold domain keeps
    B(lam-lam0) well inside (-pi, pi), so no branch fold is needed in
    SQL (the kernel's arctan2 fold is the identity here)."""
    import numpy as _np

    from .kernels import crs
    from .queries import CRS_FOLDS

    _, fold, xn, yn = CRS_FOLDS["crs_swiss_pts"]
    latc = 46.0 + 57.0 / 60.0 + 8.66 / 3600.0
    lonc = 7.0 + 26.0 / 60.0 + 22.5 / 3600.0
    e, B, A, H, g0, lam0, uc, sgn = crs._hom_consts(latc, lonc, 90.0, 1.0, "BESSEL1841")
    eD, BD, AD = _Dc(float(e)), _Dc(float(B)), _Dc(float(A))
    sg0, cg0 = _Dc(float(_np.sin(g0))), _Dc(float(_np.cos(g0)))
    t = (
        f"(tan(pi() / 4.0 - radians(lat) / 2.0) / "
        f"power((1.0 - {eD} * sin(radians(lat))) / (1.0 + {eD} * sin(radians(lat))), "
        f"{eD} / 2.0))"
    )
    return (
        _fold_cte(sf_dir, fold)
        + f", g AS (SELECT image_id, "
        f"  {_Dc(float(H))} / power({t}, {BD}) AS q, "
        f"  {BD} * (radians(lon) - {_Dc(float(lam0))}) AS dl FROM f), "
        f"h AS (SELECT image_id, (q - 1.0 / q) / 2.0 AS s, "
        f"  (q + 1.0 / q) / 2.0 AS tt, sin(dl) AS vv, dl FROM g), "
        f"i AS (SELECT image_id, dl, s, vv, "
        f"  (-vv * {cg0} + s * {sg0}) / tt AS u0 FROM h) "
        f"SELECT image_id, "
        f"round({_Dc(2600000.0)} + {AD} * atan2(s * {cg0} + vv * {sg0}, cos(dl)) "
        f"  / {BD} - {_Dc(float(abs(uc) * sgn))}, 3) AS {xn}, "
        f"round({_Dc(1200000.0)} - {AD} * ln((1.0 - u0) / (1.0 + u0)) "
        f"  / (2.0 * {BD}), 3) AS {yn} FROM i"
    )


ORACLE_BUILDERS.update(
    {
        "crs_bng_pts": q_crs_bng_pts,
        "crs_utm33s_pts": q_crs_utm33s_pts,
        "crs_polar_pts": q_crs_polar_pts,
        "crs_laea_pts": q_crs_laea_pts,
        "crs_merc_pts": q_crs_merc_pts,
        "crs_swiss_pts": q_crs_swiss_pts,
    }
)


def q_cdt_stats(sf_dir: str) -> str:
    """CDT oracle.  Some generated rings have PINCH points (a ring
    vertex exactly on another ring edge); the engine splits those
    constraints, so the boundary edge count is E_b = distinct ring
    edges + pinch incidences, and the generalized Euler count (no
    Steiner points, connected interior) is T = 2V - E_b - 2 + 2H
    (reduces to V + 2H - 2 when pinch-free).  n_cons = E_b checks every
    resolved constraint edge is present; tri_area checks the exact area
    partition (|exterior| - sum |holes|).  The pinch predicate is the
    identical float expression the engine's _on_segment uses."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH s AS (SELECT * FROM read_parquet('{segs}')), "
        f"vs AS (SELECT DISTINCT polygon_id, x, y FROM "
        f"  (SELECT polygon_id, x1 AS x, y1 AS y FROM s "
        f"   UNION ALL SELECT polygon_id, x2, y2 FROM s)), "
        f"verts AS (SELECT polygon_id, count(*) AS nv FROM vs GROUP BY polygon_id), "
        f"holes AS (SELECT polygon_id, count(DISTINCT ring_idx) - 1 AS nh "
        f"  FROM s GROUP BY polygon_id), "
        f"ring_area AS (SELECT polygon_id, ring_idx, "
        f"  abs(sum(x1 * y2 - x2 * y1)) / 2.0 AS a FROM s "
        f"  GROUP BY polygon_id, ring_idx), "
        f"areas AS (SELECT polygon_id, "
        f"  sum(CASE WHEN ring_idx = 0 THEN a ELSE -a END) AS tri_area "
        f"  FROM ring_area GROUP BY polygon_id), "
        f"ed AS (SELECT DISTINCT polygon_id, "
        f"  CASE WHEN (x1, y1) < (x2, y2) THEN x1 ELSE x2 END AS ux, "
        f"  CASE WHEN (x1, y1) < (x2, y2) THEN y1 ELSE y2 END AS uy, "
        f"  CASE WHEN (x1, y1) < (x2, y2) THEN x2 ELSE x1 END AS vx, "
        f"  CASE WHEN (x1, y1) < (x2, y2) THEN y2 ELSE y1 END AS vy "
        f"  FROM s WHERE (x1, y1) <> (x2, y2)), "
        f"nedges AS (SELECT polygon_id, count(*) AS ne FROM ed GROUP BY polygon_id), "
        f"pinch AS (SELECT e.polygon_id, count(*) AS ninc FROM ed e JOIN vs p "
        f"  ON p.polygon_id = e.polygon_id "
        f"  AND NOT (p.x = e.ux AND p.y = e.uy) AND NOT (p.x = e.vx AND p.y = e.vy) "
        f"  AND (e.vx - e.ux) * (p.y - e.uy) - (e.vy - e.uy) * (p.x - e.ux) = 0.0 "
        f"  AND (p.x - e.ux) * (e.vx - e.ux) + (p.y - e.uy) * (e.vy - e.uy) > 0.0 "
        f"  AND (p.x - e.ux) * (e.vx - e.ux) + (p.y - e.uy) * (e.vy - e.uy) "
        f"    < (e.vx - e.ux) * (e.vx - e.ux) + (e.vy - e.uy) * (e.vy - e.uy) "
        f"  GROUP BY e.polygon_id), "
        f"eb AS (SELECT n.polygon_id, n.ne + COALESCE(p.ninc, 0) AS ebn "
        f"  FROM nedges n LEFT JOIN pinch p USING (polygon_id)), "
        # resolved constraint edges: split edges broken at their on-
        # vertices (window over s), unioned with unsplit edges, then
        # coordinate-canonicalized and DISTINCT-counted (an overlapped
        # boundary makes a sub-edge coincide with a ring edge)
        f"pv AS (SELECT e.polygon_id, e.ux, e.uy, e.vx, e.vy, p.x, p.y, "
        f"  (p.x - e.ux) * (e.vx - e.ux) + (p.y - e.uy) * (e.vy - e.uy) AS s "
        f"  FROM ed e JOIN vs p ON p.polygon_id = e.polygon_id "
        f"  AND NOT (p.x = e.ux AND p.y = e.uy) AND NOT (p.x = e.vx AND p.y = e.vy) "
        f"  AND (e.vx - e.ux) * (p.y - e.uy) - (e.vy - e.uy) * (p.x - e.ux) = 0.0 "
        f"  AND (p.x - e.ux) * (e.vx - e.ux) + (p.y - e.uy) * (e.vy - e.uy) > 0.0 "
        f"  AND (p.x - e.ux) * (e.vx - e.ux) + (p.y - e.uy) * (e.vy - e.uy) "
        f"    < (e.vx - e.ux) * (e.vx - e.ux) + (e.vy - e.uy) * (e.vy - e.uy)), "
        f"chainp AS (SELECT polygon_id, "
        f"  COALESCE(lag(x) OVER w, ux) AS ax, COALESCE(lag(y) OVER w, uy) AS ay, "
        f"  x AS bx, y AS by FROM pv "
        f"  WINDOW w AS (PARTITION BY polygon_id, ux, uy, vx, vy ORDER BY s)), "
        f"lastp AS (SELECT polygon_id, arg_max(x, s) AS ax, arg_max(y, s) AS ay, "
        f"  vx AS bx, vy AS by FROM pv GROUP BY polygon_id, ux, uy, vx, vy), "
        f"unsplit AS (SELECT e.polygon_id, e.ux AS ax, e.uy AS ay, "
        f"  e.vx AS bx, e.vy AS by FROM ed e ANTI JOIN "
        f"  (SELECT DISTINCT polygon_id, ux, uy, vx, vy FROM pv) q "
        f"  ON e.polygon_id = q.polygon_id AND e.ux = q.ux AND e.uy = q.uy "
        f"  AND e.vx = q.vx AND e.vy = q.vy), "
        f"res AS (SELECT polygon_id, count(DISTINCT CASE "
        f"  WHEN (ax, ay) < (bx, by) THEN (ax, ay, bx, by) "
        f"  ELSE (bx, by, ax, ay) END) AS ncons FROM "
        f"  (SELECT * FROM chainp UNION ALL SELECT * FROM lastp "
        f"   UNION ALL SELECT * FROM unsplit) GROUP BY polygon_id) "
        f"SELECT v.polygon_id, (2 * v.nv - e.ebn - 2 + 2 * h.nh)::BIGINT AS n_tri, "
        f"r.ncons::BIGINT AS n_cons, round(a.tri_area, 6) AS tri_area "
        f"FROM verts v JOIN holes h USING (polygon_id) "
        f"JOIN areas a USING (polygon_id) JOIN eb e USING (polygon_id) "
        f"JOIN res r USING (polygon_id)"
    )


ORACLE_BUILDERS["cdt_stats"] = q_cdt_stats


def q_dissolve_area(sf_dir: str) -> str:
    """r5 promotion (VERDICT r4 #4): exact strip-NERVE topology of the
    n-way union in SQL — nodes = maximal covered intervals per strip
    (the union_area_sweep machinery + run extraction), edges = strictly
    overlapping boundary traces of adjacent strips (STRICT: pinch-
    touching faces stay separate, matching the overlay's output
    polygons), C via recursive label-flood, H = E - V + C (nerve
    lemma).  Mirrors georay/nerve.py verbatim."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH RECURSIVE s AS MATERIALIZED (SELECT polygon_id, x1, y1, x2, y2, "
        f"  least(x1, x2) AS xlo, greatest(x1, x2) AS xhi, "
        f"  least(y1, y2) AS ylo, greatest(y1, y2) AS yhi "
        f"  FROM read_parquet('{segs}')), "
        f"bx AS (SELECT x1 AS x FROM s UNION SELECT x2 FROM s "
        f"  UNION SELECT a.x1 + (a.d3 / (a.d3 - a.d4)) * (a.x2 - a.x1) FROM ("
        f"    SELECT a.x1, a.x2, "
        f"      (b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1) AS d3, "
        f"      (b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1) AS d4 "
        f"    FROM s a JOIN s b ON a.xlo <= b.xhi AND a.xhi >= b.xlo "
        f"      AND a.ylo <= b.yhi AND a.yhi >= b.ylo "
        f"    WHERE sign((a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1)) * "
        f"          sign((a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1)) < 0 "
        f"      AND sign((b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1)) * "
        f"          sign((b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1)) < 0) a "
        f"  WHERE a.d3 - a.d4 <> 0), "
        f"strips AS (SELECT x AS xl, lead(x) OVER (ORDER BY x) AS xr, "
        f"  row_number() OVER (ORDER BY x) AS sid FROM (SELECT DISTINCT x FROM bx)), "
        f"st2 AS (SELECT sid, xl, xr, (xl + xr) / 2.0 AS mid FROM strips "
        f"  WHERE xr IS NOT NULL), "
        f"ev AS (SELECT t.sid, t.xl, t.xr, s.polygon_id, "
        f"  s.y1 + (t.mid - s.x1) * ((s.y2 - s.y1) / (s.x2 - s.x1)) AS y, "
        f"  s.y1 + (t.xl - s.x1) * ((s.y2 - s.y1) / (s.x2 - s.x1)) AS ylb, "
        f"  s.y1 + (t.xr - s.x1) * ((s.y2 - s.y1) / (s.x2 - s.x1)) AS yrb "
        f"  FROM st2 t JOIN s ON s.xlo <= t.mid AND s.xhi > t.mid AND s.x1 <> s.x2), "
        f"tog AS (SELECT *, CASE WHEN row_number() OVER "
        f"  (PARTITION BY sid, polygon_id ORDER BY y) % 2 = 1 THEN 1 ELSE -1 END AS delta "
        f"  FROM ev), "
        f"cum AS (SELECT *, sum(delta) OVER "
        f"  (PARTITION BY sid ORDER BY y, polygon_id, delta ROWS UNBOUNDED PRECEDING) AS cnt "
        f"  FROM tog), "
        f"runs AS (SELECT *, lag(cnt, 1, 0) OVER "
        f"  (PARTITION BY sid ORDER BY y, polygon_id, delta) AS pcnt FROM cum), "
        f"opens AS (SELECT sid, xl, xr, y AS lo, ylb AS lo_l, yrb AS lo_r, "
        f"  row_number() OVER (PARTITION BY sid ORDER BY y, polygon_id, delta) AS rn "
        f"  FROM runs WHERE cnt > 0 AND pcnt = 0), "
        f"closes AS (SELECT sid, y AS hi, ylb AS hi_l, yrb AS hi_r, "
        f"  row_number() OVER (PARTITION BY sid ORDER BY y, polygon_id, delta) AS rn "
        f"  FROM runs WHERE cnt = 0 AND pcnt > 0), "
        f"iv AS (SELECT o.sid, o.xl, o.xr, o.lo, c.hi, o.lo_l, c.hi_l, o.lo_r, c.hi_r "
        f"  FROM opens o JOIN closes c ON c.sid = o.sid AND c.rn = o.rn "
        f"  WHERE c.hi > o.lo), "
        f"nodes AS MATERIALIZED (SELECT row_number() OVER (ORDER BY sid, lo) AS nid, * FROM iv), "
        f"edges AS MATERIALIZED (SELECT a.nid AS src, b.nid AS dst FROM nodes a JOIN nodes b "
        f"  ON b.sid = a.sid + 1 AND least(a.hi_r, b.hi_l) > greatest(a.lo_r, b.lo_l)), "
        f"sym AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges), "
        f"flood AS (SELECT nid AS node, nid AS lbl FROM nodes "
        f"  UNION SELECT e.dst AS node, f.lbl FROM flood f JOIN sym e ON e.src = f.node "
        f"    WHERE f.lbl < e.dst), "
        f"comp AS (SELECT node, min(lbl) AS lbl FROM flood GROUP BY node), "
        f"stats AS (SELECT (SELECT count(DISTINCT lbl) FROM comp) AS c, "
        f"  (SELECT count(*) FROM nodes) AS v, (SELECT count(*) FROM edges) AS e, "
        f"  (SELECT sum((xr - xl) * (hi - lo)) FROM nodes) AS area) "
        f"SELECT c::BIGINT AS n_components, (e - v + c)::BIGINT AS n_holes, "
        f"round(area, 6) AS total_area FROM stats"
    )


ORACLE_BUILDERS["dissolve_area"] = q_dissolve_area


def q_make_valid_stats(sf_dir: str) -> str:
    """r5 promotion (VERDICT r4 #4): the corrupted exterior ring is
    rebuilt in SQL (vertex positions 1 and 1+n//2 swapped when n >= 5,
    exactly queries.make_valid_stats's swap), then its odd-even repair
    is measured as the exact per-polygon strip-NERVE: parity membership
    (prepair's rule), components via STRICT-overlap label-flood (pinch-
    touching faces separate, matching make_valid's output polygons),
    area as the exact strip integral.  Mirrors georay/nerve.py
    mode='parity' verbatim."""
    segs = datagen.segments_path(sf_dir)
    return (
        f"WITH RECURSIVE v0 AS (SELECT polygon_id, seg_idx AS k, x1 AS x, y1 AS y, "
        f"  count(*) OVER (PARTITION BY polygon_id) AS n "
        f"  FROM read_parquet('{segs}') WHERE ring_idx = 0), "
        f"sw AS (SELECT polygon_id, n, CASE "
        f"  WHEN n >= 5 AND k = 1 THEN 1 + n // 2 "
        f"  WHEN n >= 5 AND k = 1 + n // 2 THEN 1 ELSE k END AS kk, x, y FROM v0), "
        f"s AS MATERIALIZED (SELECT a.polygon_id, a.x AS x1, a.y AS y1, "
        f"  b.x AS x2, b.y AS y2, "
        f"  least(a.x, b.x) AS xlo, greatest(a.x, b.x) AS xhi, "
        f"  least(a.y, b.y) AS ylo, greatest(a.y, b.y) AS yhi "
        f"  FROM sw a JOIN sw b ON b.polygon_id = a.polygon_id "
        f"  AND b.kk = (a.kk + 1) % a.n), "
        f"bx AS (SELECT polygon_id, x1 AS x FROM s "
        f"  UNION SELECT polygon_id, x2 FROM s "
        f"  UNION SELECT polygon_id, a.x1 + (a.d3 / (a.d3 - a.d4)) * (a.x2 - a.x1) FROM ("
        f"    SELECT a.polygon_id, a.x1, a.x2, "
        f"      (b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1) AS d3, "
        f"      (b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1) AS d4 "
        f"    FROM s a JOIN s b ON b.polygon_id = a.polygon_id "
        f"      AND a.xlo <= b.xhi AND a.xhi >= b.xlo "
        f"      AND a.ylo <= b.yhi AND a.yhi >= b.ylo "
        f"    WHERE sign((a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1)) * "
        f"          sign((a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1)) < 0 "
        f"      AND sign((b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1)) * "
        f"          sign((b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1)) < 0) a "
        f"  WHERE a.d3 - a.d4 <> 0), "
        f"strips AS (SELECT polygon_id, x AS xl, "
        f"  lead(x) OVER (PARTITION BY polygon_id ORDER BY x) AS xr, "
        f"  row_number() OVER (PARTITION BY polygon_id ORDER BY x) AS sid "
        f"  FROM (SELECT DISTINCT polygon_id, x FROM bx)), "
        f"st2 AS (SELECT polygon_id, sid, xl, xr, (xl + xr) / 2.0 AS mid FROM strips "
        f"  WHERE xr IS NOT NULL), "
        f"ev AS (SELECT t.polygon_id, t.sid, t.xl, t.xr, "
        f"  s.y1 + (t.mid - s.x1) * ((s.y2 - s.y1) / (s.x2 - s.x1)) AS y, "
        f"  s.y1 + (t.xl - s.x1) * ((s.y2 - s.y1) / (s.x2 - s.x1)) AS ylb, "
        f"  s.y1 + (t.xr - s.x1) * ((s.y2 - s.y1) / (s.x2 - s.x1)) AS yrb "
        f"  FROM st2 t JOIN s ON s.polygon_id = t.polygon_id "
        f"  AND s.xlo <= t.mid AND s.xhi > t.mid AND s.x1 <> s.x2), "
        f"pos AS (SELECT *, row_number() OVER "
        f"  (PARTITION BY polygon_id, sid ORDER BY y) AS rk FROM ev), "
        f"opens AS (SELECT polygon_id, sid, xl, xr, y AS lo, yrb AS lo_r, ylb AS lo_l, "
        f"  (rk + 1) // 2 AS rn FROM pos WHERE rk % 2 = 1), "
        f"closes AS (SELECT polygon_id, sid, y AS hi, yrb AS hi_r, ylb AS hi_l, "
        f"  rk // 2 AS rn FROM pos WHERE rk % 2 = 0), "
        f"iv AS (SELECT o.polygon_id, o.sid, o.xl, o.xr, o.lo, c.hi, "
        f"  o.lo_l, c.hi_l, o.lo_r, c.hi_r "
        f"  FROM opens o JOIN closes c ON c.polygon_id = o.polygon_id "
        f"  AND c.sid = o.sid AND c.rn = o.rn WHERE c.hi > o.lo), "
        f"nodes AS MATERIALIZED (SELECT row_number() OVER (ORDER BY polygon_id, sid, lo) "
        f"  AS nid, * FROM iv), "
        f"edges AS MATERIALIZED (SELECT a.polygon_id, a.nid AS src, b.nid AS dst "
        f"  FROM nodes a JOIN nodes b ON b.polygon_id = a.polygon_id "
        f"  AND b.sid = a.sid + 1 AND least(a.hi_r, b.hi_l) > greatest(a.lo_r, b.lo_l)), "
        f"sym AS MATERIALIZED (SELECT src, dst FROM edges "
        f"  UNION SELECT dst AS src, src AS dst FROM edges), "
        f"flood AS (SELECT nid AS node, nid AS lbl FROM nodes "
        f"  UNION SELECT e.dst AS node, f.lbl FROM flood f JOIN sym e ON e.src = f.node "
        f"    WHERE f.lbl < e.dst), "
        f"comp AS (SELECT node, min(lbl) AS lbl FROM flood GROUP BY node), "
        f"pc AS (SELECT n.polygon_id, count(DISTINCT c.lbl) AS ncomp, "
        f"  sum((n.xr - n.xl) * (n.hi - n.lo)) AS area "
        f"  FROM nodes n JOIN comp c ON c.node = n.nid GROUP BY n.polygon_id) "
        f"SELECT polygon_id, ncomp::BIGINT AS n_components, "
        f"round(area, 6) AS repaired_area FROM pc"
    )


ORACLE_BUILDERS["make_valid_stats"] = q_make_valid_stats


def q_video_frames(sf_dir: str) -> str:
    """Video frame stats WITHOUT an AVI parser (r5): every sampled
    frame of every clip is a real baseline JPEG of counter-mode
    splitmix64 pixels (datagen._vframe_pixels), so the oracle
    regenerates each frame's DECODED bytes through the exact shared
    DCT chain (_lossy_chain_ctes — the same pipeline q_image_stats
    uses) and rolls up channel means + the integer-exact aHash.  The
    engine side exercises the real demux (videocodec.decode_avi) +
    JPEG decode + PNG re-encode + image-stage composition; byte-level
    container conformance is pytest-gated (test roundtrips the mux)."""
    import numpy as np

    from . import rng as _rng
    from .datagen import TAG_VFRAME, VID_MAXF
    from .queries import VID_FRAME_EVERY

    base = int(_rng.splitmix64(np.uint64(TAG_VFRAME)))
    videos = datagen.videos_path(sf_dir)
    u = f"(({base} + (i * {VID_MAXF} + f) * 4096 + k.k) % {M64})"
    word = _rng.sql_splitmix64(u)
    return (
        f"WITH vm AS (SELECT video_id, CAST(substr(video_id, 5) AS BIGINT) AS i, "
        f"  n_frames FROM read_parquet('{videos}')), "
        f"fr AS (SELECT video_id, i, unnest(range(0, n_frames)) AS f FROM vm), "
        f"d AS (SELECT video_id || '#' || lpad(CAST(f AS VARCHAR), 4, '0') AS image_id, "
        f"  video_id, i, f, 16 + 8 * (i % 2) AS w, 16 AS h "
        f"  FROM fr WHERE f % {VID_FRAME_EVERY} = 0), "
        f"ks AS (SELECT unnest(range(0, 144)) AS k), "
        f"wd AS (SELECT d.image_id, 1 AS lossy, d.w, d.h, k.k, {word} AS word "
        f"  FROM d JOIN ks k ON k.k < (d.w * d.h * 3) // 8), "
        + _lossy_chain_ctes()
        # one-pass rollup, identical shape to q_image_stats
        + f"g1 AS (SELECT image_id, max(w) AS w, max(h) AS h, "
        f"  (((m // 3) // w) * 8) // h AS cy, (((m // 3) % w) * 8) // w AS cx, "
        f"  m % 3 AS c, sum(v)::BIGINT AS s, count(*) AS n "
        f"  FROM bt GROUP BY image_id, (((m // 3) // w) * 8) // h, "
        f"  (((m // 3) % w) * 8) // w, m % 3), "
        f"ch AS (SELECT image_id, c, sum(s)::DOUBLE / sum(n) AS mv "
        f"  FROM g1 GROUP BY image_id, c), "
        f"cell AS (SELECT image_id, max(w) AS w, max(h) AS h, cy, cx, "
        f"  sum(s)::BIGINT AS s FROM g1 GROUP BY image_id, cy, cx), "
        f"tot AS (SELECT image_id, sum(s) AS st FROM cell GROUP BY image_id), "
        f"ah AS (SELECT c.image_id, "
        f"  sum(CASE WHEN c.s * (c.w * c.h) > tot.st * ((c.w * c.h) // 64) "
        f"      THEN (1::HUGEINT << (c.cy * 8 + c.cx)) ELSE 0::HUGEINT END) AS u "
        f"  FROM cell c JOIN tot ON tot.image_id = c.image_id GROUP BY c.image_id) "
        f"SELECT d.video_id, d.f::BIGINT AS frame_idx, "
        f"round(max(CASE WHEN ch.c = 0 THEN ch.mv END), 4) AS mean_r, "
        f"round(max(CASE WHEN ch.c = 1 THEN ch.mv END), 4) AS mean_g, "
        f"round(max(CASE WHEN ch.c = 2 THEN ch.mv END), 4) AS mean_b, "
        f"max((CASE WHEN ah.u >= 9223372036854775808::HUGEINT "
        f"  THEN ah.u - {M64} ELSE ah.u END)::BIGINT) AS ahash "
        f"FROM d JOIN ch ON ch.image_id = d.image_id "
        f"JOIN ah ON ah.image_id = d.image_id "
        f"GROUP BY d.video_id, d.f"
    )


ORACLE_BUILDERS["video_frames"] = q_video_frames
