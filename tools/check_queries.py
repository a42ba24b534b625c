"""Driver-style side-by-side check: Ray queries vs DuckDB oracle SQL.

Mimics the driver's comparison (row count + schema + order-insensitive
value hash) so mismatches surface before the real verify run.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> tuple[str, list[tuple[str, str]]]:
    df = df[sorted(df.columns)]
    schema = [(c, str(df[c].dtype)) for c in df.columns]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.md5(payload).hexdigest(), schema


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from georay import datagen, queries, sqlgen

    datagen.ensure_tables(sf_dir)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name, fn in queries.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures += 1
            continue
        t_ray = time.time() - t0
        builder = sqlgen.ORACLE_BUILDERS.get(name)
        if builder is None:
            print(f"SKIP {name}: no oracle (rows-only) rows={len(ray_df)} t={t_ray:.1f}s")
            continue
        t0 = time.time()
        try:
            sql_df = con.sql(builder(sf_dir)).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: sql error {type(e).__name__}: {e}")
            failures += 1
            continue
        t_sql = time.time() - t0
        # normalize dtypes: DuckDB may give different int widths
        for c in sql_df.columns:
            if c in ray_df.columns and sql_df[c].dtype != ray_df[c].dtype:
                try:
                    sql_df[c] = sql_df[c].astype(ray_df[c].dtype)
                except (TypeError, ValueError):
                    pass
        h1, s1 = canon(ray_df)
        h2, s2 = canon(sql_df)
        ok_rows = len(ray_df) == len(sql_df)
        ok_schema = [c for c, _ in s1] == [c for c, _ in s2]
        ok_hash = h1 == h2
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: rows {len(ray_df)}/{len(sql_df)} schema={'=' if ok_schema else s1 != s2} "
            f"hash={'=' if ok_hash else 'DIFF'} t_ray={t_ray:.1f}s t_sql={t_sql:.1f}s"
        )
        if not ok_hash and ok_rows and ok_schema:
            m = ray_df[sorted(ray_df.columns)].sort_values(sorted(ray_df.columns)).reset_index(drop=True)
            o = sql_df[sorted(sql_df.columns)].sort_values(sorted(sql_df.columns)).reset_index(drop=True)
            diff = (m != o) & ~(m.isna() & o.isna())
            bad = diff.any(axis=1)
            print(f"  first diffs ({int(bad.sum())} rows):")
            print(pd.concat([m[bad].head(3).add_suffix("_ray"), o[bad].head(3).add_suffix("_sql")], axis=1))
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
