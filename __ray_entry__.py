"""Driver contract for the georay engine (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here
(or in the georay package) calls ``ray.init`` / ``ray.shutdown``.

``queries()`` / ``oracle_sql()`` pairs are hash-compared by the driver
at sf=0.01.  The spatial queries run over the deterministic derived
image+polygon tables (BASELINE.json input_hint shape) that both sides
read from the same parquet cache — generation happens lazily on first
call, inside these functions, never at import time.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship pipeline on sf0.001: geolocate -> cell -> tile ->
    broadcast PiP join (actor pool, prepared index) over the synthetic
    image table; returns the annotated Dataset."""
    from georay.pipelines import flagship

    return flagship.run_flagship(SF001, out_dir=None, with_bytes=False, concurrency=(1, 4))


def queries() -> dict[str, Callable[[str], Any]]:
    from georay import datagen, queries as q

    datagen.ensure_tables(SF01)  # so the DuckDB oracle's read_parquet never races us
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    from georay import datagen, sqlgen

    datagen.ensure_tables(SF01)
    return {name: build(SF01) for name, build in sqlgen.ORACLE_BUILDERS.items()}
