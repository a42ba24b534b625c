"""Bucket-vectorized temporal ops (temporal.py) vs pandas references.

Adversarial shapes: users split across input batches, equal timestamps
(RANGE-frame peers), events before a user's first order, users with no
orders, single-event users, out-of-order event ids.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

GAP = 1_800_000_000
WIN = 3_600_000_000


def _events(n=5000, users=400, seed=3):
    rs = np.random.RandomState(seed)
    ts = np.int64(1704067200_000_000) + rs.randint(0, 5 * 86400 * 1_000_000, n).astype(np.int64)
    # inject equal-timestamp peers (RANGE frames span them)
    dup = rs.randint(0, n, n // 20)
    ts[dup] = ts[(dup + 1) % n]
    return pa.table({
        "event_id": pa.array(rs.permutation(n).astype(np.int64)),
        "user_id": pa.array(rs.randint(0, users, n).astype(np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "value": pa.array(np.round(rs.uniform(0, 500, n), 2)),
    })


def _ds(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(7)  # split users across blocks


def test_sessionize_matches_pandas(ray_session):
    from georay import temporal

    tbl = _events()
    got = temporal.sessionize_ds(_ds(tbl), GAP, p=13).to_pandas()
    df = tbl.to_pandas()
    df["t"] = df["ts"].astype("int64")

    def per_user(g):
        g = g.sort_values(["t", "event_id"]).reset_index(drop=True)
        brk = (g["t"].diff().fillna(0) > GAP).astype(int)
        first = g.groupby(brk.cumsum())["event_id"].transform("min")
        return pd.DataFrame({"event_id": g["event_id"], "session_id": first})

    want = (
        df.groupby("user_id", group_keys=False)[["t", "event_id"]]
        .apply(per_user)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = got.sort_values("event_id").reset_index(drop=True)
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["session_id"].to_numpy() == want["session_id"].to_numpy()).all()


def test_sliding_window_matches_pandas(ray_session):
    from georay import temporal

    tbl = _events(seed=11)
    got = (
        temporal.sliding_window_ds(_ds(tbl), WIN, p=13)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    df["t"] = df["ts"].astype("int64")
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["t", "event_id"]).reset_index(drop=True)
        t = g["t"].to_numpy()
        v = g["value"].to_numpy()
        cs = np.concatenate([[0.0], np.cumsum(v)])
        lo = np.searchsorted(t, t - WIN, side="left")
        hi = np.searchsorted(t, t, side="right")
        rows.append(pd.DataFrame({
            "event_id": g["event_id"],
            "n_in_window": hi - lo,
            "sum_in_window": np.round(cs[hi] - cs[lo], 6),
        }))
    want = pd.concat(rows).sort_values("event_id").reset_index(drop=True)
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["n_in_window"].to_numpy() == want["n_in_window"].to_numpy()).all()
    np.testing.assert_allclose(
        got["sum_in_window"].to_numpy(), want["sum_in_window"].to_numpy(), atol=2e-6
    )


def test_asof_join_matches_merge_asof(ray_session):
    import ray.data as rd

    from georay import temporal

    rs = np.random.RandomState(5)
    n, users = 3000, 250
    ev = _events(n=n, users=users, seed=5)
    # orders for only 2/3 of users; some after every event (no match),
    # duplicate (custkey, date) rows to exercise the max-key dedup
    m = 1200
    ok = pa.table({
        "o_orderkey": pa.array(rs.permutation(m).astype(np.int64)),
        "o_custkey": pa.array(rs.randint(0, (users * 2) // 3, m).astype(np.int64)),
        "o_orderdate": pa.array(
            np.int64(1704067200_000_000)
            + rs.randint(-86400_000_000, 5 * 86400 * 1_000_000, m).astype(np.int64)
        ).cast(pa.timestamp("us")),
    })
    got = (
        temporal.asof_join_ds(_ds(ev), rd.from_arrow(ok).repartition(5), p=13)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    odf = (
        ok.to_pandas()
        .groupby(["o_custkey", "o_orderdate"], as_index=False)["o_orderkey"]
        .max()
        .sort_values("o_orderdate")
    )
    edf = ev.to_pandas().sort_values("ts")
    want = pd.merge_asof(
        edf, odf, left_on="ts", right_on="o_orderdate",
        left_by="user_id", right_by="o_custkey", direction="backward",
    ).dropna(subset=["o_orderkey"]).sort_values("event_id")
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["o_orderkey"].to_numpy() == want["o_orderkey"].astype("int64").to_numpy()).all()


def test_lift_overflow_guard():
    from georay.temporal import _lift

    seg = np.array([0, 10**7], dtype=np.int64)
    t = np.array([0, 10**15], dtype=np.int64)
    with pytest.raises(ValueError, match="increase p"):
        _lift(seg, t, 10**9)


def test_interval_join_vs_brute(ray_session):
    """Cell-bucketed interval join == the brute BETWEEN join, across
    cell widths smaller/larger than the intervals, overlapping
    intervals, empty intervals, and boundary timestamps."""
    import pandas as pd
    import ray.data as rd

    from georay.temporal import interval_join_ds

    rs = np.random.RandomState(13)
    base = 1_000_000_000
    ts = base + rs.randint(0, 10_000, 400).astype(np.int64)
    # include exact boundary hits
    ts[:3] = [base + 100, base + 200, base + 1_000]
    pts = pa.table({
        "event_id": pa.array(np.arange(len(ts), dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
    })
    lo = base + rs.randint(0, 9_000, 60).astype(np.int64)
    ln = rs.randint(0, 2_000, 60).astype(np.int64)  # some EMPTY (len 0)
    lo[:2] = [base + 100, base + 150]
    ln[:2] = [900, 50]
    ivs = pa.table({
        "interval_id": pa.array(np.arange(60, dtype=np.int64)),
        "lo": pa.array(lo),
        "hi": pa.array(lo + ln),
    })
    want = set()
    for e, t in enumerate(ts):
        for k in range(60):
            if lo[k] <= t < lo[k] + ln[k]:
                want.add((e, k))
    for cell in (100, 1_000, 50_000):
        got = interval_join_ds(
            rd.from_arrow(pts).repartition(3), rd.from_arrow(ivs),
            cell_us=cell,
        ).to_pandas()
        assert set(zip(got["event_id"], got["interval_id"])) == want, cell
        assert len(got) == len(want), cell  # no duplicate matches
