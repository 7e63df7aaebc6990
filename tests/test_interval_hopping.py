"""Range (interval) join + hopping window aggregate vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from featherstore_ray.stages.join import interval_join
from featherstore_ray.stages.window import hopping_aggregate

EVENTS = "/root/testdata/sf0.001/events.parquet"
EV_COLS = ["event_id", "user_id", "ts", "value"]


def test_interval_join_matches_duckdb(ray_session):
    events = pq.read_table(EVENTS, columns=EV_COLS)
    # synthetic disjoint-ish intervals per user: 3 fixed day spans
    base = 1_704_067_200_000_000  # 2024-01-01 UTC in us
    day = 24 * 3600 * 1_000_000
    users = np.arange(0, 150, dtype=np.int64)
    rows = []
    for d in (2, 9, 16):
        for u in users:
            rows.append((int(u), d, base + d * day, base + (d + 3) * day))
    iv = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "span_id": pa.array([r[1] for r in rows], pa.int64()),
            "start_ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "end_ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        }
    )
    out = interval_join(
        ray.data.from_arrow(events),
        ray.data.from_arrow(iv),
        entity_col="user_id",
        ts_col="ts",
        start_col="start_ts",
        end_col="end_ts",
        num_buckets=8,
    ).to_pandas()

    con = duckdb.connect()
    con.register("events", events)
    con.register("iv", iv)
    exp = con.execute(
        """
        SELECT e.user_id, e.event_id, e.ts, e.value,
               i.span_id, i.start_ts, i.end_ts
        FROM events e JOIN iv i
          ON e.user_id = i.user_id AND e.ts BETWEEN i.start_ts AND i.end_ts
        """
    ).df()
    cols = sorted(out.columns)
    assert sorted(exp.columns) == cols
    o = out[cols].sort_values(cols).reset_index(drop=True)
    x = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(o) == len(x) and len(o) > 0
    pd.testing.assert_frame_equal(o, x, check_dtype=False)


def test_interval_join_hot_entity_no_cross_product(ray_session):
    """One hot entity with 2e4 points x 2e3 disjoint intervals: the merge
    path would materialize 4e7 intermediate rows; the searchsorted kernel
    is O((n+m) log(n+m)). Verified exactly against numpy assignment."""
    n_pts, n_iv = 20_000, 2_000
    rng = np.random.default_rng(7)
    p_ts = np.sort(rng.integers(0, 10_000_000, n_pts)).astype(np.int64)
    starts = (np.arange(n_iv, dtype=np.int64)) * 5_000
    ends = starts + 3_000  # gaps [3000, 5000) unmatched; disjoint
    pts = pa.table(
        {
            "eid": pa.array(np.arange(n_pts), pa.int64()),
            "ent": pa.array(np.ones(n_pts, np.int64)),
            "ts": pa.array(p_ts.astype("datetime64[us]")),
        }
    )
    iv = pa.table(
        {
            "ent": pa.array(np.ones(n_iv, np.int64)),
            "iid": pa.array(np.arange(n_iv), pa.int64()),
            "s": pa.array(starts.astype("datetime64[us]")),
            "e": pa.array(ends.astype("datetime64[us]")),
        }
    )
    out = interval_join(
        ray.data.from_arrow(pts),
        ray.data.from_arrow(iv),
        entity_col="ent", ts_col="ts", start_col="s", end_col="e",
        num_buckets=4,
    ).to_pandas()
    # expected: point in interval floor(ts/5000) iff ts % 5000 <= 3000
    idx = p_ts // 5_000
    inside = (p_ts - idx * 5_000) <= 3_000
    exp_n = int(inside.sum())
    assert len(out) == exp_n
    got = out.sort_values("eid")
    assert (got["iid"].to_numpy() == idx[inside]).all()


def test_hopping_aggregate_matches_duckdb(ray_session):
    events = pq.read_table(EVENTS, columns=["user_id", "ts", "value"])
    w_us = 2 * 24 * 3600 * 1_000_000  # 48h windows
    s_us = 24 * 3600 * 1_000_000  # sliding daily
    out = hopping_aggregate(
        ray.data.from_arrow(events),
        entity_col="user_id",
        ts_col="ts",
        value_col="value",
        width=w_us,
        slide=s_us,
        num_buckets=8,
    ).to_pandas()

    con = duckdb.connect()
    con.register("events", events)
    m = w_us // s_us
    exp = con.execute(
        f"""
        SELECT user_id,
               make_timestamp((epoch_us(ts) // {s_us} - j) * {s_us})
                 AS window_start,
               count(*) AS n_events, round(sum(value), 6) AS sum_value
        FROM events CROSS JOIN generate_series(0, {m - 1}) AS g(j)
        GROUP BY 1, 2
        """
    ).df()
    cols = sorted(out.columns)
    assert sorted(exp.columns) == cols
    o = out[cols].sort_values(["user_id", "window_start"]).reset_index(drop=True)
    x = exp[cols].sort_values(["user_id", "window_start"]).reset_index(drop=True)
    assert len(o) == len(x) and len(o) > 0
    # every row appears in exactly width/slide = 2 windows
    assert o["n_events"].sum() == 2 * events.num_rows
    pd.testing.assert_frame_equal(o, x, check_dtype=False)


def test_interval_join_overlapping_random(ray_session):
    rng = np.random.default_rng(11)
    n_pts, n_iv = 400, 60
    pts = pa.table(
        {
            "eid": pa.array(np.arange(n_pts), pa.int64()),
            "ent": pa.array(rng.integers(0, 5, n_pts), pa.int64()),
            "ts": pa.array(
                rng.integers(0, 10_000, n_pts).astype("datetime64[us]")
            ),
        }
    )
    starts = rng.integers(0, 10_000, n_iv)
    # random lengths; some intervals empty (end < start), many overlapping
    ends = starts + rng.integers(-500, 2_000, n_iv)
    iv = pa.table(
        {
            "ent": pa.array(rng.integers(0, 5, n_iv), pa.int64()),
            "iid": pa.array(np.arange(n_iv), pa.int64()),
            "s": pa.array(starts.astype("datetime64[us]")),
            "e": pa.array(ends.astype("datetime64[us]")),
        }
    )
    out = interval_join(
        ray.data.from_arrow(pts),
        ray.data.from_arrow(iv),
        entity_col="ent",
        ts_col="ts",
        start_col="s",
        end_col="e",
        num_buckets=4,
    ).to_pandas()
    import duckdb

    con = duckdb.connect()
    con.register("p", pts)
    con.register("iv", iv)
    exp = con.execute(
        """
        SELECT p.ent, p.eid, p.ts, i.iid, i.s, i.e
        FROM p JOIN iv i ON p.ent = i.ent AND p.ts BETWEEN i.s AND i.e
        """
    ).df()
    cols = sorted(out.columns)
    o = out[cols].sort_values(cols).reset_index(drop=True)
    x = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(o) == len(x) and len(o) > 0
    pd.testing.assert_frame_equal(o, x, check_dtype=False)


def test_overlap_join_matches_duckdb_random(ray_session):
    """Random intervals (right side disjoint per entity) vs the
    inequality-join oracle; also exercises the overlapping-right
    fallback in a second call."""
    import duckdb

    from featherstore_ray.stages.join import overlap_join

    rng = np.random.default_rng(29)
    nl, ent = 400, 12
    ls = rng.integers(0, 10**6, nl)
    lt = pa.table({
        "ent": pa.array(rng.integers(0, ent, nl), pa.int64()),
        "lid": pa.array(np.arange(nl), pa.int64()),
        "ls": pa.array(ls),
        "le": pa.array(ls + rng.integers(1, 20_000, nl)),
    })
    # disjoint right side: fixed grid slots per entity
    rows = []
    rid = 0
    for e in range(ent):
        for slot in range(0, 10**6, 50_000):
            if rng.random() < 0.6:
                rows.append((e, rid, slot, slot + 30_000))
                rid += 1
    rt = pa.table({
        "ent": pa.array([r[0] for r in rows], pa.int64()),
        "rid": pa.array([r[1] for r in rows], pa.int64()),
        "rs": pa.array([r[2] for r in rows], pa.int64()),
        "re": pa.array([r[3] for r in rows], pa.int64()),
    })

    def run(right):
        return overlap_join(
            ray.data.from_arrow(lt).repartition(3),
            ray.data.from_arrow(right).repartition(2),
            entity_col="ent", left_start="ls", left_end="le",
            right_start="rs", right_end="re", num_buckets=4,
        ).to_pandas()

    con = duckdb.connect()
    con.register("l", lt)

    def check(right, out):
        con.register("r", right)
        exp = con.execute(
            """
            SELECT l.ent, l.lid, l.ls, l.le, r.rid, r.rs, r.re
            FROM l JOIN r ON l.ent = r.ent
              AND r.rs <= l.le AND r.re >= l.ls
            """
        ).df()
        cols = ["ent", "lid", "rid", "ls", "le", "rs", "re"]
        o = out[cols].sort_values(cols).reset_index(drop=True)
        x = exp[cols].sort_values(cols).reset_index(drop=True)
        assert len(o) == len(x) and len(o) > 0
        pd.testing.assert_frame_equal(o, x, check_dtype=False)

    check(rt, run(rt))
    # overlapping right side -> pandas fallback path, same answer
    rs2 = rng.integers(0, 10**6, 300)
    rt2 = pa.table({
        "ent": pa.array(rng.integers(0, ent, 300), pa.int64()),
        "rid": pa.array(np.arange(300), pa.int64()),
        "rs": pa.array(rs2),
        "re": pa.array(rs2 + rng.integers(1, 200_000, 300)),
    })
    check(rt2, run(rt2))


def test_merge_intervals_matches_duckdb(ray_session):
    import duckdb

    from featherstore_ray.stages.join import merge_intervals

    rng = np.random.default_rng(55)
    n = 2000
    s = rng.integers(0, 10**6, n)
    t = pa.table({
        "ent": pa.array(rng.integers(0, 15, n), pa.int64()),
        "s": pa.array(s),
        "e": pa.array(s + rng.integers(1, 40_000, n)),
    })
    out = merge_intervals(
        ray.data.from_arrow(t).repartition(4),
        entity_col="ent", start_col="s", end_col="e", num_buckets=4,
    ).to_pandas()
    con = duckdb.connect()
    con.register("iv", t)
    exp = con.execute(
        """
        WITH o AS (
          SELECT ent, s, e,
                 max(e) OVER (PARTITION BY ent ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_run
          FROM iv
        ),
        i AS (SELECT *, sum(CASE WHEN prev_run IS NULL OR s > prev_run
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY ent ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS isl
              FROM o)
        SELECT ent, min(s) AS start, max(e) AS "end", count(*) AS n_merged
        FROM i GROUP BY ent, isl
        """
    ).df()
    cols = ["ent", "start", "end", "n_merged"]
    o = out[cols].sort_values(cols).reset_index(drop=True)
    x = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(o) == len(x) and len(o) > 0
    pd.testing.assert_frame_equal(o, x, check_dtype=False)
    # coverage invariant: islands are disjoint and strictly ordered
    for ent, grp in o.groupby("ent"):
        gg = grp.sort_values("start")
        assert (gg["start"].to_numpy()[1:]
                > gg["end"].to_numpy()[:-1]).all()


def test_merge_intervals_touching_intervals_coalesce(ray_session):
    from featherstore_ray.stages.join import merge_intervals

    t = pa.table({
        "ent": pa.array([1, 1, 1], pa.int64()),
        "s": pa.array([0, 10, 25], pa.int64()),
        "e": pa.array([10, 20, 30], pa.int64()),
    })
    out = merge_intervals(
        ray.data.from_arrow(t), entity_col="ent", start_col="s",
        end_col="e",
    ).to_pandas().sort_values("start").reset_index(drop=True)
    # [0,10] and [10,20] touch (closed ends) -> merge; [25,30] separate
    assert out[["start", "end", "n_merged"]].values.tolist() == [
        [0, 20, 2], [25, 30, 1]]


def test_peak_concurrency_known_and_random(ray_session):
    from featherstore_ray.stages.join import peak_concurrency

    # entity 1: [0,10],[5,15],[10,20] -> at t=10 all three overlap
    # (closed ends: [0,10] still open at 10); entity 2: disjoint -> 1
    t = pa.table({
        "ent": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "s": pa.array([0, 5, 10, 0, 20], pa.int64()),
        "e": pa.array([10, 15, 20, 10, 30], pa.int64()),
    })
    out = peak_concurrency(
        ray.data.from_arrow(t).repartition(2), entity_col="ent",
        start_col="s", end_col="e", num_buckets=2,
    ).to_pandas().set_index("ent")
    assert out.loc[1, "peak"] == 3 and out.loc[1, "n_intervals"] == 3
    assert out.loc[2, "peak"] == 1

    # randomized vs brute force on a dense grid
    rng = np.random.default_rng(141)
    n = 400
    ent = rng.integers(0, 6, n)
    s = rng.integers(0, 300, n)
    e = s + rng.integers(0, 40, n)
    t2 = pa.table({"ent": pa.array(ent, pa.int64()),
                   "s": pa.array(s, pa.int64()),
                   "e": pa.array(e, pa.int64())})
    got = peak_concurrency(
        ray.data.from_arrow(t2).repartition(3), entity_col="ent",
        start_col="s", end_col="e", num_buckets=4,
    ).to_pandas().set_index("ent")["peak"]
    for g in np.unique(ent):
        mask = ent == g
        grid = np.arange(0, 400)
        conc = ((s[mask][:, None] <= grid[None, :])
                & (e[mask][:, None] >= grid[None, :])).sum(axis=0)
        assert got.loc[g] == conc.max(), g
