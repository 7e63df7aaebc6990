"""Window-feature kernels vs a DuckDB oracle on a small synthetic table."""

from datetime import timedelta

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from featherstore_ray.stages.window import (
    lag_lead,
    rolling_aggregate,
    session_stats,
    sessionize,
)


@pytest.fixture(scope="module")
def events():
    rng = np.random.default_rng(7)
    n = 2000
    ts = np.sort(rng.integers(0, 10**9, n)) * 1000  # µs within ~16 min span
    table = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "entity": pa.array(rng.integers(0, 37, n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(np.round(rng.normal(10, 3, n), 3), pa.float64()),
        }
    )
    return table


def oracle(events, sql):
    con = duckdb.connect()
    con.register("events", events)
    return con.execute(sql).df()


def test_lag_lead_matches_oracle(events):
    ds = ray.data.from_arrow(events)
    out = lag_lead(
        ds,
        entity_col="entity",
        ts_col="ts",
        value_cols=["value"],
        lags=[1, 2],
        leads=[1],
        tiebreak="event_id",
        num_buckets=8,
    ).to_pandas()
    exp = oracle(
        events,
        """
        SELECT event_id,
               lag(value, 1)  OVER w AS value_lag1,
               lag(value, 2)  OVER w AS value_lag2,
               lead(value, 1) OVER w AS value_lead1
        FROM events
        WINDOW w AS (PARTITION BY entity ORDER BY ts, event_id)
        """,
    )
    m = out.sort_values("event_id").reset_index(drop=True)
    e = exp.sort_values("event_id").reset_index(drop=True)
    for c in ["value_lag1", "value_lag2", "value_lead1"]:
        np.testing.assert_allclose(m[c], e[c], equal_nan=True)


def test_rolling_matches_oracle(events):
    ds = ray.data.from_arrow(events)
    out = rolling_aggregate(
        ds,
        entity_col="entity",
        ts_col="ts",
        value_col="value",
        window=timedelta(seconds=60),
        tiebreak="event_id",
        num_buckets=8,
    ).to_pandas()
    exp = oracle(
        events,
        """
        SELECT event_id,
               round(sum(value)   OVER w, 6) AS value_rsum,
               round(avg(value)   OVER w, 6) AS value_rmean,
               count(value) OVER w AS value_rcount
        FROM events
        WINDOW w AS (PARTITION BY entity ORDER BY ts
                     RANGE BETWEEN INTERVAL 60 SECONDS PRECEDING AND CURRENT ROW)
        """,
    )
    m = out.sort_values("event_id").reset_index(drop=True)
    e = exp.sort_values("event_id").reset_index(drop=True)
    np.testing.assert_allclose(m["value_rsum"], e["value_rsum"], atol=1e-5)
    np.testing.assert_allclose(m["value_rmean"], e["value_rmean"], atol=1e-5)
    assert (m["value_rcount"].to_numpy() == e["value_rcount"].to_numpy()).all()


def test_sessionize_matches_oracle(events):
    gap_us = 5_000_000  # 5 s
    ds = ray.data.from_arrow(events)
    out = sessionize(
        ds,
        entity_col="entity",
        ts_col="ts",
        gap=gap_us,
        tiebreak="event_id",
        num_buckets=8,
    ).to_pandas()
    exp = oracle(
        events,
        f"""
        SELECT event_id,
               CAST(sum(CASE WHEN prev_ts IS NOT NULL
                              AND date_diff('microsecond', prev_ts, ts) > {gap_us}
                         THEN 1 ELSE 0 END)
                    OVER (PARTITION BY entity ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM (SELECT *, lag(ts) OVER (PARTITION BY entity ORDER BY ts, event_id)
                     AS prev_ts FROM events)
        """,
    )
    m = out.sort_values("event_id").reset_index(drop=True)
    e = exp.sort_values("event_id").reset_index(drop=True)
    assert (m["session_id"].to_numpy() == e["session_id"].to_numpy()).all()


def test_session_gap_boundary():
    # gap exactly equal to threshold stays in the SAME session (strict >)
    t0 = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "entity": pa.array([1, 1, 1], pa.int64()),
            "ts": pa.array([t0, t0 + 100, t0 + 201], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 3.0]),
        }
    )
    out = (
        sessionize(
            ray.data.from_arrow(tbl),
            entity_col="entity",
            ts_col="ts",
            gap=100,
            tiebreak="event_id",
            num_buckets=2,
        )
        .to_pandas()
        .sort_values("event_id")
    )
    assert list(out["session_id"]) == [0, 0, 1]


def test_session_stats(events):
    out = session_stats(
        ray.data.from_arrow(events),
        entity_col="entity",
        ts_col="ts",
        gap=5_000_000,
        value_col="value",
        tiebreak="event_id",
        num_buckets=8,
    ).to_pandas()
    exp = oracle(
        events,
        """
        WITH s AS (
          SELECT *, CAST(sum(CASE WHEN prev_ts IS NOT NULL
                           AND date_diff('microsecond', prev_ts, ts) > 5000000
                       THEN 1 ELSE 0 END)
               OVER (PARTITION BY entity ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM (SELECT *, lag(ts) OVER (PARTITION BY entity ORDER BY ts, event_id)
                       AS prev_ts FROM events))
        SELECT entity, session_id, count(*) AS n_events,
               min(ts) AS start_ts, max(ts) AS end_ts,
               round(sum(value), 6) AS sum_value
        FROM s GROUP BY 1, 2
        """,
    )
    m = out.sort_values(["entity", "session_id"]).reset_index(drop=True)
    e = exp.sort_values(["entity", "session_id"]).reset_index(drop=True)
    assert len(m) == len(e)
    assert (m["n_events"].to_numpy() == e["n_events"].to_numpy()).all()
    np.testing.assert_allclose(m["sum_value"], e["sum_value"], atol=1e-5)
    assert (m["start_ts"].to_numpy() == e["start_ts"].to_numpy("datetime64[us]")).all()


def test_group_rank_vs_duckdb_with_ties(ray_session):
    # duplicated ts values per entity: rank pools peers (rnk repeats,
    # dense_rnk is consecutive), rn breaks them by the tiebreak
    from featherstore_ray.stages.window import group_rank

    rng = np.random.default_rng(11)
    n = 3000
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "entity": pa.array(rng.integers(0, 23, n), pa.int64()),
            # coarse grid -> plenty of exact ts collisions within entity
            "ts": pa.array(
                rng.integers(0, 40, n) * 1_000_000, pa.timestamp("us")
            ),
        }
    )
    got = (
        group_rank(
            ray.data.from_arrow(t),
            entity_col="entity",
            order_cols=["ts"],
            tiebreak="event_id",
            num_buckets=8,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = duckdb.connect().execute(
        """
        SELECT event_id, entity, ts,
               ROW_NUMBER() OVER (PARTITION BY entity
                                  ORDER BY ts, event_id) AS rn,
               RANK() OVER (PARTITION BY entity ORDER BY ts) AS rnk,
               DENSE_RANK() OVER (PARTITION BY entity ORDER BY ts)
                 AS dense_rnk
        FROM t ORDER BY event_id
        """
    ).df()
    for c in ("rn", "rnk", "dense_rnk"):
        assert got[c].tolist() == exp[c].tolist(), c
    assert (got["rnk"] != got["rn"]).any()  # ties actually exercised
    assert (got["dense_rnk"] != got["rnk"]).any()


def test_group_rank_descending_and_null_peers(ray_session):
    from featherstore_ray.stages.window import group_rank

    t = pa.table(
        {
            "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "e": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "v": pa.array([3.0, None, 3.0, None, 1.0, 2.0], pa.float64()),
        }
    )
    got = (
        group_rank(
            ray.data.from_arrow(t),
            entity_col="e",
            order_cols=["v"],
            ascending=[False],
            tiebreak="id",
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = duckdb.connect().execute(
        """
        SELECT id,
               ROW_NUMBER() OVER (PARTITION BY e ORDER BY v DESC, id) AS rn,
               RANK() OVER (PARTITION BY e ORDER BY v DESC) AS rnk,
               DENSE_RANK() OVER (PARTITION BY e ORDER BY v DESC)
                 AS dense_rnk
        FROM t ORDER BY id
        """
    ).df()
    for c in ("rn", "rnk", "dense_rnk"):
        assert got[c].tolist() == exp[c].tolist(), c
    # the two NULLs are peers: same rnk, same dense_rnk
    nulls = got[got["id"].isin([1, 3])]
    assert nulls["rnk"].nunique() == 1 and nulls["dense_rnk"].nunique() == 1


def test_ntile_vs_duckdb(ray_session):
    from featherstore_ray.stages.window import group_rank

    rng = np.random.default_rng(5)
    n = 1000
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "e": pa.array(rng.integers(0, 17, n), pa.int64()),
            "v": pa.array(rng.normal(size=n)),
        }
    )
    for k in (1, 3, 4, 7):
        got = (
            group_rank(
                ray.data.from_arrow(t),
                entity_col="e",
                order_cols=["v"],
                tiebreak="id",
                ntile=k,
                num_buckets=8,
            )
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        exp = duckdb.connect().execute(
            f"""
            SELECT id, NTILE({k}) OVER (PARTITION BY e ORDER BY v, id)
                     AS tile
            FROM t ORDER BY id
            """
        ).df()
        assert got["tile"].tolist() == exp["tile"].tolist(), k
    # n < k: every row its own tile
    small = pa.table(
        {"id": pa.array([0, 1], pa.int64()),
         "e": pa.array([9, 9], pa.int64()),
         "v": pa.array([2.0, 1.0])}
    )
    got = (
        group_rank(
            ray.data.from_arrow(small), entity_col="e", order_cols=["v"],
            tiebreak="id", ntile=5, num_buckets=2,
        )
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    assert got["tile"].tolist() == [1, 2]


def test_percent_rank_cume_dist_vs_duckdb(ray_session):
    from featherstore_ray.stages.window import group_rank

    rng = np.random.default_rng(11)
    n = 1200
    # duplicated values (tie peers), null values, and two 1-row groups
    v = rng.integers(0, 40, n).astype(float)
    v[rng.random(n) < 0.07] = np.nan
    e = np.concatenate([rng.integers(0, 13, n - 2), [90, 91]]).astype(np.int64)
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "e": pa.array(e),
            "v": pa.array(v),
        }
    )
    got = (
        group_rank(
            ray.data.from_arrow(t),
            entity_col="e",
            order_cols=["v"],
            tiebreak="id",
            pct=True,
            num_buckets=8,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    exp = duckdb.connect().execute(
        """
        SELECT id,
               round(PERCENT_RANK() OVER w, 6) AS pct_rank,
               round(CUME_DIST() OVER w, 6) AS cume_dist
        FROM t WINDOW w AS (PARTITION BY e ORDER BY v) ORDER BY id
        """
    ).df()
    np.testing.assert_allclose(got["pct_rank"], exp["pct_rank"], atol=1e-9)
    np.testing.assert_allclose(got["cume_dist"], exp["cume_dist"], atol=1e-9)
    # 1-row groups: PERCENT_RANK = 0, CUME_DIST = 1
    one = got[got["e"] >= 90]
    assert (one["pct_rank"] == 0.0).all() and (one["cume_dist"] == 1.0).all()


def test_group_standardize_vs_duckdb(ray_session):
    from featherstore_ray.stages.misc import group_standardize

    rng = np.random.default_rng(13)
    n = 2000
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "e": pa.array(
                np.concatenate(
                    [rng.integers(0, 29, n - 2), [97, 98]]  # two 1-row groups
                ).astype(np.int64)
            ),
            "v": pa.array(
                np.concatenate([rng.normal(50, 20, n - 2), [7.0, 7.0]])
            ),
        }
    )
    got = (
        group_standardize(
            ray.data.from_arrow(t).repartition(6), "e", "v",
            methods=("zscore", "minmax"),
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    exp = duckdb.connect().execute(
        """
        SELECT id,
               round((v - avg(v) OVER w) / stddev_samp(v) OVER w, 6) AS v_z,
               round((v - min(v) OVER w)
                     / nullif(max(v) OVER w - min(v) OVER w, 0), 6) AS v_mm
        FROM t WINDOW w AS (PARTITION BY e) ORDER BY id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[["id", "v_z", "v_mm"]], exp, check_dtype=False
    )
    # the two 1-row groups: stddev_samp NULL -> z NULL; min==max -> mm NULL
    tail = got.tail(2)
    assert tail["v_z"].isna().all() and tail["v_mm"].isna().all()


def test_ewma_matches_pandas_ewm_truncated():
    from featherstore_ray.stages.window import ewma

    rng = np.random.default_rng(7)
    n = 200
    t = pa.table({
        "e": rng.integers(0, 5, n),
        "ts": pa.array(
            np.sort(rng.integers(0, 10**9, n)), pa.timestamp("us")),
        "id": np.arange(n),
        "v": rng.normal(size=n),
    })
    K = 16
    out = (
        ewma(ray.data.from_arrow(t).repartition(4), entity_col="e",
             ts_col="ts", value_col="v", alpha=0.25, max_span=K,
             tiebreak="id", round_digits=None)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["e", "ts", "id"])
    # reference: per-entity truncated adjust=True ewm via rolling apply
    a = 0.75
    w = a ** np.arange(K)

    def trunc_ewm(x):
        x = np.asarray(x)[-K:]
        ww = w[: len(x)][::-1]
        return (x * ww).sum() / ww.sum()

    exp = (
        df.groupby("e")["v"]
        .transform(lambda s: s.rolling(K, min_periods=1).apply(trunc_ewm))
    )
    df = df.assign(exp=exp).sort_values("id").reset_index(drop=True)
    np.testing.assert_allclose(out["ewma"], df["exp"], rtol=1e-12)


def test_resample_ffill_manual():
    from featherstore_ray.stages.window import resample_ffill

    day = 86_400_000_000
    t = pa.table({
        "e": [1, 1, 1, 2],
        "ts": pa.array([day // 2, day // 2, 3 * day + 1, 5 * day],
                       pa.timestamp("us")),
        "id": [10, 11, 12, 13],
        "v": [1.0, 2.0, None, 9.0],
    })
    out = (
        resample_ffill(ray.data.from_arrow(t), entity_col="e", ts_col="ts",
                       value_col="v", tiebreak="id")
        .to_pandas().sort_values(["e", "day_ts"]).reset_index(drop=True)
    )
    # e1: days 0..3 — day0 ties on ts → max id wins (v=2.0); days 1-2 carry;
    #     day3 latest event has NULL value → carried as NULL, not skipped
    # e2: single day 5
    got = list(zip(out["e"],
                   out["day_ts"].astype("int64") // day,
                   [None if pd.isna(x) else x for x in out["value_ffill"]]))
    assert got == [(1, 0, 2.0), (1, 1, 2.0), (1, 2, 2.0), (1, 3, None),
                   (2, 5, 9.0)]


def test_rolling_quantile_matches_duckdb(ray_session):
    import duckdb

    from featherstore_ray.stages.window import rolling_quantile

    rng = np.random.default_rng(5)
    n = 400
    t = pa.table({
        "eid": np.arange(n, dtype=np.int64),
        "e": rng.integers(0, 5, n),
        "ts": pa.array(
            np.sort(rng.integers(0, 3_600_000_000, n)).astype(
                "datetime64[us]")),
        "v": pa.array(rng.normal(size=n), mask=rng.random(n) < 0.1),
    })
    out = rolling_quantile(
        ray.data.from_arrow(t), entity_col="e", ts_col="ts", value_col="v",
        window=pd.Timedelta(minutes=10), q=0.25, tiebreak="eid",
        out_col="p25", num_buckets=3,
    ).to_pandas().sort_values("eid").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute("""
        SELECT eid, round(quantile_cont(v, 0.25) OVER (
            PARTITION BY e ORDER BY ts
            RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW
        ), 6) AS p25 FROM t ORDER BY eid
    """).df()
    np.testing.assert_allclose(out["p25"], exp["p25"], atol=1e-6,
                               equal_nan=True)


def test_expanding_zscore_strictly_prior_and_nulls():
    import pandas as pd

    from featherstore_ray.stages.window import expanding_zscore

    ts = pd.to_datetime([
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05",
    ]).astype("datetime64[us]")
    t = pa.table({
        "e": [1] * 5, "ts": pa.array(ts),
        "v": pa.array([10.0, 20.0, None, 30.0, 15.0], pa.float64()),
        "i": [1, 2, 3, 4, 5],
    })
    out = (
        expanding_zscore(
            ray.data.from_arrow(t).repartition(2),
            entity_col="e", ts_col="ts", value_col="v", tiebreak="i",
            num_buckets=2,
        ).to_pandas().set_index("i").sort_index()["v_xz"]
    )
    # rows 1-2: <2 prior values; row 3: value null
    assert out[[1, 2, 3]].isna().all()
    # row 4: prior = [10, 20] -> mean 15, sample std sqrt(50)
    assert abs(out[4] - round((30 - 15) / np.sqrt(50.0), 6)) < 1e-9
    # row 5: prior = [10, 20, 30] (null skipped) -> mean 20, std 10
    assert abs(out[5] - round((15 - 20) / 10.0, 6)) < 1e-9


def test_burstiness_known_cases():
    import pandas as pd

    from featherstore_ray.stages.window import burstiness

    # periodic: gaps all 10s -> std 0 -> B = -1; bursty: gaps 1,1,28
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:10",
         "2024-01-01 00:00:20", "2024-01-01 00:00:30",
         "2024-01-01 00:00:00", "2024-01-01 00:00:01",
         "2024-01-01 00:00:02", "2024-01-01 00:00:30",
         "2024-01-01 00:00:00"]
    ).astype("datetime64[us]")
    t = pa.table({
        "e": [1, 1, 1, 1, 2, 2, 2, 2, 3],
        "ts": pa.array(ts), "i": list(range(9)),
    })
    out = burstiness(
        ray.data.from_arrow(t).repartition(3),
        entity_col="e", ts_col="ts", tiebreak="i", num_buckets=2,
    ).to_pandas().set_index("e").sort_index()
    assert abs(out.loc[1, "burstiness"] + 1.0) < 1e-9  # periodic
    assert abs(out.loc[1, "gap_mean"] - 10.0) < 1e-9
    g = np.array([1.0, 1.0, 28.0])
    mu, sd = g.mean(), g.std(ddof=1)
    assert abs(out.loc[2, "burstiness"]
               - round((sd - mu) / (sd + mu), 6)) < 1e-9
    # single-event entity: mean/std/B all null
    assert out.loc[[3]].isna().all().all()


def test_autocorr_matches_manual():
    import pandas as pd

    from featherstore_ray.stages.window import autocorr

    rng = np.random.default_rng(13)
    n = 200
    # AR(1)-ish series for entity 1; iid for entity 2; constant for 3
    x1 = np.zeros(n)
    for i in range(1, n):
        x1[i] = 0.8 * x1[i - 1] + rng.normal()
    x2 = rng.normal(0, 1, n)
    ts = pd.date_range("2024-01-01", periods=n, freq="1min").values.astype(
        "datetime64[us]")
    t = pa.table({
        "e": [1] * n + [2] * n + [3] * 3,
        "ts": pa.array(np.concatenate([ts, ts, ts[:3]])),
        "v": np.concatenate([x1, x2, [7.0, 7.0, 7.0]]),
        "i": list(range(2 * n + 3)),
    })
    out = autocorr(
        ray.data.from_arrow(t).repartition(4),
        entity_col="e", ts_col="ts", value_col="v", tiebreak="i",
        num_buckets=2,
    ).to_pandas().set_index("e")["acf1"]

    def ref(x):
        a, b = x[:-1], x[1:]
        return np.corrcoef(a, b)[0, 1]

    assert abs(out[1] - round(ref(x1), 6)) < 1e-6
    assert abs(out[2] - round(ref(x2), 6)) < 1e-6
    assert out[1] > 0.6 and abs(out[2]) < 0.25
    # constant series: zero variance -> null
    assert pd.isna(out[3])


def test_seq_entropy_known_cases():
    import math

    import pandas as pd

    from featherstore_ray.stages.window import seq_entropy

    ts = pd.date_range("2024-01-01", periods=8, freq="1min"
                       ).values.astype("datetime64[us]")
    t = pa.table({
        # entity 1: deterministic a->b->a->b  -> H = 0
        # entity 2: a->a->b->b (3 transitions: aa, ab, bb)
        "e": [1, 1, 1, 1, 2, 2, 2, 2],
        "ts": pa.array(np.concatenate([ts[:4], ts[:4]])),
        "t": ["a", "b", "a", "b", "a", "a", "b", "b"],
        "i": list(range(8)),
    })
    out = seq_entropy(
        ray.data.from_arrow(t).repartition(3),
        entity_col="e", ts_col="ts", type_col="t", tiebreak="i",
        num_buckets=2,
    ).to_pandas().set_index("e")["seq_entropy"]
    assert abs(out[1]) < 1e-9
    # entity 2: pairs aa, ab, bb -> P(aa)=P(ab)=P(bb)=1/3;
    # P(a|a)=P(b|a)=1/2, P(b|b)=1 -> H = -(1/3 ln .5 + 1/3 ln .5 + 0)
    want = -(2 / 3) * math.log(0.5)
    assert abs(out[2] - round(want, 6)) < 1e-9


def test_cusum_detects_level_shift():
    import pandas as pd

    from featherstore_ray.stages.window import cusum

    rng = np.random.default_rng(21)
    n = 200
    ts = pd.date_range("2024-01-01", periods=n, freq="1min"
                       ).values.astype("datetime64[us]")
    stationary = rng.normal(0, 1, n)
    shifted = np.concatenate([rng.normal(0, 1, n // 2),
                              rng.normal(3, 1, n // 2)])
    t = pa.table({
        "e": [1] * n + [2] * n + [3],
        "ts": pa.array(np.concatenate([ts, ts, ts[:1]])),
        "v": np.concatenate([stationary, shifted, [5.0]]),
        "i": list(range(2 * n + 1)),
    })
    out = cusum(
        ray.data.from_arrow(t).repartition(4),
        entity_col="e", ts_col="ts", value_col="v", tiebreak="i",
        num_buckets=2,
    ).to_pandas().set_index("e")["cusum_stat"]

    def ref(x):
        dev = x - x.mean()
        w = np.cumsum(dev)
        return (w.max() - w.min()) / (x.std(ddof=1) * np.sqrt(len(x)))

    assert abs(out[1] - round(ref(stationary), 6)) < 1e-6
    assert abs(out[2] - round(ref(shifted), 6)) < 1e-6
    # a level shift blows the statistic up vs a stationary walk
    assert out[2] > 2 * out[1]
    # single observation: null
    assert pd.isna(out[3])


def test_ewma_rejects_bad_alpha():
    from featherstore_ray.stages.window import ewma

    t = pa.table({"e": [1], "ts": pa.array([0], pa.timestamp("us")),
                  "v": [1.0]})
    ds = ray.data.from_arrow(t)
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            ewma(ds, entity_col="e", ts_col="ts", value_col="v", alpha=bad)
    with pytest.raises(ValueError):
        ewma(ds, entity_col="e", ts_col="ts", value_col="v", max_span=0)


def test_resample_ffill_overflow_fallback_parity():
    """When the group-offset int64 key would wrap (huge ts span × many
    entities), the kernel must fall back to per-entity searchsorted and
    produce the IDENTICAL grid (ADVICE r3: the inline trick had no guard)."""
    from featherstore_ray.stages.window import resample_ffill

    day = 86_400_000_000
    # entity 2 lives ~250k years after entity 1: rel span ≈ 7.9e18 µs, so
    # span * (gid+1) > int64 max → fallback path; each entity's OWN day
    # span stays tiny so the output grid is small
    far = 7_900_000_000_000_000_000  # µs, within datetime64[us] range
    t = pa.table({
        "e": [1, 1, 2, 2],
        "ts": pa.array([day // 2, 2 * day + 5, far, far + day],
                       pa.timestamp("us")),
        "id": [0, 1, 2, 3],
        "v": [1.0, 2.0, 3.0, 4.0],
    })
    out = (
        resample_ffill(ray.data.from_arrow(t), entity_col="e", ts_col="ts",
                       value_col="v", tiebreak="id")
        .to_pandas().sort_values(["e", "day_ts"]).reset_index(drop=True)
    )
    got = list(zip(out["e"], out["day_ts"].astype("int64") // day,
                   out["value_ffill"]))
    f0 = far // day
    assert got == [(1, 0, 1.0), (1, 1, 1.0), (1, 2, 2.0),
                   (2, f0, 3.0), (2, f0 + 1, 4.0)]


def test_time_weighted_avg_null_entity_dropped():
    """Null entity keys are excluded on BOTH sides (grouped-reducing-op
    contract): NaN != NaN would make every null-entity row its own group."""
    from featherstore_ray.stages.window import time_weighted_avg

    t = pa.table({
        "e": pa.array([1, 1, None, None], pa.int64()),
        "ts": pa.array([0, 10, 0, 10], pa.timestamp("us")),
        "id": [0, 1, 2, 3],
        "v": [2.0, 4.0, 8.0, 16.0],
    })
    out = time_weighted_avg(
        ray.data.from_arrow(t), entity_col="e", ts_col="ts",
        value_col="v", tiebreak="id",
    ).to_pandas()
    assert list(out["e"]) == [1]
    assert out["twa"].iloc[0] == 2.0


def test_group_mode_null_key_dropped():
    from featherstore_ray.stages.aggregate import group_mode

    t = pa.table({
        "e": pa.array([1, 1, None, None, None], pa.int64()),
        "c": ["a", "b", "z", "z", "z"],
    })
    out = group_mode(
        ray.data.from_arrow(t), ["e"], "c",
    ).to_pandas()
    assert list(out["e"]) == [1]       # the null group never appears
    assert out["mode"].iloc[0] == "a"  # lexicographic tie-break


def test_rolling_slope_known_values_and_window_cut(ray_session):
    from datetime import timedelta

    from featherstore_ray.stages.window import rolling_slope

    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3600_000_000, "us")
    # entity 1: y = 2x on an hourly grid, then a jump breaks the slope
    ts = [base + i * h for i in range(6)]
    x = np.arange(6) / 24.0  # days
    y = 2.0 * x
    t = pa.table({
        "eid": pa.array(np.arange(6), pa.int64()),
        "ent": pa.array([1] * 6, pa.int64()),
        "ts": pa.array(ts),
        "x": pa.array(x),
        "y": pa.array(y),
    })
    out = rolling_slope(
        ray.data.from_arrow(t), entity_col="ent", ts_col="ts",
        x_col="x", y_col="y", window=timedelta(hours=2), tiebreak="eid",
        num_buckets=2, round_digits=9,
    ).to_pandas().sort_values("eid")
    # first row: single point -> NULL; others: exact slope 2
    assert np.isnan(out["rslope"].iloc[0])
    np.testing.assert_allclose(out["rslope"].iloc[1:], 2.0, atol=1e-6)

    # window cut: row at t+10h sees ONLY itself (2h window) -> NULL
    t2 = pa.table({
        "eid": pa.array([0, 1], pa.int64()),
        "ent": pa.array([7, 7], pa.int64()),
        "ts": pa.array([base, base + 10 * h]),
        "x": pa.array([0.0, 10 / 24.0]),
        "y": pa.array([0.0, 5.0]),
    })
    out2 = rolling_slope(
        ray.data.from_arrow(t2), entity_col="ent", ts_col="ts",
        x_col="x", y_col="y", window=timedelta(hours=2), tiebreak="eid",
    ).to_pandas()
    assert out2["rslope"].isna().all()


def test_rolling_slope_no_segment_bleed_at_entity_boundaries(ray_session):
    """Early rows (within w of the bucket's min ts) must not probe into
    the previous entity's composite-key segment: entity B's first-row
    window is itself only, even when entity A has trailing rows just
    before the key boundary (the clamp-at-zero regression)."""
    from datetime import timedelta

    from featherstore_ray.stages.window import rolling_slope

    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3600_000_000, "us")
    t = pa.table({
        "eid": pa.array([0, 1, 2, 3], pa.int64()),
        "ent": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([base, base + 20 * h, base + 1 * h, base + 3 * h]),
        "x": pa.array([0.0, 20 / 24.0, 1 / 24.0, 3 / 24.0]),
        "y": pa.array([100.0, -100.0, 1.0, 5.0]),
    })
    out = rolling_slope(
        ray.data.from_arrow(t), entity_col="ent", ts_col="ts",
        x_col="x", y_col="y", window=timedelta(hours=24), tiebreak="eid",
        num_buckets=1, round_digits=6,
    ).to_pandas().sort_values("eid").reset_index(drop=True)
    # entity 2's second row sees ONLY entity-2 rows: slope = 4 / (2/24)
    assert abs(out.loc[3, "rslope"] - 48.0) < 1e-6
    # entity 2's first row: single point -> NULL (not polluted by ent 1)
    assert np.isnan(out.loc[2, "rslope"])


def test_changepoint_locates_level_shift():
    import pandas as pd

    from featherstore_ray.stages.window import changepoint

    rng = np.random.default_rng(7)
    n = 120
    ts = pd.date_range("2024-01-01", periods=n, freq="1min"
                       ).values.astype("datetime64[us]")
    # entity 1: clean level shift at k=70; entity 2: stationary;
    # entity 3: size-1 (excluded)
    shifted = np.concatenate([rng.normal(0, 0.5, 70), rng.normal(5, 0.5, 50)])
    flat = rng.normal(0, 1, n)
    t = pa.table({
        "e": [1] * n + [2] * n + [3],
        "ts": pa.array(np.concatenate([ts, ts, ts[:1]])),
        "v": np.concatenate([shifted, flat, [5.0]]),
        "i": list(range(2 * n + 1)),
    })
    out = changepoint(
        ray.data.from_arrow(t).repartition(4),
        entity_col="e", ts_col="ts", value_col="v", tiebreak="i",
        num_buckets=2,
    ).to_pandas().set_index("e")
    assert set(out.index) == {1, 2}  # size-1 entity excluded
    assert out.loc[1, "cp_k"] == 70
    assert out.loc[1, "cp_ts"] == pd.Timestamp(ts[70])

    # exact reference for the winning gain on entity 1
    def sse(x):
        return float((x * x).sum() - x.sum() ** 2 / len(x))

    gains = [
        sse(shifted) - sse(shifted[:k]) - sse(shifted[k:])
        for k in range(1, n)
    ]
    k_ref = int(np.argmax(np.round(gains, 6))) + 1
    assert out.loc[1, "cp_k"] == k_ref
    assert abs(out.loc[1, "gain"] - round(gains[k_ref - 1], 6)) < 1e-5

    # constant series: every gain is 0, tie -> smallest k (k=1)
    t2 = pa.table({
        "e": [9] * 5,
        "ts": pa.array(ts[:5]),
        "v": [2.0] * 5,
        "i": list(range(5)),
    })
    out2 = changepoint(
        ray.data.from_arrow(t2), entity_col="e", ts_col="ts",
        value_col="v", tiebreak="i", num_buckets=1,
    ).to_pandas()
    assert out2.loc[0, "cp_k"] == 1 and out2.loc[0, "gain"] == 0.0
