"""As-of join vs DuckDB ASOF JOIN oracle + zero-leakage invariant."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from featherstore_ray.stages.asof import asof_join, asof_join_broadcast


@pytest.fixture(scope="module")
def sides():
    rng = np.random.default_rng(11)
    nf, ns = 3000, 1200
    feat = pa.table(
        {
            "entity": pa.array(rng.integers(0, 50, nf), pa.int64()),
            "event_ts": pa.array(
                np.sort(rng.integers(0, 10**9, nf)) * 1000, pa.timestamp("us")
            ),
            "fid": pa.array(np.arange(nf), pa.int64()),
            "value": pa.array(np.round(rng.normal(0, 5, nf), 3), pa.float64()),
        }
    )
    # spine includes: entities with no features (ids 60-64), query ts before
    # first / after last event, and ts exactly equal to an event_ts
    ent = rng.integers(0, 65, ns)
    qts = rng.integers(-(10**8), 11 * 10**8, ns) * 1000
    # force exact-match boundaries
    f_ent = feat["entity"].to_numpy()
    f_ts = feat["event_ts"].cast(pa.int64()).to_numpy()
    ent[:50] = f_ent[:50]
    qts[:50] = f_ts[:50]
    spine = pa.table(
        {
            "entity": pa.array(ent, pa.int64()),
            "query_ts": pa.array(qts, pa.timestamp("us")),
            "sid": pa.array(np.arange(ns), pa.int64()),
        }
    )
    return spine, feat


def oracle_asof(spine, feat):
    con = duckdb.connect()
    con.register("spine", spine)
    con.register("feat", feat)
    return con.execute(
        """
        SELECT s.sid, s.entity, s.query_ts,
               f.value AS value_asof, f.event_ts AS event_ts_asof
        FROM spine s
        ASOF LEFT JOIN feat f
          ON s.entity = f.entity AND s.query_ts >= f.event_ts
        """
    ).df()


def _check(out: pd.DataFrame, exp: pd.DataFrame):
    m = out.sort_values("sid").reset_index(drop=True)
    e = exp.sort_values("sid").reset_index(drop=True)
    assert len(m) == len(e)
    np.testing.assert_allclose(m["value_asof"], e["value_asof"], equal_nan=True)
    got_ts = m["event_ts_asof"].to_numpy("datetime64[us]")
    want_ts = e["event_ts_asof"].to_numpy("datetime64[us]")
    both = ~(pd.isna(got_ts) | pd.isna(want_ts))
    assert (pd.isna(got_ts) == pd.isna(want_ts)).all()
    assert (got_ts[both] == want_ts[both]).all()
    # zero temporal leakage: matched event_ts <= query_ts always
    q = m["query_ts"].to_numpy("datetime64[us]")
    assert (got_ts[both] <= q[both]).all()


def test_asof_partitioned_matches_oracle(sides):
    spine, feat = sides
    out = asof_join(
        ray.data.from_arrow(spine),
        ray.data.from_arrow(feat),
        entity_col="entity",
        spine_ts="query_ts",
        feature_ts="event_ts",
        feature_cols=["event_ts", "value"],
        tiebreak="fid",
        num_buckets=8,
    ).to_pandas()
    _check(out, oracle_asof(spine, feat))


def test_asof_broadcast_matches_oracle(sides):
    spine, feat = sides
    out = asof_join_broadcast(
        ray.data.from_arrow(spine),
        feat,
        entity_col="entity",
        spine_ts="query_ts",
        feature_ts="event_ts",
        feature_cols=["event_ts", "value"],
        tiebreak="fid",
        concurrency=2,
        batch_size=256,
    ).to_pandas()
    _check(out, oracle_asof(spine, feat))


def test_asof_tiebreak_deterministic():
    # two feature rows with identical (entity, event_ts): max tiebreak wins
    t0 = 1_700_000_000_000_000
    feat = pa.table(
        {
            "entity": pa.array([1, 1], pa.int64()),
            "event_ts": pa.array([t0, t0], pa.timestamp("us")),
            "fid": pa.array([5, 9], pa.int64()),
            "value": pa.array([100.0, 200.0], pa.float64()),
        }
    )
    spine = pa.table(
        {
            "entity": pa.array([1], pa.int64()),
            "query_ts": pa.array([t0 + 1], pa.timestamp("us")),
            "sid": pa.array([0], pa.int64()),
        }
    )
    out = asof_join(
        ray.data.from_arrow(spine),
        ray.data.from_arrow(feat),
        entity_col="entity",
        spine_ts="query_ts",
        feature_ts="event_ts",
        feature_cols=["event_ts", "value"],
        tiebreak="fid",
        num_buckets=2,
    ).to_pandas()
    assert list(out["value_asof"]) == [200.0]

    out2 = asof_join_broadcast(
        ray.data.from_arrow(spine),
        feat,
        entity_col="entity",
        spine_ts="query_ts",
        feature_ts="event_ts",
        feature_cols=["event_ts", "value"],
        tiebreak="fid",
        concurrency=1,
    ).to_pandas()
    assert list(out2["value_asof"]) == [200.0]


def test_asof_broadcast_native_payload_dtypes(ray_session, sides):
    """Broadcast path serves non-float payloads in their native dtype:
    string/int/bool columns through the ST4 index match the partitioned
    path (which was always dtype-correct via explicit output schemas)."""
    spine, feat = sides
    rng = np.random.default_rng(23)
    nf = feat.num_rows
    labels = np.array(["alpha", "beta", None, "gamma"], dtype=object)[
        rng.integers(0, 4, nf)
    ]
    feat2 = feat.append_column(
        "label", pa.array(labels, pa.string())
    ).append_column(
        "grade", pa.array(rng.integers(0, 100, nf), pa.int64())
    )
    out = asof_join_broadcast(
        ray.data.from_arrow(spine),
        feat2,
        entity_col="entity",
        spine_ts="query_ts",
        feature_ts="event_ts",
        feature_cols=["event_ts", "value", "label", "grade"],
        tiebreak="fid",
        concurrency=2,
        batch_size=512,
    ).to_pandas()
    exp = asof_join(
        ray.data.from_arrow(spine),
        ray.data.from_arrow(feat2),
        entity_col="entity",
        spine_ts="query_ts",
        feature_ts="event_ts",
        feature_cols=["event_ts", "value", "label", "grade"],
        tiebreak="fid",
        num_buckets=8,
    ).to_pandas()
    m = out.sort_values("sid").reset_index(drop=True)
    e = exp.sort_values("sid").reset_index(drop=True)
    assert len(m) == len(e)
    # string payload: exact values incl. null-valued matches and misses
    got_l = m["label_asof"].where(m["label_asof"].notna(), None)
    want_l = e["label_asof"].where(e["label_asof"].notna(), None)
    assert list(got_l) == list(want_l)
    # int payload: nullable Int64, no float coercion on the broadcast side
    got_g = m["grade_asof"]
    want_g = e["grade_asof"]
    assert (got_g.isna() == want_g.isna()).all()
    ok = ~got_g.isna()
    assert (
        got_g[ok].astype(np.int64).to_numpy()
        == want_g[ok].astype(np.int64).to_numpy()
    ).all()
    np.testing.assert_allclose(
        m["value_asof"], e["value_asof"], equal_nan=True
    )


def test_asof_forward_matches_oracle(ray_session, sides):
    """direction='forward': earliest feature with ts >= query ts; max
    tiebreak on the matched timestamp."""
    spine, feat = sides
    out = asof_join(
        ray.data.from_arrow(spine),
        ray.data.from_arrow(feat),
        entity_col="entity",
        spine_ts="query_ts",
        feature_ts="event_ts",
        feature_cols=["event_ts", "value"],
        tiebreak="fid",
        num_buckets=8,
        direction="forward",
    ).to_pandas()
    con = duckdb.connect()
    con.register("spine", spine)
    con.register("feat", feat)
    exp = con.execute(
        """
        SELECT s.sid, s.entity, s.query_ts, f.value_asof, f.event_ts_asof
        FROM spine s
        LEFT JOIN LATERAL (
            SELECT value AS value_asof, event_ts AS event_ts_asof
            FROM feat f
            WHERE f.entity = s.entity AND f.event_ts >= s.query_ts
            ORDER BY f.event_ts ASC, f.fid DESC
            LIMIT 1
        ) f ON true
        """
    ).df()
    m = out.sort_values("sid").reset_index(drop=True)
    e = exp.sort_values("sid").reset_index(drop=True)
    assert len(m) == len(e)
    np.testing.assert_allclose(
        m["value_asof"], e["value_asof"], equal_nan=True
    )
    got_ts = m["event_ts_asof"].to_numpy("datetime64[us]")
    want_ts = e["event_ts_asof"].to_numpy("datetime64[us]")
    assert (pd.isna(got_ts) == pd.isna(want_ts)).all()
    both = ~pd.isna(got_ts)
    assert (got_ts[both] == want_ts[both]).all()
    # forward anti-leakage: matched ts is never BEFORE the query ts
    q = m["query_ts"].to_numpy("datetime64[us]")
    assert (got_ts[both] >= q[both]).all()


def test_asof_broadcast_empty_feature_side(ray_session):
    # an empty feature table must yield all-miss rows with typed nulls,
    # not crash the lookup kernel
    spine = pa.table(
        {
            "entity": pa.array([1, 2], pa.int64()),
            "query_ts": pa.array(
                [1_700_000_000_000_000, 1_700_000_001_000_000],
                pa.timestamp("us"),
            ),
        }
    )
    feat = pa.table(
        {
            "entity": pa.array([], pa.int64()),
            "event_ts": pa.array([], pa.timestamp("us")),
            "fid": pa.array([], pa.int64()),
            "value": pa.array([], pa.float64()),
        }
    )
    out = asof_join_broadcast(
        ray.data.from_arrow(spine),
        feat,
        entity_col="entity",
        spine_ts="query_ts",
        feature_ts="event_ts",
        feature_cols=["event_ts", "value"],
        tiebreak="fid",
        concurrency=1,
        batch_size=256,
    ).to_pandas()
    assert len(out) == 2
    assert out["value_asof"].isna().all()
    assert out["event_ts_asof"].isna().all()


def test_asof_tolerance_drops_stale_matches():
    import pandas as pd

    from featherstore_ray.stages.asof import asof_join

    spine = pa.table({
        "e": [1, 1, 2],
        "ts": pa.array(
            pd.to_datetime(["2024-01-01 12:00", "2024-01-02 12:00",
                            "2024-01-01 00:30"]).astype("datetime64[us]")),
        "sid": [10, 11, 12],
    })
    feats = pa.table({
        "e": [1, 1, 2],
        "ts": pa.array(
            pd.to_datetime(["2024-01-01 11:00", "2024-01-01 13:00",
                            "2023-12-31 23:00"]).astype("datetime64[us]")),
        "v": [1.0, 2.0, 3.0],
        "fid": [100, 101, 102],
    })
    out = asof_join(
        ray.data.from_arrow(spine), ray.data.from_arrow(feats),
        entity_col="e", spine_ts="ts", feature_ts="ts",
        feature_cols=["ts", "v"], tiebreak="fid",
        tolerance=pd.Timedelta(hours=2), num_buckets=2,
    ).to_pandas().set_index("sid").sort_index()
    # sid 10: click 1h before -> inside 2h window
    assert out.loc[10, "v_asof"] == 1.0
    # sid 11: latest prior click is 23h stale -> tolerance miss
    assert pd.isna(out.loc[11, "v_asof"]) and pd.isna(out.loc[11, "ts_asof"])
    # sid 12: 1.5h stale -> inside
    assert out.loc[12, "v_asof"] == 3.0


def test_linear_attribution_matches_duckdb(ray_session):
    """Randomized purchase/click streams vs the inequality-join +
    window-count oracle (closed RANGE window, equal-ts touches in)."""
    import duckdb
    from datetime import timedelta

    from featherstore_ray.stages.asof import linear_attribution

    rng = np.random.default_rng(19)
    n = 4000
    base = np.datetime64("2024-01-01", "us")
    ts = base + rng.integers(0, 10**10, n).astype("timedelta64[us]")
    users = rng.integers(0, 25, n)
    kinds = rng.choice(["purchase", "click", "view"], n)
    ev = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts),
        "event_type": pa.array(kinds),
    })
    conv = ray.data.from_arrow(ev).filter(
        expr="event_type == 'purchase'").map_batches(
        lambda t: t.rename_columns(
            ["purchase_id", "user_id", "ts", "event_type"]),
        batch_size=None, batch_format="pyarrow")
    touch = ray.data.from_arrow(ev).filter(
        expr="event_type == 'click'").map_batches(
        lambda t: t.rename_columns(
            ["click_id", "user_id", "ts", "event_type"]),
        batch_size=None, batch_format="pyarrow")
    out = linear_attribution(
        conv, touch, entity_col="user_id", ts_col="ts",
        conv_id="purchase_id", touch_id="click_id",
        window=timedelta(hours=1),
    ).to_pandas()

    con = duckdb.connect()
    con.register("events", ev)
    exp = con.execute(
        """
        WITH p AS (SELECT event_id AS purchase_id, user_id, ts
                   FROM events WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS click_id, user_id, ts AS ct
              FROM events WHERE event_type = 'click'),
        j AS (SELECT p.purchase_id, c.click_id, p.user_id
              FROM p JOIN c ON p.user_id = c.user_id
              AND c.ct <= p.ts AND c.ct >= p.ts - INTERVAL 1 HOURS)
        SELECT purchase_id, click_id, user_id,
               round(1.0 / count(*) OVER (PARTITION BY purchase_id), 6)
                 AS weight
        FROM j
        """
    ).df()
    cols = ["purchase_id", "click_id", "user_id", "weight"]
    o = out[cols].sort_values(cols).reset_index(drop=True)
    x = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(o) == len(x) and len(o) > 0
    pd.testing.assert_frame_equal(o, x, check_dtype=False)
    # per-purchase weights sum to 1
    s = out.groupby("purchase_id")["weight"].sum()
    assert (np.abs(s - 1.0) < 1e-4).all()


def test_asof_lastn_matches_lateral_oracle(ray_session):
    """Randomized spine/features vs the LIMIT/OFFSET LATERAL mirror:
    v1..v3 in (ts DESC, tiebreak DESC) order, NULL-padded, zero leakage."""
    import duckdb

    from featherstore_ray.stages.asof import asof_lastn

    rng = np.random.default_rng(91)
    n = 3000
    base = np.datetime64("2024-01-01", "us")
    ev = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 30, n), pa.int64()),
        "ts": pa.array(base + rng.integers(0, 10**10, n)
                       .astype("timedelta64[us]")),
        "event_type": pa.array(rng.choice(["purchase", "click"], n)),
        "value": pa.array(np.round(rng.uniform(0, 100, n), 3)),
    })
    spine = ray.data.from_arrow(ev).filter(expr="event_type == 'purchase'")
    feats = ray.data.from_arrow(ev).filter(expr="event_type == 'click'")
    out = asof_lastn(
        spine, feats, entity_col="user_id", spine_ts="ts",
        feature_ts="ts", value_col="value", n=3, tiebreak="event_id",
        spine_cols=["event_id", "user_id", "ts"], num_buckets=8,
    ).to_pandas()
    con = duckdb.connect()
    con.register("events", ev)
    exp = con.execute(
        """
        SELECT s.event_id, a.v1, b.v2, c.v3
        FROM (SELECT * FROM events WHERE event_type = 'purchase') s
        LEFT JOIN LATERAL (
            SELECT value AS v1 FROM events f
            WHERE f.event_type = 'click' AND f.user_id = s.user_id
              AND f.ts <= s.ts
            ORDER BY f.ts DESC, f.event_id DESC LIMIT 1 OFFSET 0) a ON true
        LEFT JOIN LATERAL (
            SELECT value AS v2 FROM events f
            WHERE f.event_type = 'click' AND f.user_id = s.user_id
              AND f.ts <= s.ts
            ORDER BY f.ts DESC, f.event_id DESC LIMIT 1 OFFSET 1) b ON true
        LEFT JOIN LATERAL (
            SELECT value AS v3 FROM events f
            WHERE f.event_type = 'click' AND f.user_id = s.user_id
              AND f.ts <= s.ts
            ORDER BY f.ts DESC, f.event_id DESC LIMIT 1 OFFSET 2) c ON true
        ORDER BY s.event_id
        """
    ).df()
    o = out.sort_values("event_id").reset_index(drop=True)
    assert len(o) == len(exp) and len(o) > 0
    for c in ("v1", "v2", "v3"):
        a, b = o[c], exp[c]
        assert (a.isna() == b.isna()).all(), c
        np.testing.assert_allclose(a.dropna(), b.dropna(), atol=1e-9)
    # v-columns are monotone in information: v2 null implies v3 null
    assert not (o["v2"].isna() & o["v3"].notna()).any()


def test_asof_join_multi_equals_chained_asof(ray_session):
    """One-exchange multi-table point-in-time join == two chained
    asof_joins on randomized data (incl. users missing one table)."""
    rng = np.random.default_rng(121)
    base = 1_700_000_000_000_000

    def tab(n, seed_off):
        return pa.table({
            "ent": pa.array(rng.integers(0, 25, n), pa.int64()),
            "ts": pa.array(base + rng.integers(0, 10**9, n) * 100,
                           pa.timestamp("us")),
            "val": pa.array(np.round(rng.normal(0, 5, n), 3)),
            "fid": pa.array(np.arange(n) + seed_off, pa.int64()),
        })

    spine = pa.table({
        "sid": pa.array(np.arange(800), pa.int64()),
        "ent": pa.array(rng.integers(0, 30, 800), pa.int64()),
        "ts": pa.array(base + rng.integers(0, 10**9, 800) * 100,
                       pa.timestamp("us")),
    })
    f1, f2 = tab(2000, 0), tab(500, 10_000)

    from featherstore_ray.stages.asof import asof_join, asof_join_multi

    multi = asof_join_multi(
        ray.data.from_arrow(spine),
        [
            {"ds": ray.data.from_arrow(f1), "feature_ts": "ts",
             "feature_cols": ["ts", "val"], "suffix": "_a",
             "tiebreak": "fid"},
            {"ds": ray.data.from_arrow(f2), "feature_ts": "ts",
             "feature_cols": ["ts", "val"], "suffix": "_b",
             "tiebreak": "fid"},
        ],
        entity_col="ent", spine_ts="ts", num_buckets=8,
    ).to_pandas().sort_values("sid").reset_index(drop=True)

    step1 = asof_join(
        ray.data.from_arrow(spine), ray.data.from_arrow(f1),
        entity_col="ent", spine_ts="ts", feature_ts="ts",
        feature_cols=["ts", "val"], suffix="_a1", tiebreak="fid",
        num_buckets=8,
    )
    chained = asof_join(
        step1, ray.data.from_arrow(f2),
        entity_col="ent", spine_ts="ts", feature_ts="ts",
        feature_cols=["ts", "val"], suffix="_b1", tiebreak="fid",
        num_buckets=8,
    ).to_pandas().sort_values("sid").reset_index(drop=True)

    np.testing.assert_allclose(multi["val_a"], chained["val_a1"],
                               equal_nan=True)
    np.testing.assert_allclose(multi["val_b"], chained["val_b1"],
                               equal_nan=True)
    for a, b in (("ts_a", "ts_a1"), ("ts_b", "ts_b1")):
        ga = multi[a].to_numpy("datetime64[us]")
        gb = chained[b].to_numpy("datetime64[us]")
        assert (pd.isna(ga) == pd.isna(gb)).all()
        ok = ~pd.isna(ga)
        assert (ga[ok] == gb[ok]).all()
    # zero leakage on both matched ts columns
    q = multi["ts"].to_numpy("datetime64[us]")
    for c in ("ts_a", "ts_b"):
        got = multi[c].to_numpy("datetime64[us]")
        ok = ~pd.isna(got)
        assert (got[ok] <= q[ok]).all()


def test_asof_lastn_equal_ts_tiebreak_walk(ray_session):
    """Three features at the SAME timestamp: the N-walk must return them
    in tiebreak-DESC order (v1 = max tiebreak), and equal-ts features at
    the spine ts are included (closed as-of)."""
    from featherstore_ray.stages.asof import asof_lastn

    t0 = 1_700_000_000_000_000
    feats = pa.table({
        "ent": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": pa.array([t0, t0, t0, t0 - 10], pa.timestamp("us")),
        "val": pa.array([10.0, 20.0, 30.0, 5.0]),
        "fid": pa.array([1, 9, 5, 2], pa.int64()),
    })
    spine = pa.table({
        "sid": pa.array([0], pa.int64()),
        "ent": pa.array([1], pa.int64()),
        "ts": pa.array([t0], pa.timestamp("us")),
    })
    out = asof_lastn(
        ray.data.from_arrow(spine), ray.data.from_arrow(feats),
        entity_col="ent", spine_ts="ts", feature_ts="ts",
        value_col="val", n=4, tiebreak="fid",
        spine_cols=["sid", "ent", "ts"], num_buckets=2,
    ).to_pandas().iloc[0]
    # ts DESC, fid DESC: fid 9 (20.0), fid 5 (30.0), fid 1 (10.0), then
    # the earlier row (5.0)
    assert [out["v1"], out["v2"], out["v3"], out["v4"]] == \
        [20.0, 30.0, 10.0, 5.0]
