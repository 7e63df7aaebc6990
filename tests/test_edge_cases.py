"""FIXTURES.md §4 edge cases: nulls, empty results, schema preservation,
duplicate-timestamp determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.stages.filters import semi_join_filter, time_range_filter
from featherstore_ray.stages.latest import latest_per_entity
from featherstore_ray.stages.window import lag_lead, rolling_aggregate


T0 = 1_700_000_000_000_000


def test_empty_result_preserves_schema():
    tbl = pa.table(
        {
            "entity_id": pa.array(["a", "b"]),
            "timestamp": pa.array([T0, T0 + 1], pa.timestamp("us")),
            "f1": pa.array([1.0, 2.0]),
        }
    )
    out = semi_join_filter(ray.data.from_arrow(tbl), "entity_id", ["zzz"])
    t = out.take_batch(10, batch_format="pyarrow") if out.count() else None
    # zero rows, but full schema (parquet.go:865-872 semantics)
    assert out.count() == 0
    schema = pa.schema(out.schema().base_schema)
    assert schema.names == ["entity_id", "timestamp", "f1"]
    assert schema.field("timestamp").type == pa.timestamp("us")


def test_nulls_in_value_columns():
    tbl = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "entity": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([T0 + i * 1000 for i in range(6)], pa.timestamp("us")),
            "value": pa.array([1.0, None, 3.0, None, None, 6.0], pa.float64()),
        }
    )
    out = (
        rolling_aggregate(
            ray.data.from_arrow(tbl),
            entity_col="entity",
            ts_col="ts",
            value_col="value",
            window=10_000,  # µs — covers all rows per entity
            tiebreak="event_id",
            num_buckets=2,
        )
        .to_pandas()
        .sort_values("event_id")
    )
    # count counts only non-null (SQL COUNT(value)); sum ignores nulls
    assert list(out["value_rcount"]) == [1, 1, 2, 2, 0, 1]
    assert np.isnan(out["value_rsum"].iloc[4])  # all-null window → NULL sum
    assert out["value_rsum"].iloc[2] == 4.0

    lag = (
        lag_lead(
            ray.data.from_arrow(tbl),
            entity_col="entity",
            ts_col="ts",
            value_cols=["value"],
            lags=[1],
            tiebreak="event_id",
            num_buckets=2,
        )
        .to_pandas()
        .sort_values("event_id")
    )
    assert np.isnan(lag["value_lag1"].iloc[0])  # no predecessor
    assert np.isnan(lag["value_lag1"].iloc[2])  # predecessor is NULL
    assert lag["value_lag1"].iloc[5] is None or np.isnan(lag["value_lag1"].iloc[5])


def test_duplicate_entity_timestamp_determinism():
    # duplicate (entity, ts) pairs: tie-break by max(event_id), stable
    tbl = pa.table(
        {
            "event_id": pa.array([10, 11, 12], pa.int64()),
            "entity_id": pa.array([1, 1, 1], pa.int64()),
            "timestamp": pa.array([T0, T0, T0], pa.timestamp("us")),
            "f": pa.array([1.0, 2.0, 3.0]),
        }
    )
    for _ in range(2):
        out = latest_per_entity(
            ray.data.from_arrow(tbl),
            entity_col="entity_id",
            ts_col="timestamp",
            tiebreak="event_id",
            num_buckets=4,
        ).to_pandas()
        assert list(out["event_id"]) == [12]
        assert list(out["f"]) == [3.0]


def test_inclusive_bounds_exact_boundary():
    tbl = pa.table({"ts": pa.array([T0 - 1, T0, T0 + 7, T0 + 8], pa.timestamp("us"))})
    out = time_range_filter(
        ray.data.from_arrow(tbl),
        "ts",
        pa.scalar(T0, pa.timestamp("us")),
        pa.scalar(T0 + 7, pa.timestamp("us")),
    ).to_pandas()
    got = sorted(out["ts"].astype("datetime64[us]").astype(np.int64))
    assert got == [T0, T0 + 7]


def test_winsorize_nulls_and_partition_invariance():
    import duckdb

    from featherstore_ray.stages.misc import winsorize

    rng = np.random.default_rng(3)
    n = 400
    g = rng.integers(0, 7, n).astype(np.float64)
    g[::97] = np.nan  # null group keys pass through unclipped
    v = rng.normal(100, 50, n)
    v[::41] = np.nan  # null values stay null
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "g": pa.array(g, from_pandas=True),  # NaN -> true nulls
            "v": pa.array(v, from_pandas=True),
        }
    )
    kw = dict(lower=0.1, upper=0.9, num_buckets=4)
    one = (
        winsorize(ray.data.from_arrow(t), "g", "v", **kw)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    many = (
        winsorize(ray.data.from_arrow(t).repartition(9), "g", "v", **kw)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)
    exp = duckdb.connect().execute(
        """
        SELECT t.id,
               round(CASE WHEN t.v < q.lo THEN q.lo
                          WHEN t.v > q.hi THEN q.hi
                          ELSE t.v END, 6) AS v_w
        FROM t LEFT JOIN (
            SELECT g, quantile_cont(v, 0.1) AS lo, quantile_cont(v, 0.9) AS hi
            FROM t WHERE g IS NOT NULL GROUP BY g) q USING (g)
        ORDER BY t.id
        """
    ).df()
    # null-group rows: engine passes v through; SQL CASE with NULL bounds
    # also falls to ELSE v — identical
    np.testing.assert_allclose(
        one["v_w"], exp["v_w"], atol=1e-9, equal_nan=True
    )


def test_negative_sampling_properties():
    from featherstore_ray.stages.misc import negative_sampling

    rng = np.random.default_rng(9)
    # 30 users x catalog of 12; user 7 interacts with ALL but one item
    u = rng.integers(0, 30, 400)
    it = rng.integers(0, 12, 400)
    u = np.concatenate([u, np.full(11, 7)])
    it = np.concatenate([it, np.arange(11)])
    t = pa.table(
        {"u": pa.array(u.astype(np.int64)), "i": pa.array(it.astype(np.int64))}
    )
    kw = dict(user_col="u", item_col="i", k=4, num_buckets=4, user_chunk=3)
    one = (
        negative_sampling(ray.data.from_arrow(t), **kw)
        .to_pandas().sort_values(["u", "rn"]).reset_index(drop=True)
    )
    many = (
        negative_sampling(ray.data.from_arrow(t).repartition(5), **kw)
        .to_pandas().sort_values(["u", "rn"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)
    # no sampled item was interacted with by that user
    seen = set(zip(u.tolist(), it.tolist()))
    assert all((r.u, r.i) not in seen for r in one.itertuples())
    # user 7 has at most 12 - 11 = 1 negative; others get k=4 unless saturated
    assert len(one[one["u"] == 7]) <= 1
    per_user = one.groupby("u")["rn"].agg(["size", "max"])
    assert (per_user["size"] == per_user["max"]).all()  # rn is 1..size


def test_zorder_layout_roundtrip_and_locality(ray_session):
    from featherstore_ray.stages.misc import _spread_bits16, zorder_layout

    rng = np.random.default_rng(3)
    n = 4000
    a = rng.uniform(0, 100, n)
    b = rng.integers(0, 64, n).astype(np.int64)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "value": pa.array(a),
        "user_id": pa.array(b),
    })
    one = (zorder_layout(ray.data.from_arrow(t), "value", "user_id",
                         bits=16, num_partitions=16)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    many = (zorder_layout(ray.data.from_arrow(t).repartition(7), "value",
                          "user_id", bits=16, num_partitions=16)
            .to_pandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, many)  # global min/max: layout-stable

    # round trip: de-interleave the key back to the quantized coords
    z = one["zkey"].to_numpy().astype(np.uint64)
    qa = np.floor((a - a.min()) / (a.max() - a.min()) * 65536.0)
    qa = np.minimum(qa, 65535.0).astype(np.uint64)
    qb = np.floor((b - b.min()) / (b.max() - b.min()) * 65536.0)
    qb = np.minimum(qb, 65535.0).astype(np.uint64)
    assert (z == (_spread_bits16(qa) | (_spread_bits16(qb) << np.uint64(1)))).all()

    # locality: a z-partition spans at most 1/sqrt(P) of EACH dimension's
    # quantized range (top 4 bits = 2 from each coordinate)
    df = one.copy()
    df["qa"], df["qb"] = qa, qb
    for _, g in df.groupby("zpart"):
        assert g["qa"].max() - g["qa"].min() <= 65536 // 4
        assert g["qb"].max() - g["qb"].min() <= 65536 // 4

    # null rows carry no curve position
    t2 = pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "value": pa.array([1.0, None, 3.0]),
        "user_id": pa.array([5, 6, None], pa.int64()),
    })
    out = zorder_layout(ray.data.from_arrow(t2), "value", "user_id",
                        num_partitions=4).to_pandas()
    assert sorted(out["event_id"]) == [0]
