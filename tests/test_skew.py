"""Skew handling: hot-key detection, salting, isolation — output parity."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.partition import BUCKET_COL
from featherstore_ray.stages.aggregate import grouped_aggregate
from featherstore_ray.stages.skew import (
    add_salted_bucket,
    hot_keys,
    key_counts,
    partition_hot_entities,
    window_features_skew_aware,
)
from featherstore_ray.pipelines.feature_suite import window_features


def _skewed_events(n=20000, seed=9):
    rng = np.random.default_rng(seed)
    # entity 0 is hot: ~50% of all rows
    ent = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 200, n))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(ent, pa.int64()),
            "ts": pa.array(np.sort(rng.integers(0, 10**9, n)) * 1000,
                           pa.timestamp("us")),
            "value": pa.array(rng.normal(0, 1, n), pa.float64()),
        }
    )


def test_hot_key_detection():
    tbl = _skewed_events()
    ds = ray.data.from_arrow(tbl)
    counts = key_counts(ds, "user_id")
    assert counts["n"].sum() == tbl.num_rows
    hot = hot_keys(ds, "user_id", min_count=5000)
    assert hot == {0}


def test_salted_bucket_spreads_hot_key():
    tbl = _skewed_events()
    ds = ray.data.from_arrow(tbl).repartition(8)
    salted = add_salted_bucket(
        ds, "user_id", {0}, num_buckets=16, num_salts=8
    ).to_pandas()
    hot_buckets = salted.loc[salted["user_id"] == 0, BUCKET_COL].nunique()
    assert hot_buckets >= 4  # hot key spread across multiple buckets
    # aggregation over the salted layout still merges correctly
    agg = grouped_aggregate(
        ray.data.from_arrow(tbl),
        ["user_id"],
        {"n": ("value", "count"), "s": ("value", "sum")},
        round_digits=6,
        final="driver",
    ).to_pandas()
    exp = (
        tbl.to_pandas().groupby("user_id")["value"].agg(["count", "sum"]).reset_index()
    )
    m = agg.sort_values("user_id").reset_index(drop=True)
    e = exp.sort_values("user_id").reset_index(drop=True)
    assert (m["n"].to_numpy() == e["count"].to_numpy()).all()
    np.testing.assert_allclose(m["s"], e["sum"].round(6), atol=1e-5)


def test_partition_hot_entities_dedicated():
    tbl = _skewed_events()
    ds = ray.data.from_arrow(tbl)
    out = partition_hot_entities(ds, "user_id", {0}, num_buckets=16).to_pandas()
    hot_b = out.loc[out["user_id"] == 0, BUCKET_COL].unique()
    assert list(hot_b) == [16]  # dedicated id past the hash range
    # no cold entity shares the dedicated partition
    assert (out.loc[out[BUCKET_COL] == 16, "user_id"] == 0).all()


def test_window_features_skew_aware_parity():
    tbl = _skewed_events(8000)
    ds = ray.data.from_arrow(tbl)
    plain = window_features(
        ds, entity_col="user_id", ts_col="ts", value_col="value",
        tiebreak="event_id", num_buckets=8,
    ).to_pandas()
    skew = window_features_skew_aware(
        ray.data.from_arrow(tbl),
        entity_col="user_id", ts_col="ts", value_col="value",
        tiebreak="event_id", num_buckets=8, hot_row_threshold=1000,
    ).to_pandas()
    p = plain.sort_values("event_id").reset_index(drop=True)
    s = skew.sort_values("event_id").reset_index(drop=True)
    assert len(p) == len(s) == len(tbl)
    for c in ["value_lag1", "value_rsum", "value_rcount", "session_id"]:
        a, b = p[c].to_numpy(), s[c].to_numpy()
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, equal_nan=True)
        else:
            assert (a == b).all(), c


def test_salted_hash_join_equals_unsalted(ray_session):
    """Zipf-hot probe key salted over 8 sub-partitions: output set equals
    the unsalted join exactly (inner + left), and a replicated right row
    never duplicates a pair."""
    import duckdb

    from featherstore_ray.stages.join import hash_join

    rng = np.random.default_rng(131)
    n = 6000
    # key 0 is 40% of the left side
    keys = np.where(rng.uniform(size=n) < 0.4, 0,
                    rng.integers(1, 200, n)).astype(np.int64)
    left = pa.table({
        "k": pa.array(keys),
        "lv": pa.array(np.arange(n), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(np.arange(0, 250, dtype=np.int64)),
        "rv": pa.array(np.arange(0, 250, dtype=np.int64) * 10),
    })
    # duplicate right rows on the hot key: fan-out > 1
    right = pa.concat_tables([right, right.slice(0, 1), right.slice(0, 1)])

    for how in ("inner", "left"):
        plain = hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on=["k"], how=how, num_partitions=8,
        ).to_pandas()
        salted = hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on=["k"], how=how, num_partitions=8,
            hot_keys={0}, num_salts=4,
        ).to_pandas()
        cols = sorted(plain.columns)
        a = plain[cols].sort_values(cols).reset_index(drop=True)
        b = salted[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    import pytest

    with pytest.raises(ValueError):
        hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  on=["k"], how="full_outer", hot_keys={0})
