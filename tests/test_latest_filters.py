"""latest_per_entity (J1) + filters (M1/M2) vs DuckDB oracles."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from featherstore_ray.stages.filters import semi_join_filter, time_range_filter
from featherstore_ray.stages.latest import latest_per_entity


@pytest.fixture(scope="module")
def events():
    rng = np.random.default_rng(3)
    n = 5000
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "entity_id": pa.array(rng.integers(0, 200, n), pa.int64()),
            "timestamp": pa.array(
                rng.integers(0, 10**9, n) * 1000, pa.timestamp("us")
            ),
            "value": pa.array(rng.normal(0, 1, n), pa.float64()),
        }
    )


def test_latest_per_entity_matches_oracle(events):
    out = latest_per_entity(
        ray.data.from_arrow(events),
        entity_col="entity_id",
        ts_col="timestamp",
        tiebreak="event_id",
        num_buckets=8,
    ).to_pandas()
    con = duckdb.connect()
    con.register("events", events)
    exp = con.execute(
        """
        SELECT event_id, entity_id, timestamp, value FROM (
          SELECT *, row_number() OVER (
            PARTITION BY entity_id ORDER BY timestamp DESC, event_id DESC) rn
          FROM events) WHERE rn = 1
        """
    ).df()
    m = out.sort_values("entity_id").reset_index(drop=True)
    e = exp.sort_values("entity_id").reset_index(drop=True)
    assert (m["event_id"].to_numpy() == e["event_id"].to_numpy()).all()


def test_latest_with_semi_join(events):
    ids = [1, 5, 7, 9999]  # 9999 absent
    out = latest_per_entity(
        ray.data.from_arrow(events),
        entity_col="entity_id",
        ts_col="timestamp",
        tiebreak="event_id",
        entity_ids=ids,
        num_buckets=4,
    ).to_pandas()
    assert set(out["entity_id"]) == {1, 5, 7}


def test_time_range_inclusive(events):
    lo = pa.scalar(2 * 10**11, pa.timestamp("us"))
    hi = pa.scalar(6 * 10**11, pa.timestamp("us"))
    out = time_range_filter(
        ray.data.from_arrow(events), "timestamp", lo, hi
    ).to_pandas()
    ts = events["timestamp"].cast(pa.int64()).to_numpy()
    want = ((ts >= 2 * 10**11) & (ts <= 6 * 10**11)).sum()
    assert len(out) == want
    # boundary rows retained (inclusive both ends, parquet.go:728)
    t0 = 1_700_000_000_000_000
    tbl = pa.table(
        {"timestamp": pa.array([t0 - 1, t0, t0 + 5, t0 + 6], pa.timestamp("us"))}
    )
    got = time_range_filter(
        ray.data.from_arrow(tbl),
        "timestamp",
        pa.scalar(t0, pa.timestamp("us")),
        pa.scalar(t0 + 5, pa.timestamp("us")),
    ).to_pandas()
    assert len(got) == 2


def test_semi_join_filter(events):
    out = semi_join_filter(ray.data.from_arrow(events), "entity_id", [3, 4]).to_pandas()
    assert set(out["entity_id"]) <= {3, 4}
    ent = events["entity_id"].to_numpy()
    assert len(out) == ((ent == 3) | (ent == 4)).sum()


def test_anti_join_filter_null_keys_dropped(ray_session):
    # SQL: NULL NOT IN (non-empty list) is NULL -> WHERE drops the row
    from featherstore_ray.stages.filters import anti_join_filter

    t = pa.table(
        {
            "k": pa.array([1, 2, None, 3, None], pa.int64()),
            "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
        }
    )
    out = anti_join_filter(
        ray.data.from_arrow(t), "k", [2, 9]
    ).to_pandas()
    con = duckdb.connect()
    exp = con.execute(
        "SELECT * FROM t WHERE k NOT IN (2, 9) ORDER BY v"
    ).df()
    got = out.sort_values("v").reset_index(drop=True)
    assert list(got["v"]) == list(exp["v"]) == [10, 40]


def test_bloom_build_probe_share_positions():
    # build and probe must derive identical bit positions for the same key
    import numpy as np

    from featherstore_ray.partition import stable_hash
    from featherstore_ray.stages.filters import _bloom_positions, build_bloom

    keys = pa.array([7, 42, 99], pa.int64())
    bl = build_bloom(keys, num_bits=1 << 12, num_hashes=3)
    h = stable_hash(keys)
    for i in range(3):
        hi = _bloom_positions(h, i, bl["num_bits"])
        assert (
            (bl["bits"][(hi // 8).astype(np.int64)]
             & (1 << (hi % 8)).astype(np.uint8)) != 0
        ).all()


def test_merge_upsert_semantics_and_idempotence():
    import pandas as pd

    from featherstore_ray.stages.latest import merge_upsert

    base = pa.table({
        "k": [1, 2, 3],
        "ts": pa.array(pd.to_datetime(
            ["2024-01-01", "2024-01-05", "2024-01-03"]
        ).values.astype("datetime64[us]")),
        "v": [10.0, 20.0, 30.0], "tb": [1, 2, 3],
    })
    delta = pa.table({
        "k": [2, 3, 4],
        "ts": pa.array(pd.to_datetime(
            ["2024-01-04", "2024-01-03", "2024-01-02"]
        ).values.astype("datetime64[us]")),
        "v": [21.0, 31.0, 40.0], "tb": [5, 6, 7],
    })
    out = merge_upsert(
        ray.data.from_arrow(base), ray.data.from_arrow(delta),
        entity_col="k", ts_col="ts", tiebreak="tb", num_buckets=2,
    ).to_pandas().set_index("k").sort_index()
    # base-only key survives; delta-only inserts
    assert out.loc[1, "v"] == 10.0 and out.loc[4, "v"] == 40.0
    # older delta loses (k=2); equal-ts resolves by max tiebreak (k=3)
    assert out.loc[2, "v"] == 20.0
    assert out.loc[3, "v"] == 31.0 and out.loc[3, "tb"] == 6
    # idempotent: upserting the delta again changes nothing
    out2 = merge_upsert(
        ray.data.from_arrow(pa.Table.from_pandas(
            out.reset_index(), preserve_index=False)),
        ray.data.from_arrow(delta),
        entity_col="k", ts_col="ts", tiebreak="tb", num_buckets=2,
    ).to_pandas().set_index("k").sort_index()
    pd.testing.assert_frame_equal(out, out2[out.columns])


def test_merge_upsert_delta_wins_equal_timestamp():
    import pandas as pd

    from featherstore_ray.stages.latest import merge_upsert

    ts = pa.array(pd.to_datetime(["2024-01-01 00:00"]
                                 ).values.astype("datetime64[us]"))
    base = pa.table({"k": [1], "ts": ts, "v": [1.0]})
    delta = pa.table({"k": [1], "ts": ts, "v": [2.0]})
    for _ in range(3):  # deterministic across repeated runs
        out = merge_upsert(
            ray.data.from_arrow(base), ray.data.from_arrow(delta),
            entity_col="k", ts_col="ts", num_buckets=2,
        ).to_pandas()
        assert len(out) == 1 and out.iloc[0]["v"] == 2.0
        assert "_fsr_src" not in out.columns
