"""Storage registry, row_group_size, time-partitioned layout + pruning,
staged Dataset ingest."""

from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from featherstore_ray.catalog import FeatherStore
from featherstore_ray.storage import get_format, registered_formats

SCHEMA = {
    "entity_id": "string",
    "timestamp": "timestamp[us]",
    "feature1": "float64",
}


def _batch(entities, ts_us, f1):
    return pa.table(
        {
            "entity_id": pa.array(entities, pa.string()),
            "timestamp": pa.array(ts_us, pa.timestamp("us")),
            "feature1": pa.array(f1, pa.float64()),
        }
    )


DAY = 24 * 3600 * 1_000_000
T0 = 1_700_000_000_000_000


def test_format_registry():
    assert {"parquet", "ipc", "csv"} <= set(registered_formats())
    with pytest.raises(ValueError, match="unknown storage format"):
        get_format("orc")
    with pytest.raises(ValueError, match="unknown storage format"):
        FeatherStore("/tmp/x-nonexistent", format="orc")


def test_row_group_size_honored(tmp_path, ray_session):
    store = FeatherStore(tmp_path / "s", row_group_size=100)
    store.create_feature_set("fs", SCHEMA)
    n = 1000
    store.ingest(
        "fs", _batch([f"e{i}" for i in range(n)], [T0 + i for i in range(n)],
                     [float(i) for i in range(n)])
    )
    f = next((tmp_path / "s" / "fs" / "data").glob("*.parquet"))
    assert pq.ParquetFile(f).metadata.num_row_groups == 10


def test_ipc_format_roundtrip(tmp_path, ray_session):
    store = FeatherStore(tmp_path / "s", format="ipc", compression="zstd")
    store.create_feature_set("fs", SCHEMA)
    store.ingest("fs", _batch(["a", "b"], [T0, T0 + 1], [1.0, 2.0]))
    files = list((tmp_path / "s" / "fs" / "data").glob("*.arrow"))
    assert len(files) == 1
    out = store.dataset("fs").to_pandas().sort_values("entity_id")
    assert list(out["feature1"]) == [1.0, 2.0]
    got = store.get_features("fs", ["a"]).to_pandas()
    assert len(got) == 1 and got["feature1"].iloc[0] == 1.0


def test_csv_format_roundtrip(tmp_path, ray_session):
    store = FeatherStore(tmp_path / "s", format="csv")
    store.create_feature_set("fs", SCHEMA)
    store.ingest("fs", _batch(["a", "b"], [T0, T0 + 1], [1.0, 2.0]))
    out = store.dataset("fs").to_pandas().sort_values("entity_id")
    assert list(out["feature1"]) == [1.0, 2.0]


def test_partitioned_layout_and_pruning(tmp_path, ray_session):
    store = FeatherStore(tmp_path / "s", partition_granularity="day")
    store.create_feature_set("fs", SCHEMA)
    # 5 consecutive days, 2 rows each
    ents, ts, f1 = [], [], []
    for d in range(5):
        for j in range(2):
            ents.append("e1" if j == 0 else "e2")
            ts.append(T0 + d * DAY + j)
            f1.append(float(d * 10 + j))
    store.ingest("fs", _batch(ents, ts, f1))
    data_dir = tmp_path / "s" / "fs" / "data"
    buckets = sorted(p.name for p in data_dir.glob("ts_bucket=*"))
    assert len(buckets) == 5, buckets

    # file-level pruning: a 2-day range reads only 2 bucket dirs
    start = datetime.fromtimestamp((T0 + 1 * DAY) / 1e6, tz=timezone.utc).replace(tzinfo=None)
    end = datetime.fromtimestamp((T0 + 2 * DAY) / 1e6, tz=timezone.utc).replace(tzinfo=None)
    fmt, files = store._files("fs", start=start, end=end)
    assert len(files) == 2
    # and the query result matches the row-level predicate exactly
    out = store.get_feature_history("fs", "e1", start=start, end=end).to_pandas()
    assert sorted(out["feature1"]) == [10.0, 20.0]

    # full read sees all 10 rows
    assert store.dataset("fs").count() == 10


def test_dataset_ingest_staged_and_counted(tmp_path, ray_session):
    store = FeatherStore(tmp_path / "s", partition_granularity="day")
    store.create_feature_set("fs", SCHEMA)
    n = 500
    tbl = _batch(
        [f"e{i % 7}" for i in range(n)],
        [T0 + (i % 3) * DAY + i for i in range(n)],
        [float(i) for i in range(n)],
    )
    written = store.ingest("fs", ray.data.from_arrow(tbl))
    assert written == n
    # no staging residue; all rows readable
    assert not list((tmp_path / "s" / "fs").glob(".staging-*"))
    assert store.dataset("fs").count() == n
    # partition dirs exist (3 distinct days)
    assert len(list((tmp_path / "s" / "fs" / "data").glob("ts_bucket=*"))) == 3


def test_layout_persisted_in_metadata(tmp_path, ray_session):
    store = FeatherStore(tmp_path / "s", partition_granularity="day")
    store.create_feature_set("fs", SCHEMA)
    store.ingest("fs", _batch(["a"], [T0], [1.0]))
    # reopen with DIFFERENT defaults: the set keeps its created layout
    store2 = FeatherStore(tmp_path / "s")
    store2.ingest("fs", _batch(["b"], [T0 + DAY], [2.0]))
    assert len(list((tmp_path / "s" / "fs" / "data").glob("ts_bucket=*"))) == 2
    assert store2.dataset("fs").count() == 2


def test_jsonl_format_roundtrip(tmp_path, ray_session):
    store = FeatherStore(tmp_path / "s", format="jsonl")
    store.create_feature_set("fs", SCHEMA)
    store.ingest("fs", _batch(["a", "b"], [T0, T0 + 1], [1.0, 2.0]))
    files = list((tmp_path / "s" / "fs" / "data").glob("*.jsonl"))
    assert len(files) == 1
    out = store.dataset("fs").to_pandas().sort_values("entity_id")
    assert list(out["feature1"]) == [1.0, 2.0]
    # explicit-schema reads keep timestamp[us] EXACT through JSON
    assert list(out["timestamp"].astype("datetime64[us]").astype("int64")) \
        == [T0, T0 + 1]
    got = store.get_features("fs", ["a"]).to_pandas()
    assert len(got) == 1 and got["feature1"].iloc[0] == 1.0
