"""Feature-store lifecycle test, mirroring the reference's own fixture flow
(pkg/storage/parquet/parquet_test.go:21-222): create → metadata on disk →
ingest a small batch → retrieve latest per entity with exact values → list →
delete → not-found.
"""

import json

import pyarrow as pa
import pytest

from featherstore_ray.catalog import FeatherStore, FeatureSetNotFound
from featherstore_ray.schema import SchemaError


SCHEMA = {
    "entity_id": "string",
    "timestamp": "timestamp[us]",
    "feature1": "float64",
    "feature2": "int64",
}


def _batch(entities, ts, f1, f2):
    return pa.table(
        {
            "entity_id": pa.array(entities, pa.string()),
            "timestamp": pa.array(ts, pa.timestamp("us")),
            "feature1": pa.array(f1, pa.float64()),
            "feature2": pa.array(f2, pa.int64()),
        }
    )


@pytest.fixture()
def store(tmp_path):
    return FeatherStore(tmp_path / "store")


def test_lifecycle(store):
    store.create_feature_set("test_features", SCHEMA, description="d", tags=["t"])
    meta_path = store.root / "test_features" / "metadata.json"
    assert meta_path.exists()
    meta = json.loads(meta_path.read_text())
    assert meta["name"] == "test_features"
    assert {f["name"] for f in meta["features"]} == set(SCHEMA)

    # round-trip schema through base64 IPC
    got = store.get_feature_set("test_features")["schema"]
    assert got.field("feature1").type == pa.float64()

    # reference golden rows (parquet_test.go:121-134)
    n = store.ingest(
        "test_features",
        _batch(
            ["entity1", "entity2", "entity3"],
            [1_700_000_000_000_000] * 3,
            [1.1, 2.2, 3.3],
            [10, 20, 30],
        ),
    )
    assert n == 3
    files = list((store.root / "test_features" / "data").glob("*.parquet"))
    assert len(files) == 1

    out = (
        store.get_features("test_features", ["entity1", "entity2"])
        .to_pandas()
        .sort_values("entity_id")
    )
    assert list(out["entity_id"]) == ["entity1", "entity2"]
    assert list(out["feature1"]) == [1.1, 2.2]
    assert list(out["feature2"]) == [10, 20]

    assert store.list_feature_sets() == ["test_features"]
    store.delete_feature_set("test_features")
    with pytest.raises(FeatureSetNotFound):
        store.get_feature_set("test_features")


def test_latest_wins_and_history(store):
    store.create_feature_set("fs", SCHEMA)
    base = 1_700_000_000_000_000
    store.ingest(
        "fs",
        _batch(["e1", "e1", "e2"], [base, base + 10, base + 5], [1.0, 2.0, 9.0], [1, 2, 9]),
    )
    store.ingest("fs", _batch(["e1"], [base + 3], [1.5], [15]))

    latest = store.get_features("fs", ["e1", "e2"]).to_pandas().sort_values("entity_id")
    # latest timestamp wins across files (duckdb.go:617-625)
    assert list(latest["feature1"]) == [2.0, 9.0]

    # inclusive [start, end] bounds (parquet.go:728)
    hist = store.get_feature_history(
        "fs",
        "e1",
        start=pa.scalar(base + 3, pa.timestamp("us")).as_py(),
        end=pa.scalar(base + 10, pa.timestamp("us")).as_py(),
    ).to_pandas()
    assert list(hist["feature1"]) == [2.0, 1.5]  # ts desc


def test_ingest_schema_validation(store):
    store.create_feature_set("fs", SCHEMA)
    bad = pa.table({"entity_id": pa.array(["x"]), "timestamp": pa.array([1], pa.int64())})
    with pytest.raises(SchemaError):
        store.ingest("fs", bad)


def test_create_requires_entity(store):
    with pytest.raises(SchemaError):
        store.create_feature_set("nope", {"f": "float64"})


def test_ingest_ray_dataset(store):
    import ray.data

    store.create_feature_set("fs", SCHEMA)
    tbl = _batch(["e1", "e2", "e3", "e4"], [1, 2, 3, 4], [1.0, 2.0, 3.0, 4.0],
                 [1, 2, 3, 4])
    n = store.ingest("fs", ray.data.from_arrow(tbl))
    assert n == 4
    back = store.dataset("fs").to_pandas().sort_values("entity_id")
    assert list(back["feature1"]) == [1.0, 2.0, 3.0, 4.0]
    # schema violations on the Dataset path fail before any write
    bad = ray.data.from_arrow(
        pa.table({"entity_id": pa.array([1], pa.int64())})
    )
    with pytest.raises(SchemaError):
        store.ingest("fs", bad)


def test_concurrent_table_ingest_no_collision(store):
    """Two simultaneous ingest() calls into one set must never overwrite
    each other's part file (uuid part names; was a glob-counted index)."""
    import threading

    store.create_feature_set("conc", SCHEMA)
    n_threads, per = 8, 25
    errs = []

    def work(k):
        try:
            for i in range(3):
                store.ingest(
                    "conc",
                    _batch(
                        [f"e{k}-{i}-{j}" for j in range(per)],
                        [1_700_000_000_000_000 + k] * per,
                        [float(j) for j in range(per)],
                        list(range(per)),
                    ),
                )
        except Exception as e:  # surfaced after join
            errs.append(e)

    threads = [
        threading.Thread(target=work, args=(k,)) for k in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    got = store.dataset("conc")
    assert got.count() == n_threads * 3 * per


def test_compact_merges_small_files(store):
    store.create_feature_set("cmp", SCHEMA)
    for i in range(10):
        store.ingest(
            "cmp",
            _batch(
                [f"e{i}-{j}" for j in range(20)],
                [1_700_000_000_000_000 + i] * 20,
                [float(j) for j in range(20)],
                list(range(20)),
            ),
        )
    before = store.dataset("cmp").to_pandas().sort_values(
        ["entity_id"]
    ).reset_index(drop=True)
    res = store.compact("cmp")
    assert res["files_before"] == 10
    assert res["files_after"] == 1
    after = store.dataset("cmp").to_pandas().sort_values(
        ["entity_id"]
    ).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(before, after)


def test_compact_respects_target_bytes_and_buckets(tmp_path):
    store = FeatherStore(
        tmp_path / "bstore", partition_granularity="day"
    )
    store.create_feature_set("cmpb", SCHEMA)
    # two days, several files each
    day = 86_400_000_000
    t0 = 1_700_000_000_000_000
    for i in range(4):
        for d in range(2):
            store.ingest(
                "cmpb",
                _batch(
                    [f"e{d}-{i}-{j}" for j in range(10)],
                    [t0 + d * day] * 10,
                    [1.0] * 10,
                    [1] * 10,
                ),
            )
    before = store.dataset("cmpb").count_rows() if hasattr(
        store.dataset("cmpb"), "count_rows"
    ) else store.dataset("cmpb").to_pandas().shape[0]
    res = store.compact("cmpb")
    # per-bucket merge: 8 files -> 2 (one per day directory)
    assert res["files_before"] == 8
    assert res["files_after"] == 2
    after = store.dataset("cmpb").to_pandas().shape[0]
    assert after == before == 80


def test_expire_drops_old_buckets_only(tmp_path, ray_session):
    from datetime import datetime, timezone

    import pytest

    from featherstore_ray.catalog import FeatherStore

    store = FeatherStore(tmp_path / "s", partition_granularity="day")
    store.create_feature_set("fs", SCHEMA)
    t0 = 1_704_067_200_000_000  # 2024-01-01 UTC us
    day = 86_400_000_000
    ents, ts, f1 = [], [], []
    for d in range(5):
        ents.append("e1")
        ts.append(t0 + d * day)
        f1.append(float(d))
    store.ingest("fs", _batch(ents, ts, f1, f1))
    data_dir = tmp_path / "s" / "fs" / "data"
    assert len(list(data_dir.glob("ts_bucket=*"))) == 5

    cutoff = datetime.fromtimestamp((t0 + 2 * day) / 1e6,
                                    tz=timezone.utc).replace(tzinfo=None)
    res = store.expire("fs", older_than=cutoff)
    assert res["buckets_removed"] == 2 and res["files_removed"] == 2
    # boundary bucket retained in full; newer data untouched
    left = store.dataset("fs").to_pandas()["feature1"].sort_values()
    assert list(left) == [2.0, 3.0, 4.0]
    # idempotent
    assert store.expire("fs", older_than=cutoff)["buckets_removed"] == 0

    # unpartitioned sets refuse
    store2 = FeatherStore(tmp_path / "s2")
    store2.create_feature_set("fs", SCHEMA)
    with pytest.raises(ValueError):
        store2.expire("fs", older_than=cutoff)
