"""The sort-shuffle fallback path (FSR_EXCHANGE=sort) is semantically
identical to the direct exchange — every wide operator must pass through
both. Exercised on representative oracled pipelines."""

import os

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

EVENTS = "/root/testdata/sf0.001/events.parquet"
EV_COLS = ["event_id", "user_id", "ts", "event_type", "value"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns), kind="stable").reset_index(
        drop=True
    )


@pytest.fixture()
def sort_mode(monkeypatch):
    monkeypatch.setenv("FSR_EXCHANGE", "sort")


def test_feature_suite_sort_path(sort_mode, ray_session):
    from featherstore_ray.pipelines.feature_suite import feature_suite

    sort = feature_suite(
        ray.data.read_parquet(EVENTS, columns=EV_COLS), num_buckets=8
    ).to_pandas()
    os.environ["FSR_EXCHANGE"] = "direct"
    direct = feature_suite(
        ray.data.read_parquet(EVENTS, columns=EV_COLS), num_buckets=8
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(sort), _canon(direct), check_dtype=False
    )


def test_chunked_suite_sort_path(sort_mode, ray_session):
    from featherstore_ray.stages.chunked import feature_suite_chunked

    kw = dict(num_buckets=8, hot_row_threshold=20, target_chunk_rows=25)
    sort = feature_suite_chunked(
        ray.data.read_parquet(EVENTS, columns=EV_COLS), **kw
    ).to_pandas()
    os.environ["FSR_EXCHANGE"] = "direct"
    direct = feature_suite_chunked(
        ray.data.read_parquet(EVENTS, columns=EV_COLS), **kw
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(sort), _canon(direct), check_dtype=False
    )


def test_coalesce_split_buckets(ray_session):
    """A bucket split across blocks (Ray's dynamic splitting on the sort
    fallback) must be re-merged so every bucket is whole in ONE block."""
    import numpy as np

    import ray

    from featherstore_ray.exchange import _coalesce_split_buckets
    from featherstore_ray.partition import BUCKET_COL

    def blk(buckets):
        b = np.asarray(buckets, dtype=np.int64)
        return pa.table(
            {BUCKET_COL: pa.array(b), "v": pa.array(np.arange(len(b)))}
        )

    # bucket 1 split across blocks 0/1, bucket 3 across 2/3; 5 whole
    refs = [
        ray.put(blk([0, 1, 1])),
        ray.put(blk([1, 2])),
        ray.put(blk([3])),
        ray.put(blk([3, 4])),
        ray.put(blk([5])),
    ]
    ds = ray.data.from_arrow_refs(refs)
    fixed = _coalesce_split_buckets(ds, BUCKET_COL)
    seen: dict[int, int] = {}
    for i, batch in enumerate(
        fixed.iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        for bkt in set(batch[BUCKET_COL].to_pylist()):
            assert bkt not in seen, f"bucket {bkt} in blocks {seen[bkt]},{i}"
            seen[bkt] = i
    assert set(seen) == {0, 1, 2, 3, 4, 5}
    assert fixed.count() == ds.count()


def test_repartition_sort_path_whole_buckets(sort_mode, ray_session):
    """repartition_by_bucket on the sort fallback keeps whole buckets per
    block (the chunked-suite finalize contract)."""
    import numpy as np

    from featherstore_ray.exchange import repartition_by_bucket
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    n = 5000
    t = pa.table(
        {
            "user_id": pa.array(np.arange(n, dtype=np.int64) % 13),
            "v": pa.array(np.arange(n, dtype=np.float64)),
        }
    )
    ds = add_bucket_column(ray.data.from_arrow(t), "user_id", 8)
    out, _ = repartition_by_bucket(ds, num_buckets=8)
    seen: dict[int, int] = {}
    for i, batch in enumerate(
        out.iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        for bkt in set(batch[BUCKET_COL].to_pylist()):
            assert bkt not in seen, f"bucket {bkt} split across blocks"
            seen[bkt] = i
    assert out.count() == n


def test_asof_join_sort_path(sort_mode, ray_session):
    import pyarrow.compute as pc

    from featherstore_ray.stages.asof import asof_join

    def run():
        events = ray.data.read_parquet(EVENTS, columns=EV_COLS)
        spine = events.map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        feats = events.map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "click")),
            batch_format="pyarrow", zero_copy_batch=True,
        ).select_columns(["user_id", "ts", "value", "event_id"])
        return asof_join(
            spine, feats, entity_col="user_id", spine_ts="ts",
            feature_ts="ts", feature_cols=["ts", "value"],
            tiebreak="event_id", num_buckets=8,
        ).to_pandas()

    sort = run()
    os.environ["FSR_EXCHANGE"] = "direct"
    direct = run()
    pd.testing.assert_frame_equal(
        _canon(sort), _canon(direct), check_dtype=False
    )
