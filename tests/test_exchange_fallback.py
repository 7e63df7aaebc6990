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
