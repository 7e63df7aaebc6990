"""Chunked (intra-entity time-parallel) suite == plain suite, exactly."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.pipelines.feature_suite import feature_suite
from featherstore_ray.stages.chunked import feature_suite_chunked

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns), kind="stable").reset_index(
        drop=True
    )


def test_chunked_matches_plain_on_events(ray_session):
    plain = feature_suite(
        ray.data.read_parquet(EVENTS), num_buckets=8
    ).to_pandas()
    # tiny threshold/chunk target: every user becomes hot and gets chunked
    chunked = feature_suite_chunked(
        ray.data.read_parquet(EVENTS),
        num_buckets=8,
        hot_row_threshold=20,
        target_chunk_rows=25,
    ).to_pandas()
    p, c = _canon(plain), _canon(chunked)
    assert len(p) == len(c)
    assert list(p.columns) == list(c.columns)
    pd.testing.assert_frame_equal(p, c, check_dtype=False)


def test_chunked_matches_plain_on_tokens(ray_session):
    from featherstore_ray.pipelines.tokens_features import derive_doc_events

    tokens = ray.data.read_parquet("/root/testdata/sf0.001")
    # use the documents-derived corpus instead: build from tokens generator
    from featherstore_ray.sources.tokens import tokens_parquet

    tdir = tokens_parquet(20_000)
    events = lambda: derive_doc_events(ray.data.read_parquet(tdir))
    kw = dict(
        entity_col="doc_id", ts_col="ts", value_col="value",
        type_col="event_kind", tiebreak="seq_hash",
        spine_type=1, feature_type=0, num_buckets=8,
    )
    plain = feature_suite(events(), **kw).to_pandas()
    chunked = feature_suite_chunked(
        events(), hot_row_threshold=300, target_chunk_rows=200, **kw
    ).to_pandas()
    p, c = _canon(plain), _canon(chunked)
    assert len(p) == len(c), (len(p), len(c))
    pd.testing.assert_frame_equal(p, c, check_dtype=False)


def test_chunked_pandas_carry_null_valued_feature(ray_session):
    """Pandas chunk kernel (string tiebreak forces it): a spine row whose
    latest feature has a NULL value must keep that feature's ts_asof — the
    cross-chunk carry applies only to true misses (ts_asof NaT), never to
    null-VALUED matches (the ADVICE chunked.py:614 regression)."""
    from datetime import timedelta

    n = 200
    ts = pd.date_range("2024-01-01", periods=n, freq="60s")
    types = np.array(["click"] * n, dtype=object)
    types[[50, 101, 150]] = "purchase"
    vals = np.arange(n, dtype=np.float64)
    vals[100] = np.nan  # null-valued click right before the purchase at 101
    t = pa.table(
        {
            "user_id": pa.array(np.ones(n, dtype=np.int64)),
            "ts": pa.array(ts),
            "event_type": pa.array(types),
            "value": pa.array(vals),
            "tb": pa.array([f"e{i:05d}" for i in range(n)]),  # string
        }
    )
    kw = dict(
        entity_col="user_id", ts_col="ts", value_col="value",
        type_col="event_type", tiebreak="tb", num_buckets=4,
        rolling_window=timedelta(minutes=10),
        session_gap=timedelta(minutes=5),
    )
    plain = feature_suite(ray.data.from_arrow(t), **kw).to_pandas()
    chunked = feature_suite_chunked(
        ray.data.from_arrow(t), hot_row_threshold=20, target_chunk_rows=25,
        **kw
    ).to_pandas()
    p, c = _canon(plain), _canon(chunked)
    assert len(p) == len(c)
    pd.testing.assert_frame_equal(p, c, check_dtype=False)
    hit = c[c["tb"] == "e00101"]
    assert len(hit) == 1
    assert np.isnan(hit["value_asof"].iloc[0])  # null-valued match kept
    assert hit["ts_asof"].iloc[0] == ts[100]  # its ts, not the carry's


def test_chunked_no_hot_falls_through(ray_session):
    # threshold higher than any entity count: spec is None, pure cold path
    plain = feature_suite(
        ray.data.read_parquet(EVENTS), num_buckets=8
    ).to_pandas()
    chunked = feature_suite_chunked(
        ray.data.read_parquet(EVENTS),
        num_buckets=8,
        hot_row_threshold=10**9,
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(plain), _canon(chunked), check_dtype=False
    )


def test_rolling_window_chunked_matches_plain(ray_session):
    from datetime import timedelta

    from featherstore_ray.stages.chunked import rolling_window_chunked
    from featherstore_ray.stages.window import rolling_aggregate

    cols = ["event_id", "user_id", "ts", "value"]
    kw = dict(
        entity_col="user_id", ts_col="ts", value_col="value",
        tiebreak="event_id", aggs=("sum", "mean", "count", "min", "max"),
        num_buckets=8,
    )
    plain = rolling_aggregate(
        ray.data.read_parquet(EVENTS, columns=cols),
        window=timedelta(hours=24), **kw
    ).to_pandas()
    chunked = rolling_window_chunked(
        ray.data.read_parquet(EVENTS, columns=cols),
        rolling_window=timedelta(hours=24),
        hot_row_threshold=5, target_chunk_rows=4,  # everyone hot, tiny chunks
        **kw
    ).to_pandas()
    p, c = _canon(plain), _canon(chunked)
    assert len(p) == len(c), (len(p), len(c))
    pd.testing.assert_frame_equal(p, c, check_dtype=False)


def test_fused_vs_unfused_parity(ray_session, monkeypatch):
    """FSR_CHUNKED_FUSED=0 (materializing repartition) and =1 (single-read
    assign+split waves) produce identical suite output."""
    kw = dict(num_buckets=8, hot_row_threshold=20, target_chunk_rows=25)
    monkeypatch.setenv("FSR_CHUNKED_FUSED", "1")
    fused = feature_suite_chunked(
        ray.data.read_parquet(EVENTS), **kw).to_pandas()
    monkeypatch.setenv("FSR_CHUNKED_FUSED", "0")
    unfused = feature_suite_chunked(
        ray.data.read_parquet(EVENTS), **kw).to_pandas()
    pd.testing.assert_frame_equal(_canon(fused), _canon(unfused),
                                  check_dtype=False)
