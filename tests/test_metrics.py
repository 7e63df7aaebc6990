"""Operational metrics counters (reference pkg/metrics/metrics.go parity)."""

import pyarrow as pa

import ray.data

from featherstore_ray import metrics


def test_instrument_counts_rows_and_bytes(ray_session):
    metrics.reset()
    t = pa.table({"x": list(range(1000))})
    ds = metrics.instrument(ray.data.from_arrow(t), "test.op")
    assert ds.count() == 1000
    rep = metrics.report()
    assert rep["test.op"]["rows"] == 1000
    assert rep["test.op"]["bytes"] > 0
    assert rep["test.op"]["batches"] >= 1


def test_timed_and_record(ray_session):
    metrics.reset()
    with metrics.timed("test.write", rows=5):
        pass
    metrics.record("test.write", rows=7)
    rep = metrics.report()
    assert rep["test.write"]["rows"] == 12
    assert rep["test.write"]["seconds"] >= 0.0
    metrics.reset()
    assert metrics.report() == {}
