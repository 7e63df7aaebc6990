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


def test_prometheus_and_json_dump(ray_session):
    metrics.reset()
    t = pa.table({"x": list(range(100))})
    assert metrics.instrument(ray.data.from_arrow(t), "dump.op").count() == 100
    with metrics.timed("dump.write", rows=3):
        pass
    text = metrics.dump_prometheus()
    assert '# TYPE featherstore_rows_total counter' in text
    assert 'featherstore_rows_total{op="dump.op"} 100' in text
    assert 'featherstore_rows_total{op="dump.write"} 3' in text
    assert '# HELP featherstore_latency_seconds_total' in text
    import json
    rep = json.loads(metrics.dump_json())
    assert rep["dump.op"]["rows"] == 100
    metrics.reset()
