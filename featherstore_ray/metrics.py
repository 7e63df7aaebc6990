"""Operational metrics: per-operator rows/bytes/latency counters.

Ray-native equivalent of the reference's metrics registry
(pkg/metrics/metrics.go:56-249 — per-op row/byte/latency counters served to
the operator). One named metrics actor per Ray session aggregates counts
reported by instrumented stages; the driver (or a job monitor) reads a
snapshot at any time while the pipeline is still running.

Usage::

    ds = instrument(ds, "ingest.read")          # pass-through counting stage
    ... run pipeline ...
    print(report())                             # {'ingest.read': {...}}

``instrument`` adds one actor RPC per BLOCK (not per row/batch of 1024), so
overhead is microseconds per hundreds of MB. Counters survive across
pipelines within a session and reset with ``reset()``.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import pyarrow as pa

import ray
import ray.data

_ACTOR_NAME = "fsr_metrics"


@ray.remote(num_cpus=0)
class _MetricsActor:
    def __init__(self):
        self._ops: dict[str, dict] = {}

    def inc(self, op: str, rows: int, nbytes: int, seconds: float) -> None:
        d = self._ops.setdefault(
            op, {"rows": 0, "bytes": 0, "seconds": 0.0, "batches": 0}
        )
        d["rows"] += rows
        d["bytes"] += nbytes
        d["seconds"] += seconds
        d["batches"] += 1

    def snapshot(self) -> dict:
        return {k: dict(v) for k, v in self._ops.items()}

    def reset(self) -> None:
        self._ops.clear()


_HANDLE = None


def _actor():
    global _HANDLE
    if _HANDLE is None:
        # named (session-scoped) actor; NOT detached — detached actors in an
        # anonymous namespace draw a raylet warning and outlive the session
        _HANDLE = _MetricsActor.options(
            name=_ACTOR_NAME, get_if_exists=True
        ).remote()
    return _HANDLE


def instrument(ds: ray.data.Dataset, op: str) -> ray.data.Dataset:
    """Append a zero-copy pass-through stage that counts rows/bytes for
    ``op``. A pass-through stage cannot observe the producing stage's
    compute time, so its ``seconds`` counter stays 0 — latency comes only
    from ``record()`` / ``timed()`` around driver-side operations."""

    def count(t: pa.Table) -> pa.Table:
        handle = ray.get_actor(_ACTOR_NAME)
        handle.inc.remote(op, t.num_rows, t.nbytes, 0.0)
        return t

    _actor()  # ensure it exists before workers look it up
    return ds.map_batches(
        count, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def record(op: str, rows: int = 0, nbytes: int = 0, seconds: float = 0.0):
    """Direct driver-side counter bump (e.g. around a write or a query)."""
    ray.get(_actor().inc.remote(op, rows, nbytes, seconds))


@contextmanager
def timed(op: str, rows: int = 0, nbytes: int = 0):
    """Time a driver-side operation into the metrics registry."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        record(op, rows, nbytes, time.perf_counter() - t0)


def report() -> dict:
    """Snapshot of all counters: {op: {rows, bytes, seconds, batches}}."""
    return ray.get(_actor().snapshot.remote())


def reset() -> None:
    ray.get(_actor().reset.remote())


def dump_prometheus() -> str:
    """Render the registry in Prometheus text exposition format — the dump
    parity for the reference's scrape endpoint (pkg/metrics/metrics.go:
    232-249 ObserveFeature* count/bytes/latency observations). One counter
    family per observation field, labeled by op; suitable for a textfile
    collector or a debug endpoint."""
    snap = report()
    fams = [
        ("featherstore_rows_total", "counter",
         "Rows processed per instrumented op", "rows"),
        ("featherstore_bytes_total", "counter",
         "Arrow bytes processed per instrumented op", "bytes"),
        ("featherstore_latency_seconds_total", "counter",
         "Accumulated op latency in seconds", "seconds"),
        ("featherstore_batches_total", "counter",
         "Blocks/observations per instrumented op", "batches"),
    ]
    lines: list[str] = []
    for name, typ, help_, field_ in fams:
        lines.append(f"# HELP {name} {help_}")
        lines.append(f"# TYPE {name} {typ}")
        for op in sorted(snap):
            label = op.replace("\\", "\\\\").replace('"', '\\"')
            lines.append(f'{name}{{op="{label}"}} {snap[op][field_]}')
    return "\n".join(lines) + "\n"


def dump_json() -> str:
    """JSON dump of the registry snapshot (machine-readable sibling of
    :func:`dump_prometheus`)."""
    import json

    return json.dumps(report(), sort_keys=True)
