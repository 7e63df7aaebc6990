"""Vectorized filters: entity semi-join and inclusive time-range.

Reference parity:
- entity semi-join (keep rows whose entity is in a requested small set):
  pkg/storage/parquet/parquet.go:642-676 and the SQL ``WHERE entity_id IN``
  at pkg/storage/duckdb/duckdb.go:620-625. The small ID list is broadcast
  (captured in the task closure — KBs), never shuffled.
- time-range filter with **inclusive** bounds on both ends:
  pkg/storage/parquet/parquet.go:728 (``!t.Before(start) && !t.After(end)``)
  and pkg/storage/duckdb/duckdb.go:683-689 (``>= ? AND <= ?``).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def semi_join_filter(
    ds: ray.data.Dataset,
    key: str,
    values: Sequence[Any],
) -> ray.data.Dataset:
    """Keep rows whose ``key`` column is in ``values`` (broadcast semi-join).

    ``values`` must be driver-side small (an ID list); for large key sets use
    a bucket-partitioned join instead.
    """
    value_set = pa.array(sorted(set(values)))

    def _filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[key], value_set=value_set))

    return ds.map_batches(_filter, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def time_range_filter(
    ds: ray.data.Dataset,
    ts_col: str,
    start,
    end,
) -> ray.data.Dataset:
    """Keep rows with ``start <= ts <= end`` — inclusive both ends.

    Inclusivity matches the reference exactly (parquet.go:728).
    """
    start_s = pa.scalar(start)
    end_s = pa.scalar(end)

    def _filter(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        mask = pc.and_kleene(pc.greater_equal(ts, start_s), pc.less_equal(ts, end_s))
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(_filter, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def history(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    entity_ids: Sequence[Any] | None = None,
    start=None,
    end=None,
    sort_desc: bool = True,
) -> ray.data.Dataset:
    """GetFeatureHistory: entity + inclusive time-range filter, ts-desc order.

    Mirrors pkg/storage/duckdb/duckdb.go:683-689 (row-level event-time
    predicate — the normative path; we deliberately do NOT replicate the
    Parquet path's write-time file pruning, a correctness hazard noted in
    SURVEY.md S5).
    """
    out = ds
    if entity_ids is not None:
        out = semi_join_filter(out, entity_col, entity_ids)
    if start is not None and end is not None:
        out = time_range_filter(out, ts_col, start, end)
    elif start is not None:
        s = pa.scalar(start)
        out = out.map_batches(lambda t, s=s: t.filter(pc.fill_null(pc.greater_equal(t[ts_col], s), False)), batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
    elif end is not None:
        e = pa.scalar(end)
        out = out.map_batches(lambda t, e=e: t.filter(pc.fill_null(pc.less_equal(t[ts_col], e), False)), batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
    if sort_desc:
        out = out.sort(ts_col, descending=True)
    return out
