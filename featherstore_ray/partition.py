"""Deterministic entity-hash partitioning — the one shuffle key of the engine.

Every wide (all-to-all) operator in this engine shuffles exactly once on a
deterministic ``hash(entity) % num_buckets`` bucket column, then runs a fully
vectorized kernel per bucket. This is the Ray-Data translation of the
reference's per-call entity index (pkg/storage/parquet/parquet.go:373,660-667)
into shared-nothing partitions, and the partitioning contract for the as-of
join's zero-leakage guarantee: all rows of one entity — spine and features —
land in the same bucket.

Scale note (100 TB): ``num_buckets`` must grow with data so one bucket fits a
worker's heap. Rule of thumb: ``max(4 * total_cpus, input_bytes //
target_partition_bytes)`` with ``target_partition_bytes`` ≈ 256 MiB.
``choose_num_buckets`` implements this from Dataset metadata.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

BUCKET_COL = "_bucket"

# ~256 MiB of input per bucket keeps sort+kernel well inside a worker heap.
DEFAULT_TARGET_PARTITION_BYTES = 256 * 1024 * 1024
DEFAULT_MIN_BUCKETS = 32


def stable_hash(values: pa.ChunkedArray | pa.Array | np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of a key column, vectorized.

    Uses ``pd.util.hash_array`` (SipHash with a fixed key) — stable across
    processes, runs and machines, which the resumability contract requires
    (same input → same partition id). Works for int and string keys.
    """
    if isinstance(values, (pa.ChunkedArray, pa.Array)):
        np_vals = values.to_numpy(zero_copy_only=False)
    else:
        np_vals = np.asarray(values)
    if np_vals.dtype == object or np_vals.dtype.kind in ("U", "S"):
        return pd.util.hash_array(np_vals.astype(object))
    return pd.util.hash_array(np_vals)


def bucket_of(values, num_buckets: int) -> np.ndarray:
    """Map a key column to int32 bucket ids in [0, num_buckets)."""
    return (stable_hash(values) % np.uint64(num_buckets)).astype(np.int32)


def add_bucket_column(
    ds: ray.data.Dataset,
    key: str,
    num_buckets: int,
    *,
    col: str = BUCKET_COL,
) -> ray.data.Dataset:
    """Append a deterministic bucket column (narrow map, no shuffle)."""

    def _add(batch: pa.Table) -> pa.Table:
        return batch.append_column(col, pa.array(bucket_of(batch[key], num_buckets)))

    return ds.map_batches(_add, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def choose_num_buckets(
    ds: ray.data.Dataset,
    *,
    target_partition_bytes: int = DEFAULT_TARGET_PARTITION_BYTES,
    min_buckets: int = DEFAULT_MIN_BUCKETS,
) -> int:
    """Pick a bucket count so each bucket holds ~target_partition_bytes.

    Uses Dataset size metadata (cheap for Parquet inputs — no execution).
    """
    try:
        size = ds.size_bytes() or 0
    except Exception:
        size = 0
    return max(min_buckets, int(size // target_partition_bytes) + 1)
