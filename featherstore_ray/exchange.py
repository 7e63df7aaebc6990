"""Bucketed exchange: one all-to-all shuffle + per-bucket kernel.

``bucketed_map_groups(ds, kernel, num_buckets=B)`` is the engine's single
wide-operator template (partition.py doc): route every row to
``hash(entity) % B``, then run a vectorized kernel once per bucket. Two
physical strategies behind one API:

- ``sort`` — Ray Data's native ``groupby(BUCKET_COL).map_groups``. Streaming,
  backpressured, spills; the right default on a real multi-node cluster where
  block counts are large.
- ``direct`` — a two-wave raw-task exchange: wave 1 splits each materialized
  input block by reducer (cheap argsort + zero-copy slices, one Ray task per
  block with ``num_returns=R``), wave 2 concatenates each reducer's slices
  and applies the kernel per bucket. Bypasses the sort-shuffle's sampling,
  global sort and barrier machinery — measured ~3x faster exchange on this
  host, where Ray's sort floor (1.5-4s per groupby) caps suite scaling.

``direct`` creates M x R intermediate objects (M input blocks, R reducers).
That is the classic map-reduce shuffle quadratic: fine up to ~10^5 objects
(a 256-node cluster with 4096 reducers wants Ray's push-based shuffle
instead), so ``bucketed_map_groups`` falls back to ``sort`` automatically
when M x R exceeds ``DIRECT_MAX_OBJECTS`` or when the input is empty.
Override with ``FSR_EXCHANGE=sort|direct``.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from featherstore_ray.partition import BUCKET_COL

DIRECT_MAX_OBJECTS = 200_000

# Reducer sizing for the direct exchange: small inputs don't need (and are
# actively hurt by) one reduce task per bucket — at 32 cpus the old fixed
# r = max(2*cpus, 8) launched 64 reduce tasks for a 0.5 MB table, and task
# launch + the count ray.get dominated the exchange (~1s floor per wide op).
# Pick r so each reducer sees ~TARGET bytes, floored at 8 so compute-heavy
# kernels over byte-small inputs (pair expansion, iterative kernels) still
# parallelize. At real scale r_data >> the cpu cap, so behavior is unchanged.
TARGET_REDUCER_BYTES = int(
    os.environ.get("FSR_REDUCER_TARGET_BYTES", str(4 << 20))
)
MIN_DIRECT_REDUCERS = 8


def _pick_reducers(
    num_buckets: int, cpus: int, size_bytes: int | None
) -> int:
    r = min(num_buckets, max(2 * cpus, 8))
    if size_bytes is not None and size_bytes >= 0:
        r_data = max(
            MIN_DIRECT_REDUCERS,
            -(-size_bytes // TARGET_REDUCER_BYTES),
        )
        r = min(r, r_data)
    return r


@ray.remote
def _split_block(t, num_reducers: int, num_buckets: int, bucket_col: str):
    """Wave 1: order a block by reducer id, return R zero-copy slices."""
    return _split_table(t, num_reducers, bucket_col)


def _split_table(t, num_reducers: int, bucket_col: str):
    """Shared split body (also fused with assignment in stages/chunked)."""
    if isinstance(t, pd.DataFrame):
        t = pa.Table.from_pandas(t, preserve_index=False)
    if num_reducers == 1:
        # num_returns=1: the return value IS the single slice
        return t
    if t.num_rows == 0:
        # filtered-out blocks can be zero-column; emit empty slices that the
        # reduce wave drops
        empty = pa.table({})
        return tuple(empty for _ in range(num_reducers))
    b = t[bucket_col].to_numpy(zero_copy_only=False)
    # modulo, not contiguous-range, routing: callers may emit bucket ids
    # beyond num_buckets (skew isolation appends dedicated hot partitions)
    red = np.mod(b.astype(np.int64), num_reducers)
    order = np.argsort(red, kind="stable")
    ts = t.take(order)
    rs = red[order]
    bounds = np.searchsorted(rs, np.arange(num_reducers + 1))
    return tuple(
        ts.slice(bounds[r], bounds[r + 1] - bounds[r])
        for r in range(num_reducers)
    )


@ray.remote(num_returns=2)
def _reduce_apply(kernel, batch_format: str, bucket_col: str, *parts):
    """Wave 2: concat this reducer's slices, run kernel once per bucket.

    Returns (arrow table, row count) — the count lets the driver drop empty
    partitions before assembling the output Dataset.
    """
    tables = [p for p in parts if p.num_rows]
    if not tables:
        return pa.table({}), 0
    t = pa.concat_tables(tables, promote_options="default")
    # upstream pandas-format stages can leave pandas metadata whose dtype
    # strings (e.g. "numpy.ndarray(...)" for list columns) break to_pandas;
    # the kernel contract is plain Arrow types, so drop it
    t = t.replace_schema_metadata(None)
    b = t[bucket_col].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    t = t.take(order)
    bs = b[order]
    starts = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
    bounds = np.append(starts, len(bs))
    outs = []
    for g0, g1 in zip(bounds[:-1], bounds[1:]):
        group = t.slice(g0, g1 - g0)
        if batch_format == "pandas":
            res = kernel(group.to_pandas())
            if not isinstance(res, pa.Table):
                res = pa.Table.from_pandas(res, preserve_index=False)
        else:
            res = kernel(group)
        res = res.replace_schema_metadata(None)
        outs.append(res)
    out = pa.concat_tables(outs, promote_options="default")
    return out, out.num_rows


@ray.remote(num_returns=3)
def _reduce_concat(bucket_col: str, summary_kernel, *parts):
    """Wave 2 without a kernel: concat this reducer's slices ordered so every
    bucket's rows are contiguous (whole buckets per output block). When a
    ``summary_kernel`` (whole-bucket-block -> small table) is given, it runs
    here too — a fused side output with zero extra passes over the data."""
    tables = [p for p in parts if p.num_rows]
    if not tables:
        return pa.table({}), 0, pa.table({})
    t = pa.concat_tables(tables, promote_options="default")
    b = t[bucket_col].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    t = t.take(order).replace_schema_metadata(None)
    summary = summary_kernel(t) if summary_kernel is not None else pa.table({})
    return t, t.num_rows, summary


def repartition_by_bucket(
    ds: ray.data.Dataset,
    *,
    num_buckets: int,
    bucket_col: str = BUCKET_COL,
    num_reducers: int | None = None,
    summary_kernel=None,
) -> tuple[ray.data.Dataset, pa.Table | None]:
    """Materialized repartition: every output block holds WHOLE buckets.

    The move-once primitive for multi-pass algorithms (e.g. the chunked
    window suite): the returned Dataset can be consumed repeatedly with no
    recompute (blocks are concrete objects, not copied again). When
    ``summary_kernel`` is given it runs inside the reduce wave on each
    whole-bucket block and the concatenated result comes back as the second
    element — a fused side channel with zero extra passes. Falls back to the
    sort shuffle (summary computed in a separate map pass) under the same
    conditions as ``bucketed_map_groups``.

    Returns (dataset, summary table | None-when-no-kernel).
    """
    mode = os.environ.get("FSR_EXCHANGE", "direct")
    src = ds
    if mode == "direct":
        mat = ds.materialize()
        # if the direct path declines below, the sort fallback consumes the
        # already-materialized blocks instead of re-executing the lineage
        src = mat
        block_refs, size_bytes = [], 0
        for rb in mat.iter_internal_ref_bundles():
            block_refs.extend(rb.block_refs)
            size_bytes += rb.size_bytes()
        m = len(block_refs)
        if m:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            r = num_reducers or _pick_reducers(num_buckets, cpus, size_bytes)
            r = max(2, min(r, num_buckets))
            if m * r <= DIRECT_MAX_OBJECTS:
                sk_ref = ray.put(summary_kernel)
                splits = [
                    _split_block.options(num_returns=r).remote(
                        b, r, num_buckets, bucket_col
                    )
                    for b in block_refs
                ]
                out_refs, count_refs, sum_refs = [], [], []
                for j in range(r):
                    t_ref, n_ref, s_ref = _reduce_concat.remote(
                        bucket_col, sk_ref, *[s[j] for s in splits]
                    )
                    out_refs.append(t_ref)
                    count_refs.append(n_ref)
                    sum_refs.append(s_ref)
                counts = ray.get(count_refs)
                keep = [ref for ref, n in zip(out_refs, counts) if n > 0]
                if keep:
                    summary = None
                    if summary_kernel is not None:
                        parts = [s for s in ray.get(sum_refs) if s.num_rows]
                        summary = (
                            pa.concat_tables(parts, promote_options="default")
                            if parts
                            else pa.table({})
                        )
                    # no .materialize(): the refs are concrete objects —
                    # re-consuming reads them zero-copy, a materialize here
                    # would be one wasted full copy of the data
                    return ray.data.from_arrow_refs(keep), summary
    out = src.groupby(bucket_col).map_groups(
        lambda t: t, batch_format="pyarrow"
    ).materialize()
    # Ray's dynamic block splitting can split one group's output across
    # blocks, silently violating the whole-buckets-per-block contract that
    # downstream map_batches finalizers rely on — repair by merging any
    # blocks whose bucket ranges overlap (no-op when nothing split).
    out = _coalesce_split_buckets(out, bucket_col)
    summary = None
    if summary_kernel is not None:
        parts = [
            p
            for p in ray.get(
                [
                    _apply_summary.remote(summary_kernel, ref)
                    for rb in out.iter_internal_ref_bundles()
                    for ref in rb.block_refs
                ]
            )
            if p.num_rows
        ]
        summary = (
            pa.concat_tables(parts, promote_options="default")
            if parts
            else pa.table({})
        )
    return out, summary


@ray.remote
def _apply_summary(summary_kernel, t: pa.Table) -> pa.Table:
    return summary_kernel(t)


@ray.remote
def _block_span(t, bucket_col: str):
    """(min bucket, max bucket, rows) of one block — tiny driver probe."""
    if isinstance(t, pd.DataFrame):
        t = pa.Table.from_pandas(t, preserve_index=False)
    if t.num_rows == 0:
        return None, None, 0
    b = t[bucket_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return int(b.min()), int(b.max()), t.num_rows


@ray.remote
def _concat_blocks(*tables) -> pa.Table:
    ts = [
        pa.Table.from_pandas(t, preserve_index=False)
        if isinstance(t, pd.DataFrame)
        else t
        for t in tables
    ]
    return pa.concat_tables(ts, promote_options="default")


def _coalesce_split_buckets(
    out: ray.data.Dataset, bucket_col: str
) -> ray.data.Dataset:
    """Merge blocks whose bucket-id ranges overlap so every bucket's rows
    land in exactly ONE block. Blocks already disjoint pass through
    untouched (zero copies); empty blocks are dropped."""
    refs = [
        ref for rb in out.iter_internal_ref_bundles() for ref in rb.block_refs
    ]
    if len(refs) <= 1:
        return out
    spans = ray.get([_block_span.remote(r, bucket_col) for r in refs])
    blocks = [
        (lo, hi, r) for (lo, hi, n), r in zip(spans, refs) if n > 0
    ]
    if not blocks:
        return out
    blocks.sort(key=lambda x: (x[0], x[1]))
    merged: list[list] = [[blocks[0][0], blocks[0][1], [blocks[0][2]]]]
    for lo, hi, r in blocks[1:]:
        if lo <= merged[-1][1]:  # shares (at least) a boundary bucket
            merged[-1][1] = max(merged[-1][1], hi)
            merged[-1][2].append(r)
        else:
            merged.append([lo, hi, [r]])
    if all(len(g[2]) == 1 for g in merged) and len(merged) == len(refs):
        return out
    new_refs = [
        g[2][0] if len(g[2]) == 1 else _concat_blocks.remote(*g[2])
        for g in merged
    ]
    return ray.data.from_arrow_refs(new_refs)


def bucketed_map_groups(
    ds: ray.data.Dataset,
    kernel: Callable,
    *,
    num_buckets: int,
    batch_format: str = "pandas",
    bucket_col: str = BUCKET_COL,
    num_reducers: int | None = None,
) -> ray.data.Dataset:
    """Group ``ds`` by its bucket column and apply ``kernel`` per bucket.

    Drop-in for ``ds.groupby(bucket_col).map_groups(kernel, batch_format=...)``
    — same semantics (kernel sees every row of one bucket, bucket column
    included), different exchange (module doc). The kernel must not depend
    on row order within the bucket (both strategies deliver arbitrary order).
    """
    mode = os.environ.get("FSR_EXCHANGE", "direct")
    if mode == "direct":
        # materialize ONCE: the direct path needs block refs, and if it
        # declines (object-count cap, empty data) the sort fallback reuses
        # the same blocks instead of re-executing the upstream lineage
        ds = ds.materialize()
        out = _direct(
            ds, kernel, num_buckets=num_buckets, batch_format=batch_format,
            bucket_col=bucket_col, num_reducers=num_reducers,
        )
        if out is not None:
            return out

    # Sort-path kernel outputs convert to Arrow EXACTLY like _reduce_apply
    # does on the direct path — otherwise the fallback emits pandas blocks
    # whose PandasBlockSchema breaks downstream pa.schema(base_schema)
    # consumers and drifts dtypes (datetime units, object-vs-string) that
    # the direct path preserves.
    def _arrow_out(batch):
        res = kernel(batch)
        if not isinstance(res, pa.Table):
            res = pa.Table.from_pandas(res, preserve_index=False)
        return res.replace_schema_metadata(None)

    return ds.groupby(bucket_col).map_groups(
        _arrow_out, batch_format=batch_format)


def _direct(
    ds: ray.data.Dataset,
    kernel: Callable,
    *,
    num_buckets: int,
    batch_format: str,
    bucket_col: str,
    num_reducers: int | None,
) -> ray.data.Dataset | None:
    """Two-wave exchange; returns None to signal sort-path fallback.

    ``ds`` arrives already materialized (bucketed_map_groups does it)."""
    block_refs, size_bytes = [], 0
    for rb in ds.iter_internal_ref_bundles():
        block_refs.extend(rb.block_refs)
        size_bytes += rb.size_bytes()
    m = len(block_refs)
    if m == 0:
        return None
    cpus = int(ray.cluster_resources().get("CPU", 8))
    r = num_reducers or _pick_reducers(num_buckets, cpus, size_bytes)
    r = max(1, min(r, num_buckets))
    if m * r > DIRECT_MAX_OBJECTS:
        return None
    kernel_ref = ray.put(kernel)
    splits = [
        _split_block.options(num_returns=r).remote(
            b, r, num_buckets, bucket_col
        )
        for b in block_refs
    ]
    if r == 1:
        splits = [[s] for s in splits]
    out_refs = []
    count_refs = []
    for j in range(r):
        t_ref, n_ref = _reduce_apply.remote(
            kernel_ref, batch_format, bucket_col, *[s[j] for s in splits]
        )
        out_refs.append(t_ref)
        count_refs.append(n_ref)
    counts = ray.get(count_refs)
    keep = [ref for ref, n in zip(out_refs, counts) if n > 0]
    if not keep:
        return None  # all-empty: let the sort path produce the empty output
    return ray.data.from_arrow_refs(keep)
