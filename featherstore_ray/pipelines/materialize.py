"""Checkpointed, resumable feature materialization.

Output layout: ``<out_dir>/part-<bucket:05d>.parquet`` — one atomic file per
deterministic partition id (hash-bucket of the entity key) plus a
``_lineage.jsonl`` manifest. A rerun:

1. reads the manifest, validates completed partitions (file exists),
2. prunes ALL rows of completed buckets at the first map stage (cheap,
   before any shuffle),
3. computes + writes only the missing buckets, appends their records.

Partition contents are a pure function of (input, bucket id): deterministic
bucket hash (``featherstore_ray.partition.stable_hash``), deterministic
kernels, content sorted by a stable key before the write — so a resumed run
produces byte-identical output to an uninterrupted one (tested in
tests/test_materialize.py).

At 100 TB: one bucket ≈ one worker-sized slice (see
``partition.choose_num_buckets``); the write happens inside the bucket task
(``map_groups``), so no extra pass and no driver involvement; failed/missing
buckets replay independently.
"""

from __future__ import annotations

import hashlib
import time
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from featherstore_ray.lineage import LineageLog, PartitionRecord
from featherstore_ray.partition import BUCKET_COL, add_bucket_column, bucket_of


def _content_hash(table: pa.Table) -> str:
    """Deterministic content hash: row-order-sensitive over sorted content."""
    h = hashlib.sha256()
    for batch in table.to_batches():
        for name in sorted(batch.schema.names):
            h.update(name.encode())
            h.update(str(batch.column(name).to_pylist()).encode())
    return h.hexdigest()[:16]


def materialize(
    ds: ray.data.Dataset,
    out_dir: str | Path,
    *,
    entity_col: str,
    kernel=None,
    sort_cols=None,
    num_buckets: int = 64,
    compression: str = "zstd",
    hash_content: bool = False,
) -> list[PartitionRecord]:
    """Run ``kernel`` per entity-bucket and write one file per bucket,
    skipping buckets already recorded in the lineage manifest.

    ``kernel``: pandas DataFrame -> DataFrame (already bucket-local), or
    None for a plain partitioned write. ``sort_cols`` fixes the within-file
    row order (determinism); defaults to all columns.
    Returns the records of newly written partitions.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    log = LineageLog(out)
    done = set(log.completed())

    ds = add_bucket_column(ds, entity_col, num_buckets)
    if done:
        done_arr = pa.array(sorted(done), pa.int32())

        def prune(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(
                pc.invert(pc.is_in(t[BUCKET_COL], value_set=done_arr))
            )

        ds = ds.map_batches(prune, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)

    def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
        t0 = time.monotonic()
        bucket = int(df[BUCKET_COL].iloc[0])
        df = df.drop(columns=[BUCKET_COL])
        if kernel is not None:
            df = kernel(df)
        cols = sort_cols or sorted(df.columns)
        df = df.sort_values(cols, kind="stable").reset_index(drop=True)
        table = pa.Table.from_pandas(df, preserve_index=False)
        path = out / f"part-{bucket:05d}.parquet"
        tmp = out / f".part-{bucket:05d}.tmp"
        pq.write_table(table, tmp, compression=compression)
        tmp.rename(path)
        return pd.DataFrame(
            {
                "partition_id": [bucket],
                "rows": [len(df)],
                "num_bytes": [int(table.nbytes)],
                "content_hash": [
                    _content_hash(table) if hash_content else ""
                ],
                "duration_sec": [round(time.monotonic() - t0, 4)],
                "path": [str(path)],
            }
        )

    recs_df = (
        ds.groupby(BUCKET_COL)
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
    )
    recs = [PartitionRecord(**r) for r in recs_df.to_dict("records")]
    log.append_many(recs)
    # operational counters (reference pkg/metrics parity)
    from featherstore_ray import metrics

    metrics.record(
        "materialize.write",
        rows=int(recs_df["rows"].sum()) if len(recs_df) else 0,
        nbytes=int(recs_df["num_bytes"].sum()) if len(recs_df) else 0,
        seconds=float(recs_df["duration_sec"].sum()) if len(recs_df) else 0.0,
    )
    return recs


def materialize_incremental(
    ds: ray.data.Dataset,
    delta: ray.data.Dataset,
    out_dir: str | Path,
    *,
    entity_col: str,
    delta_id: str | None = None,
    kernel=None,
    sort_cols=None,
    num_buckets: int = 64,
    compression: str = "zstd",
    hash_content: bool = False,
) -> list[PartitionRecord]:
    """Delta-driven incremental maintenance of a materialized output: only
    buckets containing an entity touched by ``delta`` are re-derived; every
    other partition's file and lineage record stay untouched. ``ds`` is
    the full replay input INCLUDING the delta rows (partition contents
    stay a pure function of (input, bucket id)), so a re-derived bucket is
    byte-identical to what a from-scratch run over ``ds`` would write.

    Mechanics: the delta's distinct entity buckets (a <= num_buckets-sized
    set, reduced per batch before it reaches the driver) are marked
    ``invalidated`` in the lineage manifest, then :func:`materialize` runs
    as usual — its completed-bucket pruning now excludes exactly the
    affected buckets, so the unaffected ones are skipped at the first map
    stage and never shuffle. Crash/resume falls out of the same replay:
    finished buckets of a killed incremental run validate and skip.

    ``delta_id`` (recommended: a content hash of the delta) makes
    re-application idempotent: when it is already marked in the manifest,
    invalidation is skipped and the run only completes unfinished buckets
    — so re-invoking after a crash never re-derives finished work, and
    accidentally re-running a fully-applied delta writes nothing.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    log = LineageLog(out)

    if delta_id is not None and delta_id in log.applied_deltas():
        return materialize(
            ds, out, entity_col=entity_col, kernel=kernel,
            sort_cols=sort_cols, num_buckets=num_buckets,
            compression=compression, hash_content=hash_content)

    def delta_buckets(t: pa.Table) -> pa.Table:
        import numpy as np

        b = np.unique(bucket_of(t[entity_col], num_buckets))
        return pa.table({"b": pa.array(b)})

    affected = sorted({
        int(v)
        for batch in delta.map_batches(
            delta_buckets, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow")
        for v in batch["b"].to_pylist()
    })
    log.invalidate(affected, delta_id or "")
    if delta_id is not None:
        log.mark_delta(delta_id)
    return materialize(
        ds, out, entity_col=entity_col, kernel=kernel, sort_cols=sort_cols,
        num_buckets=num_buckets, compression=compression,
        hash_content=hash_content)


def read_materialized(out_dir: str | Path) -> ray.data.Dataset:
    files = sorted(str(p) for p in Path(out_dir).glob("part-*.parquet"))
    return ray.data.read_parquet(files)
