"""Feature-set catalog + the FeatureStore API surface.

Ray-Data-native equivalent of the reference's storage layer:

- layout: ``<root>/<feature_set>/metadata.json`` + ``<root>/<feature_set>/data/
  part-NNNNNN.parquet`` (reference: one dir per set + timestamp-named files,
  pkg/storage/parquet/parquet.go:86-89; we name parts by a monotonically
  increasing index because ordering must come from the data, never filenames
  — SURVEY.md S4/§2.9)
- metadata.json: name, features, description, tags, created/updated stamps and
  the base64-encoded Arrow IPC schema (parquet.go:33,47-55,129-147,928-952)
- API verbs mirror core.FeatureStore (pkg/core/model.go:53-82):
  create/get/list/delete feature set, ingest batch, get features (latest per
  entity), get feature history (inclusive time range).

Retrieval verbs return lazy ``ray.data.Dataset`` pipelines — nothing
materializes until the caller consumes.
"""

from __future__ import annotations

import base64
import json
import shutil
import uuid
from collections.abc import Sequence
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from featherstore_ray.schema import (
    ENTITY_COL,
    TS_COL,
    SchemaError,
    require_entity_column,
    schema_from_features,
    validate_schema,
)
from featherstore_ray.storage import StorageFormat, get_format

_META_FILE = "metadata.json"
_DATA_DIR = "data"
_TS_BUCKET_PREFIX = "ts_bucket="

# parquet.go:955-970 — supported codecs, default snappy (config.yaml:21).
COMPRESSION_CODECS = {"snappy", "gzip", "brotli", "zstd", "lz4", "none"}

# time-partition granularity -> strftime pattern (zero-padded, so
# lexicographic directory comparison == chronological comparison)
_GRANULARITY_FMT = {
    "hour": "%Y-%m-%dT%H",
    "day": "%Y-%m-%d",
    "month": "%Y-%m",
}


class FeatureSetNotFound(KeyError):
    pass


def _serialize_schema(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def _deserialize_schema(b64: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(b64)))


class FeatherStore:
    """Parquet-backed feature store with a driver-side catalog.

    The catalog (schema cache, reference ST1: parquet.go:41-44,181-197) is a
    plain dict loaded lazily per process — KBs, safe to re-read in any actor.
    """

    def __init__(
        self,
        root: str | Path,
        *,
        compression: str = "snappy",
        format: str = "parquet",
        row_group_size: int | None = None,
        partition_granularity: str | None = None,
    ):
        if compression not in COMPRESSION_CODECS:
            raise ValueError(f"unsupported compression {compression!r}")
        if partition_granularity is not None and partition_granularity not in _GRANULARITY_FMT:
            raise ValueError(
                f"partition_granularity must be one of {sorted(_GRANULARITY_FMT)}"
            )
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.compression = None if compression == "none" else compression
        self.format = get_format(format)  # factory.go:14-36 registry lookup
        if row_group_size is None:
            from featherstore_ray.config import EngineConfig

            row_group_size = EngineConfig.from_env().row_group_size
        self.row_group_size = row_group_size  # honored per parquet.go:290-293
        self.partition_granularity = partition_granularity
        self._schemas: dict[str, pa.Schema] = {}

    # -- catalog ----------------------------------------------------------

    def _set_dir(self, name: str) -> Path:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid feature set name {name!r}")
        return self.root / name

    def create_feature_set(
        self,
        name: str,
        schema: pa.Schema | dict[str, str],
        *,
        description: str = "",
        tags: Sequence[str] = (),
    ) -> dict[str, Any]:
        if isinstance(schema, dict):
            schema = schema_from_features(schema)
        require_entity_column(schema)
        d = self._set_dir(name)
        if d.exists():
            raise ValueError(f"feature set {name!r} already exists")
        (d / _DATA_DIR).mkdir(parents=True)
        now = datetime.now(timezone.utc).isoformat()
        meta = {
            "name": name,
            "description": description,
            "tags": list(tags),
            "features": [
                {"name": f.name, "type": str(f.type)} for f in schema
            ],
            "created_at": now,
            "updated_at": now,
            "schema_b64": _serialize_schema(schema),
            # layout is a property of the SET (persisted so a store reopened
            # with different defaults still reads/writes this set correctly)
            "format": self.format.name,
            "partition_granularity": self.partition_granularity,
        }
        (d / _META_FILE).write_text(json.dumps(meta, indent=2))
        self._schemas[name] = schema
        return meta

    def get_feature_set(self, name: str) -> dict[str, Any]:
        d = self._set_dir(name)
        meta_path = d / _META_FILE
        if not meta_path.exists():
            raise FeatureSetNotFound(name)
        meta = json.loads(meta_path.read_text())
        meta["schema"] = _deserialize_schema(meta["schema_b64"])
        return meta

    def schema(self, name: str) -> pa.Schema:
        if name not in self._schemas:
            self._schemas[name] = self.get_feature_set(name)["schema"]
        return self._schemas[name]

    def list_feature_sets(self) -> list[str]:
        return sorted(
            p.name for p in self.root.iterdir() if (p / _META_FILE).exists()
        )

    def delete_feature_set(self, name: str) -> None:
        d = self._set_dir(name)
        if not (d / _META_FILE).exists():
            raise FeatureSetNotFound(name)
        shutil.rmtree(d)
        self._schemas.pop(name, None)

    def _set_conf(self, name: str) -> tuple[StorageFormat, str | None]:
        """(format, partition_granularity) as persisted at create time."""
        meta = self.get_feature_set(name)
        fmt = get_format(meta.get("format", self.format.name))
        return fmt, meta.get("partition_granularity", None)

    # -- ingest -----------------------------------------------------------

    def _bucket_strings(self, ts_col: pa.ChunkedArray, granularity: str):
        import pyarrow.compute as pc

        return pc.strftime(
            ts_col.cast(pa.timestamp("us")), _GRANULARITY_FMT[granularity]
        )

    def _split_by_bucket(self, table: pa.Table, granularity: str | None):
        """Yield (bucket_dir_name | None, sub_table) — one per time bucket."""
        if granularity is None:
            yield None, table
            return
        import pyarrow.compute as pc

        buckets = self._bucket_strings(table[TS_COL], granularity)
        for b in pc.unique(buckets).to_pylist():
            yield f"{_TS_BUCKET_PREFIX}{b}", table.filter(pc.equal(buckets, b))

    def ingest(
        self,
        name: str,
        batch: pa.Table | pa.RecordBatch | ray.data.Dataset,
        *,
        strict: bool = True,
    ) -> int:
        """Append a batch (or a whole Dataset) to a feature set.

        Schema validated against the declared schema before any write
        (parquet.go:269-277): on mismatch we fail fast — never the
        reference's skip-and-log (parquet.go:380-387, a silent-loss hazard).
        Time-partitioned sets land each row in its ``ts_bucket=<stamp>``
        directory (reference file-level pruning, parquet.go:485-499, made a
        first-class layout). Returns rows written.
        """
        expected = self.schema(name)
        fmt, granularity = self._set_conf(name)
        data_dir = self._set_dir(name) / _DATA_DIR
        if isinstance(batch, pa.RecordBatch):
            batch = pa.Table.from_batches([batch])
        if isinstance(batch, ray.data.Dataset):
            return self._ingest_dataset(
                name, batch, fmt, granularity, strict=strict
            )
        validate_schema(batch.schema, expected, strict=strict)
        written = 0
        for bucket_dir, sub in self._split_by_bucket(batch, granularity):
            d = data_dir / bucket_dir if bucket_dir else data_dir
            d.mkdir(parents=True, exist_ok=True)
            # uuid part names (same as the Dataset path): concurrent
            # ingest() calls to one set can never collide on a filename —
            # a glob-counted index named the same part-NNNNNN twice
            part = f"part-{uuid.uuid4().hex}.{fmt.extension}"
            tmp = d / f".{part}.tmp"
            fmt.write_table(
                sub, tmp,
                compression=self.compression,
                row_group_size=self.row_group_size,
            )
            tmp.rename(d / part)
            written += sub.num_rows
        if ray.is_initialized():  # counters need a live session; never init
            from featherstore_ray import metrics

            metrics.record(f"ingest.{name}", rows=written, nbytes=batch.nbytes)
        return written

    def _ingest_dataset(
        self,
        name: str,
        ds: ray.data.Dataset,
        fmt: StorageFormat,
        granularity: str | None,
        *,
        strict: bool,
    ) -> int:
        """Distributed staged ingest: every block writes its files under a
        staging directory (one Ray task per block, partition-split inside),
        then the driver commits with renames. A mid-write failure leaves only
        the staging dir — ``dataset()`` never sees partial files. The row
        count comes from the write results, not a second pipeline execution.
        """
        expected = self.schema(name)
        validate_schema(
            pa.schema(ds.schema().base_schema), expected, strict=strict
        )
        set_dir = self._set_dir(name)
        data_dir = set_dir / _DATA_DIR
        staging = set_dir / f".staging-{uuid.uuid4().hex}"
        staging.mkdir(parents=True)
        compression, rgs = self.compression, self.row_group_size
        split = self._split_by_bucket

        def write_block(t: pa.Table) -> pa.Table:
            paths: list[str] = []
            rows: list[int] = []
            if t.num_rows:
                for bucket_dir, sub in split(t, granularity):
                    d = staging / bucket_dir if bucket_dir else staging
                    d.mkdir(parents=True, exist_ok=True)
                    p = d / f"part-{uuid.uuid4().hex}.{fmt.extension}"
                    fmt.write_table(
                        sub, p, compression=compression, row_group_size=rgs
                    )
                    paths.append(str(p))
                    rows.append(sub.num_rows)
            return pa.table(
                {"path": pa.array(paths, pa.string()),
                 "rows": pa.array(rows, pa.int64())}
            )

        manifest = ds.map_batches(
            write_block, batch_size=None, batch_format="pyarrow"
        ).to_pandas()  # one row per written FILE — tiny
        # commit: move staged files into data/, preserving bucket subdirs
        for p in manifest["path"]:
            rel = Path(p).relative_to(staging)
            dest = data_dir / rel
            dest.parent.mkdir(parents=True, exist_ok=True)
            Path(p).rename(dest)
        shutil.rmtree(staging, ignore_errors=True)
        return int(manifest["rows"].sum())

    # -- maintenance ------------------------------------------------------

    def compact(
        self,
        name: str,
        *,
        target_bytes: int = 256 << 20,
        min_files: int = 2,
    ) -> dict:
        """Merge small part files into ~``target_bytes`` files, per
        directory (each ``ts_bucket=`` dir independently — the layout and
        its pruning are preserved). High-frequency ingest writes one file
        per batch (the reference does too, parquet.go:269-299); compaction
        is what keeps the file count O(data/target) instead of O(batches)
        at 100 TB. Merge groups run as parallel Ray tasks when a session
        is live, serially otherwise.

        Maintenance op, SINGLE-WRITER: run without concurrent ingest or
        readers on this set (a reader listing files mid-commit could see a
        merged file alongside its not-yet-deleted sources). Each group
        commits atomically per file: tmp-write → rename → unlink sources.
        Returns {"groups": merged-group count, "files_before", "files_after"}.
        """
        fmt, _ = self._set_conf(name)
        data_dir = self._set_dir(name) / _DATA_DIR
        if not data_dir.exists():
            raise FeatureSetNotFound(name)
        pattern = f"part-*.{fmt.extension}"
        dirs = [data_dir] + sorted(
            d for d in data_dir.glob(f"{_TS_BUCKET_PREFIX}*") if d.is_dir()
        )
        groups: list[list[Path]] = []
        files_before = 0
        for d in dirs:
            files = sorted(d.glob(pattern))
            files_before += len(files)
            if len(files) < min_files:
                continue
            cur: list[Path] = []
            cur_bytes = 0
            for f in files:
                sz = f.stat().st_size
                if cur and cur_bytes + sz > target_bytes:
                    if len(cur) >= 2:
                        groups.append(cur)
                    cur, cur_bytes = [], 0
                cur.append(f)
                cur_bytes += sz
            if len(cur) >= 2:
                groups.append(cur)

        compression, rgs = self.compression, self.row_group_size
        fmt_name = fmt.name
        # imported HERE (driver side) so the worker-shipped closure carries
        # get_format as a by-value closure cell — a runtime featherstore_ray
        # import inside merge_group fails on workers when the driver cwd is
        # not the repo root (round-3 verdict item 1)
        from featherstore_ray.storage import get_format

        def merge_group(paths: list[str]) -> int:
            f = get_format(fmt_name)
            merged = pa.concat_tables(
                [f.read_table(p) for p in paths], promote_options="default"
            )
            d = Path(paths[0]).parent
            part = f"part-{uuid.uuid4().hex}.{f.extension}"
            tmp = d / f".{part}.tmp"
            f.write_table(
                merged, tmp, compression=compression, row_group_size=rgs
            )
            tmp.rename(d / part)
            for p in paths:
                Path(p).unlink()
            return merged.num_rows

        if groups:
            if ray.is_initialized():
                task = ray.remote(merge_group)
                ray.get([task.remote([str(p) for p in g]) for g in groups])
            else:
                for g in groups:
                    merge_group([str(p) for p in g])
        files_after = files_before - sum(len(g) - 1 for g in groups)
        return {
            "groups": len(groups),
            "files_before": files_before,
            "files_after": files_after,
        }

    def expire(self, name: str, *, older_than) -> dict:
        """TTL retention: drop every ``ts_bucket=`` directory strictly
        older than ``older_than`` — whole buckets only, so retention
        granularity equals the set's partition granularity (the boundary
        bucket is kept in full; rows inside it never partially expire).
        Zero data reads: bucket stamps are zero-padded, so the cutoff is
        one lexicographic compare per directory — O(buckets) at any data
        size.

        Maintenance op, SINGLE-WRITER like :meth:`compact` (a reader
        listing files mid-delete could see a half-removed bucket).
        Requires a time-partitioned set. Returns
        ``{"buckets_removed", "files_removed"}``.
        """
        import shutil

        import pandas as pd

        fmt, granularity = self._set_conf(name)
        if granularity is None:
            raise ValueError(
                f"feature set {name!r} is not time-partitioned; expire() "
                "needs a ts_bucket layout to prune"
            )
        data_dir = self._set_dir(name) / _DATA_DIR
        if not data_dir.exists():
            raise FeatureSetNotFound(name)
        cutoff = pd.Timestamp(older_than).strftime(
            _GRANULARITY_FMT[granularity])
        pattern = f"part-*.{fmt.extension}"
        buckets_removed = files_removed = 0
        for d in sorted(data_dir.glob(f"{_TS_BUCKET_PREFIX}*")):
            if d.name[len(_TS_BUCKET_PREFIX):] < cutoff:
                files_removed += len(list(d.glob(pattern)))
                shutil.rmtree(d)
                buckets_removed += 1
        return {"buckets_removed": buckets_removed,
                "files_removed": files_removed}

    # -- retrieval --------------------------------------------------------

    def _files(
        self, name: str, *, start=None, end=None
    ) -> tuple[StorageFormat, list[str]]:
        """All data files, pruned to time buckets overlapping [start, end]
        BEFORE any read (reference parquet.go:485-499,600-605). Bucket names
        are zero-padded stamps, so lexicographic compare == chronological."""
        fmt, granularity = self._set_conf(name)
        data_dir = self._set_dir(name) / _DATA_DIR
        if not data_dir.exists():
            raise FeatureSetNotFound(name)
        pattern = f"part-*.{fmt.extension}"
        if granularity is None:
            files = sorted(str(p) for p in data_dir.glob(pattern))
            # flat sets may still hold bucketed files from an older layout
            files += sorted(
                str(p) for p in data_dir.glob(f"{_TS_BUCKET_PREFIX}*/{pattern}")
            )
            return fmt, files
        import pandas as pd

        lo = hi = None
        if start is not None:
            lo = pd.Timestamp(start).strftime(_GRANULARITY_FMT[granularity])
        if end is not None:
            hi = pd.Timestamp(end).strftime(_GRANULARITY_FMT[granularity])
        files = []
        for d in sorted(data_dir.glob(f"{_TS_BUCKET_PREFIX}*")):
            b = d.name[len(_TS_BUCKET_PREFIX):]
            if lo is not None and b < lo:
                continue
            if hi is not None and b > hi:
                continue
            files += sorted(str(p) for p in d.glob(pattern))
        files += sorted(str(p) for p in data_dir.glob(pattern))  # unbucketed
        return fmt, files

    def dataset(
        self,
        name: str,
        *,
        columns: Sequence[str] | None = None,
        start=None,
        end=None,
        filter_expr=None,
    ) -> ray.data.Dataset:
        """Lazy Dataset over ingested data.

        Column-pruned at the read; ``start``/``end`` prune whole time-bucket
        directories before any byte is read; ``filter_expr`` (a pyarrow
        dataset expression) pushes row-group pruning into parquet reads.
        """
        fmt, files = self._files(name, start=start, end=end)
        if not files:
            sch = self.schema(name)
            if columns:
                sch = pa.schema([sch.field(c) for c in columns])
            return ray.data.from_arrow(sch.empty_table())
        kwargs = {"columns": columns, "schema": self.schema(name)}
        if fmt.supports_pushdown:
            kwargs["filter_expr"] = filter_expr
        return fmt.read_dataset(files, **kwargs)

    def get_features(
        self,
        name: str,
        entity_ids: Sequence[Any],
        *,
        tiebreak: str | None = None,
    ) -> ray.data.Dataset:
        """Latest feature row per requested entity (duckdb.go:608-625)."""
        import pyarrow.compute as pc

        from featherstore_ray.stages.latest import latest_per_entity

        fmt, _ = self._set_conf(name)
        expr = None
        if fmt.supports_pushdown:
            expr = pc.field(ENTITY_COL).isin(list(entity_ids))
        return latest_per_entity(
            self.dataset(name, filter_expr=expr),
            entity_col=ENTITY_COL,
            ts_col=TS_COL,
            tiebreak=tiebreak,
            entity_ids=entity_ids,
        )

    def get_feature_history(
        self,
        name: str,
        entity_id: Any,
        start=None,
        end=None,
    ) -> ray.data.Dataset:
        """Inclusive [start, end] history for one entity, ts-desc
        (duckdb.go:683-689). File-level time pruning + parquet row-group
        pushdown happen at the read; the row-level predicate in
        ``stages.filters.history`` stays normative."""
        import pyarrow.compute as pc

        from featherstore_ray.stages.filters import history

        fmt, _ = self._set_conf(name)
        expr = None
        if fmt.supports_pushdown:
            expr = pc.field(ENTITY_COL) == entity_id
            if start is not None:
                expr = expr & (
                    pc.field(TS_COL)
                    >= pa.scalar(start).cast(pa.timestamp("us"))
                )
            if end is not None:
                expr = expr & (
                    pc.field(TS_COL) <= pa.scalar(end).cast(pa.timestamp("us"))
                )
        return history(
            self.dataset(name, start=start, end=end, filter_expr=expr),
            entity_col=ENTITY_COL,
            ts_col=TS_COL,
            entity_ids=[entity_id],
            start=start,
            end=end,
        )


def to_feature_vectors(table: pa.Table) -> list[dict[str, Any]]:
    """Columnar batch → row-oriented feature vectors, API-edge only.

    The reference's FeatureVector explode (pkg/core/model.go:97-173) exists
    solely for the JSON/HTTP edge; it must NEVER appear in a transform path.
    Each row: {"entity_id", "timestamp", "values": {feature: value}}.
    """
    rows = table.to_pylist()
    out = []
    for r in rows:
        entity = r.pop(ENTITY_COL, None)
        ts = r.pop(TS_COL, None)
        out.append({"entity_id": entity, "timestamp": ts, "values": r})
    return out
