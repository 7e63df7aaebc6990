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

_META_FILE = "metadata.json"
_DATA_DIR = "data"

# parquet.go:955-970 — supported codecs, default snappy (config.yaml:21).
COMPRESSION_CODECS = {"snappy", "gzip", "brotli", "zstd", "lz4", "none"}


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

    def __init__(self, root: str | Path, *, compression: str = "snappy"):
        if compression not in COMPRESSION_CODECS:
            raise ValueError(f"unsupported compression {compression!r}")
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.compression = None if compression == "none" else compression
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

    # -- ingest -----------------------------------------------------------

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
        Returns rows written.
        """
        expected = self.schema(name)
        data_dir = self._set_dir(name) / _DATA_DIR
        if isinstance(batch, pa.RecordBatch):
            batch = pa.Table.from_batches([batch])
        if isinstance(batch, ray.data.Dataset):
            validate_schema(
                pa.schema(batch.schema().base_schema), expected, strict=strict
            )
            n = batch.count()
            batch.write_parquet(
                str(data_dir),
                compression=self.compression,
            )
            return n
        validate_schema(batch.schema, expected, strict=strict)
        idx = len(list(data_dir.glob("part-*.parquet")))
        tmp = data_dir / f".part-{idx:06d}.parquet.tmp"
        pq.write_table(batch, tmp, compression=self.compression or "none")
        tmp.rename(data_dir / f"part-{idx:06d}.parquet")
        return batch.num_rows

    # -- retrieval --------------------------------------------------------

    def dataset(
        self, name: str, *, columns: Sequence[str] | None = None
    ) -> ray.data.Dataset:
        """Lazy Dataset over all ingested parquet (column-pruned at the read)."""
        data_dir = self._set_dir(name) / _DATA_DIR
        if not data_dir.exists():
            raise FeatureSetNotFound(name)
        files = sorted(str(p) for p in data_dir.glob("*.parquet"))
        if not files:
            return ray.data.from_arrow(self.schema(name).empty_table())
        return ray.data.read_parquet(
            files, columns=list(columns) if columns else None
        )

    def get_features(
        self,
        name: str,
        entity_ids: Sequence[Any],
        *,
        tiebreak: str | None = None,
    ) -> ray.data.Dataset:
        """Latest feature row per requested entity (duckdb.go:608-625)."""
        from featherstore_ray.stages.latest import latest_per_entity

        return latest_per_entity(
            self.dataset(name),
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
        (duckdb.go:683-689)."""
        from featherstore_ray.stages.filters import history

        return history(
            self.dataset(name),
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
