"""Canonical schemas, type parsing and schema-compatibility validation.

Reference parity:
- required ``entity_id`` column enforced at feature-set creation
  (pkg/storage/parquet/parquet.go:103-114, pkg/storage/duckdb/duckdb.go:133-144)
- schema compatibility = name + type-id equality, no coercion
  (pkg/storage/parquet/parquet.go:897-925, pkg/storage/duckdb/duckdb.go:1015-1043)
- type-name parser mirrors the Python client's map
  (python/featherstore_client.py:235-272)
- timestamps canonicalized to microseconds (pkg/storage/duckdb/duckdb.go:331-332)
"""

from __future__ import annotations

import pyarrow as pa

ENTITY_COL = "entity_id"
TS_COL = "timestamp"

# The driver input_hint table shape: pre-tokenized training sequences.
TOKENS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

# Mirrors python/featherstore_client.py:244-267 (plus a few aliases).
_TYPE_MAP: dict[str, pa.DataType] = {
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "int": pa.int64(),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "float": pa.float64(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "boolean": pa.bool_(),
    "string": pa.string(),
    "str": pa.string(),
    "binary": pa.binary(),
    "bytes": pa.binary(),
    # engine canon is us (duckdb.go:332); the Go client used ns
    "timestamp": pa.timestamp("us"),
    "timestamp[s]": pa.timestamp("s"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ns]": pa.timestamp("ns"),
    "date32": pa.date32(),
    "date64": pa.date64(),
    "date": pa.date32(),
    "time64": pa.time64("us"),
}


class SchemaError(ValueError):
    """Raised when a batch/schema fails validation against a feature set."""


def parse_type(name: str) -> pa.DataType:
    """Parse a type name (client string form) into a pyarrow DataType.

    ``list<T>`` is supported recursively (the reference's list extraction is
    recursive too, pkg/core/model.go:259-277).
    """
    name = name.strip().lower()
    if name.startswith("list<") and name.endswith(">"):
        return pa.list_(parse_type(name[5:-1]))
    try:
        return _TYPE_MAP[name]
    except KeyError:
        raise SchemaError(f"unsupported type name: {name!r}") from None


def schema_from_features(features: dict[str, str]) -> pa.Schema:
    """Build a pyarrow schema from a {name: type-name} mapping."""
    return pa.schema([pa.field(k, parse_type(v)) for k, v in features.items()])


def require_entity_column(schema: pa.Schema) -> None:
    """Enforce the required ``entity_id`` column (parquet.go:103-114)."""
    if ENTITY_COL not in schema.names:
        raise SchemaError(f"schema must contain an {ENTITY_COL!r} column")


def types_compatible(a: pa.DataType, b: pa.DataType) -> bool:
    """Exact type equality — no coercion (parquet.go:921-925)."""
    return a.equals(b)


def validate_schema(
    actual: pa.Schema,
    expected: pa.Schema,
    *,
    strict: bool = True,
) -> None:
    """Validate an ingest batch schema against the declared feature-set schema.

    ``strict=True`` checks every declared field (the DuckDB path,
    duckdb.go:1015-1036); ``strict=False`` checks only ``entity_id`` and
    ``timestamp`` (the Parquet path, parquet.go:897-918).
    """
    names = set(actual.names)
    check = expected.names if strict else [
        n for n in (ENTITY_COL, TS_COL) if n in expected.names
    ]
    for name in check:
        if name not in names:
            raise SchemaError(f"missing required column {name!r}")
        want = expected.field(name).type
        got = actual.field(name).type
        if not types_compatible(got, want):
            raise SchemaError(
                f"column {name!r}: type mismatch (got {got}, want {want})"
            )


def empty_table(schema: pa.Schema) -> pa.Table:
    """Zero-row table with full schema (parquet.go:865-872)."""
    return schema.empty_table()
