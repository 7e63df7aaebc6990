"""Pluggable storage backends — writer/reader registry keyed by format.

Ray-Data-native equivalent of the reference's storage factory
(pkg/storage/factory.go:14-36): ``FeatherStore`` resolves its backend
through ``get_format(name)`` instead of hard-wiring parquet. Each format
knows how to (a) write one table to one file atomically-renameable, and
(b) open a list of files as a lazy ``ray.data.Dataset``.

Parquet is the only format with predicate/column pushdown; the others read
fully and filter downstream (documented per-format).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Sequence

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.feather as feather
import pyarrow.parquet as pq

import ray
import ray.data


@dataclass(frozen=True)
class StorageFormat:
    name: str
    extension: str
    # write(table, path, *, compression, row_group_size)
    write_table: Callable[..., None]
    # read(files, *, columns, filter_expr, schema) -> Dataset
    read_dataset: Callable[..., ray.data.Dataset]
    # read one file eagerly -> pa.Table (compaction / maintenance path)
    read_table: Callable[..., pa.Table] = None
    supports_pushdown: bool = False


_REGISTRY: dict[str, StorageFormat] = {}


def register_format(fmt: StorageFormat) -> None:
    _REGISTRY[fmt.name] = fmt


def get_format(name: str) -> StorageFormat:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown storage format {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def registered_formats() -> list[str]:
    return sorted(_REGISTRY)


# -- parquet (default; pushdown-capable) ------------------------------------


def _parquet_write(table: pa.Table, path: Path, *, compression, row_group_size):
    pq.write_table(
        table,
        path,
        compression=compression or "none",
        row_group_size=row_group_size,
    )


def _parquet_read(files, *, columns=None, filter_expr=None, schema=None):
    # partitioning=None: bucket directories (ts_bucket=...) are a pruning
    # index, not hive columns — the timestamp stays in the data itself
    return ray.data.read_parquet(
        list(files),
        columns=list(columns) if columns else None,
        filter=filter_expr,
        partitioning=None,
    )


register_format(
    StorageFormat(
        name="parquet",
        extension="parquet",
        write_table=_parquet_write,
        read_dataset=_parquet_read,
        read_table=lambda path, columns=None: pq.read_table(
            path, columns=columns
        ),
        supports_pushdown=True,
    )
)


# -- arrow ipc / feather ----------------------------------------------------


@ray.remote
def _read_ipc_file(path: str, columns) -> pa.Table:
    return feather.read_table(path, columns=columns)


def _ipc_write(table: pa.Table, path: Path, *, compression, row_group_size):
    codec = compression if compression in (None, "lz4", "zstd") else "zstd"
    feather.write_feather(table, str(path), compression=codec or "uncompressed")


def _ipc_read(files, *, columns=None, filter_expr=None, schema=None):
    cols = list(columns) if columns else None
    refs = [_read_ipc_file.remote(f, cols) for f in files]
    return ray.data.from_arrow_refs(refs)


register_format(
    StorageFormat(
        name="ipc",
        extension="arrow",
        write_table=_ipc_write,
        read_dataset=_ipc_read,
        read_table=lambda path, columns=None: feather.read_table(
            path, columns=columns
        ),
    )
)


# -- csv (interchange only: no nested types, no pushdown) -------------------


def _csv_write(table: pa.Table, path: Path, *, compression, row_group_size):
    pacsv.write_csv(table, path)


def _csv_read(files, *, columns=None, filter_expr=None, schema=None):
    convert = None
    if schema is not None:
        convert = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema},
            include_columns=list(columns) if columns else None,
        )
    ds = ray.data.read_csv(
        list(files),
        **({"convert_options": convert} if convert else {}),
    )
    if columns and convert is None:
        ds = ds.select_columns(list(columns))
    return ds


register_format(
    StorageFormat(
        name="csv",
        extension="csv",
        write_table=_csv_write,
        read_dataset=_csv_read,
        read_table=lambda path, columns=None: (
            pacsv.read_csv(path)
            if columns is None
            else pacsv.read_csv(path).select(list(columns))
        ),
    )
)


# -- jsonl (training-data interchange; no nested/binary, no pushdown) -------


def _jsonl_write(table: pa.Table, path: Path, *, compression, row_group_size):
    # pandas writer: ISO-microsecond timestamps so pyarrow's JSON reader
    # round-trips timestamp[us] exactly; binary columns are out of scope
    # (like csv — interchange formats carry scalars)
    table.to_pandas().to_json(
        str(path), orient="records", lines=True,
        date_format="iso", date_unit="us",
    )


@ray.remote
def _read_jsonl_file(path: str, schema) -> pa.Table:
    import pyarrow.json as pajson

    opts = None
    if schema is not None:
        opts = pajson.ParseOptions(explicit_schema=schema)
    return pajson.read_json(path, parse_options=opts)


def _jsonl_read(files, *, columns=None, filter_expr=None, schema=None):
    # explicit-schema arrow JSON reader per file: Ray's read_json would
    # re-infer types per block (ints with nulls drift to double)
    refs = [_read_jsonl_file.remote(f, schema) for f in files]
    ds = ray.data.from_arrow_refs(refs)
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


def _jsonl_read_table(path, columns=None) -> pa.Table:
    import pyarrow.json as pajson

    t = pajson.read_json(path)
    return t if columns is None else t.select(list(columns))


register_format(
    StorageFormat(
        name="jsonl",
        extension="jsonl",
        write_table=_jsonl_write,
        read_dataset=_jsonl_read,
        read_table=_jsonl_read_table,
    )
)
