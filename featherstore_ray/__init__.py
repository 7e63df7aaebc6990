"""featherstore_ray — a Ray-Data-native feature materialization engine.

A from-scratch reimplementation of the query/data-processing capabilities of
TFMV/featherstore (a Go Arrow-native feature store), re-expressed as
``ray.data.Dataset`` pipelines:

- schema-validated Arrow-native ingest into partitioned Parquet
  (reference: pkg/storage/parquet/parquet.go)
- latest-per-entity retrieval (reference: pkg/storage/duckdb/duckdb.go:608-625)
- time-range history (reference: pkg/storage/duckdb/duckdb.go:683-689)
- point-in-time / as-of joins + windowed feature builders (lag/lead,
  rolling backfill, sessionization) — the north-star generalization
- training-data ops: dedup (exact/MinHash-LSH/SimHash), text analysis,
  ANN similarity search, tokens-table pipelines

All hot-path transforms are vectorized over zero-copy Arrow batches
(``batch_format="pyarrow"``) or pandas where the kernel requires it; wide
operations shuffle exactly once on a deterministic ``hash(entity) % B``
bucket key.
"""

from featherstore_ray.schema import (  # noqa: F401
    parse_type,
    validate_schema,
    SchemaError,
    TOKENS_SCHEMA,
)
from featherstore_ray.catalog import FeatherStore  # noqa: F401

__version__ = "0.1.0"
