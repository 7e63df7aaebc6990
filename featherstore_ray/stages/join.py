"""Generic equi-joins: broadcast (small side) and partitioned hash join.

The reference has no table-to-table joins (SURVEY.md §2.4); these are the
enrichment joins a feature pipeline needs (attach dimension attributes to an
event/fact stream).

- ``broadcast_join``: dimension side is ``ray.put`` ONCE and merged per batch
  with a pandas hash merge — no shuffle, the fact side streams.
- ``hash_join``: both sides large → Ray Data's native hash-partitioned
  ``Dataset.join``.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
import pyarrow as pa

import ray
import ray.data


def broadcast_join(
    facts: ray.data.Dataset,
    dim: pa.Table,
    *,
    on: Sequence[str],
    how: str = "left",
    suffix: str = "_dim",
) -> ray.data.Dataset:
    """Join a streaming fact Dataset against a small broadcast dimension.

    ``dim`` must fit in the object store comfortably (it is put ONCE; every
    task reads it zero-copy node-locally — never re-shipped per batch).
    """
    on = list(on)
    dim_ref = ray.put(dim)

    class Joiner:
        def __init__(self):
            self.dim = ray.get(dim_ref).to_pandas()

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(
                self.dim, on=on, how=how, suffixes=("", suffix)
            )

    return facts.map_batches(Joiner, batch_size=None, batch_format="pandas",
                             concurrency=(1, 8))


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: Sequence[str],
    how: str = "inner",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Hash-partitioned join of two large Datasets (Ray Data native)."""
    return left.join(
        right,
        join_type=how,
        on=tuple(on),
        num_partitions=num_partitions or 32,
    )
