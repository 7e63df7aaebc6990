"""Small set/order operators: distinct, global top-k.

SURVEY.md lists ``unique`` among Ray Data's shuffle ops (§4) and top-1 as
the reference's only limit (O3); these generalize both with the engine's
scale shapes:

- ``distinct``: per-batch dedup partial → ONE bucket shuffle on the first
  key → per-bucket dedup (the exact_dedup machinery without a winner
  column).
- ``top_k``: per-batch partial top-k (each batch emits <= k rows) → tiny
  single-group final. Shuffle cost O(k x batches), never the input.
  Deterministic tie-break on an explicit secondary key.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

import ray.data

from featherstore_ray.partition import BUCKET_COL, add_bucket_column
from featherstore_ray.exchange import bucketed_map_groups


def distinct(
    ds: ray.data.Dataset,
    cols: Sequence[str],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Distinct combinations of ``cols`` (two-stage dedup)."""
    cols = list(cols)

    def partial(t):
        # Arrow-native distinct: group_by with no aggregates = unique keys,
        # no pandas conversion per batch
        return t.select(cols).group_by(cols).aggregate([])

    ds = ds.map_batches(partial, batch_size=None, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = add_bucket_column(ds, cols[0], num_buckets)

    def final(t):
        return t.select(cols).group_by(cols).aggregate([])

    return bucketed_map_groups(
        ds, final, num_buckets=num_buckets, batch_format="pyarrow"
    )


_SPLIT_MULT = 2654435761  # Knuth multiplicative hash constant


def hash_split(
    ds: ray.data.Dataset,
    key_col: str,
    *,
    val_fraction: float = 0.1,
    out_col: str = "split",
) -> ray.data.Dataset:
    """Deterministic train/validation assignment by a multiplicative hash
    of an integer key — the standard reproducible corpus split.

    The hash is deliberately SQL-expressible (``(key % 2^32) * 2654435761
    % 2^32``, exact in both uint64 numpy and DuckDB's int128 arithmetic) so
    the split is oracle-checkable and identical across engines, runs and
    partitionings. Rows with ``bucket < val_fraction * 2^32`` go to 'val'.
    """
    import numpy as np
    import pyarrow as pa

    cut = np.uint64(int(val_fraction * (1 << 32)))

    def assign(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k % np.uint64(1 << 32)) * np.uint64(_SPLIT_MULT) % np.uint64(1 << 32)
        lab = np.where(h < cut, "val", "train")
        return t.append_column(out_col, pa.array(lab))

    return ds.map_batches(
        assign, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def top_k(
    ds: ray.data.Dataset,
    order_col: str,
    k: int,
    *,
    descending: bool = True,
    tiebreak: str | None = None,
    num_buckets: int = 1,
) -> ray.data.Dataset:
    """Global top-k rows by ``order_col`` with a deterministic tie-break.

    Ties on ``order_col`` break by ascending ``tiebreak`` (oracle:
    ``ROW_NUMBER() OVER (ORDER BY col DESC, tiebreak) <= k``).
    """
    by = [order_col] + ([tiebreak] if tiebreak else [])
    asc = [not descending] + ([True] if tiebreak else [])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch top-k + the constant routing key in one stage; the copy
        # is over <= k rows, not the input batch
        out = df.sort_values(by, ascending=asc, kind="stable").head(k).copy()
        out[BUCKET_COL] = 0
        return out

    ds = ds.map_batches(partial, batch_size=None, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop(columns=[BUCKET_COL])
            .sort_values(by, ascending=asc, kind="stable")
            .head(k)
            .reset_index(drop=True)
        )

    return bucketed_map_groups(ds, final, num_buckets=num_buckets, batch_format="pandas")
