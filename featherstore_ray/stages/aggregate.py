"""Grouped aggregation with mandatory partial pre-aggregation.

The reference has no data aggregations (SURVEY.md §2.5); this is the
engine's generic grouped-aggregate primitive, built scale-first: every input
batch collapses to at most one row per (group, batch) BEFORE the shuffle, so
the all-to-all exchange moves partials, not rows. sum/count/min/max merge
trivially; mean = sum/count finalized after the merge.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import numpy as np
import pandas as pd

import ray.data

from featherstore_ray.partition import BUCKET_COL, add_bucket_column
from featherstore_ray.exchange import bucketed_map_groups

_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def grouped_aggregate(
    ds: ray.data.Dataset,
    group_keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    *,
    round_digits: int | None = None,
    num_buckets: int = 64,
    final: str = "shuffle",
) -> ray.data.Dataset:
    """Aggregate ``aggs`` = {out_col: (in_col, fn)} per ``group_keys``.

    fn ∈ {sum, count, min, max, mean}. Two-stage: per-batch pandas groupby
    (partial) → merge + finalize. ``round_digits`` rounds float outputs for
    oracle-stable comparison (summation-order noise).

    ``final="shuffle"`` (default) merges via a bucket groupby — use for
    high-cardinality keys. ``final="driver"`` merges the partials on the
    driver: partial size is O(groups × blocks) regardless of row count, so
    for LOW-cardinality keys (dashboard-style aggregates) this skips the
    all-to-all entirely — the partials ARE small by construction, this is
    not a full materialization.
    """
    group_keys = list(group_keys)
    # expand mean into sum+count partials
    partial_specs: dict[str, tuple[str, str]] = {}
    finalize_mean: dict[str, tuple[str, str]] = {}
    for out, (col, fn) in aggs.items():
        if fn == "mean":
            partial_specs[f"__{out}_sum"] = (col, "sum")
            partial_specs[f"__{out}_cnt"] = (col, "count")
            finalize_mean[out] = (f"__{out}_sum", f"__{out}_cnt")
        else:
            partial_specs[out] = (col, fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = {k: df[k] for k in group_keys}
            for out in partial_specs:
                cols[out] = pd.Series(dtype="float64")
            return pd.DataFrame(cols)
        g = df.groupby(group_keys, sort=False, observed=True)
        out = pd.DataFrame(
            {o: g[c].agg(f) for o, (c, f) in partial_specs.items()}
        ).reset_index()
        return out

    ds = ds.map_batches(partial, batch_size=None, batch_format="pandas")

    def merge_frame(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = {k: df[k] if k in df else pd.Series(dtype=object)
                    for k in group_keys}
            for out_col in list(partial_specs) + list(finalize_mean):
                if out_col not in finalize_mean and out_col.startswith("__"):
                    continue
                cols[out_col] = pd.Series(dtype="float64")
            return pd.DataFrame(cols)
        g = df.groupby(group_keys, sort=True, observed=True)
        out = pd.DataFrame(
            {o: g[o].agg(_MERGE[partial_specs[o][1]]) for o in partial_specs}
        ).reset_index()
        for out_col, (s, c) in finalize_mean.items():
            out[out_col] = out[s] / out[c]
            out = out.drop(columns=[s, c])
        if round_digits is not None:
            for c in out.columns:
                if c not in group_keys and out[c].dtype.kind == "f":
                    out[c] = out[c].round(round_digits)
        return out

    if final == "driver":
        import pyarrow as pa

        parts = ds.to_pandas()  # small by construction (groups × blocks)
        return ray.data.from_arrow(
            pa.Table.from_pandas(merge_frame(parts), preserve_index=False)
        )

    ds = add_bucket_column(ds, group_keys[0], num_buckets)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return merge_frame(df.drop(columns=[BUCKET_COL]))

    return bucketed_map_groups(ds, merge, num_buckets=num_buckets, batch_format="pandas")
