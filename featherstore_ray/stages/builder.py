"""FeatureBuilder protocol — the user-extension hook (SURVEY.md §2.10).

A FeatureBuilder is any callable ``fn(group: pandas.DataFrame) ->
pandas.DataFrame`` applied to one entity-bucket at a time, with the
engine guaranteeing the partitioning contract: ALL rows of an entity arrive
together in one call, sorted by ``(entity, ts[, tiebreak])`` if requested.
Every built-in window op (lag/lead, rolling, sessionize) is expressible as a
FeatureBuilder; users plug custom per-entity logic without touching shuffle
code.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from featherstore_ray.partition import BUCKET_COL, add_bucket_column
from featherstore_ray.exchange import bucketed_map_groups


def apply_feature_builder(
    ds: ray.data.Dataset,
    fn,
    *,
    entity_col: str,
    ts_col: str | None = None,
    tiebreak: str | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Run a FeatureBuilder under the engine's entity-bucket contract.

    ``fn`` receives a bucket-local DataFrame (all rows of its entities,
    pre-sorted by (entity, ts, tiebreak) when ``ts_col`` is given) and
    returns any DataFrame. ONE shuffle; the kernel must be deterministic for
    resume semantics.
    """

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if ts_col is not None:
            by = [entity_col, ts_col] + ([tiebreak] if tiebreak else [])
            df = df.sort_values(by, kind="stable").reset_index(drop=True)
        return fn(df)

    ds = add_bucket_column(ds, entity_col, num_buckets)
    return bucketed_map_groups(ds, kernel, num_buckets=num_buckets, batch_format="pandas")
