"""Skew handling: hot-key detection, salting, and hot-entity isolation.

The corpus is Zipf-skewed by construction (hot ``doc_id``/``source`` groups —
FIXTURES.md §2); at 10^12 rows a single hot entity can dwarf a bucket. Three
tools, matched to operator semantics:

1. ``hot_keys`` — distributed count (partial pre-agg, driver-final over the
   small per-key partials) → the set of keys above a row threshold. The
   driver holds only (hot) keys, never rows.
2. ``add_salted_bucket`` — for SALT-SAFE ops (aggregates, exact dedup:
   anything with an associative merge): hot keys spread over
   ``num_salts`` sub-buckets via a second hash of the batch row position,
   cold keys bucket normally. Callers merge partials afterwards, so
   correctness is unaffected.
3. ``partition_hot_entities`` — for FULL-HISTORY ops (windows, as-of build
   side) salting would break semantics: every row of an entity must share a
   partition. Instead hot entities are ISOLATED: each hot entity gets its
   own dedicated partition (no cold-key co-tenants to straggle behind it),
   cold entities share hash buckets. For hot SPINE entities in as-of
   lookups, use ``asof_join_broadcast`` — the spine salts trivially because
   each spine row is independent, and the per-entity index replicates to
   every actor via the object store.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.partition import BUCKET_COL, bucket_of, stable_hash
from featherstore_ray.exchange import bucketed_map_groups


def key_counts(ds: ray.data.Dataset, key: str) -> pd.DataFrame:
    """(key, n) counts via partial pre-agg; result is per-key small."""
    from featherstore_ray.stages.aggregate import grouped_aggregate

    out = grouped_aggregate(
        ds.select_columns([key]), [key], {"n": (key, "count")}, final="driver"
    )
    return out.to_pandas()


def hot_keys(ds: ray.data.Dataset, key: str, *, min_count: int) -> set:
    """Keys with more than ``min_count`` rows (the salting/isolation set)."""
    counts = key_counts(ds, key)
    return set(counts.loc[counts["n"] > min_count, key])


def add_salted_bucket(
    ds: ray.data.Dataset,
    key: str,
    hot: set,
    *,
    num_buckets: int,
    num_salts: int = 8,
    col: str = BUCKET_COL,
) -> ray.data.Dataset:
    """Bucket column with hot keys salted across ``num_salts`` sub-buckets.

    ONLY for ops whose per-group merge is associative (aggregate partials,
    exact-dedup winners): the same hot key appears in up to ``num_salts``
    buckets and the caller's final merge reconciles. Salt = row position
    hash, so the split is deterministic for a fixed input partitioning.
    """
    hot_arr = pa.array(sorted(hot)) if hot else None

    def _add(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        base = bucket_of(t[key], num_buckets)
        if hot_arr is not None and t.num_rows:
            is_hot = pc.is_in(t[key], value_set=hot_arr).to_numpy(
                zero_copy_only=False
            )
            salts = (np.arange(t.num_rows) % num_salts).astype(np.uint64)
            salted = (
                (base.astype(np.uint64) * np.uint64(num_salts) + salts)
                % np.uint64(num_buckets)
            ).astype(np.int32)
            base = np.where(is_hot, salted, base)
        return t.append_column(col, pa.array(base))

    return ds.map_batches(_add, batch_size=None, batch_format="pyarrow",
                          zero_copy_batch=True)


def partition_hot_entities(
    ds: ray.data.Dataset,
    key: str,
    hot: set,
    *,
    num_buckets: int,
    col: str = BUCKET_COL,
) -> ray.data.Dataset:
    """Bucket column where each hot entity owns a DEDICATED partition id and
    cold entities share the hash buckets — full per-entity history preserved
    (windows/as-of stay exact), stragglers limited to the hot entity's own
    rows."""
    hot_ids = {k: num_buckets + i for i, k in enumerate(sorted(hot))}

    def _add(t: pa.Table) -> pa.Table:
        base = bucket_of(t[key], num_buckets)
        if hot_ids and t.num_rows:
            keys = t[key].to_numpy(zero_copy_only=False)
            mapped = pd.Series(keys).map(hot_ids)
            hit = mapped.notna().to_numpy()
            base = np.where(hit, mapped.fillna(0).to_numpy().astype(np.int32), base)
        return t.append_column(col, pa.array(base))

    return ds.map_batches(_add, batch_size=None, batch_format="pyarrow",
                          zero_copy_batch=True)


def window_features_skew_aware(
    events: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    num_buckets: int = 64,
    hot_row_threshold: int | None = None,
    **window_kwargs,
) -> ray.data.Dataset:
    """window_features with hot entities isolated into dedicated partitions.

    Identical output to the plain path (tested); only the physical
    partitioning differs. ``hot_row_threshold`` defaults to ~4x the expected
    rows/bucket.
    """
    from datetime import timedelta

    from featherstore_ray.pipelines.feature_suite import _window_kernel

    if hot_row_threshold is None:
        try:
            total = events.count()
        except Exception:
            total = 0
        hot_row_threshold = max(10_000, 4 * (total // max(num_buckets, 1)))
    hot = hot_keys(events, entity_col, min_count=hot_row_threshold)

    wk = _window_kernel(
        entity_col,
        ts_col,
        value_col,
        tiebreak,
        rolling_window=window_kwargs.get("rolling_window", timedelta(hours=24)),
        session_gap=window_kwargs.get("session_gap", timedelta(minutes=30)),
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return wk(df.drop(columns=[BUCKET_COL]))

    ds = partition_hot_entities(
        events, entity_col, hot, num_buckets=num_buckets
    )
    return bucketed_map_groups(ds, kernel, num_buckets=num_buckets, batch_format="pandas")
