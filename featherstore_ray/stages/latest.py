"""Latest-per-entity lookup (GetFeatures) — the degenerate as-of join.

Normative semantics = the reference's DuckDB path
(pkg/storage/duckdb/duckdb.go:608-625):

    ROW_NUMBER() OVER (PARTITION BY entity_id ORDER BY timestamp DESC) = 1

The reference's ``ROW_NUMBER`` is nondeterministic on timestamp ties and its
Parquet path breaks ties by file order (parquet.go:370-412) — we do NOT
replicate either. This engine's documented tie-break: among rows with equal
``ts_col``, the row with the greatest ``tiebreak`` column wins (deterministic,
encoded in the oracle SQL as ``ORDER BY ts DESC, tiebreak DESC``).

Scale shape (two-stage reduce, ONE small shuffle):
  1. partial: within every input batch keep the latest row per entity
     (vectorized sort + drop_duplicates) — output is ≤ distinct entities per
     batch, so the shuffle that follows moves a fraction of the input;
  2. final: shuffle the partials on ``hash(entity) % B`` and re-apply the
     same kernel per bucket.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import pandas as pd

import ray.data

from featherstore_ray.partition import BUCKET_COL, add_bucket_column
from featherstore_ray.exchange import bucketed_map_groups
from featherstore_ray.stages.filters import semi_join_filter


def _latest_kernel(
    df: pd.DataFrame, entity_col: str, ts_col: str, tiebreak: str | None
) -> pd.DataFrame:
    if df.empty:
        return df
    by = [entity_col, ts_col] + ([tiebreak] if tiebreak else [])
    asc = [True, False] + ([False] if tiebreak else [])
    out = df.sort_values(by, ascending=asc, kind="stable").drop_duplicates(
        subset=[entity_col], keep="first"
    )
    return out.reset_index(drop=True)


def latest_per_entity(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    tiebreak: str | None = None,
    entity_ids: Sequence[Any] | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Latest row per entity, optionally restricted to ``entity_ids``.

    ``entity_ids`` is the broadcast semi-join of GetFeatures
    (duckdb.go:620-625); applying it BEFORE the reduce prunes the shuffle.
    """
    if entity_ids is not None:
        ds = semi_join_filter(ds, entity_col, entity_ids)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _latest_kernel(df, entity_col, ts_col, tiebreak)

    ds = ds.map_batches(partial, batch_size=None, batch_format="pandas")
    ds = add_bucket_column(ds, entity_col, num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = _latest_kernel(df, entity_col, ts_col, tiebreak)
        return out.drop(columns=[BUCKET_COL])

    return bucketed_map_groups(ds, final, num_buckets=num_buckets, batch_format="pandas")


def top_n_per_group(
    ds: "ray.data.Dataset",
    *,
    group_col: str,
    order_col: str,
    n: int,
    descending: bool = True,
    tiebreak: str | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Top-``n`` rows per group by ``order_col`` — the generalization of
    latest-per-entity (O3, n=1) to SQL ``ROW_NUMBER() OVER (PARTITION BY g
    ORDER BY o [DESC][, tiebreak DESC]) <= n``.

    Scale shape: per-batch partial (each batch keeps <= n rows per group
    present in it) → ONE bucket shuffle on hash(group) → per-bucket final
    top-n. The exchange moves at most n rows per (group, batch), never the
    input. Ties on ``order_col`` break by max ``tiebreak`` (both DESC),
    deterministic on both engines.
    """
    import pandas as pd

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    by = [order_col] + ([tiebreak] if tiebreak else [])
    asc = [not descending] + ([False] if tiebreak else [])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(by, ascending=asc, kind="stable")
            .groupby(group_col, sort=False)
            .head(n)
        )

    ds = ds.map_batches(partial, batch_size=None, batch_format="pandas")
    ds = add_bucket_column(ds, group_col, num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop(columns=[BUCKET_COL])
            .sort_values(by, ascending=asc, kind="stable")
            .groupby(group_col, sort=False)
            .head(n)
            .reset_index(drop=True)
        )

    return bucketed_map_groups(
        ds, final, num_buckets=num_buckets, batch_format="pandas"
    )


def merge_upsert(
    base: ray.data.Dataset,
    delta: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    tiebreak: str | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """SCD-1 upsert — the feature-store incremental-maintenance primitive:
    merge a delta batch into a base snapshot keeping ONE row per key, the
    latest by (ts, tiebreak) across both sides. Keys only in the base
    survive unchanged; keys only in the delta insert; overlapping keys
    resolve by recency — and when ``tiebreak`` is None an EQUAL-timestamp
    collision resolves to the DELTA (the SCD-1 "same-ts correction wins"
    convention, enforced via an internal side tag used as the tiebreak),
    so repeated upserts are idempotent and deterministic. With an
    explicit ``tiebreak`` the caller's column governs equal-ts ties on
    both sides instead.

    Scale shape: the union streams; each side's blocks collapse to
    per-batch winners BEFORE the one hash(key) exchange (the
    latest_per_entity two-stage reduce on the concatenated lineage) —
    the exchange carries candidate winners, never snapshots.
    """
    if tiebreak is not None:
        return latest_per_entity(
            base.union(delta),
            entity_col=entity_col,
            ts_col=ts_col,
            tiebreak=tiebreak,
            num_buckets=num_buckets,
        )

    import numpy as np
    import pyarrow as pa

    def _tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_fsr_src",
                pa.array(np.full(t.num_rows, side, dtype=np.int8)))
        return f

    tagged = base.map_batches(
        _tag(0), batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).union(delta.map_batches(
        _tag(1), batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ))
    out = latest_per_entity(
        tagged, entity_col=entity_col, ts_col=ts_col,
        tiebreak="_fsr_src", num_buckets=num_buckets,
    )
    return out.map_batches(
        lambda t: t.drop_columns(["_fsr_src"]),
        batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
    )


def scd2_history(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: str | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """SCD-2 dimension build — merge_upsert's history-keeping sibling: turn
    a change log into one validity interval per attribute change. Per
    entity, ordered by ``(ts, tiebreak)``, a row is kept iff it is the
    entity's first or any attribute column differs from the previous row
    (NULL-safe, SQL ``IS DISTINCT FROM``); each kept row gets
    ``valid_from = ts``, ``valid_to`` = the next kept row's ts (NULL for
    the open current version) and ``is_current``. Rows with a NULL entity
    key are dropped on both sides (the grouped-reducing-op contract).
    ``(ts, tiebreak)`` must be unique per entity for the compaction to be
    deterministic.

    Scale shape: ONE hash(entity) exchange of the projected change-log
    columns; the per-bucket kernel is a lexsort + vectorized
    shifted-compare — unchanged rows (the bulk of a change log) never
    leave their bucket.
    """
    import numpy as np

    attr_cols = list(attr_cols)
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    cols = [entity_col] + order + attr_cols

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols].dropna(subset=[entity_col])

    ds = ds.map_batches(pre, batch_size=None, batch_format="pandas")
    ds = add_bucket_column(ds, entity_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            out = df[[entity_col] + attr_cols].copy()
            out["valid_from"] = pd.Series([], dtype="datetime64[us]")
            out["valid_to"] = pd.Series([], dtype="datetime64[us]")
            out["is_current"] = pd.Series([], dtype=bool)
            return out
        d = df.sort_values([entity_col] + order, kind="stable")
        ent = d[entity_col].to_numpy()
        first = np.empty(len(d), dtype=bool)
        first[0] = True
        first[1:] = ent[1:] != ent[:-1]
        changed = first.copy()
        for c in attr_cols:
            a = d[c]
            prev = a.shift(1)
            same = (a == prev) | (a.isna() & prev.isna())
            changed |= ~same.to_numpy()
        k = d.loc[changed]
        ts = k[ts_col].to_numpy()
        ent_k = k[entity_col].to_numpy()
        nxt_same = np.empty(len(k), dtype=bool)
        if len(k):
            nxt_same[:-1] = ent_k[1:] == ent_k[:-1]
            nxt_same[-1] = False
        valid_to = np.roll(ts, -1)
        out = pd.DataFrame({entity_col: ent_k})
        for c in attr_cols:
            out[c] = k[c].to_numpy()
        out["valid_from"] = ts
        out["valid_to"] = pd.Series(valid_to).where(nxt_same)
        out["is_current"] = ~nxt_same
        return out

    return bucketed_map_groups(
        ds, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def golden_record(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    tiebreak: str,
    value_cols: Sequence[str],
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Field-level survivorship merge (the MDM "golden record"): one row
    per entity where EACH value column independently takes its value from
    the latest row in which that column is non-null (``ORDER BY ts,
    tiebreak``) — unlike :func:`latest_per_entity`, which takes the whole
    latest row and inherits its nulls. Entities where a column is never
    populated get null for that column. Also emits ``n`` (row count) and
    ``last_ts`` (the entity's max ts).

    Null entity keys are excluded (grouped-reducing-op contract).

    Scale shape: ONE entity-hash exchange; the per-bucket kernel sorts
    once and takes each column's last non-null row per group — C
    groupby-last passes over the bucket, no Python row loop.
    """
    cols = list(value_cols)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df = df.dropna(subset=[entity_col])
        if df.empty:  # typed empty — object-dtype agg would poison unions
            out = pd.DataFrame({
                entity_col: df[entity_col],
                "n": pd.Series(dtype="int64"),
                "last_ts": df[ts_col],
            })
            for c in cols:
                out[f"{c}_last"] = df[c]
            return out
        df = df.sort_values([entity_col, ts_col, tiebreak], kind="stable")
        g = df.groupby(entity_col, sort=True)
        out = g.agg(n=(ts_col, "size"), last_ts=(ts_col, "max"))
        for c in cols:
            nn = df[df[c].notna()]
            out[f"{c}_last"] = nn.groupby(entity_col, sort=False)[c].last()
        out["n"] = out["n"].astype("int64")
        return out.reset_index()

    return bucketed_map_groups(
        add_bucket_column(ds, entity_col, num_buckets), kernel,
        num_buckets=num_buckets, batch_format="pandas",
    )
