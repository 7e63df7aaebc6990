"""Grouped aggregation with mandatory partial pre-aggregation.

The reference has no data aggregations (SURVEY.md §2.5); this is the
engine's generic grouped-aggregate primitive, built scale-first: every input
batch collapses to at most one row per (group, batch) BEFORE the shuffle, so
the all-to-all exchange moves partials, not rows. sum/count/min/max merge
trivially; mean = sum/count finalized after the merge.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import warnings

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


def pivot_counts(
    ds: ray.data.Dataset,
    group_col: str,
    pivot_col: str,
    *,
    values: Sequence | None = None,
    value_col: str | None = None,
    agg: str = "count",
    round_digits: int | None = 6,
    num_buckets: int = 64,
    final: str = "shuffle",
) -> ray.data.Dataset:
    """Pivot ``pivot_col``'s (small, known or sampled) value set into wide
    per-group columns — SQL conditional aggregation
    (``SUM(CASE WHEN p = v THEN ...)``), the standard way to turn an event
    log into per-entity feature vectors.

    ``values`` lists the pivot categories (a column per value, named
    ``{pivot_col}_{v}``); when omitted they are discovered from one cheap
    distinct pass (fine for bounded-cardinality pivots — an unbounded
    pivot column is a modeling error). ``agg``: "count" (rows where
    p = v) or "sum"/"mean" of ``value_col``. Scale shape = one synthetic
    conditional column per value + the grouped_aggregate partial
    pre-aggregation (the exchange moves one partial row per group/batch).
    """
    import pyarrow as pa

    if values is None:
        from featherstore_ray.stages.misc import distinct

        vals_ds = distinct(ds, [pivot_col], num_buckets=min(num_buckets, 16))
        values = sorted(
            vals_ds.to_pandas()[pivot_col].dropna().tolist()
        )
    values = list(values)
    if agg != "count" and value_col is None:
        raise ValueError(f"agg={agg!r} needs value_col")

    def widen(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for v in values:
            m = pc.equal(t[pivot_col], v)
            if agg == "count":
                col = pc.cast(pc.fill_null(m, False), pa.int64())
            else:
                col = pc.if_else(
                    pc.fill_null(m, False),
                    pc.cast(t[value_col], pa.float64()),
                    pa.scalar(None, pa.float64()),
                )
            t = t.append_column(_pivot_name(pivot_col, v), col)
        return t

    wide = ds.map_batches(
        widen, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    aggs = {}
    for v in values:
        col = _pivot_name(pivot_col, v)
        aggs[col] = (col, "sum" if agg == "count" else agg)
        if agg == "sum":
            # matched-row count per value: SQL SUM(CASE ...) is NULL for a
            # group with no matching rows, but pandas' skipna sum of the
            # all-null indicator column would yield 0.0 — null it out below
            aggs[f"__{col}_cnt"] = (col, "count")
    out = grouped_aggregate(
        wide,
        [group_col],
        aggs,
        round_digits=round_digits,
        num_buckets=num_buckets,
        final=final,
    )
    if agg != "sum":
        return out

    def null_empty_sums(df):
        for v in values:
            col = _pivot_name(pivot_col, v)
            cnt = f"__{col}_cnt"
            df.loc[df[cnt] == 0, col] = float("nan")
            df = df.drop(columns=[cnt])
        return df

    return out.map_batches(
        null_empty_sums, batch_size=None, batch_format="pandas"
    )


def _pivot_name(pivot_col: str, v) -> str:
    return f"{pivot_col}_{v}"


def event_sequence(
    ds: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    max_len: int | None = 20,
    sep: str = ">",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-entity behavioral journey: the entity's event types concatenated
    in ``(ts, tiebreak)`` order, capped at the FIRST ``max_len`` events (a
    journey cap is mandatory at scale — an uncapped hot entity would build
    an unbounded string). Output: ``(entity_col, journey, n_events)`` where
    ``n_events`` counts ALL events, not just the capped prefix.

    One exchange on the entity key; the per-bucket kernel sorts once and
    emits one row per entity.
    """

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [entity_col, ts_col, tiebreak_col], kind="stable"
        )
        g = df.groupby(entity_col, sort=False)
        n = g.size()
        head = df.groupby(entity_col, sort=False).head(
            max_len
        ) if max_len is not None else df
        journey = head.groupby(entity_col, sort=False)[type_col].agg(
            sep.join
        )
        out = pd.DataFrame(
            {
                entity_col: n.index.to_numpy(),
                "journey": journey.reindex(n.index).to_numpy(),
                "n_events": n.to_numpy().astype(np.int64),
            }
        )
        return out

    bucketed = add_bucket_column(
        ds.select_columns([entity_col, ts_col, type_col, tiebreak_col]),
        entity_col,
        num_buckets,
    )
    return bucketed_map_groups(
        bucketed, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def unpivot(
    ds: ray.data.Dataset,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    *,
    var_col: str = "metric",
    val_col: str = "value",
) -> ray.data.Dataset:
    """Wide→long reshape (SQL UNPIVOT / pandas melt): one output row per
    (input row, value column), values cast to float64 for a uniform value
    column. Pure per-batch Arrow transform — zero shuffle, streams at any
    scale (output is |value_cols|× the input rows but each block melts
    independently)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    id_cols, value_cols = list(id_cols), list(value_cols)

    def kernel(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {ic: t[ic] for ic in id_cols}
            cols[var_col] = pa.repeat(pa.scalar(c, pa.string()), t.num_rows)
            cols[val_col] = pc.cast(t[c], pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(
        kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )



def _grouping_sets_levels(keys, merge_fns, subsets, round_digits):
    """Re-reduce the finest aggregate over ``subsets`` (lists of key
    columns), null-filling grouped-out keys — the shared single-block
    finish of rollup (prefix subsets) and cube (all subsets)."""

    def levels(df: pd.DataFrame) -> pd.DataFrame:
        frames = [df]
        for sub in subsets:
            sub = list(sub)
            if sub:
                g = df.groupby(sub, sort=False)
                lvl = pd.DataFrame(
                    {o: g[o].agg(m) for o, m in merge_fns.items()}
                ).reset_index()
            else:
                lvl = pd.DataFrame(
                    {o: [df[o].agg(m)] for o, m in merge_fns.items()}
                )
            for k in keys:
                if k not in sub:
                    lvl[k] = None
            frames.append(lvl[list(df.columns)])
        out = pd.concat(frames, ignore_index=True)
        if round_digits is not None:
            for c in out.columns:
                if c not in keys and out[c].dtype.kind == "f":
                    out[c] = out[c].round(round_digits)
        return out

    return levels


def rollup(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    *,
    round_digits: int | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """GROUP BY ROLLUP(keys): the finest-level aggregate plus every prefix
    level up to the grand total, grouped-out keys null-filled (SQL ROLLUP
    semantics). fn ∈ {sum, count, min, max} only — these re-merge exactly
    from the finest level, so the input is scanned ONCE: the full-scale
    work is the finest ``grouped_aggregate`` (partial pre-aggregation →
    one exchange); coarser levels re-reduce the already-tiny finest table
    on a single block.

    Grouped-out key columns are emitted as null; with non-string keys the
    pandas concat coerces ints to float — keep rollup keys strings (the
    normal case for dimension columns).
    """
    keys = list(keys)
    finest = grouped_aggregate(
        ds, keys, aggs, round_digits=round_digits, num_buckets=num_buckets
    )
    merge_fns = {out: _MERGE[fn] for out, (_c, fn) in aggs.items()}

    subsets = [keys[:d] for d in range(len(keys) - 1, -1, -1)]
    levels = _grouping_sets_levels(keys, merge_fns, subsets, round_digits)
    return finest.repartition(1).map_batches(
        levels, batch_size=None, batch_format="pandas"
    )


def cube(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    *,
    round_digits: int | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """GROUP BY CUBE(keys): the finest-level aggregate plus EVERY key
    subset down to the grand total, grouped-out keys null-filled (SQL CUBE
    semantics). Same one-scan shape as :func:`rollup` — the full-scale
    work is the finest ``grouped_aggregate``; the 2^k − 1 coarser levels
    re-reduce the already-tiny finest table on a single block (fn ∈
    {sum, count, min, max} re-merge exactly). Keep cube keys strings: the
    null fill would coerce int key columns to float in pandas concat."""
    from itertools import combinations

    keys = list(keys)
    finest = grouped_aggregate(
        ds, keys, aggs, round_digits=round_digits, num_buckets=num_buckets
    )
    merge_fns = {out: _MERGE[fn] for out, (_c, fn) in aggs.items()}

    subsets = [list(s) for r in range(len(keys) - 1, -1, -1)
               for s in combinations(keys, r)]
    levels = _grouping_sets_levels(keys, merge_fns, subsets, round_digits)
    return finest.repartition(1).map_batches(
        levels, batch_size=None, batch_format="pandas"
    )


def co_occurrence(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    item_col: str,
    min_count: int = 1,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Market-basket / skip-gram-style co-occurrence counting: for every
    unordered item pair ``(a < b)`` appearing together in a group (order,
    basket, context window id), the number of groups containing BOTH —
    the input statistic for item2vec/PMI embeddings and association
    rules. Duplicate items within a group count once (set semantics).

    Scale shape: exchange 1 co-locates each group's DISTINCT items and
    emits triangular pairs fully vectorized (``pair_indices``),
    pre-aggregated per bucket; exchange 2 sums per pair keyed by
    hash(a). Pair volume is Σ basket_size² — bound basket size upstream
    for pathological groups (same contract as the Jaccard join).
    """
    import pyarrow as pa

    from featherstore_ray.stages.dedup import pair_indices

    # drop null group/item rows explicitly: a null item would crash the
    # lexsort pair kernel (object arrays can't compare None to str) and
    # SQL's inner self-join excludes them anyway
    proj = ds.select_columns([group_col, item_col]).map_batches(
        lambda t: t.drop_null(),
        batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
    )
    tagged = add_bucket_column(proj, group_col, num_buckets)

    def _empty(item_type: "pa.DataType") -> pa.Table:
        return pa.table(
            {"a": pa.array([], item_type), "b": pa.array([], item_type),
             "n": pa.array([], pa.int64())}
        )

    def pairs(t: pa.Table) -> pa.Table:
        it_type = t.schema.field(item_col).type
        if t.num_rows == 0:
            return _empty(it_type)
        g = t[group_col].to_numpy(zero_copy_only=False)
        it = t[item_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((it, g))
        g, it = g[order], it[order]
        # distinct (group, item): a basket lists an item once
        first = np.ones(len(g), dtype=bool)
        first[1:] = (g[1:] != g[:-1]) | (it[1:] != it[:-1])
        g, it = g[first], it[first]
        a_idx, b_idx = pair_indices(g)
        if len(a_idx) == 0:
            return _empty(it_type)
        agg = (
            pd.DataFrame({"a": it[a_idx], "b": it[b_idx]})
            .groupby(["a", "b"], sort=False).size().rename("n").reset_index()
        )
        return pa.table({
            "a": pa.array(agg["a"], it_type),
            "b": pa.array(agg["b"], it_type),
            "n": pa.array(agg["n"].to_numpy(dtype=np.int64)),
        })

    partials = add_bucket_column(
        bucketed_map_groups(
            tagged, pairs, num_buckets=num_buckets, batch_format="pyarrow"
        ),
        "a",
        num_buckets,
    )

    def finalize(t: pa.Table) -> pa.Table:
        it_type = t.schema.field("a").type
        if t.num_rows == 0:
            return _empty(it_type)
        df = t.select(["a", "b", "n"]).to_pandas()
        g = df.groupby(["a", "b"], sort=False)["n"].sum().reset_index()
        g = g[g["n"] >= min_count]
        return pa.table(
            {
                "a": pa.array(g["a"], it_type),
                "b": pa.array(g["b"], it_type),
                "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            }
        )

    return bucketed_map_groups(
        partials, finalize, num_buckets=num_buckets, batch_format="pyarrow"
    )



def _xy_moment_partial(gk, x_col, y_col):
    """Per-batch (n, Σx, Σy, Σx², Σy², Σxy) moment collapse shared by
    group_corr and group_linear_fit. Null group keys and null x/y rows
    are excluded — mirrored by each caller's oracle WHERE."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[gk + [x_col, y_col]].dropna(subset=gk + [x_col, y_col])
        if df.empty:
            return pd.DataFrame(
                {**{k: df[k] for k in gk},
                 **{c: pd.Series(dtype="float64")
                    for c in ("_n", "_sx", "_sy", "_sxx", "_syy", "_sxy")}}
            )
        x = df[x_col].to_numpy(dtype=np.float64)
        y = df[y_col].to_numpy(dtype=np.float64)
        d = df[gk].copy()
        d["_n"] = 1.0
        d["_sx"], d["_sy"] = x, y
        d["_sxx"], d["_syy"], d["_sxy"] = x * x, y * y, x * y
        return d.groupby(gk, sort=False, observed=True).sum().reset_index()

    return partial


def group_corr(
    ds: ray.data.Dataset,
    group_keys: Sequence[str],
    x_col: str,
    y_col: str,
    *,
    out_col: str = "corr_xy",
    round_digits: int | None = 6,
    num_buckets: int = 64,
    final: str = "driver",
) -> ray.data.Dataset:
    """Per-group sample Pearson correlation via mergeable moment partials.

    Each block collapses to (n, Σx, Σy, Σx², Σy², Σxy) per group before
    any movement; the merge is a plain sum, so at 100 TB the exchange (or
    the driver pull, for low-cardinality keys with ``final="driver"``)
    carries groups × 6 floats, never rows. Rows where either side is null
    are excluded (SQL ``corr`` semantics), as are rows with a null group
    key (mirrored by the oracle's WHERE). Groups with < 2 rows or zero
    variance yield null.
    """
    gk = list(group_keys)

    partial = _xy_moment_partial(gk, x_col, y_col)

    parts = ds.map_batches(partial, batch_size=None, batch_format="pandas")

    def merge_frame(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(gk, sort=True, observed=True)[
            ["_n", "_sx", "_sy", "_sxx", "_syy", "_sxy"]
        ].sum().reset_index()
        n = g["_n"].to_numpy()
        vx = n * g["_sxx"].to_numpy() - g["_sx"].to_numpy() ** 2
        vy = n * g["_syy"].to_numpy() - g["_sy"].to_numpy() ** 2
        cov = n * g["_sxy"].to_numpy() - g["_sx"].to_numpy() * g["_sy"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            r = cov / np.sqrt(vx * vy)
        r[(n < 2) | (vx <= 0) | (vy <= 0)] = np.nan
        if round_digits is not None:
            r = np.round(r, round_digits)
        out = g[gk].copy()
        out[out_col] = r
        return out

    if final == "driver":
        import pyarrow as pa

        return ray.data.from_arrow(pa.Table.from_pandas(
            merge_frame(parts.to_pandas()), preserve_index=False))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return merge_frame(df.drop(columns=[BUCKET_COL]))

    return bucketed_map_groups(
        add_bucket_column(parts, gk[0], num_buckets),
        merge, num_buckets=num_buckets, batch_format="pandas",
    )



def _grouped_cat_counts(
    ds: ray.data.Dataset,
    group_keys: list,
    cat_col: str,
    finish,
    *,
    num_buckets: int,
):
    """Shared two-stage categorical-count shape (group_entropy / hhi):
    per-batch (group, category, count) partials — null group keys AND
    null categories excluded explicitly (oracle WHERE contract) — ONE
    group exchange of distinct pairs, then ``finish(counts_df)`` per
    bucket over exact totals."""
    gk = list(group_keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[gk + [cat_col]].dropna(subset=gk + [cat_col])
        return (
            d.groupby(gk + [cat_col], sort=False, observed=True)
            .size().rename("_c").reset_index()
        )

    parts = ds.select_columns(gk + [cat_col]).map_batches(
        partial, batch_size=None, batch_format="pandas"
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        c = (
            df.drop(columns=[BUCKET_COL])
            .groupby(gk + [cat_col], sort=True, observed=True)["_c"]
            .sum().reset_index()
        )
        return finish(c)

    return bucketed_map_groups(
        add_bucket_column(parts, gk[0], num_buckets),
        finalize, num_buckets=num_buckets, batch_format="pandas",
    )


def group_entropy(
    ds: ray.data.Dataset,
    group_keys: Sequence[str],
    cat_col: str,
    *,
    out_col: str = "entropy",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Shannon entropy (nats) of a categorical distribution per group:
    ``-Σ p ln p`` over the category frequencies. Two-stage counts
    (shared ``_grouped_cat_counts`` shape with :func:`hhi`): each block
    collapses to (group, category, count) partials — null group keys and
    null categories excluded on both sides — ONE bucket exchange of
    distinct pairs, entropy finalized per group."""
    gk = list(group_keys)

    def finish(cf: pd.DataFrame) -> pd.DataFrame:
        n = cf.groupby(gk, sort=True, observed=True)["_c"].transform("sum")
        p = cf["_c"].to_numpy(dtype=np.float64) / n.to_numpy(dtype=np.float64)
        cf["_t"] = p * np.log(p)
        out = (-cf.groupby(gk, sort=True, observed=True)["_t"].sum()).rename(
            out_col).reset_index()
        if round_digits is not None:
            out[out_col] = out[out_col].round(round_digits)
        return out

    return _grouped_cat_counts(ds, gk, cat_col, finish,
                               num_buckets=num_buckets)


def histogram(
    ds: ray.data.Dataset,
    value_col: str,
    *,
    num_bins: int = 20,
    round_digits: int = 6,
    materialize_input: bool = True,
) -> ray.data.Dataset:
    """Equal-width histogram over the global [min, max] of ``value_col``:
    one row per non-empty bin with ``(bin, lo, hi, cnt)``. Two passes, no
    shuffle anywhere: pass 1 collapses each block to its (min, max) and
    merges driver-side; pass 2 bincounts each block against the broadcast
    range and the per-block count vectors (``num_bins`` ints regardless of
    rows) merge driver-side. The bin expression ``least(floor((v - mn) /
    (mx - mn) * B), B - 1)`` is evaluated in the same IEEE order as the
    SQL oracle so boundary values bin identically."""
    import pyarrow as pa

    proj = ds.select_columns([value_col])
    if materialize_input:
        proj = proj.materialize()  # both passes share one read

    def mm_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "mn": pa.array([pc.min(t[value_col]).as_py()], pa.float64()),
            "mx": pa.array([pc.max(t[value_col]).as_py()], pa.float64()),
        })

    mm = proj.map_batches(
        mm_partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    mm = mm.dropna()
    empty = pa.table({
        "bin": pa.array([], pa.int64()),
        "lo": pa.array([], pa.float64()),
        "hi": pa.array([], pa.float64()),
        "cnt": pa.array([], pa.int64()),
    })
    if mm.empty:
        return ray.data.from_arrow(empty)
    mn, mx = float(mm["mn"].min()), float(mm["mx"].max())
    B = int(num_bins)

    def counts(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if mx == mn:
            b = np.zeros(len(v), np.int64)
        else:
            b = np.minimum(
                np.floor((v - mn) / (mx - mn) * float(B)), float(B - 1)
            ).astype(np.int64)
        return pa.table({"cnt": pa.array(np.bincount(b, minlength=B), pa.int64())})

    c = proj.map_batches(
        counts, batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()  # num_bins × blocks ints — bounded
    total = c["cnt"].to_numpy().reshape(-1, B).sum(axis=0)
    bins = np.nonzero(total)[0].astype(np.int64)
    w = (mx - mn) / float(B)
    return ray.data.from_arrow(pa.table({
        "bin": pa.array(bins, pa.int64()),
        "lo": pa.array(np.round(mn + bins * w, round_digits), pa.float64()),
        "hi": pa.array(np.round(mn + (bins + 1) * w, round_digits), pa.float64()),
        "cnt": pa.array(total[bins], pa.int64()),
    }))


def funnel(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Ordered conversion funnel: for each prefix of ``stages``, the number
    of entities that completed every stage IN ORDER — stage k counts
    entities with an event of type ``stages[k]`` STRICTLY after their
    (recursively defined) completion time of stage k-1, which is the
    earliest qualifying timestamp. Output: one row per stage
    ``(stage, users)``.

    Scale shape: rows are filtered to funnel event types and projected to
    three columns before the single entity exchange; the per-bucket kernel
    is a vectorized conditional-min cascade (len(stages) passes over the
    bucket); per-bucket per-stage counts (stages × buckets ints) merge
    driver-side."""
    stages = list(stages)

    def _keep(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t[type_col], pa.array(stages)))

    proj = ds.select_columns([entity_col, ts_col, type_col]).map_batches(
        _keep, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        counts = []
        t_prev = None
        for st in stages:
            sub = df[df[type_col] == st]
            if t_prev is not None:
                prev = sub[entity_col].map(t_prev)
                sub = sub[sub[ts_col] > prev]  # NaT compares False: entity
                #                                 missing stage k-1 drops out
            t_prev = sub.groupby(entity_col)[ts_col].min()
            counts.append(len(t_prev))
        return pd.DataFrame({"stage": stages, "users": counts})

    parts = bucketed_map_groups(
        add_bucket_column(proj, entity_col, num_buckets),
        lambda df: kernel(df.drop(columns=[BUCKET_COL])),
        num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()  # stages × buckets rows — bounded
    import pyarrow as pa

    if parts.empty:  # no event matched any stage: all-zero funnel, not a crash
        totals = np.zeros(len(stages), dtype=np.int64)
    else:
        totals = (
            parts.groupby("stage", sort=False)["users"].sum()
            .reindex(stages).fillna(0).to_numpy(dtype=np.int64)
        )
    return ray.data.from_arrow(pa.table({
        "stage": pa.array(stages, pa.string()),
        "users": pa.array(totals, pa.int64()),
    }))


def transition_counts(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    type_col: str,
    order_col: str | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """First-order Markov transition counts of the per-entity event
    sequence: ``(prev_type, next_type, n)`` over consecutive events
    ordered by (ts, order_col) within each entity; each entity's first
    event has no predecessor and contributes nothing. One entity
    exchange; per-bucket shift + count; the (types × types) count
    partials merge driver-side (bounded by the category vocabulary)."""
    cols = [entity_col, ts_col, type_col] + (
        [order_col] if order_col else [])
    sort_cols = [entity_col, ts_col] + ([order_col] if order_col else [])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=[BUCKET_COL]).sort_values(sort_cols)
        prev = d.groupby(entity_col, sort=False)[type_col].shift(1)
        d = d.assign(prev_type=prev)
        d = d[d["prev_type"].notna()]
        out = (
            d.groupby(["prev_type", type_col], sort=False, observed=True)
            .size().rename("n").reset_index()
            .rename(columns={type_col: "next_type"})
        )
        return out

    parts = bucketed_map_groups(
        add_bucket_column(ds.select_columns(cols), entity_col, num_buckets),
        kernel, num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()  # vocab² × buckets rows — bounded
    import pyarrow as pa

    if parts.empty:  # fully-empty input: typed empty result, not a KeyError
        return ray.data.from_arrow(pa.table({
            "prev_type": pa.array([], pa.string()),
            "next_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }))
    out = (parts.groupby(["prev_type", "next_type"], sort=True)["n"]
           .sum().reset_index())
    out["n"] = out["n"].astype(np.int64)
    return ray.data.from_arrow(
        pa.Table.from_pandas(out, preserve_index=False))


def group_mode(
    ds: ray.data.Dataset,
    group_keys: Sequence[str],
    cat_col: str,
    *,
    out_col: str = "mode",
    count_col: str = "mode_count",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Modal (most frequent) category per group, ties broken by the
    lexicographically smallest category — the deterministic MODE() the
    reference's DuckDB layer can't guarantee across engines. Two-stage
    counts exactly like :func:`group_entropy`: per-block (group, category,
    count) partials, ONE bucket exchange on the group key, per-group argmax
    in the finalizer. The exchange carries distinct (group, category)
    partials, never rows."""
    gk = list(group_keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # null GROUP keys are dropped explicitly on BOTH sides (oracle has
        # the matching IS NOT NULL) — the grouped-reducing-op contract:
        # pandas groupby silently drops null keys, SQL keeps a NULL group
        d = df[gk + [cat_col]].dropna(subset=gk + [cat_col])
        return (
            d.groupby(gk + [cat_col], sort=False, observed=True)
            .size().rename("_c").reset_index()
        )

    parts = ds.map_batches(partial, batch_size=None, batch_format="pandas")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        c = (
            df.groupby(gk + [cat_col], sort=False, observed=True)["_c"]
            .sum().reset_index()
        )
        c = c.sort_values(
            gk + ["_c", cat_col], ascending=[True] * len(gk) + [False, True],
            kind="mergesort",
        )
        top = c.drop_duplicates(subset=gk, keep="first")
        out = top.rename(columns={cat_col: out_col, "_c": count_col})
        out[count_col] = out[count_col].astype(np.int64)
        return out[gk + [out_col, count_col]]

    return bucketed_map_groups(
        add_bucket_column(parts, gk[0], num_buckets),
        finalize, num_buckets=num_buckets, batch_format="pandas",
    )


def cohort_retention(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Cohort-retention matrix: entities are cohorted by their FIRST active
    day; for every (cohort_day, day_offset) cell, the number of distinct
    entities active ``day_offset`` days after their cohort day. Output
    ``(cohort_day, day_offset, users)`` with cohort_day a day-truncated
    timestamp (UTC epoch-day buckets, matching the tumbling-daily oracle
    convention).

    Scale shape: each block first collapses to its DISTINCT (entity, day)
    pairs — bounded by entities × active-days, never raw events — then ONE
    entity exchange co-locates each entity's days so the true first day is
    exact; per-bucket (cohort, offset) count partials (cohorts × offsets
    ints per bucket) merge driver-side, funnel-style. Entities are
    partitioned across buckets, so bucket counts sum without double
    counting."""
    _DAY_US = 86_400_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[entity_col, ts_col]].dropna()
        us = d[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = d.assign(_day=us // _DAY_US)[[entity_col, "_day"]]
        return d.drop_duplicates()

    parts = ds.map_batches(partial, batch_size=None, batch_format="pandas")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=[BUCKET_COL]).drop_duplicates()
        first = d.groupby(entity_col, sort=False)["_day"].transform("min")
        out = pd.DataFrame({
            "_cohort": first.to_numpy(),
            "_off": (d["_day"].to_numpy() - first.to_numpy()),
            entity_col: d[entity_col].to_numpy(),
        })
        return (
            out.groupby(["_cohort", "_off"], sort=False)[entity_col]
            .nunique().rename("users").reset_index()
        )

    merged = bucketed_map_groups(
        add_bucket_column(parts, entity_col, num_buckets),
        kernel, num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()  # cohorts × offsets × buckets rows — bounded
    import pyarrow as pa

    if merged.empty:  # fully-empty input: typed empty result, not a KeyError
        merged = pd.DataFrame({
            "_cohort": pd.Series(dtype="int64"),
            "_off": pd.Series(dtype="int64"),
            "users": pd.Series(dtype="int64"),
        })
    out = (
        merged.groupby(["_cohort", "_off"], sort=True)["users"]
        .sum().reset_index()
    )
    return ray.data.from_arrow(pa.table({
        "cohort_day": pa.array(
            out["_cohort"].to_numpy(dtype=np.int64) * _DAY_US,
            pa.timestamp("us"),
        ),
        "day_offset": pa.array(out["_off"].to_numpy(dtype=np.int64),
                               pa.int64()),
        "users": pa.array(out["users"].to_numpy(dtype=np.int64), pa.int64()),
    }))


def association_rules(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    item_col: str,
    min_count: int = 1,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Directional association rules over market baskets: for every
    co-occurring unordered pair (set semantics, ``n >= min_count``), BOTH
    rules a→b and b→a with::

        support    = n_ab / N
        confidence = n_ab / n_antecedent
        lift       = confidence / (n_consequent / N)

    where ``n_x`` is the number of distinct baskets containing x and N the
    total distinct-basket count.

    Scale shape: pair counts ride the :func:`co_occurrence` exchanges;
    per-item basket counts are ONE (item, basket)-distinct bucket exchange
    whose output is vocabulary-bounded and broadcast into the scoring map;
    N comes from a distinct-key reduce. No additional row-scale shuffle —
    scoring streams over the pair table."""
    import pyarrow as pa

    from featherstore_ray.stages.misc import distinct

    pairs = co_occurrence(
        ds, group_col=group_col, item_col=item_col,
        min_count=min_count, num_buckets=num_buckets,
    )

    proj = ds.select_columns([group_col, item_col])

    def ic_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[[item_col, group_col]].drop_duplicates()

    def ic_kernel(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=[BUCKET_COL]).drop_duplicates()
        return (
            d.groupby(item_col, sort=False).size().rename("_n").reset_index()
        )

    ic = bucketed_map_groups(
        add_bucket_column(
            proj.map_batches(ic_partial, batch_size=None,
                             batch_format="pandas"),
            item_col, num_buckets,
        ),
        ic_kernel, num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()  # vocabulary-bounded
    counts = ic.set_index(item_col)["_n"]
    n_baskets = distinct(proj.select_columns([group_col]),
                         [group_col]).count()

    def score(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = pd.concat([
            df.rename(columns={"a": "antecedent", "b": "consequent"}),
            df.rename(columns={"b": "antecedent", "a": "consequent"}),
        ], ignore_index=True)
        n = out["n"].to_numpy(dtype=np.float64)
        na = counts.reindex(out["antecedent"]).to_numpy(dtype=np.float64)
        nc = counts.reindex(out["consequent"]).to_numpy(dtype=np.float64)
        conf = n / na
        out["support"] = np.round(n / float(n_baskets), round_digits)
        out["confidence"] = np.round(conf, round_digits)
        out["lift"] = np.round(conf / (nc / float(n_baskets)), round_digits)
        return pa.Table.from_pandas(out, preserve_index=False)

    return pairs.map_batches(score, batch_size=None, batch_format="pyarrow",
                             zero_copy_batch=True)


def group_linear_fit(
    ds: ray.data.Dataset,
    group_keys: Sequence[str],
    x_col: str,
    y_col: str,
    *,
    round_digits: int | None = 6,
    num_buckets: int = 64,
    final: str = "driver",
) -> ray.data.Dataset:
    """Per-group ordinary-least-squares fit of ``y`` on ``x`` — the trend
    extractor behind drift detection and per-entity feature slopes.

    Same mergeable-moment design as :func:`group_corr`: each block collapses
    to (n, Σx, Σy, Σx², Σy², Σxy) per group before any movement, so at
    100 TB the exchange (or driver pull for low-cardinality keys) carries
    groups × 6 floats, never rows. Output per group: ``slope``,
    ``intercept`` and ``r2`` (null when < 2 rows or x has zero variance;
    ``r2`` additionally null when y has zero variance — SQL ``regr_*``
    guard semantics, expressed via the closed-form moment formula so the
    oracle can mirror it exactly).
    """
    gk = list(group_keys)

    partial = _xy_moment_partial(gk, x_col, y_col)

    parts = ds.map_batches(partial, batch_size=None, batch_format="pandas")

    def merge_frame(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(gk, sort=True, observed=True)[
            ["_n", "_sx", "_sy", "_sxx", "_syy", "_sxy"]
        ].sum().reset_index()
        n = g["_n"].to_numpy()
        sx, sy = g["_sx"].to_numpy(), g["_sy"].to_numpy()
        vx = n * g["_sxx"].to_numpy() - sx * sx
        vy = n * g["_syy"].to_numpy() - sy * sy
        cov = n * g["_sxy"].to_numpy() - sx * sy
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = cov / vx
            intercept = (sy - slope * sx) / n
            r2 = (cov * cov) / (vx * vy)
        bad = (n < 2) | (vx <= 0)
        slope[bad] = np.nan
        intercept[bad] = np.nan
        r2[bad | (vy <= 0)] = np.nan
        if round_digits is not None:
            slope = np.round(slope, round_digits)
            intercept = np.round(intercept, round_digits)
            r2 = np.round(r2, round_digits)
        out = g[gk].copy()
        out["n"] = n.astype(np.int64)
        out["slope"], out["intercept"], out["r2"] = slope, intercept, r2
        return out

    if final == "driver":
        import pyarrow as pa

        return ray.data.from_arrow(pa.Table.from_pandas(
            merge_frame(parts.to_pandas()), preserve_index=False))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return merge_frame(df.drop(columns=[BUCKET_COL]))

    return bucketed_map_groups(
        add_bucket_column(parts, gk[0], num_buckets),
        merge, num_buckets=num_buckets, batch_format="pandas",
    )


def corr_matrix(
    ds: ray.data.Dataset,
    columns: Sequence[str],
    *,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Pairwise Pearson correlation across numeric columns in ONE pass.

    Each block collapses to pairwise-complete moment sums (n, Σx, Σy, Σx²,
    Σy², Σxy per column pair, excluding rows where either side is null —
    SQL ``corr`` semantics); the driver sums the per-block partials (tiny:
    blocks × C(k,2) × 6 floats) and finishes with the same n·Σxy − ΣxΣy
    formula as :func:`group_corr`. Output: one row per unordered pair
    (col_x < col_y) with ``corr`` (null when < 2 rows or zero variance).

    At 100 TB the exchange carries only the moment partials — never rows.
    """
    import pyarrow as pa

    cols = list(columns)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = {c: df[c].to_numpy(dtype=np.float64) for c in cols}
        masks = {c: df[c].notna().to_numpy() for c in cols}
        rows = []
        for a, b in pairs:
            m = masks[a] & masks[b]
            x, y = vals[a][m], vals[b][m]
            rows.append((a, b, float(len(x)), x.sum(), y.sum(),
                         (x * x).sum(), (y * y).sum(), (x * y).sum()))
        return pd.DataFrame(
            rows, columns=["col_x", "col_y",
                           "_n", "_sx", "_sy", "_sxx", "_syy", "_sxy"])

    parts = ds.select_columns(cols).map_batches(
        partial, batch_size=None, batch_format="pandas"
    ).to_pandas()  # blocks × pairs rows — bounded

    g = parts.groupby(["col_x", "col_y"], sort=True)[
        ["_n", "_sx", "_sy", "_sxx", "_syy", "_sxy"]
    ].sum().reset_index()
    n = g["_n"].to_numpy()
    vx = n * g["_sxx"].to_numpy() - g["_sx"].to_numpy() ** 2
    vy = n * g["_syy"].to_numpy() - g["_sy"].to_numpy() ** 2
    cov = n * g["_sxy"].to_numpy() - g["_sx"].to_numpy() * g["_sy"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        r = cov / np.sqrt(vx * vy)
    r[(n < 2) | (vx <= 0) | (vy <= 0)] = np.nan
    if round_digits is not None:
        r = np.round(r, round_digits)
    return ray.data.from_arrow(pa.table({
        "col_x": pa.array(g["col_x"], pa.string()),
        "col_y": pa.array(g["col_y"], pa.string()),
        "corr": pa.array(r, pa.float64()),
    }))


def vif(
    ds: ray.data.Dataset,
    columns: Sequence[str],
    *,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Variance inflation factors — the standard multicollinearity audit
    run before fitting linear / logistic models on a feature table
    (``VIF_j = 1 / (1 - R²_j)`` of regressing feature j on the others,
    equivalently the j-th diagonal of the inverse correlation matrix).

    Listwise-complete rows (a row with ANY null among ``columns`` is
    dropped — classic regression semantics, unlike :func:`corr_matrix`'s
    pairwise-complete) collapse per block to one moment row: ``n``, the
    k first-moment sums and the k(k+1)/2 upper-triangle cross sums. The
    driver adds the tiny partials and inverts the k×k correlation matrix
    — for k == 3 via the explicit cofactor closed form so the DuckDB
    oracle is a literal expression mirror (``det = 1 + 2·r12·r13·r23 −
    r12² − r13² − r23²``; ``VIF_1 = (1 − r23²)/det`` …), ``np.linalg.inv``
    for general k. At 100 TB only (1 + k + k(k+1)/2) floats per block
    ever move. Degenerate inputs (n ≤ k, a zero-variance column, or a
    singular correlation matrix) yield null VIFs rather than garbage.
    """
    import pyarrow as pa

    cols = list(columns)
    k = len(cols)
    iu = np.triu_indices(k)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.ones(len(df), dtype=bool)
        for c in cols:
            m &= df[c].notna().to_numpy()
        x = np.column_stack(
            [df[c].to_numpy(dtype=np.float64)[m] for c in cols]
        ) if m.any() else np.empty((0, k), dtype=np.float64)
        cross = x.T @ x  # k×k, tiny
        row = {"_n": float(x.shape[0])}
        for i, c in enumerate(cols):
            row[f"_s{i}"] = x[:, i].sum() if len(x) else 0.0
        for i, j in zip(*iu):
            row[f"_s{i}_{j}"] = float(cross[i, j])
        return pd.DataFrame([row])

    parts = ds.select_columns(cols).map_batches(
        partial, batch_size=None, batch_format="pandas"
    ).to_pandas()  # one row per block — bounded
    tot = parts.sum()
    n = float(tot["_n"])
    s = np.array([tot[f"_s{i}"] for i in range(k)])
    ss = np.zeros((k, k))
    for i, j in zip(*iu):
        ss[i, j] = ss[j, i] = float(tot[f"_s{i}_{j}"])

    out = np.full(k, np.nan)
    var = n * np.diag(ss) - s * s
    if n > k and (var > 0).all():
        with np.errstate(invalid="ignore", divide="ignore"):
            denom = np.sqrt(np.outer(var, var))
            r = (n * ss - np.outer(s, s)) / denom
        np.fill_diagonal(r, 1.0)
        if k == 3:
            r12, r13, r23 = r[0, 1], r[0, 2], r[1, 2]
            det = (1.0 + 2.0 * r12 * r13 * r23
                   - r12 * r12 - r13 * r13 - r23 * r23)
            if det > 1e-12:
                out[0] = (1.0 - r23 * r23) / det
                out[1] = (1.0 - r13 * r13) / det
                out[2] = (1.0 - r12 * r12) / det
        else:
            try:
                out = np.diag(np.linalg.inv(r)).copy()
            except np.linalg.LinAlgError:
                pass
    if round_digits is not None:
        out = np.round(out, round_digits)
    order = np.argsort(np.array(cols, dtype=object))
    return ray.data.from_arrow(pa.table({
        "col": pa.array([cols[i] for i in order], pa.string()),
        "vif": pa.array(out[order], pa.float64()),
    }))


def ks_test(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    label_col: str,
    label_a,
    label_b,
    *,
    out_col: str = "ks",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two labels — the standard drift / A-B distribution
    test (``D = max_v |ECDF_a(v) - ECDF_b(v)|``, ECDFs evaluated at the
    pooled sample points with ties fully pooled — SQL RANGE-frame
    semantics, so the oracle is an exact window-function mirror).

    Rows are filtered to the two labels and non-null values in a streaming
    map (3 narrow columns cross the ONE group exchange); the per-bucket
    kernel is a lexsort + cumsum + boundary gather — no Python row loop.
    Groups missing either label are dropped.
    """

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[label_col].isin([label_a, label_b])
                & df[value_col].notna() & df[group_col].notna()]
        return pd.DataFrame({
            group_col: df[group_col],
            "_v": df[value_col].astype(np.float64),
            "_ia": (df[label_col] == label_a).to_numpy(),
        })

    slim = ds.map_batches(pick, batch_size=None, batch_format="pandas")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, "_v"], kind="mergesort")
        g = df[group_col].to_numpy()
        v = df["_v"].to_numpy()
        ia = df["_ia"].to_numpy()
        n = len(df)
        if n == 0:
            return pd.DataFrame({group_col: df[group_col],
                                 out_col: pd.Series(dtype="float64")})
        new_g = np.empty(n, dtype=bool)
        new_g[0] = True
        new_g[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.append(starts, n))
        cum_a = np.cumsum(ia.astype(np.int64))
        cum_b = np.cumsum((~ia).astype(np.int64))
        base_a = np.repeat(cum_a[starts] - ia[starts], sizes)
        base_b = np.repeat(cum_b[starts] - (~ia[starts]), sizes)
        ca = (cum_a - base_a).astype(np.float64)
        cb = (cum_b - base_b).astype(np.float64)
        gid = np.cumsum(new_g) - 1
        na = np.bincount(gid, weights=ia)[gid]
        nb = sizes[gid] - na
        # evaluate at each group's LAST tie row (peers pooled, RANGE frame)
        last = np.empty(n, dtype=bool)
        last[-1] = True
        last[:-1] = (g[1:] != g[:-1]) | (v[1:] != v[:-1])
        ok = last & (na > 0) & (nb > 0)
        diff = np.abs(ca[ok] / na[ok] - cb[ok] / nb[ok])
        out = (pd.DataFrame({group_col: g[ok], out_col: diff})
               .groupby(group_col, sort=True, observed=True)[out_col]
               .max().reset_index())
        if round_digits is not None:
            out[out_col] = np.round(out[out_col], round_digits)
        return out

    return bucketed_map_groups(
        add_bucket_column(slim, group_col, num_buckets),
        lambda df: kernel(df.drop(columns=[BUCKET_COL])),
        num_buckets=num_buckets, batch_format="pandas",
    )


def grouped_weighted_stats(
    ds: ray.data.Dataset,
    group_keys: Sequence[str],
    value_col: str,
    weight_col: str,
    *,
    round_digits: int | None = 6,
    num_buckets: int = 64,
    final: str = "driver",
) -> ray.data.Dataset:
    """Per-group weighted mean and (population) weighted variance — the
    importance-weighted statistics behind loss-weighted corpus summaries
    and weighted feature normalization.

    Same mergeable-moment design as :func:`group_corr` /
    :func:`group_linear_fit`: each block collapses to (Σw, Σwx, Σwx²) per
    group before any movement, so the exchange (or driver pull for
    low-cardinality keys) carries groups × 3 floats, never rows. Rows with
    a null group key, a null value, or a null/zero-or-negative weight are
    excluded (mirrored by the oracle's WHERE clause). Outputs
    ``wsum``, ``wmean`` and ``wvar = Σwx²/Σw − wmean²`` (null when Σw is
    0; clamped at >= 0 against cancellation) — the closed-form mirrored by
    the oracle.
    """
    gk = list(group_keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # null group keys are excluded EXPLICITLY (the oracle filters them
        # too — pandas groupby would silently drop them only impl-side)
        df = df[gk + [value_col, weight_col]].dropna(
            subset=gk + [value_col, weight_col])
        df = df[df[weight_col] > 0]
        if df.empty:
            return pd.DataFrame(
                {**{k: df[k] for k in gk},
                 **{c: pd.Series(dtype="float64")
                    for c in ("_sw", "_swx", "_swxx")}}
            )
        x = df[value_col].to_numpy(dtype=np.float64)
        w = df[weight_col].to_numpy(dtype=np.float64)
        d = df[gk].copy()
        d["_sw"] = w
        d["_swx"] = w * x
        d["_swxx"] = w * x * x
        return d.groupby(gk, sort=False, observed=True).sum().reset_index()

    parts = ds.map_batches(partial, batch_size=None, batch_format="pandas")

    def merge_frame(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(gk, sort=True, observed=True)[
            ["_sw", "_swx", "_swxx"]
        ].sum().reset_index()
        sw = g["_sw"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            wmean = g["_swx"].to_numpy() / sw
            wvar = g["_swxx"].to_numpy() / sw - wmean * wmean
        wvar = np.maximum(wvar, 0.0)
        bad = sw <= 0
        wmean[bad] = np.nan
        wvar[bad] = np.nan
        out = g[gk].copy()
        out["wsum"] = sw
        out["wmean"], out["wvar"] = wmean, wvar
        if round_digits is not None:
            for c in ("wsum", "wmean", "wvar"):
                out[c] = np.round(out[c], round_digits)
        return out

    if final == "driver":
        import pyarrow as pa

        return ray.data.from_arrow(pa.Table.from_pandas(
            merge_frame(parts.to_pandas()), preserve_index=False))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return merge_frame(df.drop(columns=[BUCKET_COL]))

    return bucketed_map_groups(
        add_bucket_column(parts, gk[0], num_buckets),
        merge, num_buckets=num_buckets, batch_format="pandas",
    )


def ipf_raking(
    ds: ray.data.Dataset,
    row_col: str,
    col_col: str,
    *,
    iters: int = 5,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Iterative proportional fitting (raking) of the (row, col)
    contingency table to UNIFORM target margins — the survey-weighting /
    dataset-rebalancing primitive: starting from the observed cell counts,
    alternately scale every row to the row target ``N/|rows|`` and every
    column to the column target ``N/|cols|`` for ``iters`` full rounds.
    Output: one row per observed cell — (row, col, n, weight) with
    ``weight`` the raked cell mass (rows with a null key are excluded on
    both sides). Scaling factors are computed as ``target / margin_sum``
    then multiplied per cell, exactly the expression the unrolled-CTE
    oracle states, so per-cell doubles differ only by margin summation
    order (absorbed by rounding + tolerance).

    Scale shape: the one wide pass is the `_contingency` partial merge
    (distinct category pairs only — categorical keys by contract); the
    IPF loop itself runs driver-side over the |rows|x|cols|-bounded
    table, like mutual_info / chi2_test.
    """
    import pyarrow as pa

    j, n_total = _contingency(ds, row_col, col_col)
    if n_total == 0:
        return ray.data.from_arrow(pa.table({
            row_col: pa.array([], pa.string()),
            col_col: pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "weight": pa.array([], pa.float64()),
        }))
    ri, rcats = pd.factorize(j[row_col], sort=True)
    ci, ccats = pd.factorize(j[col_col], sort=True)
    w = j["_c"].to_numpy(dtype=np.float64)
    rt = float(n_total) / len(rcats)
    ct = float(n_total) / len(ccats)
    for _ in range(int(iters)):
        rowsum = np.bincount(ri, weights=w, minlength=len(rcats))
        w = w * (rt / rowsum)[ri]
        colsum = np.bincount(ci, weights=w, minlength=len(ccats))
        w = w * (ct / colsum)[ci]
    return ray.data.from_arrow(pa.table({
        row_col: pa.array(j[row_col]),
        col_col: pa.array(j[col_col]),
        "n": pa.array(j["_c"].to_numpy(dtype=np.int64)),
        "weight": pa.array(np.round(w, round_digits)),
    }))


def _contingency(ds: ray.data.Dataset, x_col: str, y_col: str):
    """Driver-merged (x, y, count) contingency table from per-batch
    partials — the exchange carries distinct category pairs, never rows.
    Returns (joint DataFrame with '_c', total count)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[x_col, y_col]].dropna()
        return (
            d.groupby([x_col, y_col], sort=False, observed=True)
            .size().rename("_c").reset_index()
        )

    parts = ds.select_columns([x_col, y_col]).map_batches(
        partial, batch_size=None, batch_format="pandas"
    )
    j = (
        parts.to_pandas()
        .groupby([x_col, y_col], sort=True, observed=True)["_c"]
        .sum().reset_index()
    )
    return j, float(j["_c"].sum())


def mutual_info(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Mutual information between two categorical columns — the feature/
    label association statistic behind redundancy pruning and leakage
    audits: ``I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))`` (nats), plus the
    marginal entropies and ``nmi = I/√(H(X)·H(Y))``. Rows with a null on
    either side are excluded. One row out: (mi, hx, hy, nmi).

    Scale shape: each block collapses to its (x, y, count) contingency
    partials — the exchange carries distinct category pairs, never rows —
    and the driver merges the |X|×|Y|-bounded table (categorical by
    contract; for high-cardinality keys use :func:`pmi` per pair
    instead). The closed-form finish is mirrored literally by the oracle.
    """
    j, n = _contingency(ds, x_col, y_col)
    if n == 0:
        mi = hx = hy = nmi = np.nan
    else:
        cx = j.groupby(x_col, sort=True, observed=True)["_c"].sum()
        cy = j.groupby(y_col, sort=True, observed=True)["_c"].sum()
        pxy = j["_c"].to_numpy(dtype=np.float64) / n
        px = j[x_col].map(cx).to_numpy(dtype=np.float64) / n
        py = j[y_col].map(cy).to_numpy(dtype=np.float64) / n
        mi = float(np.sum(pxy * np.log(pxy / (px * py))))
        mx = cx.to_numpy(dtype=np.float64) / n
        my = cy.to_numpy(dtype=np.float64) / n
        hx = float(-np.sum(mx * np.log(mx)))
        hy = float(-np.sum(my * np.log(my)))
        nmi = mi / np.sqrt(hx * hy) if hx > 0 and hy > 0 else np.nan

    import pyarrow as pa

    return ray.data.from_arrow(pa.table({
        "mi": [np.round(mi, round_digits)],
        "hx": [np.round(hx, round_digits)],
        "hy": [np.round(hy, round_digits)],
        "nmi": [np.round(nmi, round_digits)],
    }))


def woe_iv(
    ds: ray.data.Dataset,
    cat_col: str,
    label_col: str,
    *,
    smoothing: float = 0.5,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Weight of Evidence + Information Value per category — the classic
    credit-scoring / feature-screening encoder: with per-category event
    counts ``pos_c`` (label = 1) and ``neg_c`` (label = 0) and ``K``
    categories, the smoothed event shares are
    ``dp = (pos_c + s) / (pos_tot + s·K)`` and
    ``dn = (neg_c + s) / (neg_tot + s·K)`` (add-``s`` per cell so zero
    cells stay finite and each share vector still sums to 1), then
    ``woe = ln(dp / dn)``, ``iv_term = (dp − dn)·woe`` and
    ``iv = Σ_c iv_term`` (repeated on every row — the feature's screening
    score). Rows with a null category or null label are excluded on both
    sides (oracle WHERE contract). ``label_col`` is 0/1 by contract.

    Scale shape (the :func:`mutual_info` pattern): each block collapses to
    (category, Σlabel, count) partials — the exchange carries distinct
    categories, never rows — and the driver merges the K-bounded table
    (categorical by contract; for ID-grade cardinalities use
    :func:`~featherstore_ray.stages.misc.target_encode`'s distributed
    route instead). The closed form is mirrored literally by the oracle.
    """
    import pyarrow as pa

    s = float(smoothing)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[cat_col, label_col]].dropna()
        g = d.groupby(cat_col, sort=False, observed=True)[label_col].agg(
            _p="sum", _n="count"
        ).reset_index()
        return g

    parts = ds.select_columns([cat_col, label_col]).map_batches(
        partial, batch_size=None, batch_format="pandas"
    )
    stats = (
        parts.to_pandas()
        .groupby(cat_col, sort=True, observed=True)[["_p", "_n"]]
        .sum().reset_index()
    )
    k = float(len(stats))
    pos = stats["_p"].to_numpy(dtype=np.float64)
    n = stats["_n"].to_numpy(dtype=np.float64)
    neg = n - pos
    pos_tot = float(pos.sum())
    neg_tot = float(neg.sum())
    dp = (pos + s) / (pos_tot + s * k)
    dn = (neg + s) / (neg_tot + s * k)
    woe = np.log(dp / dn)
    iv_term = (dp - dn) * woe
    iv = float(iv_term.sum())
    return ray.data.from_arrow(pa.table({
        cat_col: pa.array(stats[cat_col]),
        "n_pos": pa.array(pos.astype(np.int64)),
        "n_neg": pa.array(neg.astype(np.int64)),
        "woe": pa.array(np.round(woe, round_digits)),
        "iv_term": pa.array(np.round(iv_term, round_digits)),
        "iv": pa.array(np.full(len(stats), np.round(iv, round_digits))),
    }))


def ohlc(
    ds: ray.data.Dataset,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    *,
    freq: str = "D",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-(entity, period) OHLC bars — open/high/low/close/volume, the
    classic resampled summary for telemetry and market streams. Open is
    the value at the MIN (ts, tiebreak), close at the MAX (ts, tiebreak)
    (deterministic on equal timestamps); rows with a null value, entity
    or timestamp are excluded (mirrored by the oracle's WHERE).

    A custom MERGEABLE aggregate: each block collapses to per-group
    (open_ts, open_tb, open, high, low, close_ts, close_tb, close, n)
    partials — first/last-by-time merge associatively by re-applying the
    same argmin/argmax rule — so ONE bucket exchange on hash(entity)
    carries groups × 9 scalars, never rows.
    """
    import pyarrow as pa

    gk = [entity_col, "period"]

    def collapse(df: pd.DataFrame, first_cols: dict) -> pd.DataFrame:
        """Reduce (already-partial or raw) rows to one row per group.
        Open and close candidates need SEPARATE sorts: when merging
        partials, the partial holding the earliest open is not in
        general the one holding the latest close."""
        s_open = df.sort_values(
            gk + [first_cols["ts"], first_cols["tb"]], kind="stable"
        )
        head = s_open.groupby(gk, sort=False, observed=True).head(
            1).set_index(gk)
        s_close = df.sort_values(
            gk + [first_cols["close_ts"], first_cols["close_tb"]],
            kind="stable",
        )
        tail = s_close.groupby(gk, sort=False, observed=True).tail(
            1).set_index(gk)
        out = df.groupby(gk, sort=False, observed=True).agg(
            high=(first_cols["high"], "max"),
            low=(first_cols["low"], "min"),
            volume=(first_cols["n"], "sum"),
        )
        out["open_ts"] = head[first_cols["ts"]]
        out["open_tb"] = head[first_cols["tb"]]
        out["open"] = head[first_cols["open"]]
        out["close_ts"] = tail[first_cols["close_ts"]]
        out["close_tb"] = tail[first_cols["close_tb"]]
        out["close"] = tail[first_cols["close"]]
        return out.reset_index()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # null entity/ts rows are excluded EXPLICITLY, mirroring the
        # oracle's WHERE — pandas groupby would drop them only impl-side
        d = df[[entity_col, ts_col, value_col, tiebreak_col]].dropna(
            subset=[entity_col, ts_col, value_col])
        d = d.rename(columns={value_col: "_v"})
        d["period"] = d[ts_col].dt.floor(freq)
        d["_n"] = np.int64(1)
        # raw rows: open/close candidates are the row itself
        d["_cts"], d["_ctb"], d["_cv"] = d[ts_col], d[tiebreak_col], d["_v"]
        d["_hi"] = d["_v"]
        d["_lo"] = d["_v"]
        return collapse(d, {
            "ts": ts_col, "tb": tiebreak_col, "open": "_v",
            "close_ts": "_cts", "close_tb": "_ctb", "close": "_cv",
            "high": "_hi", "low": "_lo", "n": "_n",
        })

    parts = ds.select_columns(
        [entity_col, ts_col, value_col, tiebreak_col]
    ).map_batches(partial, batch_size=None, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = collapse(df.drop(columns=[BUCKET_COL]), {
            "ts": "open_ts", "tb": "open_tb", "open": "open",
            "close_ts": "close_ts", "close_tb": "close_tb",
            "close": "close", "high": "high", "low": "low", "n": "volume",
        })
        # close = last by (close_ts, close_tb): re-sort for the tail pick
        out = out[gk + ["open", "high", "low", "close", "volume"]]
        if round_digits is not None:
            for c in ("open", "high", "low", "close"):
                out[c] = out[c].round(round_digits)
        out["volume"] = out["volume"].astype(np.int64)
        return out

    return bucketed_map_groups(
        add_bucket_column(parts, entity_col, num_buckets),
        merge, num_buckets=num_buckets, batch_format="pandas",
    )


def chi2_test(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Pearson χ² test of independence between two categorical columns —
    the feature-selection / drift companion to :func:`mutual_info`
    (same contingency partials, different statistic). Uses the
    zero-cell-free identity ``χ² = n·(Σ_obs o²/(rx·cy) − 1)`` so both
    engines sum over OBSERVED cells only; ``dof = (|X|−1)·(|Y|−1)`` over
    observed marginals; ``cramers_v = √(χ²/(n·(min(|X|,|Y|)−1)))`` — the
    normalized effect size. One row out: (chi2, dof, cramers_v).
    """
    import pyarrow as pa

    j, n = _contingency(ds, x_col, y_col)
    if n == 0:
        chi2, dof, cramers_v = np.nan, 0, np.nan
    else:
        cx = j.groupby(x_col, sort=True, observed=True)["_c"].sum()
        cy = j.groupby(y_col, sort=True, observed=True)["_c"].sum()
        o = j["_c"].to_numpy(dtype=np.float64)
        rx = j[x_col].map(cx).to_numpy(dtype=np.float64)
        ry = j[y_col].map(cy).to_numpy(dtype=np.float64)
        # clamp: the identity is mathematically >= 0 but can float-round
        # to -eps under near-independence (sqrt would warn/NaN here and
        # ERROR in DuckDB)
        chi2 = max(n * (float(np.sum(o * o / (rx * ry))) - 1.0), 0.0)
        dof = (len(cx) - 1) * (len(cy) - 1)
        kmin = min(len(cx), len(cy)) - 1
        cramers_v = (
            float(np.sqrt(chi2 / (n * kmin))) if kmin > 0 else np.nan
        )

    return ray.data.from_arrow(pa.table({
        "chi2": [np.round(chi2, round_digits)],
        "dof": pa.array([dof], pa.int64()),
        "cramers_v": [np.round(cramers_v, round_digits)],
    }))


def welch_t(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    label_col: str,
    label_a,
    label_b,
    *,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Per-group Welch two-sample t statistic between the values of two
    labels — the mean-shift drift test next to :func:`ks_test`'s
    distribution test. Outputs (group, t, dof) with Welch-Satterthwaite
    degrees of freedom; groups lacking ≥ 2 values on either side (or
    with zero pooled variance) are dropped/null per SQL semantics.

    Scale shape: moments are sufficient — each block collapses to
    (group, side, n, Σx, Σx²) partials merged driver-side (blocks ×
    groups × 2 rows; route through the bucket exchange for ID-grade
    group cardinalities). The closed form mirrors the oracle's explicit
    sums term for term (never variance built-ins).
    """
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[label_col].isin([label_a, label_b])
               & df[value_col].notna() & df[group_col].notna()]
        x = d[value_col].astype(np.float64)
        out = pd.DataFrame({
            group_col: d[group_col],
            "_ia": (d[label_col] == label_a).to_numpy().astype(np.int8),
            "_n": np.int64(1), "_sx": x, "_sxx": x * x,
        })
        return out.groupby([group_col, "_ia"], sort=False, observed=True)[
            ["_n", "_sx", "_sxx"]].sum().reset_index()

    m = (
        ds.select_columns([group_col, value_col, label_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
        .groupby([group_col, "_ia"], sort=True, observed=True)[
            ["_n", "_sx", "_sxx"]].sum().reset_index()
    )
    a = m[m["_ia"] == 1].set_index(group_col)
    b = m[m["_ia"] == 0].set_index(group_col)
    g = a.join(b, how="inner", lsuffix="_1", rsuffix="_2")
    g = g[(g["_n_1"] >= 2) & (g["_n_2"] >= 2)]

    def side(nn, sx, sxx):
        var = (sxx - sx * sx / nn) / (nn - 1.0)
        return sx / nn, var / nn

    n1 = g["_n_1"].to_numpy(dtype=np.float64)
    n2 = g["_n_2"].to_numpy(dtype=np.float64)
    m1, v1 = side(n1, g["_sx_1"].to_numpy(), g["_sxx_1"].to_numpy())
    m2, v2 = side(n2, g["_sx_2"].to_numpy(), g["_sxx_2"].to_numpy())
    with np.errstate(invalid="ignore", divide="ignore"):
        pooled = v1 + v2
        t = np.where(pooled > 0, (m1 - m2) / np.sqrt(pooled), np.nan)
        ddenom = v1 * v1 / (n1 - 1.0) + v2 * v2 / (n2 - 1.0)
        dof = np.where(ddenom > 0, pooled * pooled / ddenom, np.nan)
    if round_digits is not None:
        t, dof = np.round(t, round_digits), np.round(dof, round_digits)

    return ray.data.from_arrow(pa.table({
        group_col: pa.array(g.index.to_numpy()),
        "t": pa.array(t, pa.float64()),
        "dof": pa.array(dof, pa.float64()),
    }))


def rfm(
    ds: ray.data.Dataset,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """RFM features — the classic customer/entity scoring triple:
    ``recency_days`` (days from the entity's last event to the corpus'
    latest event), ``frequency`` (event count) and ``monetary``
    (Σ value, null if the entity has only null values). Null entity keys
    are excluded.

    One pass: per-batch (entity, max ts, count, Σv) partials merged
    driver-side (entities × blocks rows — route through the bucket
    exchange for ID-grade cardinalities); the corpus "now" is the max of
    the merged last timestamps, so no extra pass.
    """
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[entity_col].notna()]
        g = d.groupby(entity_col, sort=False, observed=True)
        out = pd.DataFrame({
            "_last": g[ts_col].max(),
            "_n": g.size(),
            "_mon": g[value_col].sum(min_count=1),
        }).reset_index()
        return out

    m = (
        ds.select_columns([entity_col, ts_col, value_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
    )
    g = m.groupby(entity_col, sort=True, observed=True)
    agg = pd.DataFrame({
        "_last": g["_last"].max(),
        "frequency": g["_n"].sum().astype(np.int64),
        "monetary": g["_mon"].sum(min_count=1),
    })
    now = agg["_last"].max()
    rec = (
        (now - agg["_last"]).dt.total_seconds().to_numpy(np.float64)
        / 86400.0
    )
    out = agg.reset_index()
    return ray.data.from_arrow(pa.table({
        entity_col: pa.array(out[entity_col]),
        "recency_days": pa.array(np.round(rec, round_digits)),
        "frequency": pa.array(out["frequency"].to_numpy(np.int64)),
        "monetary": pa.array(
            np.round(out["monetary"].to_numpy(np.float64), round_digits)),
    }))


def count_distinct(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    out_col: str = "n_distinct",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT value) per group — the exact companion to
    :func:`~featherstore_ray.stages.sketch.hll_distinct`. Null values
    don't count; null group keys are excluded (oracle WHERE mirror).

    Scale shape: per-batch (group, value) dedup partial FIRST (the
    exchange carries distinct pairs, never rows), ONE bucket shuffle on
    hash(group), per-bucket distinct + size. Skew bound: a group's
    distinct-value set lands in one bucket — for billion-distinct groups
    use the HLL sketch instead.
    """
    import pyarrow as pa

    proj = ds.select_columns([group_col, value_col])

    def partial(t: pa.Table) -> pa.Table:
        t = t.drop_null()
        return t.group_by([group_col, value_col]).aggregate([])

    parts = proj.map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop(columns=[BUCKET_COL])
            .drop_duplicates([group_col, value_col])
            .groupby(group_col, sort=True, observed=True)
            .size().rename(out_col).reset_index()
        )
        g[out_col] = g[out_col].astype(np.int64)
        return g

    return bucketed_map_groups(
        add_bucket_column(parts, group_col, num_buckets),
        finalize, num_buckets=num_buckets, batch_format="pandas",
    )


_TIME_PARTS = {
    # epoch day 0 = Thursday = 3 under 0=Monday … 6=Sunday
    "dow": lambda ts: ((ts.astype("datetime64[D]").view(np.int64) + 3)
                       % 7).astype(np.int64),
    "hour": lambda ts: ((ts.view(np.int64) // 3_600_000_000) % 24
                        ).astype(np.int64),
    "day": lambda ts: (ts.astype("datetime64[D]")
                       - ts.astype("datetime64[M]")).astype(np.int64) + 1,
    "month": lambda ts: (ts.astype("datetime64[M]").view(np.int64) % 12
                         ).astype(np.int64) + 1,
}


def time_features(
    ds: ray.data.Dataset,
    ts_col: str,
    *,
    parts: Sequence[str] = ("dow", "hour", "day", "month"),
    prefix: str | None = None,
) -> ray.data.Dataset:
    """Calendar feature extraction — day-of-week (0 = Monday), hour of
    day, day of month, month, plus ``is_weekend`` when ``dow`` is
    requested. Pure integer arithmetic on the epoch (no per-row datetime
    objects), streaming map, no shuffle. Matches DuckDB ``isodow - 1`` /
    ``hour`` / ``day`` / ``month`` semantics; null timestamps → nulls.
    """
    import pyarrow as pa

    pre = f"{prefix}_" if prefix else ""
    bad = set(parts) - set(_TIME_PARTS)
    if bad:
        raise ValueError(f"unknown time parts: {sorted(bad)}")

    def kernel(t: pa.Table) -> pa.Table:
        col = t[ts_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mask = col.is_null().to_numpy(zero_copy_only=False)
        ts = col.to_numpy(zero_copy_only=False).astype("datetime64[us]")
        safe = np.where(mask, np.datetime64(0, "us"), ts)
        out = t
        for p in parts:
            v = _TIME_PARTS[p](safe)
            arr = pa.array(v, pa.int64(), mask=mask)
            out = out.append_column(f"{pre}{p}", arr)
            if p == "dow":
                wk = (v >= 5)
                out = out.append_column(
                    f"{pre}is_weekend", pa.array(wk, pa.bool_(), mask=mask))
        return out

    return ds.map_batches(
        kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def gini(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    out_col: str = "gini",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group Gini concentration coefficient — the inequality audit
    behind "how concentrated is the corpus in few sources / the spend in
    few users": ``G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n`` over the group's
    ascending-sorted values (tie order cancels out of the formula). Null
    values/group keys are excluded; groups with Σx = 0 yield null.

    Scale shape: exact Gini needs the group's full sorted value set, so
    ONE bucket exchange on hash(group) + a vectorized per-bucket kernel
    (lexsort + segmented rank dot product) — the grouped_quantiles
    contract; the oracle mirrors the formula with ROW_NUMBER.
    """
    proj = ds.select_columns([group_col, value_col])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).dropna(
            subset=[group_col, value_col])
        if df.empty:
            return pd.DataFrame({group_col: df[group_col],
                                 out_col: pd.Series(dtype="float64")})
        g = df[group_col].to_numpy()
        x = df[value_col].to_numpy(dtype=np.float64)
        order = np.lexsort((x, g))
        g, x = g[order], x[order]
        new_g = np.ones(len(g), dtype=bool)
        new_g[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.append(starts, len(g)))
        rk = np.arange(len(g), dtype=np.float64) + 1.0 \
            - np.repeat(starts, sizes)
        wsum = np.add.reduceat(rk * x, starts)
        s = np.add.reduceat(x, starts)
        n = sizes.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            val = np.where(s == 0, np.nan,
                           2.0 * wsum / (n * s) - (n + 1.0) / n)
        if round_digits is not None:
            val = np.round(val, round_digits)
        return pd.DataFrame({group_col: g[starts], out_col: val})

    return bucketed_map_groups(
        add_bucket_column(proj, group_col, num_buckets),
        kernel, num_buckets=num_buckets, batch_format="pandas",
    )


def hhi(
    ds: ray.data.Dataset,
    group_col: str,
    cat_col: str,
    *,
    out_col: str = "hhi",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Herfindahl-Hirschman concentration of a categorical mix per group —
    ``HHI = Σ_c (n_c / n)²`` (1 = single category, 1/k = uniform over k):
    the market-concentration view of :func:`group_entropy`. Null group or
    category rows are excluded (oracle WHERE mirror).

    Same two-stage shape as ``group_entropy``: per-batch
    (group, category, count) partials, ONE group exchange of distinct
    pairs, closed-form finish.
    """
    def finish(c: pd.DataFrame) -> pd.DataFrame:
        n = c.groupby(group_col, sort=True, observed=True)["_c"].transform(
            "sum")
        share = c["_c"].to_numpy(dtype=np.float64) / n.to_numpy(
            dtype=np.float64)
        c["_s2"] = share * share
        out = c.groupby(group_col, sort=True, observed=True)["_s2"].sum(
        ).rename(out_col).reset_index()
        if round_digits is not None:
            out[out_col] = out[out_col].round(round_digits)
        return out

    return _grouped_cat_counts(ds, [group_col], cat_col, finish,
                               num_buckets=num_buckets)


def wilson_ci(
    ds: ray.data.Dataset,
    group_col: str,
    label_col: str,
    success_value,
    *,
    z: float = 1.959964,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Per-group conversion rate with the Wilson score interval — the
    A/B-test-grade rate summary that stays sane at small n and p near
    0/1: ``p̂ = s/n``, bounds ``(p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) /
    (1 + z²/n)``. Null labels don't count toward n; null group keys and
    groups with zero labeled rows are excluded (oracle WHERE mirror).

    Scale shape: each block collapses to (group, n, successes) —
    two ints per group per block — merged driver-side; closed-form
    finish mirrored literally by the oracle.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[group_col, label_col]].dropna(subset=[group_col])
        if d.empty:  # typed empty: apply/object dtypes would poison the
            return pd.DataFrame({  # cross-block schema union
                group_col: d[group_col],
                "_n": pd.Series(dtype="int64"),
                "_s": pd.Series(dtype="int64"),
            })
        nn = d[label_col].notna()
        succ = nn & (d[label_col] == success_value)
        return (
            d.assign(_n=nn.astype(np.int64), _s=succ.astype(np.int64))
            .groupby(group_col, sort=False, observed=True)[["_n", "_s"]]
            .sum().reset_index()
        )

    m = (
        ds.select_columns([group_col, label_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas().groupby(group_col, sort=True, observed=True)[
            ["_n", "_s"]].sum()
    )
    m = m[m["_n"] > 0]  # all-null-label groups: mirror the oracle's n > 0
    n = m["_n"].to_numpy(dtype=np.float64)
    s = m["_s"].to_numpy(dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        p = s / n
        denom = 1.0 + z * z / n
        center = p + z * z / (2.0 * n)
        half = z * np.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
        lo = (center - half) / denom
        hi = (center + half) / denom
    bad = n <= 0
    for arr in (p, lo, hi):
        arr[bad] = np.nan
    if round_digits is not None:
        p, lo, hi = (np.round(a, round_digits) for a in (p, lo, hi))

    import pyarrow as pa

    return ray.data.from_arrow(pa.table({
        group_col: pa.array(m.index.to_numpy()),
        "n": pa.array(m["_n"].to_numpy(dtype=np.int64)),
        "rate": pa.array(p), "ci_lo": pa.array(lo), "ci_hi": pa.array(hi),
    }))


def eb_shrinkage(
    ds: ray.data.Dataset,
    group_col: str,
    label_col: str,
    success_value,
    *,
    strength_cap: float = 1000.0,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Empirical-Bayes beta-binomial shrinkage of per-group success rates —
    the standard small-sample smoother for CTR/conversion features: fit a
    Beta(α, β) prior to the observed per-group rates by method of moments
    (``μ = Σp/k``, ``v = Σp²/k − μ²`` over the k groups, prior strength
    ``M = μ(1−μ)/v − 1`` clamped to ``(0, strength_cap]``, ``α = μM``),
    then report ``eb_rate = (s + α)/(n + M)``. Degenerate priors (zero or
    negative moment variance, v ≥ μ(1−μ)) clamp M to ``strength_cap`` —
    maximal shrink toward the pooled mean — via the same CASE the oracle
    uses. Null labels don't count toward n; null group keys and zero-n
    groups are excluded (oracle WHERE mirror).

    Scale shape: identical to :func:`wilson_ci` — each block collapses to
    (group, n, successes) two-int partials merged driver-side (one row per
    group; route the merge through the bucket exchange if ``group_col`` is
    ID-grade), then a closed-form finish from two scalar moments.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[group_col, label_col]].dropna(subset=[group_col])
        if d.empty:
            return pd.DataFrame({
                group_col: d[group_col],
                "_n": pd.Series(dtype="int64"),
                "_s": pd.Series(dtype="int64"),
            })
        nn = d[label_col].notna()
        succ = nn & (d[label_col] == success_value)
        return (
            d.assign(_n=nn.astype(np.int64), _s=succ.astype(np.int64))
            .groupby(group_col, sort=False, observed=True)[["_n", "_s"]]
            .sum().reset_index()
        )

    m = (
        ds.select_columns([group_col, label_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas().groupby(group_col, sort=True, observed=True)[
            ["_n", "_s"]].sum()
    )
    m = m[m["_n"] > 0]
    n = m["_n"].to_numpy(dtype=np.float64)
    s = m["_s"].to_numpy(dtype=np.float64)
    p = s / n
    k = float(len(p))
    cap = float(strength_cap)
    if k > 0:
        mu = float(p.sum() / k)
        v = float((p * p).sum() / k - mu * mu)
        strength = mu * (1.0 - mu) / v - 1.0 if v > 0 else cap
        if not strength > 0:
            strength = cap
        strength = min(cap, strength)
    else:  # no groups: prior is irrelevant, output is empty anyway
        mu, strength = 0.0, cap
    eb = (s + mu * strength) / (n + strength)
    if round_digits is not None:
        p = np.round(p, round_digits)
        eb = np.round(eb, round_digits)

    import pyarrow as pa

    return ray.data.from_arrow(pa.table({
        group_col: pa.array(m.index.to_numpy()),
        "n": pa.array(m["_n"].to_numpy(dtype=np.int64)),
        "rate": pa.array(p),
        "eb_rate": pa.array(eb),
    }))


def mann_whitney(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    label_col: str,
    label_a,
    label_b,
    *,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group Mann-Whitney U (rank-sum) test between the values of two
    labels — the nonparametric member of the drift trio next to
    :func:`ks_test` (distribution) and :func:`welch_t` (means): ``U₁ = R₁
    − n₁(n₁+1)/2`` with mid-ranks for ties, plus the tie-corrected normal
    approximation ``z = (U₁ − n₁n₂/2) / σ``,
    ``σ² = n₁n₂/12·((n+1) − Σ(t³−t)/(n(n−1)))``. Groups missing either
    label are dropped; z is null when σ = 0 (all values tied).

    Same one-exchange shape as ``ks_test``: 3 narrow columns cross the
    hash(group) exchange; the kernel is a lexsort + run-length mid-rank +
    segmented sums — no Python row loop.
    """
    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[label_col].isin([label_a, label_b])
                & df[value_col].notna() & df[group_col].notna()]
        return pd.DataFrame({
            group_col: df[group_col],
            "_v": df[value_col].astype(np.float64),
            "_ia": (df[label_col] == label_a).to_numpy(),
        })

    slim = ds.map_batches(pick, batch_size=None, batch_format="pandas")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, "_v"], kind="mergesort")
        g = df[group_col].to_numpy()
        v = df["_v"].to_numpy()
        ia = df["_ia"].to_numpy()
        n = len(df)
        if n == 0:
            return pd.DataFrame({
                group_col: df[group_col],
                "u": pd.Series(dtype="float64"),
                "z": pd.Series(dtype="float64"),
            })
        new_g = np.empty(n, dtype=bool)
        new_g[0] = True
        new_g[1:] = g[1:] != g[:-1]
        gstarts = np.flatnonzero(new_g)
        gsizes = np.diff(np.append(gstarts, n))
        rwg = np.arange(n) - np.repeat(gstarts, gsizes)
        # tie runs within each group: mid-rank = first_rank + (t-1)/2
        new_run = new_g.copy()
        new_run[1:] |= v[1:] != v[:-1]
        rstarts = np.flatnonzero(new_run)
        rsizes = np.diff(np.append(rstarts, n))
        midrank = np.repeat(rwg[rstarts] + 1.0 + (rsizes - 1) / 2.0, rsizes)
        run_group = np.cumsum(new_g) - 1  # group id per row
        k = len(gstarts)
        n1 = np.bincount(run_group, weights=ia.astype(np.float64),
                         minlength=k)
        ntot = gsizes.astype(np.float64)
        n2 = ntot - n1
        r1 = np.bincount(run_group, weights=np.where(ia, midrank, 0.0),
                         minlength=k)
        # tie correction: sum(t^3 - t) per group over tie-run sizes
        run_of_group = run_group[rstarts]
        t = rsizes.astype(np.float64)
        tie = np.bincount(run_of_group, weights=t * t * t - t, minlength=k)
        u1 = r1 - n1 * (n1 + 1.0) / 2.0
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (n1 * n2 / 12.0) * (
                (ntot + 1.0) - tie / (ntot * (ntot - 1.0)))
            z = np.where(var > 0,
                         (u1 - n1 * n2 / 2.0) / np.sqrt(var), np.nan)
        keep = (n1 > 0) & (n2 > 0)
        u1 = np.where(keep, u1, np.nan)
        if round_digits is not None:
            u1, z = np.round(u1, round_digits), np.round(z, round_digits)
        out = pd.DataFrame({
            group_col: g[gstarts], "u": u1, "z": z,
        })
        return out[keep]

    return bucketed_map_groups(
        add_bucket_column(slim, group_col, num_buckets),
        lambda df: kernel(df.drop(columns=[BUCKET_COL])),
        num_buckets=num_buckets, batch_format="pandas",
    )


def psi_drift(
    ds: ray.data.Dataset,
    value_col: str,
    ts_col: str,
    *,
    cutoff,
    lo: float,
    hi: float,
    num_bins: int = 10,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Population Stability Index between the reference window (``ts <
    cutoff``) and the current window (``ts >= cutoff``) of ``value_col`` —
    the standard ML feature-drift monitor. Output: one row per fixed-width
    bin over [lo, hi) (out-of-range values clip into the edge bins, the
    conventional open-ended first/last buckets) with counts, add-one-
    smoothed shares, and ``psi_term = (share_ref - share_cur) *
    ln(share_ref / share_cur)``; PSI = sum of psi_term (>0.2 = major
    shift by the usual rule of thumb).

    Scale shape: NO shuffle — each block collapses to two ``num_bins``-int
    count vectors (bincount per side) merged driver-side, the same bounded
    partial as :func:`histogram`. Fixed ``[lo, hi)`` breaks (vs
    histogram's data-derived range) keep bins comparable across runs —
    the property a drift monitor needs. Rows with null value or ts are
    out of contract on both sides. The bin expression
    ``least(greatest(floor((v - lo) / w), 0), B - 1)`` and the smoothed
    shares ``(n + 1) / (N + B)`` are evaluated in the same IEEE order as
    the SQL oracle.
    """
    import pyarrow as pa

    B = int(num_bins)
    if B < 2 or not (hi > lo):
        raise ValueError(f"need hi > lo and num_bins >= 2, got "
                         f"[{lo}, {hi}) x {num_bins}")
    w = (hi - lo) / float(B)
    cut = np.datetime64(cutoff, "us").astype(np.int64)

    def counts(t):
        import pyarrow as pa

        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ts = t[ts_col].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        ok = ~np.isnan(v)
        ok &= ~pd.isna(t[ts_col].to_pandas()).to_numpy()
        v, ts = v[ok], ts[ok]
        b = np.minimum(np.maximum(np.floor((v - lo) / w), 0.0),
                       float(B - 1)).astype(np.int64)
        is_ref = ts < cut
        return pa.table({
            "n_ref": pa.array(np.bincount(b[is_ref], minlength=B),
                              pa.int64()),
            "n_cur": pa.array(np.bincount(b[~is_ref], minlength=B),
                              pa.int64()),
        })

    c = ds.select_columns([value_col, ts_col]).map_batches(
        counts, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()  # 2 x num_bins ints per block — bounded
    n_ref = c["n_ref"].to_numpy().reshape(-1, B).sum(axis=0) \
        if len(c) else np.zeros(B, np.int64)
    n_cur = c["n_cur"].to_numpy().reshape(-1, B).sum(axis=0) \
        if len(c) else np.zeros(B, np.int64)
    bins = np.arange(B, dtype=np.int64)
    sr = (n_ref + 1.0) / (n_ref.sum() + float(B))
    sc = (n_cur + 1.0) / (n_cur.sum() + float(B))
    return ray.data.from_arrow(pa.table({
        "bin": pa.array(bins),
        "bin_lo": pa.array(np.round(lo + bins * w, round_digits)),
        "bin_hi": pa.array(np.round(lo + (bins + 1) * w, round_digits)),
        "n_ref": pa.array(n_ref.astype(np.int64)),
        "n_cur": pa.array(n_cur.astype(np.int64)),
        "share_ref": pa.array(np.round(sr, round_digits)),
        "share_cur": pa.array(np.round(sc, round_digits)),
        "psi_term": pa.array(np.round((sr - sc) * np.log(sr / sc),
                                      round_digits)),
    }))


def dp_group_counts(
    ds: ray.data.Dataset,
    group_col: str,
    *,
    epsilon: float = 1.0,
    num_buckets: int = 64,
    round_digits: int = 6,
    out_col: str = "dp_count",
) -> ray.data.Dataset:
    """Laplace-mechanism noised per-group counts (the standard
    differential-privacy release for COUNT queries; sensitivity 1, so
    noise scale b = 1/epsilon). The noise stream here is DETERMINISTIC —
    u = multiplicative-hash(group key) mapped to (0,1), then the inverse-
    CDF Laplace transform ``-b * sign(u - 0.5) * ln(1 - 2|u - 0.5|)`` —
    which makes pipelines reproducible and the op SQL-mirrorable. For an
    actual privacy guarantee the noise must be secret: swap the hash for
    a real RNG at deployment; the mechanism and calibration are
    unchanged. Integer group keys only (the hash contract).

    Scale shape: per-batch (key, count) partials, ONE key exchange of
    distinct keys, noise applied per bucket. Null group keys are excluded
    on both sides (the grouped-op contract).
    """

    def partial(t) -> pd.DataFrame:
        # null keys dropped in ARROW: a pandas conversion of a nulled
        # int column silently coerces int64 -> float64 (defect class 3)
        d = t.drop_null().to_pandas()
        return (
            d.groupby(group_col, sort=False, observed=True)
            .size().rename("_c").reset_index()
        )

    parts = ds.select_columns([group_col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    b = 1.0 / float(epsilon)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        c = (
            df.drop(columns=[BUCKET_COL])
            .groupby(group_col, sort=True, observed=True)["_c"]
            .sum().reset_index()
        )
        keys = c[group_col].to_numpy()
        h = (keys.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(4294967296)
        u = (h.astype(np.float64) + 0.5) / 4294967296.0
        lap = -b * np.sign(u - 0.5) * np.log(1.0 - 2.0 * np.abs(u - 0.5))
        return pd.DataFrame({
            group_col: keys,
            out_col: np.round(c["_c"].to_numpy().astype(np.float64) + lap,
                              round_digits),
        })

    return bucketed_map_groups(
        add_bucket_column(parts, group_col, num_buckets),
        finalize, num_buckets=num_buckets, batch_format="pandas",
    )


def anova_f(
    ds: ray.data.Dataset,
    group_col: str,
    cat_col: str,
    value_col: str,
    *,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Per-group one-way ANOVA across the categories of ``cat_col``:
    F statistic and eta² (variance explained by the factor) — the
    k-sample mean-shift test completing the welch_t (2-sample t) /
    ks_test / mann_whitney drift family, and the seasonality-strength /
    feature-relevance screen (how much of a value's variance a
    categorical factor explains). Rows with a NULL group, category or
    value are excluded on both sides; groups need ≥ 2 categories and
    N > k. F is NULL when the within-group sum of squares is 0, eta²
    NULL when the total sum of squares is 0.

    Scale shape: each block collapses to (group, category, n, Σx, Σx²)
    moment partials merged driver-side (groups × categories × blocks
    rows; route through the bucket exchange for ID-grade group
    cardinalities). The closed form — ``ssb = Σ_c s_c²/n_c − S²/N``,
    ``sst = ΣΣx² − S²/N`` — mirrors the oracle's explicit sums term for
    term (never variance built-ins).
    """
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[group_col].notna() & df[cat_col].notna()
               & df[value_col].notna()]
        x = d[value_col].astype(np.float64)
        out = pd.DataFrame({
            group_col: d[group_col], cat_col: d[cat_col],
            "_n": np.int64(1), "_sx": x, "_sxx": x * x,
        })
        return out.groupby([group_col, cat_col], sort=False, observed=True)[
            ["_n", "_sx", "_sxx"]].sum().reset_index()

    m = (
        ds.select_columns([group_col, cat_col, value_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
        .groupby([group_col, cat_col], sort=True, observed=True)[
            ["_n", "_sx", "_sxx"]].sum().reset_index()
    )
    n_c = m["_n"].to_numpy(dtype=np.float64)
    s_c = m["_sx"].to_numpy(dtype=np.float64)
    m["_sb"] = s_c * s_c / n_c
    g = m.groupby(group_col, sort=True, observed=True).agg(
        k=("_n", "size"), nn=("_n", "sum"), stot=("_sx", "sum"),
        sstot=("_sxx", "sum"), sb=("_sb", "sum"),
    )
    g = g[(g["k"] >= 2) & (g["nn"] > g["k"])]
    k = g["k"].to_numpy(dtype=np.float64)
    nn = g["nn"].to_numpy(dtype=np.float64)
    stot = g["stot"].to_numpy(dtype=np.float64)
    sstot = g["sstot"].to_numpy(dtype=np.float64)
    sb = g["sb"].to_numpy(dtype=np.float64)
    corr = stot * stot / nn
    ssb = sb - corr
    sst = sstot - corr
    ssw = sst - ssb
    with np.errstate(invalid="ignore", divide="ignore"):
        f = np.where(ssw > 0, (ssb / (k - 1.0)) / (ssw / (nn - k)), np.nan)
        eta = np.where(sst > 0, ssb / sst, np.nan)
    if round_digits is not None:
        f, eta = np.round(f, round_digits), np.round(eta, round_digits)
    return ray.data.from_arrow(pa.table({
        group_col: pa.array(g.index.to_numpy()),
        "k": pa.array(g["k"].to_numpy().astype(np.int64)),
        "n": pa.array(g["nn"].to_numpy().astype(np.int64)),
        "f_stat": pa.array(f, pa.float64()),
        "eta_sq": pa.array(eta, pa.float64()),
    }))


def k_anonymity(
    ds: ray.data.Dataset,
    quasi_cols: Sequence[str],
    *,
    k: int = 5,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """k-anonymity audit — dp_group_counts' re-identification sibling:
    every quasi-identifier equivalence class with fewer than ``k``
    members, i.e. the rows a release at this granularity would expose.
    Output: (quasi columns..., n) for risky classes only. Rows with any
    NULL quasi value are excluded on both sides (the grouped-op null-key
    contract).

    Scale shape: per-batch (combo, count) partials — the exchange moves
    class cardinalities, never rows; ONE hash on the first quasi column
    (equal combos share it) co-locates each class exactly.
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    quasi_cols = list(quasi_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=quasi_cols)
        g = d.groupby(quasi_cols, sort=False, observed=True).size()
        out = g.rename("_n").reset_index()
        return out

    parts = ds.select_columns(quasi_cols).map_batches(
        partial, batch_size=None, batch_format="pandas"
    )
    parts = add_bucket_column(parts, quasi_cols[0], num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        g = df.groupby(quasi_cols, sort=False, observed=True)["_n"].sum()
        out = g[g < k].rename("n").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    return bucketed_map_groups(
        parts, final, num_buckets=num_buckets, batch_format="pandas"
    )


def benford(
    ds: ray.data.Dataset,
    value_col: str,
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Benford's-law first-digit audit — the classic fabricated-numbers /
    pipeline-corruption screen for positive magnitude columns. Output:
    one row per leading digit 1-9 with the observed count, the Benford
    expectation ``n·log10(1 + 1/d)`` and the χ² contribution.

    First digit = ``floor(v / 10^floor(log10(v)))`` over rows with
    ``v > 0`` — the same libm expression the oracle evaluates, so both
    engines agree bit-for-bit on digit assignment. Per-batch 9-bin
    bincount partials; the driver sums 9 integers. Zero shuffle.
    """
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v) & (v > 0)]
        if len(v) == 0:
            return pa.table({"digit": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        mag = np.floor(np.log10(v))
        d = np.floor(v / np.power(10.0, mag)).astype(np.int64)
        # pathological float rounding can yield digit 0 or 10; the oracle
        # keeps such rows in the total but outside digits 1-9 — mirror
        # that exactly (emit the full 0..10 histogram, never clip)
        counts = np.bincount(np.clip(d, 0, 10), minlength=11)
        return pa.table({
            "digit": pa.array(np.arange(0, 11, dtype=np.int64)),
            "c": pa.array(counts.astype(np.int64)),
        })

    parts = ds.select_columns([value_col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    c = parts.groupby("digit", sort=True)["c"].sum()
    n = float(c.sum())  # ALL v > 0 rows, incl. any 0/10-digit pathologies
    c = c[(c.index >= 1) & (c.index <= 9)]
    obs = np.zeros(9, dtype=np.int64)
    obs[c.index.to_numpy() - 1] = c.to_numpy()
    digits = np.arange(1, 10, dtype=np.float64)
    exp = n * np.log10(1.0 + 1.0 / digits)
    with np.errstate(invalid="ignore", divide="ignore"):
        contrib = np.where(exp > 0, (obs - exp) ** 2 / exp, np.nan)
    return ray.data.from_arrow(pa.table({
        "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
        "n_obs": pa.array(obs),
        "expected": pa.array(np.round(exp, round_digits)),
        "chi2_term": pa.array(np.round(contrib, round_digits)),
    }))


def theil_sen(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    *,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-group Theil-Sen robust trend: the MEDIAN of all pairwise slopes
    ``(y_j − y_i)/(x_j − x_i)`` over pairs with ``x_i < x_j`` — the
    outlier-resistant companion to :func:`group_linear_fit`'s OLS (a
    single corrupted point can swing OLS arbitrarily; Theil-Sen has a
    29% breakdown point). Rows with NULL group/x/y drop on both sides.
    Output: (group, n_pairs, ts_slope).

    Scale note: pairwise slopes are Θ(n²) per group BY DEFINITION — this
    is the exact estimator, intended for bounded per-group row counts
    (filter to the entities of interest first, as the contract query
    does); use group_linear_fit for the unbounded-n screen. One group
    exchange; the kernel is a lexsort + the shared triangular
    ``pair_indices`` expansion, and medians use the same linear
    interpolation as SQL ``quantile_cont``.
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column
    from featherstore_ray.stages.dedup import pair_indices

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.dropna(subset=[group_col, x_col, y_col])

    parts = ds.select_columns([group_col, x_col, y_col]).map_batches(
        pre, batch_size=None, batch_format="pandas"
    )
    parts = add_bucket_column(parts, group_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({
                group_col: df[group_col],
                "n_pairs": pd.Series([], dtype=np.int64),
                "ts_slope": pd.Series([], dtype=np.float64),
            })
        codes, uniques = pd.factorize(df[group_col], sort=True)
        x = df[x_col].to_numpy(dtype=np.float64)
        y = df[y_col].to_numpy(dtype=np.float64)
        order = np.lexsort((x, codes))
        codes, x, y = codes[order], x[order], y[order]
        ai, bi = pair_indices(codes)
        dx = x[bi] - x[ai]
        ok = dx > 0  # equal-x pairs are excluded (same contract as SQL)
        ai, bi, dx = ai[ok], bi[ok], dx[ok]
        slopes = (y[bi] - y[ai]) / dx
        g = pd.DataFrame({"_g": codes[ai], "_s": slopes})
        agg = g.groupby("_g", sort=True)["_s"].agg(["size", "median"])
        return pd.DataFrame({
            group_col: uniques[agg.index.to_numpy()],
            "n_pairs": agg["size"].to_numpy().astype(np.int64),
            "ts_slope": np.round(agg["median"].to_numpy(), round_digits),
        })

    return bucketed_map_groups(
        parts, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def common_paths(
    ds: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    gap=None,  # required; None raises ValueError (kept keyword for API shape)
    top_n: int = 20,
    max_len: int = 20,
    sep: str = ">",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Top-N most frequent session journeys — the product-analytics "top
    user paths" report: sessionize each entity's stream (new session
    strictly ``> gap``, the engine's sessionize contract), render each
    session's event types in ``(ts, tiebreak)`` order as a ``sep``-joined
    path capped at the FIRST ``max_len`` events (mandatory at scale, like
    :func:`event_sequence`), count identical paths corpus-wide, keep the
    global top-N (ties break by path ascending). Rows with a NULL
    entity/ts/type drop BEFORE sessionization on both sides (SQL
    ``string_agg`` silently skips NULLs — pandas ``str.join`` raises, so
    the filter is part of the contract).

    Scale shape: one entity exchange builds per-session paths and
    collapses them to (path, count) partials inside the bucket; the
    exchange that follows moves path cardinalities through the shared
    exact bucketed top-N (a path's total lives entirely in its hash
    bucket).
    """
    import datetime

    import pyarrow as pa

    from featherstore_ray.stages.text import _bucketed_topn

    if gap is None:
        raise ValueError("gap is required (session boundary threshold)")
    if isinstance(gap, datetime.timedelta):
        gap_us = int(gap.total_seconds() * 1_000_000)
    else:
        gap_us = int(gap)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[entity_col, ts_col, type_col])
        if df.empty:
            return pd.DataFrame({
                "path": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            })
        df = df.sort_values([entity_col, ts_col, tiebreak_col],
                            kind="stable")
        ent = df[entity_col].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_ent = np.empty(len(df), dtype=bool)
        new_ent[0] = True
        new_ent[1:] = ent[1:] != ent[:-1]
        brk = new_ent | (np.diff(ts, prepend=ts[0]) > gap_us)
        sess = np.cumsum(brk)  # globally unique within the bucket
        d = pd.DataFrame({
            "_s": sess, "_t": df[type_col].to_numpy(),
        })
        head = d.groupby("_s", sort=False).head(max_len)
        paths = head.groupby("_s", sort=False)["_t"].agg(sep.join)
        counts = paths.value_counts()
        return pd.DataFrame({
            "path": counts.index.to_numpy(),
            "n": counts.to_numpy().astype(np.int64),
        })

    bucketed = add_bucket_column(
        ds.select_columns([entity_col, ts_col, type_col, tiebreak_col]),
        entity_col, num_buckets,
    )
    partials = bucketed_map_groups(
        bucketed,
        lambda df: kernel(df.drop(columns=[BUCKET_COL])),
        num_buckets=num_buckets, batch_format="pandas",
    )
    return _bucketed_topn(
        partials, top_n=top_n, num_buckets=num_buckets, key_col="path"
    )


def wasserstein(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    label_col: str,
    label_a,
    label_b,
    *,
    out_col: str = "w1",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group 1-D Wasserstein-1 (earth mover's) distance between the
    value distributions of two labels — the magnitude-sensitive drift
    metric next to :func:`ks_test`'s sup-norm: ``W1 = Σ_i |F_a(x_i) −
    F_b(x_i)|·(x_{i+1} − x_i)`` over the pooled distinct sample points
    (exact for empirical distributions). KS answers "did it shift?";
    W1 answers "by how much, in value units". Groups missing either
    label drop; filters and ECDF tie-pooling match ks_test exactly.

    Same scale shape as ks_test: streaming 3-column filter, ONE group
    exchange, lexsort + cumsum + boundary-gather kernel, no row loop.
    """

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[label_col].isin([label_a, label_b])
                & df[value_col].notna() & df[group_col].notna()]
        return pd.DataFrame({
            group_col: df[group_col],
            "_v": df[value_col].astype(np.float64),
            "_ia": (df[label_col] == label_a).to_numpy(),
        })

    slim = ds.map_batches(pick, batch_size=None, batch_format="pandas")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, "_v"], kind="mergesort")
        g = df[group_col].to_numpy()
        v = df["_v"].to_numpy()
        ia = df["_ia"].to_numpy()
        n = len(df)
        if n == 0:
            return pd.DataFrame({group_col: df[group_col],
                                 out_col: pd.Series(dtype="float64")})
        new_g = np.empty(n, dtype=bool)
        new_g[0] = True
        new_g[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.append(starts, n))
        cum_a = np.cumsum(ia.astype(np.int64))
        cum_b = np.cumsum((~ia).astype(np.int64))
        base_a = np.repeat(cum_a[starts] - ia[starts], sizes)
        base_b = np.repeat(cum_b[starts] - (~ia[starts]), sizes)
        ca = (cum_a - base_a).astype(np.float64)
        cb = (cum_b - base_b).astype(np.float64)
        gid = np.cumsum(new_g) - 1
        na = np.bincount(gid, weights=ia)[gid]
        nb = sizes[gid] - na
        last = np.empty(n, dtype=bool)
        last[-1] = True
        last[:-1] = (g[1:] != g[:-1]) | (v[1:] != v[:-1])
        ok = last & (na > 0) & (nb > 0)
        g_ok, v_ok = g[ok], v[ok]
        diff = np.abs(ca[ok] / na[ok] - cb[ok] / nb[ok])
        if len(g_ok) == 0:
            return pd.DataFrame({group_col: g_ok,
                                 out_col: pd.Series(dtype="float64")})
        same_next = g_ok[1:] == g_ok[:-1]  # each group's last point has
        # no gap (F_a = F_b = 1 there anyway)
        contrib = diff[:-1][same_next] * (v_ok[1:] - v_ok[:-1])[same_next]
        out = (pd.DataFrame({group_col: g_ok[:-1][same_next],
                             out_col: contrib})
               .groupby(group_col, sort=True, observed=True)[out_col]
               .sum().reset_index())
        if round_digits is not None:
            out[out_col] = np.round(out[out_col], round_digits)
        return out

    return bucketed_map_groups(
        add_bucket_column(slim, group_col, num_buckets),
        lambda df: kernel(df.drop(columns=[BUCKET_COL])),
        num_buckets=num_buckets, batch_format="pandas",
    )


def item_similarity(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    item_col: str,
    k: int = 5,
    min_count: int = 1,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Item-item collaborative-filtering neighbors ("also-bought"): for
    every item, the top-k co-occurring items by cosine over basket
    incidence — ``cos(a,b) = n_ab / sqrt(n_a · n_b)`` with ``n_x`` =
    baskets containing x and ``n_ab`` = baskets containing both (set
    semantics, like :func:`co_occurrence`, which supplies the pair
    counts). Ties on the rounded score break by ascending neighbor id.
    Output: (item, neighbor, n_co, cosine) — each pair serves BOTH
    items' neighbor lists.

    Scale shape: pair counts ride co_occurrence's two exchanges; item
    incidence counts are (item, partial) rows merged driver-side and
    broadcast into the scoring closure (item-catalog-bounded — route
    them through the bucket exchange instead for 1e8-item catalogs);
    the final top-k is one hash(item) exchange over symmetrized pair
    rows, never baskets.
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    pairs = co_occurrence(
        ds, group_col=group_col, item_col=item_col, min_count=min_count,
        num_buckets=num_buckets,
    )

    # incidence counts must dedupe (group, item) across BATCH boundaries
    # (a basket split over two blocks would double count): co-locate each
    # group with one hash(group) exchange, distinct inside the bucket,
    # then sum the per-bucket item partials driver-side (each group lives
    # in exactly one bucket, so partials are exact and disjoint per group)
    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[group_col, item_col]].drop_duplicates()
        g = d.groupby(item_col, sort=False).size()
        return pd.DataFrame({"_i": g.index.to_numpy(),
                             "_c": g.to_numpy().astype(np.int64)})

    proj = ds.select_columns([group_col, item_col]).map_batches(
        lambda t: t.drop_null(), batch_size=None,
        batch_format="pyarrow", zero_copy_batch=True,
    )
    inc = (
        bucketed_map_groups(
            add_bucket_column(proj, group_col, num_buckets),
            lambda df: bucket_counts(df.drop(columns=[BUCKET_COL])),
            num_buckets=num_buckets, batch_format="pandas",
        ).to_pandas()
        .groupby("_i")["_c"].sum()
    )
    inc_map = {k_: int(v) for k_, v in inc.items()}

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "item": t["a"].slice(0, 0), "neighbor": t["b"].slice(0, 0),
            "n_co": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        n_int = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = n_int.astype(np.float64)
        # vectorized hash lookups (a Python per-pair loop would be the
        # hot-path row loop the house rules ban)
        ca = pd.Series(a).map(inc_map).to_numpy(dtype=np.float64)
        cb = pd.Series(b).map(inc_map).to_numpy(dtype=np.float64)
        cos = np.round(n / np.sqrt(ca * cb), round_digits)
        it_type = t.schema.field("a").type
        return pa.table({
            "item": pa.array(np.concatenate([a, b]), it_type),
            "neighbor": pa.array(np.concatenate([b, a]), it_type),
            "n_co": pa.array(np.concatenate([n_int, n_int])),
            "cosine": pa.array(np.concatenate([cos, cos])),
        })

    sym = pairs.map_batches(
        score, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    sym = add_bucket_column(sym, "item", num_buckets)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        return (
            df.sort_values(["item", "cosine", "neighbor"],
                           ascending=[True, False, True], kind="stable")
            .groupby("item", sort=False).head(k).reset_index(drop=True)
        )

    return bucketed_map_groups(
        sym, topk, num_buckets=num_buckets, batch_format="pandas"
    )


def transition_times(
    ds: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Journey timing: for every consecutive event-type transition
    (from → to) within an entity's (ts, tiebreak)-ordered stream, the
    count, median and mean gap in seconds — the "how long between cart
    and purchase" report that :func:`transitions` (counts only) and
    :func:`funnel` don't answer. Rows with a NULL entity/ts/type are
    filtered BEFORE pairing (the seq_entropy contract: they neither form
    nor break a transition).

    Scale shape: exchange 1 on hash(entity) pairs each stream with a
    shifted compare and emits (from, to, gap) rows; exchange 2 on
    hash(from) pools each transition's gaps for the exact
    quantile_cont-interpolated median (medians don't partial-merge;
    type-pair cardinality is tiny, gap rows ≤ event rows).
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.dropna(subset=[entity_col, ts_col, type_col])

    slim = ds.select_columns(
        [entity_col, ts_col, type_col, tiebreak_col]
    ).map_batches(pre, batch_size=None, batch_format="pandas")
    slim = add_bucket_column(slim, entity_col, num_buckets)

    def pair(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({
                "from_type": pd.Series([], dtype=object),
                "to_type": pd.Series([], dtype=object),
                "_gap": pd.Series([], dtype=np.int64),
            })
        d = df.sort_values([entity_col, ts_col, tiebreak_col],
                           kind="stable")
        ent = d[entity_col].to_numpy()
        ts = d[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        typ = d[type_col].to_numpy()
        same = ent[1:] == ent[:-1]
        return pd.DataFrame({
            "from_type": typ[:-1][same],
            "to_type": typ[1:][same],
            "_gap": (ts[1:] - ts[:-1])[same],
        })

    gaps = bucketed_map_groups(
        slim, pair, num_buckets=num_buckets, batch_format="pandas"
    )
    gaps = add_bucket_column(gaps, "from_type", num_buckets)

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        g = df.groupby(["from_type", "to_type"], sort=True)["_gap"]
        med = g.quantile(0.5, interpolation="linear")
        cnt = g.size()
        tot = g.sum()
        out = pd.DataFrame({
            "from_type": [i[0] for i in cnt.index],
            "to_type": [i[1] for i in cnt.index],
            "n": cnt.to_numpy().astype(np.int64),
            "median_gap_sec": np.round(
                med.to_numpy() / 1000000.0, round_digits),
            "mean_gap_sec": np.round(
                (tot.to_numpy() / cnt.to_numpy()) / 1000000.0,
                round_digits),
        })
        return out

    return bucketed_map_groups(
        gaps, agg, num_buckets=num_buckets, batch_format="pandas"
    )


def _midranks(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Mid-ranks (1-based, ties averaged) of ``v`` within contiguous
    groups ``g`` for (g, v)-sorted input rows — the mann_whitney
    run-length pattern (that kernel keeps its own inline copy because it
    also consumes the tie-run sizes for the t³−t correction). Returns
    ranks in row order of the sorted input."""
    n = len(g)
    new_g = np.empty(n, dtype=bool)
    new_g[0] = True
    new_g[1:] = g[1:] != g[:-1]
    gstarts = np.flatnonzero(new_g)
    gsizes = np.diff(np.append(gstarts, n))
    rwg = np.arange(n) - np.repeat(gstarts, gsizes)
    new_run = new_g.copy()
    new_run[1:] |= v[1:] != v[:-1]
    rstarts = np.flatnonzero(new_run)
    rsizes = np.diff(np.append(rstarts, n))
    return np.repeat(rwg[rstarts] + 1.0 + (rsizes - 1) / 2.0, rsizes)


def spearman(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    *,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-group Spearman rank correlation — :func:`group_corr`'s robust
    sibling: Pearson over mid-ranks (ties averaged), so monotone but
    non-linear dependence registers and single outliers can't swing it.
    Rows with a NULL group/x/y drop on both sides; groups need n ≥ 2
    and non-degenerate rank variance. Output: (group, n, spearman).

    Mid-ranks are quarter-integers and all moment sums stay below 2^53
    for realistic group sizes, so the explicit-sum closed form is EXACT
    in float64 on both engines — no summation-order tolerance needed.
    ONE group exchange; two run-length mid-rank passes + bincount
    moments, no row loop.
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[group_col, x_col, y_col])
        return pd.DataFrame({
            group_col: d[group_col],
            "_x": d[x_col].astype(np.float64),
            "_y": d[y_col].astype(np.float64),
        })

    slim = ds.select_columns([group_col, x_col, y_col]).map_batches(
        pre, batch_size=None, batch_format="pandas"
    )
    slim = add_bucket_column(slim, group_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({
                group_col: df[group_col],
                "n": pd.Series([], dtype=np.int64),
                "spearman": pd.Series([], dtype=np.float64),
            })
        codes, uniques = pd.factorize(df[group_col], sort=True)
        x = df["_x"].to_numpy()
        y = df["_y"].to_numpy()
        ox = np.lexsort((x, codes))
        rx = np.empty(len(x))
        rx[ox] = _midranks(codes[ox], x[ox])
        oy = np.lexsort((y, codes))
        ry = np.empty(len(y))
        ry[oy] = _midranks(codes[oy], y[oy])
        k = codes.max() + 1
        n = np.bincount(codes, minlength=k).astype(np.float64)
        sx = np.bincount(codes, weights=rx, minlength=k)
        sy = np.bincount(codes, weights=ry, minlength=k)
        sxx = np.bincount(codes, weights=rx * rx, minlength=k)
        syy = np.bincount(codes, weights=ry * ry, minlength=k)
        sxy = np.bincount(codes, weights=rx * ry, minlength=k)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        ok = (n >= 2) & (vx > 0) & (vy > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            rho = (n * sxy - sx * sy) / np.sqrt(vx * vy)
        return pd.DataFrame({
            group_col: uniques[np.flatnonzero(ok)],
            "n": n[ok].astype(np.int64),
            "spearman": np.round(rho[ok], round_digits),
        })

    return bucketed_map_groups(
        slim, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def trimmed_mean(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    alpha: float = 0.1,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-group α-trimmed mean: drop the ``floor(α·n)`` smallest and
    largest values, average the middle — the robust location between the
    mean (α=0) and the median (α→0.5), with an exact count-based trim
    that SQL mirrors via ROW_NUMBER bounds (tied values at the cut are
    trimmed by rank, which cannot change the average — equals trim by
    value). NULL group/value rows drop; groups where the trim empties
    the middle are dropped (n − 2·floor(α·n) < 1).

    One group exchange; lexsort + segmented prefix-sum kernel (the
    trimmed sum is two cumsum gathers), no row loop.
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    if not 0.0 <= alpha < 0.5:
        raise ValueError(f"alpha must be in [0, 0.5), got {alpha}")

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[group_col, value_col])
        return pd.DataFrame({group_col: d[group_col],
                             "_v": d[value_col].astype(np.float64)})

    slim = ds.select_columns([group_col, value_col]).map_batches(
        pre, batch_size=None, batch_format="pandas"
    )
    slim = add_bucket_column(slim, group_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({
                group_col: df[group_col],
                "n": pd.Series([], dtype=np.int64),
                "trimmed_mean": pd.Series([], dtype=np.float64),
            })
        codes, uniques = pd.factorize(df[group_col], sort=True)
        v = df["_v"].to_numpy()
        order = np.lexsort((v, codes))
        codes, v = codes[order], v[order]
        k = codes.max() + 1
        n = np.bincount(codes, minlength=k)
        starts = np.concatenate(([0], np.cumsum(n)[:-1]))
        trim = np.floor(alpha * n).astype(np.int64)
        keep = n - 2 * trim
        ok = keep >= 1
        # trimmed sum = prefix[start + n - trim] - prefix[start + trim]
        prefix = np.concatenate(([0.0], np.cumsum(v)))
        hi = prefix[starts + n - trim]
        lo = prefix[starts + trim]
        with np.errstate(invalid="ignore"):
            tm = (hi - lo) / keep
        return pd.DataFrame({
            group_col: uniques[np.flatnonzero(ok)],
            "n": n[ok].astype(np.int64),
            "trimmed_mean": np.round(tm[ok], round_digits),
        })

    return bucketed_map_groups(
        slim, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def weighted_median(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    weight_col: str,
    *,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-group weighted (lower) median: the smallest value whose
    tie-pooled cumulative weight reaches half the group's total — the
    location statistic for sampling-weighted / importance-weighted data
    that plain quantiles get wrong. No interpolation (the LOWER weighted
    median), so the result is always an observed value and the oracle is
    an exact ``min(v) WHERE cum_w >= total/2`` mirror. Rows with a NULL
    group/value or a NULL/non-positive weight drop on both sides.
    Integer-valued weights keep every cumulative exactly representable,
    so the half-total comparison cannot float-flip across engines.

    One group exchange; lexsort + run-length pooled cumsum kernel.
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[group_col, value_col, weight_col])
        d = d[d[weight_col] > 0]
        return pd.DataFrame({
            group_col: d[group_col],
            "_v": d[value_col].astype(np.float64),
            "_w": d[weight_col].astype(np.float64),
        })

    slim = ds.select_columns([group_col, value_col, weight_col]).map_batches(
        pre, batch_size=None, batch_format="pandas"
    )
    slim = add_bucket_column(slim, group_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({
                group_col: df[group_col],
                "w_median": pd.Series([], dtype=np.float64),
            })
        codes, uniques = pd.factorize(df[group_col], sort=True)
        v = df["_v"].to_numpy()
        w = df["_w"].to_numpy()
        order = np.lexsort((v, codes))
        codes, v, w = codes[order], v[order], w[order]
        n = len(codes)
        new_g = np.empty(n, dtype=bool)
        new_g[0] = True
        new_g[1:] = codes[1:] != codes[:-1]
        gstarts = np.flatnonzero(new_g)
        gsizes = np.diff(np.append(gstarts, n))
        cw = np.cumsum(w)
        base = np.repeat((cw - w)[gstarts], gsizes)
        cw = cw - base  # within-group running weight
        total = np.repeat(cw[np.append(gstarts[1:], n) - 1], gsizes)
        # pool ties: each row's cum weight becomes its tie-run's LAST
        last_of_run = np.empty(n, dtype=bool)
        last_of_run[-1] = True
        last_of_run[:-1] = (codes[1:] != codes[:-1]) | (v[1:] != v[:-1])
        run_id = np.cumsum(np.concatenate(
            ([True], last_of_run[:-1]))) - 1
        pooled = cw[np.flatnonzero(last_of_run)][run_id]
        hit = pooled >= total / 2.0
        # first hit row per group = the weighted median's value
        first_hit = hit & (np.cumsum(hit)
                           - np.repeat(np.cumsum(hit)[gstarts] - hit[gstarts],
                                       gsizes) == 1)
        return pd.DataFrame({
            group_col: uniques[codes[first_hit]],
            "w_median": v[first_hit],
        })

    return bucketed_map_groups(
        slim, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def auc(
    ds: ray.data.Dataset,
    group_col: str,
    score_col: str,
    label_col: str,
    positive_label,
    negative_label,
    *,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-group ROC AUC of a score separating two labels — the
    rank-based model-evaluation statistic (equals the probability a
    random positive outscores a random negative, ties at half credit):
    ``AUC = (R₊ − n₊(n₊+1)/2) / (n₊·n₋)`` over tie-averaged mid-ranks —
    exactly the Mann-Whitney U normalized, computed by the same
    run-length kernel. Groups missing either label drop; NULL
    group/score rows drop. Mid-ranks are half-integers, so every sum is
    exact in float64 — no cross-engine tolerance needed.

    One group exchange; lexsort + shared ``_midranks`` + bincount.
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[label_col].isin([positive_label, negative_label])
               & df[score_col].notna() & df[group_col].notna()]
        return pd.DataFrame({
            group_col: d[group_col],
            "_v": d[score_col].astype(np.float64),
            "_ip": (d[label_col] == positive_label).to_numpy(),
        })

    slim = ds.select_columns([group_col, score_col, label_col]).map_batches(
        pick, batch_size=None, batch_format="pandas"
    )
    slim = add_bucket_column(slim, group_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            [group_col, "_v"], kind="mergesort")
        if df.empty:
            return pd.DataFrame({
                group_col: df[group_col],
                "n_pos": pd.Series([], dtype=np.int64),
                "n_neg": pd.Series([], dtype=np.int64),
                "auc": pd.Series([], dtype=np.float64),
            })
        g = df[group_col].to_numpy()
        v = df["_v"].to_numpy()
        ip = df["_ip"].to_numpy()
        codes, uniques = pd.factorize(pd.Series(g), sort=False)
        midrank = _midranks(codes, v)
        k = codes.max() + 1
        n_pos = np.bincount(codes, weights=ip.astype(np.float64),
                            minlength=k)
        n_tot = np.bincount(codes, minlength=k).astype(np.float64)
        n_neg = n_tot - n_pos
        r_pos = np.bincount(codes, weights=np.where(ip, midrank, 0.0),
                            minlength=k)
        ok = (n_pos > 0) & (n_neg > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            a = (r_pos - n_pos * (n_pos + 1.0) / 2.0) / (n_pos * n_neg)
        out = pd.DataFrame({
            group_col: uniques[np.flatnonzero(ok)],
            "n_pos": n_pos[ok].astype(np.int64),
            "n_neg": n_neg[ok].astype(np.int64),
            "auc": np.round(a[ok], round_digits),
        })
        return out.sort_values(group_col).reset_index(drop=True)

    return bucketed_map_groups(
        slim, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def calibration_bins(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    positive_label,
    *,
    n_bins: int = 10,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Reliability-diagram bins + Brier decomposition inputs — auc's
    calibration-side companion: scores in [0, 1] bucket into
    ``floor(score·B)`` bins (clamped to B−1) and each bin reports its
    count, mean score, positive fraction and mean squared error
    (the Brier term). A well-calibrated scorer has ``avg_score ≈
    frac_pos`` per bin. NULL score/label rows drop.

    Zero shuffle: every block collapses to (bin, n, Σscore, Σy, Σ(s−y)²)
    partials; the driver merges B rows.
    """
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[score_col].notna() & df[label_col].notna()]
        s = d[score_col].to_numpy(dtype=np.float64)
        y = (d[label_col] == positive_label).to_numpy().astype(np.float64)
        b = np.minimum(np.floor(s * n_bins).astype(np.int64), n_bins - 1)
        out = pd.DataFrame({
            "bin": b, "_n": np.int64(1), "_s": s, "_y": y,
            "_sq": (s - y) * (s - y),
        })
        return out.groupby("bin", sort=False)[
            ["_n", "_s", "_y", "_sq"]].sum().reset_index()

    m = (
        ds.select_columns([score_col, label_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
        .groupby("bin", sort=True)[["_n", "_s", "_y", "_sq"]]
        .sum().reset_index()
    )
    n = m["_n"].to_numpy(dtype=np.float64)
    return ray.data.from_arrow(pa.table({
        "bin": pa.array(m["bin"].to_numpy().astype(np.int64)),
        "n": pa.array(m["_n"].to_numpy().astype(np.int64)),
        "avg_score": pa.array(np.round(m["_s"].to_numpy() / n,
                                       round_digits)),
        "frac_pos": pa.array(np.round(m["_y"].to_numpy() / n,
                                      round_digits)),
        "brier": pa.array(np.round(m["_sq"].to_numpy() / n, round_digits)),
    }))


def ndcg(
    ds: ray.data.Dataset,
    group_col: str,
    score_col: str,
    gain_col: str,
    tiebreak_col: str,
    *,
    k: int = 10,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-group NDCG@k — the graded ranking-quality metric completing
    the eval family (auc = binary ranking, calibration_bins = score
    quality): ``DCG@k = Σ_{i≤k} gain_i / log2(i+1)`` over rows ordered
    by (score DESC, tiebreak ASC) — the tiebreak makes the score→rank
    map deterministic and SQL-mirrorable — normalized by the ideal DCG
    (gain-DESC order; equal gains make its tie order irrelevant). NULL
    when the ideal DCG is 0 (no positive gain in the top-k). NULL
    group/score/gain rows drop on both sides.

    One group exchange; two lexsorts + a masked cumulative — no loops.
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[group_col, score_col, gain_col])
        return pd.DataFrame({
            group_col: d[group_col],
            "_s": d[score_col].astype(np.float64),
            "_g": d[gain_col].astype(np.float64),
            "_tb": d[tiebreak_col],
        })

    slim = ds.select_columns(
        [group_col, score_col, gain_col, tiebreak_col]
    ).map_batches(pre, batch_size=None, batch_format="pandas")
    slim = add_bucket_column(slim, group_col, num_buckets)

    def dcg_at_k(codes: np.ndarray, gains: np.ndarray) -> np.ndarray:
        """Σ gain/log2(pos+1) over the first k rows of each contiguous
        group (rows already in rank order)."""
        n = len(codes)
        new_g = np.empty(n, dtype=bool)
        new_g[0] = True
        new_g[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.append(starts, n))
        pos = np.arange(n) - np.repeat(starts, sizes) + 1
        term = np.where(pos <= k, gains / np.log2(pos + 1.0), 0.0)
        ngroups = codes.max() + 1
        return np.bincount(codes, weights=term, minlength=ngroups)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({
                group_col: df[group_col],
                "ndcg": pd.Series([], dtype=np.float64),
            })
        codes, uniques = pd.factorize(df[group_col], sort=True)
        s = df["_s"].to_numpy()
        g = df["_g"].to_numpy()
        tb = df["_tb"].to_numpy()
        o1 = np.lexsort((tb, -s, codes))
        dcg = dcg_at_k(codes[o1], g[o1])
        o2 = np.lexsort((tb, -g, codes))
        idcg = dcg_at_k(codes[o2], g[o2])
        with np.errstate(invalid="ignore", divide="ignore"):
            val = np.where(idcg > 0, dcg / idcg, np.nan)
        return pd.DataFrame({
            group_col: uniques,
            "ndcg": np.round(val, round_digits),
        })

    return bucketed_map_groups(
        slim, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def top_items_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    item_col: str,
    k: int,
    *,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Exact per-group frequency top-k ("top items per region"):
    :func:`~featherstore_ray.stages.latest.top_n_per_group` ranks rows
    by a VALUE column; this ranks ITEMS by occurrence count — ties on
    count break by item ascending. NULL group/item rows drop on both
    sides. Output: (group, item, n) with at most k rows per group. For
    billion-distinct item sets per group use the Misra-Gries sketch
    family instead.

    Scale shape: per-batch (group, item, count) partials — the exchange
    carries pair cardinalities, never rows; ONE hash(group) exchange,
    per-bucket sum + sort + head.
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[group_col, item_col])
        g = d.groupby([group_col, item_col], sort=False,
                      observed=True).size()
        return g.rename("_n").reset_index()

    parts = ds.select_columns([group_col, item_col]).map_batches(
        partial, batch_size=None, batch_format="pandas"
    )
    parts = add_bucket_column(parts, group_col, num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        g = df.groupby([group_col, item_col], sort=False,
                       observed=True)["_n"].sum().reset_index()
        out = (
            g.sort_values([group_col, "_n", item_col],
                          ascending=[True, False, True], kind="stable")
            .groupby(group_col, sort=False).head(k)
        )
        out = out.rename(columns={"_n": "n"}).reset_index(drop=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    return bucketed_map_groups(
        parts, final, num_buckets=num_buckets, batch_format="pandas"
    )


def seasonal_mase(
    ds: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    period=None,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Forecast-baseline backtest per entity — the time-series evaluation
    family: score the SEASONAL-NAIVE predictor (each observation
    predicted by the entity's last value at ``ts <= t − period``; ties at
    the boundary resolve to max (ts, tiebreak), the engine-wide as-of
    rule) against the NAIVE lag-1 predictor, and report
    ``mase = mae_seasonal / mae_naive`` — MASE < 1 means real seasonal
    structure at ``period``. Only rows where BOTH predictors exist are
    scored (common support, so the ratio is well-defined); an entity with
    no scored rows is omitted, ``mae_naive = 0`` yields a NULL mase (SQL
    division semantics). Null entity/ts/value rows are filtered before
    pairing (the transition_times contract).

    Scale shape: ONE hash(entity) exchange; the per-bucket kernel sorts
    each stream once, gets the naive predictor by shift and the seasonal
    predictor by one ``searchsorted(ts, ts − period, side="right") − 1``
    per segment (the rolling-window trick), and emits one row per entity.
    """
    import datetime

    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    if period is None:
        raise ValueError("period is required (seasonal lag)")
    if isinstance(period, datetime.timedelta):
        period_us = int(period.total_seconds() * 1_000_000)
    else:
        period_us = int(period)
    if period_us <= 0:
        raise ValueError("period must be positive")

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.dropna(subset=[entity_col, ts_col, value_col])

    slim = ds.select_columns(
        [entity_col, ts_col, value_col, tiebreak_col]
    ).map_batches(pre, batch_size=None, batch_format="pandas")
    slim = add_bucket_column(slim, entity_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        empty = pd.DataFrame({
            entity_col: pd.Series([], dtype=df[entity_col].dtype),
            "n_scored": pd.Series([], dtype=np.int64),
            "mae_naive": pd.Series([], dtype=np.float64),
            "mae_seasonal": pd.Series([], dtype=np.float64),
            "mase": pd.Series([], dtype=np.float64),
        })
        if df.empty:
            return empty
        d = df.sort_values([entity_col, ts_col, tiebreak_col], kind="stable")
        ent = d[entity_col].to_numpy()
        ts = d[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = d[value_col].to_numpy(dtype=np.float64)
        n = len(d)
        new_ent = np.empty(n, dtype=bool)
        new_ent[0] = True
        new_ent[1:] = ent[1:] != ent[:-1]
        starts = np.flatnonzero(new_ent)
        seg_of = np.cumsum(new_ent) - 1
        seg_start = starts[seg_of]
        # naive: previous row within the segment
        prev_ok = ~new_ent
        prev_v = np.empty(n, dtype=np.float64)
        prev_v[1:] = v[:-1]
        prev_v[0] = np.nan
        # seasonal: last index with ts <= t - period, per segment.
        # searchsorted on the GLOBAL sorted ts is wrong across entity
        # boundaries, so probe within [seg_start, i) via offset probes.
        ends = np.append(starts[1:], n)
        seas_idx = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):  # few entities per bucket; probes
            seas_idx[s:e] = s + np.searchsorted(
                ts[s:e], ts[s:e] - period_us, side="right") - 1
        seas_ok = seas_idx >= seg_start
        ok = prev_ok & seas_ok
        if not ok.any():
            return empty
        err_n = np.abs(v - prev_v)
        err_s = np.abs(v - v[np.maximum(seas_idx, 0)])
        out = pd.DataFrame({
            entity_col: ent[ok],
            "_en": err_n[ok],
            "_es": err_s[ok],
        })
        g = out.groupby(entity_col, sort=True).agg(
            n_scored=("_en", "size"), _sn=("_en", "sum"), _ss=("_es", "sum"))
        mae_n = g["_sn"] / g["n_scored"]
        mae_s = g["_ss"] / g["n_scored"]
        mase = np.where(mae_n > 0, mae_s / mae_n, np.nan)
        return pd.DataFrame({
            entity_col: g.index.to_numpy(),
            "n_scored": g["n_scored"].to_numpy(np.int64),
            "mae_naive": np.round(mae_n.to_numpy(), round_digits),
            "mae_seasonal": np.round(mae_s.to_numpy(), round_digits),
            "mase": np.round(mase, round_digits),
        })

    return bucketed_map_groups(
        slim, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def conformal_interval(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    value_col: str,
    *,
    alpha: float = 0.1,
    cal_fraction: float = 0.5,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-group split-conformal prediction interval — the
    distribution-free uncertainty band: a deterministic multiplicative-
    hash split of ``key_col`` (the hash_split rule, SQL-exact) selects
    the calibration rows; the predictor is the calibration MEDIAN; the
    half-width ``q_hat`` is the calibration residuals' ``|y − med|``
    quantile at the finite-sample-corrected level
    ``min(1, ceil((1−α)·(n+1))/n)``. One row per group with ≥ 1
    calibration value: (group, n_cal, center, q_hat, lo, hi). Null
    group/key/value rows are excluded on both sides.

    Cross-engine determinism: BOTH quantiles (median and residual) use
    the same explicit linear interpolation ``xs[i] + (xs[i+1] − xs[i])·f``
    with ``h = level·(n−1)`` — mirrored literally by the oracle's
    ``list(x ORDER BY x)`` indexing, the same IEEE op sequence (numpy's
    np.quantile lerp switches forms at f>0.5, so the kernel interpolates
    manually rather than calling it).

    One hash(group) exchange; the kernel is two lexsorts + segmented
    index gathers — no per-group loop.
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column
    from featherstore_ray.stages.misc import _SPLIT_MULT

    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    cut = np.uint64(int(cal_fraction * (1 << 32)))

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[group_col, key_col, value_col])
        k = d[key_col].to_numpy().astype(np.uint64)
        h = (k % np.uint64(1 << 32)) * np.uint64(_SPLIT_MULT) \
            % np.uint64(1 << 32)
        d = d[h < cut]
        return pd.DataFrame({group_col: d[group_col],
                             "_v": d[value_col].astype(np.float64)})

    slim = ds.select_columns([group_col, key_col, value_col]).map_batches(
        pre, batch_size=None, batch_format="pandas"
    )
    slim = add_bucket_column(slim, group_col, num_buckets)

    def _seg_quantile(sorted_v, starts, sizes, level):
        """Linear-interp quantile per contiguous segment; level is a
        per-segment float array."""
        h = level * (sizes - 1.0)
        i = np.floor(h).astype(np.int64)
        f = h - i
        lo = sorted_v[starts + i]
        hi = sorted_v[starts + np.minimum(i + 1, sizes - 1)]
        return lo + (hi - lo) * f

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        empty = pd.DataFrame({
            group_col: pd.Series(dtype=df[group_col].dtype),
            "n_cal": pd.Series(dtype=np.int64),
            "center": pd.Series(dtype=np.float64),
            "q_hat": pd.Series(dtype=np.float64),
            "lo": pd.Series(dtype=np.float64),
            "hi": pd.Series(dtype=np.float64),
        })
        if df.empty:
            return empty
        codes, uniques = pd.factorize(df[group_col], sort=True)
        v = df["_v"].to_numpy()
        order = np.lexsort((v, codes))
        c_s, v_s = codes[order], v[order]
        k = int(c_s.max()) + 1
        n = np.bincount(c_s, minlength=k)
        starts = np.concatenate(([0], np.cumsum(n)[:-1]))
        sizes = n.astype(np.float64)
        med = _seg_quantile(v_s, starts, n, np.full(k, 0.5))
        row_g = np.repeat(np.arange(k), n)
        r = np.abs(v_s - med[row_g])
        order2 = np.lexsort((r, row_g))
        r_s = r[order2]
        level = np.minimum(1.0, np.ceil((1.0 - alpha) * (sizes + 1.0))
                           / sizes)
        q_hat = _seg_quantile(r_s, starts, n, level)
        return pd.DataFrame({
            group_col: uniques,
            "n_cal": n.astype(np.int64),
            "center": np.round(med, round_digits),
            "q_hat": np.round(q_hat, round_digits),
            "lo": np.round(med - q_hat, round_digits),
            "hi": np.round(med + q_hat, round_digits),
        })

    return bucketed_map_groups(
        slim, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def did_estimate(
    ds: ray.data.Dataset,
    treatment_col: str,
    post_col: str,
    outcome_col: str,
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Difference-in-differences — the 2×2 panel causal estimate:
    ``did = (ȳ₁₁ − ȳ₁₀) − (ȳ₀₁ − ȳ₀₀)`` (first index treated, second
    post), the parallel-trends workhorse for before/after reads with a
    control group. ``treatment_col`` / ``post_col`` are 0/1 by contract;
    rows with a null in any of the three columns are excluded on both
    sides. Output: one row per observed cell — (treated, post, n,
    mean_value) — plus ``did`` repeated per row (the single-number
    readout; null unless all four cells are present). ``did`` is computed
    from the UNROUNDED cell means ``Σy/n`` on both sides; only outputs
    round.

    Scale shape (the wilson_ci pattern): each block collapses to at most
    four (treated, post, Σy, n) partials merged driver-side — no shuffle,
    both passes stream.
    """
    import pyarrow as pa

    cols = [treatment_col, post_col, outcome_col]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=cols)
        g = d.groupby([treatment_col, post_col], sort=False,
                      observed=True)[outcome_col].agg(_s="sum", _n="count")
        return g.reset_index()

    parts = (
        ds.select_columns(cols)
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0 or treatment_col not in parts.columns:
        return ray.data.from_arrow(pa.table({
            "treated": pa.array([], pa.int64()),
            "post": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "mean_value": pa.array([], pa.float64()),
            "did": pa.array([], pa.float64()),
        }))
    cells = (
        parts.groupby([treatment_col, post_col], sort=True, observed=True)
        [["_s", "_n"]].sum().reset_index()
    )
    s = cells["_s"].to_numpy(dtype=np.float64)
    n = cells["_n"].to_numpy(dtype=np.int64)
    mean = s / n
    key = {(int(t), int(p)): mean[i] for i, (t, p) in enumerate(
        zip(cells[treatment_col], cells[post_col]))}
    did = np.nan
    if all(k in key for k in [(0, 0), (0, 1), (1, 0), (1, 1)]):
        did = (key[(1, 1)] - key[(1, 0)]) - (key[(0, 1)] - key[(0, 0)])
    return ray.data.from_arrow(pa.table({
        "treated": pa.array(cells[treatment_col].to_numpy(dtype=np.int64)),
        "post": pa.array(cells[post_col].to_numpy(dtype=np.int64)),
        "n": pa.array(n),
        "mean_value": pa.array(np.round(mean, round_digits)),
        "did": pa.array(np.full(len(n), np.round(did, round_digits))),
    }))


def rdd_estimate(
    ds: ray.data.Dataset,
    running_col: str,
    outcome_col: str,
    *,
    cutoff: float,
    bandwidth: float,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Sharp regression-discontinuity estimate — the causal effect at a
    threshold rule (local linear fit of the outcome on the centered
    running variable SEPARATELY on each side of the cutoff within
    ``bandwidth``; the effect is the jump between the two fitted
    intercepts at the cutoff: ``effect = a_right − a_left``).

    Side assignment is ``u = x − cutoff``; left is ``u < 0``, right is
    ``u ≥ 0``; only ``|u| ≤ bandwidth`` enters (rectangular kernel — the
    SQL-mirrorable choice). Each side's intercept is the explicit-sum
    OLS form ``a = (Σu²·Σy − Σu·Σuy) / (n·Σu² − (Σu)²)`` — never a
    library ``polyfit``, so the DuckDB oracle is a literal expression
    mirror. Output: one row per side (side, n, intercept, slope) plus
    the repeated ``effect`` readout (null unless both sides have ≥ 2
    distinct running values).

    Scale shape (the did_estimate pattern): each block collapses to two
    (side, n, Σu, Σy, Σu², Σuy) partial rows merged driver-side — no
    shuffle, one streaming pass.
    """
    import pyarrow as pa

    if bandwidth <= 0:
        raise ValueError(f"bandwidth must be > 0, got {bandwidth}")
    cols = [running_col, outcome_col]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=cols)
        u = d[running_col].to_numpy(dtype=np.float64) - cutoff
        y = d[outcome_col].to_numpy(dtype=np.float64)
        m = np.abs(u) <= bandwidth
        u, y = u[m], y[m]
        right = u >= 0
        rows = []
        for side, sm in (("left", ~right), ("right", right)):
            us, ys = u[sm], y[sm]
            rows.append((side, float(len(us)), us.sum(), ys.sum(),
                         (us * us).sum(), (us * ys).sum()))
        return pd.DataFrame(
            rows, columns=["side", "_n", "_su", "_sy", "_suu", "_suy"])

    parts = (
        ds.select_columns(cols)
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
    )
    g = parts.groupby("side", sort=True)[
        ["_n", "_su", "_sy", "_suu", "_suy"]].sum()
    out = {}
    for side in ("left", "right"):
        n, su, sy, suu, suy = (g.loc[side] if side in g.index
                               else pd.Series(0.0, index=g.columns))
        det = n * suu - su * su
        if n >= 2 and det > 0:
            a = (suu * sy - su * suy) / det
            b = (n * suy - su * sy) / det
        else:
            a = b = np.nan
        out[side] = (int(n), a, b)
    effect = out["right"][1] - out["left"][1]
    return ray.data.from_arrow(pa.table({
        "side": pa.array(["left", "right"], pa.string()),
        "n": pa.array([out["left"][0], out["right"][0]], pa.int64()),
        "intercept": pa.array(
            [round(out["left"][1], round_digits),
             round(out["right"][1], round_digits)], pa.float64()),
        "slope": pa.array(
            [round(out["left"][2], round_digits),
             round(out["right"][2], round_digits)], pa.float64()),
        "effect": pa.array([round(effect, round_digits)] * 2,
                           pa.float64()),
    }))


def ate_stratified(
    ds: ray.data.Dataset,
    treatment_col: str,
    outcome_col: str,
    stratum_col: str,
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Stratified average treatment effect — the workhorse causal
    estimate for observational A/B reads: within each stratum the
    treated/control outcome means and their difference, plus the
    population-weighted ATE ``Σ_s n_s·(ȳ₁ₛ − ȳ₀ₛ) / Σ_s n_s`` over the
    strata where BOTH arms are present (the classic coarsened-exact-
    matching / post-stratification estimator; identical weighting to
    exact matching on the stratum key). ``treatment_col`` is 0/1 by
    contract; rows with a null treatment, outcome or stratum are
    excluded on both sides. One row per both-arm stratum:
    (stratum, n1, n0, y1_mean, y0_mean, diff, ate) — ``ate`` repeated
    per row (the single-number readout).

    Scale shape (the mutual_info/contingency pattern): each block
    collapses to (stratum, treatment, Σy, count) partials — the exchange
    carries distinct (stratum, arm) pairs, never rows — and the driver
    merges the stratum-bounded table. The closed form is mirrored
    literally by the oracle; only the outputs round (the diff enters the
    ATE unrounded on both sides).
    """
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[stratum_col, treatment_col, outcome_col])
        g = d.groupby([stratum_col, treatment_col], sort=False,
                      observed=True)[outcome_col].agg(_s="sum", _n="count")
        return g.reset_index()

    parts = (
        ds.select_columns([stratum_col, treatment_col, outcome_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
    )
    stats = (
        parts.groupby([stratum_col, treatment_col], sort=True,
                      observed=True)[["_s", "_n"]].sum().reset_index()
    )
    piv_s = stats.pivot(index=stratum_col, columns=treatment_col,
                        values="_s")
    piv_n = stats.pivot(index=stratum_col, columns=treatment_col,
                        values="_n")
    ok = piv_n.get(1) is not None and piv_n.get(0) is not None
    if not ok:
        both = piv_n.iloc[0:0]
    else:
        both = piv_n[(piv_n[1].fillna(0) > 0) & (piv_n[0].fillna(0) > 0)]
    if len(both) == 0:
        return ray.data.from_arrow(pa.table({
            stratum_col: pa.array([], pa.int64()),
            "n1": pa.array([], pa.int64()),
            "n0": pa.array([], pa.int64()),
            "y1_mean": pa.array([], pa.float64()),
            "y0_mean": pa.array([], pa.float64()),
            "diff": pa.array([], pa.float64()),
            "ate": pa.array([], pa.float64()),
        }))
    idx = both.index
    n1 = piv_n.loc[idx, 1].to_numpy(dtype=np.float64)
    n0 = piv_n.loc[idx, 0].to_numpy(dtype=np.float64)
    m1 = piv_s.loc[idx, 1].to_numpy(dtype=np.float64) / n1
    m0 = piv_s.loc[idx, 0].to_numpy(dtype=np.float64) / n0
    diff = m1 - m0
    n_s = n1 + n0
    ate = float((n_s * diff).sum() / n_s.sum())
    return ray.data.from_arrow(pa.table({
        stratum_col: pa.array(idx.to_numpy()),
        "n1": pa.array(n1.astype(np.int64)),
        "n0": pa.array(n0.astype(np.int64)),
        "y1_mean": pa.array(np.round(m1, round_digits)),
        "y0_mean": pa.array(np.round(m0, round_digits)),
        "diff": pa.array(np.round(diff, round_digits)),
        "ate": pa.array(np.full(len(idx), np.round(ate, round_digits))),
    }))


def isotonic_calibration(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Isotonic (PAV) probability calibration — the non-parametric
    monotone recalibration map behind isotonic regression / reliability
    fitting: over distinct scores ascending, pool-adjacent-violators
    merges neighboring blocks until the weighted label means are
    non-decreasing. Output one row per distinct score:
    (score, n, calibrated) — the monotone step function to apply at
    serving time. Rows with a null score or label are excluded.
    ``label_col`` is 0/1 by contract.

    Scale shape (the mutual_info pattern): each block collapses to
    (score, Σlabel, count) partials — the exchange carries DISTINCT
    scores, never rows — and the driver runs the O(k) stack PAV over the
    k-bounded distinct-score table (round/bin the score upstream for
    continuous scores; the contract query uses a 1dp grid). Fully
    oracled via the min-max identity ``fit(k) = max_{i≤k} min_{j≥k}
    mean(y_i..y_j)`` — every candidate is one division of exact integer
    prefix sums, so the extremum lands on the PAV block mean
    bit-for-bit; an exact pure-Python parity pytest + monotonicity/
    mass-preservation invariants gate it besides.
    """
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[score_col, label_col]].dropna()
        g = d.groupby(score_col, sort=False)[label_col].agg(
            _s="sum", _n="count")
        return g.reset_index()

    parts = (
        ds.select_columns([score_col, label_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
    )
    stats = (
        parts.groupby(score_col, sort=True)[["_s", "_n"]].sum()
        .reset_index()
    )
    scores = stats[score_col].to_numpy(dtype=np.float64)
    s = stats["_s"].to_numpy(dtype=np.float64)
    n = stats["_n"].to_numpy(dtype=np.float64)
    # stack PAV: blocks of (sum, count); merge while means decrease
    bs, bn, bk = [], [], []  # block sum, count, source-row count
    for i in range(len(scores)):
        cs, cn, ck = s[i], n[i], 1
        while bs and bs[-1] / bn[-1] >= cs / cn:
            cs += bs.pop(); cn += bn.pop(); ck += bk.pop()
        bs.append(cs); bn.append(cn); bk.append(ck)
    cal = np.repeat(
        np.array([x / y for x, y in zip(bs, bn)], dtype=np.float64),
        np.array(bk, dtype=np.int64))
    return ray.data.from_arrow(pa.table({
        "score": pa.array(scores),
        "n": pa.array(n.astype(np.int64)),
        "calibrated": pa.array(np.round(cal, round_digits)),
    }))


def pr_curve(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Precision-recall sweep over every distinct score threshold — the
    operating-point picker next to :func:`auc` (which integrates, but
    can't tell you WHERE to cut): for each distinct score ``t``
    descending, the confusion counts of the rule ``score >= t`` and
    precision / recall / F1, plus ``is_best`` on the F1-argmax row (ties
    break to the HIGHEST threshold — the conservative cut). Rows with a
    null score or label are excluded; ``label_col`` is 0/1 by contract.

    Scale shape (the isotonic_calibration pattern): per-batch
    (score, Σlabel, count) partials — DISTINCT scores cross the
    exchange, never rows — then the driver's k-bounded descending
    cumsums. Counts are integers and the ratios are single divisions of
    identical ints, so the oracle's window-cumsum mirror is
    IEEE-identical (only the outputs round).
    """
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[score_col, label_col]].dropna()
        g = d.groupby(score_col, sort=False)[label_col].agg(
            _s="sum", _n="count")
        return g.reset_index()

    parts = (
        ds.select_columns([score_col, label_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
    )
    stats = (
        parts.groupby(score_col, sort=True)[["_s", "_n"]].sum()
        .reset_index().sort_values(score_col, ascending=False)
    )
    thr = stats[score_col].to_numpy(dtype=np.float64)
    s = stats["_s"].to_numpy(dtype=np.int64)
    n = stats["_n"].to_numpy(dtype=np.int64)
    tp = np.cumsum(s)
    fp = np.cumsum(n - s)
    pos = int(s.sum())
    fn = pos - tp
    with np.errstate(invalid="ignore", divide="ignore"):
        prec = tp.astype(np.float64) / (tp + fp)
        rec = tp.astype(np.float64) / pos if pos > 0 else np.full(
            len(tp), np.nan)
        f1 = np.where(prec + rec > 0, 2.0 * prec * rec / (prec + rec), 0.0)
    # argmax F1; thresholds are descending, so first max = highest cut
    best = int(np.argmax(f1)) if len(f1) else -1
    is_best = np.zeros(len(f1), dtype=bool)
    if best >= 0:
        is_best[best] = True
    return ray.data.from_arrow(pa.table({
        "threshold": pa.array(thr),
        "tp": pa.array(tp),
        "fp": pa.array(fp),
        "fn": pa.array(fn),
        "precision": pa.array(np.round(prec, round_digits)),
        "recall": pa.array(np.round(rec, round_digits)),
        "f1": pa.array(np.round(f1, round_digits)),
        "is_best": pa.array(is_best),
    }))


def bootstrap_ci(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    value_col: str,
    *,
    n_boot: int = 200,
    ci: float = 0.95,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Percentile-bootstrap confidence interval for each group's mean —
    the distribution-free uncertainty readout (B resampled means, CI =
    their (α/2, 1−α/2) percentiles). The resampling is a DETERMINISTIC
    multiplicative hash, not an RNG: replicate ``b``'s draw ``j`` picks
    index ``((b·n + j + 1)·2654435761 mod 2³²) mod n`` into the group's
    values sorted by ``key_col`` — reproducible across runs, partitions
    AND engines (the negative_sampling precedent), so the op is fully
    oracle-checkable. One row per group: (group, n, mean, lo, hi).
    Null group/key/value rows are excluded on both sides.

    Both percentile gathers use the explicit ``lo + (hi−lo)·f``
    interpolation over the sorted replicate means (the
    conformal_interval contract). Scale shape: one hash(group) exchange;
    the kernel vectorizes the B×n index arithmetic per group — the B
    replicate means are the only non-input state, and only the 5-float
    summary leaves the bucket.
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    alpha = 1.0 - ci
    mult = np.uint64(2654435761)
    m32 = np.uint64(1 << 32)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[group_col, key_col, value_col])
        return pd.DataFrame({
            group_col: d[group_col],
            "_k": d[key_col].astype(np.int64),
            "_v": d[value_col].astype(np.float64),
        })

    slim = ds.select_columns([group_col, key_col, value_col]).map_batches(
        pre, batch_size=None, batch_format="pandas"
    )
    slim = add_bucket_column(slim, group_col, num_buckets)

    def _interp(sorted_v, level):
        h = level * (len(sorted_v) - 1)
        i = int(np.floor(h))
        j = min(i + 1, len(sorted_v) - 1)
        return sorted_v[i] + (sorted_v[j] - sorted_v[i]) * (h - i)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        rows = []
        for g, grp in df.groupby(group_col, sort=True):
            d = grp.sort_values("_k", kind="stable")
            v = d["_v"].to_numpy()
            n = len(v)
            if n == 0:
                continue
            # B x n deterministic draw indices, fully vectorized
            seq = np.arange(n_boot, dtype=np.uint64)[:, None] \
                * np.uint64(n) \
                + np.arange(1, n + 1, dtype=np.uint64)[None, :]
            idx = ((seq * mult) % m32 % np.uint64(n)).astype(np.int64)
            means = v[idx].sum(axis=1) / n
            ms = np.sort(means)
            rows.append((g, n, float(v.sum() / n),
                         float(_interp(ms, alpha / 2.0)),
                         float(_interp(ms, 1.0 - alpha / 2.0))))
        if not rows:
            return pd.DataFrame({
                group_col: pd.Series(dtype=df[group_col].dtype),
                "n": pd.Series(dtype=np.int64),
                "mean": pd.Series(dtype=np.float64),
                "lo": pd.Series(dtype=np.float64),
                "hi": pd.Series(dtype=np.float64),
            })
        out = pd.DataFrame(rows, columns=[group_col, "n", "mean",
                                          "lo", "hi"])
        out["n"] = out["n"].astype(np.int64)
        for c in ("mean", "lo", "hi"):
            out[c] = np.round(out[c].to_numpy(), round_digits)
        return out

    return bucketed_map_groups(
        slim, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def seasonality_index(
    ds: ray.data.Dataset,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-entity hour-of-day seasonal profile — the load-shaping /
    activity-rhythm feature: for every (entity, hour 0–23) with data,
    the count, the hour's mean value and ``idx = hour_mean /
    entity_mean`` (> 1 ⇒ that hour runs hot for this entity). Hours use
    the same integer-epoch formula as :func:`time_features`
    (``(µs // 3.6e9) % 24`` == SQL ``hour(ts)`` for tz-naive data).
    Null entity/ts/value rows are excluded on both sides.

    Scale shape: per-batch (entity, hour, Σv, n) partials — 24-bounded
    per entity — one hash(entity) exchange, per-bucket merge + the
    two-divisions finish (entity mean = Σ over the entity's hour
    partials, so no second pass).
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[entity_col, ts_col, value_col])
        ts = d[ts_col].to_numpy().astype("datetime64[us]")
        hour = ((ts.view(np.int64) // 3_600_000_000) % 24).astype(np.int64)
        g = pd.DataFrame({
            entity_col: d[entity_col].to_numpy(),
            "hour": hour,
            "_v": d[value_col].to_numpy(dtype=np.float64),
        }).groupby([entity_col, "hour"], sort=False)["_v"] \
            .agg(_s="sum", _n="count").reset_index()
        return g

    parts = ds.select_columns([entity_col, ts_col, value_col]).map_batches(
        partial, batch_size=None, batch_format="pandas"
    )
    parts = add_bucket_column(parts, entity_col, num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop(columns=[BUCKET_COL])
            .groupby([entity_col, "hour"], sort=True)[["_s", "_n"]]
            .sum().reset_index()
        )
        tot = g.groupby(entity_col, sort=False)[["_s", "_n"]].sum()
        hm = g["_s"].to_numpy() / g["_n"].to_numpy()
        em = (g[entity_col].map(tot["_s"]).to_numpy()
              / g[entity_col].map(tot["_n"]).to_numpy())
        out = pd.DataFrame({
            entity_col: g[entity_col],
            "hour": g["hour"].astype(np.int64),
            "n": g["_n"].astype(np.int64),
            "hour_mean": np.round(hm, round_digits),
            "idx": np.round(hm / em, round_digits),
        })
        return out

    return bucketed_map_groups(
        parts, finish, num_buckets=num_buckets, batch_format="pandas"
    )


def shapley_attribution(
    ds: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    conversion_value: str = "purchase",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Set-based (simplified-Shapley) multi-touch attribution — the
    cooperative-game sibling of ``asof.linear_attribution`` (which splits
    by touch COUNT in a window; this splits by distinct-CHANNEL set):
    for every converting entity, the distinct channels observed STRICTLY
    BEFORE its first conversion each receive ``1/|S|`` credit, the
    symmetric-game Shapley value when a coalition's worth is its
    conversion count. Conversions at an entity's very first event have an
    empty coalition and credit nothing (direct conversions). Output: one
    row per channel — (channel, journeys, shapley_credit).

    Scale shape: ONE entity-hash exchange; each bucket reduces its
    entities to (channel, journeys, Σ 1/k) partials — at most
    |channel universe| rows per bucket — merged driver-side (channel
    cardinality is type-grade, not ID-grade).
    """
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df = df.dropna(subset=[entity_col, ts_col, type_col])
        conv = df[df[type_col] == conversion_value]
        if conv.empty:
            return pd.DataFrame({
                "channel": pd.Series(dtype="object"),
                "journeys": pd.Series(dtype="int64"),
                "_credit": pd.Series(dtype="float64"),
            })
        fp = conv.groupby(entity_col, sort=False)[ts_col].min()
        cut = df[entity_col].map(fp)
        pre = df[
            cut.notna() & (df[ts_col] < cut)
            & (df[type_col] != conversion_value)
        ][[entity_col, type_col]].drop_duplicates()
        if pre.empty:
            return pd.DataFrame({
                "channel": pd.Series(dtype="object"),
                "journeys": pd.Series(dtype="int64"),
                "_credit": pd.Series(dtype="float64"),
            })
        k = pre.groupby(entity_col, sort=False)[type_col].transform("size")
        pre = pre.assign(_credit=1.0 / k.to_numpy(dtype=np.float64))
        out = (
            pre.groupby(type_col, sort=False)
            .agg(journeys=(entity_col, "size"), _credit=("_credit", "sum"))
            .reset_index().rename(columns={type_col: "channel"})
        )
        return out[["channel", "journeys", "_credit"]]

    parts = bucketed_map_groups(
        add_bucket_column(ds, entity_col, num_buckets), kernel,
        num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()
    if parts.empty:
        import pyarrow as pa

        return ray.data.from_arrow(pa.table({
            "channel": pa.array([], pa.string()),
            "journeys": pa.array([], pa.int64()),
            "shapley_credit": pa.array([], pa.float64()),
        }))
    m = (
        parts.groupby("channel", sort=True)
        .agg(journeys=("journeys", "sum"), _credit=("_credit", "sum"))
        .reset_index()
    )
    credit = m["_credit"].to_numpy(dtype=np.float64)
    if round_digits is not None:
        credit = np.round(credit, round_digits)

    import pyarrow as pa

    return ray.data.from_arrow(pa.table({
        "channel": pa.array(m["channel"].astype(str)),
        "journeys": pa.array(m["journeys"].to_numpy(dtype=np.int64)),
        "shapley_credit": pa.array(credit),
    }))


def cohen_kappa(
    ds: ray.data.Dataset,
    rater_a: str,
    rater_b: str,
    *,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Cohen's kappa inter-rater agreement between two categorical
    columns — the labeling-QA member of the eval family (auc/ndcg score
    rankings; this scores annotator consistency): ``κ = (p_o − p_e) /
    (1 − p_e)`` with observed agreement ``p_o = Σ diag / n`` and chance
    agreement ``p_e = Σ_c (n_a(c)/n)·(n_b(c)/n)`` over the category
    union. Rows with a null in either column are dropped (oracle WHERE
    mirror). Every quantity is a ratio of exact integers, so the result
    is float-exact cross-engine before the cosmetic rounding.

    Output: one row — (n, po, pe, kappa); kappa is null when p_e = 1
    (a single shared category — agreement is vacuous).

    Scale shape: each block collapses to a (cat_a, cat_b, count)
    contingency partial (category-grade, not row-grade), merged
    driver-side; closed-form finish.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[rater_a, rater_b]].dropna()
        out = (
            d.groupby([rater_a, rater_b], sort=False).size()
            .rename("c").reset_index()
        )
        return out

    m = (
        ds.select_columns([rater_a, rater_b])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas().groupby([rater_a, rater_b], sort=True)["c"].sum()
        .reset_index()
    )
    n = float(m["c"].sum())
    import pyarrow as pa

    if n == 0:
        return ray.data.from_arrow(pa.table({
            "n": pa.array([0], pa.int64()),
            "po": pa.array([np.nan]), "pe": pa.array([np.nan]),
            "kappa": pa.array([np.nan]),
        }))
    diag = float(m.loc[m[rater_a] == m[rater_b], "c"].sum())
    ca = m.groupby(rater_a)["c"].sum()
    cb = m.groupby(rater_b)["c"].sum()
    cats = ca.index.union(cb.index)
    pe_num = float((ca.reindex(cats, fill_value=0).to_numpy(np.float64)
                    * cb.reindex(cats, fill_value=0).to_numpy(np.float64)
                    ).sum())
    po = diag / n
    pe = pe_num / (n * n)
    kappa = (po - pe) / (1.0 - pe) if pe != 1.0 else np.nan
    if round_digits is not None:
        po, pe = np.round(po, round_digits), np.round(pe, round_digits)
        kappa = np.round(kappa, round_digits)
    return ray.data.from_arrow(pa.table({
        "n": pa.array([int(n)], pa.int64()),
        "po": pa.array([po]), "pe": pa.array([pe]),
        "kappa": pa.array([kappa]),
    }))


def cuped_adjust(
    ds: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    cutoff=None,
    group_mod: int = 2,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """CUPED variance reduction for experiment metrics (Deng et al.):
    per entity, pre-period covariate ``x = mean(value | ts < cutoff)``
    and experiment metric ``y = mean(value | ts ≥ cutoff)``;
    ``θ = cov(x, y)/var(x)`` over entities with both defined;
    ``y_adj = y − θ·(x − mean(x))``. Reported per assignment arm
    (``entity % group_mod``): (grp, n, mean_y, mean_y_adj, theta).
    Entities missing either period drop (oracle WHERE mirror).

    Scale shape: ONE entity exchange collapses events to (entity, x, y);
    a streaming moment pass yields the four scalars behind θ; the final
    pass collapses each block to arm partials. Nothing driver-side but
    scalars.
    """
    if cutoff is None:
        raise ValueError("cutoff is required (pre/experiment boundary)")
    cut = pd.Timestamp(cutoff)

    def per_entity(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df = df.dropna(subset=[entity_col, ts_col, value_col])
        if df.empty:
            return pd.DataFrame({
                entity_col: df[entity_col],
                "x": pd.Series(dtype="float64"),
                "y": pd.Series(dtype="float64"),
            })
        pre = df[ts_col] < cut
        g = df.groupby(entity_col, sort=True)
        x = df[pre].groupby(entity_col)[value_col].mean()
        y = df[~pre].groupby(entity_col)[value_col].mean()
        out = pd.DataFrame({"x": x, "y": y}).dropna().reset_index()
        out.columns = [entity_col, "x", "y"]
        return out

    u = bucketed_map_groups(
        add_bucket_column(
            ds.select_columns([entity_col, ts_col, value_col]),
            entity_col, num_buckets),
        per_entity, num_buckets=num_buckets, batch_format="pandas",
    ).materialize()

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.float64)
        y = df["y"].to_numpy(np.float64)
        return pd.DataFrame([{
            "n": np.int64(len(x)), "sx": x.sum(), "sy": y.sum(),
            "sxy": (x * y).sum(), "sxx": (x * x).sum(),
        }])

    m = u.map_batches(
        moments, batch_size=None, batch_format="pandas").to_pandas()
    n = float(m["n"].sum())
    import pyarrow as pa

    if n == 0:
        return ray.data.from_arrow(pa.table({
            "grp": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "mean_y": pa.array([], pa.float64()),
            "mean_y_adj": pa.array([], pa.float64()),
            "theta": pa.array([], pa.float64()),
        }))
    sx, sy = float(m["sx"].sum()), float(m["sy"].sum())
    sxy, sxx = float(m["sxy"].sum()), float(m["sxx"].sum())
    varx = sxx - sx * sx / n
    theta = (sxy - sx * sy / n) / varx if varx != 0 else 0.0
    mx = sx / n

    def arm_partial(df: pd.DataFrame) -> pd.DataFrame:
        e = df[entity_col].to_numpy(np.int64)
        x = df["x"].to_numpy(np.float64)
        y = df["y"].to_numpy(np.float64)
        grp = e % group_mod
        adj = y - theta * (x - mx)
        out = pd.DataFrame({"grp": grp, "_n": 1, "_sy": y, "_sa": adj})
        return out.groupby("grp", sort=True).sum().reset_index()

    a = (
        u.map_batches(arm_partial, batch_size=None, batch_format="pandas")
        .to_pandas().groupby("grp", sort=True)[["_n", "_sy", "_sa"]].sum()
    )
    my = a["_sy"].to_numpy() / a["_n"].to_numpy()
    ma = a["_sa"].to_numpy() / a["_n"].to_numpy()
    th = np.full(len(a), theta)
    if round_digits is not None:
        my, ma = np.round(my, round_digits), np.round(ma, round_digits)
        th = np.round(th, round_digits)
    return ray.data.from_arrow(pa.table({
        "grp": pa.array(a.index.to_numpy(np.int64)),
        "n": pa.array(a["_n"].to_numpy(np.int64)),
        "mean_y": pa.array(my),
        "mean_y_adj": pa.array(ma),
        "theta": pa.array(th),
    }))


def fd_discovery(
    ds: ray.data.Dataset,
    candidates: Sequence[tuple[str, str]],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Functional-dependency audit — the data-profiling op behind schema
    discovery / key detection (complements :func:`~featherstore_ray.stages
    .misc.expect`, which checks DECLARED rules; this DISCOVERS them): for
    each candidate ``(determinant, dependent)`` column pair, ``det → dep``
    holds iff every determinant value maps to exactly one dependent value,
    i.e. ``count(distinct det) == count(distinct (det, dep))``. Rows with
    a null in either column are excluded (oracle WHERE mirror). Output one
    row per candidate: (determinant, dependent, n_det, n_pairs,
    violations, holds) with ``violations = n_pairs − n_det`` (the number
    of EXTRA (det, dep) mappings past one-per-determinant) and ``holds``
    an int64 0/1.

    Scale shape (the count_distinct pattern): each batch collapses every
    candidate to its distinct (det, dep) string pairs FIRST — the exchange
    carries distinct pairs, never rows — then ONE bucket shuffle on
    hash(candidate:det) so a determinant's full mapping set co-locates;
    per-bucket exact distinct counts sum driver-side (num_buckets ×
    |candidates| scalar partials). Values are stringified for the tagged
    union; int64/string stringification is injective so counts are exact.
    """
    import pyarrow as pa

    cand = [(str(d), str(p)) for d, p in candidates]
    cols = sorted({c for pair in cand for c in pair})
    proj = ds.select_columns(cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for i, (det, dep) in enumerate(cand):
            d = df[[det, dep]].dropna().drop_duplicates()
            if d.empty:
                continue
            outs.append(pd.DataFrame({
                "_cand": np.full(len(d), i, dtype=np.int64),
                "_det": d[det].astype(str).to_numpy(),
                "_dep": d[dep].astype(str).to_numpy(),
            }))
        if not outs:
            return pd.DataFrame({
                "_cand": pd.Series(dtype="int64"),
                "_det": pd.Series(dtype="object"),
                "_dep": pd.Series(dtype="object"),
                "_key": pd.Series(dtype="object"),
            })
        out = pd.concat(outs, ignore_index=True)
        out["_key"] = out["_cand"].astype(str) + ":" + out["_det"]
        return out

    parts = proj.map_batches(
        partial, batch_size=None, batch_format="pandas")

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        dd = df.drop(columns=[BUCKET_COL]).drop_duplicates(
            ["_cand", "_det", "_dep"])
        if dd.empty:
            return pd.DataFrame({
                "_cand": pd.Series(dtype="int64"),
                "_np": pd.Series(dtype="int64"),
                "_nd": pd.Series(dtype="int64"),
            })
        n_pairs = dd.groupby("_cand", sort=True).size()
        n_det = (dd.drop_duplicates(["_cand", "_det"])
                 .groupby("_cand", sort=True).size())
        return pd.DataFrame({
            "_cand": n_pairs.index.to_numpy(np.int64),
            "_np": n_pairs.to_numpy(np.int64),
            "_nd": n_det.reindex(n_pairs.index).to_numpy(np.int64),
        })

    m = bucketed_map_groups(
        add_bucket_column(parts, "_key", num_buckets),
        bucket_counts, num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()
    if m.empty:
        g = pd.DataFrame({"_np": [], "_nd": []})
    else:
        g = m.groupby("_cand", sort=True)[["_np", "_nd"]].sum()
    nd = np.array([int(g["_nd"].get(i, 0)) for i in range(len(cand))],
                  dtype=np.int64)
    npairs = np.array([int(g["_np"].get(i, 0)) for i in range(len(cand))],
                      dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "determinant": pa.array([d for d, _ in cand]),
        "dependent": pa.array([p for _, p in cand]),
        "n_det": pa.array(nd),
        "n_pairs": pa.array(npairs),
        "violations": pa.array(npairs - nd),
        "holds": pa.array((npairs == nd).astype(np.int64)),
    }))


def sequence_mining(
    ds: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    min_support: int = 1,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Frequent ordered 2-step sequential patterns (the sequence-mining
    sibling of :func:`association_rules`, which ignores order): pattern
    ``a → b`` is supported by an entity iff it has SOME ``a`` event
    strictly before SOME ``b`` event — equivalently ``min_ts(a) <
    max_ts(b)`` over the entity's per-type extremes (a = b counts too:
    a repeat at a later timestamp). Output one row per pattern with
    ``support ≥ min_support``: (antecedent, consequent, support,
    n_antecedent, confidence = support / n_antecedent). Rows with a null
    entity, ts or type are excluded (oracle WHERE mirror).

    Scale shape: each batch collapses to (entity, type, min_ts, max_ts)
    partials — the exchange carries per-type extremes, never events —
    then ONE hash(entity) exchange; the per-bucket kernel re-merges
    extremes and expands each entity's bounded type set (pattern
    alphabet is category-grade by contract) into ordered-pair
    indicators. Driver merges |types|²-grade partials. Support and
    n_antecedent are exact ints; confidence is a single division.
    """
    import pyarrow as pa

    proj = ds.select_columns([entity_col, ts_col, type_col])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[entity_col, ts_col, type_col])
        g = d.groupby([entity_col, type_col], sort=False)[ts_col].agg(
            _mn="min", _mx="max")
        return g.reset_index()

    parts = proj.map_batches(
        partial, batch_size=None, batch_format="pandas")

    def bucket_kernel(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=[BUCKET_COL])
        empty = pd.DataFrame({
            "_a": pd.Series(dtype="object"),
            "_c": pd.Series(dtype="object"),
            "_sup": pd.Series(dtype="int64"),
            "_na": pd.Series(dtype="int64"),
        })
        if d.empty:
            return empty
        g = (d.groupby([entity_col, type_col], sort=False)
             .agg(_mn=("_mn", "min"), _mx=("_mx", "max")).reset_index())
        m = g.merge(g, on=entity_col, suffixes=("_x", "_y"))
        hit = m[m["_mn_x"] < m["_mx_y"]]
        sup = (hit.groupby([f"{type_col}_x", f"{type_col}_y"], sort=True)
               .size().rename("_sup").reset_index())
        ante = (g.groupby(type_col, sort=True).size()
                .rename("_na").reset_index())
        out = pd.DataFrame({
            "_a": np.concatenate([sup[f"{type_col}_x"].to_numpy(object),
                                  ante[type_col].to_numpy(object)]),
            "_c": np.concatenate([sup[f"{type_col}_y"].to_numpy(object),
                                  np.full(len(ante), None, dtype=object)]),
            "_sup": np.concatenate([sup["_sup"].to_numpy(np.int64),
                                    np.zeros(len(ante), np.int64)]),
            "_na": np.concatenate([np.zeros(len(sup), np.int64),
                                   ante["_na"].to_numpy(np.int64)]),
        })
        return out if not out.empty else empty

    m = bucketed_map_groups(
        add_bucket_column(parts, entity_col, num_buckets),
        bucket_kernel, num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()
    cols = ["antecedent", "consequent", "support", "n_antecedent",
            "confidence"]
    if m.empty:
        return ray.data.from_arrow(pa.table({
            "antecedent": pa.array([], pa.string()),
            "consequent": pa.array([], pa.string()),
            "support": pa.array([], pa.int64()),
            "n_antecedent": pa.array([], pa.int64()),
            "confidence": pa.array([], pa.float64()),
        }))
    pairs = (m[m["_c"].notna()]
             .groupby(["_a", "_c"], sort=True)["_sup"].sum().reset_index())
    ante = m[m["_c"].isna()].groupby("_a", sort=True)["_na"].sum()
    pairs = pairs[pairs["_sup"] >= int(min_support)]
    na = ante.reindex(pairs["_a"]).to_numpy(np.int64)
    conf = pairs["_sup"].to_numpy(np.float64) / na
    if round_digits is not None:
        conf = np.round(conf, round_digits)
    return ray.data.from_arrow(pa.table({
        "antecedent": pa.array(pairs["_a"].astype(str)),
        "consequent": pa.array(pairs["_c"].astype(str)),
        "support": pa.array(pairs["_sup"].to_numpy(np.int64)),
        "n_antecedent": pa.array(na),
        "confidence": pa.array(conf),
    }))


def cross_correlation(
    ds: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    x_type: str = "click",
    y_type: str = "purchase",
    max_lag: int = 3,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Lead-lag cross-correlation between two event-type daily count
    series — the two-series companion to :func:`~featherstore_ray.stages
    .window.autocorr` (one series vs its own past): on the DENSE day grid
    ``[min_day, max_day]`` (zero-filled — absent days count 0), for each
    lag ℓ ∈ [−max_lag, max_lag] the Pearson correlation of ``(x_d,
    y_{d+ℓ})`` over the ``D − |ℓ|`` overlapping days. Positive ℓ with
    high ccf reads "x leads y by ℓ days". Rows with a null ts or type
    are excluded (oracle WHERE mirror). Output: (lag, n, ccf) — ccf null
    when either window is constant.

    Scale shape: each block collapses to (day, x_count, y_count)
    partials — calendar-grade, never rows — merged driver-side; the
    closed-form moment sums per lag are exact integer arithmetic, so
    only the final ratio rounds.
    """
    import pyarrow as pa

    proj = ds.select_columns([ts_col, type_col])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[ts_col, type_col])
        day = d[ts_col].to_numpy("datetime64[D]").view(np.int64)
        t = d[type_col].to_numpy(object)
        out = pd.DataFrame({"_d": day,
                            "_x": (t == x_type).astype(np.int64),
                            "_y": (t == y_type).astype(np.int64)})
        return out.groupby("_d", sort=False).sum().reset_index()

    m = (proj.map_batches(partial, batch_size=None, batch_format="pandas")
         .to_pandas())
    lags = np.arange(-int(max_lag), int(max_lag) + 1, dtype=np.int64)
    if m.empty:
        return ray.data.from_arrow(pa.table({
            "lag": pa.array(lags),
            "n": pa.array(np.zeros(len(lags), np.int64)),
            "ccf": pa.array(np.full(len(lags), np.nan)),
        }))
    g = m.groupby("_d", sort=True)[["_x", "_y"]].sum()
    lo, hi = int(g.index.min()), int(g.index.max())
    idx = np.arange(lo, hi + 1, dtype=np.int64)
    x = g["_x"].reindex(idx, fill_value=0).to_numpy(np.int64)
    y = g["_y"].reindex(idx, fill_value=0).to_numpy(np.int64)
    D = len(idx)
    ns, ccfs = [], []
    for l in lags:
        if l >= 0:
            xa, yb = x[:D - l] if l else x, y[l:]
        else:
            xa, yb = x[-l:], y[:D + l]
        n = len(xa)
        ns.append(n)
        if n == 0:
            ccfs.append(np.nan)
            continue
        sx, sy = int(xa.sum()), int(yb.sum())
        sxy = int((xa * yb).sum())
        sxx, syy = int((xa * xa).sum()), int((yb * yb).sum())
        den2x, den2y = n * sxx - sx * sx, n * syy - sy * sy
        if den2x <= 0 or den2y <= 0:
            ccfs.append(np.nan)
            continue
        ccfs.append((n * sxy - sx * sy)
                    / (np.sqrt(float(den2x)) * np.sqrt(float(den2y))))
    ccf = np.array(ccfs, dtype=np.float64)
    if round_digits is not None:
        ccf = np.round(ccf, round_digits)
    return ray.data.from_arrow(pa.table({
        "lag": pa.array(lags),
        "n": pa.array(np.array(ns, np.int64)),
        "ccf": pa.array(ccf),
    }))


def ridge_regression(
    ds: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    lam: int = 100,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Closed-form ridge regression of ``floor(value)`` on calendar
    features (hour-of-day, day-of-week) + intercept — the multi-feature
    sibling of :func:`group_linear_fit` (one feature) and
    :func:`~featherstore_ray.stages.ann.logreg_train` (iterative): solves
    the 3×3 normal equations ``(XᵀX + λ·diag(0,1,1)) β = Xᵀy`` (intercept
    unpenalized) by Cramer's rule. Rows with a null ts or value are
    excluded (oracle WHERE mirror). Output one row: (n, b0, b1, b2) =
    intercept, hour, dow coefficients.

    Cross-engine contract: features and target are exact INTEGERS (hour,
    dow, floor(value)) so every moment sum is exact int64 regardless of
    summation order; ``λ`` is an int added before the float cast; the
    Cramer determinants are spelled with the IDENTICAL expression shape
    in the SQL mirror, so the float arithmetic is IEEE-identical and
    only outputs round. (Moment magnitude bounds the exact-int regime —
    hour·dow·y products stay far under 2⁵³ even at 100 TB row counts of
    bounded values.)

    Scale shape: each block collapses to ONE row of 10 integer moments;
    the driver sums scalar partials — no shuffle anywhere.
    """
    import pyarrow as pa

    proj = ds.select_columns([ts_col, value_col])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[ts_col, value_col])
        ts = d[ts_col].to_numpy("datetime64[us]")
        h = ((ts.view(np.int64) // 3_600_000_000) % 24).astype(np.int64)
        w = ((ts.astype("datetime64[D]").view(np.int64) + 3) % 7
             ).astype(np.int64)
        yv = np.floor(d[value_col].to_numpy(np.float64)).astype(np.int64)
        return pd.DataFrame([{
            "_n": np.int64(len(h)),
            "_sx1": h.sum(), "_sx2": w.sum(), "_sy": yv.sum(),
            "_s11": (h * h).sum(), "_s12": (h * w).sum(),
            "_s22": (w * w).sum(),
            "_s1y": (h * yv).sum(), "_s2y": (w * yv).sum(),
        }])

    m = (proj.map_batches(partial, batch_size=None, batch_format="pandas")
         .to_pandas().sum())
    n = int(m["_n"])
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "n": pa.array([0], pa.int64()),
            "b0": pa.array([np.nan]), "b1": pa.array([np.nan]),
            "b2": pa.array([np.nan]),
        }))
    a11 = np.float64(n)
    a12 = np.float64(int(m["_sx1"]))
    a13 = np.float64(int(m["_sx2"]))
    a22 = np.float64(int(m["_s11"]) + int(lam))
    a23 = np.float64(int(m["_s12"]))
    a33 = np.float64(int(m["_s22"]) + int(lam))
    r1 = np.float64(int(m["_sy"]))
    r2 = np.float64(int(m["_s1y"]))
    r3 = np.float64(int(m["_s2y"]))
    a21, a31, a32 = a12, a13, a23
    det = (a11 * (a22 * a33 - a23 * a32)
           - a12 * (a21 * a33 - a23 * a31)
           + a13 * (a21 * a32 - a22 * a31))
    det0 = (r1 * (a22 * a33 - a23 * a32)
            - a12 * (r2 * a33 - a23 * r3)
            + a13 * (r2 * a32 - a22 * r3))
    det1 = (a11 * (r2 * a33 - a23 * r3)
            - r1 * (a21 * a33 - a23 * a31)
            + a13 * (a21 * r3 - r2 * a31))
    det2 = (a11 * (a22 * r3 - r2 * a32)
            - a12 * (a21 * r3 - r2 * a31)
            + r1 * (a21 * a32 - a22 * a31))
    if det == 0.0:
        b0 = b1 = b2 = np.nan
    else:
        b0, b1, b2 = det0 / det, det1 / det, det2 / det
    if round_digits is not None:
        b0, b1, b2 = (np.round(b0, round_digits),
                      np.round(b1, round_digits),
                      np.round(b2, round_digits))
    return ray.data.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "b0": pa.array([b0]), "b1": pa.array([b1]),
        "b2": pa.array([b2]),
    }))


def kendall_tau(
    ds: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    x_col: str = "ts",
    y_col: str = "value",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group Kendall tau-b rank correlation — the concordance member
    of the correlation family (:func:`group_corr` is linear,
    ``spearman`` is rank-linear; tau-b counts pair ORDER agreements, the
    most outlier-robust of the three): over every unordered row pair in
    the group, ``P`` concordant, ``Q`` discordant, and tie corrections
    ``n1 = Σ tₓ(tₓ−1)/2``, ``n2 = Σ t_y(t_y−1)/2``; ``τ_b = (P − Q) /
    sqrt((n0 − n1)(n0 − n2))`` with ``n0 = n(n−1)/2``. Null when the
    denominator is 0. Rows with a null entity, x or y drop (oracle WHERE
    mirror). All counts are exact ints — comparisons only, no float
    sums — so the ratio is IEEE-identical cross-engine.

    Scale shape: ONE entity exchange; the per-bucket kernel expands each
    group's pairs with the shared triangular `pair_indices` (vectorized,
    Θ(group²) — BOUNDED-n groups by contract, the theil_sen convention;
    use spearman's O(n log n) mid-ranks for unbounded groups).
    """
    import pyarrow as pa

    from featherstore_ray.stages.dedup import pair_indices

    proj = ds.select_columns([entity_col, x_col, y_col])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[entity_col, x_col, y_col]).sort_values(
            entity_col, kind="stable")
        empty = pd.DataFrame({
            entity_col: pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "p_c": pd.Series(dtype="int64"),
            "q_d": pd.Series(dtype="int64"),
            "tau": pd.Series(dtype="float64"),
        })
        if d.empty:
            return empty
        ent = d[entity_col].to_numpy(np.int64)
        x = d[x_col].to_numpy()
        y = d[y_col].to_numpy()
        ai, bi = pair_indices(ent)
        gt_x, lt_x = x[ai] > x[bi], x[ai] < x[bi]
        gt_y, lt_y = y[ai] > y[bi], y[ai] < y[bi]
        conc = (gt_x & gt_y) | (lt_x & lt_y)
        disc = (gt_x & lt_y) | (lt_x & gt_y)
        pe = ent[ai] if len(ai) else np.empty(0, np.int64)
        u = np.unique(ent)
        pf = pd.DataFrame({"_e": pe, "_c": conc.astype(np.int64),
                           "_d": disc.astype(np.int64)})
        agg = pf.groupby("_e", sort=True)[["_c", "_d"]].sum()
        n = pd.Series(ent).groupby(ent).size()
        tx = (d.groupby([entity_col, x_col], sort=False).size()
              .groupby(level=0).apply(lambda t: int((t * (t - 1) // 2)
                                                    .sum())))
        ty = (d.groupby([entity_col, y_col], sort=False).size()
              .groupby(level=0).apply(lambda t: int((t * (t - 1) // 2)
                                                    .sum())))
        nn = n.reindex(u).to_numpy(np.int64)
        P = agg["_c"].reindex(u, fill_value=0).to_numpy(np.int64)
        Q = agg["_d"].reindex(u, fill_value=0).to_numpy(np.int64)
        n1 = tx.reindex(u, fill_value=0).to_numpy(np.int64)
        n2 = ty.reindex(u, fill_value=0).to_numpy(np.int64)
        n0 = nn * (nn - 1) // 2
        den2 = (n0 - n1) * (n0 - n2)
        with np.errstate(invalid="ignore", divide="ignore"):
            tau = (P - Q) / np.sqrt(den2.astype(np.float64))
        tau[den2 <= 0] = np.nan
        if round_digits is not None:
            tau = np.round(tau, round_digits)
        return pd.DataFrame({
            entity_col: u, "n": nn, "p_c": P, "q_d": Q, "tau": tau,
        })

    ds_b = add_bucket_column(proj, entity_col, num_buckets)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return kernel(df.drop(columns=[BUCKET_COL]))

    return bucketed_map_groups(
        ds_b, run, num_buckets=num_buckets, batch_format="pandas")


def inclusion_audit(
    child: ray.data.Dataset,
    parent: ray.data.Dataset,
    *,
    child_col: str,
    parent_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Inclusion-dependency audit (foreign-key discovery) — the
    cross-table sibling of :func:`fd_discovery` (within-table
    determinism; this checks REFERENTIAL containment): does every
    non-null ``child_col`` value appear in ``parent_col``? Output one
    row: (n_child_distinct, n_matched, n_missing, contained) with
    ``contained`` an int64 0/1 (vacuously 1 when the child is empty).
    Nulls are excluded on both sides (oracle WHERE mirror).

    Scale shape: per-batch DISTINCT partials on each side — the
    exchange carries distinct keys, never rows — tagged-union into ONE
    hash(value) exchange (all-int64 tags, no null padding), per-bucket
    exact anti-join counts, scalar driver sum.
    """
    import pyarrow as pa

    def dedup_side(col: str, side: int):
        def f(t: pa.Table) -> pa.Table:
            v = t[col].drop_null().unique().cast(pa.int64())
            return pa.table({
                "_v": v,
                "_side": pa.array(np.full(len(v), side, np.int64)),
            })
        return f

    c = child.select_columns([child_col]).map_batches(
        dedup_side(child_col, 0), batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)
    p = parent.select_columns([parent_col]).map_batches(
        dedup_side(parent_col, 1), batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)

    def bucket_kernel(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=[BUCKET_COL])
        cv = pd.unique(d.loc[d["_side"] == 0, "_v"])
        pv = pd.unique(d.loc[d["_side"] == 1, "_v"])
        nc = np.int64(len(cv))
        nm = np.int64(np.isin(cv, pv).sum())
        return pd.DataFrame({"_nc": [nc], "_nm": [nm]})

    m = bucketed_map_groups(
        add_bucket_column(c.union(p), "_v", num_buckets),
        bucket_kernel, num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()
    nc = int(m["_nc"].sum()) if not m.empty else 0
    nm = int(m["_nm"].sum()) if not m.empty else 0
    return ray.data.from_arrow(pa.table({
        "n_child_distinct": pa.array([nc], pa.int64()),
        "n_matched": pa.array([nm], pa.int64()),
        "n_missing": pa.array([nc - nm], pa.int64()),
        "contained": pa.array([np.int64(nc == nm)], pa.int64()),
    }))


def bh_fdr(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    label_col: str,
    label_a,
    label_b,
    *,
    alpha: float = 0.05,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Benjamini-Hochberg FDR correction over a family of per-group
    Welch tests — the multiple-testing layer every fleet-wide screen
    (metric drift per segment, A/B per market) needs on top of
    :func:`welch_t`: testing 150 groups at alpha=0.05 yields ~8 false
    positives uncorrected. Each tested group gets a distribution-free
    Chebyshev p-value bound ``p = min(1, 1/t^2)`` (``P(|T| >= t) <=
    1/t^2`` — deliberately SQL-expressible where the t CDF is not),
    p-values are ranked ascending (ties broken by group key), and the
    BH step rejects ranks ``<= k = max{i : p_i <= i*alpha/m}``. Output
    per tested group: (group, t, p, p_rank, rejected).

    Cross-engine determinism: p derives from the ALREADY-ROUNDED t (6dp,
    identical both engines), so the compare ``p <= i*alpha/m`` sees
    bit-identical doubles on both sides; the threshold is the same
    ``(i * alpha) / m`` expression in numpy and SQL. Groups with null t
    (degenerate variance) are excluded from the family on both sides.

    Scale shape: inherits welch_t's moment partials (blocks collapse to
    (group, side, n, Σx, Σx²)); the BH step itself runs driver-side over
    the m-row hypothesis table — m is the tested-group count, a
    driver-scale table by contract.
    """
    import pyarrow as pa

    t_ds = welch_t(ds, group_col, value_col, label_col, label_a, label_b,
                   round_digits=round_digits)
    df = t_ds.to_pandas()
    df = df[df["t"].notna()].copy()
    if df.empty:
        return ray.data.from_arrow(pa.table({
            group_col: pa.array([], pa.int64()),
            "t": pa.array([], pa.float64()),
            "p": pa.array([], pa.float64()),
            "p_rank": pa.array([], pa.int64()),
            "rejected": pa.array([], pa.int64()),
        }))
    t = df["t"].to_numpy(np.float64)
    p = np.where(t == 0.0, 1.0, np.minimum(1.0, 1.0 / (t * t)))
    order = np.lexsort((df[group_col].to_numpy(), p))
    m = np.int64(len(p))
    rank = np.empty(len(p), np.int64)
    rank[order] = np.arange(1, len(p) + 1)
    thr = (rank * alpha) / m
    passing = rank[p <= thr]
    k = np.int64(passing.max()) if len(passing) else np.int64(0)
    return ray.data.from_arrow(pa.table({
        group_col: pa.array(df[group_col].to_numpy()),
        "t": pa.array(t, pa.float64()),
        "p": pa.array(np.round(p, round_digits), pa.float64()),
        "p_rank": pa.array(rank, pa.int64()),
        "rejected": pa.array((rank <= k).astype(np.int64), pa.int64()),
    }))


def iv_wald(
    ds: ray.data.Dataset,
    instrument_col: str,
    treat_col: str,
    outcome_col: str,
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Instrumental-variable (Wald) estimate of a local average treatment
    effect — the causal family member for ENDOGENOUS treatments, where
    :func:`ate_stratified` / dr_ate assume unconfoundedness and fail:
    with a binary instrument z (encouragement), binary treatment d and
    outcome y, ``LATE = (E[y|z=1] - E[y|z=0]) / (E[d|z=1] - E[d|z=0])``
    — the intent-to-treat effect scaled by the first stage. Output one
    row: (n1, n0, itt_y, itt_d, late); ``late`` is null when the first
    stage is exactly zero (itt_d comparisons are exact: Σd and n are
    integers, so each arm's take-up rate is the same rational in both
    engines).

    Scale shape: one pass of per-batch (z, n, Σd, Σy) partials — the
    driver merges 2 rows; zero shuffle. Rows with any null among
    (z, d, y) are excluded on both sides.
    """
    import pyarrow as pa

    cols = [instrument_col, treat_col, outcome_col]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=cols)
        g = d.groupby(instrument_col, sort=False, observed=True)
        return pd.DataFrame({
            "_n": g.size().astype(np.int64),
            "_sd": g[treat_col].sum().astype(np.int64),
            "_sy": g[outcome_col].sum(),
        }).reset_index()

    m = (
        ds.select_columns(cols)
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
        .groupby(instrument_col, sort=True, observed=True)[
            ["_n", "_sd", "_sy"]].sum()
    )
    n1 = np.int64(m["_n"].get(1, 0))
    n0 = np.int64(m["_n"].get(0, 0))
    if n1 == 0 or n0 == 0:
        itt_y = itt_d = late = np.nan
    else:
        my1 = m["_sy"].get(1, 0.0) / n1
        my0 = m["_sy"].get(0, 0.0) / n0
        md1 = np.int64(m["_sd"].get(1, 0)) / n1
        md0 = np.int64(m["_sd"].get(0, 0)) / n0
        itt_y = my1 - my0
        itt_d = md1 - md0
        late = itt_y / itt_d if itt_d != 0.0 else np.nan
    return ray.data.from_arrow(pa.table({
        "n1": pa.array([n1], pa.int64()),
        "n0": pa.array([n0], pa.int64()),
        "itt_y": pa.array([np.round(itt_y, round_digits)], pa.float64()),
        "itt_d": pa.array([np.round(itt_d, round_digits)], pa.float64()),
        "late": pa.array([np.round(late, round_digits)], pa.float64()),
    }))


def simpson_flip(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Simpson's-paradox audit — flags groups whose within-group OLS
    trend of y on x points the OPPOSITE strict direction from the pooled
    trend, the classic aggregation trap behind wrong dashboard
    conclusions. Output per group: (group, n, slope, pooled_slope, flip)
    where ``flip`` is 1 iff both ROUNDED slopes are strictly nonzero with
    opposite signs (rounding first is the house rounded-before-compare
    pattern; a zero slope never flips). Groups with < 2 rows or zero x
    variance get null slope and flip 0.

    Scale shape: one pass of per-batch (group, n, Σx, Σy, Σx², Σxy)
    moment partials (group_corr pattern); the pooled moments are the
    SAME partials summed, so no second pass. Driver merge carries
    groups × 5 floats — bounded-cardinality groups by contract. Rows
    with any null among (group, x, y) are excluded on both sides.
    """
    import pyarrow as pa

    cols = [group_col, x_col, y_col]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=cols)
        x = d[x_col].to_numpy(np.float64)
        y = d[y_col].to_numpy(np.float64)
        out = pd.DataFrame({
            group_col: d[group_col].to_numpy(),
            "_n": np.int64(1), "_sx": x, "_sy": y,
            "_sxx": x * x, "_sxy": x * y,
        })
        return out.groupby(group_col, sort=False, observed=True)[
            ["_n", "_sx", "_sy", "_sxx", "_sxy"]].sum().reset_index()

    g = (
        ds.select_columns(cols)
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
        .groupby(group_col, sort=True, observed=True)[
            ["_n", "_sx", "_sy", "_sxx", "_sxy"]].sum().reset_index()
    )

    def slope_of(n, sx, sy, sxx, sxy):
        vx = n * sxx - sx * sx
        cov = n * sxy - sx * sy
        with np.errstate(invalid="ignore", divide="ignore"):
            s = cov / vx
        return np.where((n >= 2) & (vx > 0), s, np.nan)

    n = g["_n"].to_numpy(np.float64)
    sl = slope_of(n, g["_sx"].to_numpy(), g["_sy"].to_numpy(),
                  g["_sxx"].to_numpy(), g["_sxy"].to_numpy())
    tn, tsx, tsy = n.sum(), g["_sx"].sum(), g["_sy"].sum()
    pooled = slope_of(np.array([tn]), np.array([tsx]), np.array([tsy]),
                      np.array([g["_sxx"].sum()]),
                      np.array([g["_sxy"].sum()]))[0]
    sl_r = np.round(sl, round_digits)
    pl_r = np.round(pooled, round_digits)
    flip = np.where(
        np.isnan(sl_r) | np.isnan(pl_r), 0,
        ((sl_r > 0) & (pl_r < 0)) | ((sl_r < 0) & (pl_r > 0)),
    ).astype(np.int64)
    return ray.data.from_arrow(pa.table({
        group_col: pa.array(g[group_col].to_numpy()),
        "n": pa.array(g["_n"].to_numpy(np.int64), pa.int64()),
        "slope": pa.array(sl_r, pa.float64()),
        "pooled_slope": pa.array(
            np.full(len(sl), pl_r), pa.float64()),
        "flip": pa.array(flip, pa.int64()),
    }))


def l_diversity(
    ds: ray.data.Dataset,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    *,
    l: int = 3,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """l-diversity audit — :func:`k_anonymity`'s attribute-disclosure
    sibling: a quasi-identifier class can be large (k-anonymous) yet
    still leak if every member shares the same SENSITIVE value, so this
    reports classes whose sensitive column takes fewer than ``l``
    distinct values. Output: (quasi columns..., n_distinct) for risky
    classes only. Rows with any null quasi value OR a null sensitive
    value are excluded on both sides (the grouped-op null-key contract).

    Scale shape: per-batch DISTINCT (quasi..., sensitive) partials — the
    exchange moves distinct combos, never rows; ONE hash on the first
    quasi column co-locates each class exactly; per-bucket distinct
    count + threshold filter.
    """
    quasi_cols = list(quasi_cols)
    all_cols = quasi_cols + [sensitive_col]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.dropna(subset=all_cols).drop_duplicates(all_cols)[all_cols]

    parts = ds.select_columns(all_cols).map_batches(
        partial, batch_size=None, batch_format="pandas"
    )
    parts = add_bucket_column(parts, quasi_cols[0], num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=[BUCKET_COL]).drop_duplicates(all_cols)
        g = d.groupby(quasi_cols, sort=False, observed=True)[
            sensitive_col].nunique()
        out = g[g < l].rename("n_distinct").reset_index()
        out["n_distinct"] = out["n_distinct"].astype(np.int64)
        return out

    return bucketed_map_groups(
        parts, final, num_buckets=num_buckets, batch_format="pandas"
    )


def esd_outliers(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    lambdas: Sequence[float] = (3.0, 2.9, 2.8),
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Generalized ESD (extreme studentized deviate) sequential outlier
    test per group — unlike :func:`mad_outliers`' one-shot robust
    screen, ESD handles MASKING: one huge outlier inflates the sd and
    hides a second, so each round removes the current extreme and
    re-studentizes before testing the next. Round i computes ``R_i =
    max |x - mean| / sd`` over the remaining values (sample sd), removes
    the argmax (ties → smallest id, on the 9dp-ROUNDED statistic — the
    house rounded-before-argmax pattern), and the outlier count is ``k =
    max{i : R_i > lambda_i}`` — ALL rounds ≤ k are outliers even if an
    intermediate R dipped below its critical value (the masking fix).
    ``lambdas`` are the ESD critical values for the caller's n/alpha,
    precomputed offline because the t quantile is not SQL-expressible;
    they enter both engines as identical literals. Rounds where a group
    has < 3 remaining values or zero variance stop contributing (oracle
    ``WHERE`` mirror). Output per removed candidate: (group, id, rnd,
    r_stat, is_outlier).

    Scale shape: ONE hash(group) exchange; each round is a segmented
    bincount of moments + one lexsort argmax across ALL groups in the
    bucket at once — len(lambdas) passes over bucket-resident arrays,
    no per-row Python.
    """
    import pyarrow as pa

    cols = [group_col, value_col, id_col]
    n_rounds = len(lambdas)
    lam = [float(v) for v in lambdas]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            group_col: pd.Series(dtype=df[group_col].dtype if len(df)
                                 else "object"),
            id_col: pd.Series(dtype="int64"),
            "rnd": pd.Series(dtype="int64"),
            "r_stat": pd.Series(dtype="float64"),
            "is_outlier": pd.Series(dtype="int64"),
        })
        d = df.dropna(subset=cols)
        if d.empty:
            return empty
        gv = d[group_col].to_numpy()
        codes, uniq = pd.factorize(gv, sort=True)
        x = d[value_col].to_numpy(np.float64)
        ids = d[id_col].to_numpy(np.int64)
        k_g = len(uniq)
        active = np.ones(len(x), bool)
        cand_g, cand_id, cand_rnd, cand_r = [], [], [], []
        for rnd in range(1, n_rounds + 1):
            gi = codes[active]
            xa = x[active]
            ia = ids[active]
            nn = np.bincount(gi, minlength=k_g).astype(np.float64)
            sx = np.bincount(gi, weights=xa, minlength=k_g)
            sxx = np.bincount(gi, weights=xa * xa, minlength=k_g)
            var_num = sxx - sx * sx / np.where(nn > 0, nn, 1.0)
            ok_g = (nn >= 3) & (var_num > 0)
            if not ok_g.any():
                break
            with np.errstate(invalid="ignore", divide="ignore"):
                mu = sx / nn
                sd = np.sqrt(var_num / (nn - 1.0))
            rr = np.round(np.abs(xa - mu[gi]) / sd[gi], 9)
            keep = ok_g[gi]
            if not keep.any():
                break
            # argmax per group, ties -> smallest id: lexsort is
            # last-key-primary, so order by (group, -rr, id)
            order = np.lexsort((ia[keep], -rr[keep], gi[keep]))
            gk = gi[keep][order]
            first = np.ones(len(gk), bool)
            first[1:] = gk[1:] != gk[:-1]
            sel = order[first]
            sel_rows = np.flatnonzero(active)[np.flatnonzero(keep)[sel]]
            cand_g.append(gv[sel_rows])
            cand_id.append(ids[sel_rows])
            cand_rnd.append(np.full(len(sel_rows), rnd, np.int64))
            cand_r.append(rr[keep][sel])
            active[sel_rows] = False
        if not cand_g:
            return empty
        cg = np.concatenate(cand_g)
        ci = np.concatenate(cand_id)
        cr = np.concatenate(cand_rnd)
        cs = np.concatenate(cand_r)
        lam_arr = np.asarray(lam)[cr - 1]
        out = pd.DataFrame({
            group_col: cg, id_col: ci, "rnd": cr, "r_stat": cs,
            "_sig": (cs > lam_arr).astype(np.int64),
        })
        kmax = out.loc[out["_sig"] == 1].groupby(group_col)["rnd"].max()
        kk = out[group_col].map(kmax).fillna(0).to_numpy(np.int64)
        out["is_outlier"] = (out["rnd"].to_numpy() <= kk).astype(np.int64)
        out["r_stat"] = np.round(out["r_stat"].to_numpy(), round_digits)
        return out.drop(columns=["_sig"])

    proj = ds.select_columns(cols)
    parts = add_bucket_column(proj, group_col, num_buckets)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return kernel(df.drop(columns=[BUCKET_COL]))

    return bucketed_map_groups(
        parts, run, num_buckets=num_buckets, batch_format="pandas")


def ransac_line(
    ds: ray.data.Dataset,
    id_col: str,
    x_col: str,
    y_col: str,
    *,
    num_candidates: int = 8,
    eps: float = 5000.0,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Deterministic RANSAC line fit — the robust-model-fitting family:
    OLS (:func:`group_linear_fit`) is wrecked by a few wild rows, while
    RANSAC fits the CONSENSUS line: propose candidate lines from sampled
    point pairs, count inliers within ``eps`` of each, keep the line the
    most data agrees with. Sampling is derandomized the house way: rows
    rank by the multiplicative hash ``id * 2654435761 mod 2^32`` (ties →
    id), the first ``2*num_candidates`` rows pair up in rank order, and
    candidate i uses pair (2i-1, 2i); degenerate pairs (x1 = x2) are
    skipped on both sides. The winner is (max inliers, ties → smallest
    candidate) — an exact-integer argmax, so cross-engine agreement
    needs no rounding. Output per valid candidate: (cand, a, b, inliers,
    is_best); inlier test is the literally identical ``abs(y - (a +
    b*x)) <= eps`` expression in both engines (same-form rule from
    band_join: never mix abs and BETWEEN forms).

    Scale shape: pass 1 = per-batch top-(2K)-by-hash partials (driver
    merges 2K·blocks tiny rows); pass 2 = candidate models enter each
    batch as closure constants (K floats — no broadcast object needed)
    and each batch emits a K-int inlier-count partial. Zero shuffle.
    """
    import pyarrow as pa

    cols = [id_col, x_col, y_col]
    k2 = 2 * num_candidates

    def top_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=cols)
        ids = d[id_col].to_numpy(np.int64)
        h = (ids * np.int64(2654435761)) % np.int64(4294967296)
        sel = np.lexsort((ids, h))[:k2]
        return pd.DataFrame({
            "_id": ids[sel], "_h": h[sel],
            "_x": d[x_col].to_numpy(np.float64)[sel],
            "_y": d[y_col].to_numpy(np.float64)[sel],
        })

    proj = ds.select_columns(cols)
    top = (proj.map_batches(top_partial, batch_size=None,
                            batch_format="pandas")
           .to_pandas())
    sel = np.lexsort((top["_id"].to_numpy(), top["_h"].to_numpy()))[:k2]
    top = top.iloc[sel].reset_index(drop=True)
    x1 = top["_x"].to_numpy()[0::2]
    y1 = top["_y"].to_numpy()[0::2]
    x2 = top["_x"].to_numpy()[1::2]
    y2 = top["_y"].to_numpy()[1::2]
    npairs = min(len(x1), len(x2))
    x1, y1, x2, y2 = x1[:npairs], y1[:npairs], x2[:npairs], y2[:npairs]
    valid = x1 != x2
    cand = np.arange(1, npairs + 1, dtype=np.int64)[valid]
    with np.errstate(invalid="ignore", divide="ignore"):
        bb = (y2 - y1) / (x2 - x1)
    bb = bb[valid]
    aa = y1[valid] - bb * x1[valid]
    if len(cand) == 0:
        return ray.data.from_arrow(pa.table({
            "cand": pa.array([], pa.int64()),
            "a": pa.array([], pa.float64()),
            "b": pa.array([], pa.float64()),
            "inliers": pa.array([], pa.int64()),
            "is_best": pa.array([], pa.int64()),
        }))

    aa_c, bb_c, eps_c = aa.copy(), bb.copy(), float(eps)

    def count_partial(df: pd.DataFrame, _a=aa_c, _b=bb_c) -> pd.DataFrame:
        d = df.dropna(subset=cols)
        x = d[x_col].to_numpy(np.float64)
        y = d[y_col].to_numpy(np.float64)
        pred = _a[None, :] + x[:, None] * _b[None, :]
        cnt = (np.abs(y[:, None] - pred) <= eps_c).sum(axis=0)
        return pd.DataFrame({"_c": np.arange(len(_a), dtype=np.int64),
                             "_n": cnt.astype(np.int64)})

    counts = (proj.map_batches(count_partial, batch_size=None,
                               batch_format="pandas")
              .to_pandas()
              .groupby("_c", sort=True)["_n"].sum()
              .reindex(np.arange(len(cand)), fill_value=0)
              .to_numpy(np.int64))
    best = np.lexsort((cand, -counts))[0]
    return ray.data.from_arrow(pa.table({
        "cand": pa.array(cand, pa.int64()),
        "a": pa.array(np.round(aa, round_digits), pa.float64()),
        "b": pa.array(np.round(bb, round_digits), pa.float64()),
        "inliers": pa.array(counts, pa.int64()),
        "is_best": pa.array(
            (np.arange(len(cand)) == best).astype(np.int64), pa.int64()),
    }))


def sprt_test(
    ds: ray.data.Dataset,
    ts_col: str,
    success_col: str,
    *,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Wald's sequential probability-ratio test (SPRT) on a Bernoulli
    rate — the SEQUENTIAL-decision family: fixed-horizon tests
    (:func:`welch_t` etc.) are invalid when a metric is peeked at daily,
    while the SPRT's log-likelihood ratio walk ``llr_d = S_d·ln(p1/p0) +
    F_d·ln((1-p1)/(1-p0))`` over cumulative successes/failures may be
    monitored continuously: the first day it crosses ``A = ln((1-β)/α)``
    accepts H1 (rate is p1), the first below ``B = ln(β/(1-α))`` accepts
    H0, and the decision is STICKY from its crossing day on. Output one
    row per day: (day, n, s, llr, state).

    Cross-engine exactness: the four log constants are computed ONCE
    driver-side and injected into the oracle as repr literals (the
    pagerank lesson), so ``llr`` is products of exact int64 counts with
    bit-identical doubles — the boundary compares are exact, no
    tolerance. Scale shape: one pass of per-batch (day, n, Σsuccess)
    partials; the driver folds days × blocks tiny rows. Zero shuffle.
    """
    import pyarrow as pa

    c1 = float(np.log(p1 / p0))
    c2 = float(np.log((1.0 - p1) / (1.0 - p0)))
    a_bound = float(np.log((1.0 - beta) / alpha))
    b_bound = float(np.log(beta / (1.0 - alpha)))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[ts_col, success_col])
        day = d[ts_col].dt.floor("D")
        g = pd.DataFrame({"day": day,
                          "_s": d[success_col].to_numpy(np.int64)})
        out = g.groupby("day", sort=False).agg(
            _n=("_s", "size"), _ss=("_s", "sum")).reset_index()
        return out

    m = (
        ds.select_columns([ts_col, success_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
        .groupby("day", sort=True)[["_n", "_ss"]].sum()
        .reset_index()
    )
    cn = m["_n"].to_numpy(np.int64).cumsum()
    cs = m["_ss"].to_numpy(np.int64).cumsum()
    llr = cs * c1 + (cn - cs) * c2
    up = np.flatnonzero(llr >= a_bound)
    dn = np.flatnonzero(llr <= b_bound)
    d1 = up[0] if len(up) else None
    d0 = dn[0] if len(dn) else None
    state = np.full(len(m), "continue", dtype=object)
    if d1 is not None and (d0 is None or d1 <= d0):
        state[d1:] = "accept_h1"
    elif d0 is not None:
        state[d0:] = "accept_h0"
    return ray.data.from_arrow(pa.table({
        "day": pa.array(m["day"].astype("datetime64[us]")),
        "n": pa.array(cn, pa.int64()),
        "s": pa.array(cs, pa.int64()),
        "llr": pa.array(np.round(llr, round_digits), pa.float64()),
        "state": pa.array(state.astype(str)),
    }))


def sprt_constants(p0, p1, alpha=0.05, beta=0.2):
    """The injected-literal constants shared by sprt_test and its oracle."""
    return (
        float(np.log(p1 / p0)),
        float(np.log((1.0 - p1) / (1.0 - p0))),
        float(np.log((1.0 - beta) / alpha)),
        float(np.log(beta / (1.0 - alpha))),
    )


def granger_test(
    ds: ray.data.Dataset,
    ts_col: str,
    type_col: str,
    *,
    cause_type: str,
    effect_type: str,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Lag-1 Granger causality between two daily event series — the
    DIRECTED member of the time-series-dependence family
    (:func:`cross_correlation` is symmetric): does yesterday's
    ``cause_type`` count improve today's ``effect_type`` forecast beyond
    its own history? Restricted model ``y_t ~ 1 + y_{t-1}`` vs full
    ``y_t ~ 1 + y_{t-1} + x_{t-1}`` (consecutive OBSERVED days — lag =
    previous row in day order, both engines), F = (RSS_r − RSS_f)·(n−3)
    / RSS_f with both RSS in closed centered-moment form (explicit-sum
    mirror, never regr_* — the welch_t convention). Output one row:
    (n, beta_self, beta_cause, rss_r, rss_f, f_stat); null F when the
    design degenerates (det ≤ 0, zero self-variance, RSS_f ≤ 0 — oracle
    CASE mirror).

    Scale shape: one pass of per-batch (day, x, y) count partials — the
    driver folds days × blocks tiny rows; daily counts are exact int64
    so every moment is exact and the closed forms see bit-identical
    inputs in both engines. Zero shuffle.
    """
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[ts_col, type_col])
        d = d[d[type_col].isin([cause_type, effect_type])]
        day = d[ts_col].dt.floor("D")
        g = pd.DataFrame({
            "day": day,
            "_x": (d[type_col] == cause_type).to_numpy(np.int64),
            "_y": (d[type_col] == effect_type).to_numpy(np.int64),
        })
        return g.groupby("day", sort=False)[["_x", "_y"]].sum().reset_index()

    m = (
        ds.select_columns([ts_col, type_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
        .groupby("day", sort=True)[["_x", "_y"]].sum()
        .reset_index()
    )
    x = m["_x"].to_numpy(np.float64)
    y = m["_y"].to_numpy(np.float64)
    u, w, yy = y[:-1], x[:-1], y[1:]
    n = np.float64(len(yy))
    out = dict(n=np.int64(len(yy)), beta_self=np.nan, beta_cause=np.nan,
               rss_r=np.nan, rss_f=np.nan, f_stat=np.nan)
    if len(yy) >= 4:
        su, sw, sy = u.sum(), w.sum(), yy.sum()
        suu, sww, syy = (u * u).sum(), (w * w).sum(), (yy * yy).sum()
        suy, swy, suw = (u * yy).sum(), (w * yy).sum(), (u * w).sum()
        suu_c = suu - su * su / n
        sww_c = sww - sw * sw / n
        syy_c = syy - sy * sy / n
        suy_c = suy - su * sy / n
        swy_c = swy - sw * sy / n
        suw_c = suw - su * sw / n
        det = suu_c * sww_c - suw_c * suw_c
        if suu_c > 0 and det > 0:
            rss_r = syy_c - suy_c * suy_c / suu_c
            b = (suy_c * sww_c - swy_c * suw_c) / det
            c = (swy_c * suu_c - suy_c * suw_c) / det
            rss_f = syy_c - b * suy_c - c * swy_c
            out.update(beta_self=b, beta_cause=c, rss_r=rss_r,
                       rss_f=rss_f)
            if rss_f > 0:
                out["f_stat"] = (rss_r - rss_f) * (n - 3.0) / rss_f
    return ray.data.from_arrow(pa.table({
        "n": pa.array([out["n"]], pa.int64()),
        "beta_self": pa.array([np.round(out["beta_self"], round_digits)],
                              pa.float64()),
        "beta_cause": pa.array([np.round(out["beta_cause"], round_digits)],
                               pa.float64()),
        "rss_r": pa.array([np.round(out["rss_r"], round_digits)],
                          pa.float64()),
        "rss_f": pa.array([np.round(out["rss_f"], round_digits)],
                          pa.float64()),
        "f_stat": pa.array([np.round(out["f_stat"], round_digits)],
                           pa.float64()),
    }))


def t_closeness(
    ds: ray.data.Dataset,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    *,
    t: float = 0.2,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """t-closeness audit — the distributional member of the
    k_anonymity / l_diversity privacy family (Li et al.): a class can be
    k-anonymous AND l-diverse yet still leak if its sensitive-value
    DISTRIBUTION differs sharply from the table's. Per quasi-identifier
    class, the Earth Mover's Distance between the class distribution p
    and the global distribution q under the ORDERED-distance ground
    metric (the numeric-attribute form): with the global distinct
    sensitive values as the m-point domain in ascending order,

        emd = Σ_{i=1..m−1} |Σ_{j<=i} (p_j − q_j)| / (m − 1)

    (equally-spaced ranks, so emd ∈ [0, 1]; m == 1 ⇒ 0). Output per
    class: quasi cols, n, emd, is_risky = emd > t. Null quasi or
    sensitive values are excluded on both sides.

    Scale shape: per-block (class..., value) count partials — the
    exchange moves counts, never rows; ONE hash on the first quasi
    column co-locates each class. The GLOBAL distribution is
    domain-bounded (distinct sensitive values — keep the sensitive
    column discretized upstream), merged driver-side from per-block
    value counts and shipped into every bucket kernel as a closure
    constant; each class then costs one searchsorted scatter + one
    cumsum over the m-point grid, vectorized across the bucket's
    classes via a segmented reshape.
    """
    import pyarrow as pa

    quasi_cols = list(quasi_cols)
    all_cols = quasi_cols + [sensitive_col]

    def vpartial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=all_cols)
        g = d.groupby(sensitive_col, sort=False, observed=True).size()
        return g.rename("_n").reset_index()

    gl = (
        ds.select_columns(all_cols)
        .map_batches(vpartial, batch_size=None, batch_format="pandas")
        .to_pandas()
        .groupby(sensitive_col, sort=True)["_n"].sum()
    )
    domain = gl.index.to_numpy()
    q = gl.to_numpy(np.float64) / float(gl.sum())
    m = len(domain)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=all_cols)
        g = d.groupby(all_cols, sort=False, observed=True).size()
        return g.rename("_c").reset_index()

    parts = ds.select_columns(all_cols).map_batches(
        partial, batch_size=None, batch_format="pandas"
    )
    parts = add_bucket_column(parts, quasi_cols[0], num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        g = df.groupby(all_cols, sort=True, observed=True)["_c"].sum()
        d = g.reset_index()
        if not len(d):
            out = pd.DataFrame({c: pd.Series(dtype=df[c].dtype)
                                for c in quasi_cols})
            out["n"] = pd.Series(dtype=np.int64)
            out["emd"] = pd.Series(dtype=np.float64)
            out["is_risky"] = pd.Series(dtype=np.int64)
            return out
        keys = d[quasi_cols].apply(tuple, axis=1).to_numpy()
        new = np.ones(len(d), dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        cls_id = np.cumsum(new) - 1
        n_cls = cls_id[-1] + 1
        pos = np.searchsorted(domain, d[sensitive_col].to_numpy())
        c = d["_c"].to_numpy(np.float64)
        grid = np.zeros((n_cls, m), np.float64)
        grid[cls_id, pos] = c
        nc = grid.sum(axis=1)
        p = grid / nc[:, None]
        cum = np.cumsum(p - q[None, :], axis=1)
        emd = (np.abs(cum[:, :-1]).sum(axis=1) / (m - 1)
               if m > 1 else np.zeros(n_cls))
        first = np.where(new)[0]
        out = d.iloc[first][quasi_cols].reset_index(drop=True)
        out["n"] = nc.astype(np.int64)
        out["emd"] = np.round(emd, round_digits)
        out["is_risky"] = (emd > t).astype(np.int64)
        return out

    return bucketed_map_groups(
        parts, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def bradley_terry(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    type_col: str,
    iters: int = 12,
    smoothing: float = 0.5,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Bradley-Terry preference strengths over the item (type) vocabulary
    — the pairwise-comparison ranking family behind preference-data
    curation (RLHF reward-model inputs, judge-vote aggregation): within
    each (entity, day) cell, every ordered pair of types where one has
    STRICTLY more events than the other is one comparison won by the
    more frequent type (counts are exact ints, so the win relation is
    engine-exact; equal counts produce no comparison). ``smoothing``
    pseudo-wins are added to EVERY ordered item pair (Davidson-style
    regularization) so the comparison graph is strongly connected and
    the fixed-schedule MM iteration (Hunter 2004) is well-defined for
    zero-win items:

        raw_i = W_i / sum_j  g_ij / (p_i + p_j);   p <- raw / sum(raw)

    run ``iters`` rounds from uniform with NO convergence test — the
    oracle mirrors the identical schedule as unrolled matrix-product
    CTEs (the :func:`~featherstore_ray.stages.window.markov_stationary`
    convention). Output: (item, score, wins, losses) with raw integer
    win/loss counts alongside the smoothed score.

    Scale shape: ONE hash(entity) exchange whose kernel reduces each
    bucket to (winner, loser, count) partials — comparisons never leave
    their (entity, day) cell and the exchange output is at most
    |types|^2 rows per bucket; the driver folds a K x K contingency
    (K = type vocabulary, bounded) and iterates in-memory.
    """
    import pyarrow as pa

    proj = ds.select_columns([entity_col, ts_col, type_col])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "_w": pd.Series(dtype="object"),
            "_l": pd.Series(dtype="object"),
            "_c": pd.Series(dtype="int64"),
        })
        df = df.dropna(subset=[entity_col, ts_col, type_col])
        if df.empty:
            return empty
        day = df[ts_col].dt.floor("D")
        cnt = (
            df.assign(_d=day)
            .groupby([entity_col, "_d", type_col], sort=False)
            .size().rename("_n").reset_index()
        )
        m = cnt.merge(cnt, on=[entity_col, "_d"], suffixes=("_a", "_b"))
        m = m[m["_n_a"] > m["_n_b"]]
        if m.empty:
            return empty
        out = (
            m.groupby([type_col + "_a", type_col + "_b"], sort=False)
            .size().rename("_c").reset_index()
        )
        out.columns = ["_w", "_l", "_c"]
        return out

    parts = bucketed_map_groups(
        add_bucket_column(proj, entity_col, num_buckets),
        lambda df: kernel(df.drop(columns=[BUCKET_COL])),
        num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()
    # all-typed-empty buckets surface as a columnless frame through
    # to_pandas (Ray drops the schema) — treat as "no comparisons"
    if parts.empty:
        parts = pd.DataFrame({"_w": [], "_l": [], "_c": []})
    cnt = parts.groupby(["_w", "_l"], sort=True)["_c"].sum().reset_index()
    if cnt.empty:
        return ray.data.from_arrow(pa.table({
            "item": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
            "wins": pa.array([], pa.int64()),
            "losses": pa.array([], pa.int64()),
        }))
    items = np.sort(np.unique(np.concatenate(
        [cnt["_w"].to_numpy(), cnt["_l"].to_numpy()])))
    idx = {t: i for i, t in enumerate(items)}
    k = len(items)
    C = np.zeros((k, k), np.float64)
    C[cnt["_w"].map(idx).to_numpy(np.int64),
      cnt["_l"].map(idx).to_numpy(np.int64)] = cnt["_c"].to_numpy(np.float64)
    wins_raw = C.sum(axis=1).astype(np.int64)
    losses_raw = C.sum(axis=0).astype(np.int64)
    S = C + smoothing * (1.0 - np.eye(k))
    W = S.sum(axis=1)
    G = S + S.T  # games matrix; zero diagonal
    p = np.full(k, 1.0 / k)
    for _ in range(iters):
        denom = np.where(G > 0, G / (p[:, None] + p[None, :]), 0.0).sum(axis=1)
        raw = W / denom
        p = raw / raw.sum()
    return ray.data.from_arrow(pa.table({
        "item": pa.array(items.astype(str)),
        "score": pa.array(np.round(p, round_digits), pa.float64()),
        "wins": pa.array(wins_raw, pa.int64()),
        "losses": pa.array(losses_raw, pa.int64()),
    }))


def permutation_test(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    group_a,
    group_b,
    n_perm: int = 200,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Monte-Carlo randomization test for the difference of means between
    two groups — the hypothesis-testing sibling of :func:`bootstrap_ci`
    (which estimates a CI by resampling): under the exchangeability
    null, rows are randomly REASSIGNED to pseudo-groups and the observed
    difference is ranked inside the permutation distribution.
    Reassignment is the deterministic multiplicative-hash convention
    (mirrorable in SQL, no RNG state):

        pseudo-A(row, p)  <=>  ((id*1000003 + p*999983) % 2147483647)
                                   % n_total  <  n_a

    which keeps pseudo-group sizes near the observed split (hash-
    Bernoulli randomization; sizes vary hypergeometric-ish per draw —
    documented variant of the fixed-margin Fisher test). Permutations
    with an empty pseudo-group are excluded on BOTH sides; extremeness
    compares |d_p| >= |d_obs| at 9dp rounding (the changepoint
    convention, so a permutation that exactly reproduces the observed
    split can't flip across engines); p = (1 + n_extreme) / (1 + B_eff)
    (add-one Monte-Carlo correction). Output one row:
    (d_obs, n_perm_eff, n_extreme, p_value).

    Scale shape: two streaming passes, ZERO shuffles. Pass 1 folds the
    4 exact group moments (n, n_a, S, S_a). Pass 2 emits per-perm
    (sum_a, cnt_a) partials via one boolean-mask matmul per batch; the
    driver folds B x 2 scalars. d_p uses the complement form
    (S - s_a) / (N - c_a), mirrored literally in the oracle.
    """
    import pyarrow as pa

    proj = ds.select_columns([group_col, value_col, id_col]).materialize()

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[group_col, value_col, id_col])
        df = df[df[group_col].isin([group_a, group_b])]
        v = df[value_col].to_numpy(np.float64)
        is_a = (df[group_col] == group_a).to_numpy()
        return pd.DataFrame({
            "_n": [len(v)], "_na": [int(is_a.sum())],
            "_s": [float(v.sum())], "_sa": [float(v[is_a].sum())],
        })

    m = proj.map_batches(moments, batch_size=None,
                         batch_format="pandas").to_pandas()
    n = int(m["_n"].sum())
    n_a = int(m["_na"].sum())
    s = float(m["_s"].sum())
    s_a = float(m["_sa"].sum())
    if n_a == 0 or n_a == n:
        return ray.data.from_arrow(pa.table({
            "d_obs": pa.array([None], pa.float64()),
            "n_perm_eff": pa.array([0], pa.int64()),
            "n_extreme": pa.array([0], pa.int64()),
            "p_value": pa.array([None], pa.float64()),
        }))
    d_obs = s_a / n_a - (s - s_a) / (n - n_a)

    def perm_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[group_col, value_col, id_col])
        df = df[df[group_col].isin([group_a, group_b])]
        perms = np.arange(1, n_perm + 1, dtype=np.int64)
        if df.empty:
            return pd.DataFrame({
                "_p": perms, "_psa": np.zeros(n_perm),
                "_pca": np.zeros(n_perm, np.int64),
            })
        v = df[value_col].to_numpy(np.float64)
        ids = df[id_col].to_numpy(np.int64)
        h = (ids[:, None] * 1000003 + perms[None, :] * 999983) \
            % 2147483647
        mask = (h % n) < n_a
        return pd.DataFrame({
            "_p": perms,
            "_psa": v @ mask,
            "_pca": mask.sum(axis=0).astype(np.int64),
        })

    parts = proj.map_batches(perm_partial, batch_size=None,
                             batch_format="pandas").to_pandas()
    g = parts.groupby("_p", sort=True)[["_psa", "_pca"]].sum()
    sa = g["_psa"].to_numpy(np.float64)
    ca = g["_pca"].to_numpy(np.int64)
    ok = (ca > 0) & (ca < n)
    dp = sa[ok] / ca[ok] - (s - sa[ok]) / (n - ca[ok])
    extreme = int((np.round(np.abs(dp), 9)
                   >= np.round(abs(d_obs), 9)).sum())
    b_eff = int(ok.sum())
    return ray.data.from_arrow(pa.table({
        "d_obs": pa.array([round(d_obs, round_digits)], pa.float64()),
        "n_perm_eff": pa.array([b_eff], pa.int64()),
        "n_extreme": pa.array([extreme], pa.int64()),
        "p_value": pa.array([round((1 + extreme) / (1 + b_eff),
                                   round_digits)], pa.float64()),
    }))


def mondrian_anonymize(
    ds: ray.data.Dataset,
    qi_cols: Sequence[str],
    *,
    k: int = 25,
    depth: int = 4,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Mondrian multidimensional k-anonymization (LeFevre et al. 2006)
    — the privacy TRANSFORM completing the audit family
    (:func:`k_anonymity` / ``l_diversity`` / ``t_closeness`` measure
    re-identification risk; this produces the generalized release):
    ``depth`` fixed levels of round-robin median splits over the numeric
    quasi-identifier columns; a partition splits at level ``d`` on
    ``qi_cols[(d-1) % len(qi_cols)]`` at its exact interpolated median
    (``np.quantile`` linear == DuckDB ``quantile_cont`` — the theil_sen
    identity) ONLY when both children keep >= ``k`` rows (rows with
    ``v <= median`` go left); partition ids extend ``pid*2 + b`` every
    level (b = 0 for unsplit partitions), so ids stay unique and the
    oracle unrolls one window-CTE pair per level. Output one row per
    final partition: (pid, n, <col>_lo, <col>_hi per QI) — the
    generalized ranges; bounds are exact input values (no rounding).

    Scale shape: one hash(pid) exchange per level; exact medians need
    each partition whole in its bucket (the winsorize contract — level
    1 is a single partition, so the first split is the one inherently
    serial exact step; the 100 TB path swaps ``np.quantile`` for the
    mergeable t-digest sketch at the cost of the exact-mirror oracle).
    Null QI rows are out of contract (filtered on both sides).
    """
    import pyarrow as pa

    qi = list(qi_cols)

    def init(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=qi)
        out = df[qi].astype(np.float64)
        out["_pid"] = np.int64(0)
        return out

    cur = ds.select_columns(qi).map_batches(
        init, batch_size=None, batch_format="pandas")

    for d in range(1, depth + 1):
        col = qi[(d - 1) % len(qi)]

        def make_level(col: str):
            def level(df: pd.DataFrame) -> pd.DataFrame:
                df = df.drop(columns=[BUCKET_COL])
                if df.empty:
                    return df
                outs = []
                for pid, g in df.groupby("_pid", sort=True):
                    v = g[col].to_numpy(np.float64)
                    med = float(np.quantile(v, 0.5))
                    nl = int((v <= med).sum())
                    b = (np.zeros(len(g), np.int64)
                         if nl < k or len(g) - nl < k
                         else (v > med).astype(np.int64))
                    g = g.copy()
                    g["_pid"] = g["_pid"].to_numpy(np.int64) * 2 + b
                    outs.append(g)
                return pd.concat(outs, ignore_index=True)
            return level

        cur = bucketed_map_groups(
            add_bucket_column(cur, "_pid", num_buckets),
            make_level(col), num_buckets=num_buckets,
            batch_format="pandas",
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        aggs = {f"{c}_lo": (c, "min") for c in qi}
        aggs.update({f"{c}_hi": (c, "max") for c in qi})
        g = df.groupby("_pid", sort=True).agg(n=("_pid", "size"), **aggs)
        return g.reset_index().rename(columns={"_pid": "pid"})

    parts = cur.map_batches(partial, batch_size=None,
                            batch_format="pandas").to_pandas()
    if parts.empty:
        cols = {"pid": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        for c in qi:
            cols[f"{c}_lo"] = pa.array([], pa.float64())
            cols[f"{c}_hi"] = pa.array([], pa.float64())
        return ray.data.from_arrow(pa.table(cols))
    g = parts.groupby("pid", sort=True)
    out = pd.DataFrame({"pid": np.array(sorted(parts["pid"].unique()),
                                        np.int64)})
    out = out.set_index("pid")
    out["n"] = g["n"].sum().astype(np.int64)
    for c in qi:
        out[f"{c}_lo"] = g[f"{c}_lo"].min()
        out[f"{c}_hi"] = g[f"{c}_hi"].max()
    return ray.data.from_arrow(
        pa.Table.from_pandas(out.reset_index(), preserve_index=False))


def elo_ratings(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    type_col: str,
    k_factor: float = 16.0,
    initial: float = 1000.0,
    max_days: int = 31,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Daily-batch Elo ratings of the item (type) vocabulary — the
    SEQUENTIAL sibling of :func:`bradley_terry` (BT fits one static
    strength by MLE; Elo tracks ratings THROUGH time, so early and late
    form differ): the same exact-int win relation (within each (entity,
    day) cell the strictly-more-frequent type beats the other), but
    matches are replayed day by day. All of day d's matches score
    against START-of-day ratings (batch variant — order within a day
    cannot matter, which is what makes the op deterministic and
    mirrorable); for a match w beats l with start ratings r_w, r_l:

        e = 1 / (1 + 10^((r_l - r_w) / 400))
        delta_w += K * n * (1 - e);   delta_l -= K * n * (1 - e)

    Exactly ``max_days`` update steps run on BOTH sides (days are
    dense-ranked ascending; ranks past the data's last day add exact
    0.0 — the oracle unrolls one step-CTE per rank, so the schedule
    must be fixed). Output: (item, rating, wins, losses) with raw
    integer win/loss counts.

    Scale shape: ONE hash(entity) exchange whose kernel reduces each
    bucket to (day, winner, loser, count) partials; the driver folds a
    days x K^2-bounded table and replays in-memory (K = type
    vocabulary, days bounded by contract).
    """
    import pyarrow as pa

    proj = ds.select_columns([entity_col, ts_col, type_col])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "_d": pd.Series(dtype="datetime64[ns]"),
            "_w": pd.Series(dtype="object"),
            "_l": pd.Series(dtype="object"),
            "_c": pd.Series(dtype="int64"),
        })
        df = df.dropna(subset=[entity_col, ts_col, type_col])
        if df.empty:
            return empty
        day = df[ts_col].dt.floor("D")
        cnt = (
            df.assign(_d=day)
            .groupby([entity_col, "_d", type_col], sort=False)
            .size().rename("_n").reset_index()
        )
        m = cnt.merge(cnt, on=[entity_col, "_d"], suffixes=("_a", "_b"))
        m = m[m["_n_a"] > m["_n_b"]]
        if m.empty:
            return empty
        out = (
            m.groupby(["_d", type_col + "_a", type_col + "_b"],
                      sort=False)
            .size().rename("_c").reset_index()
        )
        out.columns = ["_d", "_w", "_l", "_c"]
        return out

    parts = bucketed_map_groups(
        add_bucket_column(proj, entity_col, num_buckets),
        lambda df: kernel(df.drop(columns=[BUCKET_COL])),
        num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()
    if parts.empty:
        parts = pd.DataFrame({"_d": pd.Series(dtype="datetime64[ns]"),
                              "_w": [], "_l": [], "_c": []})
    cnt = (parts.groupby(["_d", "_w", "_l"], sort=True)["_c"]
           .sum().reset_index())
    if cnt.empty:
        return ray.data.from_arrow(pa.table({
            "item": pa.array([], pa.string()),
            "rating": pa.array([], pa.float64()),
            "wins": pa.array([], pa.int64()),
            "losses": pa.array([], pa.int64()),
        }))
    items = np.sort(np.unique(np.concatenate(
        [cnt["_w"].to_numpy(), cnt["_l"].to_numpy()])))
    idx = {t: i for i, t in enumerate(items)}
    days = np.sort(cnt["_d"].unique())
    drank = {d: i + 1 for i, d in enumerate(days)}
    di = cnt["_d"].map(drank).to_numpy(np.int64)
    wi = cnt["_w"].map(idx).to_numpy(np.int64)
    li = cnt["_l"].map(idx).to_numpy(np.int64)
    cc = cnt["_c"].to_numpy(np.float64)
    r = np.full(len(items), initial, np.float64)
    for step in range(1, max_days + 1):
        sel = di == step
        if not sel.any():
            continue
        w, l, n = wi[sel], li[sel], cc[sel]
        e = 1.0 / (1.0 + np.power(10.0, (r[l] - r[w]) / 400.0))
        delta = np.zeros(len(items), np.float64)
        np.add.at(delta, w, k_factor * n * (1.0 - e))
        np.add.at(delta, l, -k_factor * n * (1.0 - e))
        r = r + delta
    wins = np.zeros(len(items), np.int64)
    losses = np.zeros(len(items), np.int64)
    np.add.at(wins, wi, cc.astype(np.int64))
    np.add.at(losses, li, cc.astype(np.int64))
    return ray.data.from_arrow(pa.table({
        "item": pa.array(items.astype(str)),
        "rating": pa.array(np.round(r, round_digits), pa.float64()),
        "wins": pa.array(wins, pa.int64()),
        "losses": pa.array(losses, pa.int64()),
    }))


def mcnemar_test(
    ds: ray.data.Dataset,
    entity_col: str,
    x_col: str,
    y_col: str,
    *,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """McNemar's test for PAIRED binary outcomes — the within-subject
    member of the test family (welch_t / mann_whitney compare
    independent groups; chi2 tests unpaired association; McNemar asks
    "did the SAME entities flip state", so concordant pairs carry no
    information): per entity, x = any(x_col), y = any(y_col); with
    discordant counts b = #(1,0) and c = #(0,1),

        stat = (|b - c| - 1)^2 / (b + c)     (continuity-corrected;
                                              NULL when b + c = 0)

    All counts are exact ints, so the statistic is engine-exact.
    Output one row: (n_pairs, n00, n01, n10, n11, stat) where nXY
    counts entities with x=X, y=Y.

    Scale shape: per-batch per-entity OR partials, ONE hash(entity)
    exchange whose kernel folds its bucket's entities to five ints;
    the driver sums buckets x 5 scalars.
    """
    import pyarrow as pa

    proj = ds.select_columns([entity_col, x_col, y_col])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[entity_col])
        g = (df.assign(_x=df[x_col].fillna(False).astype(bool),
                       _y=df[y_col].fillna(False).astype(bool))
             .groupby(entity_col, sort=False)[["_x", "_y"]].any()
             .reset_index())
        return g

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({
                "_n00": pd.Series(dtype="int64"),
                "_n01": pd.Series(dtype="int64"),
                "_n10": pd.Series(dtype="int64"),
                "_n11": pd.Series(dtype="int64"),
            })
        g = df.groupby(entity_col, sort=False)[["_x", "_y"]].any()
        x = g["_x"].to_numpy()
        y = g["_y"].to_numpy()
        return pd.DataFrame({
            "_n00": [int((~x & ~y).sum())],
            "_n01": [int((~x & y).sum())],
            "_n10": [int((x & ~y).sum())],
            "_n11": [int((x & y).sum())],
        })

    m = bucketed_map_groups(
        add_bucket_column(
            proj.map_batches(partial, batch_size=None,
                             batch_format="pandas"),
            entity_col, num_buckets),
        cells, num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()
    n00 = int(m["_n00"].sum()) if not m.empty else 0
    n01 = int(m["_n01"].sum()) if not m.empty else 0
    n10 = int(m["_n10"].sum()) if not m.empty else 0
    n11 = int(m["_n11"].sum()) if not m.empty else 0
    b, c = n10, n01
    stat = (None if b + c == 0
            else round((abs(b - c) - 1) ** 2 / (b + c), round_digits))
    return ray.data.from_arrow(pa.table({
        "n_pairs": pa.array([n00 + n01 + n10 + n11], pa.int64()),
        "n00": pa.array([n00], pa.int64()),
        "n01": pa.array([n01], pa.int64()),
        "n10": pa.array([n10], pa.int64()),
        "n11": pa.array([n11], pa.int64()),
        "stat": pa.array([stat], pa.float64()),
    }))


def rollup_agg(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    value_col: str,
    *,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """OLAP ROLLUP in one exchange — every prefix level of ``keys``
    aggregated at once (the SQL ``GROUP BY ROLLUP`` contract: rolled-up
    key columns are NULL, ``level`` = number of rolled-up keys, grand
    total = ``len(keys)``). Output per group: (level, *keys, n, sum_v,
    mean_v); sums and means rounded at ``round_digits`` (summation
    order differs across engines), counts exact. Rows with a null key
    are out of contract (filtered both sides — the null-group-key
    lesson: a data null would be indistinguishable from a rollup
    marker).

    Scale shape: every rollup level groups by a PREFIX starting with
    ``keys[0]``, so ONE hash(keys[0]) exchange co-locates all levels of
    a key-slice; the kernel emits every non-total level for its bucket
    and (1, sum, count) scalars for the driver-folded grand total.
    """
    import pyarrow as pa

    ks = list(keys)
    proj = ds.select_columns(ks + [value_col])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).dropna(subset=ks + [value_col])
        df = df.copy()
        for c in ks:  # object keys keep concat dtype-stable with None pads
            df[c] = df[c].astype(object)
        frames = []
        for lvl in range(len(ks)):  # 0 = finest .. len-1 = keys[0] only
            gk = ks[: len(ks) - lvl]
            g = (df.groupby(gk, sort=True)[value_col]
                 .agg(["size", "sum"]).reset_index())
            for c in ks[len(ks) - lvl:]:
                g[c] = pd.Series([None] * len(g), dtype="object")
            g["level"] = np.int64(lvl)
            frames.append(g)
        tot = pd.DataFrame({"size": [np.int64(len(df))],
                            "sum": [float(df[value_col].sum())],
                            "level": [-1]})
        for c in ks:
            tot[c] = pd.Series([None], dtype="object")
        frames.append(tot)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", FutureWarning)
            out = pd.concat(frames, ignore_index=True)
        return out[["level"] + ks + ["size", "sum"]]

    parts = bucketed_map_groups(
        add_bucket_column(proj, ks[0], num_buckets),
        kernel, num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()
    out_cols = ["level"] + ks + ["n", "sum_v", "mean_v"]
    if parts.empty:
        empty = {c: pa.array([], pa.int64()) for c in ["level", "n"]}
        return ray.data.from_arrow(pa.table(
            {"level": pa.array([], pa.int64()),
             **{c: pa.array([], pa.string()) for c in ks},
             "n": pa.array([], pa.int64()),
             "sum_v": pa.array([], pa.float64()),
             "mean_v": pa.array([], pa.float64())}))
    lv = parts[parts["level"] >= 0].copy()
    tot = parts[parts["level"] < 0]
    out = lv.reset_index(drop=True)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", FutureWarning)
        out.loc[len(out)] = {**{c: None for c in ks},
                             "level": np.int64(len(ks)),
                             "size": np.int64(tot["size"].sum()),
                             "sum": float(tot["sum"].sum())}
    out["n"] = out["size"].astype(np.int64)
    out["mean_v"] = np.round(out["sum"].to_numpy(np.float64)
                             / out["n"].to_numpy(np.float64),
                             round_digits)
    out["sum_v"] = np.round(out["sum"].to_numpy(np.float64),
                            round_digits)
    return ray.data.from_arrow(
        pa.Table.from_pandas(out[out_cols], preserve_index=False))


def profile_table(
    ds: ray.data.Dataset,
    columns: Sequence[str] | None = None,
    *,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Data-profiling summary — the first thing a pipeline author runs
    against an unknown 100 TB table: one output row per column with
    (col, n, nulls, n_distinct, min_v, max_v, mean_v, min_s, max_s).
    Numerics fill the ``_v`` triple (exact min/max, mean rounded);
    timestamps fill min_v/max_v as exact epoch-microsecond doubles
    (mean is NULL — a cross-engine sum of ~1e15-magnitude values
    carries absolute noise far above the 6dp compare, the documented
    large-magnitude-mean contract); strings fill min_s/max_s (binary
    collation — ASCII contract). ``n_distinct`` is EXACT.

    Scale shape: per column, one zero-shuffle moment pass plus one
    value-bucket exchange of per-batch-distinct values (each distinct
    value is counted in exactly one bucket — the count_distinct
    pattern); 2 x |columns| bounded passes, each column-pruned.
    """
    import pyarrow as pa

    schema = pa.schema(ds.schema().base_schema)
    cols = list(columns) if columns else [f.name for f in schema]
    out_rows = []
    for c in cols:
        typ = schema.field(c).type
        if pa.types.is_integer(typ) or pa.types.is_floating(typ):
            kind = "num"
        elif pa.types.is_timestamp(typ):
            kind = "ts"
        else:
            kind = "str"
        proj = ds.select_columns([c])

        def moments(df: pd.DataFrame, c=c, kind=kind) -> pd.DataFrame:
            s = df[c]
            v = s.dropna()
            row = {"_n": np.int64(len(s)),
                   "_nulls": np.int64(s.isna().sum()),
                   "_min_v": np.nan, "_max_v": np.nan, "_sum": np.nan,
                   "_min_s": None, "_max_s": None}
            if len(v):
                if kind == "num":
                    x = v.to_numpy(np.float64)
                    row.update(_min_v=x.min(), _max_v=x.max(),
                               _sum=x.sum())
                elif kind == "ts":
                    x = v.to_numpy("datetime64[us]").view(np.int64)
                    row.update(_min_v=float(x.min()),
                               _max_v=float(x.max()))
                else:
                    row.update(_min_s=v.min(), _max_s=v.max())
            return pd.DataFrame([row])

        m = proj.map_batches(moments, batch_size=None,
                             batch_format="pandas").to_pandas()

        def uniq(df: pd.DataFrame, c=c, kind=kind) -> pd.DataFrame:
            v = df[c].dropna().drop_duplicates()
            if kind == "ts":
                v = pd.Series(v.to_numpy("datetime64[us]").view(np.int64))
            return pd.DataFrame({"_v": v.to_numpy()})

        def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "_nd": [np.int64(df["_v"].nunique())]})

        nd = int(bucketed_map_groups(
            add_bucket_column(
                proj.map_batches(uniq, batch_size=None,
                                 batch_format="pandas"),
                "_v", num_buckets),
            lambda df: bucket_count(df.drop(columns=[BUCKET_COL])),
            num_buckets=num_buckets, batch_format="pandas",
        ).to_pandas()["_nd"].sum())

        n = int(m["_n"].sum())
        nulls = int(m["_nulls"].sum())
        nn = n - nulls
        min_v = max_v = mean_v = None
        min_s = max_s = None
        if nn:
            if kind in ("num", "ts"):
                min_v = float(np.nanmin(m["_min_v"].to_numpy()))
                max_v = float(np.nanmax(m["_max_v"].to_numpy()))
                if kind == "num":
                    mean_v = round(float(np.nansum(
                        m["_sum"].to_numpy())) / nn, round_digits)
            else:
                ss = m["_min_s"].dropna()
                min_s = ss.min() if len(ss) else None
                ss = m["_max_s"].dropna()
                max_s = ss.max() if len(ss) else None
        out_rows.append((c, n, nulls, nd, min_v, max_v, mean_v,
                         min_s, max_s))
    return ray.data.from_arrow(pa.table({
        "col": pa.array([r[0] for r in out_rows], pa.string()),
        "n": pa.array([r[1] for r in out_rows], pa.int64()),
        "nulls": pa.array([r[2] for r in out_rows], pa.int64()),
        "n_distinct": pa.array([r[3] for r in out_rows], pa.int64()),
        "min_v": pa.array([r[4] for r in out_rows], pa.float64()),
        "max_v": pa.array([r[5] for r in out_rows], pa.float64()),
        "mean_v": pa.array([r[6] for r in out_rows], pa.float64()),
        "min_s": pa.array([r[7] for r in out_rows], pa.string()),
        "max_s": pa.array([r[8] for r in out_rows], pa.string()),
    }))


def ab_power(
    ds: ray.data.Dataset,
    entity_col: str,
    arm_col: str,
    conv_col: str,
    *,
    z_alpha: float = 1.959963984540054,   # two-sided 5%
    z_beta: float = 0.8416212335729143,   # 80% power
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Experiment power / MDE audit — the DESIGN member of the
    experimentation family (welch_t/mann_whitney test an effect,
    cuped_adjust reduces variance; this asks "could this experiment
    even have detected its effect, and what is the smallest effect it
    could see"): per entity, arm = any(arm_col), converted =
    any(conv_col); with arm conversion rates p_a, p_b on n_a, n_b
    entities,

        se    = sqrt(p_a(1-p_a)/n_a + p_b(1-p_b)/n_b)
        z     = |p_a - p_b| / se
        power = Phi(z - z_alpha)        (the standard one-tail
                                         approximation of two-sided
                                         power — documented variant)
        mde   = (z_alpha + z_beta) * se

    Phi is the Abramowitz-Stegun 26.2.17 polynomial evaluated with the
    IDENTICAL literals and Horner order in both engines (no erf in
    either), so the smooth chain mirrors to 6dp. Counts are exact
    ints. NULL power/mde when se = 0 or an arm is empty. Output one
    row: (n_a, n_b, conv_a, conv_b, p_a, p_b, diff, se, z, power,
    mde).

    Scale shape: per-batch per-entity OR partials, ONE hash(entity)
    exchange folding each bucket to four ints (the mcnemar shape).
    """
    import pyarrow as pa

    proj = ds.select_columns([entity_col, arm_col, conv_col])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[entity_col])
        return (df.assign(_a=df[arm_col].fillna(False).astype(bool),
                          _c=df[conv_col].fillna(False).astype(bool))
                .groupby(entity_col, sort=False)[["_a", "_c"]].any()
                .reset_index())

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({"_na": pd.Series(dtype="int64"),
                                 "_nb": pd.Series(dtype="int64"),
                                 "_sa": pd.Series(dtype="int64"),
                                 "_sb": pd.Series(dtype="int64")})
        g = df.groupby(entity_col, sort=False)[["_a", "_c"]].any()
        a = g["_a"].to_numpy()
        c = g["_c"].to_numpy()
        return pd.DataFrame({"_na": [int(a.sum())],
                             "_nb": [int((~a).sum())],
                             "_sa": [int((a & c).sum())],
                             "_sb": [int((~a & c).sum())]})

    m = bucketed_map_groups(
        add_bucket_column(
            proj.map_batches(partial, batch_size=None,
                             batch_format="pandas"),
            entity_col, num_buckets),
        cells, num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()
    n_a = int(m["_na"].sum()) if not m.empty else 0
    n_b = int(m["_nb"].sum()) if not m.empty else 0
    s_a = int(m["_sa"].sum()) if not m.empty else 0
    s_b = int(m["_sb"].sum()) if not m.empty else 0

    def phi(x: float) -> float:
        """A&S 26.2.17 — mirror the SQL expression literal-for-literal."""
        t = 1.0 / (1.0 + 0.2316419 * abs(x))
        d = np.exp(-x * x / 2.0) / 2.5066282746310002
        p = d * t * (0.319381530 + t * (-0.356563782 + t * (
            1.781477937 + t * (-1.821255978 + t * 1.330274429))))
        return p if x < 0 else 1.0 - p

    vals = {}
    if n_a == 0 or n_b == 0:
        p_a = p_b = diff = se = z = power = mde = None
    else:
        p_a, p_b = s_a / n_a, s_b / n_b
        diff = p_a - p_b
        se_sq = p_a * (1 - p_a) / n_a + p_b * (1 - p_b) / n_b
        se = float(np.sqrt(se_sq))
        if se == 0:
            z = power = mde = None
        else:
            z = abs(diff) / se
            power = phi(z - z_alpha)
            mde = (z_alpha + z_beta) * se
    for k, v in [("p_a", p_a), ("p_b", p_b), ("diff", diff),
                 ("se", se), ("z", z), ("power", power), ("mde", mde)]:
        vals[k] = None if v is None else round(float(v), round_digits)
    return ray.data.from_arrow(pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "conv_a": pa.array([s_a], pa.int64()),
        "conv_b": pa.array([s_b], pa.int64()),
        **{k: pa.array([vals[k]], pa.float64()) for k in
           ["p_a", "p_b", "diff", "se", "z", "power", "mde"]},
    }))
