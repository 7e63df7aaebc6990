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

import numpy as np
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


def group_standardize(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    methods: Sequence[str] = ("zscore",),
    round_digits: int = 6,
    driver_group_cap: int = 2_000_000,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group feature scaling: ``{value}_z`` (z-score against the
    group's mean / sample stddev) and/or ``{value}_mm`` (min-max to
    [0, 1]), rounded to ``round_digits``.

    Pass 1 collapses each batch to (group, count, sum, sumsq, min, max)
    moment partials (associative). At or below ``driver_group_cap``
    partial rows they merge driver-side and broadcast with the stage
    closure — pass 2 is a row-local transform, NO shuffle, row layout
    preserved. Above the cap (ID-grade ``group_col``) the op AUTO-ROUTES
    distributed: per-bucket moment merge through the hash exchange, stats
    joined back via :func:`hash_join` (one co-partitioned exchange; output
    layout follows the exchange). ``driver_group_cap=0`` forces the
    distributed route (parity tests). SQL nulls preserved either way: a
    1-row group's sample stddev is NULL (z NULL), a constant group's
    min==max leaves mm NULL, null values stay null, null/unseen group
    keys get NULL features.
    """
    import numpy as np
    import pyarrow as pa

    methods = list(methods)

    def moments(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": t[group_col].to_numpy(zero_copy_only=False),
                "v": t[value_col].to_numpy(zero_copy_only=False).astype(
                    np.float64
                ),
            }
        )
        agg = df.groupby("g")["v"].agg(
            n="count", s="sum", ss=lambda x: float((x.dropna() ** 2).sum()),
            mn="min", mx="max",
        ).reset_index()
        return pa.Table.from_pandas(
            agg, preserve_index=False
        ).replace_schema_metadata(None)

    def finish_stats(stats: pd.DataFrame) -> pd.DataFrame:
        """(n, s, ss, mn, mx) merged moments → (mean, std, mn, rng)."""
        n, s, ss = (stats[c].to_numpy(np.float64) for c in ("n", "s", "ss"))
        mean = np.divide(s, n, out=np.full_like(s, np.nan), where=n > 0)
        # sample variance from moments; clamp tiny negative cancellation
        with np.errstate(invalid="ignore", divide="ignore"):
            var = np.maximum(ss - n * mean**2, 0.0) / (n - 1)
        std = np.sqrt(var)
        std[n < 2] = np.nan
        stats["mean"], stats["std"] = mean, std
        stats["rng"] = stats["mx"] - stats["mn"]
        return stats

    def row_features(t: pa.Table, mean, std, mn, rng) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        out = t
        if "zscore" in methods:
            z = (v - mean) / std
            out = out.append_column(
                f"{value_col}_z", pa.array(np.round(z, round_digits))
            )
        if "minmax" in methods:
            with np.errstate(invalid="ignore", divide="ignore"):
                mm = np.where(rng == 0, np.nan, (v - mn) / rng)
            out = out.append_column(
                f"{value_col}_mm", pa.array(np.round(mm, round_digits))
            )
        return out

    parts_ds = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            moments, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    if parts_ds.count() <= driver_group_cap:
        parts = parts_ds.to_pandas()
        stats = finish_stats(parts.groupby("g").agg(
            n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum"),
            mn=("mn", "min"), mx=("mx", "max"),
        ))
        lut = stats[["mean", "std", "mn", "rng"]]

        def transform(t: pa.Table) -> pa.Table:
            g = pd.Series(t[group_col].to_numpy(zero_copy_only=False))
            rows = lut.reindex(g)
            return row_features(
                t, rows["mean"].to_numpy(), rows["std"].to_numpy(),
                rows["mn"].to_numpy(), rows["rng"].to_numpy(),
            )

        return ds.map_batches(
            transform, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )

    # -- distributed route: bucket-merge moments, co-partitioned join -----
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column
    from featherstore_ray.stages.join import hash_join

    def merge_kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).dropna(subset=["g"])
        stats = finish_stats(df.groupby("g").agg(
            n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum"),
            mn=("mn", "min"), mx=("mx", "max"),
        ))
        out = stats[["mean", "std", "mn", "rng"]].reset_index()
        return out.rename(columns={
            "g": group_col, "mean": "_fsr_mean", "std": "_fsr_std",
            "mn": "_fsr_mn", "rng": "_fsr_rng",
        })

    stats_ds = bucketed_map_groups(
        add_bucket_column(parts_ds, "g", num_buckets),
        merge_kernel, num_buckets=num_buckets, batch_format="pandas",
    )
    joined = hash_join(
        ds, stats_ds, on=[group_col], how="left", num_partitions=num_buckets,
    )
    cols = list(ds.schema().names)

    def fill(t: pa.Table) -> pa.Table:
        arrs = {
            c: t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in ("_fsr_mean", "_fsr_std", "_fsr_mn", "_fsr_rng")
        }
        return row_features(
            t.select(cols), arrs["_fsr_mean"], arrs["_fsr_std"],
            arrs["_fsr_mn"], arrs["_fsr_rng"],
        )

    return joined.map_batches(
        fill, batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
    )


def stratified_sample(
    ds: ray.data.Dataset,
    key_col: str,
    strata_col: str,
    *,
    fractions: dict,
    default_fraction: float = 0.0,
    out_col: str = "sampled",
) -> ray.data.Dataset:
    """Deterministic per-stratum sampling by the SQL-expressible
    multiplicative hash: keep a row iff ``hash(key) < fraction(stratum) *
    2^32``. Reproducible across runs/partitionings; no shuffle (pure map);
    the usual shape for corpus rebalancing (downsample hot sources).
    """
    import numpy as np
    import pyarrow as pa

    items = sorted(fractions.items())
    strat_keys = np.array([k for k, _ in items])
    strat_cuts = np.array(
        [np.uint64(int(v * (1 << 32))) for _, v in items], dtype=np.uint64
    )
    default_cut = np.uint64(int(default_fraction * (1 << 32)))

    def keep(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k % np.uint64(1 << 32)) * np.uint64(_SPLIT_MULT) % np.uint64(1 << 32)
        sv = t[strata_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(strat_keys, sv)
        pos_ok = (pos < len(strat_keys)) & (
            strat_keys[np.minimum(pos, len(strat_keys) - 1)] == sv
        )
        cuts = np.where(
            pos_ok, strat_cuts[np.minimum(pos, len(strat_cuts) - 1)],
            default_cut,
        )
        return t.filter(pa.array(h < cuts))

    return ds.map_batches(
        keep, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def grouped_quantiles(
    ds: ray.data.Dataset,
    group_keys,
    value_col: str,
    *,
    quantiles=(0.5,),
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """EXACT per-group quantiles (median etc.) — deliberately not a sketch:
    rows of (keys, value) shuffle once on the first key and each group's
    quantiles are computed from its full value set, continuous
    interpolation (SQL ``quantile_cont``). For sketch-grade cardinalities
    use a t-digest-style partial instead; this is the oracle-exact path.
    """
    import pandas as pd

    group_keys = list(group_keys)
    ds = ds.select_columns(group_keys + [value_col])
    ds = add_bucket_column(ds, group_keys[0], num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        g = df.groupby(group_keys, sort=True)[value_col]
        out = None
        for q in quantiles:
            col = g.quantile(q).round(round_digits).rename(
                f"{value_col}_p{int(q * 100)}"
            )
            out = col.to_frame() if out is None else out.join(col)
        return out.reset_index()

    return bucketed_map_groups(
        ds, kernel, num_buckets=num_buckets, batch_format="pandas"
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


def weighted_sample(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
    k: int,
    *,
    round_digits: int = 6,
    num_buckets: int = 1,
) -> ray.data.Dataset:
    """Deterministic weighted sample WITHOUT replacement of ``k`` rows —
    the A-ES (Efraimidis–Spirakis) scheme with a hash in place of the
    random draw: rank = u^(1/w) with u = (mult_hash(key)+0.5)/2^32, keep
    the global top-k ranks. Heavier rows sample proportionally more often;
    the whole thing is a pure map + the top_k partial/final pattern
    (exchange moves <= k rows per batch, never the input).

    SQL-expressible (hash and pow are exact/shared-libm double math; the
    rank is rounded to ``round_digits`` so a last-ulp pow difference
    cannot flip the order — ties resolve by ``key_col``), so the driver
    oracles it: ``ROW_NUMBER() OVER (ORDER BY round(pow(u, 1/w), d) DESC,
    key) <= k``.
    """
    import numpy as np
    import pyarrow as pa

    rank_col = "_fsr_rank"

    def add_rank(t: pa.Table) -> pa.Table:
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (key % np.uint64(1 << 32)) * np.uint64(_SPLIT_MULT) % np.uint64(
            1 << 32
        )
        u = (h.astype(np.float64) + 0.5) / np.float64(1 << 32)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.maximum(w, 1e-12)  # zero/negative weights: effectively never
        rank = np.round(np.power(u, 1.0 / w), round_digits)
        return t.append_column(rank_col, pa.array(rank))

    ranked = ds.map_batches(
        add_rank, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = top_k(
        ranked, rank_col, k,
        descending=True, tiebreak=key_col, num_buckets=num_buckets,
    )

    def drop(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=[rank_col])

    return out.map_batches(drop, batch_size=None, batch_format="pandas")


def explode(
    ds: ray.data.Dataset,
    list_col: str,
    *,
    keep_cols: Sequence[str] = (),
    out_col: str | None = None,
    pos_col: str = "pos",
) -> ray.data.Dataset:
    """Unnest a list column into one row per element, with the element's
    0-based position — SQL ``unnest(... WITH ORDINALITY)``. Pure streaming
    map, fully Arrow-native: the flattened values are zero-copy and the
    parent rows replicate via one ``take`` on repeated indices.

    Output: ``keep_cols`` + ``pos_col:int64`` + ``out_col`` (defaults to
    ``{list_col}_item``). Rows with null/empty lists produce no output
    (SQL unnest semantics).
    """
    import numpy as np
    import pyarrow as pa

    out_col = out_col or f"{list_col}_item"
    keep_cols = list(keep_cols)

    def _explode(t: pa.Table) -> pa.Table:
        lists = t[list_col]
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        counts = offsets[1:] - offsets[:-1]
        parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offsets[:-1], counts
        )
        cols = {c: t[c].take(pa.array(parent)) for c in keep_cols}
        cols[pos_col] = pa.array(pos)
        cols[out_col] = flat
        return pa.table(cols)

    return ds.map_batches(
        _explode, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _keyed_set_op(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cols: Sequence[str],
    op: str,
    num_buckets: int,
) -> ray.data.Dataset:
    import numpy as np
    import pyarrow as pa

    cols = list(cols)
    side = "_fsr_side"

    def tag(v: int):
        def f(t: pa.Table) -> pa.Table:
            # per-batch distinct partial: the exchange moves unique keys
            # per (side, batch), never input rows
            agg = t.select(cols).group_by(cols).aggregate([])
            return agg.append_column(
                side, pa.array(np.full(agg.num_rows, v, dtype=np.int8))
            )

        return f

    tagged = left.map_batches(
        tag(0), batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(
            tag(1), batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    bucketed = add_bucket_column(tagged, cols[0], num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: SQL INTERSECT/EXCEPT treat NULL keys as equal
        # values — a null combination present on both sides intersects
        g = df.groupby(cols, sort=True, dropna=False)[side].agg(
            ["min", "max"]
        )
        if op == "intersect":
            keep = (g["min"] == 0) & (g["max"] == 1)
        else:  # except: present on the left only
            keep = g["max"] == 0
        return g.loc[keep].reset_index()[cols]

    out = bucketed_map_groups(
        bucketed, kernel, num_buckets=num_buckets, batch_format="pandas"
    )
    # an all-empty result would otherwise lose its schema entirely (the
    # exchange drops empty blocks); seed with a typed empty block
    import pyarrow as pa

    key_schema = pa.schema(
        [pa.schema(left.schema().base_schema).field(c) for c in cols]
    )
    return ray.data.from_arrow(key_schema.empty_table()).union(out)


def intersect_keys(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cols: Sequence[str],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """SQL ``INTERSECT`` over the key columns: distinct combinations
    present on BOTH sides. Per-batch distinct partials + ONE bucket
    shuffle carrying a one-byte side tag."""
    return _keyed_set_op(left, right, cols, "intersect", num_buckets)


def except_keys(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cols: Sequence[str],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """SQL ``EXCEPT``: distinct key combinations on the left absent from
    the right. Same exchange shape as ``intersect_keys``."""
    return _keyed_set_op(left, right, cols, "except", num_buckets)


def profile_columns(
    ds: ray.data.Dataset,
    cols: Sequence[str],
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Single-pass numeric column profiler: one output row per column with
    ``(column_name, n, n_null, min, max, mean)`` — the data-quality summary
    a pipeline runs before trusting a new drop of data.

    Scale shape: every batch collapses to |cols| partial rows (count,
    null-count, min, max, sum per column), merged on the driver — the
    partials are O(cols × blocks) regardless of row count, so the whole
    profile costs ONE streaming scan and no shuffle. Columns are cast to
    float64 for a uniform stats row; min/max/mean are rounded for
    summation-order-stable comparison.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from featherstore_ray.stages.aggregate import grouped_aggregate

    cols = list(cols)

    def partial(t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {
            "column_name": [], "n": [], "n_null": [],
            "min": [], "max": [], "s": [],
        }
        for c in cols:
            arr = pc.cast(t[c], pa.float64())
            mm = pc.min_max(arr)
            rows["column_name"].append(c)
            rows["n"].append(len(arr) - arr.null_count)
            rows["n_null"].append(arr.null_count)
            rows["min"].append(mm["min"].as_py())
            rows["max"].append(mm["max"].as_py())
            rows["s"].append(pc.sum(arr).as_py())
        return pa.table(rows)

    parts = ds.select_columns(cols).map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = grouped_aggregate(
        parts,
        ["column_name"],
        {
            "n": ("n", "sum"),
            "n_null": ("n_null", "sum"),
            "min": ("min", "min"),
            "max": ("max", "max"),
            "s": ("s", "sum"),
        },
        final="driver",
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["mean"] = (df["s"] / df["n"]).round(round_digits)
        df["min"] = df["min"].round(round_digits)
        df["max"] = df["max"].round(round_digits)
        df["n"] = df["n"].astype("int64")
        df["n_null"] = df["n_null"].astype("int64")
        return df.drop(columns=["s"])

    return merged.map_batches(finalize, batch_size=None, batch_format="pandas")


def winsorize(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group percentile clipping (winsorization — the standard outlier
    treatment before feature scaling): append ``{value}_w`` = value clipped
    to the group's [``lower``, ``upper``] quantiles (SQL ``quantile_cont``
    linear interpolation), rounded. Null values stay null; rows whose
    group key is null (or whose group is all-null) pass through unclipped
    — matching ``CASE WHEN v < q THEN ...`` three-valued logic.

    Scale shape: exact quantiles need the group's full value set, so this
    is ONE bucket exchange on hash(group) + a per-bucket kernel (cython
    grouped quantile + vectorized clip) — same contract as
    ``grouped_quantiles``; for sketch-grade group cardinalities pair with
    ``grouped_quantiles_sketch`` bounds instead.
    """
    import numpy as np
    import pyarrow as pa

    out = out_col or f"{value_col}_w"

    def kernel(t: pa.Table) -> pa.Table:
        t = t.drop_columns([BUCKET_COL])
        g = pd.Series(t[group_col].to_numpy(zero_copy_only=False))
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        q = (
            pd.Series(v).groupby(g, dropna=True)
            .quantile([lower, upper]).unstack()
        )
        codes, uniq = pd.factorize(g, use_na_sentinel=True)
        if len(q):
            qlo = q[lower].reindex(uniq).to_numpy()
            qhi = q[upper].reindex(uniq).to_numpy()
        else:  # every group key null in this bucket
            qlo = qhi = np.full(len(uniq), np.nan)
        safe = np.maximum(codes, 0)
        lo = np.where(codes >= 0, qlo[safe] if len(uniq) else np.nan, np.nan)
        hi = np.where(codes >= 0, qhi[safe] if len(uniq) else np.nan, np.nan)
        w = np.where(
            np.isnan(lo), v, np.minimum(np.maximum(v, lo), hi)
        )
        return t.append_column(out, pa.array(np.round(w, round_digits)))

    tagged = add_bucket_column(ds, group_col, num_buckets)
    return bucketed_map_groups(
        tagged, kernel, num_buckets=num_buckets, batch_format="pyarrow"
    )


def robust_scale(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    out_col: str | None = None,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group robust standardization — ``(v − median) / IQR`` — the
    outlier-insensitive alternative to z-scoring (sklearn RobustScaler
    semantics) used before feature scaling on heavy-tailed columns.

    Appends ``{value}_rs``; null when the value is null, the group key is
    null, or the group's IQR is 0 (SQL ``NULLIF(q3 − q1, 0)``). Quantiles
    are ``quantile_cont`` linear interpolation, matching pandas'
    ``quantile`` — same cross-engine contract as :func:`winsorize`.

    Scale shape: exact per-group quantiles need the group's full value
    set, so ONE bucket exchange on hash(group) + a vectorized per-bucket
    kernel (same contract as ``grouped_quantiles``); for sketch-grade
    cardinalities pair with ``grouped_quantiles_sketch``.
    """
    import pyarrow as pa

    out = out_col or f"{value_col}_rs"

    def kernel(t: pa.Table) -> pa.Table:
        t = t.drop_columns([BUCKET_COL])
        g = pd.Series(t[group_col].to_numpy(zero_copy_only=False))
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        q = (
            pd.Series(v).groupby(g, dropna=True)
            .quantile([0.25, 0.5, 0.75]).unstack()
        )
        codes, uniq = pd.factorize(g, use_na_sentinel=True)
        if len(q):
            q1 = q[0.25].reindex(uniq).to_numpy()
            med = q[0.5].reindex(uniq).to_numpy()
            iqr = q[0.75].reindex(uniq).to_numpy() - q1
        else:  # every group key null in this bucket
            med = iqr = np.full(len(uniq), np.nan)
        safe = np.maximum(codes, 0)
        m = np.where(codes >= 0, med[safe] if len(uniq) else np.nan, np.nan)
        s = np.where(codes >= 0, iqr[safe] if len(uniq) else np.nan, np.nan)
        with np.errstate(invalid="ignore", divide="ignore"):
            rs = (v - m) / np.where(s == 0, np.nan, s)
        return t.append_column(out, pa.array(np.round(rs, round_digits)))

    tagged = add_bucket_column(ds, group_col, num_buckets)
    return bucketed_map_groups(
        tagged, kernel, num_buckets=num_buckets, batch_format="pyarrow"
    )


def quantile_map(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    ref_group,
    *,
    out_col: str = "mapped",
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Quantile mapping (distribution alignment): remap every group's
    values onto the REFERENCE group's distribution — the domain-adaptation
    / bias-correction primitive (score calibration across cohorts, climate
    downscaling's quantile-mapping step): for a value at percent-rank ``p``
    within its own group, output the reference distribution's linearly
    interpolated quantile at ``p``. Percent rank is SQL ``PERCENT_RANK()``
    (min-rank ties, ``(rank−1)/(n−1)``, 0 for singleton groups); the
    interpolation is the explicit ``lo + (hi − lo)·f`` form at position
    ``p·(m−1)`` (np.quantile's lerp switches forms at f>0.5 and is NOT
    mirrorable — the conformal_interval lesson). Rows with a null group
    key or null value are excluded on both sides (oracle WHERE mirror).

    Scale shape: the reference group's sorted values broadcast once via
    ``ray.put`` (a single cohort — bounded by contract; for corpus-scale
    references use grouped_quantiles_sketch grids instead); ranking needs
    each group's full value set, so ONE bucket exchange on hash(group) +
    a vectorized per-bucket kernel (grouped min-rank + one gather).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    ref_vals = np.sort(
        ds.filter(expr=f"{group_col} == {ref_group!r}")
        .select_columns([value_col])
        .to_pandas()[value_col].dropna().to_numpy(dtype=np.float64)
    )
    if len(ref_vals) == 0:
        raise ValueError(f"reference group {ref_group!r} has no values")
    ref_ref = ray.put(ref_vals)
    m = len(ref_vals)

    def drop_nulls(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t[group_col]), pc.is_valid(t[value_col]))
        return t.filter(mask)

    def kernel(t: pa.Table) -> pa.Table:
        t = t.drop_columns([BUCKET_COL])
        g = pd.Series(t[group_col].to_numpy(zero_copy_only=False))
        v = pd.Series(t[value_col].to_numpy(zero_copy_only=False)
                      .astype(np.float64))
        grp = v.groupby(g)
        r = grp.rank(method="min").to_numpy(dtype=np.float64)
        n = grp.transform("size").to_numpy(dtype=np.float64)
        p = np.where(n > 1, (r - 1.0) / (n - 1.0), 0.0)
        ref = ray.get(ref_ref)
        pos = p * (m - 1)
        lo = np.floor(pos).astype(np.int64)
        f = pos - np.floor(pos)  # the oracle's pos - floor(pos)
        hi = np.minimum(lo + 1, m - 1)
        mapped = ref[lo] + (ref[hi] - ref[lo]) * f
        return t.append_column(out_col,
                               pa.array(np.round(mapped, round_digits)))

    tagged = add_bucket_column(
        ds.map_batches(drop_nulls, batch_size=None, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_col, num_buckets)
    return bucketed_map_groups(
        tagged, kernel, num_buckets=num_buckets, batch_format="pyarrow"
    )


_NEG_MIX = 1000003  # odd mixer folding (user, item) before the Knuth hash


def negative_sampling(
    ds: ray.data.Dataset,
    *,
    user_col: str,
    item_col: str,
    k: int = 5,
    items: "np.ndarray | None" = None,
    num_buckets: int = 64,
    user_chunk: int = 256,
) -> ray.data.Dataset:
    """Deterministic negative sampling for recommendation / contrastive
    training: for every user, the ``k`` items they did NOT interact with
    that rank smallest under the SQL-expressible hash
    ``((u*1000003 + i) % 2^32) * 2654435761 % 2^32`` (ties → smallest
    item id). Reproducible across runs, partitionings and engines — the
    oracle is a CROSS JOIN + NOT EXISTS + ROW_NUMBER. Requires
    ``u*1000003 + i < 2^63`` (no wrap on the SQL side).

    Returns ``(user_col, item_col, rn)`` with ``rn`` in 1..k per user
    (fewer when the user interacted with nearly the whole catalog).

    Scale shape: the item catalog broadcasts once (``ray.put``; real
    catalogs are ~10^6-10^8 ids = MBs, tiny next to the interaction
    stream) and ONE bucket exchange co-locates each user's history; the
    kernel scores users in ``user_chunk`` strips (memory O(chunk × |I|)),
    fully vectorized. When ``items`` is None the catalog is derived from
    the interactions with a per-batch distinct partial.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    proj = ds.select_columns([user_col, item_col])
    if items is None:
        part = proj.map_batches(
            lambda t: pa.table(
                {item_col: pc.unique(t[item_col])}
            ),
            batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()  # distinct-per-block partials only
        items = np.unique(part[item_col].to_numpy())
    items_sorted = np.sort(np.asarray(items).astype(np.int64))
    items_ref = ray.put(items_sorted)
    m32 = np.uint64(1 << 32)
    mult = np.uint64(_SPLIT_MULT)
    mix = np.uint64(_NEG_MIX)

    def kernel(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [(user_col, pa.int64()), (item_col, pa.int64()),
             ("rn", pa.int64())]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        cat = ray.get(items_ref)
        ni = len(cat)
        kk = min(k, ni)
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        it = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((it, u))
        u, it = u[order], it[order]
        uu, ustart = np.unique(u, return_index=True)
        uend = np.append(ustart[1:], len(u))
        outs = []
        for s in range(0, len(uu), user_chunk):
            e = min(s + user_chunk, len(uu))
            uc = uu[s:e].astype(np.uint64)
            h = (
                (uc[:, None] * mix + cat.astype(np.uint64)[None, :]) % m32
            ) * mult % m32
            # mask interacted items with +inf-equivalent
            for r, gi in enumerate(range(s, e)):
                hist = it[ustart[gi]:uend[gi]]
                pos = np.searchsorted(cat, hist)
                ok = (pos < ni) & (cat[np.minimum(pos, ni - 1)] == hist)
                h[r, pos[ok]] = np.uint64(0xFFFFFFFFFFFFFFFF)
            top = np.argsort(h, axis=1, kind="stable")[:, :kk]
            hsel = np.take_along_axis(h, top, axis=1)
            valid = hsel != np.uint64(0xFFFFFFFFFFFFFFFF)
            cnt = valid.sum(axis=1)
            rows = np.repeat(np.arange(e - s), cnt)
            sel = top[valid]
            rns = (
                np.arange(valid.size).reshape(valid.shape)
                - (np.arange(e - s) * kk)[:, None]
            )[valid] + 1
            outs.append(
                pa.table(
                    {
                        user_col: pa.array(uu[s:e][rows]),
                        item_col: pa.array(cat[sel]),
                        "rn": pa.array(rns.astype(np.int64)),
                    },
                    schema=out_schema,
                )
            )
        return pa.concat_tables(outs) if outs else out_schema.empty_table()

    tagged = add_bucket_column(proj, user_col, num_buckets)
    return bucketed_map_groups(
        tagged, kernel, num_buckets=num_buckets, batch_format="pyarrow"
    )


def skyline(
    ds: ray.data.Dataset,
    *,
    min_col: str,
    max_col: str,
    keep_cols: Sequence[str] = (),
) -> ray.data.Dataset:
    """2-D Pareto frontier (skyline): rows not dominated by any other row,
    where q dominates p iff ``q.min_col <= p.min_col`` and ``q.max_col >=
    p.max_col`` with at least one strict. Points with identical
    coordinates never dominate each other, so coordinate duplicates on
    the frontier all survive (SQL NOT EXISTS semantics).

    Scale shape: the skyline operator is distributive — skyline(union of
    local skylines) == global skyline — so each block prunes locally
    first and only frontier candidates leave the block; the global merge
    re-runs the same vectorized kernel on the (typically tiny) candidate
    union driver-side. Anti-correlated inputs can in principle keep the
    frontier large; for those, chain a second bucketed prune pass keyed
    on a min_col range partition before the merge."""
    import pyarrow as pa

    cols = [min_col, max_col] + [c for c in keep_cols
                                 if c not in (min_col, max_col)]

    def frontier(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[min_col, max_col])
        if d.empty:
            return d[cols]
        p = d[min_col].to_numpy()
        s = d[max_col].to_numpy()
        order = np.lexsort((-s, p))  # price asc, size desc
        ps, ss = p[order], s[order]
        # prefix maxima of size over strictly-cheaper (M1) and
        # cheaper-or-equal (M2) points
        run_max = np.maximum.accumulate(ss)
        new_price = np.ones(len(ps), dtype=bool)
        new_price[1:] = ps[1:] != ps[:-1]
        grp = np.cumsum(new_price) - 1                # price-group index
        grp_last = np.zeros(grp[-1] + 1, np.int64)
        np.maximum.at(grp_last, grp, np.arange(len(ps)))
        m2 = run_max[grp_last[grp]]                   # max size, price <= p
        prev_last = np.where(grp > 0, grp_last[grp - 1], -1)
        m1 = np.where(prev_last >= 0, run_max[prev_last], -np.inf)
        dominated = (m1 >= ss) | (m2 > ss)
        keep_idx = order[~dominated]
        return d.iloc[np.sort(keep_idx)][cols]

    local = ds.select_columns(cols).map_batches(
        frontier, batch_size=None, batch_format="pandas")
    merged = frontier(local.to_pandas())  # candidates only — tiny
    return ray.data.from_arrow(
        pa.Table.from_pandas(merged.reset_index(drop=True),
                             preserve_index=False))


def quantile_bins(
    ds: ray.data.Dataset,
    value_col: str,
    *,
    num_bins: int = 4,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Global equal-frequency discretization: bin edges are the exact
    ``quantile_cont`` values at i/num_bins (rounded to ``round_digits`` on
    BOTH engine and oracle so the cut is deterministic), and each non-null
    value lands in ``bin = #edges strictly below it``. Output one
    ``(bin, n)`` row per non-empty bin.

    Two passes sharing one materialized single-column read: pass 1 is the
    exact-quantile path (full value set in one kernel — the documented
    exact-path caveat, pair with ``grouped_quantiles_sketch`` for
    sketch-grade inputs); pass 2 assigns bins streaming and merges
    per-block bincount vectors (num_bins ints per block) driver-side —
    no shuffle anywhere."""
    import pyarrow as pa

    proj = ds.select_columns([value_col]).materialize()
    probs = [i / num_bins for i in range(1, num_bins)]

    def add_const(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_g", pa.array(np.zeros(t.num_rows, np.int8)))

    qdf = grouped_quantiles(
        proj.map_batches(add_const, batch_size=None, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["_g"], value_col, quantiles=probs, round_digits=round_digits,
        num_buckets=1,
    ).to_pandas()  # one row of num_bins-1 edges
    empty = pa.table({"bin": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    if qdf.empty:
        return ray.data.from_arrow(empty)
    edges = np.sort(np.asarray(
        [qdf[f"{value_col}_p{int(q * 100)}"].iloc[0] for q in probs],
        dtype=np.float64,
    ))
    B = int(num_bins)

    def counts(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.searchsorted(edges, v, side="left")  # #edges < v, strict
        return pa.table(
            {"n": pa.array(np.bincount(b, minlength=B), pa.int64())})

    c = proj.map_batches(
        counts, batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()  # num_bins × blocks ints — bounded
    total = c["n"].to_numpy().reshape(-1, B).sum(axis=0)
    bins = np.nonzero(total)[0].astype(np.int64)
    return ray.data.from_arrow(pa.table({
        "bin": pa.array(bins, pa.int64()),
        "n": pa.array(total[bins], pa.int64()),
    }))


def mad_outliers(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    k: float = 3.0,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group robust outlier report via median absolute deviation:
    ``MAD = median(|v − median(v)|)``; a value is an outlier when
    ``|v − median| > k·MAD`` (strict, so an all-equal group — MAD 0 —
    has zero outliers). Output ``(group, n, n_outliers, med, mad)`` with
    med/mad rounded; the outlier cut compares UNROUNDED doubles in the
    identical IEEE expression order as the SQL oracle.

    Scale shape: exact medians need the group's full value set — ONE
    bucket exchange on hash(group), same contract as
    ``grouped_quantiles`` (sketch-grade cardinalities: pair with
    ``grouped_quantiles_sketch``)."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=[BUCKET_COL]).dropna(subset=[value_col])
        med = d.groupby(group_col, sort=True, dropna=False)[
            value_col].transform("median")
        dev = (d[value_col] - med).abs()
        mad = dev.groupby(d[group_col], dropna=False).transform("median")
        out_mask = dev.to_numpy() > k * mad.to_numpy()
        g = d.groupby(group_col, sort=True, dropna=False)
        out = pd.DataFrame({
            "n": g[value_col].size(),
            "n_outliers": pd.Series(out_mask, index=d.index).groupby(
                d[group_col], dropna=False).sum().astype(np.int64),
            "med": g[value_col].median().round(round_digits),
            "mad": dev.groupby(d[group_col], dropna=False).median().round(
                round_digits),
        }).reset_index()
        return out

    proj = ds.select_columns([group_col, value_col])
    return bucketed_map_groups(
        add_bucket_column(proj, group_col, num_buckets),
        kernel, num_buckets=num_buckets, batch_format="pandas",
    )


def shuffle_shard(
    ds: ray.data.Dataset,
    key_col: str,
    *,
    num_shards: int = 16,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> ray.data.Dataset:
    """Deterministic global training shuffle: every row gets a stable
    (shard, position) slot — the write layout for epoch-shuffled training
    data (readers stream shard files sequentially; the hash order IS the
    shuffle).

    ``h = (key % 2^32) * 2654435761 % 2^32`` (the :func:`hash_split`
    multiplicative hash — SQL-exact in HUGEINT arithmetic), ``shard =
    h % num_shards``, ``pos`` = rank of ``(h, key)`` within the shard.
    ONE exchange bucketed by shard; the per-shard kernel is a lexsort +
    arange — no global sort, no driver materialization. At 100 TB the
    rows move exactly once and each reducer ranks only its own shard.
    """
    import pyarrow as pa

    def assign(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k % np.uint64(1 << 32)) * np.uint64(_SPLIT_MULT) % np.uint64(1 << 32)
        t = t.append_column("_h", pa.array(h.astype(np.int64)))
        return t.append_column(
            shard_col, pa.array((h % np.uint64(num_shards)).astype(np.int64)))

    tagged = ds.map_batches(
        assign, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_h", key_col], kind="mergesort").reset_index(
            drop=True)
        df[pos_col] = np.arange(len(df), dtype=np.int64)
        return df.drop(columns=["_h"])

    return bucketed_map_groups(
        tagged, kernel, num_buckets=num_shards, bucket_col=shard_col,
    )


def temperature_mix(
    ds: ray.data.Dataset,
    source_col: str,
    key_col: str,
    *,
    alpha: float = 0.5,
    total: int | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Temperature-scaled source re-mixing WITH replacement — the
    multilingual-LM sampling scheme (share ∝ n_s^α upweights low-resource
    sources; α=1 keeps natural proportions, α→0 approaches uniform).
    :func:`source_mix` is the downsample-only sibling; this one UPsamples
    by emitting integer row copies. Target count per source is pure
    integer math so both engines agree exactly: integer weight ``w_s =
    round(n_s^α · 10⁶)``, ``m_s = (total·w_s) // Σw`` (Python ints
    driver-side, HUGEINT in SQL — BIGINT products overflow at corpus
    scale); every row gets ``m_s // n_s`` copies and rows whose key hash
    satisfies ``hash(key) % n_s < m_s % n_s`` get one extra (expected —
    not exact — remainder coverage; deterministic and identical on both
    engines). Output: (key, source, copy_id 0..copies−1); rows with a
    null key or source are excluded on both sides.

    Scale shape: one count-partial pass (bounded source vocabulary) →
    driver integer targets → a stateless per-batch repeat. No shuffle;
    expansion is bounded by ``total/N`` on average.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = [key_col, source_col]

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=cols)
        return (d.groupby(source_col, sort=False, observed=True)
                .size().rename("_n").reset_index())

    merged = (
        ds.select_columns(cols)
        .map_batches(count_partial, batch_size=None, batch_format="pandas")
        .to_pandas()
    )
    if len(merged) == 0 or source_col not in merged.columns:
        return ray.data.from_arrow(pa.table({
            key_col: pa.array([], pa.int64()),
            source_col: pa.array([], pa.string()),
            "copy_id": pa.array([], pa.int64()),
        }))
    counts = merged.groupby(source_col, sort=True, observed=True)["_n"].sum()
    n_total = int(counts.sum())
    tgt_total = int(total) if total is not None else n_total
    # integer micro-weights: round(n^alpha * 1e6); alpha=0.5 can never
    # land on a half-grid point (an odd square is never divisible by 4),
    # other alphas share the standard measure-zero caveat
    w = {s: int(np.round(float(n) ** alpha * 1e6))
         for s, n in counts.items()}
    W = sum(w.values())
    plan = {}
    for s, n in counts.items():
        m = (tgt_total * w[s]) // W  # exact Python ints
        plan[s] = (int(m // n), int(m % n), int(n))

    def expand(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[source_col]))
        t = t.select(cols).filter(mask)
        src = t[source_col].to_numpy(zero_copy_only=False)
        # uint64 hash: key*2654435761 overflows int64 for 2^32-grade keys
        # (the negative_sampling HUGEINT lesson — SQL mirrors via HUGEINT)
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        codes, uniq = pd.factorize(pd.Series(src))
        b_u = np.array([plan[s][0] for s in uniq], dtype=np.int64)
        r_u = np.array([plan[s][1] for s in uniq], dtype=np.int64)
        n_u = np.array([plan[s][2] for s in uniq], dtype=np.uint64)
        base, rem, nn = b_u[codes], r_u[codes], n_u[codes]
        h = (key * np.uint64(2654435761)) % np.uint64(4294967296)
        copies = base + ((h % nn).astype(np.int64) < rem)
        keep = copies > 0
        idx = np.flatnonzero(keep)
        c = copies[idx]
        rep = np.repeat(idx, c)
        starts = np.concatenate(([0], np.cumsum(c)[:-1]))
        copy_id = np.arange(int(c.sum())) - np.repeat(starts, c)
        out = t.take(rep)
        return out.append_column("copy_id", pa.array(copy_id))

    return ds.map_batches(expand, batch_size=None, batch_format="pyarrow",
                          zero_copy_batch=True)


def source_mix(
    ds: ray.data.Dataset,
    source_col: str,
    key_col: str,
    proportions: dict,
) -> ray.data.Dataset:
    """Deterministic corpus mixing: downsample each source so the output
    matches target ``proportions`` — the standard pretraining-mixture step
    (e.g. 40% web / 35% code / 25% books), downsample-only.

    Per-source counts collapse to a tiny driver-side aggregate (sources ×
    1 int — never rows); the largest feasible output is ``cap = min_s
    count_s / w_s`` and each source keeps rows whose multiplicative key
    hash falls under ``floor(cap · w_s / count_s · 2^32)`` — the same
    SQL-exact hash as :func:`hash_split`, so the selection is reproducible
    across engines, runs and partitionings, and the filter itself is a
    streaming map (the only exchange is the count partials). Sources
    absent from ``proportions`` are dropped.
    """
    import pyarrow as pa

    def count_partial(t: pa.Table) -> pa.Table:
        vc = pd.Series(
            t[source_col].to_numpy(zero_copy_only=False)).value_counts()
        # keep the source's ORIGINAL type: stringifying the index here
        # while looking proportions up by raw value silently misaligns
        # counts for non-string source columns
        return pa.table({
            source_col: pa.array(vc.index.tolist(),
                                 t.schema.field(source_col).type),
            "_n": vc.to_numpy().astype(np.int64),
        })

    counts = (
        ds.select_columns([source_col])
        .map_batches(count_partial, batch_size=None, batch_format="pyarrow",
                     zero_copy_batch=True)
        .to_pandas().groupby(source_col)["_n"].sum()
    )
    have = {s: float(counts.get(s, 0)) for s in proportions}
    if any(v == 0 for v in have.values()):
        missing = [s for s, v in have.items() if v == 0]
        raise ValueError(f"sources absent from input: {missing}")
    cap = min(have[s] / w for s, w in proportions.items())
    cuts = {s: np.int64(np.floor(cap * w / have[s] * 4294967296.0))
            for s, w in proportions.items()}

    def keep(t: pa.Table) -> pa.Table:
        src = t[source_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(src)
        cut_arr = np.array([cuts.get(u, np.int64(0)) for u in uniq]
                           + [np.int64(0)], dtype=np.int64)
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k % np.uint64(1 << 32)) * np.uint64(_SPLIT_MULT) % np.uint64(1 << 32)
        # factorize yields -1 for nulls — route them to the zero-cut slot
        mask = h.astype(np.int64) < cut_arr[codes]
        return t.filter(pa.array(mask))

    return ds.map_batches(
        keep, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def target_encode(
    ds: ray.data.Dataset,
    cat_col: str,
    target_col: str,
    *,
    smoothing: float = 20.0,
    out_col: str | None = None,
    round_digits: int = 6,
    driver_cat_cap: int = 2_000_000,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Smoothed mean target encoding — the classic high-cardinality
    categorical encoder: appends ``{target}_te`` =
    ``(Σ_c y + m·prior) / (n_c + m)`` with ``prior`` the global target
    mean and ``m = smoothing``. A category shrinks toward the prior in
    proportion to how few labeled rows it has; unseen/null categories
    encode to the prior exactly (the n_c = 0 limit). Null targets don't
    contribute to the statistics but their rows are still encoded.

    Pass 1 collapses each batch to (category, Σy, count) partials. When
    the partial-row count is at most ``driver_cat_cap`` they merge
    driver-side and broadcast with the stage closure — pass 2 is a
    row-local lookup, NO shuffle, row layout preserved. Above the cap
    (ID-grade ``cat_col``) the op AUTO-ROUTES distributed with no caller
    knowledge: partials merge per bucket through the hash exchange, the
    (category, enc) table joins back via :func:`hash_join` (one
    co-partitioned exchange; rows with unseen/null categories fill the
    prior row-locally), and the output row layout follows the exchange.
    ``driver_cat_cap=0`` forces the distributed route (parity tests).
    """
    import numpy as np
    import pyarrow as pa

    out = out_col or f"{target_col}_te"
    m = float(smoothing)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[cat_col, target_col]].dropna(subset=[target_col])
        agg = d.groupby(cat_col, sort=False, dropna=False)[target_col].agg(
            s="sum", n="count"
        ).reset_index()
        return agg

    parts_ds = (
        ds.select_columns([cat_col, target_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .materialize()
    )
    if parts_ds.count() <= driver_cat_cap:
        parts = parts_ds.to_pandas()
        stats = parts.groupby(
            cat_col, sort=True, dropna=False)[["s", "n"]].sum()
        n_tot = float(stats["n"].sum())
        prior = float(stats["s"].sum()) / n_tot if n_tot > 0 else np.nan
        lut = ((stats["s"] + m * prior) / (stats["n"] + m)).rename("enc")
        lut = lut[lut.index.notna()]

        def transform(t: pa.Table) -> pa.Table:
            g = pd.Series(t[cat_col].to_numpy(zero_copy_only=False))
            enc = lut.reindex(g).to_numpy(dtype=np.float64)
            enc = np.where(np.isnan(enc), prior, enc)
            return t.append_column(
                out, pa.array(np.round(enc, round_digits)))

        return ds.map_batches(
            transform, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )

    # -- distributed route: bucket-merge partials, co-partitioned join ----
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column
    from featherstore_ray.stages.join import hash_join

    def totals(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": [df["s"].sum()], "n": [df["n"].sum()]})

    tot = parts_ds.map_batches(
        totals, batch_size=None, batch_format="pandas"
    ).to_pandas()
    n_tot = float(tot["n"].sum())
    prior = float(tot["s"].sum()) / n_tot if n_tot > 0 else np.nan

    def merge_kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).dropna(subset=[cat_col])
        g = df.groupby(cat_col, sort=True)[["s", "n"]].sum()
        enc = ((g["s"] + m * prior) / (g["n"] + m)).rename("_fsr_enc")
        return enc.reset_index()

    stats_ds = bucketed_map_groups(
        add_bucket_column(parts_ds, cat_col, num_buckets),
        merge_kernel, num_buckets=num_buckets, batch_format="pandas",
    )
    joined = hash_join(
        ds, stats_ds, on=[cat_col], how="left", num_partitions=num_buckets,
    )
    cols = list(ds.schema().names)

    def fill(t: pa.Table) -> pa.Table:
        enc = t["_fsr_enc"].to_numpy(zero_copy_only=False).astype(np.float64)
        enc = np.where(np.isnan(enc), prior, enc)
        return t.select(cols).append_column(
            out, pa.array(np.round(enc, round_digits)))

    return joined.map_batches(
        fill, batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
    )


def global_rank(
    ds: ray.data.Dataset,
    value_col: str,
    tiebreak_col: str,
    *,
    out_col: str = "rnk",
    num_buckets: int = 64,
    sample_per_batch: int = 256,
) -> ray.data.Dataset:
    """Global order statistics — distributed ``ROW_NUMBER() OVER (ORDER BY
    value, tiebreak)`` (1-based; rows with a null value are dropped, SQL
    ORDER-BY-rank over non-null rows). The op Ray's built-in sort gives
    you only as a total re-layout; this yields the rank column directly.

    The classic sample-sort: (1) a deterministic evenly-spaced per-batch
    value sample merged driver-side picks ``num_buckets − 1`` range
    splitters; (2) a narrow counting pass (searchsorted per batch → a
    B-long vector per block) gives exact bucket sizes, prefix-summed to
    global offsets; (3) rows exchange ONCE by range bucket and each
    bucket sorts locally by (value, tiebreak) and adds its offset. Equal
    values always share a bucket (``side="left"`` on both the splitter
    assignment and the counts), so ties resolve wholly in-bucket. Skewed
    single values concentrate in one bucket — same hot-key contract as
    ``grouped_quantiles``. The two-column projection is materialized ONCE
    so the sample / count / assign passes never re-execute the upstream
    read (the ``lm_score`` multi-pass precedent).
    """
    import pyarrow as pa

    proj = ds.select_columns([value_col, tiebreak_col]).materialize()

    def sample(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) > sample_per_batch:  # evenly spaced — deterministic
            v = v[:: max(1, len(v) // sample_per_batch)][:sample_per_batch]
        return pa.table({"v": v})

    sv = np.sort(np.concatenate([
        b["v"].to_numpy(zero_copy_only=False)
        for b in proj.map_batches(
            sample, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ] or [np.array([], dtype=np.float64)]))
    if len(sv):
        qs = np.linspace(0, 1, num_buckets + 1)[1:-1]
        splitters = np.unique(np.quantile(sv, qs))
    else:
        splitters = np.array([], dtype=np.float64)
    nb = len(splitters) + 1

    def counts(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.searchsorted(splitters, v, side="left")
        c = np.bincount(b, minlength=nb).astype(np.int64)
        return pa.table({"b": np.arange(nb, dtype=np.int64), "c": c})

    sizes = (
        proj.map_batches(counts, batch_size=None, batch_format="pyarrow",
                         zero_copy_batch=True)
        .to_pandas().groupby("b")["c"].sum()
        .reindex(range(nb), fill_value=0).to_numpy()
    )
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])

    def assign(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        t = t.filter(pa.array(keep))
        b = np.searchsorted(splitters, v[keep], side="left")
        return t.append_column(BUCKET_COL, pa.array(b.astype(np.int64)))

    tagged = proj.map_batches(
        assign, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df[BUCKET_COL].iloc[0])
        d = df.drop(columns=[BUCKET_COL]).sort_values(
            [value_col, tiebreak_col], kind="stable"
        ).reset_index(drop=True)
        d[out_col] = offsets[b] + 1 + np.arange(len(d), dtype=np.int64)
        return d

    return bucketed_map_groups(
        tagged, rank, num_buckets=nb, batch_format="pandas"
    )


def share_of_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    out_col: str | None = None,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Ratio feature: each row's share of its group's total —
    ``v / Σ_group v`` (the "share of user's spend" family). Null value →
    null; zero/null group total → null (SQL ``NULLIF`` semantics); null
    group keys form their own share pool, matching SQL
    ``PARTITION BY g`` null-group behavior.

    Two passes, NO shuffle (the ``group_standardize`` shape): per-batch
    (group, Σv) partials merge driver-side and broadcast back with the
    stage closure; pass 2 is a row-local divide.
    """
    import numpy as np
    import pyarrow as pa

    out = out_col or f"{value_col}_share"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df[[group_col, value_col]]
            .groupby(group_col, sort=False, dropna=False)[value_col]
            .sum(min_count=1).rename("_s").reset_index()
        )

    totals = (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
        .groupby(group_col, sort=True, dropna=False)["_s"].sum(min_count=1)
    )

    def transform(t: pa.Table) -> pa.Table:
        g = pd.Series(t[group_col].to_numpy(zero_copy_only=False))
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        tot = totals.reindex(g).to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            share = v / np.where(tot == 0, np.nan, tot)
        return t.append_column(out, pa.array(np.round(share, round_digits)))

    return ds.map_batches(
        transform, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )


def expect(
    ds: ray.data.Dataset,
    rules: Sequence[dict],
    *,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Declarative data-quality gate — evaluate expectation rules over the
    dataset and report per-rule violation counts (the great-expectations
    validation step pipelines run before training). Each rule is a dict:

    - ``{"col", "kind": "not_null"}`` — violations = null rows
    - ``{"col", "kind": "between", "lo", "hi"}`` — non-null values outside
      [lo, hi]
    - ``{"col", "kind": "in_set", "values": [...]}`` — non-null values not
      in the set
    - ``{"col", "kind": "regex", "pattern"}`` — non-null strings NOT
      matching the RE2 pattern (SQL ``regexp_matches`` mirror)
    - ``{"col", "kind": "unique"}`` — duplicate rows =
      non-null total − distinct count

    Output: (rule:string, violations:int64, total:int64, passed:bool),
    one row per rule in input order; ``rule`` is ``"{col}:{kind}"``.

    Scale shape: every rule except ``unique`` collapses each block to two
    ints (violations, total) — a pure map + driver sum. ``unique`` routes
    through the count_distinct shape: per-batch distinct-value partials,
    ONE hash(value) exchange, per-bucket distinct counts summed
    driver-side (the only rule that must see values globally).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    rules = [dict(r) for r in rules]
    simple = [(i, r) for i, r in enumerate(rules) if r["kind"] != "unique"]
    uniq = [(i, r) for i, r in enumerate(rules) if r["kind"] == "unique"]

    cols = sorted({r["col"] for r in rules})
    proj = ds.select_columns(cols)

    def counts(t: pa.Table) -> pa.Table:
        viol, tot = [], []
        for _i, r in simple:
            col = t[r["col"]]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            valid = col.is_valid()
            n_valid = pc.sum(valid).as_py() or 0
            if r["kind"] == "not_null":
                viol.append(t.num_rows - n_valid)
                tot.append(t.num_rows)
                continue
            if r["kind"] == "between":
                ok = pc.and_(pc.greater_equal(col, r["lo"]),
                             pc.less_equal(col, r["hi"]))
            elif r["kind"] == "in_set":
                ok = pc.is_in(col, value_set=pa.array(r["values"]))
            elif r["kind"] == "regex":
                ok = pc.match_substring_regex(col, r["pattern"])
            else:
                raise ValueError(f"unknown rule kind {r['kind']!r}")
            n_ok = pc.sum(pc.and_(valid, pc.fill_null(ok, False))).as_py() or 0
            viol.append(n_valid - n_ok)
            tot.append(n_valid)
        return pa.table({
            "idx": pa.array([i for i, _ in simple], pa.int64()),
            "v": pa.array(viol, pa.int64()),
            "t": pa.array(tot, pa.int64()),
        })

    results: dict[int, tuple[int, int]] = {}
    if simple:
        agg = (
            proj.map_batches(counts, batch_size=None, batch_format="pyarrow",
                             zero_copy_batch=True)
            .to_pandas().groupby("idx")[["v", "t"]].sum()
        )
        for i, _r in simple:
            results[i] = (int(agg.loc[i, "v"]), int(agg.loc[i, "t"]))

    for i, r in uniq:
        col = r["col"]

        def upart(t: pa.Table, col=col) -> pa.Table:
            c = t[col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            c = c.drop_null()
            u = pc.unique(c)
            # first row of each partial carries the batch's non-null total
            n = np.zeros(len(u), dtype=np.int64)
            if len(n):
                n[0] = len(c)
            return pa.table({"val": u, "n": pa.array(n)})

        parts = proj.select_columns([col]).map_batches(
            upart, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        from featherstore_ray.exchange import bucketed_map_groups
        from featherstore_ray.partition import BUCKET_COL, add_bucket_column

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "d": [df["val"].nunique()],
                "n": [df["n"].sum()],
            })

        merged = bucketed_map_groups(
            add_bucket_column(parts, "val", num_buckets),
            lambda df: per_bucket(df.drop(columns=[BUCKET_COL])),
            num_buckets=num_buckets, batch_format="pandas",
        ).to_pandas()
        total = int(merged["n"].sum())
        distinct_n = int(merged["d"].sum())
        results[i] = (total - distinct_n, total)

    names = [f"{r['col']}:{r['kind']}" for r in rules]
    v = [results[i][0] for i in range(len(rules))]
    t_ = [results[i][1] for i in range(len(rules))]
    return ray.data.from_arrow(pa.table({
        "rule": pa.array(names, pa.string()),
        "violations": pa.array(v, pa.int64()),
        "total": pa.array(t_, pa.int64()),
        "passed": pa.array([x == 0 for x in v], pa.bool_()),
    }))


def _spread_bits16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each element to the even bit positions
    (Morton-code helper): b15..b0 -> ..b1 0 b0."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def zorder_layout(
    ds: ray.data.Dataset,
    col_a: str,
    col_b: str,
    *,
    id_cols: Sequence[str] = ("event_id",),
    bits: int = 16,
    num_partitions: int = 16,
    out_key: str = "zkey",
    out_part: str = "zpart",
) -> ray.data.Dataset:
    """Z-order (Morton) clustering key over two columns — the layout step
    behind Delta/Iceberg ``OPTIMIZE ZORDER BY (a, b)``: rows close in the
    interleaved key are close in BOTH dimensions, so per-partition min/max
    zone maps prune selective predicates on either column after a
    repartition by ``zpart``.

    Pass 1 collapses each block to (min, max) of both columns (driver-
    merged, no shuffle); pass 2 quantizes each value to ``bits`` fixed-
    point levels over the global range — ``q = clamp(floor((x - mn) /
    (mx - mn) * 2^bits), 0, 2^bits - 1)``, pure IEEE ops so SQL mirrors
    bit-for-bit — and interleaves a-bits into even, b-bits into odd
    positions (vectorized magic-number spread). ``zpart`` is the top
    ``log2(num_partitions)`` bits of the key. Emits the id columns +
    ``zkey``/``zpart``; feed ``zpart`` to ``repartition_by_bucket`` (or a
    parquet partition column) to materialize the layout. Null rows in
    either column are excluded (no defined position on the curve).
    """
    if bits > 16:
        raise ValueError("bits must be <= 16 (two coords in an int64 key)")
    if num_partitions & (num_partitions - 1):
        raise ValueError("num_partitions must be a power of two")
    ids = list(id_cols)
    cols = [col_a, col_b]
    proj = ds.select_columns(ids + cols).map_batches(
        lambda t: t.drop_null(), batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def mm_partial(t) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"c": pd.Series([], dtype="object"),
                                 "mn": pd.Series([], dtype="float64"),
                                 "mx": pd.Series([], dtype="float64")})
        rows = []
        for c in cols:
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            rows.append((c, float(v.min()), float(v.max())))
        return pd.DataFrame(rows, columns=["c", "mn", "mx"])

    mm = proj.map_batches(
        mm_partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    rng = {
        c: (g["mn"].min(), g["mx"].max()) for c, g in mm.groupby("c")
    }
    levels = float(1 << bits)
    cap = np.uint64((1 << bits) - 1)
    shift = np.uint64(2 * bits - int(np.log2(num_partitions)))

    def quant(v: np.ndarray, mn: float, mx: float) -> np.ndarray:
        if mx <= mn:
            return np.zeros(len(v), dtype=np.uint64)
        q = np.floor((v - mn) / (mx - mn) * levels)
        return np.minimum(q, float(cap)).astype(np.uint64)

    def assign(t) -> "pa.Table":
        import pyarrow as pa

        qa = quant(t[col_a].to_numpy(zero_copy_only=False)
                   .astype(np.float64), *rng[col_a])
        qb = quant(t[col_b].to_numpy(zero_copy_only=False)
                   .astype(np.float64), *rng[col_b])
        z = _spread_bits16(qa) | (_spread_bits16(qb) << np.uint64(1))
        out = {c: t[c] for c in ids}
        out[out_key] = pa.array(z.astype(np.int64))
        out[out_part] = pa.array((z >> shift).astype(np.int64))
        return pa.table(out)

    return proj.map_batches(
        assign, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def group_sample(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    k: int,
    *,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Deterministic k-per-group sample: within every group keep the k
    rows with the smallest multiplicative hash of ``key_col`` (ties by
    key ascending) — the "review 100 docs per source" draw, reproducible
    across engines/runs/partitionings like ``hash_split``/
    ``weighted_sample`` (same SQL-expressible hash family). Null
    group/key rows drop.

    One hash(group) exchange of the projected rows; per-bucket sort +
    head. The hash is uniform, so this is a uniform without-replacement
    sample per group.
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def pre(t: pa.Table) -> pa.Table:
        t = t.drop_null()
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (keys % np.uint64(1 << 32)) * np.uint64(_SPLIT_MULT) \
            % np.uint64(1 << 32)
        return t.append_column("_gs_h", pa.array(h.astype(np.int64)))

    slim = ds.select_columns([group_col, key_col]).map_batches(
        pre, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    slim = add_bucket_column(slim, group_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        out = (
            df.sort_values([group_col, "_gs_h", key_col], kind="stable")
            .groupby(group_col, sort=False).head(k)
        )
        return out.drop(columns=["_gs_h"]).reset_index(drop=True)

    return bucketed_map_groups(
        slim, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def lift_table(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
    *,
    n_bins: int = 10,
    round_digits: int = 6,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Gains/lift table — the campaign-targeting report next to
    :func:`~featherstore_ray.stages.aggregate.pr_curve`: rows ranked by
    score descending (ties by ascending ``tiebreak_col``) and cut into
    ``n_bins`` equal-count bins by the EXPLICIT integer formula
    ``bin = (rank−1)·n_bins // n + 1`` (NTILE's remainder distribution
    is engine-specific; this formula is integer-exact on both sides).
    Per bin: row/positive counts, the bin's positive rate, cumulative
    capture of all positives, and lift vs the base rate. Rows with a
    null score/label/tiebreak are excluded. ``label_col`` is 0/1.

    Scale shape: the ranking is :func:`global_rank`'s sample-sort (three
    narrow passes + ONE range exchange); bins then reduce to
    n_bins-bounded integer partials per batch and the driver finishes
    the cumulative sums — ratios of identical ints are IEEE-identical
    with the oracle's window mirror.
    """
    import pyarrow as pa

    proj = ds.select_columns([score_col, label_col, tiebreak_col])

    def neg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = t.drop_null()
        return pa.table({
            "_neg": pc.negate(pc.cast(d[score_col], pa.float64())),
            "_y": pc.cast(d[label_col], pa.int64()),
            tiebreak_col: d[tiebreak_col],
        })

    scored = proj.map_batches(
        neg, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    # global_rank materializes only its (value, tiebreak) projection, so
    # the label joins back on the tiebreak key (one co-partitioned
    # exchange)
    from featherstore_ray.stages.join import hash_join

    ranked = global_rank(scored, "_neg", tiebreak_col, out_col="_rnk",
                         num_buckets=num_buckets)
    labels = scored.select_columns([tiebreak_col, "_y"])
    ranked = hash_join(ranked, labels, on=[tiebreak_col], how="inner",
                       num_partitions=num_buckets)
    n_total = ranked.count()
    if n_total == 0:
        return ray.data.from_arrow(pa.table({
            "bin": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "n_pos": pa.array([], pa.int64()),
            "rate": pa.array([], pa.float64()),
            "cum_capture": pa.array([], pa.float64()),
            "lift": pa.array([], pa.float64()),
        }))

    def binify(df: pd.DataFrame) -> pd.DataFrame:
        rnk = df["_rnk"].to_numpy(dtype=np.int64)
        b = (rnk - 1) * n_bins // n_total + 1
        g = pd.DataFrame({"bin": b, "_y": df["_y"].to_numpy()}) \
            .groupby("bin", sort=True)["_y"].agg(n="count", p="sum")
        return g.reset_index()

    parts = ranked.map_batches(
        binify, batch_size=None, batch_format="pandas"
    ).to_pandas()
    g = parts.groupby("bin", sort=True)[["n", "p"]].sum()
    n = g["n"].to_numpy(dtype=np.int64)
    p = g["p"].to_numpy(dtype=np.int64)
    pos = int(p.sum())
    base = pos / n_total
    rate = p / n
    cum = np.cumsum(p) / pos if pos > 0 else np.full(len(p), np.nan)
    lift = rate / base if pos > 0 else np.full(len(p), np.nan)
    return ray.data.from_arrow(pa.table({
        "bin": pa.array(g.index.to_numpy(dtype=np.int64)),
        "n": pa.array(n),
        "n_pos": pa.array(p),
        "rate": pa.array(np.round(rate, round_digits)),
        "cum_capture": pa.array(np.round(cum, round_digits)),
        "lift": pa.array(np.round(lift, round_digits)),
    }))


def _skyline_mask(X: np.ndarray, chunk: int = 2048) -> np.ndarray:
    """Boolean skyline membership for ``X`` (n, d), minimize-oriented:
    row p dominates row q iff p <= q on every dim and p < q on at least
    one. Dominance implies a strictly smaller dim-sum, so processing in
    sum-ascending order means a point can only be dominated by EARLIER
    points: check each chunk against the accumulated skyline, then run an
    exact pairwise pass inside the chunk. Every broadcast is bounded at
    ``chunk x chunk x d`` — no n^2 blowup. Removing points dominated by
    ANY point (skyline or not) is exact: dominance is transitive and the
    chain terminates at a skyline point."""
    n = len(X)
    order = np.lexsort((np.arange(n), X.sum(axis=1)))
    keep = np.zeros(n, dtype=bool)
    sky_chunks: list[np.ndarray] = []
    for start in range(0, n, chunk):
        idx_o = order[start:start + chunk]
        C = X[idx_o]
        dom = np.zeros(len(C), dtype=bool)
        for S in sky_chunks:
            le = (S[:, None, :] <= C[None, :, :]).all(axis=-1)
            lt = (S[:, None, :] < C[None, :, :]).any(axis=-1)
            dom |= (le & lt).any(axis=0)
        alive = np.where(~dom)[0]
        if len(alive):
            A = C[alive]
            le = (A[:, None, :] <= A[None, :, :]).all(axis=-1)
            lt = (A[:, None, :] < A[None, :, :]).any(axis=-1)
            dom2 = (le & lt).any(axis=0)
            alive = alive[~dom2]
        if len(alive):
            keep[idx_o[alive]] = True
            sky_chunks.append(C[alive])
    return keep


def skyline_nd(
    ds: ray.data.Dataset,
    dims: Sequence[str],
    *,
    directions: Sequence[str] | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """N-dimensional skyline (Pareto frontier) over ``dims`` — the d >= 3
    generalization of :func:`skyline` (whose prefix-maxima kernel is
    2-D-only): the rows not dominated by any other row, where row p
    dominates q iff p is at-least-as-good on every dim and strictly
    better on at least one (``directions[i]`` in {"min", "max"}, default
    all "min"). Rows with identical dim vectors never dominate each
    other — all duplicates of a frontier point are kept, the SQL
    NOT EXISTS semantics. Null dims are out of contract (filtered).

    Scale shape: dominance within a block implies dominance globally, so
    each block reduces to its LOCAL skyline first (O(log^(d-1) n)
    expected size for independent dims) and only the union of local
    skylines — tiny relative to the input — moves to the final single
    task for the exact global pass. Both levels use the sum-ordered
    chunked kernel (:func:`_skyline_mask`); no all-pairs over the input.
    If the union itself were huge (adversarially anti-correlated dims),
    the merge level would need a tree of the same partial — documented,
    not built.
    """
    dims = list(dims)
    if directions is None:
        directions = ["min"] * len(dims)
    directions = list(directions)
    if len(directions) != len(dims):
        raise ValueError("directions must match dims")
    sign = np.array([1.0 if d == "min" else -1.0 for d in directions])

    def _oriented(df: pd.DataFrame) -> np.ndarray:
        return df[dims].to_numpy(dtype=np.float64) * sign

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=dims).reset_index(drop=True)
        if not len(df):
            return df
        return df[_skyline_mask(_oriented(df))].reset_index(drop=True)

    parts = ds.map_batches(partial, batch_size=None, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        if not len(df):
            return df
        return df[_skyline_mask(_oriented(df))].reset_index(drop=True)

    return parts.repartition(1).map_batches(
        final, batch_size=None, batch_format="pandas"
    )
