"""Windowed feature builders: lag/lead, rolling backfill, sessionization.

North-star operators (BASELINE.json) anchored to the reference's per-entity
``ORDER BY timestamp`` retrieval semantics (pkg/storage/duckdb/duckdb.go:621,
688). The reference itself has no aggregations (SURVEY.md §2.5) — semantics
here follow the standard SQL window definitions so DuckDB can oracle them:

- lag/lead(k): offsets within the per-entity (ts, tiebreak) ordering
  (oracle: ``LAG/LEAD OVER (PARTITION BY e ORDER BY ts, tiebreak)``)
- rolling: time-range window ``[t - w, t]`` inclusive BOTH ends including all
  peer rows with equal ts (oracle: ``RANGE BETWEEN w PRECEDING AND CURRENT
  ROW``, whose frame is closed on both ends and peer-inclusive)
- sessionize: new session when ``ts - prev_ts > gap`` (strictly greater)
  within an entity; session ids are 0-based per entity

Scale shape: ONE shuffle on ``hash(entity) % B`` (groupby bucket), then a
fully vectorized numpy kernel per bucket — never a Python call per entity or
per row. Inside a bucket, per-entity windows are computed with the
"timestamp offsetting" trick: shift each entity's int64-µs timestamps by
``group_id * span`` so a single global ``np.searchsorted`` resolves every
row's window bounds at once; rolling sums/counts then come from one cumsum.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import timedelta

import numpy as np
import pandas as pd

import ray.data

from featherstore_ray.partition import BUCKET_COL, add_bucket_column
from featherstore_ray.exchange import bucketed_map_groups

_I64_MAX = np.iinfo(np.int64).max


def _ts_us(series: pd.Series) -> np.ndarray:
    """Timestamp column → int64 microseconds (engine canon, duckdb.go:332)."""
    v = series.to_numpy()
    if v.dtype.kind == "M":
        return v.astype("datetime64[us]").astype(np.int64)
    return v.astype(np.int64)


def _window_us(window) -> int:
    if isinstance(window, timedelta):
        return int(window / timedelta(microseconds=1))
    return int(window)


def _sort_entity_ts(
    df: pd.DataFrame, entity_col: str, ts_col: str, tiebreak: str | None
) -> tuple[pd.DataFrame, np.ndarray, np.ndarray, np.ndarray]:
    """Sort by (entity, ts[, tiebreak]) and return group geometry.

    Returns (sorted df, new_entity bool mask, group starts, row-within-group).
    """
    by = [entity_col, ts_col] + ([tiebreak] if tiebreak else [])
    df = df.sort_values(by, kind="stable").reset_index(drop=True)
    n = len(df)
    ent = df[entity_col].to_numpy()
    new_ent = np.empty(n, dtype=bool)
    if n:
        new_ent[0] = True
        new_ent[1:] = ent[1:] != ent[:-1]
    starts = np.flatnonzero(new_ent)
    sizes = np.diff(np.append(starts, n))
    rwg = np.arange(n) - np.repeat(starts, sizes)
    return df, new_ent, starts, rwg


def _group_offset_ts(ts: np.ndarray, new_ent: np.ndarray, window_us: int):
    """Per-entity monotone ts → globally monotone via group_id * span offset.

    Guarantees windows never cross entity boundaries (the offset gap between
    consecutive groups exceeds the window). Returns None on (theoretical)
    int64 overflow — caller falls back to a per-group loop.
    """
    n = len(ts)
    if n == 0:
        return np.empty(0, np.int64)
    rel = ts - ts.min()
    span = int(rel.max()) + window_us + 1
    group_id = np.cumsum(new_ent) - 1
    if group_id[-1] and span > (_I64_MAX - int(rel.max())) // int(group_id[-1]):
        return None
    return rel + group_id * span


def _bucketed(
    ds: ray.data.Dataset, entity_col: str, num_buckets: int, kernel
) -> ray.data.Dataset:
    """The one-shuffle template: bucket → groupby(bucket) → vector kernel."""
    ds = add_bucket_column(ds, entity_col, num_buckets)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return kernel(df.drop(columns=[BUCKET_COL]))

    return bucketed_map_groups(ds, run, num_buckets=num_buckets, batch_format="pandas")


# -- lag / lead ------------------------------------------------------------


def lag_lead(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_cols: Sequence[str],
    lags: Sequence[int] = (1,),
    leads: Sequence[int] = (),
    tiebreak: str | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Add ``{col}_lag{k}`` / ``{col}_lead{k}`` columns per entity.

    Oracle: ``LAG(col, k) OVER (PARTITION BY entity ORDER BY ts, tiebreak)``.
    """

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df, new_ent, starts, rwg = _sort_entity_ts(df, entity_col, ts_col, tiebreak)
        n = len(df)
        sizes = np.diff(np.append(starts, n))
        rwg_end = np.repeat(sizes, sizes) - 1 - rwg
        for col in value_cols:
            for k in lags:
                s = df[col].shift(k)
                s[rwg < k] = None
                df[f"{col}_lag{k}"] = s
            for k in leads:
                s = df[col].shift(-k)
                s[rwg_end < k] = None
                df[f"{col}_lead{k}"] = s
        return df

    return _bucketed(ds, entity_col, num_buckets, kernel)


# -- rolling backfill ------------------------------------------------------


def rolling_aggregate(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    window,
    aggs: Sequence[str] = ("sum", "mean", "count"),
    suffix: str | None = None,
    tiebreak: str | None = None,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Trailing time-window aggregate per entity over ``[t - w, t]``.

    Window bounds are inclusive on both ends and include all peer rows with
    equal ts — exactly SQL ``RANGE BETWEEN w PRECEDING AND CURRENT ROW``.
    Float outputs are rounded to ``round_digits`` so summation order
    (our single cumsum vs the oracle's tree aggregation) cannot flip the
    last ulp; pass ``None`` to disable.
    """
    w_us = _window_us(window)
    kernel = make_rolling_kernel(
        entity_col, ts_col, value_col, tiebreak,
        w_us=w_us, aggs=aggs, suffix=suffix, round_digits=round_digits,
    )
    return _bucketed(ds, entity_col, num_buckets, kernel)


def make_rolling_kernel(
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None,
    *,
    w_us: int,
    aggs: Sequence[str] = ("sum", "mean", "count"),
    suffix: str | None = None,
    round_digits: int | None = 6,
):
    """Bucket-local RANGE-frame rolling kernel (the body of
    ``rolling_aggregate``), exposed so other physical plans — e.g. the
    chunked hot-entity path — can reuse the exact same semantics."""
    sfx = suffix if suffix is not None else ""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df, new_ent, starts, _ = _sort_entity_ts(df, entity_col, ts_col, tiebreak)
        n = len(df)
        ts = _ts_us(df[ts_col])
        vals = df[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        key = _group_offset_ts(ts, new_ent, w_us)
        if key is None:  # overflow fallback: per-entity searchsorted loop
            lo = np.empty(n, np.int64)
            hi = np.empty(n, np.int64)
            bounds = np.append(starts, n)
            for g0, g1 in zip(bounds[:-1], bounds[1:]):
                tg = ts[g0:g1]
                lo[g0:g1] = g0 + np.searchsorted(tg, tg - w_us, side="left")
                hi[g0:g1] = g0 + np.searchsorted(tg, tg, side="right")
        else:
            lo = np.searchsorted(key, key - w_us, side="left")
            hi = np.searchsorted(key, key, side="right")
        valid = ~np.isnan(vals)
        csum = np.concatenate(([0.0], np.cumsum(np.where(valid, vals, 0.0))))
        ccnt = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
        rcnt = ccnt[hi] - ccnt[lo]
        rsum = csum[hi] - csum[lo]
        rsum = np.where(rcnt == 0, np.nan, rsum)
        out = {}
        if "sum" in aggs:
            out[f"{value_col}_rsum{sfx}"] = rsum
        if "mean" in aggs:
            out[f"{value_col}_rmean{sfx}"] = rsum / np.where(rcnt == 0, 1, rcnt)
        if "count" in aggs:
            out[f"{value_col}_rcount{sfx}"] = rcnt
        if {"min", "max"} & set(aggs):
            # Exact RANGE-frame min/max incl. peer rows: pandas computes the
            # POSITIONAL time-rolling extreme (row j sees rows <= j in
            # [t_j - w, t_j]); gathering at each row's last-peer index
            # (hi - 1) pools all equal-ts peers, matching SQL RANGE.
            tmp = pd.DataFrame(
                {
                    "g": np.cumsum(new_ent) - 1,
                    "t": ts.astype("datetime64[us]"),
                    "v": vals,
                }
            )
            roll = tmp.groupby("g", sort=False).rolling(
                pd.Timedelta(microseconds=w_us), on="t", closed="both"
            )["v"]
            if "min" in aggs:
                out[f"{value_col}_rmin{sfx}"] = roll.min().to_numpy()[hi - 1]
            if "max" in aggs:
                out[f"{value_col}_rmax{sfx}"] = roll.max().to_numpy()[hi - 1]
        for name, arr in out.items():
            if round_digits is not None and arr.dtype.kind == "f":
                arr = np.round(arr, round_digits)
            df[name] = arr
        return df

    return kernel


def rolling_quantile(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    window,
    q: float = 0.5,
    tiebreak: str | None = None,
    out_col: str | None = None,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Trailing time-window quantile per entity over ``[t - w, t]`` —
    the robust rolling statistic (rolling median / p90) that ``sum``-family
    frames can't express.

    Same RANGE-frame semantics as :func:`rolling_aggregate` (inclusive
    both ends, equal-ts peers pooled): pandas computes the POSITIONAL
    time-rolling quantile (linear interpolation — SQL ``quantile_cont``)
    and each row gathers at its last-peer index ``hi - 1``. Nulls inside
    the frame are skipped; an all-null frame yields null. ONE entity
    exchange; the kernel never loops rows except the documented ts-overflow
    fallback.
    """
    w_us = _window_us(window)
    name = out_col or f"{value_col}_rq"

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df, new_ent, starts, _ = _sort_entity_ts(df, entity_col, ts_col, tiebreak)
        n = len(df)
        ts = _ts_us(df[ts_col])
        vals = df[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        key = _group_offset_ts(ts, new_ent, w_us)
        if key is None:  # overflow fallback: per-entity searchsorted loop
            hi = np.empty(n, np.int64)
            bounds = np.append(starts, n)
            for g0, g1 in zip(bounds[:-1], bounds[1:]):
                tg = ts[g0:g1]
                hi[g0:g1] = g0 + np.searchsorted(tg, tg, side="right")
        else:
            hi = np.searchsorted(key, key, side="right")
        tmp = pd.DataFrame({
            "g": np.cumsum(new_ent) - 1,
            "t": ts.astype("datetime64[us]"),
            "v": vals,
        })
        roll = tmp.groupby("g", sort=False).rolling(
            pd.Timedelta(microseconds=w_us), on="t", closed="both"
        )["v"]
        rq = roll.quantile(q, interpolation="linear").to_numpy()[hi - 1]
        if round_digits is not None:
            rq = np.round(rq, round_digits)
        df[name] = rq
        return df

    return _bucketed(ds, entity_col, num_buckets, kernel)


# -- cumulative + tumbling -------------------------------------------------


def cumulative(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-entity running sum/count of ``value_col`` in (ts, tiebreak) order.

    Oracle: ``SUM/COUNT(value) OVER (PARTITION BY e ORDER BY ts, tb
    ROWS UNBOUNDED PRECEDING)`` (ROWS frame: peers are NOT pooled — each row
    sees strictly its predecessors plus itself).
    """

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df, new_ent, starts, _ = _sort_entity_ts(df, entity_col, ts_col, tiebreak)
        n = len(df)
        sizes = np.diff(np.append(starts, n))
        vals = df[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        valid = ~np.isnan(vals)
        cs = np.cumsum(np.where(valid, vals, 0.0))
        cc = np.cumsum(valid.astype(np.int64))
        # subtract the running totals at each entity's start
        base_s = np.repeat(cs[starts] - np.where(valid[starts], vals[starts], 0.0), sizes)
        base_c = np.repeat(cc[starts] - valid[starts].astype(np.int64), sizes)
        csum = cs - base_s
        ccnt = cc - base_c
        csum = np.where(ccnt == 0, np.nan, csum)
        if round_digits is not None:
            csum = np.round(csum, round_digits)
        df[f"{value_col}_csum"] = csum
        df[f"{value_col}_ccount"] = ccnt
        return df

    return _bucketed(ds, entity_col, num_buckets, kernel)


def expanding_zscore(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    out_col: str | None = None,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Leakage-free expanding standardization: each value z-scored against
    the mean/sample-std of the entity's STRICTLY PRIOR values in
    (ts, tiebreak) order — the point-in-time feature scaling that never
    reads the current or any future row (zero temporal leakage by
    construction, unlike a full-group z-score).

    Null when fewer than 2 prior non-null values exist, when the prior
    variance is 0, or when the value is null. Oracle: ``ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING`` window sums, explicit-sum
    variance. Same one-exchange shape as :func:`cumulative` — vectorized
    shifted cumsums per bucket, no per-row loop.
    """
    out = out_col or f"{value_col}_xz"

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df, _new_ent, starts, _ = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        n = len(df)
        sizes = np.diff(np.append(starts, n))
        vals = df[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        valid = ~np.isnan(vals)
        v0 = np.where(valid, vals, 0.0)
        cs = np.cumsum(v0)
        css = np.cumsum(v0 * v0)
        cc = np.cumsum(valid.astype(np.int64))
        base_s = np.repeat(cs[starts] - v0[starts], sizes)
        base_ss = np.repeat(css[starts] - v0[starts] * v0[starts], sizes)
        base_c = np.repeat(cc[starts] - valid[starts].astype(np.int64),
                           sizes)
        # strictly-prior running moments: inclusive minus the current row
        ps = (cs - base_s) - v0
        pss = (css - base_ss) - v0 * v0
        pc_ = (cc - base_c) - valid.astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = ps / pc_
            var = (pss - ps * ps / pc_) / (pc_ - 1.0)
            z = np.where((pc_ >= 2) & (var > 0),
                         (vals - mean) / np.sqrt(var), np.nan)
        if round_digits is not None:
            z = np.round(z, round_digits)
        df[out] = z
        return df

    return _bucketed(ds, entity_col, num_buckets, kernel)


def group_rank(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    order_cols: Sequence[str],
    ascending: Sequence[bool] | None = None,
    tiebreak: str | None = None,
    ntile: int | None = None,
    pct: bool = False,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Add SQL window-rank columns per entity: ``rn`` (ROW_NUMBER), ``rnk``
    (RANK), ``dense_rnk`` (DENSE_RANK), all int64 — plus ``tile`` when
    ``ntile=k`` is given (SQL NTILE(k): the first n%k tiles get
    ceil(n/k) rows in rn order, the rest floor(n/k)), and ``pct_rank`` /
    ``cume_dist`` (SQL PERCENT_RANK = (rank-1)/(n-1), 0 for a 1-row group;
    CUME_DIST = peers-at-or-below / n) when ``pct=True``.

    Peers (ties) are rows equal on ALL ``order_cols`` — two nulls are
    peers, matching SQL ORDER BY. ``rn`` additionally orders peers by
    ``tiebreak`` so it is deterministic; pass a unique tiebreak (oracle:
    ``ROW_NUMBER() OVER (PARTITION BY e ORDER BY cols..., tb)`` next to
    ``RANK()/DENSE_RANK() OVER (PARTITION BY e ORDER BY cols...)``).
    One bucket shuffle on hash(entity); vectorized run-length kernel.
    """
    order_cols = list(order_cols)
    asc = list(ascending) if ascending is not None else [True] * len(order_cols)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        by = [entity_col] + order_cols + ([tiebreak] if tiebreak else [])
        df = df.sort_values(
            by, ascending=[True] + asc + ([True] if tiebreak else []),
            kind="stable",
        ).reset_index(drop=True)
        n = len(df)
        if n == 0:
            for c in ("rn", "rnk", "dense_rnk") + (
                ("tile",) if ntile else ()
            ):
                df[c] = pd.Series([], dtype=np.int64)
            if pct:
                for c in ("pct_rank", "cume_dist"):
                    df[c] = pd.Series([], dtype=np.float64)
            return df

        def _neq(col: str) -> np.ndarray:
            s = df[col]
            a, b = s.iloc[1:].reset_index(drop=True), s.iloc[:-1].reset_index(drop=True)
            both_na = a.isna().to_numpy() & b.isna().to_numpy()
            return (a != b).to_numpy() & ~both_na

        new_ent = np.concatenate(([True], _neq(entity_col)))
        chg = new_ent.copy()
        for c in order_cols:
            chg[1:] |= _neq(c)
        starts = np.flatnonzero(new_ent)
        sizes = np.diff(np.append(starts, n))
        group_base = np.repeat(starts, sizes)
        rn = np.arange(n, dtype=np.int64) - group_base
        run_id = np.cumsum(chg) - 1
        run_first = np.flatnonzero(chg)  # global pos of each run's first row
        df["rn"] = rn + 1
        df["rnk"] = run_first[run_id] - group_base + 1
        df["dense_rnk"] = run_id - run_id[group_base] + 1
        if ntile:
            gn = np.repeat(sizes, sizes)  # group size per row
            big = gn // ntile + 1  # rows in each of the first n%k tiles
            r = gn % ntile
            cut = r * big  # rows covered by the big tiles
            in_big = rn < cut
            small = np.maximum(gn // ntile, 1)  # avoid 0-div when n < k
            df["tile"] = np.where(
                in_big, rn // big, r + (rn - cut) // small
            ).astype(np.int64) + 1
        if pct:
            gn = np.repeat(sizes, sizes).astype(np.float64)
            rnk0 = (run_first[run_id] - group_base).astype(np.float64)
            df["pct_rank"] = np.where(
                gn > 1, rnk0 / np.maximum(gn - 1, 1), 0.0
            ).round(round_digits)
            run_end = np.append(run_first[1:], n)  # runs never cross entities
            df["cume_dist"] = (
                (run_end[run_id] - group_base) / gn
            ).round(round_digits)
        return df

    return _bucketed(ds, entity_col, num_buckets, kernel)


def tumbling_aggregate(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    width,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Fixed (tumbling) time-window aggregate per entity.

    Window id = ``floor(ts_us / width_us)`` (epoch-anchored). Output one row
    per (entity, window): n events, sum/mean of value, window start ts.
    Oracle: ``GROUP BY entity, epoch_us(ts) // width``.
    """
    w_us = _window_us(width)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    entity_col: df[entity_col],
                    "window_start": pd.Series(dtype="datetime64[us]"),
                    "n_events": pd.Series(dtype="int64"),
                    "sum_value": pd.Series(dtype="float64"),
                }
            )
        ts = _ts_us(df[ts_col])
        win = ts // w_us
        g = (
            pd.DataFrame(
                {entity_col: df[entity_col].to_numpy(), "_w": win,
                 "_v": df[value_col].to_numpy(dtype=np.float64, na_value=np.nan)}
            )
            .groupby([entity_col, "_w"], sort=True)
            .agg(n_events=("_v", "size"), sum_value=("_v", "sum"),
                 _vcnt=("_v", "count"))
            .reset_index()
        )
        g["sum_value"] = np.where(g["_vcnt"] == 0, np.nan, g["sum_value"])
        if round_digits is not None:
            g["sum_value"] = g["sum_value"].round(round_digits)
        g["window_start"] = (g["_w"] * w_us).astype("datetime64[us]")
        return g.drop(columns=["_w", "_vcnt"])

    return _bucketed(ds, entity_col, num_buckets, kernel)


def hopping_aggregate(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    width,
    slide,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Hopping (sliding) time-window aggregate per entity: windows of
    ``width`` starting every ``slide`` (epoch-anchored); a row lands in
    every window whose ``[start, start + width)`` half-open span covers it —
    ``width / slide`` windows per row.

    Physical plan: the per-row window ids are a contiguous integer range, so
    each batch EXPLODES rows into (entity, window, value) triples with
    ``np.repeat`` (vectorized, fan-out = width/slide), pre-aggregates the
    triples per (entity, window) INSIDE the batch, and only those partials
    cross the one bucket shuffle — the exchange moves per-(entity, window)
    partials, not the fan-out. Oracle: a lateral ``generate_series`` join.
    """
    w_us = _window_us(width)
    s_us = _window_us(slide)
    if w_us % s_us != 0:
        raise ValueError("width must be a multiple of slide")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    entity_col: df[entity_col],
                    "_w": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                    "sum_value": pd.Series(dtype="float64"),
                    "_vcnt": pd.Series(dtype="int64"),
                }
            )
        ts = _ts_us(df[ts_col])
        # window k covers [k*s, k*s + w): row joins k in
        # (floor((ts - w) / s), floor(ts / s)] — exactly w/s windows
        k_hi = ts // s_us
        k_lo = (ts - w_us) // s_us + 1
        fan = (k_hi - k_lo + 1).astype(np.int64)
        ent = np.repeat(df[entity_col].to_numpy(), fan)
        vals = np.repeat(
            df[value_col].to_numpy(dtype=np.float64, na_value=np.nan), fan
        )
        # per-row contiguous ranges k_lo..k_hi, flattened
        offs = np.concatenate(([0], np.cumsum(fan)))
        idx = np.arange(offs[-1]) - np.repeat(offs[:-1], fan)
        win = np.repeat(k_lo, fan) + idx
        g = (
            pd.DataFrame({entity_col: ent, "_w": win, "_v": vals})
            .groupby([entity_col, "_w"], sort=False)
            .agg(n_events=("_v", "size"), sum_value=("_v", "sum"),
                 _vcnt=("_v", "count"))
            .reset_index()
        )
        g["sum_value"] = np.where(g["_vcnt"] == 0, np.nan, g["sum_value"])
        return g

    ds = ds.map_batches(partial, batch_size=None, batch_format="pandas")
    ds = add_bucket_column(ds, entity_col, num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop(columns=[BUCKET_COL])
            .groupby([entity_col, "_w"], sort=True)
            .agg(
                n_events=("n_events", "sum"),
                sum_value=("sum_value", "sum"),
                _vcnt=("_vcnt", "sum"),
            )
            .reset_index()
        )
        g["sum_value"] = np.where(g["_vcnt"] == 0, np.nan, g["sum_value"])
        if round_digits is not None:
            g["sum_value"] = g["sum_value"].round(round_digits)
        g["window_start"] = (g["_w"] * s_us).astype("datetime64[us]")
        return g.drop(columns=["_w", "_vcnt"])

    from featherstore_ray.exchange import bucketed_map_groups

    return bucketed_map_groups(
        ds, final, num_buckets=num_buckets, batch_format="pandas"
    )


# -- sessionization --------------------------------------------------------


def sessionize(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    gap,
    session_col: str = "session_id",
    tiebreak: str | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Gap-based session ids per entity (0-based).

    A new session starts when ``ts - prev_ts > gap`` (STRICTLY greater — a
    gap exactly equal to the threshold stays in the same session). Oracle:
    cumulative sum over a gap flag (SURVEY.md A3).
    """
    gap_us = _window_us(gap)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df, new_ent, starts, _ = _sort_entity_ts(df, entity_col, ts_col, tiebreak)
        n = len(df)
        ts = _ts_us(df[ts_col])
        brk = np.zeros(n, dtype=np.int64)
        if n > 1:
            brk[1:] = (~new_ent[1:]) & ((ts[1:] - ts[:-1]) > gap_us)
        c = np.cumsum(brk)
        sizes = np.diff(np.append(starts, n))
        df[session_col] = c - np.repeat(c[starts] if n else c, sizes)
        return df

    return _bucketed(ds, entity_col, num_buckets, kernel)


def session_stats(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    gap,
    value_col: str | None = None,
    tiebreak: str | None = None,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-(entity, session) aggregate: event count, start/end ts, duration.

    Runs sessionization and aggregation inside ONE bucket kernel — entities
    never cross buckets, so per-bucket groupby is exact with no second
    shuffle.
    """
    gap_us = _window_us(gap)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df, new_ent, starts, _ = _sort_entity_ts(df, entity_col, ts_col, tiebreak)
        n = len(df)
        ts = _ts_us(df[ts_col])
        brk = np.zeros(n, dtype=np.int64)
        if n > 1:
            brk[1:] = (~new_ent[1:]) & ((ts[1:] - ts[:-1]) > gap_us)
        c = np.cumsum(brk)
        sizes = np.diff(np.append(starts, n))
        df["session_id"] = c - np.repeat(c[starts] if n else c, sizes)
        aggs = {"n_events": (ts_col, "size"),
                "start_ts": (ts_col, "min"),
                "end_ts": (ts_col, "max")}
        if value_col is not None:
            aggs["sum_value"] = (value_col, "sum")
        g = (
            df.groupby([entity_col, "session_id"], sort=True)
            .agg(**aggs)
            .reset_index()
        )
        dur = (
            g["end_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            - g["start_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        g["duration_sec"] = dur / 1_000_000.0
        if value_col is not None and round_digits is not None:
            g["sum_value"] = g["sum_value"].round(round_digits)
        return g

    return _bucketed(ds, entity_col, num_buckets, kernel)


# -- exponential moving average ---------------------------------------------


def ewma(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    max_span: int = 16,
    tiebreak: str | None = None,
    out_col: str = "ewma",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Truncated exponentially-weighted moving average per entity.

    For each non-null-value row i (ordered by ``(ts, tiebreak)`` within the
    entity), with decay ``a = 1 - alpha`` and truncation K = ``max_span``::

        ewma_i = Σ_{k=0}^{min(i, K-1)} a^k · x_{i-k}
                 ─────────────────────────────────────
                 Σ_{k=0}^{min(i, K-1)} a^k

    (pandas ``ewm(adjust=True)`` truncated to the last K observations).
    The truncation makes the value an EXACT K-term expression, so the SQL
    oracle is the matching sum of K ``LAG`` terms — untruncated EWMA is a
    recursive scan no window frame can express.

    Scale shape: rows with null values are dropped in a streaming filter,
    then ONE entity exchange; the kernel is K vectorized shifted
    fused-multiply-adds over the whole bucket (never a per-row loop), with
    cross-entity leakage masked by row-within-group position.
    """
    if not 0.0 < float(alpha) <= 1.0:
        # alpha=0 makes den = (1 - 1**n)/(1 - 1) = 0/0 → silent all-NaN
        raise ValueError(f"ewma alpha must be in (0, 1], got {alpha!r}")
    if int(max_span) < 1:
        raise ValueError(f"ewma max_span must be >= 1, got {max_span!r}")
    a = 1.0 - float(alpha)
    K = int(max_span)

    def drop_null(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[value_col].notna()]

    ds = ds.map_batches(drop_null, batch_size=None, batch_format="pandas")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df, new_ent, starts, rwg = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        x = df[value_col].to_numpy(dtype=np.float64)
        n = len(df)
        num = np.zeros(n, np.float64)
        shifted = np.empty(n, np.float64)
        for k in range(K):
            if k >= n:
                break
            shifted[:k] = 0.0
            shifted[k:] = x[: n - k]
            np.multiply(shifted, a**k, out=shifted)
            shifted[rwg < k] = 0.0  # window never crosses the entity
            num += shifted
        nterms = np.minimum(rwg + 1, K).astype(np.float64)
        den = (1.0 - a**nterms) / (1.0 - a)
        out = num / den
        if round_digits is not None:
            out = np.round(out, round_digits)
        df[out_col] = out
        return df

    return _bucketed(ds, entity_col, num_buckets, kernel)


# -- daily resample + forward fill -------------------------------------------


def resample_ffill(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    out_col: str = "value_ffill",
    day_col: str = "day_ts",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Daily end-of-day snapshot grid per entity with forward fill.

    For each entity, emits one row per UTC epoch-day from its first to its
    last active day; ``out_col`` is the value of the entity's latest event
    (by ``ts`` then ``tiebreak``) on or before the end of that day — the
    point-in-time daily feature snapshot a feature store serves. A null
    value on the latest event is CARRIED (last-observation semantics), not
    skipped.

    Scale shape: ONE entity exchange, then a fully vectorized kernel: the
    per-entity day grids are built with a repeat/arange expansion and every
    grid day is as-of-resolved against the sorted events with a single
    global ``np.searchsorted`` using the same group-offset trick as the
    rolling kernels. Output size is Σ per-entity day spans — bounded by
    entities × calendar days, independent of event count.
    """
    _DAY = 86_400_000_000

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df, new_ent, starts, rwg = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        n = len(df)
        ent = df[entity_col].to_numpy()
        if n == 0:
            return pd.DataFrame({
                entity_col: ent,
                day_col: pd.Series(dtype="datetime64[us]"),
                out_col: df[value_col],
            })
        ts = _ts_us(df[ts_col])
        day = ts // _DAY
        ends = np.append(starts[1:], n) - 1
        d0, d1 = day[starts], day[ends]
        counts = (d1 - d0 + 1).astype(np.int64)
        # grid_day[j] spans d0..d1 per entity via repeat/arange
        base = np.repeat(d0, counts)
        offs = np.arange(counts.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts)
        grid_day = base + offs
        # group-offset both sides so ONE searchsorted resolves all entities
        rel = ts - ts.min()
        gid = np.cumsum(new_ent) - 1
        span = int(rel.max()) + _DAY + 2
        if gid[-1] and span > _I64_MAX // (int(gid[-1]) + 1):
            # int64 keys would wrap (same guard as _group_offset_ts): the
            # offset trick silently breaks monotonicity on overflow, so
            # resolve each entity's grid against its own slice instead
            idx = np.empty(len(grid_day), np.int64)
            ends_excl = np.append(starts[1:], n)
            pos = np.cumsum(counts) - counts
            for g, (s, e) in enumerate(zip(starts, ends_excl)):
                lo, hi = pos[g], pos[g] + counts[g]
                idx[lo:hi] = s + np.searchsorted(
                    ts[s:e], (grid_day[lo:hi] + 1) * _DAY, side="left") - 1
        else:
            key_ts = rel + gid * span
            grid_gid = np.repeat(gid[starts], counts)
            key_b = ((grid_day + 1) * _DAY - ts.min()) + grid_gid * span
            idx = np.searchsorted(key_ts, key_b, side="left") - 1
        vals = df[value_col].to_numpy()
        return pd.DataFrame({
            entity_col: np.repeat(ent[starts], counts),
            day_col: pd.Series(grid_day * _DAY, dtype="int64").astype(
                "datetime64[us]"),
            out_col: vals[idx],
        })

    proj = ds.select_columns(
        [entity_col, ts_col, value_col] + ([tiebreak] if tiebreak else [])
    ).map_batches(
        lambda df: df[df[ts_col].notna()],
        batch_size=None, batch_format="pandas",
    )
    return _bucketed(proj, entity_col, num_buckets, kernel)


# -- time-weighted average ---------------------------------------------------


def time_weighted_avg(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    out_col: str = "twa",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-entity time-weighted average over an irregular series (TWAP).

    Each observation holds from its timestamp to the next one within the
    entity (piecewise-constant, ordered by ``(ts, tiebreak)``)::

        twa = Σ value_i · (ts_{i+1} − ts_i)  /  (ts_last − ts_first)

    The last observation contributes no duration. Rows with null values are
    dropped up front on both engines; entities whose observations all share
    one timestamp (zero total duration, incl. single-row entities) are
    omitted — division semantics match the SQL ``HAVING sum(dt) > 0``.

    Scale shape: streaming null filter + column projection, then ONE entity
    exchange; the kernel is a lexsort + diff + ``add.reduceat`` — no per-row
    or per-entity loop.
    """

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df, new_ent, starts, _ = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        n = len(df)
        if n == 0:
            return pd.DataFrame({entity_col: df[entity_col],
                                 out_col: pd.Series(dtype="float64")})
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        dt = np.zeros(n, np.float64)
        dt[:-1] = (ts[1:] - ts[:-1]).astype(np.float64)
        dt[np.flatnonzero(new_ent) - 1] = 0.0  # last row of each entity
        if n:
            dt[-1] = 0.0
        x = df[value_col].to_numpy(dtype=np.float64)
        seg = np.flatnonzero(new_ent)
        num = np.add.reduceat(x * dt, seg)
        den = np.add.reduceat(dt, seg)
        ent = df[entity_col].to_numpy()[seg]
        keep = den > 0
        twa = num[keep] / den[keep]
        if round_digits is not None:
            twa = np.round(twa, round_digits)
        return pd.DataFrame({entity_col: ent[keep], out_col: twa})

    proj = ds.select_columns(
        [entity_col, ts_col, value_col] + ([tiebreak] if tiebreak else [])
    ).map_batches(
        # entity_col too (grouped-reducing-op contract): null entities would
        # otherwise reach the kernel where NaN != NaN makes each its own
        # 1-row group, while SQL's GROUP BY pools ALL null users into one —
        # the oracle carries the matching user_id IS NOT NULL
        lambda df: df[df[value_col].notna() & df[ts_col].notna()
                      & df[entity_col].notna()],
        batch_size=None, batch_format="pandas",
    )
    return _bucketed(proj, entity_col, num_buckets, kernel)


def burstiness(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    tiebreak: str | None = None,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-entity inter-arrival burstiness — Goh-Barabási
    ``B = (σ − μ) / (σ + μ)`` over the gaps between consecutive events in
    (ts, tiebreak) order (−1 = perfectly periodic, 0 = Poisson, →1 =
    extremely bursty), plus the supporting ``gap_mean`` / ``gap_std``
    seconds (sample std). Entities with < 3 events (< 2 gaps) yield null
    B/std; all-zero-gap entities yield B = null (0/0).

    One hash(entity) exchange; the kernel is a vectorized sorted diff +
    segmented moment reduction — gaps never leave their bucket.
    """
    proj = ds.select_columns(
        [entity_col, ts_col] + ([tiebreak] if tiebreak else []))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[entity_col, ts_col])
        if df.empty:
            return pd.DataFrame({
                entity_col: df[entity_col],
                "gap_mean": pd.Series(dtype="float64"),
                "gap_std": pd.Series(dtype="float64"),
                "burstiness": pd.Series(dtype="float64"),
            })
        df, _new_ent, starts, _ = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        n = len(df)
        sizes = np.diff(np.append(starts, n))
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = np.diff(ts).astype(np.float64) / 1e6  # seconds
        # gap i (rows i → i+1) is within-entity iff row i+1 isn't a start
        mask = np.zeros(n, dtype=bool)
        mask[starts] = True
        valid = ~mask[1:]
        ent_of_gap = np.repeat(np.arange(len(starts)), sizes)[1:]
        d, ent_of_gap = d[valid], ent_of_gap[valid]
        k = len(starts)
        cnt = np.bincount(ent_of_gap, minlength=k).astype(np.float64)
        s = np.bincount(ent_of_gap, weights=d, minlength=k)
        ss = np.bincount(ent_of_gap, weights=d * d, minlength=k)
        with np.errstate(invalid="ignore", divide="ignore"):
            mu = s / cnt
            var = (ss - s * s / cnt) / (cnt - 1.0)
            sd = np.sqrt(np.maximum(var, 0.0))
            b = np.where(sd + mu > 0, (sd - mu) / (sd + mu), np.nan)
        mu = np.where(cnt >= 1, mu, np.nan)
        sd = np.where(cnt >= 2, sd, np.nan)
        b = np.where(cnt >= 2, b, np.nan)
        out = pd.DataFrame({
            entity_col: df[entity_col].to_numpy()[starts],
            "gap_mean": mu, "gap_std": sd, "burstiness": b,
        })
        if round_digits is not None:
            for c in ("gap_mean", "gap_std", "burstiness"):
                out[c] = out[c].round(round_digits)
        return out

    return _bucketed(proj, entity_col, num_buckets, kernel)


def autocorr(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    out_col: str = "acf1",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-entity lag-1 autocorrelation of values in (ts, tiebreak) order —
    sample Pearson over consecutive pairs (xₜ₋₁, xₜ), the standard
    periodicity/momentum signal. Pairs with a null on either side are
    excluded (SQL ``LAG`` + WHERE mirror); entities with zero valid pairs
    are dropped, with < 2 pairs or zero variance on either side → null.

    One hash(entity) exchange; the kernel is a sorted shift + segmented
    bincount of the six Pearson moments — pairs never leave their bucket.
    """
    proj = ds.select_columns(
        [entity_col, ts_col, value_col]
        + ([tiebreak] if tiebreak else []))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[entity_col, ts_col])
        if df.empty:
            return pd.DataFrame({entity_col: df[entity_col],
                                 out_col: pd.Series(dtype="float64")})
        df, _new_ent, starts, _ = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        n = len(df)
        x = df[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        mask = np.zeros(n, dtype=bool)
        mask[starts] = True
        a, b = x[:-1], x[1:]
        valid = ~mask[1:] & ~np.isnan(a) & ~np.isnan(b)
        sizes = np.diff(np.append(starts, n))
        ent_of_pair = np.repeat(np.arange(len(starts)), sizes)[1:]
        a, b, ent_of_pair = a[valid], b[valid], ent_of_pair[valid]
        k = len(starts)
        cnt = np.bincount(ent_of_pair, minlength=k).astype(np.float64)
        sa = np.bincount(ent_of_pair, weights=a, minlength=k)
        sb = np.bincount(ent_of_pair, weights=b, minlength=k)
        saa = np.bincount(ent_of_pair, weights=a * a, minlength=k)
        sbb = np.bincount(ent_of_pair, weights=b * b, minlength=k)
        sab = np.bincount(ent_of_pair, weights=a * b, minlength=k)
        va = cnt * saa - sa * sa
        vb = cnt * sbb - sb * sb
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where((cnt >= 2) & (va > 0) & (vb > 0),
                         (cnt * sab - sa * sb) / np.sqrt(va * vb), np.nan)
        if round_digits is not None:
            r = np.round(r, round_digits)
        keep = cnt >= 1  # entities with zero valid pairs are dropped
        return pd.DataFrame({
            entity_col: df[entity_col].to_numpy()[starts][keep],
            out_col: r[keep],
        })

    return _bucketed(proj, entity_col, num_buckets, kernel)


def seq_entropy(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    type_col: str,
    tiebreak: str | None = None,
    out_col: str = "seq_entropy",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-entity Markov transition entropy — how UNPREDICTABLE the next
    event type is given the current one: ``H = −Σ_{p,q} P(p,q)·ln P(q|p)``
    (nats) over consecutive type pairs in (ts, tiebreak) order. 0 =
    deterministic behavior chains, ln(k) = uniform hopping among k types.
    Null type rows are excluded BEFORE pairing (they neither form nor
    break a transition — mirrored by the oracle's pre-filter); entities
    with zero transitions are dropped.

    One hash(entity) exchange; the kernel is a sorted shift + one pandas
    (entity, prev, next) count + vectorized entropy finish — transitions
    never leave their bucket.
    """
    proj = ds.select_columns(
        [entity_col, ts_col, type_col] + ([tiebreak] if tiebreak else []))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[entity_col, ts_col, type_col])
        if df.empty:
            return pd.DataFrame({entity_col: df[entity_col],
                                 out_col: pd.Series(dtype="float64")})
        df, _new_ent, starts, _ = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        n = len(df)
        mask = np.zeros(n, dtype=bool)
        mask[starts] = True
        tv = df[type_col].to_numpy()
        ent = df[entity_col].to_numpy()
        valid = ~mask[1:]
        pairs = pd.DataFrame({
            "e": ent[1:][valid], "p": tv[:-1][valid], "q": tv[1:][valid],
        })
        if pairs.empty:
            return pd.DataFrame({entity_col: pairs["e"],
                                 out_col: pd.Series(dtype="float64")})
        c = pairs.groupby(["e", "p", "q"], sort=True,
                          observed=True).size().rename("c").reset_index()
        cp = c.groupby(["e", "p"], sort=False)["c"].transform("sum")
        nn = c.groupby("e", sort=False)["c"].transform("sum")
        term = (c["c"].to_numpy(np.float64) / nn.to_numpy(np.float64)) * \
            np.log(c["c"].to_numpy(np.float64) / cp.to_numpy(np.float64))
        c["_t"] = term
        out = (-c.groupby("e", sort=True)["_t"].sum()).rename(
            out_col).reset_index().rename(columns={"e": entity_col})
        if round_digits is not None:
            out[out_col] = out[out_col].round(round_digits)
        return out

    return _bucketed(proj, entity_col, num_buckets, kernel)


def cusum(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    out_col: str = "cusum_stat",
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-entity CUSUM changepoint screen — the normalized range of the
    cumulative mean-deviation walk: ``Sₖ = Σᵢ≤ₖ (xᵢ − x̄)``, statistic
    ``(max S − min S) / (σ·√n)`` over values in (ts, tiebreak) order
    (large ⇒ a sustained level shift somewhere in the series; ≈0.5-1.5
    under stationarity). Null values are excluded from the walk; entities
    with < 2 values or zero variance yield null.

    One hash(entity) exchange; the kernel is a sorted cumsum + segmented
    min/max via ``np.minimum/maximum.reduceat`` — the walk never leaves
    its bucket.
    """
    proj = ds.select_columns(
        [entity_col, ts_col, value_col] + ([tiebreak] if tiebreak else []))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[entity_col, ts_col, value_col])
        if df.empty:
            return pd.DataFrame({entity_col: df[entity_col],
                                 out_col: pd.Series(dtype="float64")})
        df, _new_ent, starts, _ = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        n = len(df)
        isz = np.diff(np.append(starts, n))
        sizes = isz.astype(np.float64)
        x = df[value_col].to_numpy(dtype=np.float64)
        # build the row→group index ONCE (page-fault-bound allocs)
        row_g = np.repeat(np.arange(len(starts)), isz)
        s = np.bincount(row_g, weights=x, minlength=len(starts))
        mean = s / sizes
        dev = x - mean[row_g]
        cs = np.cumsum(dev)
        walk = cs - (cs[starts] - dev[starts])[row_g]
        smax = np.maximum.reduceat(walk, starts)
        smin = np.minimum.reduceat(walk, starts)
        ss = np.bincount(row_g, weights=x * x, minlength=len(starts))
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (ss - s * s / sizes) / (sizes - 1.0)
            sd = np.sqrt(np.maximum(var, 0.0))
            stat = np.where((sizes >= 2) & (sd > 0),
                            (smax - smin) / (sd * np.sqrt(sizes)), np.nan)
        if round_digits is not None:
            stat = np.round(stat, round_digits)
        return pd.DataFrame({
            entity_col: df[entity_col].to_numpy()[starts], out_col: stat,
        })

    return _bucketed(proj, entity_col, num_buckets, kernel)


def changepoint(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-entity single changepoint — binary segmentation's first step:
    over the entity's values in (ts, tiebreak) order, the split
    ``k ∈ [1, n)`` (left = first ``k`` rows) maximizing the SSE reduction
    ``gain(k) = SSE_total − SSE_left(k) − SSE_right(k)`` with
    ``SSE = Σx² − (Σx)²/n``. One row per entity with ≥ 2 non-null values:
    ``(entity, cp_ts, cp_k, gain)`` where ``cp_ts`` is the timestamp of
    the first right-segment row and ``cp_k`` the left count. Where
    :func:`cusum` *screens* for a level shift, this *locates* it.

    Determinism: gains are ROUNDED to ``round_digits`` BEFORE the argmax
    on both sides (the weighted_sample pattern — prefix-difference sums
    vs SQL running sums can differ in late ulps; the rounding grid keeps
    the winner identical), and ties break to the SMALLEST ``k``
    (np.argmax first-max == SQL ``ORDER BY gain DESC, rn ASC``).

    One hash(entity) exchange; the kernel is one lexsort + global prefix
    cumsums with per-entity offsets — no per-entity loop, the series
    never leaves its bucket.
    """
    proj = ds.select_columns(
        [entity_col, ts_col, value_col] + ([tiebreak] if tiebreak else []))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[entity_col, ts_col, value_col])
        out_empty = pd.DataFrame({
            entity_col: pd.Series(dtype=df[entity_col].dtype),
            "cp_ts": pd.Series(dtype="datetime64[us]"),
            "cp_k": pd.Series(dtype="int64"),
            "gain": pd.Series(dtype="float64"),
        })
        if df.empty:
            return out_empty
        df, _new_ent, starts, rwg = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        n = len(df)
        isz = np.diff(np.append(starts, n))
        sizes = isz.astype(np.float64)
        row_g = np.repeat(np.arange(len(starts)), isz)
        x = df[value_col].to_numpy(dtype=np.float64)
        csx = np.cumsum(x)
        csq = np.cumsum(x * x)
        # local prefix sums INCLUDING the current row
        off_s = (csx[starts] - x[starts])[row_g]
        off_q = (csq[starts] - (x * x)[starts])[row_g]
        ls = csx - off_s
        lq = csq - off_q
        s_tot = (ls[starts + isz - 1])[row_g]
        q_tot = (lq[starts + isz - 1])[row_g]
        n_tot = sizes[row_g]
        # candidate split BEFORE row i: left = rows up to i-1 → shift by one
        k = rwg.astype(np.float64)            # left count at row i
        s_l = np.empty(n); s_l[1:] = ls[:-1]; s_l[starts] = 0.0
        q_l = np.empty(n); q_l[1:] = lq[:-1]; q_l[starts] = 0.0
        valid = (rwg >= 1) & (n_tot >= 2)
        with np.errstate(invalid="ignore", divide="ignore"):
            sse_tot = q_tot - s_tot * s_tot / n_tot
            sse_l = q_l - s_l * s_l / np.where(k > 0, k, 1.0)
            nr = n_tot - k
            sse_r = (q_tot - q_l) - (s_tot - s_l) ** 2 / np.where(
                nr > 0, nr, 1.0)
            gain = np.round(sse_tot - sse_l - sse_r, round_digits)
        gain = np.where(valid, gain, -np.inf)
        # per-entity argmax, first max (smallest k) — rows are already in
        # k-ascending order within each entity segment
        seg_max = np.maximum.reduceat(gain, starts)
        is_best = gain == seg_max[row_g]
        # first True per segment
        idx = np.arange(n)
        first_best = np.minimum.reduceat(
            np.where(is_best, idx, n), starts)
        keep = (sizes >= 2) & np.isfinite(seg_max)
        best = first_best[keep].astype(np.int64)
        ents = df[entity_col].to_numpy()[starts][keep]
        ts_v = df[ts_col].to_numpy().astype("datetime64[us]")[best]
        return pd.DataFrame({
            entity_col: ents,
            "cp_ts": ts_v,
            "cp_k": rwg[best].astype(np.int64),
            "gain": gain[best],
        })

    return _bucketed(proj, entity_col, num_buckets, kernel)


def rolling_slope(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    window,
    tiebreak: str | None = None,
    out_col: str = "rslope",
    round_digits: int | None = 6,
    min_span=None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Trailing-window OLS slope per row — the momentum/trend feature:
    for every row, the regression slope of ``y_col`` on ``x_col`` over
    the entity's rows in ``[t − w, t]`` (closed both ends, equal-ts
    peers pooled — the engine's RANGE-frame convention). NULL when the
    window holds < 2 points, has zero x-variance, or spans less than
    ``min_span`` of time. ``x_col`` is the caller's abscissa (epoch-days
    in the contract query) so the slope's units are explicit.

    ``min_span`` matters for cross-engine determinism: a 2-point window
    microseconds apart puts ``n·Σx² − (Σx)²`` within float cancellation
    noise of zero, where this kernel's prefix-difference sums and SQL's
    per-window sums can disagree on the sign. The span guard is INTEGER
    microsecond arithmetic — bit-identical on both sides — and with a
    span ≥ minutes the denominator sits orders of magnitude above the
    noise. The contract query uses 1 hour.

    One entity exchange; the kernel is one lexsort + entity-offset
    composite searchsorted for the window bounds + prefix-cumsum
    differences for all five sums — the same closed form as
    group_linear_fit, evaluated per row with no row loop.
    """
    w_us = _window_us(window)
    min_span_us = _window_us(min_span) if min_span is not None else 0

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        order_cols = [entity_col, ts_col] + ([tiebreak] if tiebreak else [])
        # rows with a null entity/ts/x/y are out of contract entirely
        # (dropped from the OUTPUT too) — mirrored by the oracle's WHERE,
        # which keeps the window population and the row set identical
        d = df.dropna(subset=[entity_col, ts_col, x_col, y_col]).sort_values(
            order_cols, kind="stable").reset_index(drop=True)
        if d.empty:
            out = d.copy()
            out[out_col] = pd.Series([], dtype=np.float64)
            return out
        ent = d[entity_col].to_numpy()
        ts = d[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        x = d[x_col].to_numpy(dtype=np.float64)
        y = d[y_col].to_numpy(dtype=np.float64)
        _, codes = np.unique(ent, return_inverse=True)
        t0 = int(ts.min())
        span = int(ts.max()) - t0 + 2
        if (int(codes.max()) + 1) * span > np.iinfo(np.int64).max:
            raise ValueError("rolling_slope: entity-offset key overflow")
        key = codes * span + (ts - t0)
        pre = lambda a: np.concatenate(([0.0], np.cumsum(a)))  # noqa: E731
        cn = pre(np.ones(len(d)))
        cx, cy = pre(x), pre(y)
        cxx, cxy = pre(x * x), pre(x * y)
        # clamp the lower offset at 0: for rows within w of the bucket's
        # first timestamp, ts - w - t0 is NEGATIVE and the probe would
        # bleed into the PREVIOUS entity's key segment
        lo = np.searchsorted(
            key, codes * span + np.maximum(ts - w_us - t0, 0), side="left")
        hi = np.searchsorted(key, key, side="right")
        n = cn[hi] - cn[lo]
        sx = cx[hi] - cx[lo]
        sy = cy[hi] - cy[lo]
        sxx = cxx[hi] - cxx[lo]
        sxy = cxy[hi] - cxy[lo]
        denom = n * sxx - sx * sx
        # integer-exact window time span (rows sorted: hi-1 = max, lo = min)
        win_span = ts[np.maximum(hi - 1, 0)] - ts[np.minimum(lo, len(ts) - 1)]
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = np.where(
                (n >= 2) & (denom > 0) & (win_span >= min_span_us),
                (n * sxy - sx * sy) / denom, np.nan)
        if round_digits is not None:
            slope = np.round(slope, round_digits)
        out = d.copy()
        out[out_col] = slope
        return out

    return _bucketed(ds, entity_col, num_buckets, kernel)


def stl_decompose(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    window,
    period_hours: int = 24,
    tiebreak: str | None = None,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Additive seasonal-trend decomposition per entity (STL-lite):
    ``trend`` = centered RANGE-frame mean over ``[t − w, t + w]`` (closed
    both ends, equal-ts peers included — SQL ``RANGE BETWEEN w PRECEDING
    AND w FOLLOWING``), ``seasonal`` = per-(entity, phase) mean of the
    detrended series with phase = hour-of-day (``hour(ts)``; the
    ``period_hours`` phases of a daily cycle), ``resid`` = value − trend −
    seasonal. The classic moving-average decomposition, not Cleveland's
    loess STL — deterministic and oracle-expressible.

    Rows with a null entity, ts or value are dropped on both sides (oracle
    WHERE mirror). Outputs append unrounded-intermediate, rounded-at-edge
    columns so the residual identity holds exactly pre-rounding.

    Scale shape: ONE entity-hash exchange; inside a bucket the centered
    window resolves with the same group-offset composite searchsorted as
    :func:`rolling_aggregate` (the span margin covers a FORWARD probe of
    ``+w`` exactly like the backward one), trend via prefix sums, seasonal
    via one bincount over (group, phase) codes. No per-entity Python loop
    on the fast path.
    """
    w_us = _window_us(window)
    ph = int(period_hours)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[entity_col, ts_col, value_col])
        df, new_ent, starts, _ = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        n = len(df)
        if n == 0:
            out = df.copy()
            for c in ("trend", "seasonal", "resid"):
                out[c] = pd.Series(dtype="float64")
            return out
        ts = _ts_us(df[ts_col])
        vals = df[value_col].to_numpy(dtype=np.float64)
        key = _group_offset_ts(ts, new_ent, w_us)
        if key is None:  # overflow fallback: per-entity searchsorted loop
            lo = np.empty(n, np.int64)
            hi = np.empty(n, np.int64)
            bounds = np.append(starts, n)
            for g0, g1 in zip(bounds[:-1], bounds[1:]):
                tg = ts[g0:g1]
                lo[g0:g1] = g0 + np.searchsorted(tg, tg - w_us, side="left")
                hi[g0:g1] = g0 + np.searchsorted(tg, tg + w_us, side="right")
        else:
            lo = np.searchsorted(key, key - w_us, side="left")
            hi = np.searchsorted(key, key + w_us, side="right")
        csum = np.concatenate(([0.0], np.cumsum(vals)))
        trend = (csum[hi] - csum[lo]) / (hi - lo)
        detr = vals - trend
        gid = np.cumsum(new_ent) - 1
        hour = ((ts // 3_600_000_000) % ph).astype(np.int64)
        code = gid * ph + hour
        ssum = np.bincount(code, weights=detr)
        scnt = np.bincount(code)
        seasonal = (ssum / np.where(scnt == 0, 1, scnt))[code]
        if round_digits is not None:
            # resid from the ROUNDED components: cross-engine 1e-13 noise
            # in trend/seasonal otherwise lands resid on a rounding-grid
            # half point (the rolling_slope class of flip)
            trend = np.round(trend, round_digits)
            seasonal = np.round(seasonal, round_digits)
            resid = np.round(vals - trend - seasonal, round_digits)
        else:
            resid = vals - trend - seasonal
        out = df.copy()
        out["trend"] = trend
        out["seasonal"] = seasonal
        out["resid"] = resid
        return out

    return _bucketed(ds, entity_col, num_buckets, kernel)


def max_drawdown(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-entity maximum drawdown: the largest peak-to-trough decline of
    ``value`` in (ts, tiebreak) order — ``max_t(cummax(v)_t − v_t)`` —
    plus the running peak itself. The risk-metric member of the
    running-extreme family (cusum tracks mean deviation; this tracks
    worst decline). Every op is a comparison or a subtraction of
    identical doubles, so the result is float-EXACT cross-engine; the
    rounding is cosmetic. Rows with a null entity, ts or value are
    excluded on both sides.

    Output: (entity, n, max_value, max_drawdown).

    Scale shape: ONE entity-hash exchange; per bucket a single pandas
    C-level ``groupby.cummax`` + segmented max — no Python loop.
    """
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        # _bucketed already stripped BUCKET_COL (CLAUDE.md: don't drop twice)
        df = df.dropna(subset=[entity_col, ts_col, value_col])
        if df.empty:
            return pd.DataFrame({
                entity_col: df[entity_col],
                "n": pd.Series(dtype="int64"),
                "max_value": pd.Series(dtype="float64"),
                "max_drawdown": pd.Series(dtype="float64"),
            })
        by = [entity_col, ts_col] + ([tiebreak] if tiebreak else [])
        df = df.sort_values(by, kind="stable")
        v = df[value_col].astype("float64")
        peak = df.groupby(entity_col, sort=False)[value_col].cummax()
        dd = peak.astype("float64") - v
        out = (
            pd.DataFrame({entity_col: df[entity_col], "_v": v, "_dd": dd})
            .groupby(entity_col, sort=True)
            .agg(n=("_v", "size"), max_value=("_v", "max"),
                 max_drawdown=("_dd", "max"))
            .reset_index()
        )
        out["n"] = out["n"].astype("int64")
        if round_digits is not None:
            out["max_value"] = np.round(
                out["max_value"].to_numpy(), round_digits)
            out["max_drawdown"] = np.round(
                out["max_drawdown"].to_numpy(), round_digits)
        return out

    return _bucketed(ds, entity_col, num_buckets, kernel)


def holt_forecast(
    ds: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    alpha: float = 0.3,
    beta: float = 0.2,
    horizon: int = 7,
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Holt's linear-trend exponential smoothing over each entity's daily
    activity counts — the forecasting member of the time-series family
    (ewma smooths, stl_decompose explains, this EXTRAPOLATES): over the
    entity's observed days in time order, ``l_t = α·y_t + (1−α)·(l_{t−1}
    + b_{t−1})``, ``b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}`` with
    ``l_1 = y_1, b_1 = y_2 − y_1``; the h-step forecast is ``l_D +
    h·b_D``. Entities with fewer than two observed days drop (oracle
    HAVING mirror). Output per entity: (entity, n_days, level, trend,
    forecast).

    Cross-engine contract: the series is the daily COUNT (exact int both
    engines), and the oracle's recursive CTE spells the identical
    expression shapes with ``1−α`` / ``1−β`` injected as repr() literals
    (the pagerank convention) — the recursion is IEEE-identical, only
    outputs round.

    Scale shape: per-batch (entity, day, count) partials — calendar-grade
    — then ONE entity exchange; the per-bucket kernel re-merges and runs
    the recursion VECTORIZED across entities per time step (≤ max-days
    iterations of in-bucket numpy, never a per-row Python loop).
    """
    import pyarrow as pa

    a, ia = float(alpha), 1.0 - float(alpha)
    bt, ibt = float(beta), 1.0 - float(beta)
    h = float(horizon)
    proj = ds.select_columns([entity_col, ts_col])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[entity_col, ts_col])
        day = d[ts_col].to_numpy("datetime64[D]").view(np.int64)
        out = pd.DataFrame({entity_col: d[entity_col].to_numpy(np.int64),
                            "_d": day, "_y": np.int64(1)})
        return (out.groupby([entity_col, "_d"], sort=False)["_y"].sum()
                .reset_index())

    parts = proj.map_batches(
        partial, batch_size=None, batch_format="pandas")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            entity_col: pd.Series(dtype="int64"),
            "n_days": pd.Series(dtype="int64"),
            "level": pd.Series(dtype="float64"),
            "trend": pd.Series(dtype="float64"),
            "forecast": pd.Series(dtype="float64"),
        })
        if df.empty:
            return empty
        d = (df.groupby([entity_col, "_d"], sort=True)["_y"].sum()
             .reset_index())
        ent = d[entity_col].to_numpy(np.int64)
        y = d["_y"].to_numpy(np.float64)
        u, starts = np.unique(ent, return_index=True)
        nd = np.diff(np.append(starts, len(d)))
        keep = nd >= 2
        if not keep.any():
            return empty
        u2, st2, nd2 = u[keep], starts[keep], nd[keep]
        lvl = y[st2].copy()
        b = y[st2 + 1] - y[st2]
        for t in range(2, int(nd2.max()) + 1):
            act = nd2 >= t
            yt = y[st2[act] + t - 1]
            lp = a * yt + ia * (lvl[act] + b[act])
            b[act] = bt * (lp - lvl[act]) + ibt * b[act]
            lvl[act] = lp
        fc = lvl + h * b
        if round_digits is not None:
            lvl = np.round(lvl, round_digits)
            b = np.round(b, round_digits)
            fc = np.round(fc, round_digits)
        return pd.DataFrame({
            entity_col: u2, "n_days": nd2.astype(np.int64),
            "level": lvl, "trend": b, "forecast": fc,
        })

    return _bucketed(parts, entity_col, num_buckets, kernel)


def hurst(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    window_sizes: Sequence[int] = (4, 8, 16, 32),
    round_digits: int | None = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-entity Hurst exponent via classic rescaled-range (R/S)
    analysis — the long-memory / self-similarity detector next to
    :func:`autocorr`'s lag-1 signal: H ≈ 0.5 for a memoryless series,
    > 0.5 persistent (trends feed themselves), < 0.5 anti-persistent
    (mean-reverting). For each dyadic window size w the series (in
    (ts, tiebreak) order) splits into ⌊n/w⌋ full windows; per window
    ``R`` is the range of the cumulative deviation-from-window-mean walk
    and ``S`` the population std; H is the OLS slope of log2(mean R/S)
    on log2(w) over the scales with a positive mean (windows with S = 0
    are excluded, exactly as the oracle's ``WHERE s > 0``). Entities
    with < 2 usable scales are dropped. ``window_sizes`` must be powers
    of two so log2(w) is exact in BOTH engines.

    Scale shape: ONE hash(entity) exchange; the kernel is reshape-based
    — kept rows per (entity, scale) form exact w-blocks after the
    ⌊n/w⌋·w truncation, so window means / cumulative walks / ranges are
    single vectorized axis-1 ops; windows never leave their bucket.
    Output: (entity, hurst, n_scales).
    """
    proj = ds.select_columns(
        [entity_col, ts_col, value_col]
        + ([tiebreak] if tiebreak else []))
    scales = [int(w) for w in window_sizes]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            entity_col: pd.Series(dtype=df[entity_col].dtype if len(df)
                                  else "int64"),
            "hurst": pd.Series(dtype="float64"),
            "n_scales": pd.Series(dtype="int64"),
        })
        df = df.dropna(subset=[entity_col, ts_col, value_col])
        if df.empty:
            return empty
        df, _new_ent, starts, rwg = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        n = len(df)
        x = df[value_col].to_numpy(np.float64)
        sizes = np.diff(np.append(starts, n))
        ent_idx = np.repeat(np.arange(len(starts)), sizes)
        size_of_row = np.repeat(sizes, sizes)
        k_ent = len(starts)
        # per-entity OLS accumulators over scales
        cnt = np.zeros(k_ent, np.float64)
        sx = np.zeros(k_ent, np.float64)
        sy = np.zeros(k_ent, np.float64)
        sxx = np.zeros(k_ent, np.float64)
        sxy = np.zeros(k_ent, np.float64)
        for w in scales:
            kept = rwg < (size_of_row // w) * w
            if not kept.any():
                continue
            xk = x[kept]
            X = xk.reshape(-1, w)
            went = ent_idx[kept][::w]
            mu = X.mean(axis=1)
            dev = X - mu[:, None]
            z = np.cumsum(dev, axis=1)
            r = z.max(axis=1) - z.min(axis=1)
            s = np.sqrt((dev * dev).sum(axis=1) / w)
            ok = s > 0
            if not ok.any():
                continue
            nw = np.bincount(went[ok], minlength=k_ent).astype(np.float64)
            srs = np.bincount(went[ok], weights=r[ok] / s[ok],
                              minlength=k_ent)
            with np.errstate(invalid="ignore", divide="ignore"):
                mrs = srs / nw
            valid = (nw > 0) & (mrs > 0)
            lx = np.log2(float(w))
            with np.errstate(invalid="ignore", divide="ignore"):
                ly = np.where(valid, np.log2(np.where(valid, mrs, 1.0)),
                              0.0)
            v = valid.astype(np.float64)
            cnt += v
            sx += v * lx
            sy += ly
            sxx += v * lx * lx
            sxy += lx * ly
        vx = cnt * sxx - sx * sx
        with np.errstate(invalid="ignore", divide="ignore"):
            h = (cnt * sxy - sx * sy) / vx
        keep = (cnt >= 2) & (vx > 0)
        if round_digits is not None:
            h = np.round(h, round_digits)
        return pd.DataFrame({
            entity_col: df[entity_col].to_numpy()[starts][keep],
            "hurst": h[keep],
            "n_scales": cnt[keep].astype(np.int64),
        })

    return _bucketed(proj, entity_col, num_buckets, kernel)


_SAX_CUTS = (-0.6745, 0.0, 0.6745)
_SAX_ALPHABET = "abcd"


def sax_symbols(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    seg_len: int = 8,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """SAX symbolization (Lin et al.) — compress each entity's series
    into a short SYMBOLIC word so downstream motif mining / hashing /
    grouping works on strings instead of floats: z-normalize the series
    with its own population mean/std, Piecewise-Aggregate-Approximate
    into consecutive ``seg_len``-row segments (remainder rows drop), and
    map each rounded segment z-mean onto a 4-letter alphabet at the
    N(0,1) quartile breakpoints ±0.6745 / 0. Entities with zero variance
    or fewer than ``seg_len`` rows drop (oracle ``WHERE sig > 0`` /
    empty-segment mirror). The breakpoint compare runs on the ROUNDED
    z-mean on both engines (house rounded-before-compare pattern).

    Scale shape: ONE hash(entity) exchange; PAA is the same exact-block
    reshape as :func:`hurst` (kept rows form whole segments), the
    z-stats are segmented bincount sums, and the word join is per-entity
    (entities × segments, never rows). Output: (entity, n_segs, word).
    """
    proj = ds.select_columns(
        [entity_col, ts_col, value_col]
        + ([tiebreak] if tiebreak else []))
    cuts = np.asarray(_SAX_CUTS, np.float64)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            entity_col: pd.Series(dtype=df[entity_col].dtype if len(df)
                                  else "int64"),
            "n_segs": pd.Series(dtype="int64"),
            "word": pd.Series(dtype="object"),
        })
        df = df.dropna(subset=[entity_col, ts_col, value_col])
        if df.empty:
            return empty
        df, _new_ent, starts, rwg = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        n = len(df)
        x = df[value_col].to_numpy(np.float64)
        sizes = np.diff(np.append(starts, n))
        ent_idx = np.repeat(np.arange(len(starts)), sizes)
        k_ent = len(starts)
        nn = sizes.astype(np.float64)
        sxs = np.bincount(ent_idx, weights=x, minlength=k_ent)
        sxxs = np.bincount(ent_idx, weights=x * x, minlength=k_ent)
        mu = sxs / nn
        with np.errstate(invalid="ignore"):
            sig = np.sqrt(sxxs / nn - mu * mu)
        size_of_row = np.repeat(sizes, sizes)
        kept = rwg < (size_of_row // seg_len) * seg_len
        if not kept.any():
            return empty
        X = x[kept].reshape(-1, seg_len)
        went = ent_idx[kept][::seg_len]
        ok = sig[went] > 0
        if not ok.any():
            return empty
        ax = X.mean(axis=1)[ok]
        went = went[ok]
        pz = np.round((ax - mu[went]) / sig[went], round_digits)
        # side="right": pz exactly equal to a cut belongs to the RIGHT bin,
        # matching the SQL strict `<` CASE chain
        sym = np.searchsorted(cuts, pz, side="right")
        letters = np.array(list(_SAX_ALPHABET))[sym]
        wdf = pd.DataFrame({"_e": went, "_s": letters})
        words = wdf.groupby("_e", sort=True)["_s"].agg("".join)
        segs = wdf.groupby("_e", sort=True)["_s"].size()
        eids = df[entity_col].to_numpy()[starts][words.index.to_numpy()]
        return pd.DataFrame({
            entity_col: eids,
            "n_segs": segs.to_numpy(np.int64),
            "word": words.to_numpy(),
        })

    return _bucketed(proj, entity_col, num_buckets, kernel)


def markov_stationary(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    type_col: str,
    tiebreak: str | None = None,
    iters: int = 8,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Stationary distribution of the behavioral Markov chain — where
    :func:`seq_entropy` scores how UNPREDICTABLE transitions are and
    ``transitions`` counts them, this answers "where does a user's
    session settle long-run": power iteration ``v ← vP`` from uniform
    over the row-stochastic transition matrix estimated from consecutive
    same-entity type pairs (in (ts, tiebreak) order, null types filtered
    BEFORE pairing — the seq_entropy contract). States are the types
    with at least one outgoing transition; pairs leading outside that
    set are dropped and rows renormalized identically in both engines
    (the oracle's ``WHERE q IN states`` mirror). ``iters`` fixed rounds,
    no convergence test — both engines run the identical schedule.
    Output: (state, prob).

    Scale shape: ONE hash(entity) exchange whose kernel emits (p, q,
    count) partials — transitions never leave their bucket and the
    exchange carries at most |types|² rows per bucket; the driver folds
    a K×K matrix (K = type vocabulary, bounded) and iterates in-memory.
    """
    import pyarrow as pa

    proj = ds.select_columns(
        [entity_col, ts_col, type_col] + ([tiebreak] if tiebreak else []))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "_p": pd.Series(dtype="object"),
            "_q": pd.Series(dtype="object"),
            "_c": pd.Series(dtype="int64"),
        })
        df = df.dropna(subset=[entity_col, ts_col, type_col])
        if df.empty:
            return empty
        df, _new_ent, starts, _ = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        n = len(df)
        mask = np.zeros(n, dtype=bool)
        mask[starts] = True
        tv = df[type_col].to_numpy()
        valid = ~mask[1:]
        pairs = pd.DataFrame({"_p": tv[:-1][valid], "_q": tv[1:][valid]})
        if pairs.empty:
            return empty
        out = pairs.groupby(["_p", "_q"], sort=False).size()
        return out.rename("_c").reset_index()

    cnt = (
        _bucketed(proj, entity_col, num_buckets, kernel)
        .to_pandas()
        .groupby(["_p", "_q"], sort=True)["_c"].sum().reset_index()
    )
    if cnt.empty:
        return ray.data.from_arrow(pa.table({
            "state": pa.array([], pa.string()),
            "prob": pa.array([], pa.float64()),
        }))
    states = np.sort(cnt["_p"].unique())
    cnt = cnt[cnt["_q"].isin(states)]
    sidx = {s: i for i, s in enumerate(states)}
    kst = len(states)
    P = np.zeros((kst, kst), np.float64)
    pi = cnt["_p"].map(sidx).to_numpy(np.int64)
    qi = cnt["_q"].map(sidx).to_numpy(np.int64)
    cc = cnt["_c"].to_numpy(np.int64)
    rowsum = np.bincount(pi, weights=cc, minlength=kst)
    P[pi, qi] = cc / rowsum[pi]
    v = np.full(kst, 1.0 / kst)
    for _ in range(iters):
        v = v @ P
    return ray.data.from_arrow(pa.table({
        "state": pa.array(states.astype(str)),
        "prob": pa.array(np.round(v, round_digits), pa.float64()),
    }))


def markov_attribution(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    type_col: str,
    conv_type: str,
    tiebreak: str | None = None,
    iters: int = 12,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Markov removal-effect attribution (Anderl et al. 2014) — the
    counterfactual member of the attribution family
    (``linear_attribution`` splits credit equally,
    ``shapley_attribution`` by coalition share; this asks "how much
    conversion probability DISAPPEARS if channel c is removed from the
    journey graph"). Journeys are per-entity event runs in (ts,
    tiebreak) order: every event contributes one transition
    (prev-channel -> its state), a conversion event (``conv_type``)
    absorbs to CONV and the next event restarts from START, and a
    trailing non-conversion event absorbs to NULL. From the
    row-normalized transition matrix, base conversion probability is
    ``iters`` fixed power steps from START (CONV / NULL self-absorb);
    removing channel c redirects every edge INTO c to NULL, and

        removal_effect(c) = 1 - p_conv(without c) / p_conv(base)
        share(c) = removal_effect(c) / sum_c removal_effect

    Output: (channel, removal_effect, share, p_conv_base). NULL share
    when p_base or the effect sum is 0. Sentinel state names
    ``__start__ / __conv__ / __null__`` must not collide with channel
    values (contract).

    Scale shape: ONE hash(entity) exchange of (src, dst, count)
    partials — journeys never leave their bucket, the exchange carries
    at most (K+1)(K+2) rows per bucket; the driver folds a (K+3)^2
    matrix and runs K+1 fixed power iterations in-memory (K = channel
    vocabulary, bounded — the markov_stationary contract).
    """
    import pyarrow as pa

    START, CONV, NULLS = "__start__", "__conv__", "__null__"
    proj = ds.select_columns(
        [entity_col, ts_col, type_col] + ([tiebreak] if tiebreak else []))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "_p": pd.Series(dtype="object"),
            "_q": pd.Series(dtype="object"),
            "_c": pd.Series(dtype="int64"),
        })
        df = df.dropna(subset=[entity_col, ts_col, type_col])
        if df.empty:
            return empty
        df, new_ent, _starts, _ = _sort_entity_ts(
            df, entity_col, ts_col, tiebreak)
        tv = df[type_col].to_numpy().astype(object)
        isconv = tv == conv_type
        prev_conv = np.empty(len(tv), dtype=bool)
        prev_conv[0] = False
        prev_conv[1:] = isconv[:-1]
        prev_type = np.empty(len(tv), dtype=object)
        prev_type[0] = START
        prev_type[1:] = tv[:-1]
        src = np.where(new_ent | prev_conv, START, prev_type)
        dst = np.where(isconv, CONV, tv)
        last = np.empty(len(tv), dtype=bool)
        last[:-1] = new_ent[1:]
        last[-1] = True
        tail = last & ~isconv
        pairs = pd.DataFrame({
            "_p": np.concatenate([src, tv[tail]]),
            "_q": np.concatenate([dst, np.full(int(tail.sum()),
                                               NULLS, object)]),
        })
        out = pairs.groupby(["_p", "_q"], sort=False).size()
        return out.rename("_c").reset_index()

    cnt = (
        _bucketed(proj, entity_col, num_buckets, kernel)
        .to_pandas()
        .groupby(["_p", "_q"], sort=True)["_c"].sum().reset_index()
    )
    empty_out = ray.data.from_arrow(pa.table({
        "channel": pa.array([], pa.string()),
        "removal_effect": pa.array([], pa.float64()),
        "share": pa.array([], pa.float64()),
        "p_conv_base": pa.array([], pa.float64()),
    }))
    if cnt.empty:
        return empty_out
    channels = np.sort(np.unique(np.concatenate([
        cnt.loc[cnt["_p"] != START, "_p"].to_numpy(),
        cnt.loc[~cnt["_q"].isin([CONV, NULLS]), "_q"].to_numpy(),
    ])).astype(object))
    states = [START] + list(channels) + [CONV, NULLS]
    sidx = {s: i for i, s in enumerate(states)}
    m = len(states)
    ci, vi = m - 2, m - 1
    P = np.zeros((m, m), np.float64)
    pi = cnt["_p"].map(sidx).to_numpy(np.int64)
    qi = cnt["_q"].map(sidx).to_numpy(np.int64)
    cc = cnt["_c"].to_numpy(np.int64)
    rowsum = np.bincount(pi, weights=cc, minlength=m)
    P[pi, qi] = cc / rowsum[pi]
    P[ci, ci] = 1.0
    P[vi, vi] = 1.0

    def p_conv(mat: np.ndarray) -> float:
        v = np.zeros(m)
        v[0] = 1.0
        for _ in range(iters):
            v = v @ mat
        return float(v[ci])

    p_base = p_conv(P)
    effects = []
    for c in channels:
        k = sidx[c]
        Pc = P.copy()
        Pc[:, vi] = Pc[:, vi] + Pc[:, k]
        Pc[:, k] = 0.0
        pc = p_conv(Pc)
        effects.append(None if p_base == 0 else 1.0 - pc / p_base)
    tot = (None if any(e is None for e in effects)
           else float(np.sum(np.array(effects))))
    shares = [None if e is None or not tot else e / tot for e in effects]
    return ray.data.from_arrow(pa.table({
        "channel": pa.array([str(c) for c in channels]),
        "removal_effect": pa.array(
            [None if e is None else round(e, round_digits)
             for e in effects], pa.float64()),
        "share": pa.array(
            [None if s is None else round(s, round_digits)
             for s in shares], pa.float64()),
        "p_conv_base": pa.array(
            [round(p_base, round_digits)] * len(channels), pa.float64()),
    }))
