"""The flagship materialization: point-in-time join + window-feature suite.

This is the headline pipeline of BASELINE.json — "feature rows
materialized/sec for the point-in-time (as-of) join + window suite". Over an
event table (entity, ts, value, ...) it materializes, for every event row:

- lag/lead of the value within the entity's timeline
- trailing rolling sum/mean/count over a time window
- gap-based session id
- as-of joined "last purchase-relevant signal": for spine rows (one event
  type) the latest prior value of another event type, zero leakage

Window features AND the as-of join share ONE entity-bucket shuffle — both
sides of the join come from the same event table, so the bucket kernel does
windows + merge_asof back-to-back on the same sorted slice. Output streams
to the consumer — nothing materializes driver-side.
"""

from __future__ import annotations

from datetime import timedelta

import pyarrow.compute as pc

import ray.data


def split_events(
    events: ray.data.Dataset, spine_type: str, feature_type: str, type_col: str
):
    spine = events.map_batches(lambda t, v=spine_type: t.filter(pc.equal(t[type_col], v)), batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    feats = events.map_batches(lambda t, v=feature_type: t.filter(pc.equal(t[type_col], v)), batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return spine, feats


def _window_kernel(
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
    *,
    rolling_window,
    session_gap,
):
    """Bucket-local window-feature kernel shared by window_features and
    feature_suite: lag1/lead1 + rolling(sum/mean/count) + session_id in one
    vectorized pass over the sorted bucket."""
    from featherstore_ray.stages.window import (
        _group_offset_ts,
        _sort_entity_ts,
        _ts_us,
        _window_us,
    )
    import numpy as np
    import pandas as pd

    w_us = _window_us(rolling_window)
    gap_us = _window_us(session_gap)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df, new_ent, starts, rwg = _sort_entity_ts(df, entity_col, ts_col, tiebreak)
        n = len(df)
        sizes = np.diff(np.append(starts, n))
        rwg_end = np.repeat(sizes, sizes) - 1 - rwg
        # lag/lead
        s = df[value_col].shift(1)
        s[rwg < 1] = None
        df[f"{value_col}_lag1"] = s
        s = df[value_col].shift(-1)
        s[rwg_end < 1] = None
        df[f"{value_col}_lead1"] = s
        # rolling via one searchsorted over offset timestamps
        ts = _ts_us(df[ts_col])
        vals = df[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        key = _group_offset_ts(ts, new_ent, w_us)
        if key is None:  # int64-overflow fallback: per-entity searchsorted
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
        rsum = np.where(rcnt == 0, np.nan, csum[hi] - csum[lo])
        df[f"{value_col}_rsum"] = np.round(rsum, 6)
        df[f"{value_col}_rmean"] = np.round(rsum / np.where(rcnt == 0, 1, rcnt), 6)
        df[f"{value_col}_rcount"] = rcnt
        # sessionization
        brk = np.zeros(n, dtype=np.int64)
        if n > 1:
            brk[1:] = (~new_ent[1:]) & ((ts[1:] - ts[:-1]) > gap_us)
        c = np.cumsum(brk)
        df["session_id"] = c - np.repeat(c[starts] if n else c, sizes)
        return df

    return kernel


def window_features(
    events: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    rolling_window=timedelta(hours=24),
    session_gap=timedelta(minutes=30),
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """lag1 + lead1 + rolling(sum/mean/count) + session_id in ONE shuffle.

    The three standalone builders would each shuffle; chaining their kernels
    inside a single bucketed map_groups keeps it to one exchange.
    """
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column
    from featherstore_ray.exchange import bucketed_map_groups
    import pandas as pd

    wk = _window_kernel(
        entity_col, ts_col, value_col, tiebreak,
        rolling_window=rolling_window, session_gap=session_gap,
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return wk(df.drop(columns=[BUCKET_COL]))

    ds = add_bucket_column(events, entity_col, num_buckets)
    return bucketed_map_groups(ds, kernel, num_buckets=num_buckets, batch_format="pandas")


def feature_suite(
    events: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    spine_type: str = "purchase",
    feature_type: str = "click",
    num_buckets: int = 64,
    rolling_window=timedelta(hours=24),
    session_gap=timedelta(minutes=30),
) -> ray.data.Dataset:
    """Full suite in ONE entity-bucket shuffle.

    Spine and feature rows come from the same event table, so the window
    kernel and the as-of lookup share a single ``hash(entity) % B`` exchange:
    per bucket we (a) compute window features over all rows, (b) as-of join
    the ``spine_type`` subframe against the ``feature_type`` subframe with
    ``pd.merge_asof`` (backward, tie-break = max ``tiebreak``). Halves the
    all-to-all cost vs composing the standalone stages — the dominant saving
    at cluster scale, where each exchange moves the full table.
    """
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column
    from featherstore_ray.exchange import bucketed_map_groups

    import pandas as pd

    wf_kernel = _window_kernel(
        entity_col, ts_col, value_col, tiebreak,
        rolling_window=rolling_window, session_gap=session_gap,
    )
    out_val, out_ts = f"{value_col}_asof", f"{ts_col}_asof"

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = wf_kernel(df.drop(columns=[BUCKET_COL]))
        is_spine = (df[type_col] == spine_type).to_numpy()
        is_feat = (df[type_col] == feature_type).to_numpy()
        sp = df.loc[is_spine]
        ft = df.loc[is_feat, [entity_col, ts_col, value_col, tiebreak]].rename(
            columns={value_col: out_val, ts_col: "_ft_ts"}
        )
        ft[out_ts] = ft["_ft_ts"]
        # merge_asof needs a global sort on the `on` key; stable sort with the
        # tiebreak secondary makes "last match wins" = max tiebreak on ts ties
        ft = ft.sort_values(["_ft_ts", tiebreak], kind="stable").drop(
            columns=[tiebreak]
        )
        sp = sp.sort_values(ts_col, kind="stable")
        if len(sp) == 0:
            out = sp.copy()
            out[out_val] = pd.Series(dtype="float64")
            out[out_ts] = pd.Series(dtype=ft[out_ts].dtype)
            return out
        return pd.merge_asof(
            sp,
            ft,
            left_on=ts_col,
            right_on="_ft_ts",
            by=entity_col,
            direction="backward",
            allow_exact_matches=True,
        ).drop(columns=["_ft_ts"])

    ds = add_bucket_column(events, entity_col, num_buckets)
    return bucketed_map_groups(ds, kernel, num_buckets=num_buckets, batch_format="pandas")
