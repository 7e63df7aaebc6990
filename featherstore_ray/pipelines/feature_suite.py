"""The flagship materialization: point-in-time join + window-feature suite.

This is the headline pipeline of BASELINE.json — "feature rows
materialized/sec for the point-in-time (as-of) join + window suite". Over an
event table (entity, ts, value, ...) it materializes, for every event row:

- lag/lead of the value within the entity's timeline
- trailing rolling sum/mean/count over a time window
- gap-based session id
- as-of joined "last purchase-relevant signal": for spine rows (one event
  type) the latest prior value of another event type, zero leakage

All window features share ONE entity-bucket shuffle (the kernels run
back-to-back on the same sorted bucket); the as-of join adds its own tagged
union + bucket shuffle. Output streams to the consumer — nothing
materializes driver-side.
"""

from __future__ import annotations

from datetime import timedelta

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from featherstore_ray.stages.asof import asof_join
from featherstore_ray.stages.window import lag_lead, rolling_aggregate, sessionize


def split_events(
    events: ray.data.Dataset, spine_type: str, feature_type: str, type_col: str
):
    spine = events.map_batches(
        lambda t, v=spine_type: t.filter(pc.equal(t[type_col], v)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    feats = events.map_batches(
        lambda t, v=feature_type: t.filter(pc.equal(t[type_col], v)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return spine, feats


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

    The three builders each add a bucket column and groupby — but Ray Data
    fuses the narrow maps and runs one sort per groupby; to keep it to ONE
    shuffle we chain the kernels inside a single bucketed map_groups here
    rather than calling the three standalone stages.
    """
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column
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
        df = df.drop(columns=[BUCKET_COL])
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

    ds = add_bucket_column(events, entity_col, num_buckets)
    return ds.groupby(BUCKET_COL).map_groups(kernel, batch_format="pandas")


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
) -> ray.data.Dataset:
    """Full suite: window features on all events, then as-of attach the
    latest prior ``feature_type`` value onto ``spine_type`` rows."""
    wf = window_features(
        events,
        entity_col=entity_col,
        ts_col=ts_col,
        value_col=value_col,
        tiebreak=tiebreak,
        num_buckets=num_buckets,
    )
    spine = wf.map_batches(
        lambda t, v=spine_type: t.filter(pc.equal(t[type_col], v)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    feats = events.map_batches(
        lambda t, v=feature_type: t.filter(pc.equal(t[type_col], v)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns([entity_col, ts_col, value_col, tiebreak])
    return asof_join(
        spine,
        feats,
        entity_col=entity_col,
        spine_ts=ts_col,
        feature_ts=ts_col,
        feature_cols=[ts_col, value_col],
        tiebreak=tiebreak,
        num_buckets=num_buckets,
    )
