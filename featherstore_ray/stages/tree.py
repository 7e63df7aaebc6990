"""Supervised split search — decision-stump training over a Dataset.

The depth-1 member of the tree family: for each numeric feature, find the
fixed-width-bin threshold that maximizes variance reduction of the target.
This is the primitive inside every histogram-based GBDT (LightGBM-style
feature binning + split gain scan), exposed here as a feature-screening
operator: one output row per feature with its best split and gain.

Scale shape: pass 1 collapses each block to per-feature (min, max) partials;
pass 2 bins every value with the global edges and collapses each block to a
(feature, bin) → (count, Σy, Σy²) histogram — F × B doubles per block, merged
driver-side (bounded, independent of row count). The split scan is a
closed-form prefix-sum pass over the tiny merged histogram. No shuffle at
any point; both passes stream.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

import ray.data

__all__ = ["decision_stump"]


def decision_stump(
    ds: ray.data.Dataset,
    feature_cols: Sequence[str],
    target_col: str,
    *,
    num_bins: int = 32,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Best single split per feature by variance reduction.

    For feature x with global range [lo, hi]: ``bin = clamp(floor((x − lo)
    · B / (hi − lo)), 0, B−1)`` (the LEAST/GREATEST mirror in the oracle —
    the multiply-then-divide form is used on BOTH sides so the binning is
    IEEE-identical). A split after bin t sends bins ≤ t left; its gain is
    the per-row SSE reduction ``(SSE − SSE_L − SSE_R) / n``. Gains are
    ROUNDED before the argmax (the changepoint pattern) and ties take the
    smallest bin, so float summation order can't flip the winner. Rows
    with a null feature or null target are dropped per feature (pairwise
    deletion); constant features (hi == lo) emit no row.

    Output: one row per splittable feature — ``feature``, ``split_bin``,
    ``threshold`` (upper edge of the left side), ``n_left``, ``n_right``,
    ``left_mean``, ``right_mean``, ``gain``.
    """
    feats = list(feature_cols)
    B = int(num_bins)
    cols = feats + [target_col]

    def minmax_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        y_ok = df[target_col].notna()
        for i, f in enumerate(feats):
            x = df[f][y_ok & df[f].notna()]
            if len(x):
                rows.append((i, float(x.min()), float(x.max())))
        return pd.DataFrame(rows, columns=["fidx", "lo", "hi"]) if rows else \
            pd.DataFrame({"fidx": pd.Series(dtype="int64"),
                          "lo": pd.Series(dtype="float64"),
                          "hi": pd.Series(dtype="float64")})

    mm = (
        ds.select_columns(cols)
        .map_batches(minmax_partial, batch_size=None, batch_format="pandas")
        .to_pandas().groupby("fidx").agg(lo=("lo", "min"), hi=("hi", "max"))
    )
    lo = np.full(len(feats), np.nan)
    hi = np.full(len(feats), np.nan)
    lo[mm.index.to_numpy()] = mm["lo"].to_numpy()
    hi[mm.index.to_numpy()] = mm["hi"].to_numpy()

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        n = np.zeros((len(feats), B))
        s = np.zeros((len(feats), B))
        ss = np.zeros((len(feats), B))
        y_all = df[target_col]
        for i, f in enumerate(feats):
            if not hi[i] > lo[i]:
                continue
            ok = (y_all.notna() & df[f].notna()).to_numpy()
            if not ok.any():
                continue
            x = df[f].to_numpy(dtype=np.float64)[ok]
            y = y_all.to_numpy(dtype=np.float64)[ok]
            b = np.floor((x - lo[i]) * B / (hi[i] - lo[i]))
            b = np.clip(b, 0, B - 1).astype(np.int64)
            np.add.at(n[i], b, 1.0)
            np.add.at(s[i], b, y)
            np.add.at(ss[i], b, y * y)
        fidx, bins = np.nonzero(n)
        return pd.DataFrame({
            "fidx": fidx, "bin": bins, "n": n[fidx, bins],
            "s": s[fidx, bins], "ss": ss[fidx, bins],
        })

    h = (
        ds.select_columns(cols)
        .map_batches(hist_partial, batch_size=None, batch_format="pandas")
        .to_pandas().groupby(["fidx", "bin"], sort=True)[["n", "s", "ss"]]
        .sum().reset_index()
    )

    out_rows = []
    for i, f in enumerate(feats):
        g = h[h["fidx"] == i]
        if g.empty or not hi[i] > lo[i]:
            continue
        # prefix sums in ascending-bin order — same order as the oracle's
        # window frame, so cumulative float sums agree to summation order
        nl = g["n"].to_numpy().cumsum()
        sl = g["s"].to_numpy().cumsum()
        ssl = g["ss"].to_numpy().cumsum()
        nt, st, sst = nl[-1], sl[-1], ssl[-1]
        nr = nt - nl
        sr = st - sl
        ssr = sst - ssl
        cand = (nl > 0) & (nr > 0)
        if not cand.any():
            continue
        with np.errstate(invalid="ignore", divide="ignore"):
            sse_t = sst - st * st / nt
            sse_l = ssl - sl * sl / nl
            sse_r = ssr - sr * sr / nr
            gain = np.round((sse_t - sse_l - sse_r) / nt, round_digits)
        gain[~cand] = -np.inf
        t = int(np.argmax(gain))  # first max = smallest bin on ties
        b = int(g["bin"].iloc[t])
        out_rows.append({
            "feature": f,
            "split_bin": b,
            "threshold": round(
                lo[i] + (b + 1) * (hi[i] - lo[i]) / B, round_digits),
            "n_left": int(nl[t]),
            "n_right": int(nr[t]),
            "left_mean": round(sl[t] / nl[t], round_digits),
            "right_mean": round(sr[t] / nr[t], round_digits),
            "gain": float(gain[t]),
        })

    import pyarrow as pa

    if not out_rows:
        return ray.data.from_arrow(pa.table({
            "feature": pa.array([], type=pa.string()),
            "split_bin": pa.array([], type=pa.int64()),
            "threshold": pa.array([], type=pa.float64()),
            "n_left": pa.array([], type=pa.int64()),
            "n_right": pa.array([], type=pa.int64()),
            "left_mean": pa.array([], type=pa.float64()),
            "right_mean": pa.array([], type=pa.float64()),
            "gain": pa.array([], type=pa.float64()),
        }))
    out = pd.DataFrame(out_rows)
    return ray.data.from_arrow(pa.Table.from_pandas(out, preserve_index=False))
