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
import pyarrow as pa

import ray.data

__all__ = ["decision_stump", "boosted_stumps"]


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


def boosted_stumps(
    ds: ray.data.Dataset,
    feature_cols: Sequence[str],
    target_col: str,
    *,
    rounds: int = 4,
    lr: float = 0.5,
    num_bins: int = 32,
    gain_round: int = 9,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Gradient-boosted decision stumps (squared loss) — histogram GBDT at
    depth 1, the trained-model sibling of :func:`decision_stump`:
    ``F₀ = mean(y)``; each round fits a stump to the residuals (same
    fixed-width bins, gains ROUNDED to ``gain_round`` before the argmax,
    ties → smallest (feature index, bin)) and updates ``F += lr·leaf``.
    Rows with a null in ANY feature or the target are dropped (boosting
    needs the full row; the stump screen is pairwise instead).

    Output: the MODEL — one row per round: (round, feature, split_bin,
    threshold, n_left, n_right, left_value, right_value, gain). Leaf
    values are the arm means of the residuals (unrounded inside the
    recursion, rounded at the edge); gain is the per-row SSE reduction.

    Scale shape: one min/max + base-mean pass, then ``rounds`` streaming
    histogram passes with the growing stump list riding in the closure —
    each block collapses to an F × B moment grid; nothing shuffles. The
    cross-engine contract is the changepoint/decision_stump one: every
    argmax input is pre-rounded, every other op is smooth.
    """
    feats = list(feature_cols)
    B = int(num_bins)
    nf = len(feats)
    cols = feats + [target_col]

    proj = ds.select_columns(cols).materialize()

    def prep_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=cols)
        row = {"_n": np.int64(len(d)),
               "_sy": float(d[target_col].sum()) if len(d) else 0.0}
        for i, f in enumerate(feats):
            row[f"_lo{i}"] = float(d[f].min()) if len(d) else np.nan
            row[f"_hi{i}"] = float(d[f].max()) if len(d) else np.nan
        return pd.DataFrame([row])

    mm = (
        proj.map_batches(prep_partial, batch_size=None,
                         batch_format="pandas").to_pandas()
    )
    n_total = int(mm["_n"].sum())
    if n_total == 0:
        return ray.data.from_arrow(pa.table({
            "round": pa.array([], pa.int64()),
            "feature": pa.array([], pa.string()),
            "split_bin": pa.array([], pa.int64()),
            "threshold": pa.array([], pa.float64()),
            "n_left": pa.array([], pa.int64()),
            "n_right": pa.array([], pa.int64()),
            "left_value": pa.array([], pa.float64()),
            "right_value": pa.array([], pa.float64()),
            "gain": pa.array([], pa.float64()),
        }))
    base = float(mm["_sy"].sum()) / n_total
    lo = np.array([mm[f"_lo{i}"].min() for i in range(nf)])
    hi = np.array([mm[f"_hi{i}"].max() for i in range(nf)])
    splittable = hi > lo

    stumps: list[tuple[int, int, float, float]] = []  # (fidx, bin, lv, rv)
    model_rows = []

    def _bins(X: np.ndarray) -> np.ndarray:
        out = np.empty_like(X, dtype=np.int64)
        for i in range(nf):
            if splittable[i]:
                b = np.floor((X[:, i] - lo[i]) * B / (hi[i] - lo[i]))
                out[:, i] = np.clip(b, 0, B - 1)
            else:
                out[:, i] = 0
        return out

    for t in range(1, rounds + 1):
        cur = list(stumps)

        def hist_partial(df: pd.DataFrame, _cur=cur) -> pd.DataFrame:
            d = df.dropna(subset=cols)
            if d.empty:
                return pd.DataFrame({
                    "fidx": pd.Series(dtype="int64"),
                    "bin": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="float64"),
                    "s": pd.Series(dtype="float64"),
                    "ss": pd.Series(dtype="float64"),
                })
            X = d[feats].to_numpy(dtype=np.float64)
            bins = _bins(X)
            r = d[target_col].to_numpy(dtype=np.float64) - base
            for fi, bi, lv, rv in _cur:
                r -= lr * np.where(bins[:, fi] <= bi, lv, rv)
            n = np.zeros((nf, B))
            s = np.zeros((nf, B))
            ss = np.zeros((nf, B))
            for i in range(nf):
                if not splittable[i]:
                    continue
                np.add.at(n[i], bins[:, i], 1.0)
                np.add.at(s[i], bins[:, i], r)
                np.add.at(ss[i], bins[:, i], r * r)
            fidx, bb = np.nonzero(n)
            return pd.DataFrame({
                "fidx": fidx, "bin": bb, "n": n[fidx, bb],
                "s": s[fidx, bb], "ss": ss[fidx, bb],
            })

        h = (
            proj.map_batches(hist_partial, batch_size=None,
                             batch_format="pandas")
            .to_pandas().groupby(["fidx", "bin"], sort=True)[
                ["n", "s", "ss"]].sum().reset_index()
        )
        best = None  # (neg-gain already handled by scan order)
        for i in range(nf):
            g = h[h["fidx"] == i]
            if g.empty:
                continue
            nl = g["n"].to_numpy().cumsum()
            sl = g["s"].to_numpy().cumsum()
            ssl = g["ss"].to_numpy().cumsum()
            nt, st, sst = nl[-1], sl[-1], ssl[-1]
            nr = nt - nl
            cand = (nl > 0) & (nr > 0)
            if not cand.any():
                continue
            with np.errstate(invalid="ignore", divide="ignore"):
                gain = np.round(
                    ((sst - st * st / nt) - (ssl - sl * sl / nl)
                     - ((sst - ssl) - (st - sl) * (st - sl) / nr)) / nt,
                    gain_round)
            gain[~cand] = -np.inf
            j = int(np.argmax(gain))  # first max = smallest bin
            # scan order i ascending + strict > keeps smallest fidx on ties
            if best is None or gain[j] > best[0]:
                best = (gain[j], i, int(g["bin"].iloc[j]),
                        float(sl[j] / nl[j]),
                        float((st - sl[j]) / nr[j]),
                        int(nl[j]), int(nr[j]))
        if best is None:
            break
        gbest, fi, bi, lv, rv, nl_, nr_ = best
        stumps.append((fi, bi, lv, rv))
        model_rows.append({
            "round": t,
            "feature": feats[fi],
            "split_bin": bi,
            "threshold": round(lo[fi] + (bi + 1) * (hi[fi] - lo[fi]) / B,
                               round_digits),
            "n_left": nl_,
            "n_right": nr_,
            "left_value": round(lv, round_digits),
            "right_value": round(rv, round_digits),
            "gain": float(gbest),
        })

    out = pd.DataFrame(model_rows)
    return ray.data.from_arrow(pa.Table.from_pandas(out,
                                                    preserve_index=False))
