"""Off-policy evaluation: IPS / SNIPS over logged (context, action, reward).

Counterfactual policy-value estimation from logged interaction data — the
standard first step before an online test: given logs produced by a logging
policy, estimate what a DIFFERENT target policy would have earned, via
inverse-propensity scoring (Horvitz-Thompson) and its self-normalized
variant (SNIPS).

Reference parity note: the reference engine has no OPE operators; this
extends the engine toward training-data/recsys pipelines the same way the
causal family (ate_stratified / dr_ate) does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def ips_policy_eval(
    ds: ray.data.Dataset,
    *,
    context_col: str,
    action_col: str,
    reward_col: str,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Evaluate the full family of cyclic-shift deterministic policies
    ``π_s(ctx) = actions[(ctx + s) % k]`` (actions = sorted distinct logged
    actions, k = |actions|) against the logging policy in ONE pass: each
    logged row matches exactly one shift ``s = (aidx − ctx) mod k``, so a
    single grouped partial yields every policy's estimate.

    Per shift: ``n_matched``; ``ips = round(Σ r/μ(a) / N, 6)`` with the
    empirical propensity ``μ(a) = count(a)/N``; ``snips = round(Σ r/μ(a) /
    Σ 1/μ(a), 6)``. Rows with a NULL context, action or reward are excluded
    on both sides (oracle WHERE mirror). Division chains are stated in the
    exact form the oracle computes (``r / (cnt/N)``, ``1.0 / (cnt/N)``) so
    every per-row double is IEEE-identical; only the final sums differ by
    summation order, which the 6dp rounding + driver tolerance absorb.

    Scale shape: pass 1 collapses each block to (action, count) partials —
    the action space is small by the problem's definition (an OPE action
    set is enumerable) — merged driver-side and captured by closure; pass 2
    collapses each block to k rows of (shift, n, Σwr, Σw). No shuffle at
    any width; both passes stream.
    """
    cols = [context_col, action_col, reward_col]

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=cols)
        if d.empty:
            return pd.DataFrame({action_col: pd.Series(dtype=df[action_col].dtype),
                                 "_n": pd.Series(dtype="int64")})
        out = d.groupby(action_col, sort=False, observed=True).size()
        return out.rename("_n").reset_index()

    merged = (
        ds.select_columns(cols)
        .map_batches(count_partial, batch_size=None, batch_format="pandas")
        .to_pandas()
    )
    if len(merged) == 0 or action_col not in merged.columns:
        # all-empty partials surface columnless through to_pandas
        counts = pd.Series([], dtype="int64")
    else:
        counts = merged.groupby(action_col, sort=True, observed=True)["_n"].sum()
    if len(counts) == 0:
        return ray.data.from_arrow(pa.table({
            "policy_shift": pa.array([], pa.int64()),
            "n_matched": pa.array([], pa.int64()),
            "ips": pa.array([], pa.float64()),
            "snips": pa.array([], pa.float64()),
        }))
    actions = counts.index.to_numpy()
    cnt = counts.to_numpy(dtype=np.int64)
    n_total = int(cnt.sum())
    k = len(actions)
    lookup = {a: i for i, a in enumerate(actions)}

    def sum_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=cols)
        if d.empty:
            return pd.DataFrame({
                "policy_shift": pd.Series(dtype="int64"),
                "_n": pd.Series(dtype="int64"),
                "_wr": pd.Series(dtype="float64"),
                "_w": pd.Series(dtype="float64"),
            })
        aidx = d[action_col].map(lookup).to_numpy(dtype=np.int64)
        ctx = d[context_col].to_numpy(dtype=np.int64)
        r = d[reward_col].to_numpy(dtype=np.float64)
        mu = cnt[aidx].astype(np.float64) / n_total
        wr = r / mu
        w = 1.0 / mu
        s = ((aidx - ctx) % k + k) % k
        g = pd.DataFrame({"policy_shift": s, "_n": 1, "_wr": wr, "_w": w})
        return (g.groupby("policy_shift", sort=False)
                 .sum().reset_index())

    m = (
        ds.select_columns(cols)
        .map_batches(sum_partial, batch_size=None, batch_format="pandas")
        .to_pandas().groupby("policy_shift", sort=True)[["_n", "_wr", "_w"]]
        .sum()
    )
    ips = m["_wr"].to_numpy() / n_total
    snips = m["_wr"].to_numpy() / m["_w"].to_numpy()
    if round_digits is not None:
        ips = np.round(ips, round_digits)
        snips = np.round(snips, round_digits)
    return ray.data.from_arrow(pa.table({
        "policy_shift": pa.array(m.index.to_numpy(dtype=np.int64)),
        "n_matched": pa.array(m["_n"].to_numpy(dtype=np.int64)),
        "ips": pa.array(ips),
        "snips": pa.array(snips),
    }))
