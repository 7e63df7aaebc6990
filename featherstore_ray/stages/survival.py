"""Survival analysis: time-to-event derivation + Kaplan-Meier curves.

The product-limit (Kaplan-Meier) estimator is the standard censoring-aware
"time until conversion / churn / failure" feature — none of the existing
stats family (welch_t / ks_test / anova_f) handles right-censored
durations. The reference has no survival ops (SURVEY §2.5); this extends
the training-data/stats surface.

Semantics (mirrored exactly by the SQL oracle):
  - subjects censored at time t are still AT RISK at t (events at t
    happen before same-time censoring — the textbook convention);
  - ``S(t_i) = Π_{j≤i} (1 − d_j / n_j)`` over event times in ascending
    order, computed as ``exp(Σ ln(1 − d/n))`` on BOTH sides (same IEEE op
    sequence) with the all-remaining-die step (``d == n``, only possible
    at a group's last time) special-cased to exactly 0 because SQL ``ln(0)``
    errors;
  - output rows only at times with ≥ 1 observed event (d > 0).

Scale shape: every stage is a mergeable reduction. Each block collapses
to (group, duration, d, c) count partials; ONE hash(group) exchange; the
per-bucket kernel is a lexsort + segmented reverse-cumsum — rows never
fan out and the curve is |distinct durations| per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from featherstore_ray.exchange import bucketed_map_groups
from featherstore_ray.partition import BUCKET_COL, add_bucket_column


def time_to_event(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    type_col: str,
    target: str,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Derive one (entity, duration, observed) row per entity from an
    event stream: the clock starts at the entity's first event; the event
    of interest is its first ``type_col == target`` row at/after that;
    entities without one are right-censored at their last event.
    ``duration`` is in integer microseconds. Null entity keys drop.

    One pass of (entity, min ts, max ts, min target ts) partials per
    block, then one hash(entity) exchange merging them — never rows.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[entity_col].notna() & df[ts_col].notna()]
        tgt = d[d[type_col] == target]
        g = d.groupby(entity_col, sort=False, observed=True)[ts_col]
        out = g.agg(_s="min", _e="max").reset_index()
        p = (
            tgt.groupby(entity_col, sort=False, observed=True)[ts_col]
            .min().rename("_p").reset_index()
        )
        return out.merge(p, on=entity_col, how="left")

    parts = (
        ds.select_columns([entity_col, ts_col, type_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
    )
    parts = add_bucket_column(parts, entity_col, num_buckets)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        g = df.groupby(entity_col, sort=False, observed=True).agg(
            _s=("_s", "min"), _e=("_e", "max"), _p=("_p", "min")
        )
        end = g["_p"].fillna(g["_e"])
        dur = (
            end.to_numpy().astype("datetime64[us]").astype(np.int64)
            - g["_s"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        return pd.DataFrame({
            entity_col: g.index.to_numpy(),
            "duration": dur,
            "observed": g["_p"].notna().to_numpy(),
        })

    return bucketed_map_groups(
        parts, merge, num_buckets=num_buckets, batch_format="pandas"
    )


def _seg_lengths(first: np.ndarray, n: int) -> np.ndarray:
    return np.diff(np.append(first, n))


def kaplan_meier(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    duration_col: str,
    observed_col: str,
    round_digits: int | None = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Kaplan-Meier survival curve per group over (duration, observed)
    subject rows. Output: one row per (group, event time) with ``n_risk``,
    ``d_events`` and ``survival`` (module-doc semantics). Rows with a NULL
    group, duration or observed flag are excluded on both sides.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[group_col].notna() & df[duration_col].notna()
               & df[observed_col].notna()]
        out = pd.DataFrame({
            group_col: d[group_col],
            "_t": d[duration_col].to_numpy().astype(np.int64),
            "_d": d[observed_col].to_numpy().astype(np.int64),
            "_c": np.int64(1),
        })
        return out.groupby([group_col, "_t"], sort=False, observed=True)[
            ["_d", "_c"]].sum().reset_index()

    parts = (
        ds.select_columns([group_col, duration_col, observed_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
    )
    parts = add_bucket_column(parts, group_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        m = df.groupby([group_col, "_t"], sort=True, observed=True)[
            ["_d", "_c"]].sum().reset_index()
        if m.empty:
            return pd.DataFrame({
                group_col: m[group_col], "t": m["_t"],
                "n_risk": pd.Series([], dtype=np.int64),
                "d_events": pd.Series([], dtype=np.int64),
                "survival": pd.Series([], dtype=np.float64),
            })
        codes, _ = pd.factorize(m[group_col], sort=True)
        n = len(codes)
        at_t = m["_c"].to_numpy().astype(np.int64)  # observed + censored
        d = m["_d"].to_numpy().astype(np.int64)
        first = np.flatnonzero(np.diff(codes, prepend=-1))  # segment starts
        lens = _seg_lengths(first, n)
        # n_risk = group total − count at strictly earlier times (rows are
        # (group, t)-sorted, so both are one segmented cumsum)
        total = np.bincount(codes, weights=at_t).astype(np.int64)
        before = np.cumsum(at_t) - at_t
        before -= np.repeat(before[first], lens)
        n_risk = np.repeat(total[codes[first]], lens) - before
        # survival = exp(segmented cumsum of ln(1 − d/n)); the d == n step
        # (only possible at a group's last time) forces exactly 0 from
        # there on — ln(0) is an error in SQL and −inf here
        frac = d.astype(np.float64) / n_risk.astype(np.float64)
        safe = d < n_risk
        terms = np.where(safe, np.log(np.where(safe, 1.0 - frac, 1.0)), 0.0)
        cml = np.cumsum(terms)
        cml -= np.repeat((cml - terms)[first], lens)
        hits = np.cumsum(~safe)
        dead = (hits - np.repeat((hits - (~safe))[first], lens)) > 0
        surv = np.where(dead, 0.0, np.exp(cml))
        if round_digits is not None:
            surv = np.round(surv, round_digits)
        out = pd.DataFrame({
            group_col: m[group_col].to_numpy(),
            "t": m["_t"].to_numpy(),
            "n_risk": n_risk,
            "d_events": d,
            "survival": surv,
        })
        return out[d > 0].reset_index(drop=True)

    return bucketed_map_groups(
        parts, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def logrank(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    duration_col: str,
    observed_col: str,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Two-sample log-rank test — kaplan_meier's hypothesis-test
    companion: did the two groups' survival curves actually differ?
    At every event time t: observed events ``O_g``, expected
    ``E_g = d·n_g/n`` under the null, hypergeometric variance
    ``V = d·(n_1/n)·(n_2/n)·(n−d)/(n−1)``; the statistic is
    ``z = (ΣO_1 − ΣE_1)/sqrt(ΣV)`` and ``chi2 = z²``. Censored-at-t
    subjects stay at risk at t (the KM convention). ``group_col`` must
    have exactly two non-null values (ascending order defines group 1).
    Output: one row (group_1, group_2, o1, e1, chi2, z).

    Scale shape: the same (group, duration, d, c) count partials as
    kaplan_meier, merged driver-side — bounded by 2 × distinct
    durations (coarsen durations upstream for micro-second-unique
    100 TB streams). Every sum is mirrored term-for-term by the oracle.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[group_col].notna() & df[duration_col].notna()
               & df[observed_col].notna()]
        out = pd.DataFrame({
            group_col: d[group_col],
            "_t": d[duration_col].to_numpy().astype(np.int64),
            "_d": d[observed_col].to_numpy().astype(np.int64),
            "_c": np.int64(1),
        })
        return out.groupby([group_col, "_t"], sort=False, observed=True)[
            ["_d", "_c"]].sum().reset_index()

    m = (
        ds.select_columns([group_col, duration_col, observed_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
        .groupby([group_col, "_t"], sort=True)[["_d", "_c"]]
        .sum().reset_index()
    )
    groups = sorted(m[group_col].unique())
    if len(groups) != 2:
        raise ValueError(
            f"logrank needs exactly 2 groups, got {groups}")
    g1, g2 = groups
    times = np.sort(m["_t"].unique())

    def per_group(g):
        sub = m[m[group_col] == g].set_index("_t")
        d = sub["_d"].reindex(times, fill_value=0).to_numpy(np.float64)
        c = sub["_c"].reindex(times, fill_value=0).to_numpy(np.float64)
        total = c.sum()
        # at risk at t = total − subjects with duration < t
        before = np.concatenate(([0.0], np.cumsum(c)[:-1]))
        return d, total - before

    d1, n1 = per_group(g1)
    d2, n2 = per_group(g2)
    d = d1 + d2
    n = n1 + n2
    ev = d > 0
    d, n, d1_, n1_, n2_ = d[ev], n[ev], d1[ev], n1[ev], n2[ev]
    e1 = d * (n1_ / n)
    with np.errstate(invalid="ignore", divide="ignore"):
        v = np.where(n > 1,
                     d * (n1_ / n) * (n2_ / n) * (n - d) / (n - 1.0), 0.0)
    o1 = d1_.sum()
    e1s = e1.sum()
    vs = v.sum()
    z = (o1 - e1s) / np.sqrt(vs) if vs > 0 else np.nan
    import pyarrow as pa

    return ray.data.from_arrow(pa.table({
        "group_1": pa.array([g1]),
        "group_2": pa.array([g2]),
        "o1": pa.array([np.int64(o1)]),
        "e1": pa.array([round(float(e1s), round_digits)]),
        "chi2": pa.array([round(float(z * z), round_digits)
                          if np.isfinite(z) else None], pa.float64()),
        "z": pa.array([round(float(z), round_digits)
                       if np.isfinite(z) else None], pa.float64()),
    }))


def rmst(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    duration_col: str,
    observed_col: str,
    tau: int,
    scale: float = 1.0,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Restricted mean survival time — the effect-size companion to
    :func:`kaplan_meier` (curve) and :func:`logrank` (significance):
    ``RMST(τ) = ∫₀^τ S(t) dt``, the area under the KM step curve up to
    the horizon ``tau`` — "expected duration survived within the first
    τ", robust to censoring and always estimable. Output: (group, rmst)
    in input-duration units divided by ``scale`` — pass 86400e6 for
    microsecond durations reported in days (rounding a 1e12-scale sum at
    6 decimals would be vacuous and the driver hash tolerance would sit
    below the float summation noise).

    Same partials/exchange as kaplan_meier; the kernel integrates the
    UNROUNDED step curve (segment gaps capped at τ) so the only rounding
    happens once at the end — the oracle mirrors every term.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[group_col].notna() & df[duration_col].notna()
               & df[observed_col].notna()]
        out = pd.DataFrame({
            group_col: d[group_col],
            "_t": d[duration_col].to_numpy().astype(np.int64),
            "_d": d[observed_col].to_numpy().astype(np.int64),
            "_c": np.int64(1),
        })
        return out.groupby([group_col, "_t"], sort=False, observed=True)[
            ["_d", "_c"]].sum().reset_index()

    parts = (
        ds.select_columns([group_col, duration_col, observed_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
    )
    parts = add_bucket_column(parts, group_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        m = df.groupby([group_col, "_t"], sort=True, observed=True)[
            ["_d", "_c"]].sum().reset_index()
        if m.empty:
            return pd.DataFrame({
                group_col: m[group_col],
                "rmst": pd.Series([], dtype=np.float64),
            })
        codes, uniques = pd.factorize(m[group_col], sort=True)
        n = len(codes)
        at_t = m["_c"].to_numpy().astype(np.int64)
        d = m["_d"].to_numpy().astype(np.int64)
        t = m["_t"].to_numpy().astype(np.int64)
        first = np.flatnonzero(np.diff(codes, prepend=-1))
        lens = _seg_lengths(first, n)
        total = np.bincount(codes, weights=at_t).astype(np.int64)
        before = np.cumsum(at_t) - at_t
        before -= np.repeat(before[first], lens)
        n_risk = np.repeat(total[codes[first]], lens) - before
        frac = d.astype(np.float64) / n_risk.astype(np.float64)
        safe = d < n_risk
        terms = np.where(safe, np.log(np.where(safe, 1.0 - frac, 1.0)), 0.0)
        cml = np.cumsum(terms)
        cml -= np.repeat((cml - terms)[first], lens)
        hits = np.cumsum(~safe)
        dead = (hits - np.repeat((hits - (~safe))[first], lens)) > 0
        surv = np.where(dead, 0.0, np.exp(cml))  # UNROUNDED S(t_i)
        # integrate only event rows (d > 0; S changes nowhere else)
        ev = d > 0
        k = codes.max() + 1
        rm = np.zeros(k, dtype=np.float64)
        ce, te, se = codes[ev], t[ev], surv[ev]
        if len(ce):
            new_g = np.empty(len(ce), dtype=bool)
            new_g[0] = True
            new_g[1:] = ce[1:] != ce[:-1]
            # first segment: S = 1 from 0 to min(t_1, tau)
            np.add.at(rm, ce[new_g],
                      np.minimum(te[new_g], tau).astype(np.float64))
            # later segments: S(t_i) from min(t_i,tau) to min(t_{i+1},tau)
            nxt = np.empty(len(ce), dtype=np.int64)
            nxt[:-1] = np.where(ce[1:] == ce[:-1], te[1:], tau)
            nxt[-1] = tau
            gap = (np.minimum(nxt, tau)
                   - np.minimum(te, tau)).astype(np.float64)
            np.add.at(rm, ce, np.maximum(gap, 0.0) * se)
        # groups with NO event rows: S = 1 throughout -> RMST = tau
        has_ev = np.zeros(k, dtype=bool)
        has_ev[np.unique(codes[ev])] = True if len(ce) else False
        rm[~has_ev] = float(tau)
        return pd.DataFrame({
            group_col: uniques,
            "rmst": np.round(rm / scale, round_digits),
        })

    return bucketed_map_groups(
        parts, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def cox_ph(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    duration_col: str,
    observed_col: str,
    iters: int = 4,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Cox proportional-hazards fit for a BINARY covariate (``group_col``
    must be 0/1-valued): Newton-Raphson on the Breslow partial
    likelihood, a FIXED ``iters``-step schedule from β=0 so both engines
    run the identical arithmetic. With x ∈ {0,1} the risk-set sums close
    over two counts — S0(t) = n0(t) + n1(t)·e^β, S1 = S2 = n1(t)·e^β —
    so each Newton step needs only the per-event-time at-risk counts:

        p(t)  = n1·e^β / S0              (share of hazard on treated)
        U(β)  = Σ_t [d1(t) − d(t)·p(t)]   (score)
        I(β)  = Σ_t  d(t)·p(t)·(1−p(t))   (information)
        β    ← β + U/I

    Output one row: n, n_events, beta, hr = e^β, se = 1/sqrt(I), z.
    If the information is ever non-positive (degenerate risk sets) the
    fit columns are NULL — mirrored by the oracle's CASE.

    Scale shape: the logrank pattern — per-block (duration) count
    partials (c, c1, d, d1), merged driver-side bounded by distinct
    durations (coarsen durations upstream for microsecond-unique
    100 TB streams); at-risk counts are suffix sums over the tiny
    merged table, and each Newton step is one vectorized pass over it.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[group_col].notna() & df[duration_col].notna()
               & df[observed_col].notna()]
        x = d[group_col].to_numpy().astype(np.int64)
        out = pd.DataFrame({
            "_t": d[duration_col].to_numpy().astype(np.int64),
            "_c": np.int64(1),
            "_c1": x,
            "_d": d[observed_col].to_numpy().astype(np.int64),
            "_d1": d[observed_col].to_numpy().astype(np.int64) * x,
        })
        return out.groupby("_t", sort=False)[
            ["_c", "_c1", "_d", "_d1"]].sum().reset_index()

    m = (
        ds.select_columns([group_col, duration_col, observed_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
        .to_pandas()
        .groupby("_t", sort=True)[["_c", "_c1", "_d", "_d1"]]
        .sum().reset_index()
    )
    c = m["_c"].to_numpy(np.float64)
    c1 = m["_c1"].to_numpy(np.float64)
    d = m["_d"].to_numpy(np.float64)
    d1 = m["_d1"].to_numpy(np.float64)
    # at risk at t = total − subjects with duration < t (suffix sums)
    n_risk = c.sum() - np.concatenate(([0.0], np.cumsum(c)[:-1]))
    n1_risk = c1.sum() - np.concatenate(([0.0], np.cumsum(c1)[:-1]))
    ev = d > 0
    dE, d1E, nE, n1E = d[ev], d1[ev], n_risk[ev], n1_risk[ev]

    beta = 0.0
    info = np.nan
    ok = True
    for _ in range(iters):
        eb = np.exp(beta)
        p = n1E * eb / ((nE - n1E) + n1E * eb)
        info = float(np.sum(dE * p * (1.0 - p)))
        if not (info > 0.0):
            ok = False
            break
        beta = beta + float(np.sum(d1E - dE * p)) / info
    if ok:
        # the reported information is evaluated AT the final beta
        eb = np.exp(beta)
        p = n1E * eb / ((nE - n1E) + n1E * eb)
        info = float(np.sum(dE * p * (1.0 - p)))
        ok = info > 0.0

    import pyarrow as pa

    def _r(v):
        return round(float(v), round_digits) if ok else None

    return ray.data.from_arrow(pa.table({
        "n": pa.array([np.int64(c.sum())]),
        "n_events": pa.array([np.int64(d.sum())]),
        "beta": pa.array([_r(beta)], pa.float64()),
        "hr": pa.array([_r(np.exp(beta))], pa.float64()),
        "se": pa.array([_r(1.0 / np.sqrt(info))], pa.float64()),
        "z": pa.array([_r(beta * np.sqrt(info))], pa.float64()),
    }))


def cumulative_incidence(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    duration_col: str,
    cause_col: str,
    round_digits: int | None = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Aalen-Johansen cumulative incidence under COMPETING risks — the
    multi-cause member of the survival family (:func:`kaplan_meier`
    treats every event as one kind; with competing causes, 1 - KM per
    cause OVERSTATES risk because subjects taken by other causes can no
    longer fail — CIF is the correct probability-of-cause-k-by-t):
    over subject rows (group, duration, cause) with cause 0 = censored
    and integer codes >= 1 the competing causes,

        S(t)     = prod_{s<=t} (1 - d(s)/n(s))      (all-cause KM)
        CIF_k(t) = sum_{s<=t}  S(s-) d_k(s) / n(s)

    with the kaplan_meier ln/exp mirror conventions (same-time censoring
    after events; the d == n step forces S to exactly 0 from there on —
    S(s-) uses the shifted prefix, so that row itself still contributes).
    Output: one row per (group, cause, event time) with n_risk, d_cause
    and cif, only where d_cause > 0.

    Scale shape: identical to kaplan_meier — (group, duration, cause)
    count partials, ONE hash(group) exchange, a lexsort + two segmented
    cumsums per bucket.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[group_col].notna() & df[duration_col].notna()
               & df[cause_col].notna()]
        out = pd.DataFrame({
            group_col: d[group_col],
            "_t": d[duration_col].to_numpy().astype(np.int64),
            "_k": d[cause_col].to_numpy().astype(np.int64),
            "_c": np.int64(1),
        })
        return out.groupby([group_col, "_t", "_k"], sort=False,
                           observed=True)["_c"].sum().reset_index()

    parts = (
        ds.select_columns([group_col, duration_col, cause_col])
        .map_batches(partial, batch_size=None, batch_format="pandas")
    )
    parts = add_bucket_column(parts, group_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        empty = pd.DataFrame({
            group_col: pd.Series(dtype=df[group_col].dtype),
            "cause": pd.Series(dtype=np.int64),
            "t": pd.Series(dtype=np.int64),
            "n_risk": pd.Series(dtype=np.int64),
            "d_cause": pd.Series(dtype=np.int64),
            "cif": pd.Series(dtype=np.float64),
        })
        m3 = df.groupby([group_col, "_t", "_k"], sort=True,
                        observed=True)["_c"].sum().reset_index()
        if m3.empty:
            return empty
        # per-(group, t) all-cause totals
        m = (m3.assign(_d=np.where(m3["_k"] > 0, m3["_c"], 0))
             .groupby([group_col, "_t"], sort=True, observed=True)
             .agg(_d=("_d", "sum"), _c=("_c", "sum")).reset_index())
        codes, _ = pd.factorize(m[group_col], sort=True)
        n = len(codes)
        at_t = m["_c"].to_numpy(np.int64)
        d = m["_d"].to_numpy(np.int64)
        first = np.flatnonzero(np.diff(codes, prepend=-1))
        lens = _seg_lengths(first, n)
        total = np.bincount(codes, weights=at_t).astype(np.int64)
        before = np.cumsum(at_t) - at_t
        before -= np.repeat(before[first], lens)
        n_risk = np.repeat(total[codes[first]], lens) - before
        frac = d.astype(np.float64) / n_risk.astype(np.float64)
        safe = d < n_risk
        terms = np.where(safe, np.log(np.where(safe, 1.0 - frac, 1.0)),
                         0.0)
        cml = np.cumsum(terms)
        cml -= np.repeat((cml - terms)[first], lens)
        lnprev = cml - terms          # prefix EXCLUDING the current row
        hits = np.cumsum(~safe)
        hits -= np.repeat((hits - (~safe))[first], lens)
        dead_prev = (hits - (~safe).astype(np.int64)) > 0
        s_prev = np.where(dead_prev, 0.0, np.exp(lnprev))
        # attach s_prev / n_risk back onto the (group, t, cause) rows
        key = pd.MultiIndex.from_arrays([m[group_col], m["_t"]])
        lut = pd.DataFrame({"_sp": s_prev, "_nr": n_risk}, index=key)
        ev = m3[m3["_k"] > 0]
        if ev.empty:
            return empty
        idx = pd.MultiIndex.from_arrays([ev[group_col], ev["_t"]])
        sp = lut["_sp"].loc[idx].to_numpy()
        nr = lut["_nr"].loc[idx].to_numpy(np.int64)
        dk = ev["_c"].to_numpy(np.int64)
        contrib = sp * dk / nr.astype(np.float64)
        # segmented cumsum over t within (group, cause)
        order = np.lexsort((ev["_t"].to_numpy(np.int64),
                            ev["_k"].to_numpy(np.int64),
                            pd.factorize(ev[group_col], sort=True)[0]))
        gk = pd.factorize(ev[group_col], sort=True)[0][order]
        kk = ev["_k"].to_numpy(np.int64)[order]
        newseg = np.ones(len(order), dtype=bool)
        newseg[1:] = (gk[1:] != gk[:-1]) | (kk[1:] != kk[:-1])
        cs = np.cumsum(contrib[order])
        cs -= np.repeat((cs - contrib[order])[np.flatnonzero(newseg)],
                        _seg_lengths(np.flatnonzero(newseg), len(order)))
        cif = cs
        if round_digits is not None:
            cif = np.round(cif, round_digits)
        return pd.DataFrame({
            group_col: ev[group_col].to_numpy()[order],
            "cause": kk,
            "t": ev["_t"].to_numpy(np.int64)[order],
            "n_risk": nr[order],
            "d_cause": dk[order],
            "cif": cif,
        })

    return bucketed_map_groups(
        parts, kernel, num_buckets=num_buckets, batch_format="pandas"
    )
