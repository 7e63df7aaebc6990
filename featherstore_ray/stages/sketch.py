"""Mergeable sketches: HyperLogLog distinct counting and t-digest-style
quantiles per group.

The brief's "novel sketch" slot: approximate COUNT(DISTINCT) whose partial
state is a fixed-size register array with an ASSOCIATIVE merge (elementwise
max) — the ideal partial-pre-aggregation shape. Each input batch collapses
to one (group, registers) row before the exchange, so the shuffle moves
``groups x 2^p bytes`` regardless of row count; exact distinct counting
would move every distinct value.

``grouped_quantiles_sketch`` is the same shape for quantiles: each batch
collapses every group's values into <= ``compression`` weighted centroids
partitioned on a t-digest k1-style quantile scale (fine bins near the
tails, coarse in the middle), so the exchange moves ``groups x compression
x 16 bytes`` instead of rows. This is the scale path the exact
``stages/misc.grouped_quantiles`` docstring defers to: a 5-distinct-value
key over 10^12 rows costs each reducer a few KB, never 2x10^11 floats.

Vectorized end to end: register indices and rhos (leading-zero ranks) come
from one hash pass; per-(group, register) maxima via the same sort+reduceat
pattern as the OPH MinHash kernel. Deterministic (fixed hash), so the
driver's repeat-and-compare check holds. Standard HLL bias handling:
linear counting below the small-range threshold, the 2^32 correction above.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from featherstore_ray.exchange import bucketed_map_groups
from featherstore_ray.partition import BUCKET_COL, add_bucket_column, stable_hash


def _hll_estimate(registers: np.ndarray, p: int) -> float:
    """Bias-corrected HLL estimate from one (2^p,) uint8 register array."""
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    elif est > (1 << 32) / 30.0:
        est = -(1 << 32) * np.log(1.0 - est / (1 << 32))
    return float(est)


def hll_distinct(
    ds: ray.data.Dataset,
    group_keys: Sequence[str],
    value_col: str,
    *,
    precision: int = 12,
    num_buckets: int = 64,
    final: str = "driver",
) -> pd.DataFrame | ray.data.Dataset:
    """Approximate distinct ``value_col`` per ``group_keys`` via HLL.

    Relative error ~ 1.04 / sqrt(2^precision) (p=12 → ~1.6%). Partials are
    one (group, 2^p-byte register row) per batch; ``final="driver"`` merges
    them driver-side (low-cardinality groups — partial size is O(groups x
    batches), never rows), ``final="shuffle"`` merges per bucket for
    high-cardinality keys. Returns (group_keys..., approx_distinct:int64).
    """
    group_keys = list(group_keys)
    p = precision
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    **{k: t[k] for k in group_keys},
                    "_regs": pa.array([], pa.list_(pa.uint8())),
                }
            )
        h = stable_hash(t[value_col])
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)  # top p bits consumed by the index
        # rho = leading zeros + 1, capped; exact vectorized bit_length
        # (binary reduction, no float tricks)
        bl = np.zeros(n, dtype=np.int64)
        v = rest.copy()
        for s in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(s))
            bl[big] += s
            v[big] >>= np.uint64(s)
        bl += (v != 0).astype(np.int64)  # v is now 0 or 1
        lz = 64 - bl
        rho = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
        # per (group, register) max via sort + reduceat (groups are
        # identified by their row pattern within the batch)
        gdf = pd.DataFrame({k: t[k].to_numpy(zero_copy_only=False)
                            for k in group_keys})
        codes, uniques = pd.factorize(
            pd.MultiIndex.from_frame(gdf) if len(group_keys) > 1
            else gdf[group_keys[0]]
        )
        # null group keys factorize to -1; dropping them here keeps the
        # flat (group, register) index non-negative (a -1 code would wrap
        # into the LAST group's register row and corrupt its estimate)
        valid_code = codes >= 0
        if not valid_code.all():
            codes, idx, rho = (
                codes[valid_code], idx[valid_code], rho[valid_code]
            )
            if codes.size == 0:  # batch was all-null keys
                return pa.table(
                    {
                        **{k: t[k].slice(0, 0) for k in group_keys},
                        "_regs": pa.array([], pa.list_(pa.uint8())),
                    }
                )
        key = codes.astype(np.int64) * m + idx
        order = np.argsort(key, kind="stable")
        ks, rs = key[order], rho[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        maxs = np.maximum.reduceat(rs, starts)
        n_groups = len(uniques)
        regs = np.zeros((n_groups, m), dtype=np.uint8)
        regs.reshape(-1)[ks[starts]] = maxs
        if len(group_keys) > 1:
            cols = {
                k: pa.array([u[i] for u in uniques])
                for i, k in enumerate(group_keys)
            }
        else:
            cols = {group_keys[0]: pa.array(uniques)}
        cols["_regs"] = pa.array(list(regs), pa.list_(pa.uint8()))
        return pa.table(cols)

    partials = ds.select_columns(group_keys + [value_col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge_frame(df: pd.DataFrame) -> pd.DataFrame:
        out_keys, out_est = [], []
        for gv, g in df.groupby(
            group_keys if len(group_keys) > 1 else group_keys[0], sort=True
        ):
            regs = np.maximum.reduce(np.stack(g["_regs"].to_numpy()))
            out_keys.append(gv)
            out_est.append(int(round(_hll_estimate(regs, p))))
        if len(group_keys) > 1:
            frame = pd.DataFrame(out_keys, columns=group_keys)
        else:
            frame = pd.DataFrame({group_keys[0]: out_keys})
        frame["approx_distinct"] = np.array(out_est, dtype=np.int64)
        return frame

    if final == "driver":
        return merge_frame(partials.to_pandas())
    ds2 = add_bucket_column(partials, group_keys[0], num_buckets)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return merge_frame(df.drop(columns=[BUCKET_COL]))

    return bucketed_map_groups(
        ds2, merge, num_buckets=num_buckets, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters


def _mg_truncate(df: pd.DataFrame, key_col: str, capacity: int) -> pd.DataFrame:
    """Misra-Gries summary truncation: keep the top ``capacity`` counters
    after subtracting the (capacity+1)-th largest count (Agarwal et al.,
    "Mergeable Summaries", PODS'12 merge rule). Every surviving counter
    under-counts its key by at most n/(capacity+1) of the mass it has
    seen; any key with true frequency above that bound survives."""
    if len(df) <= capacity:
        return df
    df = df.sort_values(
        ["n", key_col], ascending=[False, True], kind="stable"
    )
    thr = df["n"].iloc[capacity]  # dtype-preserving (decayed weights are float)
    out = df.head(capacity).copy()
    out["n"] = out["n"] - thr
    return out[out["n"] > 0]


def heavy_hitters(
    ds: ray.data.Dataset,
    key_col: str,
    *,
    k: int = 10,
    capacity: int = 4096,
    recount: bool = True,
) -> pd.DataFrame:
    """Top-``k`` most frequent ``key_col`` values via a Misra-Gries sketch
    with an exact recount of the surviving candidates.

    The shuffle-free counterpart of ``stages/text.vocab_count`` (which is
    exact but pays one (token, partial_count) exchange): here each batch
    collapses to <= ``capacity`` (key, count) counters — fixed memory no
    matter how large the vocabulary — and the driver merges them by
    summing and re-truncating (associative MG merge), so NOTHING shuffles.
    A second pass recounts only the <= ``capacity`` candidate keys exactly
    (broadcast ``is_in`` filter + per-batch counts summed driver-side).

    Guarantee: the result EXACTLY matches SQL ``GROUP BY key ORDER BY
    count(*) DESC, key LIMIT k`` whenever the true k-th frequency exceeds
    n/(capacity+1) (every such key survives the sketch; the recount then
    restores exact counts and deterministic tie order). Below that
    threshold the candidate set may miss tail keys — size ``capacity``
    for the expected head mass, not the vocabulary.

    Two passes over ``ds`` (the sketch pass and the recount) re-execute
    its lineage; pass a cheap-to-recompute dataset or pre-materialize.
    Returns a small driver-side DataFrame (key_col, n:int64).
    """

    def partial(t: pa.Table) -> pa.Table:
        arr = t[key_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.drop_null()
        if len(arr) == 0:
            return pa.table(
                {key_col: t[key_col].slice(0, 0),
                 "n": pa.array([], pa.int64())}
            )
        vc = arr.value_counts()
        df = pd.DataFrame(
            {key_col: vc.field("values").to_pandas(),
             "n": vc.field("counts").to_numpy()}
        )
        return pa.Table.from_pandas(
            _mg_truncate(df, key_col, capacity), preserve_index=False
        ).replace_schema_metadata(None)

    sel = ds.select_columns([key_col])
    merged = (
        sel.map_batches(
            partial, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
        .groupby(key_col, as_index=False)["n"].sum()
    )
    merged = _mg_truncate(merged, key_col, capacity)
    if not recount:
        return (
            merged.sort_values(["n", key_col], ascending=[False, True],
                               kind="stable")
            .head(k).reset_index(drop=True)
        )

    cand = pa.Array.from_pandas(merged[key_col])

    def recount_partial(t: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.is_in(t[key_col], value_set=cand), False)
        return partial(t.filter(m))

    exact = (
        sel.map_batches(
            recount_partial, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
        .groupby(key_col, as_index=False)["n"].sum()
    )
    return (
        exact.sort_values(["n", key_col], ascending=[False, True],
                          kind="stable")
        .head(k).reset_index(drop=True)
        .astype({"n": np.int64})
    )


# ---------------------------------------------------------------------------
# t-digest-style grouped quantile sketch


def _tdigest_bounds(compression: int) -> np.ndarray:
    """Quantile-space bin boundaries from the t-digest k1 scale function
    (k(q) = asin(2q-1)): inverse-mapped equal steps in k give bins whose
    width shrinks toward q=0 and q=1 — tight tail quantiles, coarse middle.
    """
    j = np.arange(compression + 1, dtype=np.float64)
    return (1.0 - np.cos(np.pi * j / compression)) / 2.0


def _compress_sorted(
    vals: np.ndarray, weights: np.ndarray, bounds: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted values, weights) -> (centroid means, weights), <= len(bounds)
    centroids. Each point lands in the scale-space bin of its weight
    midpoint; bin means are weight-averaged. Vectorized, deterministic."""
    w_total = weights.sum()
    cum = np.cumsum(weights)
    q_mid = (cum - weights / 2.0) / w_total
    bins = np.searchsorted(bounds, q_mid, side="right") - 1
    # vals sorted -> q_mid increasing -> bins non-decreasing: reduceat works
    starts = np.flatnonzero(np.concatenate(([True], bins[1:] != bins[:-1])))
    wsum = np.add.reduceat(weights, starts)
    vsum = np.add.reduceat(vals * weights, starts)
    return vsum / wsum, wsum


def _digest_quantiles(
    means: np.ndarray, weights: np.ndarray, quantiles
) -> list[float]:
    """Estimate quantiles from (sorted-by-mean) centroids: interpolate on
    cumulative weight midpoints (standard t-digest estimation)."""
    cum = np.cumsum(weights)
    mid = cum - weights / 2.0
    total = cum[-1]
    return [
        float(np.interp(q * total, mid, means)) for q in quantiles
    ]


def grouped_quantiles_sketch(
    ds: ray.data.Dataset,
    group_keys: Sequence[str],
    value_col: str,
    *,
    quantiles=(0.5,),
    compression: int = 200,
    round_digits: int = 6,
    num_buckets: int = 64,
    final: str = "driver",
) -> pd.DataFrame | ray.data.Dataset:
    """Approximate per-group quantiles via mergeable t-digest-style
    centroids — the scale path paired with the exact
    ``stages/misc.grouped_quantiles`` (which stays the oracle).

    Each batch emits one (group, <=compression centroids) row; merging is
    concat + re-sort + recompress on the same quantile scale. The exchange
    moves O(groups x compression) floats regardless of input rows, so a
    hot group never lands its full value set on one reducer. Error is
    bounded by the scale-space bin width (~1/compression of quantile space
    mid-range, tighter at the tails); the pytest gate checks the estimate
    against the exact path. Output columns match the exact path:
    (group_keys..., ``{value_col}_p{int(q*100)}``...).
    """
    group_keys = list(group_keys)
    bounds = _tdigest_bounds(compression)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                **{k: t[k].slice(0, 0) for k in group_keys},
                "_qmeans": pa.array([], pa.list_(pa.float64())),
                "_qweights": pa.array([], pa.list_(pa.float64())),
            }
        )
        if t.num_rows == 0:
            return empty
        vals = np.asarray(
            t[value_col].cast(pa.float64()).combine_chunks().to_pandas(),
            dtype=np.float64,
        ) if isinstance(t[value_col], pa.ChunkedArray) else np.asarray(
            t[value_col].cast(pa.float64()).to_pandas(), dtype=np.float64
        )
        gdf = pd.DataFrame({k: t[k].to_numpy(zero_copy_only=False)
                            for k in group_keys})
        codes, uniques = pd.factorize(
            pd.MultiIndex.from_frame(gdf) if len(group_keys) > 1
            else gdf[group_keys[0]]
        )
        ok = (codes >= 0) & ~np.isnan(vals)  # null keys/values drop
        codes, vals = codes[ok], vals[ok]
        if codes.size == 0:
            return empty
        order = np.lexsort((vals, codes))
        cs, vs = codes[order], vals[order]
        g_starts = np.flatnonzero(
            np.concatenate(([True], cs[1:] != cs[:-1]))
        )
        g_bounds = np.append(g_starts, len(cs))
        means_out, weights_out, code_out = [], [], []
        ones = np.ones_like(vs)
        for g0, g1 in zip(g_bounds[:-1], g_bounds[1:]):
            m, w = _compress_sorted(vs[g0:g1], ones[g0:g1], bounds)
            means_out.append(m)
            weights_out.append(w)
            code_out.append(cs[g0])
        code_out = np.asarray(code_out)
        if len(group_keys) > 1:
            cols = {
                k: pa.array([uniques[c][i] for c in code_out])
                for i, k in enumerate(group_keys)
            }
        else:
            cols = {group_keys[0]: pa.array(uniques.take(code_out))}
        cols["_qmeans"] = pa.array(
            [m.tolist() for m in means_out], pa.list_(pa.float64())
        )
        cols["_qweights"] = pa.array(
            [w.tolist() for w in weights_out], pa.list_(pa.float64())
        )
        return pa.table(cols)

    partials = ds.select_columns(group_keys + [value_col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    qcols = [f"{value_col}_p{int(q * 100)}" for q in quantiles]

    def merge_frame(df: pd.DataFrame) -> pd.DataFrame:
        out_keys = []
        out_qs: list[list[float]] = [[] for _ in qcols]
        for gv, g in df.groupby(
            group_keys if len(group_keys) > 1 else group_keys[0], sort=True
        ):
            means = np.concatenate([np.asarray(m) for m in g["_qmeans"]])
            weights = np.concatenate(
                [np.asarray(w) for w in g["_qweights"]]
            )
            order = np.argsort(means, kind="stable")
            means, weights = means[order], weights[order]
            if len(means) > len(bounds):
                means, weights = _compress_sorted(means, weights, bounds)
            ests = _digest_quantiles(means, weights, quantiles)
            out_keys.append(gv)
            for i, e in enumerate(ests):
                out_qs[i].append(round(e, round_digits))
        if len(group_keys) > 1:
            frame = pd.DataFrame(out_keys, columns=group_keys)
        else:
            frame = pd.DataFrame({group_keys[0]: out_keys})
        for c, v in zip(qcols, out_qs):
            frame[c] = np.asarray(v, dtype=np.float64)
        return frame

    if final == "driver":
        return merge_frame(partials.to_pandas())
    ds2 = add_bucket_column(partials, group_keys[0], num_buckets)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return merge_frame(df.drop(columns=[BUCKET_COL]))

    return bucketed_map_groups(
        ds2, merge, num_buckets=num_buckets, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# count-min sketch point-frequency estimates

_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0xFF51AFD7ED558CCD,
     0xC4CEB9FE1A85EC53, 0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5 | 1],
    dtype=np.uint64,
)  # odd multiply-shift constants (splitmix64 / murmur3 finalizer mixers)


def _cms_rows(keys: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) row positions via multiply-shift over a stable uint64
    base hash — deterministic across batches, runs and engines."""
    h = keys[None, :] * _CMS_SEEDS[:depth, None]
    return ((h >> np.uint64(21)) % np.uint64(width)).astype(np.int64)


def cms_frequencies(
    ds: ray.data.Dataset,
    key_col: str,
    query_keys: Sequence,
    *,
    depth: int = 4,
    width: int = 2048,
) -> pd.DataFrame:
    """Point-frequency estimates for ``query_keys`` via a count-min sketch.

    The third mergeable sketch next to :func:`hll_distinct` (distincts) and
    :func:`grouped_quantiles_sketch` (quantiles): each block collapses to a
    fixed ``depth × width`` int64 counter matrix regardless of cardinality;
    merge is elementwise sum (associative — blocks × depth·width ints cross
    the wire, never rows) and ``est(k) = min_i C[i, h_i(k)]``. One-sided
    error: ``true <= est <= true + εN`` with ``ε ≈ e/width`` at probability
    ``1 - e^-depth`` — size ``width`` for the tail you care about. Unlike
    :func:`heavy_hitters` this answers ARBITRARY point queries after one
    pass, including keys chosen after the scan.

    Returns a small driver-side DataFrame (key_col, est:int64), rows in
    ``query_keys`` order. Deterministic for a fixed input regardless of
    blocking (the base hash is SipHash with a fixed key).
    """
    if depth > len(_CMS_SEEDS):
        raise ValueError(f"depth <= {len(_CMS_SEEDS)} supported")

    def partial(t: pa.Table) -> pa.Table:
        arr = t[key_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.drop_null()
        counts = np.zeros((depth, width), dtype=np.int64)
        if len(arr):
            # collapse to per-key counts first: one scatter per DISTINCT key
            vc = arr.value_counts()
            keys = stable_hash(vc.field("values"))
            cnt = vc.field("counts").to_numpy()
            rows = _cms_rows(keys, depth, width)
            for i in range(depth):  # depth is a small constant (<= 6)
                np.add.at(counts[i], rows[i], cnt)
        return pa.table({
            "slot": np.arange(depth * width, dtype=np.int64),
            "c": counts.ravel(),
        })

    merged = (
        ds.select_columns([key_col])
        .map_batches(partial, batch_size=None, batch_format="pyarrow",
                     zero_copy_batch=True)
        .to_pandas().groupby("slot")["c"].sum()
        .to_numpy().reshape(depth, width)
    )
    qarr = pa.array(list(query_keys))
    qrows = _cms_rows(stable_hash(qarr), depth, width)
    est = merged[np.arange(depth)[:, None], qrows].min(axis=0)
    return pd.DataFrame({key_col: list(query_keys),
                         "est": est.astype(np.int64)})


# ---------------------------------------------------------------------------
# decayed top-k: streaming heavy hitters under exponential time decay


def _decay_partial(
    t: pa.Table, key_col: str, ts_col: str, half_life_s: float,
    capacity: int,
) -> pd.DataFrame:
    """One batch -> anchored decayed-count counters (key, w, anchor).

    ``w`` is the key's decayed mass AT the partial's own anchor (its max
    event time): w = sum 2^((ts_i - anchor)/half_life). Anchoring every
    partial at its local max keeps each term in (0, 1] — no overflow no
    matter how far epoch time drifts — and makes merging associative:
    rescale every partial to the global max anchor and sum."""
    df = pd.DataFrame({
        "k": t[key_col].to_pandas(),
        "ts": t[ts_col].to_pandas(),
    }).dropna()
    if df.empty:
        return pd.DataFrame({
            "k": df["k"], "w": pd.Series([], dtype="float64"),
            "anchor": pd.Series([], dtype="float64"),
        })
    sec = df["ts"].to_numpy()
    if sec.dtype.kind == "M":
        sec = sec.astype("datetime64[us]").astype(np.int64) / 1e6
    else:
        sec = sec.astype(np.float64)
    anchor = float(sec.max())
    df["w"] = np.exp2((sec - anchor) / half_life_s)
    out = df.groupby("k", as_index=False, sort=False)["w"].sum()
    out = _mg_truncate(out.rename(columns={"w": "n"}), "k", capacity)
    out = out.rename(columns={"n": "w"})
    out["anchor"] = anchor
    return out


def _merge_decayed(
    parts: pd.DataFrame, half_life_s: float, capacity: int
) -> tuple[pd.DataFrame, float]:
    """Associative merge of anchored partials: rescale to the newest
    anchor, sum per key, re-truncate. Returns (counters, anchor)."""
    if parts.empty:
        return parts.assign(w=parts.get("w", pd.Series(dtype="float64"))), 0.0
    anchor = float(parts["anchor"].max())
    scaled = parts["w"].to_numpy() * np.exp2(
        (parts["anchor"].to_numpy() - anchor) / half_life_s)
    merged = (pd.DataFrame({"k": parts["k"], "n": scaled})
              .groupby("k", as_index=False, sort=False)["n"].sum())
    merged = _mg_truncate(merged, "k", capacity).rename(columns={"n": "w"})
    return merged, anchor


class DecayedTopKState:
    """Streaming decayed top-k: fold micro-batches with ``update`` and read
    the current ranking with ``topk(t_now)`` at any point. State is <=
    ``capacity`` (key, weight) counters + one anchor — fixed memory for an
    unbounded stream. Folding batch-by-batch equals one bulk merge
    (associativity is pinned by tests), so a long-lived consumer actor and
    the batch pipeline produce the same ranking."""

    def __init__(self, key_col: str, ts_col: str, *,
                 half_life_s: float, capacity: int = 4096):
        if half_life_s <= 0:
            raise ValueError(f"half_life_s must be > 0, got {half_life_s}")
        self.key_col, self.ts_col = key_col, ts_col
        self.half_life_s, self.capacity = float(half_life_s), int(capacity)
        self.counters = pd.DataFrame(
            {"k": pd.Series([], dtype="object"),
             "w": pd.Series([], dtype="float64")})
        self.anchor = -np.inf

    def update(self, t: pa.Table) -> None:
        part = _decay_partial(t, self.key_col, self.ts_col,
                              self.half_life_s, self.capacity)
        if part.empty:
            return
        cur = self.counters.assign(anchor=self.anchor) \
            if len(self.counters) else part.iloc[:0]
        self.counters, self.anchor = _merge_decayed(
            pd.concat([cur, part], ignore_index=True),
            self.half_life_s, self.capacity)

    def topk(self, k: int, t_now: float | None = None) -> pd.DataFrame:
        """Current ranking; scores are decayed to ``t_now`` (default: the
        anchor, i.e. the newest event seen)."""
        out = self.counters.copy()
        if t_now is not None and len(out):
            out["w"] *= np.exp2((self.anchor - float(t_now))
                                / self.half_life_s)
        return (out.sort_values(["w", "k"], ascending=[False, True],
                                kind="stable")
                .head(k).reset_index(drop=True))


def decayed_topk(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    *,
    k: int = 10,
    half_life_s: float = 86_400.0,
    t_ref: float | None = None,
    capacity: int = 4096,
    recount: bool = True,
    round_digits: int = 6,
) -> pd.DataFrame:
    """Top-``k`` keys by exponentially time-decayed count — the streaming
    trending-items primitive: score(key) = sum over its events of
    2^((ts_i - t_ref) / half_life_s), so an event loses half its weight
    per half-life and the ranking favors RECENT mass over raw counts.

    Same scale shape as :func:`heavy_hitters` (its undecayed special
    case): each batch collapses to <= ``capacity`` anchored counters —
    fixed memory regardless of key cardinality, nothing shuffles — and
    the driver merge rescales to the newest anchor before summing
    (order-independent; exact up to Misra-Gries truncation, whose error
    is <= total decayed mass / (capacity+1) in decayed units, pinned by
    tests). ``recount=True`` adds a second pass restoring EXACT decayed
    scores for the <= capacity surviving candidates, so the result
    matches the exact ranking whenever the true k-th score clears the
    truncation bound.

    ``t_ref`` fixes the reference time scores decay to (default: the max
    event time seen); pass it explicitly for reproducible scores.
    Returns a driver-side DataFrame (key_col, score:float64 rounded to
    ``round_digits``).
    """
    if half_life_s <= 0:
        raise ValueError(f"half_life_s must be > 0, got {half_life_s}")

    sel = ds.select_columns([key_col, ts_col])

    def partial(t: pa.Table) -> pa.Table:
        part = _decay_partial(t, key_col, ts_col, half_life_s, capacity)
        return pa.Table.from_pandas(part, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = sel.map_batches(
        partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True).to_pandas()
    merged, anchor = _merge_decayed(parts, half_life_s, capacity)
    if merged.empty:
        # all-empty input: Ray's to_pandas drops columns on zero-row
        # datasets, so build the typed empty result explicitly
        return pd.DataFrame({key_col: pd.Series([], dtype="object"),
                             "score": pd.Series([], dtype="float64")})

    if recount:
        cand = pa.Array.from_pandas(merged["k"])

        def recount_partial(t: pa.Table) -> pa.Table:
            m = pc.fill_null(pc.is_in(t[key_col], value_set=cand), False)
            return partial(t.filter(m))

        parts = sel.map_batches(
            recount_partial, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True).to_pandas()
        # no truncation on the recount: <= capacity candidate keys total
        merged, anchor = _merge_decayed(parts, half_life_s,
                                        capacity=len(parts) + 1)

    ref = anchor if t_ref is None else float(t_ref)
    merged["w"] *= np.exp2((anchor - ref) / half_life_s)
    merged["w"] = merged["w"].round(round_digits)
    out = (merged.sort_values(["w", "k"], ascending=[False, True],
                              kind="stable")
           .head(k).reset_index(drop=True))
    return out.rename(columns={"k": key_col, "w": "score"})
