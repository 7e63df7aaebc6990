"""Intra-entity time-chunk parallelism for the window+as-of suite.

THE hot-entity scaling fix. ``partition_hot_entities`` (stages/skew.py)
isolates a hot entity into its own partition, but a single entity holding
20% of the corpus still caps every wide window/as-of stage at the wall time
of ONE task — adding CPUs cannot help. This module splits a hot entity's
timeline into TIME CHUNKS and computes the full feature suite exactly:

- chunk assignment: ``c = (ts - tmin) * chunks / span`` with chunk span
  >= the rolling window ``w`` (so a window never reaches past the
  immediately preceding chunk);
- HALO replication: every row whose ts lies within ``w`` of the next chunk's
  start is also sent to that chunk (flagged, never emitted) — rolling
  windows over ``[t - w, t]`` are then EXACT inside one chunk;
- per-chunk SUMMARIES (first/last row, internal session-break count, last
  feature row) + a driver-side SCAN over the tiny summary table computes the
  carry-ins a chunk cannot see: the session-id offset, the boundary break,
  lag/lead values across the boundary, and the as-of carry feature;
- FINALIZE: map-only second pass over the repartitioned data applies the
  broadcast carry-ins. Rows move through the exchange exactly once.

Parallelism bound: span/w chunks per entity (e.g. 30 for a 30-day corpus
with a 24h window) — the fundamental limit for exact closed-form windows
without cross-chunk prefix machinery. Requires ``rolling_window >=
session_gap`` (asserted): an empty halo then implies the cross-boundary gap
exceeds the session gap.

Scale contract: summaries are one row per (hot entity, chunk) — at 10^12
rows with 10^6-row chunks that is ~10^6 tiny rows on the driver. Chunks must
stay well under the Dataset block size so the sort-shuffle fallback of
``repartition_by_bucket`` never splits one (direct exchange guarantees
whole buckets per block).
"""

from __future__ import annotations

from datetime import timedelta

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from featherstore_ray.exchange import (
    DIRECT_MAX_OBJECTS,
    _split_table,
    bucketed_map_groups,
    repartition_by_bucket,
)
from featherstore_ray.partition import BUCKET_COL, bucket_of

_HALO_COL = "_fsr_halo"


@ray.remote
def _summarize_parts(summary_kernel, num_buckets, bucket_col, halo_col, *parts):
    """Fused-exchange summary wave: compute per-chunk summaries straight
    from one reducer's split slices (filter hot non-halo rows per slice,
    concat the small remainder, one kernel call). The full concatenated
    partition never exists here — only in the finalize task."""
    outs = []
    for p in parts:
        if p.num_rows == 0:
            continue
        pid = p[bucket_col].to_numpy(zero_copy_only=False)
        halo = p[halo_col].to_numpy(zero_copy_only=False)
        mask = (pid >= num_buckets) & (halo == 0)
        if mask.any():
            outs.append(p.filter(pa.array(mask)))
    if not outs:
        return pa.table({})
    return summary_kernel(
        pa.concat_tables(outs, promote_options="default")
    )


@ray.remote(num_returns=2)
def _finalize_parts(kernel, *parts):
    """Fused-exchange finalize wave: concat one reducer's slices in task
    heap and apply the (carry-aware) finalize kernel directly — the
    repartitioned table is never written to the object store; only the
    suite OUTPUT is."""
    tables = [p for p in parts if p.num_rows]
    if not tables:
        return pa.table({}), 0
    t = pa.concat_tables(
        tables, promote_options="default"
    ).replace_schema_metadata(None)
    out = kernel(t)
    return out, out.num_rows


def _ts_us_arr(col) -> np.ndarray:
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "M":
        return arr.astype("datetime64[us]").astype(np.int64)
    return arr.astype(np.int64)


class _HotSpec:
    """Driver-built chunking plan for the hot entities (broadcast once)."""

    def __init__(self, entities, tmin, tmax, chunks, num_buckets):
        self.entities = np.asarray(entities)
        self.tmin = np.asarray(tmin, dtype=np.int64)
        self.tmax = np.asarray(tmax, dtype=np.int64)
        self.chunks = np.asarray(chunks, dtype=np.int64)
        self.base = num_buckets + np.concatenate(
            ([0], np.cumsum(self.chunks)[:-1])
        ).astype(np.int64)
        self.num_buckets = num_buckets
        self.total_partitions = int(num_buckets + self.chunks.sum())
        self.index = pd.Series(
            np.arange(len(self.entities)), index=self.entities
        )

    def entity_of_pid(self, pid: np.ndarray) -> np.ndarray:
        """pid (>= num_buckets) -> index into the hot-entity arrays."""
        return np.searchsorted(self.base, pid, side="right") - 1


def hot_entity_stats(
    ds: ray.data.Dataset,
    entity_col: str,
    ts_col: str,
    *,
    threshold: int,
    num_blocks: int,
) -> pd.DataFrame:
    """(entity, n, tmin_us, tmax_us) for entities with n > threshold.

    ONE map-only pass, no shuffle, driver holds only the heavy tail: each
    block reports stats for entities exceeding ``threshold / num_blocks``
    rows IN THAT BLOCK (by pigeonhole, every truly hot entity crosses the
    cut somewhere). Blocks where a hot entity stays under the cut are
    omitted, so n/tmin/tmax are slight under-estimates — which is SAFE: the
    chunk map clamps out-of-range timestamps to the edge chunks, halo
    assignment uses the same map, and detection misses are bounded cold
    stragglers (< 2x threshold rows), never wrong results.
    """
    cut = max(1, threshold // max(num_blocks, 1))
    empty = pd.DataFrame({entity_col: [], "n": [], "tmin": [], "tmax": []})

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out_empty = pa.table(
            {
                entity_col: t[entity_col].slice(0, 0),
                "n": pa.array([], pa.int64()),
                "tmin": pa.array([], pa.int64()),
                "tmax": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return out_empty
        vc = pc.value_counts(t[entity_col])
        heavy = vc.field("values").filter(
            pc.greater(vc.field("counts"), cut)
        )
        if len(heavy) == 0:
            return out_empty
        sub = t.filter(pc.is_in(t[entity_col], value_set=heavy))
        df = pd.DataFrame(
            {
                entity_col: sub[entity_col].to_numpy(zero_copy_only=False),
                "ts": _ts_us_arr(sub[ts_col]),
            }
        )
        g = df.groupby(entity_col, sort=False)["ts"]
        out = pd.DataFrame(
            {"n": g.size(), "tmin": g.min(), "tmax": g.max()}
        ).reset_index()
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    parts = ds.map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if parts.empty or entity_col not in parts.columns:
        return empty
    g = parts.groupby(entity_col, sort=True)
    out = pd.DataFrame(
        {
            "n": g["n"].sum(),
            "tmin": g["tmin"].min(),
            "tmax": g["tmax"].max(),
        }
    ).reset_index()
    return out[out["n"] > threshold]


def sample_entity_stats(
    ds: ray.data.Dataset,
    entity_col: str,
    ts_col: str,
    *,
    threshold: int,
    total: int,
    sample_rows: int = 400_000,
) -> pd.DataFrame:
    """Estimated (entity, n, tmin_us, tmax_us) for the heavy tail from a
    prefix sample — ONE partial execution instead of a full stats pass.

    Counts scale by total/sample; tmin/tmax are sample-side under-estimates.
    Both are SAFE approximations (see ``hot_entity_stats``): the chunk map
    clamps, halo uses the same map, and a missed borderline-hot entity is a
    bounded cold straggler, never a wrong result. Assumes entities are not
    systematically ordered in the input (true for hash-derived ingest
    layouts); pass ``stats_mode="exact"`` otherwise.
    """
    n_s = min(total, sample_rows)
    if n_s == 0:
        return pd.DataFrame({entity_col: [], "n": [], "tmin": [], "tmax": []})
    sample = (
        ds.select_columns([entity_col, ts_col]).limit(n_s).to_pandas()
    )
    factor = total / max(len(sample), 1)
    df = pd.DataFrame(
        {
            entity_col: sample[entity_col].to_numpy(),
            "ts": _ts_us_arr(pa.array(sample[ts_col])),
        }
    )
    g = df.groupby(entity_col, sort=True)["ts"]
    out = pd.DataFrame(
        {"n": g.size(), "tmin": g.min(), "tmax": g.max()}
    ).reset_index()
    out["n"] = (out["n"] * factor).astype(np.int64)
    return out[out["n"] > threshold]


def build_hot_spec(
    hot_stats: pd.DataFrame,  # (entity_col, n, tmin, tmax) for hot entities
    *,
    entity_col: str,
    window_us: int,
    target_chunk_rows: int,
    num_buckets: int,
) -> _HotSpec | None:
    if hot_stats.empty:
        return None
    merged = hot_stats.sort_values(entity_col)
    span = merged["tmax"].to_numpy() - merged["tmin"].to_numpy() + 1
    want = np.ceil(merged["n"].to_numpy() / target_chunk_rows).astype(np.int64)
    max_chunks = np.maximum(1, span // max(window_us, 1))
    chunks = np.clip(want, 1, max_chunks)
    return _HotSpec(
        merged[entity_col].to_numpy(),
        merged["tmin"].to_numpy(),
        merged["tmax"].to_numpy(),
        chunks,
        num_buckets,
    )


def assign_partitions(
    ds: ray.data.Dataset,
    spec: _HotSpec | None,
    *,
    entity_col: str,
    ts_col: str,
    num_buckets: int,
    window_us: int,
) -> ray.data.Dataset:
    """Add BUCKET_COL (+halo flag; halo rows are duplicated forward)."""
    assign = _make_assign(
        ray.put(spec), entity_col=entity_col, ts_col=ts_col,
        num_buckets=num_buckets, window_us=window_us,
    )
    return ds.map_batches(
        assign, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def _make_assign(
    spec_ref, *, entity_col: str, ts_col: str, num_buckets: int,
    window_us: int,
):
    """Per-table partition assignment (shared by the map stage and the
    fused assign+split wave)."""

    def assign(t: pa.Table) -> pa.Table:
        sp: _HotSpec | None = ray.get(spec_ref)
        n = t.num_rows
        halo0 = pa.array(np.zeros(n, dtype=np.int8))
        if sp is None or n == 0:
            pid = bucket_of(t[entity_col], num_buckets)
            return t.append_column(BUCKET_COL, pa.array(pid)).append_column(
                _HALO_COL, halo0
            )
        ent = t[entity_col].to_numpy(zero_copy_only=False)
        idx = sp.index.reindex(ent).to_numpy()
        is_hot = ~np.isnan(idx)
        pid = bucket_of(t[entity_col], num_buckets).astype(np.int64)
        out_tables = []
        if is_hot.any():
            hi = idx[is_hot].astype(np.int64)
            ts = _ts_us_arr(t[ts_col])[is_hot]
            tmin = sp.tmin[hi]
            span = sp.tmax[hi] - tmin + 1
            k = sp.chunks[hi]
            # clip BOTH ends: stats may under-estimate [tmin, tmax]
            c_self = np.clip((ts - tmin) * k // span, 0, k - 1)
            c_fwd = np.clip((ts - tmin + window_us) * k // span, 0, k - 1)
            pid[is_hot] = sp.base[hi] + c_self
            # forward halo copies (rolling-window context for the next chunk)
            halo_mask = c_fwd > c_self
            if halo_mask.any():
                rows = np.flatnonzero(is_hot)[halo_mask]
                dup = t.take(rows)
                dup_pid = (sp.base[hi] + c_fwd)[halo_mask]
                out_tables.append(
                    dup.append_column(
                        BUCKET_COL, pa.array(dup_pid.astype(np.int32))
                    ).append_column(
                        _HALO_COL,
                        pa.array(np.ones(len(rows), dtype=np.int8)),
                    )
                )
        base_t = t.append_column(
            BUCKET_COL, pa.array(pid.astype(np.int32))
        ).append_column(_HALO_COL, halo0)
        out_tables.insert(0, base_t)
        return pa.concat_tables(out_tables)

    return assign


@ray.remote
def _assign_split(t, assign, num_reducers: int, bucket_col: str):
    """Fused wave 1: assign partitions AND split by reducer in one task —
    the repartition input never round-trips the object store between the
    assign map and the split. ``_split_table`` is imported at MODULE level:
    a runtime import inside this task fails on workers whenever the
    driver's cwd is not the repo root (the foreign-cwd contract)."""
    return _split_table(assign(t), num_reducers, bucket_col)


def feature_suite_chunked(
    events: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    spine_type="purchase",
    feature_type="click",
    num_buckets: int = 64,
    rolling_window=timedelta(hours=24),
    session_gap=timedelta(minutes=30),
    hot_row_threshold: int | None = None,
    target_chunk_rows: int | None = None,
    total_rows: int | None = None,
    stats_mode: str = "sample",
) -> ray.data.Dataset:
    """feature_suite with hot entities time-chunked — identical output.

    Same semantics/oracle as ``pipelines.feature_suite.feature_suite``; the
    physical plan adds the chunking machinery from the module doc. Cold
    entities take the plain one-shuffle path inside the same exchange.
    """
    from featherstore_ray.stages.window import _window_us

    w_us = _window_us(rolling_window)
    gap_us = _window_us(session_gap)
    if gap_us > w_us:
        raise ValueError(
            "chunked suite requires rolling_window >= session_gap "
            "(empty halo must imply a session break)"
        )

    import os

    mode = os.environ.get("FSR_EXCHANGE", "direct")
    fused = os.environ.get("FSR_CHUNKED_FUSED", "1") == "1"
    if fused and mode == "direct":
        # single-read plan: one materialization of the SOURCE blocks feeds
        # the sample scan, the fused assign+split wave, and (on decline)
        # the fallback exchange — the assigned table never round-trips the
        # object store as its own dataset
        events = events.materialize()

    if total_rows is None:
        # count() is metadata-free only for pure reads; callers with lazy
        # map lineage should pass total_rows (e.g. from the source read)
        total_rows = events.count()
    total = total_rows
    if hot_row_threshold is None:
        # hot = bigger than an average bucket AND big in absolute terms: a
        # sub-250k-row straggler kernel is sub-second — cheaper than the
        # chunking machinery it would replace (below the floor the suite
        # falls through to the pure cold path)
        hot_row_threshold = max(250_000, total // max(num_buckets, 1))
    if target_chunk_rows is None:
        # chunks at half-bucket granularity so the slowest hot chunk is
        # strictly smaller than a typical cold bucket
        target_chunk_rows = max(25_000, total // (2 * max(num_buckets, 1)))
    if stats_mode == "exact":
        events = events.materialize()
        stats = hot_entity_stats(
            events, entity_col, ts_col,
            threshold=hot_row_threshold, num_blocks=events.num_blocks(),
        )
    else:
        stats = sample_entity_stats(
            events, entity_col, ts_col,
            threshold=hot_row_threshold, total=total,
        )
    spec = build_hot_spec(
        stats,
        entity_col=entity_col,
        window_us=w_us,
        target_chunk_rows=target_chunk_rows,
        num_buckets=num_buckets,
    )
    if spec is None:
        # nothing hot: the plain suite's single fused exchange beats the
        # repartition+finalize machinery
        from featherstore_ray.pipelines.feature_suite import feature_suite

        return feature_suite(
            events,
            entity_col=entity_col, ts_col=ts_col, value_col=value_col,
            type_col=type_col, tiebreak=tiebreak, spine_type=spine_type,
            feature_type=feature_type, num_buckets=num_buckets,
            rolling_window=rolling_window, session_gap=session_gap,
        )

    assign = _make_assign(
        ray.put(spec), entity_col=entity_col, ts_col=ts_col,
        num_buckets=num_buckets, window_us=w_us,
    )
    total_parts = spec.total_partitions if spec else num_buckets
    summary_kernel = (
        _make_summary_kernel(
            num_buckets=num_buckets, ts_col=ts_col, value_col=value_col,
            type_col=type_col, tiebreak=tiebreak, feature_type=feature_type,
            gap_us=gap_us,
        )
        if spec is not None
        else None
    )
    # fully-fused single-materialization plan: each SOURCE block is
    # assigned AND split by reducer in one task; a SUMMARY wave reads the
    # slices (tiny filtered concat), the driver scans carries, then a
    # FINALIZE wave concats the same slices in task heap and emits the
    # suite output directly — neither the assigned nor the repartitioned
    # intermediate table is ever written to the object store as a dataset
    # (two full store round-trips removed vs assign-map + repartition +
    # map). Slices are task outputs, so lineage reconstruction stays
    # intact.
    if fused and mode == "direct":
        block_refs = [
            ref
            for rb in events.iter_internal_ref_bundles()
            for ref in rb.block_refs
        ]
        m = len(block_refs)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        r = max(2, min(min(total_parts, max(2 * cpus, 8)), total_parts))
        if m and m * r <= DIRECT_MAX_OBJECTS:
            assign_ref = ray.put(assign)
            splits = [
                _assign_split.options(num_returns=r).remote(
                    b, assign_ref, r, BUCKET_COL
                )
                for b in block_refs
            ]
            sk_ref = ray.put(summary_kernel)
            sums = ray.get(
                [
                    _summarize_parts.remote(
                        sk_ref, num_buckets, BUCKET_COL, _HALO_COL,
                        *[s[j] for s in splits]
                    )
                    for j in range(r)
                ]
            )
            parts_sum = [s for s in sums if s.num_rows]
            summ = (
                pa.concat_tables(parts_sum, promote_options="default")
                if parts_sum
                else pa.table({})
            )
            carry_ref = ray.put(_scan_carries(summ, spec, gap_us=gap_us))
            kernel = _finalize_kernel(
                entity_col=entity_col, ts_col=ts_col, value_col=value_col,
                type_col=type_col, tiebreak=tiebreak, spine_type=spine_type,
                feature_type=feature_type, num_buckets=num_buckets,
                w_us=w_us, gap_us=gap_us, carry_ref=carry_ref,
                spec_ref=ray.put(spec),
            )
            k_ref = ray.put(kernel)
            out_refs, count_refs = [], []
            for j in range(r):
                t_ref, n_ref = _finalize_parts.remote(
                    k_ref, *[s[j] for s in splits]
                )
                out_refs.append(t_ref)
                count_refs.append(n_ref)
            counts = ray.get(count_refs)
            keep = [ref for ref, n in zip(out_refs, counts) if n > 0]
            if keep:
                return ray.data.from_arrow_refs(keep)
            # all-empty: fall through to the materializing path below

    # fallback (sort exchange / object-count cap): materializing
    # repartition with the summaries fused into the reduce wave
    assigned = events.map_batches(
        assign, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    part, summ = repartition_by_bucket(
        assigned, num_buckets=total_parts, summary_kernel=summary_kernel
    )
    carry_ref = ray.put(
        _scan_carries(summ, spec, gap_us=gap_us) if spec is not None else {}
    )
    spec_ref = ray.put(spec)

    kernel = _finalize_kernel(
        entity_col=entity_col, ts_col=ts_col, value_col=value_col,
        type_col=type_col, tiebreak=tiebreak, spine_type=spine_type,
        feature_type=feature_type, num_buckets=num_buckets,
        w_us=w_us, gap_us=gap_us, carry_ref=carry_ref, spec_ref=spec_ref,
    )
    return part.map_batches(
        kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def _make_summary_kernel(
    *,
    num_buckets: int,
    ts_col: str,
    value_col: str,
    type_col: str,
    tiebreak: str,
    feature_type,
    gap_us: int,
):
    """Per-chunk summary kernel (whole-bucket block -> small table); runs
    INSIDE the exchange's reduce wave (fused side output)."""
    nb = num_buckets

    def summarize(t: pa.Table) -> pa.Table:
        pid = t[BUCKET_COL].to_numpy(zero_copy_only=False)
        halo = t[_HALO_COL].to_numpy(zero_copy_only=False)
        mask = (pid >= nb) & (halo == 0)
        out = {
            "pid": [], "first_ts": [], "first_val": [], "last_ts": [],
            "last_val": [], "breaks": [], "feat_ts": [], "feat_val": [],
            "n": [],
        }
        if mask.any():
            sub = t.filter(pa.array(mask))
            df = pd.DataFrame(
                {
                    "pid": sub[BUCKET_COL].to_numpy(zero_copy_only=False),
                    "ts": _ts_us_arr(sub[ts_col]),
                    "val": sub[value_col].to_numpy(zero_copy_only=False),
                    "tb": sub[tiebreak].to_numpy(zero_copy_only=False),
                    "is_feat": (
                        sub[type_col].to_numpy(zero_copy_only=False)
                        == feature_type
                    ),
                }
            )
            df = df.sort_values(["pid", "ts", "tb"], kind="stable")
            for p, g in df.groupby("pid", sort=True):
                ts = g["ts"].to_numpy()
                out["pid"].append(int(p))
                out["first_ts"].append(ts[0])
                out["first_val"].append(g["val"].iloc[0])
                out["last_ts"].append(ts[-1])
                out["last_val"].append(g["val"].iloc[-1])
                out["breaks"].append(int((np.diff(ts) > gap_us).sum()))
                f = g[g["is_feat"]]
                out["feat_ts"].append(f["ts"].iloc[-1] if len(f) else np.nan)
                out["feat_val"].append(f["val"].iloc[-1] if len(f) else np.nan)
                out["n"].append(len(g))
        types = {
            "pid": pa.int64(), "first_ts": pa.int64(),
            "first_val": pa.float64(), "last_ts": pa.int64(),
            "last_val": pa.float64(), "breaks": pa.int64(),
            "feat_ts": pa.float64(), "feat_val": pa.float64(),
            "n": pa.int64(),
        }
        return pa.table({k: pa.array(v, types[k]) for k, v in out.items()})

    return summarize


def _scan_carries(summary: pa.Table, spec: _HotSpec, *, gap_us: int) -> dict:
    """Driver scan over the tiny per-chunk summary table → carry-ins:
    {pid: (boundary_break, session_offset, lag_val, lead_val,
    carry_feat_ts, carry_feat_val)} with NaN for absent carries."""
    if summary is None or summary.num_rows == 0:
        return {}
    summ = summary.to_pandas()
    summ = summ.sort_values("pid")
    summ["ent"] = spec.entity_of_pid(summ["pid"].to_numpy())
    carries: dict = {}
    for _, g in summ.groupby("ent", sort=True):
        prev_ts = prev_val = None
        feat_ts = feat_val = None
        offset = 0
        rows = list(g.itertuples())
        for i, r in enumerate(rows):
            boundary = int(
                prev_ts is not None and (r.first_ts - prev_ts) > gap_us
            )
            lead_val = rows[i + 1].first_val if i + 1 < len(rows) else np.nan
            carries[int(r.pid)] = (
                boundary,
                offset,
                prev_val if prev_val is not None else np.nan,
                lead_val,
                feat_ts if feat_ts is not None else np.nan,
                feat_val if feat_val is not None else np.nan,
            )
            offset += boundary + int(r.breaks)
            prev_ts, prev_val = r.last_ts, r.last_val
            if not np.isnan(r.feat_ts):
                feat_ts, feat_val = r.feat_ts, r.feat_val
    return carries


def _finalize_kernel(
    *, entity_col, ts_col, value_col, type_col, tiebreak, spine_type,
    feature_type, num_buckets, w_us, gap_us, carry_ref, spec_ref,
):
    """Per-block finalize: cold buckets run the plain suite kernel, hot
    chunks run the halo-aware chunk kernel with broadcast carry-ins."""
    from datetime import timedelta as _td

    from featherstore_ray.pipelines.feature_suite import (
        _window_kernel,
        make_suite_kernel_arrow,
    )

    wk = _window_kernel(
        entity_col, ts_col, value_col, tiebreak,
        rolling_window=_td(microseconds=w_us),
        session_gap=_td(microseconds=gap_us),
    )
    arrow_cold = make_suite_kernel_arrow(
        entity_col=entity_col, ts_col=ts_col, value_col=value_col,
        type_col=type_col, tiebreak=tiebreak, spine_type=spine_type,
        feature_type=feature_type, w_us=w_us, gap_us=gap_us,
    )
    out_val, out_ts = f"{value_col}_asof", f"{ts_col}_asof"

    def cold_kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = wk(df)
        is_spine = (df[type_col] == spine_type).to_numpy()
        is_feat = (df[type_col] == feature_type).to_numpy()
        sp = df.loc[is_spine]
        ft = df.loc[is_feat, [entity_col, ts_col, value_col, tiebreak]].rename(
            columns={value_col: out_val, ts_col: "_ft_ts"}
        )
        ft[out_ts] = ft["_ft_ts"]
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
            sp, ft, left_on=ts_col, right_on="_ft_ts", by=entity_col,
            direction="backward", allow_exact_matches=True,
        ).drop(columns=["_ft_ts"])

    def chunk_kernel(df: pd.DataFrame, carry) -> pd.DataFrame:
        boundary, offset, lag_in, lead_in, cf_ts, cf_val = carry
        df = df.sort_values([ts_col, tiebreak], kind="stable").reset_index(
            drop=True
        )
        n = len(df)
        halo = df[_HALO_COL].to_numpy() != 0
        n_halo = int(halo.sum())  # halo rows sort strictly before emitted
        ts = df[ts_col].to_numpy()
        ts = (
            ts.astype("datetime64[us]").astype(np.int64)
            if ts.dtype.kind == "M"
            else ts.astype(np.int64)
        )
        vals = df[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        # lag/lead over the full halo+chunk sequence
        lag = np.concatenate(([np.nan], vals[:-1]))
        lead = np.concatenate((vals[1:], [np.nan]))
        if n_halo == 0 and n > 0:
            lag[0] = lag_in
        if n > 0:
            lead[-1] = lead_in
        # rolling [t-w, t]: exact — the halo holds every in-window predecessor
        lo = np.searchsorted(ts, ts - w_us, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        valid = ~np.isnan(vals)
        csum = np.concatenate(([0.0], np.cumsum(np.where(valid, vals, 0.0))))
        ccnt = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
        rcnt = ccnt[hi] - ccnt[lo]
        rsum = np.where(rcnt == 0, np.nan, csum[hi] - csum[lo])
        # sessions: local breaks + broadcast boundary/offset
        brk = np.zeros(n, dtype=np.int64)
        if n > 1:
            brk[1:] = (ts[1:] - ts[:-1]) > gap_us
        if n_halo < n:
            brk[n_halo] = boundary
        session = offset + np.cumsum(brk) - brk[:n_halo].sum()
        df[f"{value_col}_lag1"] = lag
        df[f"{value_col}_lead1"] = lead
        df[f"{value_col}_rsum"] = np.round(rsum, 6)
        df[f"{value_col}_rmean"] = np.round(
            rsum / np.where(rcnt == 0, 1, rcnt), 6
        )
        df[f"{value_col}_rcount"] = rcnt
        df["session_id"] = session
        emit = df.loc[~halo]
        is_spine = (emit[type_col] == spine_type).to_numpy()
        is_feat = (df[type_col] == feature_type).to_numpy()  # halo included
        sp = emit.loc[is_spine]
        ft = df.loc[is_feat, [ts_col, value_col, tiebreak]].rename(
            columns={value_col: out_val, ts_col: "_ft_ts"}
        )
        ft[out_ts] = ft["_ft_ts"]
        ft = ft.sort_values(["_ft_ts", tiebreak], kind="stable").drop(
            columns=[tiebreak]
        )
        sp = sp.sort_values(ts_col, kind="stable")
        if len(sp) == 0:
            out = sp.copy()
            out[out_val] = pd.Series(dtype="float64")
            out[out_ts] = pd.Series(dtype=df[ts_col].dtype)
            return out
        if len(ft) == 0:
            out = sp.copy()
            out[out_val] = np.nan
            out[out_ts] = pd.Series(
                pd.NaT, index=out.index, dtype=df[ts_col].dtype
            )
        else:
            out = pd.merge_asof(
                sp, ft, left_on=ts_col, right_on="_ft_ts",
                direction="backward", allow_exact_matches=True,
            ).drop(columns=["_ft_ts"])
        # as-of carry: spine rows older than every local/halo feature.
        # Detect misses via the matched feature TIMESTAMP (NaT), not value
        # NaN — a spine row that matched a null-VALUED feature must keep
        # that feature's ts (mirrors chunk_kernel_arrow's int64.min key).
        if not np.isnan(cf_ts):
            miss = out[out_ts].isna().to_numpy()
            if miss.any():
                out.loc[miss, out_val] = cf_val
                out.loc[miss, out_ts] = pd.Timestamp(cf_ts, unit="us")
        return out

    def chunk_kernel_arrow(group: pa.Table, carry) -> pa.Table:
        """Arrow-native single-chunk kernel (the hot path) — mirrors
        chunk_kernel exactly but with one lexsort + searchsorted as-of
        instead of pandas sorts and merge_asof."""
        boundary, offset, lag_in, lead_in, cf_ts, cf_val = carry
        keep = [c for c in group.column_names
                if c not in (BUCKET_COL, _HALO_COL)]
        n = group.num_rows
        ts = group[ts_col].to_numpy(zero_copy_only=False)
        ts = (
            ts.astype("datetime64[us]").astype(np.int64)
            if ts.dtype.kind == "M"
            else ts.astype(np.int64)
        )
        tb = group[tiebreak].to_numpy(zero_copy_only=False)
        if tb.dtype.kind not in "iufM":
            raise TypeError("numeric tiebreak required")
        halo_raw = group[_HALO_COL].to_numpy(zero_copy_only=False)
        vc = group[value_col].cast(pa.float64())
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        vals_raw = np.asarray(vc.to_pandas(), dtype=np.float64)
        order = np.lexsort((tb, ts))
        ts_s, vals, halo = ts[order], vals_raw[order], halo_raw[order] != 0
        n_halo = int(halo.sum())  # halo sorts strictly before emitted
        lag = np.concatenate(([np.nan], vals[:-1]))
        lead = np.concatenate((vals[1:], [np.nan]))
        if n_halo == 0 and n > 0:
            lag[0] = lag_in
        if n > 0:
            lead[-1] = lead_in
        lo = np.searchsorted(ts_s, ts_s - w_us, side="left")
        hi = np.searchsorted(ts_s, ts_s, side="right")
        valid = ~np.isnan(vals)
        csum = np.concatenate(([0.0], np.cumsum(np.where(valid, vals, 0.0))))
        ccnt = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
        rcnt = ccnt[hi] - ccnt[lo]
        rsum = np.where(rcnt == 0, np.nan, csum[hi] - csum[lo])
        brk = np.zeros(n, dtype=np.int64)
        if n > 1:
            brk[1:] = (ts_s[1:] - ts_s[:-1]) > gap_us
        if n_halo < n:
            brk[n_halo] = boundary
        session = offset + np.cumsum(brk) - brk[:n_halo].sum()
        typ = group[type_col].to_numpy(zero_copy_only=False)[order]
        is_sp = (typ == spine_type) & ~halo
        is_ft = typ == feature_type  # halo included (as-of context)
        sp_pos = np.flatnonzero(is_sp)
        ft_pos = np.flatnonzero(is_ft)
        a_val = np.full(len(sp_pos), np.nan)
        a_ts = np.full(len(sp_pos), np.iinfo(np.int64).min, dtype=np.int64)
        if len(ft_pos) and len(sp_pos):
            p = np.searchsorted(ts_s[ft_pos], ts_s[sp_pos], "right") - 1
            ok = p >= 0
            cand = ft_pos[p[ok]]
            a_val[ok] = vals[cand]
            a_ts[ok] = ts_s[cand]
        if not np.isnan(cf_ts):
            miss = a_ts == np.iinfo(np.int64).min
            a_val[miss] = cf_val
            a_ts[miss] = np.int64(cf_ts)
        out = group.select(keep).take(order[sp_pos])
        sel = sp_pos
        out = out.append_column(f"{value_col}_lag1", pa.array(lag[sel]))
        out = out.append_column(f"{value_col}_lead1", pa.array(lead[sel]))
        out = out.append_column(
            f"{value_col}_rsum", pa.array(np.round(rsum, 6)[sel])
        )
        out = out.append_column(
            f"{value_col}_rmean",
            pa.array(np.round(rsum / np.where(rcnt == 0, 1, rcnt), 6)[sel]),
        )
        out = out.append_column(f"{value_col}_rcount", pa.array(rcnt[sel]))
        out = out.append_column("session_id", pa.array(session[sel]))
        out = out.append_column(out_val, pa.array(a_val))
        missing = a_ts == np.iinfo(np.int64).min
        dt = a_ts.astype("datetime64[us]")
        dt[missing] = np.datetime64("NaT")
        out = out.append_column(out_ts, pa.array(dt))
        return out

    def finalize(t: pa.Table) -> pa.Table:
        carries = ray.get(carry_ref)
        # one canonical column order for every block (cold and hot kernels
        # append feature columns at different points)
        expected = [
            c for c in t.column_names if c not in (BUCKET_COL, _HALO_COL)
        ] + [
            f"{value_col}_lag1", f"{value_col}_lead1", f"{value_col}_rsum",
            f"{value_col}_rmean", f"{value_col}_rcount", "session_id",
            out_val, out_ts,
        ]
        pid = t[BUCKET_COL].to_numpy(zero_copy_only=False)
        order = np.argsort(pid, kind="stable")
        t2 = t.take(order)
        ps = pid[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ps[1:] != ps[:-1]))
        )
        bounds = np.append(starts, len(ps))
        outs = []
        for g0, g1 in zip(bounds[:-1], bounds[1:]):
            p = int(ps[g0])
            group = t2.slice(g0, g1 - g0)
            if p < num_buckets:
                try:
                    # Arrow-native cold kernel: no pandas round trip
                    res_t = arrow_cold(group).select(expected)
                except TypeError:
                    res_t = None
                if res_t is None:
                    df = group.to_pandas().drop(
                        columns=[BUCKET_COL, _HALO_COL]
                    )
                    res = cold_kernel(df)
                    res_t = pa.Table.from_pandas(
                        res[expected], preserve_index=False
                    )
            else:
                carry = carries.get(p, (0, 0, np.nan, np.nan, np.nan, np.nan))
                try:
                    res_t = chunk_kernel_arrow(group, carry).select(expected)
                except TypeError:
                    df = group.to_pandas().drop(columns=[BUCKET_COL])
                    res = chunk_kernel(df, carry)
                    res = res.drop(columns=[_HALO_COL])
                    res_t = pa.Table.from_pandas(
                        res[expected], preserve_index=False
                    )
            if res_t.num_rows:
                outs.append(res_t.replace_schema_metadata(None))
        if not outs:
            return pa.table({})
        # the arrow and pandas kernels can disagree on dictionary index
        # widths (int32 vs int8); cast everything to the first schema
        target = outs[0].schema
        outs = [o if o.schema.equals(target) else o.cast(target) for o in outs]
        return pa.concat_tables(outs)

    return finalize


def rolling_window_chunked(
    events: ray.data.Dataset,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    aggs=("sum", "mean", "count"),
    rolling_window=timedelta(hours=24),
    num_buckets: int = 64,
    hot_row_threshold: int | None = None,
    target_chunk_rows: int | None = None,
    total_rows: int | None = None,
    stats_mode: str = "sample",
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Standalone RANGE-frame rolling aggregate with hot entities
    time-chunked — same halo machinery as ``feature_suite_chunked``, but
    rolling ``[t - w, t]`` needs NO cross-chunk carries at all: the halo
    already holds every in-window predecessor, so there is no summary pass
    and no carry scan. One exchange, map-only finalize, identical output to
    ``stages.window.rolling_aggregate`` (same kernel, same oracle).
    """
    from featherstore_ray.stages.window import _window_us, make_rolling_kernel

    w_us = _window_us(rolling_window)
    if total_rows is None:
        total_rows = events.count()
    total = total_rows
    if hot_row_threshold is None:
        hot_row_threshold = max(250_000, total // max(num_buckets, 1))
    if target_chunk_rows is None:
        target_chunk_rows = max(25_000, total // (2 * max(num_buckets, 1)))
    if stats_mode == "exact":
        events = events.materialize()
        stats = hot_entity_stats(
            events, entity_col, ts_col,
            threshold=hot_row_threshold, num_blocks=events.num_blocks(),
        )
    else:
        stats = sample_entity_stats(
            events, entity_col, ts_col,
            threshold=hot_row_threshold, total=total,
        )
    spec = build_hot_spec(
        stats,
        entity_col=entity_col,
        window_us=w_us,
        target_chunk_rows=target_chunk_rows,
        num_buckets=num_buckets,
    )
    kernel = make_rolling_kernel(
        entity_col, ts_col, value_col, tiebreak,
        w_us=w_us, aggs=aggs, round_digits=round_digits,
    )
    if spec is None:
        from featherstore_ray.exchange import bucketed_map_groups as bmg
        from featherstore_ray.partition import add_bucket_column

        def plain(df: pd.DataFrame) -> pd.DataFrame:
            return kernel(df.drop(columns=[BUCKET_COL]))

        ds = add_bucket_column(events, entity_col, num_buckets)
        return bmg(ds, plain, num_buckets=num_buckets, batch_format="pandas")

    assigned = assign_partitions(
        events, spec,
        entity_col=entity_col, ts_col=ts_col,
        num_buckets=num_buckets, window_us=w_us,
    )
    part, _ = repartition_by_bucket(
        assigned, num_buckets=spec.total_partitions
    )

    def finalize(t: pa.Table) -> pa.Table:
        pid = t[BUCKET_COL].to_numpy(zero_copy_only=False)
        order = np.argsort(pid, kind="stable")
        t2 = t.take(order)
        ps = pid[order]
        starts = np.flatnonzero(np.concatenate(([True], ps[1:] != ps[:-1])))
        bounds = np.append(starts, len(ps))
        outs = []
        for g0, g1 in zip(bounds[:-1], bounds[1:]):
            group = t2.slice(g0, g1 - g0)
            df = group.to_pandas().drop(columns=[BUCKET_COL])
            halo = df.pop(_HALO_COL).to_numpy() != 0
            res = kernel(df.assign(**{_HALO_COL: halo}))
            res = res.loc[~res[_HALO_COL].to_numpy()].drop(
                columns=[_HALO_COL]
            )
            if len(res):
                outs.append(
                    pa.Table.from_pandas(
                        res, preserve_index=False
                    ).replace_schema_metadata(None)
                )
        if not outs:
            return pa.table({})
        target = outs[0].schema
        outs = [o if o.schema.equals(target) else o.cast(target) for o in outs]
        return pa.concat_tables(outs)

    return part.map_batches(
        finalize, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
