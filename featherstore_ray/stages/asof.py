"""Point-in-time (as-of) join — zero temporal leakage by construction.

North-star generalization of the reference's latest-per-entity lookup
(pkg/storage/duckdb/duckdb.go:608-625 is the degenerate case "as-of now";
history ordering at duckdb.go:688): for every (entity, query_ts) spine row,
attach the feature row with the greatest event_ts <= query_ts for that
entity. A spine row never reads an event with event_ts > query_ts.

Tie-break (documented, deterministic): among feature rows with equal
event_ts, the row with the greatest ``tiebreak`` column wins. The reference's
ROW_NUMBER ties are nondeterministic (SURVEY.md §7 hard parts) — ours are not.

Two physical strategies:

- ``asof_join`` (both sides large): co-partition spine and features on
  ``hash(entity) % B`` via a tagged union + ONE groupby shuffle, then a
  vectorized ``pd.merge_asof`` per bucket. All rows of an entity land in the
  same bucket, which is the zero-leakage partitioning contract.
- ``asof_join_broadcast`` (small feature side): build per-entity sorted
  timestamp indexes once, ``ray.put`` them, and serve lookups from an actor
  pool (``map_batches(cls, concurrency=N)``) — reference ST4. No shuffle at
  all; the spine streams.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from featherstore_ray.partition import BUCKET_COL, add_bucket_column
from featherstore_ray.exchange import bucketed_map_groups

_SIDE_COL = "_fsr_side"
_TS_COL = "_fsr_ts"


def _null_column(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, type=typ)


def asof_join(
    spine: ray.data.Dataset,
    features: ray.data.Dataset,
    *,
    entity_col: str,
    spine_ts: str,
    feature_ts: str,
    feature_cols: Sequence[str],
    suffix: str = "_asof",
    tiebreak: str | None = None,
    tolerance=None,
    num_buckets: int = 64,
    direction: str = "backward",
) -> ray.data.Dataset:
    """Left as-of join: spine row + latest feature row with event_ts <= query_ts
    (``direction="backward"``, the default point-in-time semantics) or the
    EARLIEST feature row with event_ts >= query_ts (``direction="forward"``
    — next-event attribution, e.g. "first purchase after the impression").

    Output = all spine columns, plus ``{c}{suffix}`` for each feature payload
    column and ``{feature_ts}{suffix}`` (the matched event time; null when the
    entity has no feature row at/before — respectively at/after — query_ts).

    Tie-break is the same in both directions: among feature rows with the
    matched event_ts, the MAX ``tiebreak`` row wins.

    Oracle (backward): DuckDB ``ASOF LEFT JOIN ... ON s.entity = f.entity
    AND s.query_ts >= f.event_ts``; (forward): LATERAL
    ``ORDER BY f.ts ASC, tiebreak DESC LIMIT 1`` over ``f.ts >= s.ts``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction {direction!r}")
    feature_payload = [c for c in feature_cols if c != feature_ts]
    out_ts = f"{feature_ts}{suffix}"

    spine_schema = pa.schema(spine.schema().base_schema)
    feat_schema = pa.schema(features.schema().base_schema)
    spine_cols = [c for c in spine_schema.names]
    ts_type = spine_schema.field(spine_ts).type

    # Unified schema: entity, _fsr_ts, _fsr_side, spine payload,
    # feature payload (suffixed), matched-ts payload, optional tiebreak.
    spine_payload = [c for c in spine_cols if c not in (entity_col, spine_ts)]
    renamed = {c: f"{c}{suffix}" for c in feature_payload}

    def tag_spine(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {entity_col: t[entity_col], _TS_COL: t[spine_ts].cast(ts_type)}
        for c in spine_payload:
            cols[c] = t[c]
        for c in feature_payload:
            cols[renamed[c]] = _null_column(n, feat_schema.field(c).type)
        cols[out_ts] = _null_column(n, ts_type)
        if tiebreak:
            cols["_fsr_tb"] = _null_column(n, feat_schema.field(tiebreak).type)
        cols[_SIDE_COL] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    def tag_feature(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {entity_col: t[entity_col], _TS_COL: t[feature_ts].cast(ts_type)}
        for c in spine_payload:
            cols[c] = _null_column(n, spine_schema.field(c).type)
        for c in feature_payload:
            cols[renamed[c]] = t[c]
        cols[out_ts] = t[feature_ts].cast(ts_type)
        if tiebreak:
            cols["_fsr_tb"] = t[tiebreak]
        cols[_SIDE_COL] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    tagged = spine.map_batches(tag_spine, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        features.map_batches(tag_feature, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)
    )
    tagged = add_bucket_column(tagged, entity_col, num_buckets)

    feat_out_cols = [renamed[c] for c in feature_payload] + [out_ts]

    # Explicit output schema: spine columns keep their original Arrow types
    # (the null-padded union would otherwise coerce int64 -> float64 when a
    # pandas kernel sees spine columns null-padded on feature rows); feature
    # payload comes back as its original type made nullable-by-content.
    out_schema = pa.schema(
        [pa.field(entity_col, spine_schema.field(entity_col).type),
         pa.field(spine_ts, ts_type)]
        + [pa.field(c, spine_schema.field(c).type) for c in spine_payload]
        + [pa.field(renamed[c], feat_schema.field(c).type) for c in feature_payload]
        + [pa.field(out_ts, ts_type)]
    )

    def bucket_kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Split sides while still Arrow so spine columns never carry the
        # feature rows' null padding into pandas (dtype preservation).
        is_spine = pc.equal(t[_SIDE_COL], 1)
        sp = t.filter(is_spine).select(
            [entity_col, _TS_COL] + spine_payload
        ).to_pandas()
        ft_cols = [entity_col, _TS_COL] + feat_out_cols + (
            ["_fsr_tb"] if tiebreak else []
        )
        ft = t.filter(pc.invert(is_spine)).select(ft_cols).to_pandas()
        if len(sp) == 0:
            return out_schema.empty_table()
        # merge_asof requires a global sort on the `on` column; the stable
        # tiebreak secondary makes max-tiebreak win in BOTH directions:
        # backward picks the LAST row <= key (tiebreak ascending), forward
        # picks the FIRST row >= key (tiebreak descending).
        ft_sort = [_TS_COL] + (["_fsr_tb"] if tiebreak else [])
        ft_asc = [True] + (
            [direction == "backward"] if tiebreak else []
        )
        ft = ft.sort_values(ft_sort, ascending=ft_asc, kind="stable")
        if tiebreak:
            ft = ft.drop(columns=["_fsr_tb"])
        sp = sp.sort_values(_TS_COL, kind="stable")
        if len(ft) == 0:
            out = sp.copy()
            for c in feat_out_cols:
                out[c] = np.nan
            out[out_ts] = pd.Series(
                pd.NaT, index=out.index, dtype="datetime64[us]"
            )
        else:
            out = pd.merge_asof(
                sp,
                ft,
                on=_TS_COL,
                by=entity_col,
                direction=direction,
                allow_exact_matches=True,
                tolerance=tolerance,
            )
        out = out.rename(columns={_TS_COL: spine_ts})
        # from_pandas + explicit schema restores original dtypes: float64 NaN
        # on unmatched feature payload becomes a null of the original type.
        # Strip the pandas schema metadata: Ray's schema-dedup hash chokes on
        # it ("Failed to hash the schemas" log spam) and we don't need it.
        res = pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)
        return res.replace_schema_metadata(None)

    out = bucketed_map_groups(tagged, bucket_kernel, num_buckets=num_buckets, batch_format="pyarrow")
    return out


class AsOfLookup:
    """Actor-pool as-of lookup against a broadcast per-entity index (ST4).

    ``__init__`` runs once per actor: fetch the broadcast index (one
    ``ray.get`` on a driver-side ``ray.put`` ref — zero-copy from the local
    object store on every node). ``__call__`` answers a spine batch with one
    vectorized ``np.searchsorted`` per distinct entity in the batch, then
    ONE gather per payload column over the global match positions — payload
    columns keep their NATIVE dtype (ints arrive as pandas nullable Int64,
    strings as object-with-None, floats as float64-with-NaN).
    """

    def __init__(self, index_ref, *, entity_col, spine_ts, out_ts, payload_map):
        self.index = ray.get(index_ref)
        self.entity_col = entity_col
        self.spine_ts = spine_ts
        self.out_ts = out_ts
        self.payload_map = payload_map  # {raw feature col: output col}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        ent = batch[self.entity_col].to_numpy()
        ts = batch[self.spine_ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        idx = self.index
        ets = idx["ts"]
        if len(ets) == 0:  # empty feature side: all misses, typed nulls
            res = batch.copy()
            for _raw, out_col in self.payload_map.items():
                res[out_col] = np.full(n, np.nan)
            res[self.out_ts] = pd.Series(
                pd.NaT, index=res.index, dtype="datetime64[us]"
            )
            return res
        gpos = np.full(n, -1, dtype=np.int64)  # global match position
        order = np.argsort(ent, kind="stable")
        sorted_ent = ent[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], sorted_ent[1:] != sorted_ent[:-1]))
        )
        bounds = np.append(bounds, n)
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            rows = order[b0:b1]
            span = idx["entities"].get(sorted_ent[b0])
            if span is None:
                continue
            e0, e1 = span
            pos = np.searchsorted(ets[e0:e1], ts[rows], side="right") - 1
            hit = pos >= 0
            gpos[rows[hit]] = e0 + pos[hit]
        miss = gpos < 0
        take = np.maximum(gpos, 0)
        res = batch.copy()
        for raw, out_col in self.payload_map.items():
            vals = idx["payload"][raw][take]
            null = miss.copy()
            vmask = idx["valid"][raw]
            if vmask is not None:
                null |= ~vmask[take]
            k = vals.dtype.kind
            if k == "f":
                vals = vals.copy()
                vals[null] = np.nan
                res[out_col] = vals
            elif k in "iu":
                res[out_col] = pd.arrays.IntegerArray(
                    vals.astype(np.int64), mask=null
                )
            elif k == "b":
                res[out_col] = pd.arrays.BooleanArray(vals, mask=null)
            elif k == "M":
                vals = vals.copy()
                vals[null] = np.datetime64("NaT")
                res[out_col] = vals
            else:  # object/string
                vals = vals.astype(object, copy=True)
                vals[null] = None
                res[out_col] = vals
        mts = ets[take].astype("float64")
        mts[miss] = np.nan
        res[self.out_ts] = pd.to_datetime(
            pd.Series(mts, index=res.index), unit="us", errors="coerce"
        )
        return res


def build_asof_index(
    features: pa.Table,
    *,
    entity_col: str,
    feature_ts: str,
    feature_cols: Sequence[str],
    tiebreak: str | None = None,
) -> dict:
    """Broadcast as-of index: globally (entity, ts)-sorted flat arrays plus
    per-entity slice spans — ``{"ts": int64[], "payload": {col: ndarray},
    "valid": {col: bool[] | None}, "entities": {entity: (start, end)}}``.

    Payload columns keep their NATIVE dtype; nulls are carried in a
    separate validity mask (None when the column has no nulls) instead of
    the old float64-with-NaN coercion. Deterministic: stable sort by
    (entity, ts[, tiebreak]); on equal ts the max-tiebreak row is last, and
    searchsorted(side="right")-1 picks it.
    """
    df = features.select(
        [entity_col, feature_ts]
        + [c for c in feature_cols if c != feature_ts]
        + ([tiebreak] if tiebreak and tiebreak not in feature_cols else [])
    ).to_pandas()
    by = [entity_col, feature_ts] + ([tiebreak] if tiebreak else [])
    df = df.sort_values(by, kind="stable")
    ent = df[entity_col].to_numpy()
    ts = df[feature_ts].to_numpy().astype("datetime64[us]").astype(np.int64)
    payload_cols = [c for c in feature_cols if c != feature_ts]
    payloads: dict = {}
    valids: dict = {}
    for c in payload_cols:
        s = df[c]
        isna = s.isna().to_numpy()
        has_null = bool(isna.any())
        valids[c] = ~isna if has_null else None
        kind = s.dtype.kind
        if kind in "iu" and not has_null:
            payloads[c] = s.to_numpy()
        elif kind in "iufb" or str(s.dtype) in ("Int64", "Float64", "boolean"):
            if kind == "f" or str(s.dtype) == "Float64":
                payloads[c] = s.to_numpy(dtype=np.float64, na_value=np.nan)
            elif kind == "b" or str(s.dtype) == "boolean":
                payloads[c] = s.fillna(False).to_numpy(dtype=bool)
            else:  # nullable integer
                payloads[c] = s.fillna(0).to_numpy(dtype=np.int64)
        elif kind == "M":
            arr = s.to_numpy().astype("datetime64[us]")
            payloads[c] = arr
        else:
            payloads[c] = s.to_numpy(dtype=object, na_value=None)
    entities: dict = {}
    if len(df):
        bounds = np.flatnonzero(
            np.concatenate(([True], ent[1:] != ent[:-1]))
        )
        bounds = np.append(bounds, len(df))
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            entities[ent[b0]] = (int(b0), int(b1))
    return {
        "ts": ts, "payload": payloads, "valid": valids, "entities": entities
    }


def asof_join_broadcast(
    spine: ray.data.Dataset,
    features: pa.Table,
    *,
    entity_col: str,
    spine_ts: str,
    feature_ts: str,
    feature_cols: Sequence[str],
    suffix: str = "_asof",
    tiebreak: str | None = None,
    concurrency=(1, 8),
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """As-of join with a broadcast (small, numeric-payload) feature side.

    ``ray.put`` the index ONCE; every actor reads it zero-copy. Use when the
    feature side fits comfortably in the object store (e.g. <= a few GB);
    otherwise use ``asof_join``. Payload columns keep their native dtype
    (ints → nullable Int64, strings → string-with-null, floats → float64).
    """
    index = build_asof_index(
        features,
        entity_col=entity_col,
        feature_ts=feature_ts,
        feature_cols=feature_cols,
        tiebreak=tiebreak,
    )
    index_ref = ray.put(index)
    payload_map = {c: f"{c}{suffix}" for c in feature_cols if c != feature_ts}
    return spine.map_batches(AsOfLookup, batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(
            index_ref=index_ref,
            entity_col=entity_col,
            spine_ts=spine_ts,
            out_ts=f"{feature_ts}{suffix}",
            payload_map=payload_map,
        ),
    )


def linear_attribution(
    conversions: ray.data.Dataset,
    touches: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    conv_id: str,
    touch_id: str,
    window,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Multi-touch linear attribution — the as-of join's one-to-many
    generalization: every conversion splits credit equally over the
    entity's touch events in the trailing RANGE window
    ``[conv_ts − window, conv_ts]`` (closed both ends, including equal-ts
    touches — the engine's rolling-window convention; last-touch
    attribution is exactly :func:`asof_join`). Conversions with no touch
    in window emit nothing (inner semantics). Output: one row per
    (conversion, touch) with ``weight = 1/n`` rounded.

    Scale shape: tagged union co-partitioned on ``hash(entity)`` — ONE
    exchange; the per-bucket kernel sorts touches once and range-probes
    each conversion with two ``searchsorted`` calls (the band_join
    expansion), so cost is O((n+m) log(n+m)) + output. Sides split in
    Arrow BEFORE pandas (typed-null padding contract).
    """
    import datetime

    if isinstance(window, datetime.timedelta):
        window_us = int(window.total_seconds() * 1_000_000)
    else:
        window_us = int(window)

    c_schema = pa.schema(conversions.schema().base_schema)
    t_schema = pa.schema(touches.schema().base_schema)
    side = _SIDE_COL

    def tag(is_conv: bool, id_field: str, other_field: str, other_type):
        def f(t: pa.Table) -> pa.Table:
            cols = {
                entity_col: t[entity_col],
                ts_col: t[ts_col],
                conv_id if is_conv else touch_id: t[id_field],
                other_field: pa.nulls(t.num_rows, other_type),
                side: pa.array(
                    np.full(t.num_rows, int(is_conv), dtype=np.int8)),
            }
            return pa.table(cols)

        return f

    tagged = conversions.map_batches(
        tag(True, conv_id, touch_id, t_schema.field(touch_id).type),
        batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
    ).union(touches.map_batches(
        tag(False, touch_id, conv_id, c_schema.field(conv_id).type),
        batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
    ))
    tagged = add_bucket_column(tagged, entity_col, num_buckets=64)

    out_schema = pa.schema([
        c_schema.field(conv_id),
        t_schema.field(touch_id),
        c_schema.field(entity_col),
        pa.field("weight", pa.float64()),
    ])

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_c = pc.equal(t[side], pa.scalar(1, pa.int8()))
        ct = t.filter(is_c)
        tt = t.filter(pc.invert(is_c))
        if ct.num_rows == 0 or tt.num_rows == 0:
            return out_schema.empty_table()

        def key(tab):
            ent = tab[entity_col].to_numpy(zero_copy_only=False)
            ts = tab[ts_col].to_numpy(zero_copy_only=False).astype(
                "datetime64[us]").astype(np.int64)
            return ent, ts

        c_ent, c_ts = key(ct)
        t_ent, t_ts = key(tt)
        # entity-offset composite keys (the _group_offset_ts trick): ONE
        # global searchsorted over code*span + (ts − t0) replaces per-
        # entity slicing; t0/span are chosen so every probe stays inside
        # its own entity's key segment with no clamping
        _, codes = np.unique(np.concatenate([c_ent, t_ent]),
                             return_inverse=True)
        c_code, t_code = codes[: len(c_ent)], codes[len(c_ent):]
        t0 = min(int(t_ts.min()), int(c_ts.min()) - window_us)
        span = max(int(t_ts.max()), int(c_ts.max())) - t0 + 2
        max_code = int(codes.max())
        if (max_code + 1) * span > np.iinfo(np.int64).max:
            raise ValueError(
                "linear_attribution: entity-offset key overflow "
                f"(codes={max_code + 1}, span={span}); shrink the bucket"
            )
        t_key = t_code * span + (t_ts - t0)
        order = np.argsort(t_key, kind="stable")
        tk_s = t_key[order]
        base = c_code * span
        lo = np.searchsorted(tk_s, base + (c_ts - window_us - t0),
                             side="left")
        hi = np.searchsorted(tk_s, base + (c_ts - t0), side="right")
        counts = hi - lo
        ci = np.repeat(np.arange(len(c_ts)), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        ti_sorted = (np.arange(int(counts.sum()))
                     - np.repeat(starts, counts) + np.repeat(lo, counts))
        ti = order[ti_sorted]
        w = np.round(1.0 / np.repeat(counts, counts), round_digits)
        cols = {
            conv_id: ct[conv_id].take(ci),
            touch_id: tt[touch_id].take(ti),
            entity_col: ct[entity_col].take(ci),
            "weight": pa.array(w),
        }
        return pa.table(cols).cast(out_schema)

    return bucketed_map_groups(
        tagged, kernel, num_buckets=64, batch_format="pyarrow"
    )


def asof_lastn(
    spine: ray.data.Dataset,
    features: ray.data.Dataset,
    *,
    entity_col: str,
    spine_ts: str,
    feature_ts: str,
    value_col: str,
    n: int = 3,
    tiebreak: str | None = None,
    spine_cols: Sequence[str] | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Last-N point-in-time gather — the as-of join widened from "the
    latest prior feature row" to "the latest N": every spine row gets
    columns ``v1..vN`` holding the value of the 1st..Nth most recent
    feature row with ``feature_ts <= spine_ts`` for its entity (ordered
    ``ts DESC, tiebreak DESC`` — the engine's as-of tie convention),
    NULL-padded when fewer exist. The standard "last 3 purchases"
    feature block, with the same zero-leakage guarantee as
    :func:`asof_join`.

    One tagged-union entity exchange; the kernel finds each spine row's
    last qualifying feature with a single entity-offset composite
    ``searchsorted`` (equal-ts peers included by the right-side probe)
    and gathers the N-walk backward fully vectorized — no LATERAL-style
    per-row scan.
    """
    spine_cols = list(spine_cols) if spine_cols else [
        c for c in spine.schema().names]
    s_schema = pa.schema(spine.schema().base_schema)
    f_order = [feature_ts] + ([tiebreak] if tiebreak else [])
    side = _SIDE_COL

    def tag_spine(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in spine_cols}
        if entity_col not in cols:
            cols[entity_col] = t[entity_col]
        cols["_al_ts"] = t[spine_ts]
        cols["_al_val"] = pa.nulls(t.num_rows, pa.float64())
        cols["_al_tb"] = pa.nulls(t.num_rows, pa.int64())
        cols[side] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_feat(t: pa.Table) -> pa.Table:
        cols = {c: pa.nulls(t.num_rows, s_schema.field(c).type)
                for c in spine_cols}
        cols[entity_col] = t[entity_col]
        cols["_al_ts"] = t[feature_ts]
        cols["_al_val"] = t[value_col].cast(pa.float64())
        cols["_al_tb"] = (
            t[tiebreak].cast(pa.int64()) if tiebreak
            else pa.nulls(t.num_rows, pa.int64())
        )
        cols[side] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    tagged = spine.map_batches(
        tag_spine, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).union(features.map_batches(
        tag_feat, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ))
    tagged = add_bucket_column(tagged, entity_col, num_buckets)

    out_schema = pa.schema(
        [s_schema.field(c) for c in spine_cols]
        + [pa.field(f"v{i}", pa.float64()) for i in range(1, n + 1)]
    )

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_s = pc.equal(t[side], pa.scalar(1, pa.int8()))
        st = t.filter(is_s)
        ft = t.filter(pc.invert(is_s))
        if st.num_rows == 0:
            return out_schema.empty_table()

        def ts_key(tab) -> np.ndarray:
            return tab["_al_ts"].to_numpy(zero_copy_only=False).astype(
                "datetime64[us]").astype(np.int64)

        s_ent = st[entity_col].to_numpy(zero_copy_only=False)
        cols = {c: st[c] for c in spine_cols}
        if ft.num_rows == 0:
            for i in range(1, n + 1):
                cols[f"v{i}"] = pa.nulls(st.num_rows, pa.float64())
            return pa.table(cols).cast(out_schema)
        f_ent = ft[entity_col].to_numpy(zero_copy_only=False)
        _, codes = np.unique(np.concatenate([s_ent, f_ent]),
                             return_inverse=True)
        sc, fc = codes[: len(s_ent)], codes[len(s_ent):]
        s_ts, f_ts = ts_key(st), ts_key(ft)
        f_tb = ft["_al_tb"].to_numpy(zero_copy_only=False)
        f_tb = np.where(np.isnan(f_tb.astype(np.float64)), 0, f_tb
                        ).astype(np.int64) if f_tb.dtype.kind == "f" \
            else f_tb.astype(np.int64)
        t0 = min(int(f_ts.min()), int(s_ts.min()))
        span = max(int(f_ts.max()), int(s_ts.max())) - t0 + 2
        if (int(codes.max()) + 1) * span > np.iinfo(np.int64).max:
            raise ValueError("asof_lastn: entity-offset key overflow")
        order = np.lexsort((f_tb, f_ts, fc))
        fk = (fc * span + (f_ts - t0))[order]
        fv = ft["_al_val"].to_numpy(zero_copy_only=False)[order]
        base = sc * span
        last = np.searchsorted(fk, base + (s_ts - t0), side="right") - 1
        seg = np.searchsorted(fk, base, side="left")
        for i in range(1, n + 1):
            j = last - (i - 1)
            ok = j >= seg
            vals = np.where(ok, fv[np.maximum(j, 0)], np.nan)
            # missing i-th row -> true Arrow null (not NaN), matching the
            # SQL LATERAL's absent-row NULL
            cols[f"v{i}"] = pc.if_else(
                pa.array(ok), pa.array(vals, pa.float64()),
                pa.nulls(len(ok), pa.float64()))
        return pa.table(cols).cast(out_schema)

    return bucketed_map_groups(
        tagged, kernel, num_buckets=num_buckets, batch_format="pyarrow"
    )


def asof_join_multi(
    spine: ray.data.Dataset,
    features: Sequence[dict],
    *,
    entity_col: str,
    spine_ts: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Multi-table point-in-time join — the feature-store training-set
    builder: attach the latest prior row from EACH of N feature tables
    to every spine row, through ONE entity exchange instead of N chained
    as-of joins (N shuffles). Semantically identical to folding
    :func:`asof_join` over the tables (same backward/tie conventions,
    zero leakage per table); physically, all sides ride one tagged
    union co-partitioned on ``hash(entity)`` and the per-bucket kernel
    runs one vectorized ``merge_asof`` per table over already-local
    rows.

    ``features``: sequence of dicts with keys ``ds`` (Dataset),
    ``feature_ts``, ``feature_cols`` (payload incl. the ts col),
    ``suffix`` and optional ``tiebreak``.
    """
    spine_schema = pa.schema(spine.schema().base_schema)
    spine_cols = list(spine_schema.names)
    spine_payload = [c for c in spine_cols if c not in (entity_col, spine_ts)]
    ts_type = spine_schema.field(spine_ts).type
    side = _SIDE_COL

    specs = []
    for i, f in enumerate(features):
        fschema = pa.schema(f["ds"].schema().base_schema)
        payload = [c for c in f["feature_cols"] if c != f["feature_ts"]]
        sfx = f["suffix"]
        specs.append({
            "idx": i + 1,
            "ds": f["ds"],
            "feature_ts": f["feature_ts"],
            "payload": payload,
            "suffix": sfx,
            "tiebreak": f.get("tiebreak"),
            "schema": fschema,
            "out_cols": [f"{c}{sfx}" for c in payload] + [f"ts{sfx}"],
        })

    # unified tagged schema: entity, _fsr_ts, spine payload, every
    # table's suffixed payload + matched-ts + tiebreak slot, side
    def null_cols_for(t, n, skip_idx):
        cols = {}
        for s in specs:
            if s["idx"] == skip_idx:
                continue
            for c, oc in zip(s["payload"], s["out_cols"]):
                cols[oc] = pa.nulls(n, s["schema"].field(c).type)
            cols[f"ts{s['suffix']}"] = pa.nulls(n, ts_type)
            cols[f"_tb{s['idx']}"] = pa.nulls(n, pa.int64())
        return cols

    def tag_spine(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {entity_col: t[entity_col],
                _TS_COL: t[spine_ts].cast(ts_type)}
        for c in spine_payload:
            cols[c] = t[c]
        cols.update(null_cols_for(t, n, skip_idx=None))
        cols[side] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    def make_tag_feature(s):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {entity_col: t[entity_col],
                    _TS_COL: t[s["feature_ts"]].cast(ts_type)}
            for c in spine_payload:
                cols[c] = pa.nulls(n, spine_schema.field(c).type)
            cols.update(null_cols_for(t, n, skip_idx=s["idx"]))
            for c, oc in zip(s["payload"], s["out_cols"]):
                cols[oc] = t[c]
            cols[f"ts{s['suffix']}"] = t[s["feature_ts"]].cast(ts_type)
            cols[f"_tb{s['idx']}"] = (
                t[s["tiebreak"]].cast(pa.int64()) if s["tiebreak"]
                else pa.nulls(n, pa.int64()))
            cols[side] = pa.array(np.full(n, s["idx"], dtype=np.int8))
            return pa.table(cols)

        return f

    tagged = spine.map_batches(
        tag_spine, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    for s in specs:
        tagged = tagged.union(s["ds"].map_batches(
            make_tag_feature(s), batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ))
    tagged = add_bucket_column(tagged, entity_col, num_buckets)

    out_fields = (
        [pa.field(entity_col, spine_schema.field(entity_col).type),
         pa.field(spine_ts, ts_type)]
        + [pa.field(c, spine_schema.field(c).type) for c in spine_payload]
    )
    for s in specs:
        out_fields += [
            pa.field(oc, s["schema"].field(c).type)
            for c, oc in zip(s["payload"], s["out_cols"])
        ]
        out_fields.append(pa.field(f"ts{s['suffix']}", ts_type))
    out_schema = pa.schema(out_fields)

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sp = t.filter(pc.equal(t[side], pa.scalar(0, pa.int8()))).select(
            [entity_col, _TS_COL] + spine_payload).to_pandas()
        if len(sp) == 0:
            return out_schema.empty_table()
        out = sp.sort_values(_TS_COL, kind="stable")
        for s in specs:
            fcols = ([entity_col, _TS_COL]
                     + [oc for oc in s["out_cols"]]
                     + [f"_tb{s['idx']}"])
            ft = t.filter(pc.equal(
                t[side], pa.scalar(s["idx"], pa.int8()))
            ).select(fcols).to_pandas()
            ft = ft.sort_values(
                [_TS_COL, f"_tb{s['idx']}"], kind="stable"
            ).drop(columns=[f"_tb{s['idx']}"])
            if len(ft) == 0:
                for oc in s["out_cols"]:
                    out[oc] = np.nan
                out[f"ts{s['suffix']}"] = pd.Series(
                    pd.NaT, index=out.index, dtype="datetime64[us]")
            else:
                out = pd.merge_asof(
                    out, ft, on=_TS_COL, by=entity_col,
                    direction="backward", allow_exact_matches=True,
                )
        out = out.rename(columns={_TS_COL: spine_ts})
        res = pa.Table.from_pandas(out, schema=out_schema,
                                   preserve_index=False)
        return res.replace_schema_metadata(None)

    return bucketed_map_groups(
        tagged, kernel, num_buckets=num_buckets, batch_format="pyarrow"
    )
