"""Generic equi-joins: broadcast (small side) and partitioned hash join.

The reference has no table-to-table joins (SURVEY.md §2.4); these are the
enrichment joins a feature pipeline needs (attach dimension attributes to an
event/fact stream).

- ``broadcast_join``: dimension side is ``ray.put`` ONCE and merged per batch
  with a pandas hash merge — no shuffle, the fact side streams (task pool +
  per-worker dim cache; no actor-pool spin-up).
- ``hash_join``: both sides large → tagged union with typed-null padding,
  ONE bucketed exchange on the leading key, per-bucket Acero hash join.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
import pyarrow as pa

import ray
import ray.data


_BCAST_DIM_CACHE: dict = {}


def broadcast_join(
    facts: ray.data.Dataset,
    dim: pa.Table,
    *,
    on: Sequence[str],
    how: str = "left",
    suffix: str = "_dim",
) -> ray.data.Dataset:
    """Join a streaming fact Dataset against a small broadcast dimension.

    ``dim`` must fit in the object store comfortably (it is put ONCE; every
    task reads it zero-copy node-locally — never re-shipped per batch).
    """
    on = list(on)
    dim_ref = ray.put(dim)
    ref_key = dim_ref.hex()

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        # task pool, not an actor pool: long-lived Ray workers make the
        # per-process cache equivalent to actor __init__ state without the
        # ~2s pool spin-up per pipeline; the ray.get is a zero-copy plasma
        # map either way, only the to_pandas conversion is cached
        d = _BCAST_DIM_CACHE.get(ref_key)
        if d is None:
            d = ray.get(dim_ref).to_pandas()
            _BCAST_DIM_CACHE.clear()  # one live dim per worker is plenty
            _BCAST_DIM_CACHE[ref_key] = d
        return batch.merge(d, on=on, how=how, suffixes=("", suffix))

    return facts.map_batches(join_batch, batch_size=None,
                             batch_format="pandas")


def interval_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Range join: each point row matched to every same-entity interval with
    ``start <= ts <= end`` (inclusive both ends — the engine's time-range
    convention). Output: point columns + the interval's payload columns.

    Physical plan (the one-shuffle template, like the as-of join): tagged
    union co-partitioned on ``hash(entity) % B``. Per bucket, when each
    entity's intervals are pairwise DISJOINT (sessions, maintenance windows
    — the dominant case), each point is assigned its single containing
    interval by one merge-rank + ``searchsorted`` pass: O((n+m) log(n+m))
    time, O(n+m) memory, fully vectorized, no per-entity materialization.
    Only when a bucket actually contains overlapping intervals does it fall
    back to the pandas merge + range filter, whose per-entity cost is
    |points_e| x |intervals_e| (required: a point may match many intervals).
    Oracle: ``JOIN ... ON p.entity = i.entity AND p.ts BETWEEN i.start AND
    i.end``.
    """
    import numpy as np

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    side = "_fsr_side"
    pt_schema = pa.schema(points.schema().base_schema)
    iv_schema = pa.schema(intervals.schema().base_schema)
    pt_payload = [c for c in pt_schema.names if c != entity_col]
    iv_payload = [
        c for c in iv_schema.names if c not in (entity_col,)
    ]
    out_schema = pa.schema(
        [pt_schema.field(entity_col)]
        + [pt_schema.field(c) for c in pt_payload]
        + [iv_schema.field(c) for c in iv_payload]
    )

    def tag_points(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in [entity_col] + pt_payload}
        for c in iv_payload:
            cols[c] = pa.nulls(t.num_rows, type=iv_schema.field(c).type)
        cols[side] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_intervals(t: pa.Table) -> pa.Table:
        cols = {entity_col: t[entity_col]}
        for c in pt_payload:
            cols[c] = pa.nulls(t.num_rows, type=pt_schema.field(c).type)
        for c in iv_payload:
            cols[c] = t[c]
        cols[side] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    tagged = points.map_batches(
        tag_points, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).union(
        intervals.map_batches(
            tag_intervals, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    tagged = add_bucket_column(tagged, entity_col, num_buckets)

    def _as_key(col) -> np.ndarray:
        arr = col.to_numpy(zero_copy_only=False)
        if arr.dtype.kind == "M":
            return arr.astype("datetime64[us]").astype(np.int64)
        return arr

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_pt = pc.equal(t[side], 1)
        # split sides in Arrow BEFORE pandas: null padding must never touch
        # the other side's dtypes (the asof.py lesson)
        pts_t = t.filter(is_pt).select([entity_col] + pt_payload)
        ivs_t = t.filter(pc.invert(is_pt)).select([entity_col] + iv_payload)
        if pts_t.num_rows == 0 or ivs_t.num_rows == 0:
            return out_schema.empty_table()
        p_ent = pts_t[entity_col].to_numpy(zero_copy_only=False)
        i_ent = ivs_t[entity_col].to_numpy(zero_copy_only=False)
        _, codes = np.unique(
            np.concatenate([p_ent, i_ent]), return_inverse=True
        )
        p_code, i_code = codes[: len(p_ent)], codes[len(p_ent):]
        p_ts = _as_key(pts_t[ts_col])
        i_s, i_e = _as_key(ivs_t[start_col]), _as_key(ivs_t[end_col])
        if any(a.dtype.kind == "f" for a in (p_ts, i_s, i_e)):
            p_ts, i_s, i_e = (
                a.astype(np.float64) for a in (p_ts, i_s, i_e)
            )
        else:
            p_ts, i_s, i_e = (
                a.astype(np.int64) for a in (p_ts, i_s, i_e)
            )
        iorder = np.lexsort((i_s, i_code))
        ic, is_, ie = i_code[iorder], i_s[iorder], i_e[iorder]
        same = ic[1:] == ic[:-1]
        if not np.any(same & (is_[1:] <= ie[:-1])):
            # disjoint per entity: each point has AT MOST ONE containing
            # interval — the latest start <= ts. One merged lexsort gives
            # every point its count of (code, start) pairs at-or-before it
            # (the as-of rank trick); a candidate from another entity or
            # with end < ts is simply no match.
            k = len(is_)
            all_code = np.concatenate([ic, p_code])
            all_val = np.concatenate([is_, p_ts])
            # intervals sort BEFORE points on (code, val) ties: start <= ts
            flag = np.concatenate(
                [np.zeros(k, np.int8), np.ones(len(p_ts), np.int8)]
            )
            order = np.lexsort((flag, all_val, all_code))
            is_iv = order < k
            n_iv_upto = np.cumsum(is_iv)
            pt_slots = np.flatnonzero(~is_iv)
            p_idx = order[pt_slots] - k  # original point row
            cand = n_iv_upto[pt_slots] - 1  # global sorted-interval index
            ok = cand >= 0
            safe = np.maximum(cand, 0)
            ok &= ic[safe] == p_code[p_idx]
            ok &= p_ts[p_idx] <= ie[safe]
            hit_p = p_idx[ok]
            hit_i = iorder[safe[ok]]
            cols = {entity_col: pts_t[entity_col].take(hit_p)}
            for c in pt_payload:
                cols[c] = pts_t[c].take(hit_p)
            for c in iv_payload:
                cols[c] = ivs_t[c].take(hit_i)
            res = pa.table(cols).cast(out_schema)
            return res.replace_schema_metadata(None)
        # overlapping intervals: a point may match MANY — pandas merge +
        # range filter (per-entity product; unavoidable for this input)
        pts = pts_t.to_pandas()
        ivs = ivs_t.to_pandas()
        out = pts.merge(ivs, on=entity_col, how="inner")
        ts = out[ts_col].to_numpy()
        keep = (out[start_col].to_numpy() <= ts) & (
            ts <= out[end_col].to_numpy()
        )
        out = out.loc[keep]
        res = pa.Table.from_pandas(
            out, schema=out_schema, preserve_index=False
        )
        return res.replace_schema_metadata(None)

    return bucketed_map_groups(
        tagged, kernel, num_buckets=num_buckets, batch_format="pyarrow"
    )


_ACERO_JOIN_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "left_outer": "left outer",
    "right": "right outer",
    "right_outer": "right outer",
    "full_outer": "full outer",
    "outer": "full outer",
    "left_semi": "left semi",
    "left_anti": "left anti",
}


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: Sequence[str],
    how: str = "inner",
    num_partitions: int | None = None,
    hot_keys=None,
    num_salts: int = 8,
) -> ray.data.Dataset:
    """Hash-partitioned equi-join of two large Datasets through the
    engine's bucketed exchange: both sides tag a one-byte side column,
    pad the other side's columns with TYPED nulls (never pandas — the
    int->float null-pad coercion class), take ONE hash exchange on the
    first join key (equal key tuples share every key, so bucketing on a
    subset co-locates them), and each bucket joins with pyarrow's Acero
    hash join — SQL null semantics (null keys match nothing; full-outer
    coalesces key columns across sides, DuckDB USING behavior).

    Replaces Ray Data's native ``Dataset.join`` here: the aggregator-actor
    hash shuffle it spins up costs ~5s per call on this host regardless of
    size (CLAUDE.md), while the bucketed exchange is the engine's
    measured-fast path and falls back to the sort shuffle at object-count
    scale limits like every other wide op.

    **Skew salting** (``hot_keys``: a set of ``on[0]`` values from
    :func:`featherstore_ray.stages.skew.hot_keys`): a Zipf-hot probe key
    lands an entire join fan-in on one reducer. With salting, LEFT rows
    of a hot key spread round-robin over ``num_salts`` sub-partitions
    and the RIGHT rows of that key REPLICATE once per salt; the salt
    joins as an extra key so no pair is emitted twice. Which salt a left
    row draws cannot change the output set (every salt partition holds
    all matching right rows). Only ``inner``/``left``(_outer) joins —
    right-preserving joins would emit a replicated unmatched right row
    per salt, so they refuse.
    """
    import numpy as np

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import add_bucket_column, bucket_of

    on = list(on)
    how_acero = _ACERO_JOIN_TYPE[how]
    num_buckets = num_partitions or 32
    salt = "_fsr_salt"
    if hot_keys:
        if how not in ("inner", "left", "left_outer"):
            raise ValueError(
                f"hot_keys salting supports inner/left joins, not {how!r}"
            )
        hot_arr = pa.array(sorted(hot_keys))

    lschema, rschema = left.schema(), right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    overlap = (set(lcols) & set(rcols)) - set(on)
    if overlap:
        raise ValueError(
            f"non-key columns present on both sides: {sorted(overlap)}; "
            "rename before joining"
        )
    rtypes = dict(zip(rschema.names, rschema.types))
    ltypes = dict(zip(lschema.names, lschema.types))
    r_extra = [c for c in rcols if c not in on]
    l_extra = [c for c in lcols if c not in on]
    side = "_fsr_side"

    def tag(is_right: bool, extra_cols, extra_types):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = t.num_rows
            for c in extra_cols:  # typed null pads for the other side
                t = t.append_column(c, pa.nulls(n, extra_types[c]))
            t = t.select(on + l_extra + r_extra)
            t = t.append_column(
                side, pa.array(np.full(n, int(is_right), dtype=np.int8))
            )
            if not hot_keys:
                return t.append_column(
                    salt, pa.array(np.zeros(n, dtype=np.int8)))
            is_hot = pc.fill_null(
                pc.is_in(t[on[0]], value_set=hot_arr), False
            ).to_numpy(zero_copy_only=False).astype(bool)
            if not is_right:
                s = np.zeros(n, dtype=np.int8)
                s[is_hot] = (np.arange(int(is_hot.sum()))
                             % num_salts).astype(np.int8)
                return t.append_column(salt, pa.array(s))
            # right side: replicate hot rows once per salt
            hot_idx = np.flatnonzero(is_hot)
            cold_idx = np.flatnonzero(~is_hot)
            rep_idx = np.concatenate(
                [cold_idx, np.repeat(hot_idx, num_salts)])
            s = np.concatenate([
                np.zeros(len(cold_idx), dtype=np.int8),
                np.tile(np.arange(num_salts, dtype=np.int8),
                        len(hot_idx)),
            ])
            return t.take(rep_idx).append_column(salt, pa.array(s))

        return f

    tagged = left.map_batches(
        tag(False, r_extra, rtypes), batch_size=None,
        batch_format="pyarrow", zero_copy_batch=True,
    ).union(right.map_batches(
        tag(True, l_extra, ltypes), batch_size=None,
        batch_format="pyarrow", zero_copy_batch=True,
    ))
    if hot_keys:
        from featherstore_ray.partition import BUCKET_COL

        # bucket on (key, salt) so each salt partition is its own reducer.
        # `(b + s) % num_buckets`, NOT `(b * num_salts + s)`: the multiply
        # collapses every salt-0 (cold) row into num_buckets/gcd(num_salts,
        # num_buckets) buckets, serializing the whole cold side on a few
        # reducers. Adding the salt keeps the full hash spread for salt 0
        # while shifting each hot copy to a distinct bucket; equal
        # (key, salt) still co-locate, so correctness is unchanged.
        def add_salted(t: pa.Table) -> pa.Table:
            b = bucket_of(t[on[0]], num_buckets).astype(np.int64)
            s = t[salt].to_numpy(zero_copy_only=False).astype(np.int64)
            combined = ((b + s) % num_buckets).astype(np.int32)
            return t.append_column(BUCKET_COL, pa.array(combined))

        bucketed = tagged.map_batches(
            add_salted, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        bucketed = add_bucket_column(tagged, on[0], num_buckets)

    join_keys = on + [salt]

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.equal(t[side], pa.scalar(1, pa.int8()))
        lt = t.filter(pc.invert(mask)).select(join_keys + l_extra)
        rt = t.filter(mask).select(join_keys + r_extra)
        out = lt.join(rt, keys=join_keys, join_type=how_acero)
        return out.drop_columns([salt])

    return bucketed_map_groups(
        bucketed, kernel, num_buckets=num_buckets, batch_format="pyarrow"
    )


def band_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_val: str,
    right_val: str,
    eps: float,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Numeric ε-band similarity join: every (left, right) pair with
    ``right_val BETWEEN left_val - eps AND left_val + eps`` (inclusive —
    stated in the BETWEEN form so the oracle computes the identical IEEE
    bounds; ``abs(a-b) <= eps`` is NOT float-equivalent). NULL values on
    either side match nothing, like the SQL predicate.

    Physical plan (exact, one shuffle): band id ``floor(v / eps)`` — any
    in-band pair spans at most one band boundary. Left rows land in their
    own band's hash bucket ONCE; right rows replicate to bands b±2 (the
    ±2 halo absorbs worst-case float jitter in the two ``floor`` calls, so
    no boundary pair can be lost) tagged with the band they claim. The
    per-bucket kernel sorts right values once, range-probes each left value
    with two ``searchsorted`` calls, expands candidates vectorized, and
    keeps a pair iff the claimed band equals the left band — each true pair
    claims exactly one of the right row's five copies, so output is exact
    with no dedup pass. Replication is a constant ≤5× of the RIGHT side
    only; output never exceeds the true result ×1 (candidates over-fetch at
    most 5× before the band filter). Shuffle volume: |L| + 5|R| rows of
    projected columns — no all-pairs anywhere.
    """
    import numpy as np

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    left_cols, right_cols = list(left_cols), list(right_cols)
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"output columns on both sides: {sorted(overlap)}")
    lschema, rschema = left.schema(), right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    band = "_fsr_band"
    side = "_fsr_side"
    eps = float(eps)
    if not eps > 0:
        raise ValueError(f"eps must be > 0, got {eps}")

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.select(left_cols)
        v = t[left_val].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        t = t.take(np.flatnonzero(keep))
        b = np.floor(v[keep] / eps).astype(np.int64)
        cols = {c: t[c] for c in left_cols}
        for c in right_cols:
            cols[c] = pa.nulls(t.num_rows, rtypes[c])
        cols[band] = pa.array(b)
        cols[side] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.select(right_cols)
        v = t[right_val].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = np.flatnonzero(~np.isnan(v))
        t = t.take(keep)
        b = np.floor(
            v[keep] / eps
        ).astype(np.int64)
        n = t.num_rows
        idx = np.repeat(np.arange(n), 5)
        claimed = (b[:, None] + np.arange(-2, 3)[None, :]).ravel()
        t = t.take(idx)
        cols = {c: pa.nulls(t.num_rows, ltypes[c]) for c in left_cols}
        for c in right_cols:
            cols[c] = t[c]
        cols[band] = pa.array(claimed)
        cols[side] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    tagged = left.map_batches(
        tag_left, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).union(right.map_batches(
        tag_right, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ))
    tagged = add_bucket_column(tagged, band, num_buckets)
    out_schema = pa.schema(
        [pa.field(c, ltypes[c]) for c in left_cols]
        + [pa.field(c, rtypes[c]) for c in right_cols]
    )

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_r = pc.equal(t[side], pa.scalar(1, pa.int8()))
        lt = t.filter(pc.invert(is_r))
        rt = t.filter(is_r)
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        lv = lt[left_val].to_numpy(zero_copy_only=False).astype(np.float64)
        lb = lt[band].to_numpy(zero_copy_only=False)
        rv = rt[right_val].to_numpy(zero_copy_only=False).astype(np.float64)
        rb = rt[band].to_numpy(zero_copy_only=False)
        order = np.argsort(rv, kind="stable")
        rv_s = rv[order]
        lo = np.searchsorted(rv_s, lv - eps, side="left")
        hi = np.searchsorted(rv_s, lv + eps, side="right")
        counts = hi - lo
        li = np.repeat(np.arange(len(lv)), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        ri_sorted = np.arange(int(counts.sum())) - np.repeat(starts, counts) \
            + np.repeat(lo, counts)
        ri = order[ri_sorted]
        ok = rb[ri] == lb[li]  # the claimed copy for this left band
        li, ri = li[ok], ri[ok]
        cols = {c: lt[c].take(li) for c in left_cols}
        for c in right_cols:
            cols[c] = rt[c].take(ri)
        return pa.table(cols).cast(out_schema)

    return bucketed_map_groups(
        tagged, kernel, num_buckets=num_buckets, batch_format="pyarrow"
    )


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Change-data-capture between two keyed snapshots: one row per key
    that was ``added`` (new only), ``removed`` (old only) or ``changed``
    (present in both with any compare column differing — NULLs compare
    equal, SQL ``IS DISTINCT FROM``). Output: key columns + ``status`` +
    ``{col}_old`` / ``{col}_new`` for every compare column. Keys must be
    unique within each snapshot (latest-per-key tables).

    Scale shape: both sides project to key + compare columns and carry a
    one-byte side tag through ONE key exchange; the per-bucket kernel is a
    pandas outer merge + vectorized column compare, and unchanged rows —
    the overwhelming majority between consecutive snapshots — never leave
    the bucket."""
    import numpy as np
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    key_cols, compare_cols = list(key_cols), list(compare_cols)
    cols = key_cols + compare_cols
    side = "_fsr_side"

    def tag(v: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            return t.append_column(
                side, pa.array(np.full(t.num_rows, v, dtype=np.int8))
            )

        return f

    tagged = old.map_batches(
        tag(0), batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        new.map_batches(
            tag(1), batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    bucketed = add_bucket_column(tagged, key_cols[0], num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        o = df[df[side] == 0].drop(columns=[side])
        n = df[df[side] == 1].drop(columns=[side])
        m = o.merge(n, on=key_cols, how="outer", suffixes=("_old", "_new"),
                    indicator=True)
        removed = (m["_merge"] == "left_only").to_numpy()
        added = (m["_merge"] == "right_only").to_numpy()
        diff = np.zeros(len(m), dtype=bool)
        for c in compare_cols:
            a, b = m[f"{c}_old"], m[f"{c}_new"]
            diff |= (~((a == b) | (a.isna() & b.isna()))).to_numpy()
        status = np.where(removed, "removed",
                          np.where(added, "added", "changed"))
        keep = removed | added | diff
        out = m.loc[keep, key_cols + [f"{c}_old" for c in compare_cols]
                    + [f"{c}_new" for c in compare_cols]].copy()
        out["status"] = status[keep]
        return out

    return bucketed_map_groups(
        bucketed, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def overlap_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    entity_col: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Interval-overlap join — :func:`interval_join`'s interval×interval
    sibling: every same-entity pair whose CLOSED intervals intersect
    (``right_start <= left_end AND right_end >= left_start``, the
    engine's inclusive time-range convention). Output: entity + both
    sides' payload columns.

    Physical plan: ONE tagged-union entity exchange. When the RIGHT
    side's intervals are pairwise disjoint per entity (sessions, shifts —
    the dominant case), each left interval overlaps a CONTIGUOUS run of
    start-sorted right intervals, found by two entity-offset composite
    ``searchsorted`` probes (earlier entities cancel between the bounds,
    the attribution trick) and expanded vectorized — O((n+m) log(n+m)) +
    output, never a per-entity product. Buckets whose right side
    actually overlaps itself fall back to the pandas merge + range
    filter (a left row may match many arbitrary rights — the product is
    the answer there).
    """
    import numpy as np

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import add_bucket_column

    side = "_fsr_side"
    l_schema = pa.schema(left.schema().base_schema)
    r_schema = pa.schema(right.schema().base_schema)
    l_payload = [c for c in l_schema.names if c != entity_col]
    r_payload = [c for c in r_schema.names if c != entity_col]
    overlap_names = set(l_payload) & set(r_payload)
    if overlap_names:
        raise ValueError(
            f"payload columns on both sides: {sorted(overlap_names)}; "
            "rename before joining"
        )
    out_schema = pa.schema(
        [l_schema.field(entity_col)]
        + [l_schema.field(c) for c in l_payload]
        + [r_schema.field(c) for c in r_payload]
    )

    def tag(is_left: bool, payload, other_payload, other_schema):
        def f(t: pa.Table) -> pa.Table:
            cols = {entity_col: t[entity_col]}
            for c in payload:
                cols[c] = t[c]
            for c in other_payload:
                cols[c] = pa.nulls(t.num_rows, other_schema.field(c).type)
            cols[side] = pa.array(
                np.full(t.num_rows, int(is_left), dtype=np.int8))
            return pa.table(cols)

        return f

    tagged = left.map_batches(
        tag(True, l_payload, r_payload, r_schema),
        batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
    ).union(right.map_batches(
        tag(False, r_payload, l_payload, l_schema),
        batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
    ))
    tagged = add_bucket_column(tagged, entity_col, num_buckets)

    def _key(tab, col):
        arr = tab[col].to_numpy(zero_copy_only=False)
        if arr.dtype.kind == "M":
            return arr.astype("datetime64[us]").astype(np.int64)
        return arr.astype(np.int64)

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_l = pc.equal(t[side], pa.scalar(1, pa.int8()))
        lt = t.filter(is_l)
        rt = t.filter(pc.invert(is_l))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        l_ent = lt[entity_col].to_numpy(zero_copy_only=False)
        r_ent = rt[entity_col].to_numpy(zero_copy_only=False)
        _, codes = np.unique(
            np.concatenate([l_ent, r_ent]), return_inverse=True)
        lc, rc = codes[: len(l_ent)], codes[len(l_ent):]
        ls, le = _key(lt, left_start), _key(lt, left_end)
        rs, re_ = _key(rt, right_start), _key(rt, right_end)
        order = np.lexsort((rs, rc))
        rc_s, rs_s, re_s = rc[order], rs[order], re_[order]
        seg = rc_s[1:] == rc_s[:-1]
        disjoint = not np.any(seg & (rs_s[1:] <= re_s[:-1]))
        if disjoint:
            t0 = int(min(rs_s.min(), ls.min()))
            span = int(max(re_s.max(), le.max())) - t0 + 2
            if (int(codes.max()) + 1) * span > np.iinfo(np.int64).max:
                disjoint = False  # composite key would overflow
        if disjoint:
            # disjoint rights sort identically by start and by end
            start_keys = rc_s * span + (rs_s - t0)
            end_keys = rc_s * span + (re_s - t0)
            base = lc * span
            hi = np.searchsorted(start_keys, base + (le - t0),
                                 side="right")
            lo = np.searchsorted(end_keys, base + (ls - t0), side="left")
            counts = hi - lo
            li = np.repeat(np.arange(len(ls)), counts)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            ri_sorted = (np.arange(int(counts.sum()))
                         - np.repeat(starts, counts)
                         + np.repeat(lo, counts))
            ri = order[ri_sorted]
            cols = {entity_col: lt[entity_col].take(li)}
            for c in l_payload:
                cols[c] = lt[c].take(li)
            for c in r_payload:
                cols[c] = rt[c].take(ri)
            return pa.table(cols).cast(out_schema)
        lp = lt.select([entity_col] + l_payload).to_pandas()
        rp = rt.select([entity_col] + r_payload).to_pandas()
        m = lp.merge(rp, on=entity_col, how="inner")
        keep = (m[right_start].to_numpy() <= m[left_end].to_numpy()) & (
            m[right_end].to_numpy() >= m[left_start].to_numpy())
        res = pa.Table.from_pandas(m.loc[keep], schema=out_schema,
                                   preserve_index=False)
        return res.replace_schema_metadata(None)

    return bucketed_map_groups(
        tagged, kernel, num_buckets=num_buckets, batch_format="pyarrow"
    )


def merge_intervals(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    start_col: str,
    end_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Gaps-and-islands interval union: per entity, coalesce every run of
    overlapping-or-touching CLOSED intervals (next start <= running max
    end) into one merged span — the coverage/uptime/availability
    consolidation op (and the span-merge inside substring_dedup, exposed
    as a public API). Output: (entity, start, end, n_merged) per island.
    Rows with a NULL entity/start/end drop on both sides.

    One hash(entity) exchange; the per-bucket kernel is a lexsort +
    running-max (cummax) + boundary cumsum — no row loop, intervals never
    leave their bucket.
    """
    import numpy as np

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.dropna(subset=[entity_col, start_col, end_col])

    slim = ds.select_columns([entity_col, start_col, end_col]).map_batches(
        pre, batch_size=None, batch_format="pandas"
    )
    slim = add_bucket_column(slim, entity_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        out_cols = [entity_col, "start", "end", "n_merged"]
        if df.empty:
            out = pd.DataFrame({
                entity_col: df[entity_col],
                "start": df[start_col],
                "end": df[end_col],
                "n_merged": pd.Series([], dtype=np.int64),
            })
            return out[out_cols]
        d = df.sort_values([entity_col, start_col, end_col],
                           kind="stable").reset_index(drop=True)
        ent = d[entity_col].to_numpy()
        s = d[start_col].to_numpy()
        new_ent = np.empty(len(d), dtype=bool)
        new_ent[0] = True
        new_ent[1:] = ent[1:] != ent[:-1]
        # segmented running max end (pandas C-level cummax per entity)
        run = d.groupby(entity_col, sort=False)[end_col].cummax().to_numpy()
        prev_run = np.empty_like(run)
        prev_run[0] = run[0]
        prev_run[1:] = run[:-1]
        new_island = new_ent | (s > prev_run)
        island = np.cumsum(new_island) - 1
        first = np.flatnonzero(new_island)
        last = np.append(first[1:], len(d)) - 1
        out = pd.DataFrame({
            entity_col: ent[first],
            "start": s[first],
            "end": run[last],  # island end = cummax at its last row
            "n_merged": np.bincount(island).astype(np.int64),
        })
        return out[out_cols]

    return bucketed_map_groups(
        slim, kernel, num_buckets=num_buckets, batch_format="pandas"
    )


def peak_concurrency(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    start_col: str,
    end_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Peak interval concurrency per entity — the occupancy/capacity
    sweep (max simultaneous sessions, overlapping jobs, open
    connections): sweep-line over CLOSED intervals, +1 at each start,
    −1 just after each end; at equal timestamps starts count before
    ends (an interval ending exactly when another starts still overlaps
    it — the engine's closed-ends convention). Output: (entity,
    peak, n_intervals). NULL entity/start/end rows drop.

    One hash(entity) exchange; the kernel is one lexsort + segmented
    running-sum max — no per-interval loop.
    """
    import numpy as np

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.dropna(subset=[entity_col, start_col, end_col])

    slim = ds.select_columns([entity_col, start_col, end_col]).map_batches(
        pre, batch_size=None, batch_format="pandas"
    )
    slim = add_bucket_column(slim, entity_col, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({
                entity_col: df[entity_col],
                "peak": pd.Series([], dtype=np.int64),
                "n_intervals": pd.Series([], dtype=np.int64),
            })
        ent = np.concatenate([df[entity_col].to_numpy()] * 2)
        ts = np.concatenate([df[start_col].to_numpy(),
                             df[end_col].to_numpy()])
        delta = np.concatenate([
            np.ones(len(df), dtype=np.int64),
            -np.ones(len(df), dtype=np.int64),
        ])
        # starts (+1) sort BEFORE ends (−1) at equal ts: closed intervals
        order = np.lexsort((-delta, ts, ent))
        ent_s, d_s = ent[order], delta[order]
        new_e = np.empty(len(ent_s), dtype=bool)
        new_e[0] = True
        new_e[1:] = ent_s[1:] != ent_s[:-1]
        starts = np.flatnonzero(new_e)
        sizes = np.diff(np.append(starts, len(ent_s)))
        run = np.cumsum(d_s)
        run = run - np.repeat((run - d_s)[starts], sizes)
        codes = np.cumsum(new_e) - 1
        peak = np.zeros(len(starts), dtype=np.int64)
        np.maximum.at(peak, codes, run)
        return pd.DataFrame({
            entity_col: ent_s[starts],
            "peak": peak,
            "n_intervals": (sizes // 2).astype(np.int64),
        })

    return bucketed_map_groups(
        slim, kernel, num_buckets=num_buckets, batch_format="pandas"
    )
