"""Spatial operators: grid-partitioned 2D radius join.

A whole-modality addition: points with planar (x, y) coordinates — the
projected/geodetic distinction is a coordinate transform upstream of the
join (at radius << earth radius an equirectangular projection makes the
planar predicate exact to first order).

Reference parity note: the reference engine (featherstore, Go) has no
spatial operators — this family extends the engine the way a training-data
user needs it (geo-dedup of crawl points, POI joins, location-bucketed
sampling). The physical plan is the engine's standard bucketed exchange
(exchange.py), so the 100 TB shape matches every other wide op here.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

import ray.data

# classic 2D spatial-hash mixing primes (Teschner et al. 2003, public)
_PX = 73856093
_PY = 19349663


def radius_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_x: str,
    left_y: str,
    right_x: str,
    right_y: str,
    radius: float,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    dist_col: str = "dist",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """2D radius join: every (left, right) pair whose planar squared
    distance satisfies ``(lx-rx)*(lx-rx) + (ly-ry)*(ly-ry) <= radius*radius``
    (inclusive — stated in exactly the arithmetic form the oracle computes,
    so both engines evaluate the identical IEEE expression; ``hypot`` or a
    pre-rounded distance is NOT float-equivalent). NULL coordinates on
    either side match nothing, like the SQL predicate. Output: the
    projected columns of both sides plus ``dist_col`` =
    ``sqrt(dx*dx + dy*dy)`` — sqrt of an identical double is correctly
    rounded in both engines, so the column hash-matches raw.

    Physical plan (exact, one shuffle): grid cells of side ``2*radius`` —
    a true pair's per-axis separation is <= radius, i.e. <= half a cell, so
    its cells differ by at most 1 per axis (the half-cell margin dwarfs any
    float jitter in the two ``floor`` calls; no boundary pair can be lost).
    Left rows land in their own cell ONCE; right rows replicate to the 3x3
    neighborhood tagged with the cell they claim. Cells exchange on a mixed
    spatial hash of (cx, cy); the per-bucket kernel sorts right rows once
    by the mixed key, equal-range-probes each left key with two
    ``searchsorted`` calls, expands candidates vectorized, keeps a pair iff
    the claimed (cx, cy) equals the left cell exactly (kills both hash
    collisions and double counting — each true pair claims exactly one of
    the right row's nine copies), then applies the exact distance
    predicate. Shuffle volume: |L| + 9|R| rows of projected columns — no
    all-pairs anywhere. Skew note: the grid hash spreads cells uniformly;
    a single pathologically hot cell (point mass denser than ~cell area)
    is the residual skew risk and calls for a smaller radius partition or
    the salted-join treatment upstream.
    """
    import numpy as np

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import add_bucket_column

    left_cols, right_cols = list(left_cols), list(right_cols)
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"output columns on both sides: {sorted(overlap)}")
    for c in (dist_col,):
        if c in left_cols or c in right_cols:
            raise ValueError(f"dist_col {c!r} collides with a side column")
    radius = float(radius)
    if not radius > 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    cell = 2.0 * radius
    r2 = radius * radius

    lschema, rschema = left.schema(), right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    cxc, cyc, keyc, side = "_fsr_cx", "_fsr_cy", "_fsr_skey", "_fsr_side"

    def _cells(t: pa.Table, xc: str, yc: str):
        x = t[xc].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[yc].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~(np.isnan(x) | np.isnan(y))
        idx = np.flatnonzero(keep)
        cx = np.floor(x[idx] / cell).astype(np.int64)
        cy = np.floor(y[idx] / cell).astype(np.int64)
        return idx, cx, cy

    def _mix(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
        # int64 wraparound multiply — deterministic; collisions are
        # candidate-only (the kernel re-checks exact cell equality)
        return cx * np.int64(_PX) + cy * np.int64(_PY)

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.select(left_cols)
        idx, cx, cy = _cells(t, left_x, left_y)
        t = t.take(idx)
        cols = {c: t[c] for c in left_cols}
        for c in right_cols:
            cols[c] = pa.nulls(t.num_rows, rtypes[c])
        cols[cxc] = pa.array(cx)
        cols[cyc] = pa.array(cy)
        cols[keyc] = pa.array(_mix(cx, cy))
        cols[side] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.select(right_cols)
        idx, cx, cy = _cells(t, right_x, right_y)
        t = t.take(idx)
        n = t.num_rows
        rep = np.repeat(np.arange(n), 9)
        off = np.arange(-1, 2)
        offx = np.repeat(off, 3)  # [-1,-1,-1, 0,0,0, 1,1,1]
        offy = np.tile(off, 3)    # [-1, 0, 1,-1,0,1,-1, 0,1]
        ccx = (cx[:, None] + offx[None, :]).ravel()
        ccy = (cy[:, None] + offy[None, :]).ravel()
        t = t.take(rep)
        cols = {c: pa.nulls(t.num_rows, ltypes[c]) for c in left_cols}
        for c in right_cols:
            cols[c] = t[c]
        cols[cxc] = pa.array(ccx)
        cols[cyc] = pa.array(ccy)
        cols[keyc] = pa.array(_mix(ccx, ccy))
        cols[side] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    tagged = left.map_batches(
        tag_left, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).union(right.map_batches(
        tag_right, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ))
    tagged = add_bucket_column(tagged, keyc, num_buckets)
    out_schema = pa.schema(
        [pa.field(c, ltypes[c]) for c in left_cols]
        + [pa.field(c, rtypes[c]) for c in right_cols]
        + [pa.field(dist_col, pa.float64())]
    )

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_r = pc.equal(t[side], pa.scalar(1, pa.int8()))
        lt = t.filter(pc.invert(is_r))
        rt = t.filter(is_r)
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        lk = lt[keyc].to_numpy(zero_copy_only=False)
        rk = rt[keyc].to_numpy(zero_copy_only=False)
        order = np.argsort(rk, kind="stable")
        rk_s = rk[order]
        lo = np.searchsorted(rk_s, lk, side="left")
        hi = np.searchsorted(rk_s, lk, side="right")
        counts = hi - lo
        li = np.repeat(np.arange(len(lk)), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        ri_sorted = np.arange(int(counts.sum())) - np.repeat(starts, counts) \
            + np.repeat(lo, counts)
        ri = order[ri_sorted]
        # exact cell equality: kills mixed-key collisions + dup claims
        lcx = lt[cxc].to_numpy(zero_copy_only=False)
        lcy = lt[cyc].to_numpy(zero_copy_only=False)
        rcx = rt[cxc].to_numpy(zero_copy_only=False)
        rcy = rt[cyc].to_numpy(zero_copy_only=False)
        ok = (rcx[ri] == lcx[li]) & (rcy[ri] == lcy[li])
        li, ri = li[ok], ri[ok]
        lx = lt[left_x].to_numpy(zero_copy_only=False).astype(np.float64)[li]
        ly = lt[left_y].to_numpy(zero_copy_only=False).astype(np.float64)[li]
        rx = rt[right_x].to_numpy(zero_copy_only=False).astype(np.float64)[ri]
        ry = rt[right_y].to_numpy(zero_copy_only=False).astype(np.float64)[ri]
        dx = lx - rx
        dy = ly - ry
        d2 = dx * dx + dy * dy  # the oracle's exact expression order
        ok2 = d2 <= r2
        li, ri, d2 = li[ok2], ri[ok2], d2[ok2]
        cols = {c: lt[c].take(li) for c in left_cols}
        for c in right_cols:
            cols[c] = rt[c].take(ri)
        cols[dist_col] = pa.array(np.sqrt(d2))
        return pa.table(cols).cast(out_schema)

    return bucketed_map_groups(
        tagged, kernel, num_buckets=num_buckets, batch_format="pyarrow"
    )


def dbscan(
    points: ray.data.Dataset,
    *,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int,
    num_buckets: int = 64,
    driver_edge_cap: int = 2_000_000,
) -> ray.data.Dataset:
    """Deterministic DBSCAN over 2D points: density clusters from the
    eps-radius graph. A point is CORE when its closed eps-neighborhood
    (itself included) holds at least ``min_pts`` points; clusters are the
    connected components of the core-core subgraph labeled by their
    minimum core id; a non-core point with at least one core neighbor is
    a BORDER point assigned the SMALLEST cluster label among its core
    neighbors (classic DBSCAN leaves border assignment scan-order-
    dependent — the min rule makes it deterministic and oracle-
    expressible); everything else is noise and is omitted.

    Output: (id_col, cluster, is_core) — one row per core/border point.

    Scale shape: the eps-graph comes from :func:`radius_join` against a
    renamed copy of the points (grid cells of side 2·eps, one spatial-
    hash exchange, exact predicate). Degrees attach to BOTH endpoints in
    two bucket exchanges — the graph is symmetric (self-join), so the
    right endpoint's degree is computable inside the hash(right) bucket
    without a second degree table. Components run through
    ``connected_components`` (hash-min propagation, driver-vectorized
    below ``driver_edge_cap`` edges); border labels take one hash join +
    one min-per-id exchange. No stage materializes the point set on the
    driver.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column
    from featherstore_ray.stages.components import connected_components
    from featherstore_ray.stages.join import hash_join

    rid, rx, ry = f"_{id_col}_r", f"_{x_col}_r", f"_{y_col}_r"

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({rid: t[id_col], rx: t[x_col], ry: t[y_col]})

    right = points.map_batches(
        rename, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    edges = radius_join(
        points, right,
        left_x=x_col, left_y=y_col, right_x=rx, right_y=ry, radius=eps,
        left_cols=[id_col, x_col, y_col], right_cols=[rid, rx, ry],
        num_buckets=num_buckets,
    ).select_columns([id_col, rid])

    def flag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        deg = df.groupby(id_col, sort=False)[rid].transform("size")
        df["_lcore"] = (deg >= min_pts).to_numpy()
        return df

    flagged = bucketed_map_groups(
        add_bucket_column(edges, id_col, num_buckets), flag_left,
        num_buckets=num_buckets, batch_format="pandas",
    )

    def flag_right(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        # symmetric graph: deg(v) over right endpoints == deg(v)
        deg = df.groupby(rid, sort=False)[id_col].transform("size")
        df["_rcore"] = (deg >= min_pts).to_numpy()
        return df

    ff = bucketed_map_groups(
        add_bucket_column(flagged, rid, num_buckets), flag_right,
        num_buckets=num_buckets, batch_format="pandas",
    ).materialize()

    def core_edges(t: pa.Table) -> pa.Table:
        m = pc.and_(t["_lcore"], t["_rcore"])
        f = t.filter(m)
        return pa.table({
            "a": f[id_col].combine_chunks().cast(pa.int64()),
            "b": f[rid].combine_chunks().cast(pa.int64()),
        })

    labels = connected_components(
        ff.map_batches(core_edges, batch_size=None, batch_format="pyarrow",
                       zero_copy_batch=True),
        num_buckets=num_buckets, driver_edge_cap=driver_edge_cap,
    )  # (node, dup_group); self-loops keep isolated cores clustered

    def border_edges(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.invert(t["_lcore"]), t["_rcore"])
        f = t.filter(m)
        return pa.table({
            id_col: f[id_col],
            "node": f[rid].combine_chunks().cast(pa.int64()),
        })

    bj = hash_join(
        ff.map_batches(border_edges, batch_size=None,
                       batch_format="pyarrow", zero_copy_batch=True),
        labels, on=["node"], num_partitions=num_buckets,
    ).select_columns([id_col, "dup_group"])

    def min_label(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({
                id_col: df[id_col],
                "cluster": pd.Series(dtype="int64"),
                "is_core": pd.Series(dtype="bool"),
            })
        out = (
            df.groupby(id_col, sort=False)["dup_group"].min().reset_index()
            .rename(columns={"dup_group": "cluster"})
        )
        out["is_core"] = np.zeros(len(out), dtype=bool)
        return out

    borders = bucketed_map_groups(
        add_bucket_column(bj, id_col, num_buckets), min_label,
        num_buckets=num_buckets, batch_format="pandas",
    )

    def core_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t["node"],
            "cluster": t["dup_group"].combine_chunks().cast(pa.int64()),
            "is_core": pa.array(np.ones(t.num_rows, dtype=bool)),
        })

    cores = labels.map_batches(
        core_rows, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return cores.union(borders)
