"""Iterative graph algorithms over edge-list Datasets.

``pagerank`` joins ``components.connected_components`` as the second
distributed iterative algorithm: per-node state (the rank vector) lives in a
Dataset, never on the driver, and every iteration is two bucket exchanges
over a tagged union of (edges + state) — the engine's standard
skip-the-sort-shuffle path. The reference has no graph ops (SURVEY §2.5:
"no data aggregations"); this is part of the training-data extension
surface (graph-propagated quality/trust scores, citation weighting).

Semantics (exactly mirrored by the unrolled-CTE SQL oracle):
``r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u) / outdeg(u)`` for ``iters``
steps from ``r_0 = 1/N``; dangling-node mass is not redistributed (both
sides drop it identically). The damping multiply happens AFTER the
neighbor sum on both sides so float op order agrees.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.exchange import bucketed_map_groups
from featherstore_ray.partition import BUCKET_COL, bucket_of


def _with_bucket(ds: ray.data.Dataset, col: str, num_buckets: int):
    def _add(t: pa.Table) -> pa.Table:
        return t.append_column(
            BUCKET_COL, pa.array(bucket_of(t[col], num_buckets))
        )

    return ds.map_batches(
        _add, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def pagerank(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    round_digits: int = 6,
    num_buckets: int = 64,
    node_col: str = "node",
    rank_col: str = "pr",
) -> ray.data.Dataset:
    """Distributed PageRank over a directed edge list (duplicates ignored).

    Returns ``(node_col, rank_col)`` for every node appearing as src or
    dst, ranks after ``iters`` synchronous iterations, rounded only at the
    end.

    Scale shape (100 TB of edges): out-degrees attach to edges in ONE
    src-bucket exchange (a src's edges co-locate, so the degree is exact
    per kernel) and the decorated edge set materializes once; each
    iteration then streams two exchanges — (edges + ranks) keyed by src to
    emit ``r/deg`` messages, messages + presence rows keyed by dst to
    reduce. Per-node state stays a Dataset; nothing is driver-side except
    the scalar N.
    """
    key = "_pr_key"
    side = "_pr_side"  # 1 = rank row, 0 = edge row

    def _flat(col) -> pa.Array:
        if isinstance(col, pa.ChunkedArray):
            return col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
        return col

    proj = edges.select_columns([src_col, dst_col])

    # one src-bucket exchange: distinct edges + exact out-degree per src
    def dedup_deg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).drop_duplicates([src_col, dst_col])
        deg = df.groupby(src_col)[dst_col].transform("size")
        return pd.DataFrame(
            {
                src_col: df[src_col].to_numpy(),
                dst_col: df[dst_col].to_numpy(),
                "_pr_deg": deg.to_numpy().astype(np.float64),
            }
        )

    edeg = bucketed_map_groups(
        _with_bucket(proj, src_col, num_buckets),
        dedup_deg,
        num_buckets=num_buckets,
        batch_format="pandas",
    ).materialize()

    # node universe with initial rank 1/N
    def nodes_of(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [_flat(t[src_col]).cast(pa.int64()),
             _flat(t[dst_col]).cast(pa.int64())]
        )
        vals = np.unique(both.to_numpy(zero_copy_only=False))
        return pa.table({node_col: pa.array(vals, pa.int64())})

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=[BUCKET_COL]).drop_duplicates(node_col)

    nodes = bucketed_map_groups(
        _with_bucket(
            proj.map_batches(
                nodes_of, batch_size=None, batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            node_col,
            num_buckets,
        ),
        uniq,
        num_buckets=num_buckets,
        batch_format="pandas",
    ).materialize()
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes

    ranks = nodes.map_batches(
        lambda t: t.append_column(
            rank_col, pa.array(np.full(t.num_rows, 1.0 / n_nodes))
        ),
        batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: _flat(t[src_col]).cast(pa.int64()),
                "_pr_dst": _flat(t[dst_col]).cast(pa.int64()),
                "_pr_deg": t["_pr_deg"],
                rank_col: pa.nulls(t.num_rows, pa.float64()),
                side: pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    sym_edges = edeg.map_batches(
        tag_edges, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    for _ in range(iters):

        def tag_ranks(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    key: _flat(t[node_col]).cast(pa.int64()),
                    "_pr_dst": _flat(t[node_col]).cast(pa.int64()),
                    "_pr_deg": pa.array(np.ones(n)),
                    rank_col: t[rank_col],
                    side: pa.array(np.ones(n, dtype=np.int8)),
                }
            )

        tagged = _with_bucket(
            sym_edges.union(
                ranks.map_batches(
                    tag_ranks, batch_size=None, batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            ),
            key,
            num_buckets,
        )

        def scatter(df: pd.DataFrame) -> pd.DataFrame:
            """Edge rows emit (dst, r_src/deg); rank rows emit a presence
            row (node, 0.0) so sinks survive the reduce."""
            is_rank = df[side].to_numpy() == 1
            r = df.loc[is_rank].set_index(key)[rank_col]
            e = df.loc[~is_rank]
            msg = pd.DataFrame(
                {
                    node_col: e["_pr_dst"].to_numpy().astype(np.int64),
                    "_pr_c": (
                        e[key].map(r).to_numpy().astype(np.float64)
                        / e["_pr_deg"].to_numpy()
                    ),
                }
            )
            own = pd.DataFrame(
                {
                    node_col: df.loc[is_rank, "_pr_dst"]
                    .to_numpy().astype(np.int64),
                    "_pr_c": np.zeros(int(is_rank.sum())),
                }
            )
            return pd.concat([msg, own], ignore_index=True)

        messages = _with_bucket(
            bucketed_map_groups(
                tagged, scatter, num_buckets=num_buckets,
                batch_format="pandas",
            ),
            node_col,
            num_buckets,
        )

        def reduce_sum(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(node_col, sort=False)["_pr_c"].sum()
            return pd.DataFrame(
                {
                    node_col: g.index.to_numpy().astype(np.int64),
                    rank_col: base + damping * g.to_numpy(),
                }
            )

        ranks = bucketed_map_groups(
            messages, reduce_sum, num_buckets=num_buckets,
            batch_format="pandas",
        ).materialize()

    def final(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                node_col: t[node_col],
                rank_col: pa.array(
                    np.round(
                        t[rank_col].to_numpy(zero_copy_only=False),
                        round_digits,
                    )
                ),
            }
        )

    return ranks.map_batches(
        final, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def triangle_count(
    edges: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact global triangle count of an undirected graph, by
    degree-ordered wedge checking (the node-iterator++ / forward
    algorithm): orient every edge from its lower (degree, id) endpoint to
    the higher, generate the out-neighbor wedge pairs of each source, and
    count wedges that are themselves oriented edges. Each triangle is
    counted exactly once (at its minimum-(degree, id) corner), and the
    orientation bounds per-node out-degree by O(sqrt(m)), so the wedge
    set stays near-linear even with power-law hubs.

    Stages (all narrow bucket exchanges; int64 columns only):
    canonical-edge dedup → two-stage degree count → two tagged-union
    exchanges to attach endpoint degrees → per-source wedge emission →
    tagged-union wedge/edge match keyed on the wedge's first node →
    driver sum of per-bucket counts. Output: one row ``(triangles,)``.

    Self-loops are dropped; duplicate input edges (either direction)
    count once.
    """

    def canon(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"lo": pa.array(np.minimum(a, b)),
                         "hi": pa.array(np.maximum(a, b))})

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df[["lo", "hi"]].drop_duplicates()

    e = bucketed_map_groups(
        _with_bucket(
            edges.map_batches(canon, batch_size=None, batch_format="pyarrow",
                              zero_copy_batch=True),
            "lo", num_buckets),
        uniq, num_buckets=num_buckets, batch_format="pandas",
    ).materialize()  # consumed by the degree pass AND the attach pass

    # ---- two-stage degree count over both endpoints
    def deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate([
            t["lo"].to_numpy(zero_copy_only=False),
            t["hi"].to_numpy(zero_copy_only=False),
        ])
        n, c = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(n, pa.int64()),
                         "deg": pa.array(c, pa.int64())})

    def deg_merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("node", sort=False)["deg"].sum().reset_index())

    degrees = bucketed_map_groups(
        _with_bucket(
            e.map_batches(deg_partial, batch_size=None,
                          batch_format="pyarrow", zero_copy_batch=True),
            "node", num_buckets),
        deg_merge, num_buckets=num_buckets, batch_format="pandas",
    ).materialize()  # unioned into BOTH attach exchanges

    # ---- attach deg(lo) then deg(hi) via tagged-union exchanges
    def attach(es: ray.data.Dataset, es_cols: list[str], key: str,
               out: str) -> ray.data.Dataset:
        def tag_e(t: pa.Table) -> pa.Table:
            t = t.select(es_cols).append_column("_k", t[key])
            return t.append_column(
                "_deg", pa.nulls(t.num_rows, pa.int64()))

        def tag_d(t: pa.Table) -> pa.Table:
            cols = {c: pa.nulls(t.num_rows, pa.int64()) for c in es_cols}
            cols["_k"] = t["node"].combine_chunks()
            cols["_deg"] = t["deg"].combine_chunks()
            return pa.table(cols)

        tagged = es.map_batches(
            tag_e, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ).union(degrees.map_batches(
            tag_d, batch_size=None, batch_format="pyarrow"))

        def gather(df: pd.DataFrame) -> pd.DataFrame:
            is_d = df[df.columns[0]].isna()
            lut = df.loc[is_d].set_index("_k")["_deg"]
            out_df = df.loc[~is_d].drop(columns=["_deg", BUCKET_COL])
            out_df[out] = out_df["_k"].map(lut).astype(np.int64)
            # pandas null-padding coerced the int columns to float; restore
            for c in out_df.columns:
                if c != out:
                    out_df[c] = out_df[c].astype(np.int64)
            return out_df.drop(columns=["_k"])

        return bucketed_map_groups(
            _with_bucket(tagged, "_k", num_buckets),
            gather, num_buckets=num_buckets, batch_format="pandas",
        )

    e2 = attach(e, ["lo", "hi"], "lo", "dlo")
    e3 = attach(e2, ["lo", "hi", "dlo"], "hi", "dhi")

    # ---- orient by (deg, id); keep dst degree for wedge-pair ordering
    def orient(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        dlo = t["dlo"].to_numpy(zero_copy_only=False)
        dhi = t["dhi"].to_numpy(zero_copy_only=False)
        fwd = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        return pa.table({
            "src": pa.array(np.where(fwd, lo, hi), pa.int64()),
            "dst": pa.array(np.where(fwd, hi, lo), pa.int64()),
            "ddst": pa.array(np.where(fwd, dhi, dlo), pa.int64()),
        })

    oriented = e3.map_batches(
        orient, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed by wedge emission AND the match pass

    from .dedup import pair_indices

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["src", "ddst", "dst"])
        src = d["src"].to_numpy()
        dst = d["dst"].to_numpy()
        ai, bi = pair_indices(src)
        # pairs are emitted in (deg, id) order, matching the orientation
        return pd.DataFrame({"v": dst[ai], "w": dst[bi],
                             "_wedge": np.ones(len(ai), np.int8)})

    w = bucketed_map_groups(
        _with_bucket(oriented, "src", num_buckets),
        lambda df: wedges(df.drop(columns=[BUCKET_COL])),
        num_buckets=num_buckets, batch_format="pandas",
    )

    def tag_edge(t: pa.Table) -> pa.Table:
        return pa.table({
            "v": t["src"].combine_chunks(),
            "w": t["dst"].combine_chunks(),
            "_wedge": pa.array(np.zeros(t.num_rows, np.int8)),
        })

    both = w.union(oriented.map_batches(
        tag_edge, batch_size=None, batch_format="pyarrow"))

    def match(df: pd.DataFrame) -> pd.DataFrame:
        ekeys = df.loc[df["_wedge"] == 0, ["v", "w"]]
        wk = df.loc[df["_wedge"] == 1, ["v", "w"]]
        m = wk.merge(ekeys.drop_duplicates(), on=["v", "w"], how="inner")
        return pd.DataFrame({"n": [np.int64(len(m))]})

    parts = bucketed_map_groups(
        _with_bucket(both, "v", num_buckets),
        lambda df: match(df.drop(columns=[BUCKET_COL])),
        num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()  # one int per bucket
    return ray.data.from_arrow(pa.table(
        {"triangles": pa.array([int(parts["n"].sum())], pa.int64())}))


def label_propagation(
    edges: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    iters: int = 3,
    num_buckets: int = 64,
    node_col: str = "node",
    label_col: str = "community",
) -> ray.data.Dataset:
    """Synchronous label-propagation community detection (LPA) over an
    undirected edge list — the third iterative graph op next to
    connected_components (reachability) and pagerank (centrality):
    labels start as node ids; each round every node adopts the most
    frequent label among its neighbors, ties broken by the SMALLEST
    label (deterministic, SQL-expressible). Duplicate input edges
    (either direction) vote once; self-loops vote the node's own label
    once. ``iters`` synchronous rounds, no convergence check — both
    sides run the identical fixed schedule.

    Scale shape: per-node state (the label vector) stays a Dataset;
    each round is the pagerank two-exchange pattern — (sym edges +
    labels) tagged-union keyed by src to emit one (dst, label) vote per
    neighbor, votes keyed by dst to reduce to the modal label. The
    symmetric edge set is deduped once up front and reused every round.
    """
    key = "_lp_key"
    side = "_lp_side"  # 1 = label row, 0 = edge row

    def sym_of(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a])),
        })

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df[["src", "dst"]].drop_duplicates()

    sym = bucketed_map_groups(
        _with_bucket(
            edges.select_columns([a_col, b_col]).map_batches(
                sym_of, batch_size=None, batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "src", num_buckets),
        uniq, num_buckets=num_buckets, batch_format="pandas",
    ).materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        vals = np.unique(t["src"].to_numpy(zero_copy_only=False))
        return pa.table({node_col: pa.array(vals, pa.int64())})

    def node_uniq(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[node_col]].drop_duplicates()
        out[label_col] = out[node_col].to_numpy()
        return out

    labels = bucketed_map_groups(
        _with_bucket(
            sym.map_batches(node_partial, batch_size=None,
                            batch_format="pyarrow", zero_copy_batch=True),
            node_col, num_buckets),
        node_uniq, num_buckets=num_buckets, batch_format="pandas",
    ).materialize()

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t["src"].combine_chunks(),
            "_lp_dst": t["dst"].combine_chunks(),
            label_col: pa.nulls(t.num_rows, pa.int64()),
            side: pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        })

    sym_tagged = sym.map_batches(
        tag_edges, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    for _ in range(iters):

        def tag_labels(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                key: t[node_col].combine_chunks().cast(pa.int64()),
                "_lp_dst": t[node_col].combine_chunks().cast(pa.int64()),
                label_col: t[label_col].combine_chunks().cast(pa.int64()),
                side: pa.array(np.ones(n, dtype=np.int8)),
            })

        tagged = _with_bucket(
            sym_tagged.union(labels.map_batches(
                tag_labels, batch_size=None, batch_format="pyarrow",
                zero_copy_batch=True,
            )),
            key, num_buckets,
        )

        def scatter(df: pd.DataFrame) -> pd.DataFrame:
            is_lab = df[side].to_numpy() == 1
            lut = df.loc[is_lab].set_index(key)[label_col]
            e = df.loc[~is_lab]
            return pd.DataFrame({
                node_col: e["_lp_dst"].to_numpy().astype(np.int64),
                label_col: e[key].map(lut).to_numpy().astype(np.int64),
            })

        votes = _with_bucket(
            bucketed_map_groups(
                tagged, scatter, num_buckets=num_buckets,
                batch_format="pandas",
            ),
            node_col, num_buckets,
        )

        def modal(df: pd.DataFrame) -> pd.DataFrame:
            c = (
                df.groupby([node_col, label_col], sort=False)
                .size().rename("_c").reset_index()
            )
            c = c.sort_values([node_col, "_c", label_col],
                              ascending=[True, False, True], kind="stable")
            return c.drop_duplicates(node_col)[[node_col, label_col]]

        labels = bucketed_map_groups(
            votes, modal, num_buckets=num_buckets, batch_format="pandas",
        ).materialize()

    return labels


def k_core(
    edges: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    k: int = 2,
    iters: int = 3,
    num_buckets: int = 64,
    node_col: str = "node",
    deg_col: str = "degree",
) -> ray.data.Dataset:
    """k-core peeling over an undirected simple graph — the fourth
    iterative graph op next to connected_components (reachability),
    pagerank (centrality) and label_propagation (community): ``iters``
    synchronous peel rounds, each dropping every node whose degree
    (distinct neighbors in the CURRENT subgraph) is below ``k`` and every
    edge touching a dropped node; no convergence check, both engine and
    oracle run the identical fixed schedule (the label_propagation
    convention — enough rounds converge to the true k-core). Output:
    ``(node, degree)`` — the degree of every surviving node in the
    subgraph after the last round.

    Scale shape: the symmetric edge set dedups once up front; each round
    is three bucket exchanges over Dataset-resident state — degrees
    (group by src), survivor filter on src, survivor filter on dst
    (the LPA tagged-union scatter, never a driver-side node set).
    """
    key = "_kc_key"
    side = "_kc_side"  # 1 = survivor-node row, 0 = edge row

    def sym_of(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b  # self-loops never contribute to core degree
        a, b = a[keep], b[keep]
        return pa.table({
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a])),
        })

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df[["src", "dst"]].drop_duplicates()

    sym = bucketed_map_groups(
        _with_bucket(
            edges.select_columns([a_col, b_col]).map_batches(
                sym_of, batch_size=None, batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "src", num_buckets),
        uniq, num_buckets=num_buckets, batch_format="pandas",
    ).materialize()

    def degrees(sym_ds: ray.data.Dataset) -> ray.data.Dataset:
        def deg_kernel(df: pd.DataFrame) -> pd.DataFrame:
            d = df.groupby("src", sort=True).size().rename(deg_col)
            out = d.reset_index().rename(columns={"src": node_col})
            return out

        return bucketed_map_groups(
            _with_bucket(sym_ds, "src", num_buckets),
            deg_kernel, num_buckets=num_buckets, batch_format="pandas",
        )

    def survivor_filter(sym_ds, survivors, edge_key: str):
        """Keep edges whose ``edge_key`` endpoint is a survivor."""

        def tag_edges(t: pa.Table) -> pa.Table:
            return pa.table({
                key: t[edge_key].combine_chunks(),
                "_kc_other": t["dst" if edge_key == "src" else "src"
                              ].combine_chunks(),
                side: pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            })

        def tag_nodes(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                key: t[node_col].combine_chunks().cast(pa.int64()),
                "_kc_other": pa.nulls(n, pa.int64()),
                side: pa.array(np.ones(n, dtype=np.int8)),
            })

        tagged = _with_bucket(
            sym_ds.map_batches(tag_edges, batch_size=None,
                               batch_format="pyarrow",
                               zero_copy_batch=True)
            .union(survivors.map_batches(
                tag_nodes, batch_size=None, batch_format="pyarrow",
                zero_copy_batch=True)),
            key, num_buckets,
        )

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            is_node = df[side].to_numpy() == 1
            alive = set(df.loc[is_node, key].to_numpy())
            e = df.loc[~is_node]
            m = e[key].isin(alive).to_numpy()
            kept = e.loc[m]
            cols = {"src": kept[key].to_numpy().astype(np.int64),
                    "dst": kept["_kc_other"].to_numpy().astype(np.int64)}
            if edge_key == "dst":
                cols = {"src": cols["dst"], "dst": cols["src"]}
            return pd.DataFrame(cols)

        return bucketed_map_groups(
            tagged, keep, num_buckets=num_buckets, batch_format="pandas",
        )

    for _ in range(iters):
        deg = degrees(sym)

        def alive(df: pd.DataFrame, k=k) -> pd.DataFrame:
            return df.loc[df[deg_col] >= k, [node_col]]

        survivors = deg.map_batches(
            alive, batch_size=None, batch_format="pandas"
        ).materialize()
        sym = survivor_filter(sym, survivors, "src")
        sym = survivor_filter(sym, survivors, "dst").materialize()

    return degrees(sym)


def link_prediction(
    incidence: ray.data.Dataset,
    *,
    item_col: str,
    node_col: str,
    min_common: int = 2,
    max_degree: int = 64,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Neighborhood-overlap link prediction over a bipartite incidence
    table (node ↔ item): for every unordered node pair sharing ≥
    ``min_common`` items, the three classic scores —
    ``cn`` (common neighbors), ``adamic_adar = Σ_item 1/ln(deg(item))``
    and ``resource_alloc = Σ_item 1/deg(item)`` — where ``deg(item)`` is
    the number of DISTINCT nodes incident to the item. Items with
    degree < 2 form no pair; items with degree > ``max_degree`` are
    dropped (hub items contribute ~nothing to AA/RA but dominate the
    pair expansion — the standard pruning, and part of the contract).
    Output: (a, b, cn, adamic_adar, resource_alloc) with ``a < b``.

    Scale shape: ONE hash(item) exchange dedupes (item, node) across
    batch boundaries (the item_similarity lesson: per-batch distinct
    double-counts a split item) and expands each item's pairs via the
    shared triangular ``pair_indices`` — cost Σ deg² bounded by
    ``max_degree``; a second hash(a) exchange sums the per-pair partials.
    Nodes are sorted ascending inside each item so ``a < b`` and the
    emitted pair order are deterministic.
    """
    from featherstore_ray.stages.dedup import pair_indices

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        d = (
            df.drop(columns=[BUCKET_COL])
            .drop_duplicates([item_col, node_col])
            .sort_values([item_col, node_col], kind="stable")
            .reset_index(drop=True)
        )
        empty = pd.DataFrame({
            "a": pd.Series(dtype=d[node_col].dtype),
            "b": pd.Series(dtype=d[node_col].dtype),
            "_w_aa": pd.Series(dtype="float64"),
            "_w_ra": pd.Series(dtype="float64"),
        })
        if d.empty:
            return empty
        items = d[item_col].to_numpy()
        seg = np.ones(len(d), dtype=bool)
        seg[1:] = items[1:] != items[:-1]
        starts = np.flatnonzero(seg)
        deg = np.diff(np.append(starts, len(d)))
        keep = (deg >= 2) & (deg <= max_degree)
        row_keep = np.repeat(keep, deg)
        d = d[row_keep].reset_index(drop=True)
        if d.empty:
            return empty
        ai, bi = pair_indices(d[item_col].to_numpy())
        if len(ai) == 0:
            return empty
        deg_row = np.repeat(deg[keep], deg[keep]).astype(np.float64)
        nodes = d[node_col].to_numpy()
        return pd.DataFrame({
            "a": nodes[ai],
            "b": nodes[bi],
            "_w_aa": 1.0 / np.log(deg_row[ai]),
            "_w_ra": 1.0 / deg_row[ai],
        })

    from featherstore_ray.partition import add_bucket_column

    proj = incidence.select_columns([item_col, node_col]).map_batches(
        lambda t: t.drop_null(), batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = bucketed_map_groups(
        add_bucket_column(proj, item_col, num_buckets),
        expand, num_buckets=num_buckets, batch_format="pandas",
    )

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop(columns=[BUCKET_COL])
            .groupby(["a", "b"], sort=True)
            .agg(cn=("_w_ra", "size"), _aa=("_w_aa", "sum"),
                 _ra=("_w_ra", "sum"))
            .reset_index()
        )
        g = g[g["cn"] >= min_common].reset_index(drop=True)
        g["cn"] = g["cn"].astype(np.int64)
        g["adamic_adar"] = np.round(g.pop("_aa").to_numpy(), round_digits)
        g["resource_alloc"] = np.round(g.pop("_ra").to_numpy(), round_digits)
        return g

    return bucketed_map_groups(
        add_bucket_column(pairs, "a", num_buckets),
        reduce, num_buckets=num_buckets, batch_format="pandas",
    )


def clustering_coefficient(
    edges: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    num_buckets: int = 64,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Per-node local clustering coefficient — the node-level sibling of
    :func:`triangle_count`: ``lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1))``
    with ``T(v)`` the triangles through v and deg over DISTINCT
    neighbors; degree-0/1 nodes report 0. Output: (node, degree,
    triangles, lcc).

    Same physical plan as ``triangle_count`` (canonical dedup, two-stage
    degrees, degree-(deg,id) orientation bounding out-degree by O(√m),
    wedge emission, tagged wedge/edge match) — except each wedge carries
    its source corner, so a matched triangle credits ALL THREE corners
    into per-bucket (node, t) partials; one count exchange and a tagged
    degree join finish. lcc is a ratio of exact ints → float-exact
    cross-engine before the cosmetic rounding.
    """
    from .dedup import pair_indices

    def canon(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"lo": pa.array(np.minimum(a, b)),
                         "hi": pa.array(np.maximum(a, b))})

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df[["lo", "hi"]].drop_duplicates()

    e = bucketed_map_groups(
        _with_bucket(
            edges.map_batches(canon, batch_size=None,
                              batch_format="pyarrow", zero_copy_batch=True),
            "lo", num_buckets),
        uniq, num_buckets=num_buckets, batch_format="pandas",
    ).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate([
            t["lo"].to_numpy(zero_copy_only=False),
            t["hi"].to_numpy(zero_copy_only=False),
        ])
        n, c = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(n, pa.int64()),
                         "deg": pa.array(c, pa.int64())})

    def deg_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", sort=False)["deg"].sum().reset_index()

    degrees = bucketed_map_groups(
        _with_bucket(
            e.map_batches(deg_partial, batch_size=None,
                          batch_format="pyarrow", zero_copy_batch=True),
            "node", num_buckets),
        deg_merge, num_buckets=num_buckets, batch_format="pandas",
    ).materialize()

    def attach(es: ray.data.Dataset, es_cols: list[str], key: str,
               out: str) -> ray.data.Dataset:
        def tag_e(t: pa.Table) -> pa.Table:
            t = t.select(es_cols).append_column("_k", t[key])
            return t.append_column("_deg", pa.nulls(t.num_rows, pa.int64()))

        def tag_d(t: pa.Table) -> pa.Table:
            cols = {c: pa.nulls(t.num_rows, pa.int64()) for c in es_cols}
            cols["_k"] = t["node"].combine_chunks()
            cols["_deg"] = t["deg"].combine_chunks()
            return pa.table(cols)

        tagged = es.map_batches(
            tag_e, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ).union(degrees.map_batches(
            tag_d, batch_size=None, batch_format="pyarrow"))

        def gather(df: pd.DataFrame) -> pd.DataFrame:
            is_d = df[df.columns[0]].isna()
            lut = df.loc[is_d].set_index("_k")["_deg"]
            out_df = df.loc[~is_d].drop(columns=["_deg", BUCKET_COL])
            out_df[out] = out_df["_k"].map(lut).astype(np.int64)
            for c in out_df.columns:
                if c != out:
                    out_df[c] = out_df[c].astype(np.int64)
            return out_df.drop(columns=["_k"])

        return bucketed_map_groups(
            _with_bucket(tagged, "_k", num_buckets),
            gather, num_buckets=num_buckets, batch_format="pandas",
        )

    e2 = attach(e, ["lo", "hi"], "lo", "dlo")
    e3 = attach(e2, ["lo", "hi", "dlo"], "hi", "dhi")

    def orient(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        dlo = t["dlo"].to_numpy(zero_copy_only=False)
        dhi = t["dhi"].to_numpy(zero_copy_only=False)
        fwd = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        return pa.table({
            "src": pa.array(np.where(fwd, lo, hi), pa.int64()),
            "dst": pa.array(np.where(fwd, hi, lo), pa.int64()),
            "ddst": pa.array(np.where(fwd, dhi, dlo), pa.int64()),
        })

    oriented = e3.map_batches(
        orient, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["src", "ddst", "dst"])
        src = d["src"].to_numpy()
        dst = d["dst"].to_numpy()
        ai, bi = pair_indices(src)
        return pd.DataFrame({"v": dst[ai], "w": dst[bi], "u": src[ai],
                             "_wedge": np.ones(len(ai), np.int8)})

    w = bucketed_map_groups(
        _with_bucket(oriented, "src", num_buckets),
        lambda df: wedges(df.drop(columns=[BUCKET_COL])),
        num_buckets=num_buckets, batch_format="pandas",
    )

    def tag_edge(t: pa.Table) -> pa.Table:
        return pa.table({
            "v": t["src"].combine_chunks(),
            "w": t["dst"].combine_chunks(),
            "u": pa.array(np.full(t.num_rows, -1, np.int64)),
            "_wedge": pa.array(np.zeros(t.num_rows, np.int8)),
        })

    both = w.union(oriented.map_batches(
        tag_edge, batch_size=None, batch_format="pyarrow"))

    def match(df: pd.DataFrame) -> pd.DataFrame:
        ekeys = df.loc[df["_wedge"] == 0, ["v", "w"]].drop_duplicates()
        wk = df.loc[df["_wedge"] == 1, ["v", "w", "u"]]
        m = wk.merge(ekeys, on=["v", "w"], how="inner")
        corners = np.concatenate([
            m["u"].to_numpy(np.int64), m["v"].to_numpy(np.int64),
            m["w"].to_numpy(np.int64)])
        n, c = np.unique(corners, return_counts=True)
        return pd.DataFrame({"node": n, "t": c.astype(np.int64)})

    tri_parts = bucketed_map_groups(
        _with_bucket(both, "v", num_buckets),
        lambda df: match(df.drop(columns=[BUCKET_COL])),
        num_buckets=num_buckets, batch_format="pandas",
    )

    # final: union triangle partials (t) with degrees (deg) on hash(node)
    def tag_t(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].combine_chunks(),
            "t": t["t"].combine_chunks(),
            "deg": pa.nulls(t.num_rows, pa.int64()),
        })

    def tag_deg(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].combine_chunks(),
            "t": pa.nulls(t.num_rows, pa.int64()),
            "deg": t["deg"].combine_chunks(),
        })

    merged = tri_parts.map_batches(
        tag_t, batch_size=None, batch_format="pyarrow"
    ).union(degrees.map_batches(
        tag_deg, batch_size=None, batch_format="pyarrow"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        g = df.groupby("node", sort=True)[["t", "deg"]].sum(min_count=1)
        deg = g["deg"].fillna(0).to_numpy(np.int64)
        tri = g["t"].fillna(0).to_numpy(np.int64)
        denom = deg.astype(np.float64) * (deg - 1)
        lcc = np.where(deg >= 2, 2.0 * tri / np.where(denom > 0, denom, 1.0),
                       0.0)
        if round_digits is not None:
            lcc = np.round(lcc, round_digits)
        return pd.DataFrame({
            "node": g.index.to_numpy(np.int64), "degree": deg,
            "triangles": tri, "lcc": lcc,
        })

    return bucketed_map_groups(
        _with_bucket(merged, "node", num_buckets),
        finish, num_buckets=num_buckets, batch_format="pandas",
    )


def hits(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    round_digits: int = 6,
    num_buckets: int = 64,
    node_col: str = "node",
) -> ray.data.Dataset:
    """HITS hubs-and-authorities over a directed edge list (duplicate
    edges ignored) — PageRank's bipartite-importance sibling: per round,
    ``h ← E·a`` then ``a ← Eᵀ·h`` (the a-step uses the round's NEW h),
    each L1-normalized; scores after ``iters`` synchronous rounds,
    rounded only at the edge. Nodes missing a side (no out-edges / no
    in-edges) hold score 0 through the COALESCE the oracle mirrors.

    Scale shape: one src-bucket distinct-edge exchange up front; each
    half-step is the engine's tagged-union message pattern — (edges +
    scores) keyed on the gather endpoint, then contribution partials +
    universe presence rows keyed on the node — plus a one-scalar
    normalization pass. Per-node state stays a Dataset end to end.
    """
    def _flat(col):
        if isinstance(col, pa.ChunkedArray):
            return col.combine_chunks() if col.num_chunks != 1 else \
                col.chunk(0)
        return col

    proj = edges.select_columns([src_col, dst_col])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return (df.drop(columns=[BUCKET_COL])
                .drop_duplicates([src_col, dst_col]))

    e = bucketed_map_groups(
        _with_bucket(proj, src_col, num_buckets), dedup,
        num_buckets=num_buckets, batch_format="pandas",
    ).materialize()

    def nodes_of(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            _flat(t[src_col]).cast(pa.int64()),
            _flat(t[dst_col]).cast(pa.int64()),
        ])
        return pa.table({"node": pa.array(
            np.unique(both.to_numpy(zero_copy_only=False)))})

    def nodes_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=[BUCKET_COL]).drop_duplicates(["node"])

    nodes = bucketed_map_groups(
        _with_bucket(
            e.map_batches(nodes_of, batch_size=None,
                          batch_format="pyarrow", zero_copy_batch=True),
            "node", num_buckets),
        nodes_merge, num_buckets=num_buckets, batch_format="pandas",
    ).materialize()

    def const_scores(v: float) -> ray.data.Dataset:
        def init(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t["node"],
                "_score": pa.array(np.full(t.num_rows, v)),
            })
        return nodes.map_batches(
            init, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True)

    def step(scores: ray.data.Dataset, gather_col: str,
             out_col: str) -> ray.data.Dataset:
        """raw(node) = Σ over edges with edge[gather_col]'s score,
        grouped by edge[out_col]; universe rows contribute 0."""
        def tag_e(t: pa.Table) -> pa.Table:
            return pa.table({
                "_k": _flat(t[gather_col]).cast(pa.int64()),
                "_o": _flat(t[out_col]).cast(pa.int64()),
                "_s": pa.nulls(t.num_rows, pa.float64()),
            })

        def tag_s(t: pa.Table) -> pa.Table:
            return pa.table({
                "_k": _flat(t["node"]).cast(pa.int64()),
                "_o": pa.nulls(t.num_rows, pa.int64()),
                "_s": _flat(t["_score"]),
            })

        tagged = e.map_batches(
            tag_e, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ).union(scores.map_batches(
            tag_s, batch_size=None, batch_format="pyarrow"))

        def gather(df: pd.DataFrame) -> pd.DataFrame:
            is_s = df["_o"].isna()
            lut = df.loc[is_s].set_index("_k")["_s"]
            msgs = df.loc[~is_s]
            if msgs.empty:
                return pd.DataFrame({
                    "node": pd.Series(dtype="int64"),
                    "_c": pd.Series(dtype="float64"),
                })
            contrib = msgs["_k"].map(lut).to_numpy(dtype=np.float64)
            out = (
                pd.DataFrame({"node": msgs["_o"].to_numpy(np.int64),
                              "_c": contrib})
                .groupby("node", sort=True)["_c"].sum().reset_index()
            )
            return out

        partials = bucketed_map_groups(
            _with_bucket(tagged, "_k", num_buckets), gather,
            num_buckets=num_buckets, batch_format="pandas",
        )

        def zero_rows(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": _flat(t["node"]).cast(pa.int64()),
                "_c": pa.array(np.zeros(t.num_rows)),
            })

        allp = partials.union(nodes.map_batches(
            zero_rows, batch_size=None, batch_format="pyarrow"))

        def reduce(df: pd.DataFrame) -> pd.DataFrame:
            return (df.drop(columns=[BUCKET_COL])
                    .groupby("node", sort=True)["_c"].sum().reset_index()
                    .rename(columns={"_c": "_score"}))

        raw = bucketed_map_groups(
            _with_bucket(allp, "node", num_buckets), reduce,
            num_buckets=num_buckets, batch_format="pandas",
        ).materialize()

        def total_part(t: pa.Table) -> pa.Table:
            s = t["_score"].to_numpy(zero_copy_only=False)
            return pa.table({"t": pa.array([float(s.sum())])})

        total = float(raw.map_batches(
            total_part, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_pandas()["t"].sum())

        def norm(t: pa.Table, _tot=total) -> pa.Table:
            s = t["_score"].to_numpy(zero_copy_only=False)
            return pa.table({
                "node": t["node"],
                "_score": pa.array(s / _tot if _tot != 0 else s),
            })

        return raw.map_batches(
            norm, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

    a = const_scores(1.0)
    h = None
    for _ in range(iters):
        h = step(a, gather_col=dst_col, out_col=src_col)
        a = step(h, gather_col=src_col, out_col=dst_col)

    # final hub/authority join stays Dataset-resident: tagged union on
    # hash(node), per-bucket pivot — no driver-side score table
    def tag_side(which: int):
        def tag(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": _flat(t["node"]).cast(pa.int64()),
                "_w": pa.array(np.full(t.num_rows, which, np.int8)),
                "_s": _flat(t["_score"]),
            })
        return tag

    merged = h.map_batches(
        tag_side(0), batch_size=None, batch_format="pyarrow"
    ).union(a.map_batches(
        tag_side(1), batch_size=None, batch_format="pyarrow"))

    def pivot(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        g = df.pivot_table(index="node", columns="_w", values="_s",
                           aggfunc="sum", fill_value=0.0)
        out = pd.DataFrame({
            node_col: g.index.to_numpy(np.int64),
            "hub": np.round(
                g[0].to_numpy() if 0 in g.columns
                else np.zeros(len(g)), round_digits),
            "authority": np.round(
                g[1].to_numpy() if 1 in g.columns
                else np.zeros(len(g)), round_digits),
        })
        return out.sort_values(node_col).reset_index(drop=True)

    return bucketed_map_groups(
        _with_bucket(merged, "node", num_buckets), pivot,
        num_buckets=num_buckets, batch_format="pandas",
    )


def k_truss(
    edges: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    k: int = 4,
    iters: int = 2,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """k-truss peeling — the edge-cohesion sibling of :func:`k_core`
    (node degree) and :func:`triangle_count` (global count): ``iters``
    synchronous rounds, each computing every edge's SUPPORT (number of
    triangles through it in the CURRENT subgraph) and dropping edges
    with support < k−2; a final support pass scores the survivors. No
    convergence check — engine and oracle run the identical fixed
    schedule (the label_propagation / k_core convention). Output:
    ``(lo, hi, support)`` per surviving canonical edge, support measured
    in the FINAL subgraph. Self-loops drop; duplicate edges count once.

    Scale shape: each support pass is three bucket exchanges over
    Dataset-resident int64 state — wedge generation per center (bucket
    on src), wedge↔edge match (tagged union on the wedge's low node),
    per-edge credit count with zero-fill (tagged union on lo). Wedge
    volume is Θ(Σ deg²): for power-law graphs route hubs through the
    degree-ordered orientation first (triangle_count's trick) before
    trussing — documented, not needed for category-grade graphs.
    """
    from featherstore_ray.stages.dedup import pair_indices

    def canon(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"lo": pa.array(np.minimum(a, b)),
                         "hi": pa.array(np.maximum(a, b))})

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df[["lo", "hi"]].drop_duplicates()

    e = bucketed_map_groups(
        _with_bucket(
            edges.map_batches(canon, batch_size=None, batch_format="pyarrow",
                              zero_copy_batch=True),
            "lo", num_buckets),
        uniq, num_buckets=num_buckets, batch_format="pandas",
    ).materialize()

    def support(e_ds: ray.data.Dataset) -> ray.data.Dataset:
        def sym_of(t: pa.Table) -> pa.Table:
            lo = t["lo"].to_numpy(zero_copy_only=False)
            hi = t["hi"].to_numpy(zero_copy_only=False)
            return pa.table({
                "src": pa.array(np.concatenate([lo, hi])),
                "dst": pa.array(np.concatenate([hi, lo])),
            })

        sym = e_ds.map_batches(sym_of, batch_size=None,
                               batch_format="pyarrow", zero_copy_batch=True)

        def wedge_kernel(df: pd.DataFrame) -> pd.DataFrame:
            d = df.drop(columns=[BUCKET_COL]).sort_values(["src", "dst"])
            src = d["src"].to_numpy(np.int64)
            dst = d["dst"].to_numpy(np.int64)
            ai, bi = pair_indices(src)
            return pd.DataFrame({"k1": dst[ai], "k2": dst[bi],
                                 "c": src[ai] if len(ai) else
                                 np.empty(0, np.int64)})

        wedges = bucketed_map_groups(
            _with_bucket(sym, "src", num_buckets),
            wedge_kernel, num_buckets=num_buckets, batch_format="pandas",
        )

        def tag_e(t: pa.Table) -> pa.Table:
            return pa.table({
                "k1": t["lo"].combine_chunks(),
                "k2": t["hi"].combine_chunks(),
                "c": pa.array(np.full(t.num_rows, -1, np.int64)),
            })

        union = wedges.union(e_ds.map_batches(
            tag_e, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True))

        def match_kernel(df: pd.DataFrame) -> pd.DataFrame:
            d = df.drop(columns=[BUCKET_COL])
            ed = d.loc[d["c"] == -1, ["k1", "k2"]]
            wd = d[d["c"] >= 0]
            m = wd.merge(ed, on=["k1", "k2"])
            if m.empty:
                return pd.DataFrame({"lo": pd.Series(dtype="int64"),
                                     "hi": pd.Series(dtype="int64")})
            u = m["k1"].to_numpy(np.int64)
            w2 = m["k2"].to_numpy(np.int64)
            c = m["c"].to_numpy(np.int64)
            return pd.DataFrame({
                "lo": np.concatenate([u, np.minimum(u, c),
                                      np.minimum(w2, c)]),
                "hi": np.concatenate([w2, np.maximum(u, c),
                                      np.maximum(w2, c)]),
            })

        credits = bucketed_map_groups(
            _with_bucket(union, "k1", num_buckets),
            match_kernel, num_buckets=num_buckets, batch_format="pandas",
        )

        def tag_cr(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.ones(t.num_rows, np.int64)))

        def tag_e2(t: pa.Table) -> pa.Table:
            return pa.table({
                "lo": t["lo"].combine_chunks(),
                "hi": t["hi"].combine_chunks(),
                "side": pa.array(np.zeros(t.num_rows, np.int64)),
            })

        union2 = credits.map_batches(
            tag_cr, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ).union(e_ds.map_batches(
            tag_e2, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True))

        def count_kernel(df: pd.DataFrame) -> pd.DataFrame:
            d = df.drop(columns=[BUCKET_COL])
            ed = d.loc[d["side"] == 0, ["lo", "hi"]]
            if ed.empty:
                return pd.DataFrame({"lo": pd.Series(dtype="int64"),
                                     "hi": pd.Series(dtype="int64"),
                                     "support": pd.Series(dtype="int64")})
            cr = d[d["side"] == 1]
            cnt = (cr.groupby(["lo", "hi"], sort=False).size()
                   .rename("support").reset_index())
            out = ed.merge(cnt, on=["lo", "hi"], how="left")
            out["support"] = (out["support"].fillna(0)
                              .astype(np.int64))
            return out

        return bucketed_map_groups(
            _with_bucket(union2, "lo", num_buckets),
            count_kernel, num_buckets=num_buckets, batch_format="pandas",
        )

    thr = int(k) - 2

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.greater_equal(t["support"], thr))
        return t.select(["lo", "hi"])

    for _ in range(int(iters)):
        sup = support(e)
        e = sup.map_batches(keep, batch_size=None, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    return support(e)


def _sym_distinct(
    edges: ray.data.Dataset,
    a_col: str,
    b_col: str,
    *,
    num_buckets: int,
    drop_self_loops: bool = False,
) -> ray.data.Dataset:
    """Distinct symmetric (src, dst) edge set from a possibly-duplicated
    undirected edge list — every undirected edge appears in BOTH
    directions exactly once (the ``sym`` CTE every graph oracle uses).
    One src-keyed exchange; each bucket holds every row of its src keys,
    so a per-bucket drop_duplicates is globally exact."""

    def sym_of(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if drop_self_loops:
            keep = a != b
            a, b = a[keep], b[keep]
        return pa.table({
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a])),
        })

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df[["src", "dst"]].drop_duplicates()

    return bucketed_map_groups(
        _with_bucket(
            edges.select_columns([a_col, b_col]).map_batches(
                sym_of, batch_size=None, batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "src", num_buckets),
        uniq, num_buckets=num_buckets, batch_format="pandas",
    )


def assortativity(
    edges: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Degree assortativity coefficient of an undirected graph — Pearson
    correlation of (deg(src), deg(dst)) over the DIRECTED symmetric edge
    list (Newman 2002): r > 0 means hubs attach to hubs (social-network
    shape), r < 0 means hubs attach to leaves (bipartite/star shape).
    Self-loops drop; duplicate input edges count once. Every moment is
    an exact int64 (degree products), so the closed-form ratio is
    IEEE-identical cross-engine; null r when either variance term is 0.

    Scale shape: TWO bucket exchanges, no joins of node tables — the
    symmetric edge set is keyed by src (a src's full row set shares the
    bucket, so deg(src) = the group size), then re-keyed by dst where,
    by symmetry, deg(dst) = that dst's row count; each bucket then emits
    ONE six-int moment partial and the driver folds ``num_buckets``
    partials with Python ints (no overflow at any scale).
    """
    sym = _sym_distinct(edges, a_col, b_col, num_buckets=num_buckets,
                        drop_self_loops=True)

    def attach_x(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["src", "dst"]].copy()
        out["x"] = df.groupby("src", sort=False)["dst"].transform("size")
        return out

    xed = bucketed_map_groups(
        _with_bucket(sym, "src", num_buckets), attach_x,
        num_buckets=num_buckets, batch_format="pandas",
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.int64)
        y = df.groupby("dst", sort=False)["src"].transform(
            "size").to_numpy(np.int64)
        return pd.DataFrame({
            "n": [np.int64(len(x))],
            "sx": [x.sum()], "sy": [y.sum()],
            "sxy": [(x * y).sum()],
            "sxx": [(x * x).sum()], "syy": [(y * y).sum()],
        })

    parts = bucketed_map_groups(
        _with_bucket(xed, "dst", num_buckets), moments,
        num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()

    n = int(parts["n"].sum())
    sx, sy = int(parts["sx"].sum()), int(parts["sy"].sum())
    sxy = int(parts["sxy"].sum())
    sxx, syy = int(parts["sxx"].sum()), int(parts["syy"].sum())
    num = n * sxy - sx * sy
    d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
    if d1 > 0 and d2 > 0:
        r = round(float(num) / np.sqrt(float(d1) * float(d2)),
                  round_digits)
    else:
        r = float("nan")
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "n_edges": pa.array([n], pa.int64()),
        "r": pa.array([r], pa.float64()),
    }))


def bfs_distances(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    node_col: str = "node",
    iters: int = 3,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Bounded-hop multi-source BFS — shortest hop distance from a seed
    set within ``iters`` hops (the reachability-with-distance member of
    the iterative family: connected_components answers *whether*,
    bfs_distances answers *how far*). Unreached nodes are absent from
    the output; all distances are exact ints. d_{i}(v) = min(d_{i-1}(v),
    1 + min over in-neighbors' d_{i-1}) — the fixed synchronous schedule
    the unrolled-CTE oracle mirrors.

    Scale shape: the distance vector stays a Dataset; each round is the
    pagerank two-exchange pattern (tagged union of edges + state keyed
    by src emits (dst, d+1) candidates and re-emits state; a node-keyed
    exchange reduces to the min). Edge rows carry dist = -1 instead of a
    null (the int→float null-pad coercion class). Seeds outside the edge
    set still report dist 0.
    """
    sym = _sym_distinct(edges, a_col, b_col,
                        num_buckets=num_buckets).materialize()

    def edge_tag(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "key": t["src"].combine_chunks(),
            "_dst": t["dst"].combine_chunks(),
            "_dist": pa.array(np.full(n, -1, np.int64)),
            "_side": pa.array(np.zeros(n, np.int8)),
        })

    tagged_edges = sym.map_batches(
        edge_tag, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def seed_tag(t: pa.Table) -> pa.Table:
        v = np.unique(t[node_col].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        n = len(v)
        return pa.table({
            "key": pa.array(v),
            "_dst": pa.array(np.full(n, -1, np.int64)),
            "_dist": pa.array(np.zeros(n, np.int64)),
            "_side": pa.array(np.ones(n, np.int8)),
        })

    def dedup_min(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("key", sort=False, as_index=False)["_dist"]
               .min())
        out["_dst"] = np.int64(-1)
        out["_side"] = np.int8(1)
        return out[["key", "_dst", "_dist", "_side"]]

    # seed state: distinct seed nodes at dist 0 (one node-keyed exchange)
    state = bucketed_map_groups(
        _with_bucket(
            seeds.select_columns([node_col]).map_batches(
                seed_tag, batch_size=None, batch_format="pyarrow",
                zero_copy_batch=True),
            "key", num_buckets),
        dedup_min, num_buckets=num_buckets, batch_format="pandas",
    ).materialize()

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        st = df[df["_side"] == 1]
        ed = df[df["_side"] == 0]
        cand = ed.merge(st[["key", "_dist"]], on="key", how="inner")
        out = pd.DataFrame({
            "key": np.concatenate([
                cand["_dst"].to_numpy(np.int64),
                st["key"].to_numpy(np.int64)]),
            "_dist": np.concatenate([
                cand["_dist_y"].to_numpy(np.int64) + 1,
                st["_dist"].to_numpy(np.int64)]),
        })
        out["_dst"] = np.int64(-1)
        out["_side"] = np.int8(1)
        return out[["key", "_dst", "_dist", "_side"]]

    for _ in range(int(iters)):
        waved = bucketed_map_groups(
            _with_bucket(tagged_edges.union(state), "key", num_buckets),
            expand, num_buckets=num_buckets, batch_format="pandas",
        )
        state = bucketed_map_groups(
            _with_bucket(waved, "key", num_buckets),
            dedup_min, num_buckets=num_buckets, batch_format="pandas",
        ).materialize()

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            node_col: t["key"].combine_chunks(),
            "dist": t["_dist"].combine_chunks(),
        })

    return state.map_batches(finish, batch_size=None,
                             batch_format="pyarrow", zero_copy_batch=True)


def modularity(
    edges: ray.data.Dataset,
    labels: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    node_col: str = "node",
    label_col: str = "community",
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-community Newman modularity terms of a node partition —
    THE quality score for community detection (pairs with
    :func:`label_propagation`, which produces the partition this op
    grades): over the directed symmetric self-loop-free edge set E,
    ``q_term(c) = intra_c/|E| − (deg_c/|E|)²`` where ``intra_c`` counts
    directed edges inside c and ``deg_c = Σ_{v∈c} deg(v)``; Q = Σ q_term.
    All counts are exact ints; the two divisions mirror IEEE-identically.
    Communities with nodes but no surviving edges report 0-count rows
    (q_term exactly 0).

    Scale shape: labels join onto edges via two tagged-union bucket
    exchanges (src then dst — the pagerank message pattern, no node
    table is ever broadcast); per-bucket integer count partials merge in
    ONE community-keyed exchange together with the label rows (node
    counts), and |E| is a distributed ``Dataset.count()``.
    """
    sym = _sym_distinct(edges, a_col, b_col, num_buckets=num_buckets,
                        drop_self_loops=True).materialize()
    m2 = sym.count()

    def edge_tag(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "key": t["src"].combine_chunks(),
            "_dst": t["dst"].combine_chunks(),
            "_lab": pa.array(np.full(n, -1, np.int64)),
            "_side": pa.array(np.zeros(n, np.int8)),
        })

    def label_tag(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "key": pc_cast_i64(t[node_col]),
            "_dst": pa.array(np.full(n, -1, np.int64)),
            "_lab": pc_cast_i64(t[label_col]),
            "_side": pa.array(np.ones(n, np.int8)),
        })

    def pc_cast_i64(col):
        import pyarrow.compute as pc
        return pc.cast(col, pa.int64())

    lab_tagged = labels.map_batches(
        label_tag, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def attach_src(df: pd.DataFrame) -> pd.DataFrame:
        st = df[df["_side"] == 1][["key", "_lab"]]
        ed = df[df["_side"] == 0][["key", "_dst"]]
        j = ed.merge(st, on="key", how="inner")
        return pd.DataFrame({
            "key": j["_dst"].to_numpy(np.int64),
            "_dst": np.int64(-1),
            "_lab": j["_lab"].to_numpy(np.int64),
            "_side": np.int8(0),
        })

    e_src = bucketed_map_groups(
        _with_bucket(
            sym.map_batches(edge_tag, batch_size=None,
                            batch_format="pyarrow", zero_copy_batch=True)
            .union(lab_tagged),
            "key", num_buckets),
        attach_src, num_buckets=num_buckets, batch_format="pandas",
    )

    def count_partials(df: pd.DataFrame) -> pd.DataFrame:
        st = df[df["_side"] == 1][["key", "_lab"]]
        ed = df[df["_side"] == 0]
        j = ed.merge(st.rename(columns={"_lab": "_lab_dst"}),
                     on="key", how="inner")
        csrc = j["_lab"].to_numpy(np.int64)
        cdst = j["_lab_dst"].to_numpy(np.int64)
        g = pd.DataFrame({"c": csrc,
                          "_intra": (csrc == cdst).astype(np.int64)})
        agg = g.groupby("c", as_index=False).agg(
            deg_sum=("_intra", "size"), intra=("_intra", "sum"))
        agg["deg_sum"] = agg["deg_sum"].astype(np.int64)
        agg["n_nodes"] = np.int64(0)
        nn = st.groupby("_lab", as_index=False).size().rename(
            columns={"_lab": "c", "size": "n_nodes"})
        nn["deg_sum"] = np.int64(0)
        nn["intra"] = np.int64(0)
        nn["n_nodes"] = nn["n_nodes"].astype(np.int64)
        return pd.concat(
            [agg[["c", "n_nodes", "deg_sum", "intra"]],
             nn[["c", "n_nodes", "deg_sum", "intra"]]],
            ignore_index=True)

    # dst-keyed exchange: edge rows (now labeled with c_src) meet label
    # rows to resolve c_dst AND contribute their node counts; emits
    # per-bucket integer partials keyed by community
    parts = bucketed_map_groups(
        _with_bucket(e_src.union(lab_tagged), "key", num_buckets),
        count_partials, num_buckets=num_buckets, batch_format="pandas",
    )

    def merge_comm(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("c", as_index=False)[
            ["n_nodes", "deg_sum", "intra"]].sum()
        m2f = float(m2)
        t = out["deg_sum"].to_numpy(np.int64) / m2f
        q = out["intra"].to_numpy(np.int64) / m2f - t * t
        out["q_term"] = np.round(q, round_digits)
        out = out.rename(columns={"c": label_col})
        for c in ("n_nodes", "deg_sum", "intra"):
            out[c] = out[c].astype(np.int64)
        return out[[label_col, "n_nodes", "deg_sum", "intra", "q_term"]]

    return bucketed_map_groups(
        _with_bucket(parts, "c", num_buckets), merge_comm,
        num_buckets=num_buckets, batch_format="pandas",
    )


def random_walks(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    walk_len: int = 4,
    walks_per_node: int = 2,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """DeepWalk-style deterministic random-walk corpus over a directed
    edge list (duplicates ignored) — the graph-to-token bridge: walks
    feed skip-gram / co-occurrence trainers exactly like text windows.
    From EVERY node (src or dst), ``walks_per_node`` walks of up to
    ``walk_len`` steps; at step ``s`` the walk at node ``cur`` moves to
    the neighbor with rank

        ((cur*1000003 + start*999983 + walk*97 + s*31) % 2147483647)
            % out_degree(cur)

    among its distinct out-neighbors in ascending dst order — the
    multiplicative-hash determinism convention (weighted_sample /
    negative_sampling), so the oracle joins on the identical rank
    expression against ``row_number() OVER (PARTITION BY src ORDER BY
    dst) - 1``. Walks stop early at sink nodes (no out-edges) — the
    join drops them identically in both engines. Node ids must be
    non-negative ints < ~9e12 (the hash product must stay in BIGINT).

    Output: (start, walk, step, node) with step 0 = the start itself.

    Scale shape: the tagged adjacency materializes once; each step is
    ONE hash(node) exchange of (adjacency ∪ frontier) — the pagerank
    convention — whose kernel dedupes its bucket's edges (lexsort),
    binary-searches each frontier row's neighbor range and emits the
    next frontier. Frontier size is nodes × walks, never edges × walks;
    sentinel -1 fills keep every tagged column int64 (no pandas
    null-padding float drift).
    """
    key, side = "_rw_key", "_rw_side"

    proj = edges.select_columns([src_col, dst_col])

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = t[src_col].cast(pa.int64())
        d = t[dst_col].cast(pa.int64())
        return pa.table({
            key: s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s,
            "_rw_dst": d.combine_chunks()
            if isinstance(d, pa.ChunkedArray) else d,
            "_rw_start": pa.array(np.full(n, -1, np.int64)),
            "_rw_walk": pa.array(np.full(n, -1, np.int64)),
            side: pa.array(np.zeros(n, np.int8)),
        })

    adj = proj.map_batches(
        tag_edges, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    def nodes_of(t: pa.Table) -> pa.Table:
        both = np.concatenate([
            t[key].to_numpy(zero_copy_only=False),
            t["_rw_dst"].to_numpy(zero_copy_only=False)])
        return pa.table({"node": pa.array(np.unique(both), pa.int64())})

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df[["node"]].drop_duplicates()

    nodes = bucketed_map_groups(
        _with_bucket(
            adj.map_batches(nodes_of, batch_size=None,
                            batch_format="pyarrow", zero_copy_batch=True),
            "node", num_buckets),
        uniq, num_buckets=num_buckets, batch_format="pandas",
    )

    def expand_walks(t: pa.Table) -> pa.Table:
        n = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "_rw_start": pa.array(np.repeat(n, walks_per_node)),
            "_rw_walk": pa.array(np.tile(
                np.arange(walks_per_node, dtype=np.int64), len(n))),
            "_rw_cur": pa.array(np.repeat(n, walks_per_node)),
        })

    frontier = nodes.map_batches(
        expand_walks, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    def out_step(step: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "start": t["_rw_start"],
                "walk": t["_rw_walk"],
                "step": pa.array(
                    np.full(t.num_rows, step, np.int64)),
                "node": t["_rw_cur"],
            })
        return fn

    outs = [frontier.map_batches(out_step(0), batch_size=None,
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)]

    for s in range(1, walk_len + 1):

        def tag_frontier(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                key: t["_rw_cur"],
                "_rw_dst": pa.array(np.full(n, -1, np.int64)),
                "_rw_start": t["_rw_start"],
                "_rw_walk": t["_rw_walk"],
                side: pa.array(np.ones(n, np.int8)),
            })

        def make_step(step: int):
            def kernel(df: pd.DataFrame) -> pd.DataFrame:
                df = df.drop(columns=[BUCKET_COL])
                empty = pd.DataFrame({
                    "_rw_start": pd.Series(dtype="int64"),
                    "_rw_walk": pd.Series(dtype="int64"),
                    "_rw_cur": pd.Series(dtype="int64"),
                })
                sv = df[side].to_numpy()
                fr = df[sv == 1]
                ad = df[sv == 0]
                if fr.empty or ad.empty:
                    return empty
                asrc = ad[key].to_numpy(np.int64)
                adst = ad["_rw_dst"].to_numpy(np.int64)
                order = np.lexsort((adst, asrc))
                asrc, adst = asrc[order], adst[order]
                keep = np.ones(len(asrc), bool)
                keep[1:] = (asrc[1:] != asrc[:-1]) | (adst[1:] != adst[:-1])
                asrc, adst = asrc[keep], adst[keep]
                cur = fr[key].to_numpy(np.int64)
                start = fr["_rw_start"].to_numpy(np.int64)
                walk = fr["_rw_walk"].to_numpy(np.int64)
                lo = np.searchsorted(asrc, cur, side="left")
                hi = np.searchsorted(asrc, cur, side="right")
                deg = hi - lo
                ok = deg > 0
                if not ok.any():
                    return empty
                h = (cur[ok] * 1000003 + start[ok] * 999983
                     + walk[ok] * 97 + step * 31) % 2147483647
                nxt = adst[lo[ok] + (h % deg[ok])]
                return pd.DataFrame({
                    "_rw_start": start[ok],
                    "_rw_walk": walk[ok],
                    "_rw_cur": nxt,
                })
            return kernel

        frontier = bucketed_map_groups(
            _with_bucket(
                adj.union(frontier.map_batches(
                    tag_frontier, batch_size=None, batch_format="pyarrow",
                    zero_copy_batch=True)),
                key, num_buckets),
            make_step(s), num_buckets=num_buckets, batch_format="pandas",
        ).materialize()
        if frontier.count() == 0:
            break
        outs.append(frontier.map_batches(
            out_step(s), batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True))

    return outs[0].union(*outs[1:]) if len(outs) > 1 else outs[0]
