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
