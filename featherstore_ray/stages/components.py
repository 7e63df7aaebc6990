"""Connected components over an edge list — near-dup group linking.

The dedup family (MinHash-LSH, SimHash, embedding near-dup) produces
candidate PAIRS; turning pairs into duplicate GROUPS is a connected-components
problem. Two implementations with one semantics (label = min node id in the
component, native ordering — numeric for ints, lexicographic for strings):

- ``components_numpy``: driver-side, fully vectorized label propagation with
  pointer jumping (O(E) per round, O(log n) rounds). Right up to ~10^7 edges
  on one node; no Python-loop union-find.
- ``connected_components``: distributed hash-min label propagation as Ray
  Dataset stages (two bucket shuffles per round: gather neighbor labels,
  then min per node), converging when no label changes. Right when the edge
  set itself is too big for one driver (10^12-doc corpora with high dup
  rates). LSH components are near-star-shaped, so rounds ≈ 3-5 in practice;
  ``max_iters`` bounds pathological chains.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.exchange import bucketed_map_groups
from featherstore_ray.partition import BUCKET_COL, bucket_of


def components_numpy(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected components over edges (a[i], b[i]).

    Returns (nodes, labels): every node appearing in any edge, with its
    component's min node id (native ordering). Deterministic.
    """
    both = np.concatenate([np.asarray(a), np.asarray(b)])
    nodes, inv = np.unique(both, return_inverse=True)
    ea, eb = inv[: len(a)], inv[len(a) :]
    labels = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = labels.copy()
        # min over incoming messages along both edge directions
        np.minimum.at(new, ea, labels[eb])
        np.minimum.at(new, eb, labels[ea])
        new = new[new]  # pointer jumping halves the remaining depth
        if np.array_equal(new, labels):
            break
        labels = new
    # nodes is sorted by np.unique, so labels index the component-min node
    return nodes, nodes[labels]


def connected_components(
    edges: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    node_col: str = "node",
    label_col: str = "dup_group",
    num_buckets: int = 64,
    max_iters: int = 50,
    driver_edge_cap: int = 2_000_000,
) -> ray.data.Dataset:
    """Distributed connected components: hash-min label propagation.

    Output: Dataset of (node_col, label_col) — one row per distinct node,
    label = component min. Each round is two bucket shuffles over
    (edges + labels); labels materialize between rounds (iterative state
    must not re-derive its lineage). Converges when zero labels change.

    Adaptive crossover: edge sets at or below ``driver_edge_cap`` run the
    vectorized driver-side :func:`components_numpy` instead — each
    distributed round costs two exchanges of fixed Ray overhead, which
    dwarfs the O(E) numpy pass until E is in the millions. Candidate-pair
    sets after LSH/blocking are usually far below the cap even on huge
    corpora, so the default needs no caller knowledge; ``driver_edge_cap=0``
    forces the distributed rounds (used by the scale-path driver query and
    the parity tests).
    """
    if driver_edge_cap:
        edges = edges.materialize()
        if edges.count() <= driver_edge_cap:
            pairs = edges.select_columns([a_col, b_col]).to_pandas()
            typ = edges.schema().base_schema.field(a_col).type
            if pairs.empty:
                return ray.data.from_arrow(pa.table({
                    node_col: pa.array([], typ), label_col: pa.array([], typ),
                }))
            nodes, labels = components_numpy(
                pairs[a_col].to_numpy(), pairs[b_col].to_numpy())
            return ray.data.from_arrow(pa.table({
                node_col: pa.array(nodes, typ), label_col: pa.array(labels, typ),
            }))

    key = "_cc_key"
    side = "_cc_side"  # 1 = label row, 0 = edge row

    def _flat(col) -> pa.Array:
        if isinstance(col, pa.ChunkedArray):
            return col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
        return col

    def init_nodes(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([_flat(t[a_col]), _flat(t[b_col])])
        vals = np.unique(both.to_numpy(zero_copy_only=False))
        arr = pa.array(vals, type=t.schema.field(a_col).type)
        return pa.table({node_col: arr, label_col: arr})

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=[BUCKET_COL]).drop_duplicates(node_col)

    def with_bucket(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
        def _add(t: pa.Table) -> pa.Table:
            return t.append_column(
                BUCKET_COL, pa.array(bucket_of(t[col], num_buckets))
            )

        return ds.map_batches(_add, batch_size=None, batch_format="pyarrow",
                              zero_copy_batch=True)

    labels = bucketed_map_groups(
        with_bucket(
            edges.map_batches(init_nodes, batch_size=None,
                              batch_format="pyarrow", zero_copy_batch=True),
            node_col,
        ),
        uniq,
        num_buckets=num_buckets,
        batch_format="pandas",
    ).materialize()

    # symmetric edge view tagged by the endpoint whose label we gather
    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        a, b = _flat(t[a_col]), _flat(t[b_col])
        return pa.table(
            {
                key: pa.concat_arrays([b, a]),
                node_col: pa.concat_arrays([a, b]),
                label_col: pa.nulls(2 * n, type=t.schema.field(a_col).type),
                side: pa.array(np.zeros(2 * n, dtype=np.int8)),
            }
        )

    sym_edges = edges.map_batches(
        tag_edges, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    for _ in range(max_iters):

        def tag_labels(t: pa.Table) -> pa.Table:
            """Label rows (self messages) + pointer-jumping shortcut edges
            (node -> its current label): node then receives label[label[node]]
            each round, so chains converge in O(log diameter) rounds instead
            of O(diameter)."""
            n = t.num_rows
            node, lab = _flat(t[node_col]), _flat(t[label_col])
            typ = t.schema.field(label_col).type
            return pa.table(
                {
                    key: pa.concat_arrays([node, lab]),
                    node_col: pa.concat_arrays([node, node]),
                    label_col: pa.concat_arrays(
                        [lab, pa.nulls(n, type=typ).cast(typ)]
                    ),
                    side: pa.array(
                        np.concatenate(
                            [np.ones(n, dtype=np.int8), np.zeros(n, dtype=np.int8)]
                        )
                    ),
                }
            )

        tagged = sym_edges.union(
            labels.map_batches(tag_labels, batch_size=None,
                               batch_format="pyarrow", zero_copy_batch=True)
        )
        tagged = with_bucket(tagged, key)

        def gather(df: pd.DataFrame) -> pd.DataFrame:
            """Per bucket: edge rows pick up their key endpoint's label;
            label rows pass through (self message, keeps old label)."""
            is_label = df[side].to_numpy() == 1
            lab = df.loc[is_label, [key, label_col]].set_index(key)[label_col]
            e = df.loc[~is_label, [key, node_col]]
            msg = pd.DataFrame(
                {
                    node_col: e[node_col].to_numpy(),
                    label_col: e[key].map(lab).to_numpy(),
                    "_cc_self": np.zeros(len(e), dtype=np.int8),
                }
            )
            own = pd.DataFrame(
                {
                    node_col: df.loc[is_label, node_col].to_numpy(),
                    label_col: df.loc[is_label, label_col].to_numpy(),
                    "_cc_self": np.ones(int(is_label.sum()), dtype=np.int8),
                }
            )
            out = pd.concat([msg, own], ignore_index=True)
            # the tagged union null-pads label_col on edge rows, which
            # coerces int64 -> float64 in pandas; restore the node dtype
            out[label_col] = out[label_col].astype(df[node_col].dtype)
            return out

        messages = bucketed_map_groups(
            tagged, gather, num_buckets=num_buckets, batch_format="pandas"
        )
        messages = with_bucket(messages, node_col)

        def reduce_min(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(node_col, sort=False)
            new = g[label_col].min()
            old = df[df["_cc_self"] == 1].set_index(node_col)[label_col]
            out = new.reset_index()
            out["_cc_changed"] = (
                new.to_numpy() != old.reindex(new.index).to_numpy()
            ).astype(np.int64)
            return out

        new_labels = bucketed_map_groups(
            messages, reduce_min, num_buckets=num_buckets,
            batch_format="pandas",
        ).materialize()
        changed = new_labels.sum("_cc_changed")
        labels = new_labels.drop_columns(["_cc_changed"]).materialize()
        if not changed:
            break
    return labels
