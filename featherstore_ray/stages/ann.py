"""Similarity search over an embedding column (``list<float>``).

- ``cosine_topk``: exact brute-force top-k — the baseline. Query matrix is
  broadcast ONCE (``ray.put``), every batch does one float64 matmul, emits
  only its per-batch top-k partials, and a tiny final reduce merges them.
  Shuffle cost: O(num_queries * k * batches), never the corpus.
- ``lsh_topk``: scale path 1 — random-hyperplane (SimHash) bucketing;
  each corpus row lands in one bucket per table, queries probe their own
  buckets only. Approximate (documented recall/probe tradeoff), same
  partial-topk reduce.
- ``ivf_topk``: scale path 2 — IVF (inverted-file) search: k-means
  centroids trained on a deterministic sample, each corpus row assigned to
  its nearest centroid, queries probe only their ``n_probe`` nearest cells.
  Recall rises with ``n_probe`` (``n_probe == n_centroids`` → exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _stack_embeddings(col: pa.ChunkedArray) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    dim = offsets[1] - offsets[0]
    return flat.reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _TopKScorer:
    """Actor: holds the broadcast normalized query matrix; scores batches."""

    def __init__(self, qref, id_col, emb_col, k, round_digits):
        q = ray.get(qref)
        self.qids = q["ids"]
        self.qm = q["matrix"]  # already normalized, float64
        self.id_col = id_col
        self.emb_col = emb_col
        self.k = k
        self.round_digits = round_digits

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    self.id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        emb = _normalize(_stack_embeddings(t[self.emb_col]))
        scores = emb @ self.qm.T  # (n, nq)
        self_mask = ids[:, None] == self.qids[None, :]
        scores = np.where(self_mask, -np.inf, scores)
        k = min(self.k, n)
        top = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, nq)
        nq = len(self.qids)
        qcol = np.repeat(self.qids, k)
        icol = ids[top.T.reshape(-1)]
        scol = scores[top.T.reshape(-1), np.repeat(np.arange(nq), k)]
        keep = np.isfinite(scol)
        if self.round_digits is not None:
            scol = np.round(scol, self.round_digits)
        return pa.table(
            {
                "query_id": pa.array(qcol[keep].astype(np.int64)),
                self.id_col: pa.array(icol[keep].astype(np.int64)),
                "score": pa.array(scol[keep]),
            }
        )


def cosine_topk(
    ds: ray.data.Dataset,
    queries: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = 4,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Exact cosine top-k of each query over the corpus (self-matches excluded).

    Ties on (rounded) score break by ascending ``id_col`` — deterministic and
    expressible in oracle SQL (``ORDER BY round(score, d) DESC, vec_id``).
    """
    qm = _normalize(_stack_embeddings(queries[emb_col]))
    qids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    qref = ray.put({"ids": qids, "matrix": qm})

    partials = ds.map_batches(_TopKScorer, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_args=(qref, id_col, emb_col, k, round_digits),
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["score", id_col], ascending=[False, True], kind="stable"
        ).head(k)
        return df.reset_index(drop=True)

    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def _kmeans_lite(
    sample: np.ndarray, n_centroids: int, *, iters: int = 10, seed: int = 13
) -> np.ndarray:
    """Deterministic spherical k-means on a (normalized) sample matrix.

    Seeded kmeans++-style init; cosine assignment via matmul; empty
    clusters re-seeded from the farthest points. Small/driver-side: the
    sample is bounded, never the corpus.
    """
    rng = np.random.default_rng(seed)
    n = len(sample)
    n_centroids = min(n_centroids, n)
    first = int(rng.integers(0, n))
    cent = [sample[first]]
    sims = sample @ sample[first]
    for _ in range(1, n_centroids):
        d = 1.0 - sims  # cosine distance to nearest chosen centroid
        probs = np.maximum(d, 1e-12)
        probs = probs / probs.sum()
        nxt = int(rng.choice(n, p=probs))
        cent.append(sample[nxt])
        sims = np.maximum(sims, sample @ sample[nxt])
    c = np.stack(cent)
    for _ in range(iters):
        assign = np.argmax(sample @ c.T, axis=1)
        for j in range(n_centroids):
            members = sample[assign == j]
            if len(members) == 0:
                worst = int(np.argmin(np.max(sample @ c.T, axis=1)))
                c[j] = sample[worst]
            else:
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                c[j] = m / norm if norm > 0 else c[j]
    return c


def ivf_topk(
    ds: ray.data.Dataset,
    queries: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 10_000,
    round_digits: int | None = 4,
    seed: int = 13,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """IVF approximate top-k: score only corpus rows whose nearest centroid
    is among each query's ``n_probe`` closest cells.

    Centroids train ONCE on a deterministic corpus prefix (``limit``), are
    broadcast with the query matrix, and every batch does: assign rows →
    keep rows in probed cells → exact scoring → per-batch partial top-k →
    tiny final reduce. Work per batch drops to ~``n_probe/n_centroids`` of
    brute force; ``n_probe=n_centroids`` recovers the exact result.
    """
    sample_tbl = ds.limit(train_sample).to_pandas()
    sample = _normalize(
        np.stack(sample_tbl[emb_col].to_numpy()).astype(np.float64)
    )
    centroids = _kmeans_lite(sample, n_centroids, seed=seed)

    qm = _normalize(_stack_embeddings(queries[emb_col]))
    qids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # each query's probe set: its n_probe nearest centroids
    order = np.argsort(-(qm @ centroids.T), axis=1, kind="stable")
    probed = np.unique(order[:, : max(1, n_probe)].reshape(-1))
    qref = ray.put(
        {"ids": qids, "matrix": qm, "centroids": centroids, "probed": probed}
    )

    class IVFScorer(_TopKScorer):
        def __init__(self):
            q = ray.get(qref)
            self.qids = q["ids"]
            self.qm = q["matrix"]
            self.centroids = q["centroids"]
            self.probed = q["probed"]
            self.id_col = id_col
            self.emb_col = emb_col
            self.k = k
            self.round_digits = round_digits

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows:
                emb = _normalize(_stack_embeddings(t[self.emb_col]))
                cell = np.argmax(emb @ self.centroids.T, axis=1)
                t = t.filter(pa.array(np.isin(cell, self.probed)))
            return super().__call__(t)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["score", id_col], ascending=[False, True],
                           kind="stable")
            .head(k)
            .reset_index(drop=True)
        )

    return (
        ds.map_batches(
            IVFScorer,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
        .groupby("query_id")
        .map_groups(final, batch_format="pandas")
    )


def embedding_dup_pairs(
    ds: ray.data.Dataset,
    corpus: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.4,
    round_digits: int = 4,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs (exact, broadcast variant).

    The normalized corpus matrix is ``ray.put`` once; each batch does one
    matmul against it and emits pairs ``(a, b, score)`` with ``a < b`` and
    ``score >= threshold``. Exact all-pairs — use when the corpus matrix
    fits the object store (dim x n x 8B); for larger corpora use the
    LSH-bucketed route (``lsh_topk`` machinery) with documented recall.
    """
    cm = _normalize(_stack_embeddings(corpus[emb_col]))
    cids = corpus[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ref = ray.put({"ids": cids, "matrix": cm})

    class PairScorer:
        def __init__(self):
            c = ray.get(ref)
            self.cids = c["ids"]
            self.cm = c["matrix"]

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"a": pa.array([], pa.int64()),
                     "b": pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())}
                )
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            emb = _normalize(_stack_embeddings(t[emb_col]))
            scores = emb @ self.cm.T
            # keep a < b only: each unordered pair emitted exactly once
            keep = (ids[:, None] < self.cids[None, :]) & (scores >= threshold)
            ri, ci = np.nonzero(keep)
            return pa.table(
                {
                    "a": pa.array(ids[ri]),
                    "b": pa.array(self.cids[ci]),
                    "score": pa.array(np.round(scores[ri, ci], round_digits)),
                }
            )

    return ds.map_batches(
        PairScorer,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def lsh_topk(
    ds: ray.data.Dataset,
    queries: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    round_digits: int | None = 4,
    seed: int = 5,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Approximate top-k: score only corpus rows whose random-hyperplane
    sign bucket matches the query's. Recall rises with fewer planes (bigger
    buckets); the exact scorer inside the bucket keeps results deterministic.
    """
    dim = len(queries[emb_col][0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(num_planes, dim))
    qm = _normalize(_stack_embeddings(queries[emb_col]))
    qids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    weights = 1 << np.arange(num_planes)
    qbuckets = ((qm @ planes.T) > 0) @ weights

    qref = ray.put({"ids": qids, "matrix": qm})

    class BucketScorer(_TopKScorer):
        def __call__(self, t: pa.Table) -> pa.Table:
            emb = _normalize(_stack_embeddings(t[self.emb_col])) if t.num_rows else None
            if t.num_rows:
                cb = ((emb @ planes.T) > 0) @ weights
                mask = np.isin(cb, qbuckets)
                t = t.filter(pa.array(mask))
            return super().__call__(t)

    return (
        ds.map_batches(BucketScorer, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
            fn_constructor_args=(qref, id_col, emb_col, k, round_digits),
        )
        .groupby("query_id")
        .map_groups(
            lambda df: df.sort_values(
                ["score", id_col], ascending=[False, True], kind="stable"
            )
            .head(k)
            .reset_index(drop=True),
            batch_format="pandas",
        )
    )
