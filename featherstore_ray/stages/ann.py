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

    def __init__(self, q, id_col, emb_col, k, round_digits):
        # small payload passed BY VALUE: actor constructor args living in
        # the object store + max_restarts > 0 trips ray#53727 warnings
        if isinstance(q, ray.ObjectRef):
            q = ray.get(q)
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
        # round BEFORE the per-batch cut: the final merge ranks by rounded
        # score with vec_id tie-break, so the partial must keep every row
        # tied at the k-th ROUNDED score or a tie straddling the cutoff
        # could drop the row the tie-break keeps
        if self.round_digits is not None:
            scores = np.round(scores, self.round_digits)
        k = min(self.k, n)
        kth = -np.partition(-scores, k - 1, axis=0)[k - 1]  # (nq,)
        keep_mask = scores >= kth[None, :]
        ri, ci = np.nonzero(keep_mask)
        scol = scores[ri, ci]
        fin = np.isfinite(scol)
        return pa.table(
            {
                "query_id": pa.array(self.qids[ci[fin]].astype(np.int64)),
                self.id_col: pa.array(ids[ri[fin]].astype(np.int64)),
                "score": pa.array(scol[fin]),
            }
        )


def _merge_topk(df: pd.DataFrame, id_col: str, k: int) -> pd.DataFrame:
    return (
        df.sort_values(["score", id_col], ascending=[False, True],
                       kind="stable")
        .groupby("query_id", sort=True)
        .head(k)
        .sort_values(["query_id", "score", id_col],
                     ascending=[True, False, True], kind="stable")
        .reset_index(drop=True)
    )


def cosine_topk(
    ds: ray.data.Dataset,
    queries: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = 4,
    concurrency=None,  # retained for API compatibility; scorers run as task maps
) -> ray.data.Dataset:
    """Exact cosine top-k of each query over the corpus (self-matches excluded).

    Ties on (rounded) score break by ascending ``id_col`` — deterministic and
    expressible in oracle SQL (``ORDER BY round(score, d) DESC, vec_id``).
    """
    qm = _normalize(_stack_embeddings(queries[emb_col]))
    qids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    qval = {"ids": qids, "matrix": qm}

    # plain function map, not an actor pool: the payload is tiny and ships
    # by value inside the closure, so there is no per-actor init to
    # amortize — and task maps skip the ~1-2s actor-pool spin-up entirely
    scorer = _TopKScorer(qval, id_col, emb_col, k, round_digits)

    partials = ds.map_batches(scorer.__call__, batch_size=None,
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # the partials are O(queries x k x batches) tiny rows — a driver-side
    # merge beats a full sort-shuffle stage (a ~1.5s floor here) and is
    # exactly the "driver pulls partials only" contract
    return ray.data.from_pandas(_merge_topk(partials.to_pandas(), id_col, k))


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
    concurrency=None,  # retained for API compatibility; scorers run as task maps
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
    qval = {"ids": qids, "matrix": qm, "centroids": centroids, "probed": probed}

    class IVFScorer(_TopKScorer):
        def __init__(self):
            q = qval
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

    partials = ds.map_batches(
        IVFScorer().__call__,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ray.data.from_pandas(_merge_topk(partials.to_pandas(), id_col, k))


def embedding_dup_pairs(
    ds: ray.data.Dataset,
    corpus: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.4,
    round_digits: int = 4,
    concurrency=None,  # retained for API compatibility; scorers run as task maps
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
        """Plain task map: ray.get on the broadcast ref is a zero-copy
        object-store read, cached per worker process — no actor pool
        spin-up needed."""

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

    def score(t: pa.Table) -> pa.Table:
        # per-batch construction is fine: ray.get on a local ref is a
        # cached zero-copy read, not a fetch
        return PairScorer()(t)

    return ds.map_batches(
        score,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def lsh_dup_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.4,
    num_planes: int | None = None,
    num_tables: int = 8,
    target_recall: float = 0.9,
    num_buckets: int = 64,
    round_digits: int = 4,
    seed: int = 11,
) -> ray.data.Dataset:
    """Embedding near-dup pairs via random-hyperplane LSH buckets — the
    scale path ``embedding_dup_pairs`` defers to.

    No broadcast corpus, no all-pairs: each row lands in ONE sign bucket per
    table; pairs are scored exactly (float64 dot product) inside each
    (table, bucket) group, then deduped across tables. Exchange cost:
    ``num_tables`` copies of (id, embedding) rows — linear in the corpus.
    Recall = 1 - (1 - p^planes)^tables with p = 1 - theta/pi. When
    ``num_planes`` is None it is sized so pairs AT the threshold reach
    ``target_recall``: low thresholds (wide angles) force few planes and
    therefore big buckets — the intrinsic LSH cost of weak similarity; at
    the near-dup regime (cosine >= ~0.85) buckets stay fine-grained.
    Emitted pairs and scores are a deterministic SUBSET of the exact result
    (verified in tests against ``embedding_dup_pairs``).
    """
    if num_planes is None:
        p = 1.0 - np.arccos(min(max(threshold, -1.0), 1.0)) / np.pi
        need = 1.0 - (1.0 - target_recall) ** (1.0 / num_tables)
        num_planes = max(2, int(np.log(need) / np.log(p)))
    rng = np.random.default_rng(seed)
    # per-table plane matrices are re-derived from seeds inside workers (the
    # embedding dim is only known once a batch arrives)
    plane_seeds = [int(rng.integers(0, 2**31)) for _ in range(num_tables)]
    weights = 1 << np.arange(num_planes, dtype=np.int64)

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "table_id": pa.array([], pa.int32()),
                    "bucket": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    emb_col: t[emb_col],
                    BUCKET_COL: pa.array([], pa.int32()),
                }
            )
        emb = _normalize(_stack_embeddings(t[emb_col]))
        dim = emb.shape[1]
        tables = []
        for ti, s in enumerate(plane_seeds):
            pl = np.random.default_rng(s).normal(size=(num_planes, dim))
            b = ((emb @ pl.T) > 0) @ weights
            tables.append(
                pa.table(
                    {
                        "table_id": pa.array(
                            np.full(n, ti, dtype=np.int32)
                        ),
                        "bucket": pa.array(b),
                        id_col: t[id_col],
                        emb_col: t[emb_col],
                        BUCKET_COL: pa.array(
                            (
                                (b.astype(np.uint64)
                                 * np.uint64(0x9E3779B97F4A7C15)
                                 + np.uint64(ti))
                                % np.uint64(num_buckets)
                            ).astype(np.int32)
                        ),
                    }
                )
            )
        return pa.concat_tables(tables)

    exploded = ds.map_batches(
        explode, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def pairs_kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "score": pd.Series(dtype="float64")}
        )
        if df.empty:
            return empty
        outs = []
        for (_, _), g in df.groupby(["table_id", "bucket"], sort=True):
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy().astype(np.int64)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            emb = _normalize(
                np.stack(g[emb_col].to_numpy()[order]).astype(np.float64)
            )
            scores = np.round(emb @ emb.T, round_digits)
            iu, ju = np.triu_indices(len(g), k=1)
            sc = scores[iu, ju]
            ok = sc >= threshold
            # duplicate ids within a bucket (same row via two batches) drop
            dup = ids[iu] == ids[ju]
            ok &= ~dup
            outs.append(
                pd.DataFrame(
                    {"a": ids[iu[ok]], "b": ids[ju[ok]], "score": sc[ok]}
                )
            )
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    cand = bucketed_map_groups(
        exploded, pairs_kernel, num_buckets=num_buckets, batch_format="pandas"
    )

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            BUCKET_COL,
            pa.array(
                ((a * np.uint64(0xBF58476D1CE4E5B9) ^ b)
                 % np.uint64(num_buckets)).astype(np.int32)
            ),
        )

    cand = cand.map_batches(
        add_pair_bucket, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=[BUCKET_COL]).drop_duplicates(["a", "b"])

    return bucketed_map_groups(
        cand, distinct, num_buckets=num_buckets, batch_format="pandas"
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
    probe_hamming: int = 1,
    concurrency=None,  # retained for API compatibility; scorers run as task maps
) -> ray.data.Dataset:
    """Approximate top-k: score only corpus rows whose random-hyperplane
    sign bucket is within Hamming distance ``probe_hamming`` of the
    query's (multi-probe LSH — a near neighbor that lands one sign flip
    away is the dominant miss mode for a single hash table, so probing
    the r-neighborhood buys most of multi-table recall at zero extra
    state). Recall rises with fewer planes (bigger buckets) and with
    ``probe_hamming``; the exact scorer inside the candidate set keeps
    results deterministic. ``probe_hamming=0`` is the pure single-bucket
    scan.
    """
    from itertools import combinations

    dim = len(queries[emb_col][0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(num_planes, dim))
    qm = _normalize(_stack_embeddings(queries[emb_col]))
    qids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    weights = 1 << np.arange(num_planes)
    qbuckets = ((qm @ planes.T) > 0) @ weights
    # multi-probe expansion: every code within Hamming <= r of any query
    flips = [0] + [
        int(np.bitwise_or.reduce((1 << np.array(bits))))
        for r in range(1, min(probe_hamming, num_planes) + 1)
        for bits in combinations(range(num_planes), r)
    ]
    qbuckets = np.unique(qbuckets[:, None] ^ np.array(flips)[None, :])

    qval = {"ids": qids, "matrix": qm}

    class BucketScorer(_TopKScorer):
        def __init__(self):
            super().__init__(qval, id_col, emb_col, k, round_digits)

        def __call__(self, t: pa.Table) -> pa.Table:
            emb = _normalize(_stack_embeddings(t[self.emb_col])) if t.num_rows else None
            if t.num_rows:
                cb = ((emb @ planes.T) > 0) @ weights
                mask = np.isin(cb, qbuckets)
                t = t.filter(pa.array(mask))
            return super().__call__(t)

    partials = ds.map_batches(BucketScorer().__call__, batch_size=None,
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return ray.data.from_pandas(_merge_topk(partials.to_pandas(), id_col, k))


# -- distributed k-means (Lloyd's) -----------------------------------------


def _kmeans_assign_of(emb: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Nearest centroid by Euclidean distance; first min → lowest id."""
    d2 = (
        (emb * emb).sum(axis=1)[:, None]
        - 2.0 * (emb @ cent.T)
        + (cent * cent).sum(axis=1)[None, :]
    )
    return np.argmin(d2, axis=1)


def kmeans_fit(
    proj: ray.data.Dataset,
    *,
    id_col: str,
    emb_col: str,
    k: int,
    iters: int,
) -> np.ndarray:
    """Fit Lloyd's k-means centroids over ``proj`` (already projected to
    ``(id_col, emb_col)`` and ideally materialized). Deterministic init
    (embeddings of the ``k`` smallest ids), Euclidean float64, empty
    cluster keeps its previous centroid. Returns the ``k × dim`` centroid
    matrix; each iteration is one streaming pass emitting only k partial
    (count, sum-vector) moment rows per block — no shuffle.
    """

    # deterministic init: per-batch k smallest ids -> tiny driver merge
    def smallest(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.take(np.argsort(ids, kind="stable")[:k])

    head = (
        proj.map_batches(
            smallest, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
        .sort_values(id_col)
        .head(k)
    )
    C = np.stack(head[emb_col].to_numpy()).astype(np.float64)
    n_c, dim = C.shape
    assign_of = _kmeans_assign_of

    off = (np.arange(n_c + 1) * dim).astype(np.int32)
    for _ in range(iters):

        def moments(t: pa.Table, cent=C) -> pa.Table:
            sums = np.zeros((n_c, dim))
            counts = np.zeros(n_c, dtype=np.int64)
            if t.num_rows:
                emb = _stack_embeddings(t[emb_col])
                a = assign_of(emb, cent)
                np.add.at(sums, a, emb)
                counts = np.bincount(a, minlength=n_c).astype(np.int64)
            return pa.table(
                {
                    "cl": np.arange(n_c, dtype=np.int64),
                    "n": counts,
                    "s": pa.ListArray.from_arrays(off, sums.ravel()),
                }
            )

        part = proj.map_batches(
            moments, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_pandas()  # blocks x k rows — tiny
        n_tot = part.groupby("cl")["n"].sum()
        s_tot = np.zeros((n_c, dim))
        np.add.at(
            s_tot,
            part["cl"].to_numpy(),
            np.stack(part["s"].to_numpy()),
        )
        n_arr = n_tot.reindex(range(n_c), fill_value=0).to_numpy()
        C = np.where(
            (n_arr > 0)[:, None], s_tot / np.maximum(n_arr, 1)[:, None], C
        )

    return C


def logreg_train(
    ds: ray.data.Dataset,
    *,
    emb_col: str = "embedding",
    label_col: str = "label",
    positive_label: int = 0,
    iters: int = 5,
    lr: float = 0.1,
    round_digits: int = 6,
    materialize_input: bool = True,
) -> ray.data.Dataset:
    """Distributed binary logistic-regression training (full-batch gradient
    descent, the classic data-parallel pattern): ``y = 1`` iff
    ``label == positive_label``, ``w_0 = 0`` (no intercept),
    ``w_{t+1} = w_t - lr * mean_i (sigmoid(x_i . w_t) - y_i) x_i``.

    Each iteration is ONE streaming pass: every block collapses to a
    single (d-vector gradient partial, count) row — moments merge
    driver-side exactly like :func:`kmeans_fit`; the d-float weight vector
    ships to the next pass inside the closure. No shuffle anywhere; at
    100 TB each pass moves only ``blocks x (d+1)`` floats to the driver.

    Deterministic and SQL-mirrorable (unrolled per-iteration CTEs — the
    ``_kmeans_ctes`` precedent): embeddings cast float32 -> float64 before
    every multiply on both sides. Output: ``(j, weight)``, ``j`` 1-based
    to match SQL ``embedding[j]`` indexing, weights rounded.
    """
    proj = ds.select_columns([emb_col, label_col])
    if materialize_input:
        proj = proj.materialize()

    dim = None
    w = None
    n_total = None
    for _ in range(iters):
        def grad_partial(t: pa.Table, w_t=w) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"g": pa.array([], pa.list_(pa.float64())),
                     "n": pa.array([], pa.int64())}
                )
            X = _stack_embeddings(t[emb_col])
            labels = t[label_col].to_numpy(zero_copy_only=False)
            y = (labels == positive_label).astype(np.float64)
            d = X.shape[1]
            wt = np.zeros(d) if w_t is None else w_t
            p = 1.0 / (1.0 + np.exp(-(X @ wt)))
            g = (p - y) @ X  # d-vector partial (unnormalized sum)
            off = np.array([0, d], dtype=np.int32)
            return pa.table(
                {"g": pa.ListArray.from_arrays(off, g),
                 "n": pa.array([t.num_rows], pa.int64())}
            )

        part = proj.map_batches(
            grad_partial, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_pandas()  # one row per block
        if not len(part):
            break
        gs = np.stack(part["g"].to_numpy())
        n_total = int(part["n"].sum())
        grad = gs.sum(axis=0) / max(n_total, 1)
        if dim is None:
            dim = grad.shape[0]
            w = np.zeros(dim)
        w = w - lr * grad

    if w is None:
        w = np.zeros(0)
    return ray.data.from_arrow(pa.table(
        {"j": pa.array(np.arange(1, len(w) + 1, dtype=np.int64)),
         "weight": pa.array(np.round(w, round_digits))}
    ))


def kmeans_assign(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    out_col: str = "cluster",
    materialize_input: bool = True,
) -> ray.data.Dataset:
    """Distributed Lloyd's k-means over an embedding column, EXACT oracle
    semantics (unlike the sampled spherical ``_kmeans_lite`` used for IVF
    training): Euclidean distance in float64, deterministic init (the
    embeddings of the ``k`` smallest ids), ties → lowest cluster id, empty
    cluster keeps its previous centroid. Returns ``(id_col, out_col)`` with
    the assignment under the centroids after ``iters`` update steps.

    Scale shape (100 TB): see ``kmeans_fit`` — centroids ship in the task
    closure, each pass reduces to k moment rows per block, no shuffle. The
    projected ``(id, embedding)`` input is materialized once so the
    ``iters + 2`` passes don't re-execute the read lineage (set
    ``materialize_input=False`` to stream from source each pass instead).
    """
    proj = ds.select_columns([id_col, emb_col])
    if materialize_input:
        proj = proj.materialize()
    C = kmeans_fit(proj, id_col=id_col, emb_col=emb_col, k=k, iters=iters)

    def final(t: pa.Table, cent=C) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 out_col: pa.array([], pa.int64())}
            )
        emb = _stack_embeddings(t[emb_col])
        return pa.table(
            {
                id_col: t[id_col],
                out_col: _kmeans_assign_of(emb, cent).astype(np.int64),
            }
        )

    return proj.map_batches(
        final, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def silhouette(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Simplified (centroid-based) silhouette of the exact k-means
    clustering — the cluster-quality member of the model-eval family
    (auc/ndcg/calibration score rankings; this scores a partitioning):
    per point ``a`` = Euclidean distance to its OWN centroid, ``b`` = min
    distance to any OTHER centroid, ``s = (b − a)/max(a, b)`` (0 when the
    point sits exactly on its centroid and max = 0). The classic O(n²)
    silhouette replaces a/b with mean pairwise distances; the centroid
    form is its standard O(n·k) large-scale surrogate and is what scales
    to 100 TB. Output: one row per non-empty cluster — (cluster, n,
    mean_silhouette).

    Scale shape: :func:`kmeans_fit`'s streaming moment passes (no
    shuffle), then ONE scoring pass — centroids ride in the closure, each
    block collapses to ≤ k (cluster, n, Σs) partial rows, merged
    driver-side.
    """
    proj = ds.select_columns([id_col, emb_col]).materialize()
    C = kmeans_fit(proj, id_col=id_col, emb_col=emb_col, k=k, iters=iters)

    def part(t: pa.Table, cent=C) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "cluster": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
            })
        X = _stack_embeddings(t[emb_col]).astype(np.float64)
        own = _kmeans_assign_of(X, cent)
        # direct-form distances (the oracle's list_distance shape)
        d = np.sqrt(((X[:, None, :] - cent[None, :, :]) ** 2).sum(-1))
        a = d[np.arange(len(X)), own]
        d[np.arange(len(X)), own] = np.inf
        b = d.min(axis=1)
        mx = np.maximum(a, b)
        s = np.where(mx > 0, (b - a) / np.where(mx > 0, mx, 1.0), 0.0)
        n_per = np.bincount(own, minlength=len(cent))
        s_per = np.bincount(own, weights=s, minlength=len(cent))
        keep = n_per > 0
        return pa.table({
            "cluster": pa.array(np.flatnonzero(keep).astype(np.int64)),
            "n": pa.array(n_per[keep].astype(np.int64)),
            "s": pa.array(s_per[keep]),
        })

    m = proj.map_batches(
        part, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas().groupby("cluster", sort=True)[["n", "s"]].sum()
    return ray.data.from_arrow(pa.table({
        "cluster": pa.array(m.index.to_numpy(dtype=np.int64)),
        "n": pa.array(m["n"].to_numpy(dtype=np.int64)),
        "mean_silhouette": pa.array(np.round(
            m["s"].to_numpy() / m["n"].to_numpy(), round_digits)),
    }))


def semantic_dedup(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.7,
    round_digits: int = 4,
    block_rows: int = 1024,
) -> ray.data.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    k-means-cluster the embedding space, then prune near-duplicates
    WITHIN each cluster by pairwise cosine similarity. A row is marked
    ``is_dup`` iff some LOWER-id row in the same cluster has cosine
    similarity ≥ ``threshold`` (keep-lowest-id — deterministic under any
    partitioning); ``max_sim`` reports its strongest lower-id neighbor
    (rounded, -1.0 for the cluster's first row). ``is_dup`` is decided on
    the ROUNDED similarity so engine/oracle ulp noise can't flip the cut.

    Returns ``(id_col, cluster, is_dup, max_sim)``.

    Scale shape (100 TB): the O(n²) cosine comparison never touches the
    full corpus — k-means (no shuffle, see ``kmeans_fit``) splits it into
    k clusters and ONE bucket exchange co-locates each cluster; the
    per-cluster kernel computes the similarity matrix in ``block_rows``
    strips (memory O(block × cluster), not O(cluster²)). Cross-cluster
    duplicates are deliberately not compared — that is the SemDeDup
    trade-off (recall bounded by clustering quality; raise k to shrink
    per-cluster cost, lower k to raise recall).
    """
    from featherstore_ray.exchange import bucketed_map_groups

    proj = ds.select_columns([id_col, emb_col]).materialize()
    C = kmeans_fit(proj, id_col=id_col, emb_col=emb_col, k=k, iters=iters)

    def tag(t: pa.Table, cent=C) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 emb_col: t[emb_col],
                 "cluster": pa.array([], pa.int64())}
            )
        emb = _stack_embeddings(t[emb_col])
        return pa.table(
            {
                id_col: t[id_col],
                emb_col: t[emb_col],
                "cluster": _kmeans_assign_of(emb, cent).astype(np.int64),
            }
        )

    tagged = proj.map_batches(
        tag, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def kernel(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        emb = _normalize(_stack_embeddings(t[emb_col]))[order]
        n = len(ids)
        max_sim = np.full(n, -np.inf)
        for s in range(0, n, block_rows):
            e = min(s + block_rows, n)
            if e <= 1:
                continue
            sims = emb[s:e] @ emb[:e].T  # strip vs all earlier + self-block
            # mask out self and later-or-equal positions within the strip
            col = np.arange(e)
            row = np.arange(s, e)
            sims[col[None, :] >= row[:, None]] = -np.inf
            strip_max = sims.max(axis=1)
            lo = max(s, 1)  # row 0 has no earlier neighbor
            max_sim[lo:e] = strip_max[lo - s:]
        cl = t["cluster"].to_numpy(zero_copy_only=False)[order]
        ms = np.where(max_sim == -np.inf, -1.0, max_sim).round(round_digits)
        is_dup = ms >= threshold
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": pa.array(cl.astype(np.int64)),
                "is_dup": pa.array(is_dup),
                "max_sim": pa.array(ms),
            }
        )

    return bucketed_map_groups(
        tagged, kernel, num_buckets=k, bucket_col="cluster",
        batch_format="pyarrow",
    )


def label_centroids(
    ds: ray.data.Dataset,
    *,
    label_col: str = "label",
    emb_col: str = "embedding",
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Element-wise mean embedding per label, long format
    ``(label, dim, centroid)`` — the class-centroid primitive behind
    nearest-centroid classification and cluster summarization.

    Scale shape: each batch collapses to per-label (sum, count) vectors
    via a sort + ``np.add.reduceat`` segment sum (no scattered writes), so
    the exchange moves labels × dim partial rows per batch, never
    embeddings; the partials merge on the driver (small by construction),
    exactly the ``grouped_aggregate(final="driver")`` contract.
    """
    from featherstore_ray.stages.aggregate import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        mat = _stack_embeddings(t[emb_col])
        labels = t[label_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(labels)
        valid = codes >= 0  # null labels factorize to -1 — drop, don't wrap
        codes, mat = codes[valid], mat[valid]
        order = np.argsort(codes, kind="stable")
        sorted_mat = mat[order]
        n_lab, dim = len(uniq), mat.shape[1]
        bounds = np.searchsorted(codes[order], np.arange(n_lab))
        sums = np.add.reduceat(sorted_mat, bounds, axis=0)
        counts = np.bincount(codes, minlength=n_lab).astype(np.int64)
        return pa.table(
            {
                label_col: np.repeat(np.asarray(uniq), dim),
                "dim": np.tile(np.arange(dim, dtype=np.int64), n_lab),
                "s": sums.ravel(),
                "c": np.repeat(counts, dim),
            }
        )

    parts = ds.map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = grouped_aggregate(
        parts,
        [label_col, "dim"],
        {"s": ("s", "sum"), "c": ("c", "sum")},
        final="driver",
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["centroid"] = (df["s"] / df["c"]).round(round_digits)
        return df.drop(columns=["s", "c"])

    return merged.map_batches(finalize, batch_size=None, batch_format="pandas")


def quantize_embeddings(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    *,
    out: str = "list",
) -> ray.data.Dataset:
    """Int8 scalar quantization of an embedding column — the standard 4×
    vector-store compression (per-dimension min/max affine codes).

    Pass 1 collapses each block to per-dimension (min, max) partials
    (blocks × dim × 2 floats cross the wire — never rows); the driver
    merges them and the tiny (lo, hi) range vectors ride into pass 2 as a
    task closure (shipped once per task, not per batch). Pass 2 is a
    streaming map: ``code = floor((v - lo) / (hi - lo) * 255 + 0.5) - 128``
    ∈ [-128, 127]; a degenerate dimension (hi == lo) encodes to -128.
    Every step is exact IEEE double arithmetic (no summation), so the
    output is bit-identical across partitionings and engines — the oracle
    mirrors the formula literally.

    ``out="list"`` keeps one row per vector with a ``fixed_size_list<int8>``
    code column — the layout you'd write at 100 TB. ``out="long"`` explodes
    to (id, dim, q) rows for driver/oracle comparison.
    """
    if out not in ("list", "long"):
        raise ValueError(f"out must be 'list' or 'long', got {out!r}")

    def ranges(t: pa.Table) -> pa.Table:
        m = _stack_embeddings(t[emb_col])
        return pa.table({
            "dim": np.arange(m.shape[1], dtype=np.int64),
            "lo": m.min(axis=0),
            "hi": m.max(axis=0),
        })

    parts = ds.select_columns([emb_col]).map_batches(
        ranges, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # blocks × dim rows — bounded
    g = parts.groupby("dim", sort=True).agg(lo=("lo", "min"), hi=("hi", "max"))
    lo = g["lo"].to_numpy()
    rng = g["hi"].to_numpy() - lo
    degenerate = rng <= 0
    rng = np.where(degenerate, 1.0, rng)

    def encode(t: pa.Table) -> pa.Table:
        m = _stack_embeddings(t[emb_col])
        q = np.floor((m - lo) / rng * 255.0 + 0.5)
        q[:, degenerate] = 0.0
        codes = (q - 128.0).astype(np.int8)
        ids = t[id_col]
        if out == "list":
            col = pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), pa.int8()), codes.shape[1])
            return pa.table({id_col: ids, "code": col})
        n, d = codes.shape
        return pa.table({
            id_col: pa.array(np.repeat(
                ids.to_numpy(zero_copy_only=False), d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "q": pa.array(codes.ravel().astype(np.int64)),
        })

    return ds.map_batches(
        encode, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def _gaussian_moments(
    ds: ray.data.Dataset, emb_col: str, *, min_rows: int, caller: str
) -> tuple[int, np.ndarray, np.ndarray]:
    """Shared (n, mean, sample covariance) over an embedding column — the
    dim-bounded moment shape: each block collapses to (n, Σx, ΣxᵀX), a
    d-vector + d×d matrix regardless of row count; partials merge by
    addition on the driver. Used by pca_project and embedding_outliers."""

    def moments(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.list_(pa.float64())),
            "ss": pa.array([], pa.list_(pa.float64())),
        })
        if t.num_rows == 0:
            return empty
        m = _stack_embeddings(t[emb_col])
        s = m.sum(axis=0)
        ss = m.T @ m
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "ss": pa.array([ss.ravel().tolist()], pa.list_(pa.float64())),
        })

    parts = ds.select_columns([emb_col]).map_batches(
        moments, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    n = int(parts["n"].sum()) if len(parts) else 0
    if n < min_rows:
        raise ValueError(
            f"{caller} needs >= {min_rows} rows to estimate a covariance; "
            f"got {n}"
        )
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    d = len(s)
    ss = np.sum(np.stack(parts["ss"].to_numpy()), axis=0).reshape(d, d)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    return n, mean, cov


def pca_project(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_components: int = 8,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Distributed PCA projection — whiten/compress an embedding column to
    its top ``n_components`` principal directions, the standard
    pre-clustering / pre-ANN dimensionality reduction.

    The textbook dim-bounded moment shape: each block collapses to
    (n, Σx, ΣxᵀX) — a d-vector and a d×d matrix regardless of row count —
    partials merge by addition on the driver, the covariance
    eigendecomposition (d×d, trivial) runs once, and the top components
    broadcast back with the projection closure; pass 2 is one matvec per
    batch. Deterministic: eigenvector signs are canonicalized (largest-
    |loading| coordinate made positive, ties → lowest index).

    Rows-only contract (eigendecomposition has no SQL mirror); exactness
    vs full-matrix numpy PCA is pytest-gated. Output: (id, pc0..pc{k-1}).
    """
    n, mean, cov = _gaussian_moments(ds, emb_col, min_rows=2,
                                     caller="pca_project")
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comp = evecs[:, order]  # d × k
    # canonical signs: make the largest-|loading| coordinate positive
    amax = np.argmax(np.abs(comp), axis=0)
    signs = np.sign(comp[amax, np.arange(comp.shape[1])])
    signs[signs == 0] = 1.0
    comp = comp * signs

    def project(t: pa.Table) -> pa.Table:
        m = _stack_embeddings(t[emb_col])
        proj = (m - mean) @ comp
        if round_digits is not None:
            proj = np.round(proj, round_digits)
        out = {id_col: t[id_col]}
        for j in range(proj.shape[1]):
            out[f"pc{j}"] = pa.array(proj[:, j])
        return pa.table(out)

    return ds.select_columns([id_col, emb_col]).map_batches(
        project, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


class _HardNegScorer(_TopKScorer):
    """_TopKScorer that additionally masks same-label corpus rows."""

    def __init__(self, q, id_col, emb_col, label_col, k, round_digits):
        super().__init__(q, id_col, emb_col, k, round_digits)
        self.qlabels = q["labels"]
        self.label_col = label_col

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return super().__call__(t)
        import pyarrow.compute as pc

        # same-label rows are positives, not negatives; label-null rows
        # are excluded too (SQL ``e.label != q.label`` is NULL → false)
        col = t[self.label_col]
        nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
        labels = col.to_numpy(zero_copy_only=False)
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        emb = _normalize(_stack_embeddings(t[self.emb_col]))
        scores = emb @ self.qm.T
        bad = labels[:, None] == np.asarray(self.qlabels)[None, :]
        bad |= nulls[:, None]
        bad |= ids[:, None] == self.qids[None, :]
        scores = np.where(bad, -np.inf, scores)
        if self.round_digits is not None:
            scores = np.round(scores, self.round_digits)
        k = min(self.k, n)
        kth = -np.partition(-scores, k - 1, axis=0)[k - 1]
        keep_mask = scores >= kth[None, :]
        ri, ci = np.nonzero(keep_mask)
        scol = scores[ri, ci]
        fin = np.isfinite(scol)
        return pa.table({
            "query_id": pa.array(self.qids[ci[fin]].astype(np.int64)),
            self.id_col: pa.array(ids[ri[fin]].astype(np.int64)),
            "score": pa.array(scol[fin]),
        })


def hard_negative_topk(
    ds: ray.data.Dataset,
    queries: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    round_digits: int | None = 4,
) -> ray.data.Dataset:
    """Hard-negative mining for contrastive training: for each anchor
    (query row), the exact cosine top-k over the corpus restricted to
    rows with a DIFFERENT label (same-label rows are positives, not
    negatives; label-null rows are excluded — SQL ``e.label != q.label``
    semantics). Same physical plan as :func:`cosine_topk`: anchors ship
    by value once, per-batch matmul + masked partial top-k, tiny driver
    merge. Ties on rounded score break by ascending id.
    """
    qm = _normalize(_stack_embeddings(queries[emb_col]))
    qids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    qlabels = queries[label_col].to_pylist()
    qval = {"ids": qids, "matrix": qm, "labels": qlabels}
    scorer = _HardNegScorer(qval, id_col, emb_col, label_col, k,
                            round_digits)
    partials = ds.map_batches(
        scorer.__call__, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ray.data.from_pandas(_merge_topk(partials.to_pandas(), id_col, k))


def mmr_select(
    ds: ray.data.Dataset,
    query_vec: np.ndarray,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    m: int = 20,
    lam: float = 0.7,
    candidates: int = 256,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Diversity-aware top-m selection via Maximal Marginal Relevance:
    greedily pick the item maximizing ``lam * rel − (1−lam) * max_sim``
    where ``rel`` is cosine relevance to ``query_vec`` and ``max_sim`` the
    max cosine to anything already selected — the standard redundancy-free
    retrieval / diverse-exemplar-sampling primitive. ``rel`` and the
    pairwise similarities round to ``round_digits`` (continuous inputs —
    engine ulps can't flip the grid); the combined score is left
    UNROUNDED (it would land on half-grid points where np.round and SQL
    round disagree) and ties break by ascending id (deterministic).

    Scale shape (the greedy loop is inherently sequential, so it must
    never see the corpus): pass 1 is the distributed cosine_topk plan
    collecting the top-``candidates`` ids by relevance (per-batch matmul
    partials — only ids/scores move); pass 2 gathers just those C
    embedding rows and runs the O(C·m) greedy on the driver. With
    ``candidates ≥ corpus`` the result is exact brute-force MMR
    (pytest-gated); otherwise it is the standard candidate-restricted
    approximation — rel is monotone in the greedy objective's first term,
    so the exact answer's support is in the candidate set whenever
    ``lam ≥ 0.5`` and similarities are nonnegative.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    qtab = pa.table({
        id_col: pa.array([np.int64(-1)]),
        emb_col: pa.array([q.astype(np.float32)]),
    })
    top = cosine_topk(
        ds, qtab, id_col=id_col, emb_col=emb_col, k=candidates,
        round_digits=None,
    ).to_pandas()
    cand_ids = top[id_col].to_numpy().astype(np.int64)
    if len(cand_ids) == 0:  # empty corpus → typed empty result
        return ray.data.from_arrow(pa.table({
            "rank": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "relevance": pa.array([], pa.float64()),
            "mmr_score": pa.array([], pa.float64()),
        }))
    id_set = ray.put(pa.array(cand_ids))

    def gather(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t[id_col], value_set=ray.get(id_set)))

    rows = (
        ds.select_columns([id_col, emb_col])
        .map_batches(gather, batch_size=None, batch_format="pyarrow",
                     zero_copy_batch=True)
        .to_pandas()
    )
    ids = rows[id_col].to_numpy().astype(np.int64)
    mat = _normalize(np.stack(
        [np.asarray(v, dtype=np.float64) for v in rows[emb_col]]))
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    rel = np.round(mat @ q, round_digits)
    n = len(ids)
    m = min(m, n)
    selected: list[int] = []
    max_sim = np.full(n, -np.inf)
    picked = np.zeros(n, dtype=bool)
    out_rows = []
    for rank in range(1, m + 1):
        if rank == 1:
            score = rel.copy()
        else:
            # rel and max_sim are ROUNDED grid doubles identical across
            # engines; the combined score stays UNROUNDED — rounding it
            # would land exactly on half-grid points where np.round
            # (half-even) and SQL round (half-away) disagree, while the
            # raw lam*rel - (1-lam)*max_sim is the same IEEE op sequence
            # on identical inputs on both sides
            score = lam * rel - (1.0 - lam) * max_sim
        score_masked = np.where(picked, -np.inf, score)
        i = int(np.argmax(score_masked))  # argmax takes the FIRST max:
        # ids are ascending, so equal scores break to the smallest id
        out_rows.append((rank, int(ids[i]), float(rel[i]),
                         float(score_masked[i])))
        picked[i] = True
        max_sim = np.maximum(max_sim, np.round(mat @ mat[i], round_digits))
    return ray.data.from_arrow(pa.table({
        "rank": pa.array([r[0] for r in out_rows], pa.int64()),
        id_col: pa.array([r[1] for r in out_rows], pa.int64()),
        "relevance": pa.array([r[2] for r in out_rows], pa.float64()),
        "mmr_score": pa.array([r[3] for r in out_rows], pa.float64()),
    }))


def kcenter_select(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    m: int = 8,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Greedy k-center (farthest-point) coreset selection over cosine
    distance — the coverage-driven sibling of :func:`mmr_select` (MMR
    optimizes relevance-vs-redundancy; k-center minimizes the max
    distance of any point to its nearest exemplar — the classic active
    learning / dataset-distillation pick, a 2-approximation of optimal
    k-center). Seed = the smallest id; ties on rounded distance break by
    ascending id. Output: (rank, id, dist) where dist is the point's
    distance to the previously selected set when it was picked (NULL for
    the seed).

    Scale shape: the min-distance vector is Dataset-resident state, like
    pagerank's ranks — never on the driver. Each of the m−1 rounds is one
    narrow map (update dist vs the newest center, shipped by value — no
    shuffle) plus a per-batch argmax partial; only (1 row × batches)
    partials reach the driver per round. Greedy k-center is inherently m
    sequential passes — keep m small or switch to Gonzalez-on-a-sample
    for very large m.
    """
    proj = ds.select_columns([id_col, emb_col]).materialize()

    def seed_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             emb_col: t[emb_col].slice(0, 0)})
        ids = t[id_col].to_numpy(zero_copy_only=False)
        i = int(np.argmin(ids))
        return t.select([id_col, emb_col]).slice(i, 1)

    seeds = pa.concat_tables(
        [pa.table(b) for b in proj.map_batches(
            seed_partial, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow")],
        promote_options="default",
    )
    sids = seeds[id_col].to_numpy(zero_copy_only=False)
    if len(sids) == 0:  # empty corpus → typed empty result, not a crash
        return ray.data.from_arrow(pa.table({
            "rank": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "dist": pa.array([], pa.float64()),
        }))
    j = int(np.argmin(sids))
    center = _normalize(np.asarray(
        seeds[emb_col][j].as_py(), dtype=np.float64)[None, :])[0]
    selected = [int(sids[j])]
    out_rows = [(1, selected[0], None)]
    dist_col = "_kc_dist"

    def init(t: pa.Table) -> pa.Table:
        return t.append_column(
            dist_col, pa.array(np.full(t.num_rows, np.inf)))

    state = proj.map_batches(
        init, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    n_total = state.count()
    for _ in range(1, min(m, n_total)):
        cvec = center  # ships by value in the closure (d floats)

        def update(t: pa.Table, c=cvec) -> pa.Table:
            emb = _normalize(_stack_embeddings(t[emb_col]))
            d = np.round(1.0 - emb @ c, round_digits)
            nd = np.minimum(
                t[dist_col].to_numpy(zero_copy_only=False), d)
            return t.drop_columns([dist_col]).append_column(
                dist_col, pa.array(nd))

        state = state.map_batches(
            update, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

        sel = np.asarray(selected, dtype=np.int64)

        def best(t: pa.Table, sel=sel) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False)
            d = t[dist_col].to_numpy(zero_copy_only=False)
            ok = ~np.isin(ids, sel)
            if not ok.any():
                return t.slice(0, 0)
            # per-batch argmax with min-id ties: ids ascend within a
            # block only by accident, so order explicitly
            cand = np.flatnonzero(ok)
            order = np.lexsort((ids[cand], -d[cand]))
            return t.take(cand[order[:1]])

        parts = pa.concat_tables(
            [pa.table(b) for b in state.map_batches(
                best, batch_size=None, batch_format="pyarrow",
                zero_copy_batch=True).iter_batches(batch_format="pyarrow")],
            promote_options="default",
        )
        if parts.num_rows == 0:
            break
        pids = parts[id_col].to_numpy(zero_copy_only=False)
        pd_ = parts[dist_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((pids, -pd_))
        w = int(order[0])
        selected.append(int(pids[w]))
        out_rows.append((len(selected), int(pids[w]), float(pd_[w])))
        center = _normalize(np.asarray(
            parts[emb_col][w].as_py(), dtype=np.float64)[None, :])[0]

    return ray.data.from_arrow(pa.table({
        "rank": pa.array([r[0] for r in out_rows], pa.int64()),
        id_col: pa.array([r[1] for r in out_rows], pa.int64()),
        "dist": pa.array([r[2] for r in out_rows], pa.float64()),
    }))


def embedding_outliers(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    top_k: int = 50,
    ridge: float = 1e-6,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Mahalanobis-distance outlier screen over an embedding column — the
    multivariate data-cleaning pass (corrupt encodes, off-distribution
    junk) that per-coordinate z-scores miss. Output: the ``top_k`` rows by
    squared Mahalanobis distance ``(x−μ)ᵀ Σ⁻¹ (x−μ)`` (ties on the
    rounded distance break by ascending id).

    Scale shape: pass 1 is the shared dim-bounded moment reduce
    (:func:`_gaussian_moments` — a d-vector + d×d matrix per block); the
    driver inverts the ridge-regularized d×d covariance once; pass 2
    broadcasts Σ⁻¹/μ in the closure and emits per-batch top-k partials —
    only ids/distances move. Rows-only contract (the matrix inverse has
    no SQL mirror); numpy parity is pytest-gated.
    """
    n, mean, cov = _gaussian_moments(ds, emb_col, min_rows=2,
                                     caller="embedding_outliers")
    d = len(mean)
    prec = np.linalg.inv(cov + ridge * np.eye(d))

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "maha_sq": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        x = _stack_embeddings(t[emb_col]) - mean
        # row-wise quadratic form, one matmul + one elementwise reduce
        q = np.einsum("ij,ij->i", x @ prec, x)
        q = np.round(q, round_digits)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = min(top_k, len(q))
        order = np.lexsort((ids, -q))[:k]
        return pa.table({
            id_col: pa.array(ids[order]),
            "maha_sq": pa.array(q[order]),
        })

    parts = ds.select_columns([id_col, emb_col]).map_batches(
        score, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    parts = parts.sort_values(["maha_sq", id_col], ascending=[False, True],
                              kind="stable").head(top_k)
    out = parts.reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return ray.data.from_pandas(out[["rank", id_col, "maha_sq"]])


def _kmeans_l2(
    sample: np.ndarray, k: int, *, iters: int = 15, seed: int = 13
) -> np.ndarray:
    """Deterministic L2 k-means (kmeans++ init, Lloyd) on a driver-side
    sample matrix — the Euclidean sibling of :func:`_kmeans_lite` (which
    is spherical/cosine). Empty clusters re-seed from the farthest point."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    k = min(k, n)
    first = int(rng.integers(0, n))
    cent = [sample[first]]
    d2 = ((sample - sample[first]) ** 2).sum(axis=1)
    for _ in range(1, k):
        probs = np.maximum(d2, 1e-12)
        probs = probs / probs.sum()
        nxt = int(rng.choice(n, p=probs))
        cent.append(sample[nxt])
        d2 = np.minimum(d2, ((sample - sample[nxt]) ** 2).sum(axis=1))
    c = np.stack(cent)
    for _ in range(iters):
        d = ((sample[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members) == 0:
                c[j] = sample[int(np.argmax(d.min(axis=1)))]
            else:
                c[j] = members.mean(axis=0)
    return c


def _pq_codebooks(
    ds: ray.data.Dataset,
    emb_col: str,
    *,
    m_subspaces: int,
    n_codes: int,
    train_sample: int,
    seed: int,
) -> np.ndarray:
    """Train PQ codebooks on a deterministic corpus prefix (the ivf_topk
    sampling convention): returns (M, n_codes, sub_dim) float64. Vectors
    are L2-normalized first so PQ distance ranks match cosine ranks."""
    sample_tab = ds.select_columns([emb_col]).limit(train_sample).to_pandas()
    mat = _normalize(np.stack(
        [np.asarray(v, dtype=np.float64) for v in sample_tab[emb_col]]))
    d = mat.shape[1]
    if d % m_subspaces != 0:
        raise ValueError(
            f"dim {d} not divisible into {m_subspaces} subspaces")
    sub = d // m_subspaces
    books = []
    for s in range(m_subspaces):
        seg = mat[:, s * sub:(s + 1) * sub]
        books.append(_kmeans_l2(seg, n_codes, seed=seed + s))
    return np.stack(books)


def pq_encode(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    m_subspaces: int = 8,
    n_codes: int = 16,
    train_sample: int = 10_000,
    seed: int = 13,
    round_digits: int = 6,
    books: np.ndarray | None = None,
) -> ray.data.Dataset:
    """Product-quantization encoding — the sub-byte embedding compression
    path next to :func:`quantize_embeddings` (scalar int8): split the
    normalized vector into M subspaces, snap each to its nearest of
    ``n_codes`` codebook centroids, store M small ints (here M columns
    ``code0..code{M-1}``, never a uniform-length list column — the Ray
    to_pandas tensor-cast gotcha) plus the reconstruction error.

    Codebooks train ONCE driver-side on a deterministic corpus prefix and
    ship by value in the scoring closure; pass 2 is one (n × K) matmul
    per subspace per batch — no shuffle anywhere. Pass ``books`` to
    reuse an already-trained codebook (pq_topk does — it must score with
    the SAME codebook it built its lookup tables from).
    """
    if books is None:
        books = _pq_codebooks(
            ds, emb_col, m_subspaces=m_subspaces, n_codes=n_codes,
            train_sample=train_sample, seed=seed,
        )
    sub = books.shape[2]
    norms = (books ** 2).sum(axis=2)  # (M, K)

    def encode(t: pa.Table) -> pa.Table:
        out = {id_col: t[id_col]}
        if t.num_rows == 0:
            for s in range(m_subspaces):
                out[f"code{s}"] = pa.array([], pa.int64())
            out["recon_err"] = pa.array([], pa.float64())
            return pa.table(out)
        mat = _normalize(_stack_embeddings(t[emb_col]))
        err = np.zeros(len(mat))
        for s in range(m_subspaces):
            seg = mat[:, s * sub:(s + 1) * sub]
            # ||x−c||² = ||x||² − 2x·c + ||c||²; argmin drops ||x||²
            d = norms[s][None, :] - 2.0 * (seg @ books[s].T)
            code = np.argmin(d, axis=1)
            err += d[np.arange(len(mat)), code] + (seg * seg).sum(axis=1)
            out[f"code{s}"] = pa.array(code.astype(np.int64))
        out["recon_err"] = pa.array(np.round(np.maximum(err, 0.0),
                                             round_digits))
        return pa.table(out)

    return ds.select_columns([id_col, emb_col]).map_batches(
        encode, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def pq_topk(
    ds: ray.data.Dataset,
    queries: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    m_subspaces: int = 8,
    n_codes: int = 16,
    train_sample: int = 10_000,
    seed: int = 13,
    round_digits: int | None = 6,
    rerank: int = 0,
) -> ray.data.Dataset:
    """Approximate top-k via PQ asymmetric distance (ADC): each query
    precomputes an (M × n_codes) lookup table of exact subspace distances
    to every centroid; scanning a corpus row is M table lookups + a sum —
    the classic memory-bound ANN scan that never touches the original
    vectors. Normalized inputs make the L2 ranking cosine-equivalent.
    Deterministic (fixed seed/sample); approximate → rows-only with a
    recall column in the contract query, recall gate in pytest.

    ``rerank > 0`` adds the standard ADC+R refinement: the code scan
    keeps ``rerank × k`` candidates per query, then ONE extra pass over
    the original vectors exact-scores just those candidates (broadcast
    id set — candidates are nq × rerank·k, never corpus-scale) and the
    final top-k is exact within the candidate set. Quantization error
    then only costs recall when a true neighbor falls outside the
    candidate pool entirely.
    """
    books = _pq_codebooks(
        ds, emb_col, m_subspaces=m_subspaces, n_codes=n_codes,
        train_sample=train_sample, seed=seed,
    )
    sub = books.shape[2]
    qm = _normalize(_stack_embeddings(queries[emb_col]))
    qids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # (nq, M, K) exact query-to-centroid subspace distances
    luts = np.stack([
        ((qm[:, s * sub:(s + 1) * sub][:, None, :]
          - books[s][None, :, :]) ** 2).sum(axis=2)
        for s in range(m_subspaces)
    ], axis=1)

    encoded = pq_encode(
        ds, id_col=id_col, emb_col=emb_col, m_subspaces=m_subspaces,
        n_codes=n_codes, train_sample=train_sample, seed=seed,
        books=books,  # one training pass, not two
    )

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "dist": pa.array([], pa.float64()),
            })
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.stack([
            t[f"code{s}"].to_numpy(zero_copy_only=False)
            for s in range(m_subspaces)
        ])  # (M, n)
        nq = luts.shape[0]
        dist = np.zeros((len(ids), nq))
        for s in range(m_subspaces):
            dist += luts[:, s, :][:, codes[s]].T  # (n, nq)
        dist = np.where(ids[:, None] == qids[None, :], np.inf, dist)
        if round_digits is not None:
            dist = np.round(dist, round_digits)
        kk = min(k * max(rerank, 1), len(ids))
        kth = np.partition(dist, kk - 1, axis=0)[kk - 1]
        keep = dist <= kth[None, :]
        ri, ci = np.nonzero(keep)
        dcol = dist[ri, ci]
        fin = np.isfinite(dcol)
        return pa.table({
            "query_id": pa.array(qids[ci[fin]]),
            id_col: pa.array(ids[ri[fin]]),
            "dist": pa.array(dcol[fin]),
        })

    parts = encoded.map_batches(
        scan, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    kw = k * max(rerank, 1)
    out = (
        parts.sort_values(["dist", id_col], ascending=[True, True],
                          kind="stable")
        .groupby("query_id", sort=True)
        .head(kw)
        .sort_values(["query_id", "dist", id_col], kind="stable")
        .reset_index(drop=True)
    )
    if rerank <= 1:
        return ray.data.from_pandas(out)

    # ADC+R: one exact pass over the ORIGINAL vectors of the candidate set
    cand_ids = np.unique(out[id_col].to_numpy())
    cand_set = pa.array(cand_ids)

    def exact(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sub = t.filter(pc.is_in(t[id_col], value_set=cand_set))
        if sub.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "query_id": pa.array([], pa.int64()),
                "_sim": pa.array([], pa.float64()),
            })
        em = _normalize(_stack_embeddings(sub[emb_col]))
        sim = em @ qm.T  # (n_cand, nq)
        return pa.table({
            id_col: pa.array(
                np.tile(sub[id_col].to_numpy(zero_copy_only=False),
                        len(qids))),
            "query_id": pa.array(np.repeat(qids, sub.num_rows)),
            "_sim": pa.array(sim.T.reshape(-1)),
        })

    ex = ds.map_batches(
        exact, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas().drop_duplicates(["query_id", id_col])
    merged = out[["query_id", id_col]].merge(ex, on=["query_id", id_col])
    merged["dist"] = np.round(2.0 - 2.0 * merged["_sim"], round_digits or 12)
    final = (
        merged.sort_values(["dist", id_col], ascending=[True, True],
                           kind="stable")
        .groupby("query_id", sort=True)
        .head(k)
        .sort_values(["query_id", "dist", id_col], kind="stable")
        .reset_index(drop=True)[["query_id", id_col, "dist"]]
    )
    return ray.data.from_pandas(final)


def geometric_median(
    ds: ray.data.Dataset,
    *,
    emb_col: str = "embedding",
    iters: int = 5,
    eps: float = 1e-9,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Geometric median of an embedding column (Weiszfeld iterations) —
    the robust centroid: minimizes Σ‖x − m‖ instead of Σ‖x − m‖², so a
    contaminated slice of the corpus cannot drag it the way it drags the
    mean (the anchor for embedding_outliers-style screens when the mean
    itself is polluted). Deterministic: starts from the coordinate mean,
    runs a fixed ``iters`` schedule. Output: one row, ``dim0..dim{d-1}``.

    Scale shape: every iteration is ONE narrow pass of dim-bounded
    partials — each block emits (Σ x/dᵢ, Σ 1/dᵢ) against the broadcast
    current estimate (dᵢ clamped at ``eps``; exact-hit rows contribute
    like Weiszfeld's smoothed variant). Nothing but d-vectors reaches
    the driver. Rows-only contract; numpy parity is pytest-gated.
    """
    def mean_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64()))})
        x = _stack_embeddings(t[emb_col])
        return pa.table({
            "n": pa.array([x.shape[0]], pa.int64()),
            "s": pa.array([x.sum(axis=0).tolist()], pa.list_(pa.float64())),
        })

    mp = ds.select_columns([emb_col]).map_batches(
        mean_partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    n = int(mp["n"].sum()) if len(mp) else 0
    if n == 0:
        raise ValueError("geometric_median needs >= 1 row")
    m = np.sum(np.stack(mp["s"].to_numpy()), axis=0) / n

    for _ in range(iters):
        cur = m

        def partial(t: pa.Table, c=cur) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({
                    "ws": pa.array([], pa.list_(pa.float64())),
                    "w": pa.array([], pa.float64()),
                })
            x = _stack_embeddings(t[emb_col])
            d = np.linalg.norm(x - c, axis=1)
            d = np.maximum(d, eps)
            inv = 1.0 / d
            return pa.table({
                "ws": pa.array([(x * inv[:, None]).sum(axis=0).tolist()],
                               pa.list_(pa.float64())),
                "w": pa.array([float(inv.sum())]),
            })

        parts = ds.select_columns([emb_col]).map_batches(
            partial, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_pandas()
        ws = np.sum(np.stack(parts["ws"].to_numpy()), axis=0)
        w = float(parts["w"].sum())
        m = ws / w

    out = {f"dim{i}": pa.array([round(float(v), round_digits)])
           for i, v in enumerate(m)}
    return ray.data.from_arrow(pa.table(out))


def dr_ate(
    ds: ray.data.Dataset,
    *,
    emb_col: str = "embedding",
    label_col: str = "label",
    outcome_dim: int = 1,
    treat_label: int = 0,
    iters: int = 5,
    lr: float = 0.1,
    clip: float = 0.05,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Doubly-robust (AIPW) average treatment effect with a learned
    logistic propensity — the second causal-inference op next to
    ``aggregate.ate_stratified``: treatment ``t = (label == treat_label)``,
    outcome ``y = v[outcome_dim]`` (0-based; a designated column of the
    feature vector), propensity ``e = clip(sigmoid(x·ŵ), clip, 1−clip)``
    with ``ŵ`` from :func:`logreg_train` (full-batch GD, unrolled-CTE
    oracled), and the intercept-only outcome model ``μ₁, μ₀`` = arm means:

    ``ate_dr = mean[t·(y−μ₁)/e + μ₁] − mean[(1−t)·(y−μ₀)/(1−e) + μ₀]``

    One row out: (n, n_treat, mu1, mu0, ate_naive, ate_dr). The AIPW
    correction reweights each arm by its inverse propensity, so
    confounding that the raw difference-in-means absorbs is removed
    whenever EITHER the propensity or the outcome model is right.

    Scale shape: logreg_train's streaming gradient passes (no shuffle),
    then TWO narrow scoring passes — pass A collapses each block to
    (Σty, Σ(1−t)y, n_t, n) for the arm means, pass B to the two AIPW
    correction sums with the broadcast (ŵ, μ₁, μ₀) riding in the
    closure. The d-float weights are the 6dp-ROUNDED trained output on
    both sides, so the oracle scores with literally identical inputs;
    every downstream op is smooth (no argmax), leaving only summation-
    order ulps that the 6dp output rounding absorbs.
    """
    w_tab = logreg_train(
        ds, emb_col=emb_col, label_col=label_col,
        positive_label=treat_label, iters=iters, lr=lr,
    ).to_pandas().sort_values("j")
    w = w_tab["weight"].to_numpy(dtype=np.float64)  # rounded 6dp

    proj = ds.select_columns([emb_col, label_col]).materialize()

    def pass_a(t: pa.Table) -> pa.Table:
        X = _stack_embeddings(t[emb_col]).astype(np.float64)
        lab = t[label_col].to_numpy(zero_copy_only=False)
        tr = (lab == treat_label).astype(np.float64)
        y = X[:, outcome_dim]
        return pa.table({
            "sty": pa.array([float((tr * y).sum())]),
            "scy": pa.array([float(((1.0 - tr) * y).sum())]),
            "nt": pa.array([int(tr.sum())]),
            "n": pa.array([len(y)]),
        })

    a = proj.map_batches(
        pass_a, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    n = int(a["n"].sum())
    nt = int(a["nt"].sum())
    nc = n - nt
    if n == 0 or nt == 0 or nc == 0:
        return ray.data.from_arrow(pa.table({
            "n": pa.array([n], pa.int64()),
            "n_treat": pa.array([nt], pa.int64()),
            "mu1": pa.array([np.nan]), "mu0": pa.array([np.nan]),
            "ate_naive": pa.array([np.nan]), "ate_dr": pa.array([np.nan]),
        }))
    mu1 = float(a["sty"].sum()) / nt
    mu0 = float(a["scy"].sum()) / nc

    def pass_b(t: pa.Table, w=w, mu1=mu1, mu0=mu0) -> pa.Table:
        X = _stack_embeddings(t[emb_col]).astype(np.float64)
        lab = t[label_col].to_numpy(zero_copy_only=False)
        tr = (lab == treat_label).astype(np.float64)
        y = X[:, outcome_dim]
        e = 1.0 / (1.0 + np.exp(-(X @ w)))
        e = np.minimum(np.maximum(e, clip), 1.0 - clip)
        c1 = (tr * (y - mu1) / e).sum()
        c0 = ((1.0 - tr) * (y - mu0) / (1.0 - e)).sum()
        return pa.table({"c1": pa.array([float(c1)]),
                         "c0": pa.array([float(c0)])})

    b = proj.map_batches(
        pass_b, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    ate_dr = (float(b["c1"].sum()) / n + mu1) \
        - (float(b["c0"].sum()) / n + mu0)
    return ray.data.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "n_treat": pa.array([nt], pa.int64()),
        "mu1": pa.array([np.round(mu1, round_digits)]),
        "mu0": pa.array([np.round(mu0, round_digits)]),
        "ate_naive": pa.array([np.round(mu1 - mu0, round_digits)]),
        "ate_dr": pa.array([np.round(ate_dr, round_digits)]),
    }))


def psm_att(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
    outcome_dim: int = 1,
    treat_label: int = 0,
    iters: int = 5,
    lr: float = 0.1,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Propensity-score MATCHING estimate of the treatment effect on the
    treated (ATT) — the third causal op next to ``ate_stratified``
    (post-stratification) and :func:`dr_ate` (AIPW reweighting): each
    treated unit is matched 1-NN-with-replacement to the control whose
    6dp-ROUNDED propensity is nearest (the rounding makes match selection
    a comparison of identical doubles on both engines); distance ties
    take the control with the smallest id. ``att = mean(y_t −
    y_match(t))``.

    The matching insight that keeps this distributed: because propensities
    are rounded to a fixed grid and same-propensity ties break to the
    SMALLEST control id, only one control per DISTINCT rounded propensity
    can ever be matched. Pass A therefore collapses the control arm to at
    most one representative per grid point (≤ 10^round_digits + 1 rows —
    bounded by the GRID, not the data) merged driver-side; the treated arm
    never materializes: pass B broadcasts the tiny rep table and each
    block collapses to (Σdiff, Σdist, n_t) partials via one searchsorted.

    One row out: (n_treat, n_control, att, mean_match_dist).
    """
    w_tab = logreg_train(
        ds, emb_col=emb_col, label_col=label_col,
        positive_label=treat_label, iters=iters, lr=lr,
    ).to_pandas().sort_values("j")
    w = w_tab["weight"].to_numpy(dtype=np.float64)  # rounded 6dp

    proj = ds.select_columns([id_col, emb_col, label_col]).materialize()

    def _score(t: pa.Table):
        X = _stack_embeddings(t[emb_col]).astype(np.float64)
        lab = t[label_col].to_numpy(zero_copy_only=False)
        tr = lab == treat_label
        y = X[:, outcome_dim]
        p = np.round(1.0 / (1.0 + np.exp(-(X @ w))), round_digits)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return tr, y, p, ids

    def pass_a(t: pa.Table) -> pa.Table:
        tr, y, p, ids = _score(t)
        c = ~tr
        pc, yc, ic = p[c], y[c], ids[c]
        order = np.lexsort((ic, pc))
        pc, yc, ic = pc[order], yc[order], ic[order]
        first = np.ones(len(pc), dtype=bool)
        first[1:] = pc[1:] != pc[:-1]
        return pa.table({
            "p": pa.array(pc[first]),
            "cid": pa.array(ic[first]),
            "y": pa.array(yc[first]),
            "cnt": pa.array(
                np.diff(np.append(np.flatnonzero(first), len(pc)))),
        })

    pass_a_df = (
        proj.map_batches(pass_a, batch_size=None, batch_format="pyarrow",
                         zero_copy_batch=True)
        .to_pandas()
    )
    n_control = int(pass_a_df["cnt"].sum())
    reps = (
        pass_a_df.sort_values(["p", "cid"], kind="stable")
        .drop_duplicates("p", keep="first")
    )
    ps = reps["p"].to_numpy(dtype=np.float64)
    ys = reps["y"].to_numpy(dtype=np.float64)
    ids_c = reps["cid"].to_numpy(dtype=np.int64)

    if len(ps) == 0:
        return ray.data.from_arrow(pa.table({
            "n_treat": pa.array([0], pa.int64()),
            "n_control": pa.array([0], pa.int64()),
            "att": pa.array([np.nan]),
            "mean_match_dist": pa.array([np.nan]),
        }))

    import ray as ray_mod

    rep_ref = ray_mod.put((ps, ys, ids_c))

    def pass_b(t: pa.Table, *, _ref=rep_ref) -> pa.Table:
        import ray as r

        ps, ys, ids_c = r.get(_ref)
        tr, y, p, _ = _score(t)
        pt, yt = p[tr], y[tr]
        nc = len(ps)
        j = np.searchsorted(ps, pt)  # first rep with p >= pt
        jl = np.clip(j - 1, 0, nc - 1)
        jr = np.clip(j, 0, nc - 1)
        dl = np.abs(pt - ps[jl])
        dr = np.abs(ps[jr] - pt)
        dl[j == 0] = np.inf
        dr[j == nc] = np.inf
        pick_left = (dl < dr) | ((dl == dr) & (ids_c[jl] < ids_c[jr]))
        k = np.where(pick_left, jl, jr)
        return pa.table({
            "sdiff": pa.array([float((yt - ys[k]).sum())]),
            "sdist": pa.array([float(np.abs(pt - ps[k]).sum())]),
            "nt": pa.array([int(len(yt))]),
        })

    b = proj.map_batches(
        pass_b, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    nt = int(b["nt"].sum())
    if nt == 0:
        att = dist = np.nan
    else:
        att = np.round(float(b["sdiff"].sum()) / nt, round_digits)
        dist = np.round(float(b["sdist"].sum()) / nt, round_digits)
    return ray.data.from_arrow(pa.table({
        "n_treat": pa.array([nt], pa.int64()),
        "n_control": pa.array([n_control], pa.int64()),
        "att": pa.array([att]),
        "mean_match_dist": pa.array([dist]),
    }))


def knn_graph(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    round_digits: int = 4,
    block_rows: int = 4096,
) -> ray.data.Dataset:
    """Exact cosine k-NN graph over the corpus — the neighbor structure
    feeding dedup clustering, label propagation and UMAP-style layouts:
    for every vector, its top-k neighbors by cosine (self excluded),
    ties on the ``round_digits``-rounded similarity breaking to the
    ascending neighbor id. Output: (id, rank, neighbor, cosine).

    Scale shape (blocked matmul): pass 1 materializes normalized
    (ids, matrix) blocks of ``block_rows`` into the object store; pass 2
    maps over the SAME blocks, each task streaming the full block list
    via zero-copy plasma gets and folding a running per-row top-k — the
    k-NN of a block is complete when its task ends, so there is no
    second exchange and task memory stays O(block_rows · (d + k)).
    Compute is exactly n²·d/2⁰ multiplies — the EXACT estimator; for
    corpus scales where n² is not affordable, route through
    :func:`ivf_topk`'s coarse-quantizer pruning instead (same output
    contract, approximate recall).
    """
    import pyarrow.compute as _pc  # noqa: F401  (parity with siblings)

    proj = ds.select_columns([id_col, emb_col])

    def pack(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        X = _normalize(_stack_embeddings(t[emb_col]))
        d = X.shape[1] if len(X) else 0
        off = np.array([0, X.size], dtype=np.int64)
        return pa.table({
            "ids": pa.LargeListArray.from_arrays(
                np.array([0, len(ids)], dtype=np.int64), pa.array(ids)),
            "flat": pa.LargeListArray.from_arrays(
                off, pa.array(X.ravel())),
            "dim": pa.array([d], pa.int64()),
        })

    packed = proj.map_batches(
        pack, batch_size=block_rows, batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    refs = [r for rb in packed.iter_internal_ref_bundles()
            for r in rb.block_refs]

    def _unpack(tbl: pa.Table):
        """Yield (ids, matrix) for every packed row of a block — blocks
        can hold SEVERAL packed rows (Ray coalesces map outputs)."""
        for i in range(tbl.num_rows):
            ids = np.asarray(tbl["ids"][i].as_py(), dtype=np.int64)
            d = int(tbl["dim"][i].as_py())
            if d == 0 or len(ids) == 0:
                continue
            yield ids, np.asarray(
                tbl["flat"][i].as_py(), dtype=np.float64).reshape(-1, d)

    def score(t: pa.Table, refs=refs) -> pa.Table:
        out_empty = pa.table({
            "id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "neighbor": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        })
        parts = list(_unpack(t))
        if not parts:
            return out_empty
        my_ids = np.concatenate([p[0] for p in parts])
        X = np.vstack([p[1] for p in parts])
        n = len(my_ids)
        best_s = np.full((n, k), -np.inf)
        best_j = np.full((n, k), np.iinfo(np.int64).max, dtype=np.int64)
        others = []
        for ref in refs:
            others.extend(_unpack(ray.get(ref)))  # zero-copy plasma map
        for o_ids, Y in others:
            sims = np.round(X @ Y.T, round_digits)
            # self-pairs out
            self_mask = my_ids[:, None] == o_ids[None, :]
            sims[self_mask] = -np.inf
            # merge candidates into the running top-k: concat + select
            cand_s = np.concatenate([best_s, sims], axis=1)
            cand_j = np.concatenate(
                [best_j, np.broadcast_to(o_ids, sims.shape)], axis=1)
            # order by (-sim, id): lexsort per row
            order = np.lexsort((cand_j, -cand_s), axis=1)[:, :k]
            rows = np.arange(n)[:, None]
            best_s = cand_s[rows, order]
            best_j = cand_j[rows, order]
        valid = np.isfinite(best_s)
        ranks = np.broadcast_to(np.arange(1, k + 1), (n, k))
        ids_rep = np.broadcast_to(my_ids[:, None], (n, k))
        return pa.table({
            "id": pa.array(ids_rep[valid]),
            "rank": pa.array(ranks[valid].astype(np.int64)),
            "neighbor": pa.array(best_j[valid]),
            "cosine": pa.array(best_s[valid]),
        })

    return packed.map_batches(
        score, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )


def energy_distance(
    ds: ray.data.Dataset,
    *,
    emb_col: str = "embedding",
    label_col: str = "label",
    group_a: int = 0,
    round_digits: int = 6,
    strip_rows: int = 256,
) -> ray.data.Dataset:
    """Multivariate two-sample energy distance between the embedding
    distributions of group A (``label == group_a``) and group B (the
    rest) — the multivariate member of the drift family (ks_test /
    wasserstein are 1-D): ``E = 2·mean‖X−Y‖ − mean‖X−X'‖ − mean‖Y−Y'‖``
    with means over ALL ordered pairs (self-pairs contribute zero and are
    included, the 1/n² convention). E ≥ 0, and E = 0 iff the
    distributions coincide — a full-vector drift alarm where per-
    dimension tests can't see correlated shift.

    Distances are computed in the ``Σ(aᵢ−bᵢ)²`` elementwise form (the
    oracle's ``list_distance`` path — the ‖a‖²−2ab matmul trick is NOT
    float-identical), strip-chunked so the (batch × strip × dim) cube
    stays ~tens of MB.

    Scale shape: the grouped matrices broadcast once via ``ray.put``;
    each block collapses to five partial sums. O(n²) distance work is
    inherent to the statistic — at corpus scale, subsample per group
    upstream (``group_sample``) or strip-block like ``semantic_dedup``;
    the contract keeps both sides in one broadcast.
    """
    proj = ds.select_columns([emb_col, label_col]).materialize()

    def collect(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.and_kleene(pc.is_valid(t[emb_col]),
                                   pc.is_valid(t[label_col])))
        X = _stack_embeddings(t[emb_col]).astype(np.float64)
        lab = t[label_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array([X[lab == group_a].tobytes()]),
            "na": pa.array([int((lab == group_a).sum())]),
            "b": pa.array([X[lab != group_a].tobytes()]),
            "nb": pa.array([int((lab != group_a).sum())]),
            "d": pa.array([X.shape[1] if X.size else 0]),
        })

    got = proj.map_batches(
        collect, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    dim = int(got["d"].max()) if len(got) else 0
    A = np.concatenate([
        np.frombuffer(buf, dtype=np.float64).reshape(-1, dim)
        for buf in got["a"]]) if dim else np.empty((0, 0))
    Bm = np.concatenate([
        np.frombuffer(buf, dtype=np.float64).reshape(-1, dim)
        for buf in got["b"]]) if dim else np.empty((0, 0))
    na, nb = len(A), len(Bm)
    if na == 0 or nb == 0:
        return ray.data.from_arrow(pa.table({
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "e_xy": pa.array([np.nan]), "e_xx": pa.array([np.nan]),
            "e_yy": pa.array([np.nan]),
            "energy_distance": pa.array([np.nan]),
        }))

    import ray as ray_mod

    mref = ray_mod.put((A, Bm))

    def _strip_sum(X: np.ndarray, M: np.ndarray) -> float:
        if len(X) == 0 or len(M) == 0:
            return 0.0
        # reused buffer + in-place ufuncs: fresh allocations are page-
        # fault-bound on this host (CLAUDE.md) and dominate otherwise
        buf = np.empty((len(X), min(strip_rows, len(M)), X.shape[1]))
        tot = 0.0
        for s in range(0, len(M), strip_rows):
            seg = M[s:s + strip_rows]
            b = buf[:, :len(seg), :]
            np.subtract(X[:, None, :], seg[None, :, :], out=b)
            np.multiply(b, b, out=b)
            d2 = b.sum(-1)
            np.sqrt(d2, out=d2)
            tot += float(d2.sum())
        return tot

    def pair_partial(t: pa.Table, *, _ref=mref) -> pa.Table:
        import ray as r
        import pyarrow.compute as pc

        A, Bm = r.get(_ref)
        t = t.filter(pc.and_kleene(pc.is_valid(t[emb_col]),
                                   pc.is_valid(t[label_col])))
        X = _stack_embeddings(t[emb_col]).astype(np.float64)
        lab = t[label_col].to_numpy(zero_copy_only=False)
        Xa, Xb = X[lab == group_a], X[lab != group_a]
        sxy = _strip_sum(Xa, Bm) if len(Xa) else 0.0
        sxx = _strip_sum(Xa, A) if len(Xa) else 0.0
        syy = _strip_sum(Xb, Bm) if len(Xb) else 0.0
        return pa.table({"sxy": pa.array([sxy]), "sxx": pa.array([sxx]),
                         "syy": pa.array([syy])})

    p = proj.map_batches(
        pair_partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    e_xy = float(p["sxy"].sum()) / (na * nb)
    e_xx = float(p["sxx"].sum()) / (na * na)
    e_yy = float(p["syy"].sum()) / (nb * nb)
    e = 2.0 * e_xy - e_xx - e_yy
    r6 = lambda v: np.round(v, round_digits)  # noqa: E731
    return ray.data.from_arrow(pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "e_xy": pa.array([r6(e_xy)]), "e_xx": pa.array([r6(e_xx)]),
        "e_yy": pa.array([r6(e_yy)]),
        "energy_distance": pa.array([r6(e)]),
    }))


def reciprocal_nn(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_digits: int = 4,
    block_rows: int = 4096,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Mutual nearest neighbors — pairs where each vector is the other's
    1-NN by rounded cosine (ties → ascending id, the knn contract). The
    margin-free bitext/translation-pair mining primitive (Artetxe &
    Schwenk's margin scoring reduces to this at k=1): reciprocity is the
    cheapest high-precision filter on a neighbor graph.

    Scale shape: :func:`knn_graph` at k=1 (blocked matmul, broadcast
    norm blocks), then each edge canonicalizes to (min, max) and ONE
    hash(a) exchange groups the two directions of a pair — a pair
    survives iff both directions landed (count == 2). Output:
    (a, b, cosine) with a < b; both directions carry the same rounded
    cosine, so the pair's score is direction-free.
    """
    nn = knn_graph(
        ds, id_col=id_col, emb_col=emb_col, k=1,
        round_digits=round_digits, block_rows=block_rows,
    )

    def canon(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["neighbor"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "a": pa.array(np.minimum(i, nb)),
            "b": pa.array(np.maximum(i, nb)),
            "cosine": t["cosine"],
        })

    edges = nn.map_batches(
        canon, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )

    from featherstore_ray.partition import BUCKET_COL, add_bucket_column
    from featherstore_ray.exchange import bucketed_map_groups

    def mutual(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        cnt = df.groupby(["a", "b"], sort=False)["cosine"].transform("size")
        out = df[cnt == 2].drop_duplicates(["a", "b"])
        return out[["a", "b", "cosine"]]

    return bucketed_map_groups(
        add_bucket_column(edges, "a", num_buckets), mutual,
        num_buckets=num_buckets, batch_format="pandas",
    )


def rrf_fuse(
    ds: ray.data.Dataset,
    query_vecs,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k0: int = 60,
    top: int = 20,
    round_digits: int = 4,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Reciprocal-rank fusion of several retrieval rankings — the
    standard zero-tuning list merger (Cormack et al.): each query vector
    induces a full cosine ranking of the corpus (score DESC, id ASC on
    the ``round_digits``-rounded similarity — the ann rounding contract);
    the fused score is ``Σ_q 1/(k0 + rank_q)`` and the output is the
    fused top-``top`` with (rrf DESC, id ASC) ties. Ranks are integers,
    so the fused sums are IEEE-identical across engines — no rounding
    needed past the per-query cosine grid.

    Scale shape: one broadcast scoring pass per query (vector rides in
    the closure), each ranking via :func:`~featherstore_ray.stages.misc.
    global_rank`'s sample-sort (three narrow passes + ONE range
    exchange), rankings co-joined by ``hash_join`` on the id, and a
    per-batch partial top-k final — at no point does a full ranking
    reach the driver.
    """
    from featherstore_ray.stages.join import hash_join
    from featherstore_ray.stages.misc import global_rank, top_k

    fused = None
    for qi, qv in enumerate(query_vecs):
        q = np.asarray(qv, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)

        def score(t: pa.Table, q=q) -> pa.Table:
            X = _normalize(_stack_embeddings(t[emb_col]))
            s = np.round(X @ q, round_digits)
            return pa.table({
                id_col: t[id_col],
                # rank DESC by score == rank ASC by -score
                "_neg": pa.array(-s),
            })

        scored = ds.select_columns([id_col, emb_col]).map_batches(
            score, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ranked = global_rank(
            scored, "_neg", id_col, out_col=f"rank_{qi}",
            num_buckets=num_buckets,
        ).select_columns([id_col, f"rank_{qi}"])
        fused = ranked if fused is None else hash_join(
            fused, ranked, on=[id_col], how="inner",
            num_partitions=num_buckets,
        )

    nq = len(query_vecs)

    def combine(t: pa.Table) -> pa.Table:
        rrf = np.zeros(t.num_rows, dtype=np.float64)
        for qi in range(nq):
            r = t[f"rank_{qi}"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            rrf = rrf + 1.0 / (k0 + r)
        return t.append_column("rrf", pa.array(rrf))

    out = fused.map_batches(
        combine, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return top_k(out, "rrf", top, descending=True, tiebreak=id_col)


def lof_outliers(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    round_digits: int = 4,
    out_digits: int = 6,
    block_rows: int = 4096,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Local Outlier Factor (Breunig et al. 2000) over an embedding
    column — the DENSITY-RATIO anomaly member next to
    :func:`embedding_outliers` (global Gaussian) and ``mad_outliers``
    (univariate): LOF(a) ≈ 1 means a sits in a neighborhood as dense as
    its neighbors'; LOF ≫ 1 flags locally sparse points that a global
    model misses. Uses the k-NN-SET variant (exactly k neighbors by the
    knn contract: ``round_digits``-rounded cosine DESC, ascending-id
    ties) with cosine distance d = 1 − cosine. kdist(a) = d at rank k;
    reach(a,b) = max(kdist(b), d(a,b)); lrd(a) = k / Σ_b reach(a,b);
    LOF(a) = (Σ_b lrd(b) / k) / lrd(a). lrd/lof round at ``out_digits``
    (internals stay unrounded on both sides); kdist is a 1−grid value,
    bit-identical cross-engine, left unrounded. Duplicate-point
    neighborhoods (Σ reach = 0) emit null lrd/lof, SQL CASE mirror.

    Scale shape: :func:`knn_graph` does the heavy part (blocked matmul,
    no second exchange); the LOF algebra is three bucketed
    ``hash_join``s on node-sized tables plus two id-keyed group
    exchanges — every table is O(n·k), nothing reaches the driver.
    """
    import pyarrow.compute as pc

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import add_bucket_column
    from featherstore_ray.stages.join import hash_join

    nn = knn_graph(
        ds, id_col=id_col, emb_col=emb_col, k=k,
        round_digits=round_digits, block_rows=block_rows,
    )

    def with_dist(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": t["id"].combine_chunks(),
            "neighbor": t["neighbor"].combine_chunks(),
            "rank": t["rank"].combine_chunks(),
            "dist": pc.subtract(pa.scalar(1.0, pa.float64()), t["cosine"]),
        })

    edges = nn.map_batches(
        with_dist, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def kd_of(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["rank"], k))
        return pa.table({
            "neighbor": t["id"].combine_chunks(),
            "_kdist": t["dist"].combine_chunks(),
        })

    kd = edges.map_batches(kd_of, batch_size=None, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    reach = hash_join(
        edges.select_columns(["id", "neighbor", "dist"]), kd,
        on=["neighbor"], num_partitions=num_buckets,
    )

    def lrd_kernel(df: pd.DataFrame) -> pd.DataFrame:
        r = np.maximum(df["_kdist"].to_numpy(np.float64),
                       df["dist"].to_numpy(np.float64))
        g = pd.DataFrame({"id": df["id"].to_numpy(np.int64), "_r": r})
        s = g.groupby("id", as_index=False)["_r"].sum()
        sr = s["_r"].to_numpy(np.float64)
        with np.errstate(divide="ignore"):
            lrd = np.where(sr > 0.0, float(k) / sr, np.nan)
        return pd.DataFrame({"id": s["id"].astype(np.int64),
                             "_lrd": lrd})

    lrd = bucketed_map_groups(
        add_bucket_column(reach, "id", num_buckets), lrd_kernel,
        num_buckets=num_buckets, batch_format="pandas",
    ).materialize()

    def lrd_as_neighbor(t: pa.Table) -> pa.Table:
        return pa.table({
            "neighbor": t["id"].combine_chunks(),
            "_lrd_b": t["_lrd"].combine_chunks(),
        })

    e2 = hash_join(
        edges.select_columns(["id", "neighbor"]),
        lrd.map_batches(lrd_as_neighbor, batch_size=None,
                        batch_format="pyarrow", zero_copy_batch=True),
        on=["neighbor"], num_partitions=num_buckets,
    )

    def slb_kernel(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"id": df["id"].to_numpy(np.int64),
                          "_lb": df["_lrd_b"].to_numpy(np.float64)})
        s = g.groupby("id", as_index=False)["_lb"].sum()
        return pd.DataFrame({"id": s["id"].astype(np.int64),
                             "_slb": s["_lb"].to_numpy(np.float64)})

    slb = bucketed_map_groups(
        add_bucket_column(e2, "id", num_buckets), slb_kernel,
        num_buckets=num_buckets, batch_format="pandas",
    )

    def kd_self(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": t["neighbor"].combine_chunks(),
            "kdist": t["_kdist"].combine_chunks(),
        })

    joined = hash_join(
        hash_join(slb, lrd, on=["id"], num_partitions=num_buckets),
        kd.map_batches(kd_self, batch_size=None, batch_format="pyarrow",
                       zero_copy_batch=True),
        on=["id"], num_partitions=num_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        lr = t["_lrd"].to_numpy(zero_copy_only=False).astype(np.float64)
        sl = t["_slb"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            lof = (sl / float(k)) / lr
        return pa.table({
            id_col: t["id"].combine_chunks(),
            "kdist": t["kdist"].combine_chunks(),
            "lrd": pa.array(np.round(lr, out_digits)),
            "lof": pa.array(np.round(lof, out_digits)),
        })

    return joined.map_batches(finish, batch_size=None,
                              batch_format="pyarrow", zero_copy_batch=True)


def ecod_outliers(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    *,
    dims: int = 8,
    range_buckets: int = 8,
    num_buckets: int = 32,
    sample_per_batch: int = 256,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """ECOD outlier scores (Li et al. 2022) over the leading ``dims``
    embedding dimensions — the NONPARAMETRIC member of the outlier
    family (:func:`embedding_outliers` is Gaussian-moment Mahalanobis,
    :func:`lof_outliers` is local density): per dimension, the left /
    right empirical tail probabilities ``F_l(x) = #{≤ x}/n`` and
    ``F_r(x) = #{≥ x}/n``; per row, ``o_left = Σ_d −ln F_l``,
    ``o_right = Σ_d −ln F_r``, ``score = max(o_left, o_right)`` (the
    skewness-auto branch of the paper is omitted — documented variant).
    Tail probabilities are exact rationals k/n, so the oracle is a
    ``cume_dist()`` window mirror.

    Scale shape — a per-dim fused :func:`~featherstore_ray.stages.misc.
    global_rank` (sample-sort): the 2-column projection materializes
    ONCE; a per-batch evenly-spaced sample picks per-dim range
    splitters; a narrow counting pass (one ``dims × R`` vector per
    block) prefix-sums to exact global offsets; values exchange ONCE by
    ``(dim, range)`` composite bucket — equal values share a bucket
    (side="left"), so tie counts are exact — and each bucket converts
    local searchsorted ranks to global tail counts; a second exchange
    on ``hash(id)`` re-assembles the per-row sums. Only (id, dim, tail
    terms) triples ever move; no dimension is ever whole in one task.
    """
    import pyarrow.compute as pc

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    if dims < 1 or range_buckets < 1:
        raise ValueError("dims and range_buckets must be >= 1")

    proj = ds.select_columns([id_col, emb_col]).materialize()

    def sample(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[emb_col]))
        if t.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64())})
        m = _stack_embeddings(t[emb_col])[:, :dims]
        step = max(1, len(m) // sample_per_batch)
        m = m[::step][:sample_per_batch]
        d = np.tile(np.arange(dims, dtype=np.int64), len(m))
        return pa.table({"d": d, "v": m.ravel()})

    sampled = proj.map_batches(
        sample, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True).to_pandas()
    qs = np.linspace(0, 1, range_buckets + 1)[1:-1]
    splitters = []  # per dim, ≤ R-1 ascending unique splitters
    for d in range(dims):
        v = sampled.loc[sampled["d"] == d, "v"].to_numpy()
        splitters.append(np.unique(np.quantile(v, qs)) if len(v)
                         else np.array([], dtype=np.float64))
    nb_per_dim = np.array([len(s) + 1 for s in splitters], dtype=np.int64)
    dim_base = np.concatenate([[0], np.cumsum(nb_per_dim)[:-1]])
    nb_total = int(nb_per_dim.sum())

    def explode(t: pa.Table) -> pa.Table:
        """(id, dim, value, composite range bucket) triples."""
        t = t.filter(pc.is_valid(t[emb_col]))
        n = t.num_rows
        if n == 0:
            return pa.table({
                id_col: pa.array([], t.schema.field(id_col).type),
                "d": pa.array([], pa.int64()),
                "v": pa.array([], pa.float64()),
                BUCKET_COL: pa.array([], pa.int64())})
        m = _stack_embeddings(t[emb_col])[:, :dims]
        ids = t[id_col].combine_chunks().take(
            pa.array(np.repeat(np.arange(n), dims)))
        d = np.tile(np.arange(dims, dtype=np.int64), n)
        v = m.ravel()
        b = np.empty(n * dims, dtype=np.int64)
        for di in range(dims):
            sl = slice(di, None, dims)
            b[sl] = dim_base[di] + np.searchsorted(
                splitters[di], v[sl], side="left")
        return pa.table({id_col: ids, "d": d, "v": v, BUCKET_COL: b})

    def count(t: pa.Table) -> pa.Table:
        return pa.table({
            "b": np.arange(nb_total, dtype=np.int64),
            "c": np.bincount(
                t[BUCKET_COL].to_numpy(zero_copy_only=False),
                minlength=nb_total).astype(np.int64)})

    exploded = proj.map_batches(
        explode, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)
    sizes = (exploded.map_batches(
        count, batch_size=None, batch_format="pyarrow")
        .to_pandas().groupby("b")["c"].sum()
        .reindex(range(nb_total), fill_value=0).to_numpy())
    # per-dim prefix offsets + per-dim totals
    offsets = np.empty(nb_total, dtype=np.int64)
    n_per_dim = np.empty(dims, dtype=np.int64)
    for di in range(dims):
        lo, hi = dim_base[di], dim_base[di] + nb_per_dim[di]
        offsets[lo:hi] = np.concatenate([[0], np.cumsum(sizes[lo:hi])[:-1]])
        n_per_dim[di] = sizes[lo:hi].sum()

    def tails(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df[BUCKET_COL].iloc[0])
        v = df["v"].to_numpy()
        d = int(df["d"].iloc[0])
        n = float(n_per_dim[d])
        vs = np.sort(v)
        le = offsets[b] + np.searchsorted(vs, v, side="right")
        lt = offsets[b] + np.searchsorted(vs, v, side="left")
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "_tl": -np.log(le / n),
            "_tr": -np.log((n - lt) / n)})

    terms = bucketed_map_groups(
        exploded, tails, num_buckets=nb_total, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.drop(columns=[BUCKET_COL])
             .groupby(id_col, sort=True)[["_tl", "_tr"]].sum())
        score = np.maximum(g["_tl"].to_numpy(), g["_tr"].to_numpy())
        return pd.DataFrame({
            id_col: g.index.to_numpy(),
            "o_left": np.round(g["_tl"].to_numpy(), round_digits),
            "o_right": np.round(g["_tr"].to_numpy(), round_digits),
            "score": np.round(score, round_digits)})

    return bucketed_map_groups(
        add_bucket_column(terms, id_col, num_buckets), finish,
        num_buckets=num_buckets, batch_format="pandas")


def retrieval_eval(
    ds: ray.data.Dataset,
    queries: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
    k: int = 20,
    round_digits: int = 4,
    out_digits: int = 6,
) -> ray.data.Dataset:
    """Per-query retrieval quality over a labeled corpus — MRR@k, MAP@k
    and recall@k, the ranking-eval triple next to auc/ndcg (those grade
    a SCORE column; this grades an actual retrieval run end to end):
    each query vector ranks the corpus by the knn contract (rounded
    cosine DESC, ascending id, self excluded); relevant = corpus label
    equals the query's label. ``first_rel``/``rel_k`` are exact ints;
    ``mrr = 1/first_rel`` (0.0 when nothing relevant lands in the top
    k), ``ap_k = Σ_{i≤k, rel} (cum_rel_i / i) / min(R, k)`` and
    ``recall_k = rel_k / R`` with R = corpus relevant count (query
    excluded) — integer ratios, rounded at ``out_digits``.

    Scale shape: the query matrix ships by value in the scorer closure
    (one broadcast); each batch emits O(queries·k) top-k partials plus a
    per-label count partial (classes are bounded); the driver folds
    partials only — the corpus is never collected.
    """
    qm = _normalize(_stack_embeddings(queries[emb_col]))
    qids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    qlabs = queries[label_col].to_numpy(
        zero_copy_only=False).astype(np.int64)
    scorer = _TopKScorer({"ids": qids, "matrix": qm},
                         id_col, emb_col, k, round_digits)

    def part(t: pa.Table) -> pd.DataFrame:
        top = scorer(t).to_pandas()
        lab = pd.DataFrame({
            id_col: t[id_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "_lab": t[label_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        return top.merge(lab, on=id_col, how="left")

    merged = _merge_topk(
        ds.map_batches(part, batch_size=None, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas(),
        id_col, k)

    def label_counts(t: pa.Table) -> pd.DataFrame:
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(lab, return_counts=True)
        return pd.DataFrame({"_lab": u, "_c": c.astype(np.int64)})

    counts = (ds.map_batches(label_counts, batch_size=None,
                             batch_format="pyarrow", zero_copy_batch=True)
              .to_pandas().groupby("_lab")["_c"].sum())

    rows = []
    for qi, ql in zip(qids.tolist(), qlabs.tolist()):
        g = merged[merged["query_id"] == qi]
        rel = (g["_lab"].to_numpy(np.int64) == ql).astype(np.int64)
        ranks = np.arange(1, len(rel) + 1, dtype=np.int64)
        cum = np.cumsum(rel)
        r_total = int(counts.get(ql, 0)) - 1  # query itself excluded
        rel_k = int(rel.sum())
        hit = np.nonzero(rel)[0]
        first_rel = int(ranks[hit[0]]) if len(hit) else None
        mrr = 1.0 / first_rel if first_rel is not None else 0.0
        denom = min(r_total, k)
        ap = (float(np.sum(np.where(rel == 1, cum / ranks, 0.0)))
              / denom) if denom > 0 else None
        recall = rel_k / r_total if r_total > 0 else None
        rows.append((qi, rel_k, first_rel,
                     round(mrr, out_digits),
                     round(ap, out_digits) if ap is not None else None,
                     round(recall, out_digits)
                     if recall is not None else None))
    cols = list(zip(*rows)) if rows else [[]] * 6
    return ray.data.from_arrow(pa.table({
        "query_id": pa.array(cols[0], pa.int64()),
        "rel_k": pa.array(cols[1], pa.int64()),
        "first_rel": pa.array(cols[2], pa.int64()),
        "mrr": pa.array(cols[3], pa.float64()),
        "ap_k": pa.array(cols[4], pa.float64()),
        "recall_k": pa.array(cols[5], pa.float64()),
    }))


def knn_shapley(
    ds: ray.data.Dataset,
    test_table: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    round_digits: int = 6,
    dist_digits: int = 4,
    num_buckets: int = 8,
) -> ray.data.Dataset:
    """Exact KNN-Shapley data valuation (Jia et al., PVLDB 2019) — the
    training-data VALUATION family: the Shapley value of every training
    vector for a K-NN classifier admits a closed form over the
    distance-sorted order, so "which corpus rows actually help the
    model" is computable exactly, no Monte-Carlo: with training points
    sorted by distance to a test point (α₁ nearest),

        s(α_N) = 1[y_N = y] / N
        s(α_i) = s(α_{i+1}) + (1[y_i = y] − 1[y_{i+1} = y]) · min(K,i)/(K·i)

    i.e. a SUFFIX SUM of per-rank terms — mirrored by the oracle's
    ``SUM() OVER (ORDER BY rank DESC)``. Distances use the elementwise
    ``sqrt(Σ(aᵢ−bᵢ)²)`` form rounded to ``dist_digits`` for the rank
    (ties → training id), the reciprocal_nn precedent; all terms are
    exact-int numerators over exact-int denominators. Output per
    (test, training) pair: (test_id, vec_id, rnk, shapley).

    Scale shape: the test matrix (queries × dim) enters each batch as a
    closure constant; pass 1 collapses every block to (test, id, dist,
    agree) quadruples — distances move, never vectors; pass 2 is ONE
    hash(test) exchange whose kernel sorts each test's column and runs
    the closed form (per-test global order is inherent to the
    statistic; for corpus-scale N route the rank pass through the
    global_rank sample-sort and keep the suffix sum as a range-carry
    scan).
    """
    import pyarrow.compute as pc

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    tq = test_table
    Q = _stack_embeddings(tq[emb_col]).astype(np.float64)
    qids = tq[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    qlab = tq[label_col].to_numpy(zero_copy_only=False).astype(np.int64)

    def dist_partial(t: pa.Table, *, _Q=Q, _qi=qids, _ql=qlab) -> pa.Table:
        t = t.filter(pc.and_kleene(pc.is_valid(t[emb_col]),
                                   pc.is_valid(t[label_col])))
        if t.num_rows == 0:
            return pa.table({
                "tid": pa.array([], pa.int64()),
                "vid": pa.array([], pa.int64()),
                "dist": pa.array([], pa.float64()),
                "ind": pa.array([], pa.int64()),
            })
        X = _stack_embeddings(t[emb_col]).astype(np.float64)
        vid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nq = len(_qi)
        d = X[:, None, :] - _Q[None, :, :]
        d = d * d
        dist = np.sqrt(d.sum(-1))
        if dist_digits is not None:
            dist = np.round(dist, dist_digits)
        ind = (lab[:, None] == _ql[None, :]).astype(np.int64)
        return pa.table({
            "tid": pa.array(np.tile(_qi, len(vid)), pa.int64()),
            "vid": pa.array(np.repeat(vid, nq), pa.int64()),
            "dist": pa.array(dist.ravel(), pa.float64()),
            "ind": pa.array(ind.ravel(), pa.int64()),
        })

    parts = ds.select_columns([id_col, emb_col, label_col]).map_batches(
        dist_partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)

    kk = int(k)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=[BUCKET_COL])
        out = []
        for tid, g in d.groupby("tid", sort=True):
            g = g.sort_values(["dist", "vid"], kind="stable")
            n = len(g)
            ind = g["ind"].to_numpy(np.int64)
            rnk = np.arange(1, n + 1, dtype=np.int64)
            term = np.empty(n, np.float64)
            if n > 1:
                di = ind[:-1] - ind[1:]
                term[:-1] = (di * np.minimum(kk, rnk[:-1])) \
                    / (kk * rnk[:-1])
            term[-1] = ind[-1] / n
            sh = np.cumsum(term[::-1])[::-1]
            out.append(pd.DataFrame({
                "test_id": np.full(n, tid, np.int64),
                "vec_id": g["vid"].to_numpy(np.int64),
                "rnk": rnk,
                "shapley": np.round(sh, round_digits),
            }))
        if not out:
            return pd.DataFrame({
                "test_id": pd.Series(dtype="int64"),
                "vec_id": pd.Series(dtype="int64"),
                "rnk": pd.Series(dtype="int64"),
                "shapley": pd.Series(dtype="float64"),
            })
        return pd.concat(out, ignore_index=True)

    return bucketed_map_groups(
        add_bucket_column(parts, "tid", num_buckets),
        kernel, num_buckets=num_buckets, batch_format="pandas")
