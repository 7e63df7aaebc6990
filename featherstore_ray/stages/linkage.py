"""Record linkage: blocked fuzzy-string self-join (edit distance).

The reference has no record-linkage operator — this is extension surface
for the training-data use case (canonicalizing noisy entity/product/name
columns before joining or deduping). The algorithm is the Ed-Join prefix
filter (Xiao, Wang, Lin — "Ed-Join: an efficient algorithm for similarity
joins with edit distance constraints", VLDB 2008): a pair of strings
within edit distance ``d`` must share at least one q-gram among each
side's ``q*d + 1`` globally-rarest distinct q-grams, so blocking on those
prefix grams is COMPLETE for the threshold — no recall loss, unlike naive
token blocking. (Proof: one edit destroys at most ``q`` positional
q-grams, so at most ``q*d`` distinct gram types of ``a`` can be missing
from ``b``; order grams globally by (df, gram) and the two prefixes must
intersect — see ``tests/test_linkage.py`` brute-force parity.)

Scale shape (100 TB): three narrow bucket exchanges, all on columns that
shrink the data first —
  1. DISTINCT values of the text column (per-batch ``pc.unique`` partial,
     then one exchange on ``hash(text)``) — linkage runs at *value* level,
     never row level, so a column with heavy duplication collapses before
     any pairing;
  2. prefix-gram postings ``(gram, value)`` exchange — each value emits at
     most ``q*d + 1`` postings regardless of length;
  3. candidate-pair exchange on ``hash(value_a)`` for global dedup +
     vectorized Levenshtein verification.
The gram document-frequency table is bounded by the q-gram vocabulary
(≤ 256^q codes, in practice a few thousand) — per-block count partials
merge driver-side and broadcast once via ``ray.put``, like the lm_score
bigram table; no shuffle for the statistics pass.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..exchange import bucketed_map_groups
from ..partition import add_bucket_column
from .text import _byte_view

__all__ = ["fuzzy_join", "levenshtein_batch"]


def levenshtein_batch(a_col, b_col) -> np.ndarray:
    """Unit-cost Levenshtein distance for P string pairs, vectorized over
    the pair axis: the DP advances one row of every pair's matrix per
    iteration (O(max_len) Python steps of (P × max_len) ufunc work).
    The insertion recurrence ``cur[j] = min(cur[j], cur[j-1] + 1)`` is a
    prefix-min of ``cur[k] - k`` (then ``+ j``), so each row is loop-free.
    Matches DuckDB's ``levenshtein`` exactly (same unit-cost DP).
    """
    A, la = _pad_matrix(a_col)
    B, lb = _pad_matrix(b_col)
    P = A.shape[0]
    if P == 0:
        return np.empty(0, np.int64)
    maxa, maxb = A.shape[1], B.shape[1]
    ar = np.arange(maxb + 1, dtype=np.int32)
    prev = np.broadcast_to(ar, (P, maxb + 1)).copy()
    res = lb.astype(np.int64).copy()  # correct for pairs with len(a) == 0
    for i in range(1, maxa + 1):
        sub = prev[:, :-1] + (A[:, i - 1 : i] != B)
        cur = np.empty_like(prev)
        cur[:, 0] = i
        np.minimum(prev[:, 1:] + 1, sub, out=cur[:, 1:])
        np.subtract(cur, ar, out=cur)
        np.minimum.accumulate(cur, axis=1, out=cur)
        np.add(cur, ar, out=cur)
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev = cur
    return res


def _pad_matrix(col) -> tuple[np.ndarray, np.ndarray]:
    """String column → zero-padded (P, maxlen) uint8 matrix + lengths."""
    data, off = _byte_view(col)
    lens = off[1:] - off[:-1]
    P = len(lens)
    maxlen = int(lens.max()) if P else 0
    M = np.zeros((P, max(maxlen, 1)), np.uint8)
    if P and lens.sum() > 0:
        starts = off[:-1]
        rows = np.repeat(np.arange(P), lens)
        rowpos = np.arange(int(lens.sum())) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        M[rows, rowpos] = data[np.repeat(starts, lens) + rowpos]
    return M, lens.astype(np.int64)


def _distinct_grams(t: pa.Table, text_col: str, q: int):
    """Per-row DISTINCT q-gram int64 codes (big-endian byte polynomial, so
    code order == byte-lexicographic gram order for fixed q). Returns
    (row_idx, code) sorted by (row, code); rows shorter than q bytes emit
    nothing."""
    z = np.empty(0, np.int64)
    data, off = _byte_view(t[text_col])
    n = t.num_rows
    if n == 0 or off[-1] - off[0] < q:
        return z, z
    region = data[off[0] : off[-1]].astype(np.int64)
    lens = (off[1:] - off[:-1]).astype(np.int64)
    doc_of = np.repeat(np.arange(n), lens)
    T = len(region) - q + 1
    code = region[:T].copy()
    for j in range(1, q):
        code <<= 8
        code += region[j : T + j]
    valid = doc_of[:T] == doc_of[q - 1 :]
    docs, code = doc_of[:T][valid], code[valid]
    if len(docs) == 0:
        return z, z
    order = np.lexsort((code, docs))
    docs, code = docs[order], code[order]
    first = np.ones(len(docs), dtype=bool)
    first[1:] = (docs[1:] != docs[:-1]) | (code[1:] != code[:-1])
    return docs[first], code[first]


def fuzzy_join(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    max_dist: int = 3,
    q: int = 2,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact edit-distance similarity self-join over the DISTINCT values
    of ``text_col``: emits ``(name_a, name_b, dist)`` for every unordered
    pair of distinct non-null values with ``levenshtein <= max_dist``.
    ``name_a < name_b`` in byte order. ASCII inputs assumed (byte grams ==
    character grams).

    Completeness: the gram prefix filter alone is complete only when a
    string has at least ``q*max_dist + 1`` distinct q-grams (the Ed-Join
    pigeonhole needs that many). SHORT values (byte length <
    ``q*(max_dist+1)``) can rewrite entirely within the distance budget
    and share no gram ('cog' ↔ 'hot' at d=2), so they additionally emit
    LENGTH-BAND keys ``band(len)`` and ``band(len)+1`` with ``band = len
    // (max_dist+1)``: any two lengths within ``max_dist`` of each other
    land in adjacent bands and therefore share a key. Short×long pairs
    need no band (the long side's prefix pigeonhole works one-sided
    against the short side's full gram set). The short-value universe is
    domain-bounded, so band buckets stay small at scale.
    """
    d, qq = int(max_dist), int(q)
    prefix_len = qq * d + 1
    short_len = qq * (d + 1)

    # ---- stage 1: distinct values (partial unique → one value exchange)
    def _uniq_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(t[text_col]).drop_null()
        return pa.table({text_col: u.cast(pa.string())})

    part = ds.select_columns([text_col]).map_batches(
        _uniq_partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _uniq_bucket(t: pa.Table) -> pa.Table:
        return pa.table({text_col: pc.unique(t[text_col])})

    names = bucketed_map_groups(
        add_bucket_column(part, text_col, num_buckets),
        _uniq_bucket, num_buckets=num_buckets, batch_format="pyarrow",
    ).materialize()  # reused by the df pass and the postings pass

    # ---- stage 2: gram document frequencies (bounded vocab; no shuffle)
    def _df_partial(t: pa.Table) -> pa.Table:
        _, code = _distinct_grams(t, text_col, qq)
        g, cnt = np.unique(code, return_counts=True)
        return pa.table({"g": pa.array(g, pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())})

    parts = names.map_batches(
        _df_partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    merged = parts.groupby("g", sort=True)["cnt"].sum()
    vocab = merged.index.to_numpy(dtype=np.int64)
    dfc = merged.to_numpy(dtype=np.int64)
    df_ref = ray.put((vocab, dfc))

    # ---- stage 3: prefix postings → gram exchange → candidate pairs
    def _postings(t: pa.Table) -> pa.Table:
        names_arr = t[text_col].combine_chunks()
        docs, code = _distinct_grams(t, text_col, qq)
        if len(docs):
            voc, dcnt = ray.get(df_ref)
            dfv = dcnt[np.searchsorted(voc, code)]
            order = np.lexsort((code, dfv, docs))
            docs, code = docs[order], code[order]
            seg = np.ones(len(docs), dtype=bool)
            seg[1:] = docs[1:] != docs[:-1]
            starts = np.nonzero(seg)[0]
            glens = np.diff(np.append(starts, len(docs)))
            pos = np.arange(len(docs)) - np.repeat(starts, glens)
            keep = pos < prefix_len
            docs, code = docs[keep], code[keep]
        # length-band keys for short values (negative codes — disjoint
        # from the >= 0 gram codes)
        _, off = _byte_view(t[text_col])
        lens = off[1:] - off[:-1]
        sdocs = np.nonzero(lens < short_len)[0].astype(np.int64)
        band = lens[sdocs] // (d + 1)
        bdocs = np.repeat(sdocs, 2)
        bcode = -(np.stack([band + 1, band + 2], axis=1).ravel())
        all_docs = np.concatenate([docs, bdocs])
        all_code = np.concatenate([code, bcode])
        return pa.table({
            "g": pa.array(all_code, pa.int64()),
            "name": names_arr.take(pa.array(all_docs, pa.int64())),
        })

    posting = names.map_batches(
        _postings, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )

    from .dedup import pair_indices

    def _pairs(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return pa.table({"name_a": pa.array([], pa.string()),
                             "name_b": pa.array([], pa.string())})
        g = t["g"].to_numpy(zero_copy_only=False)
        nm = t["name"].to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        ai, bi = pair_indices(g[order])
        na, nb = nm[order][ai], nm[order][bi]
        swap = na > nb
        na[swap], nb[swap] = nb[swap], na[swap]
        dd = pd.DataFrame({"name_a": na, "name_b": nb}).drop_duplicates()
        return pa.table({"name_a": pa.array(dd["name_a"], pa.string()),
                         "name_b": pa.array(dd["name_b"], pa.string())})

    cand = bucketed_map_groups(
        add_bucket_column(posting, "g", num_buckets),
        _pairs, num_buckets=num_buckets, batch_format="pyarrow",
    )

    # ---- stage 4: global pair dedup + vectorized Levenshtein verify
    def _verify(t: pa.Table) -> pa.Table:
        empty = _empty_pairs()
        if t.num_rows == 0:
            return empty
        dd = pa.Table.from_pandas(
            t.select(["name_a", "name_b"]).to_pandas().drop_duplicates(),
            preserve_index=False,
        )
        dist = levenshtein_batch(dd["name_a"], dd["name_b"])
        keep = dist <= d
        if not keep.any():
            return empty
        idx = pa.array(np.nonzero(keep)[0], pa.int64())
        return pa.table({
            "name_a": dd["name_a"].combine_chunks().take(idx),
            "name_b": dd["name_b"].combine_chunks().take(idx),
            "dist": pa.array(dist[keep], pa.int64()),
        })

    out = bucketed_map_groups(
        add_bucket_column(cand, "name_a", num_buckets),
        _verify, num_buckets=num_buckets, batch_format="pyarrow",
    )
    # the pair set is small by construction (a verified similarity-join
    # result); materializing pins the schema even when it is EMPTY (the
    # sort-path groupby of an all-empty exchange loses it otherwise)
    mat = out.materialize()
    if mat.count() == 0:
        return ray.data.from_arrow(_empty_pairs())
    return mat


def _empty_pairs() -> pa.Table:
    return pa.table({"name_a": pa.array([], pa.string()),
                     "name_b": pa.array([], pa.string()),
                     "dist": pa.array([], pa.int64())})


def fellegi_sunter(
    ds: "ray.data.Dataset",
    entity_col: str,
    field_cols: "Sequence[str]",
    *,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Fellegi-Sunter probabilistic-linkage weight estimation — the
    SCORING layer of record linkage (``fuzzy_join`` finds candidate
    pairs; this learns how much each field's agreement is WORTH): for
    every comparison field k it estimates ``m_k = P(agree | match)``
    and ``u_k = P(agree | non-match)`` and emits the log2 match weights
    ``w_agree = log2(m/u)`` / ``w_disagree = log2((1-m)/(1-u))`` that a
    downstream scorer sums per candidate pair.

    Estimation is deliberately sampling-free so both engines agree
    exactly: ``m_k`` counts agreements over ALL within-entity record
    pairs (the entity key is the ground-truth match label — duplicate
    records of one entity), and ``u_k`` uses the exact random-pair
    identity ``P(two independent draws agree) = Σ_v (n_v/N)²`` over the
    field's value frequencies — an integer-moment computation, no pair
    enumeration. Weights are null when a ratio degenerates (m or u at
    0/1 — oracle CASE mirror). Output per field: (field, n_pairs, m, u,
    w_agree, w_disagree).

    Scale shape: ``m`` = ONE hash(entity) exchange + the shared
    triangular ``pair_indices`` expansion per bucket (within-entity
    pairs only — bounded-size entities by contract, the kendall_tau
    convention); ``u`` = per-batch value-count partials per field
    merged driver-side (vocabulary-bounded, never rows). Exact int64
    counts end-to-end; log2 is libm-identical cross-engine (the benford
    / hurst precedent).
    """
    import pyarrow as pa

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column
    from featherstore_ray.stages.dedup import pair_indices

    fields = list(field_cols)
    cols = [entity_col] + fields

    # ---- m: agreement counts over within-entity pairs ----------------
    def pair_kernel(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=[BUCKET_COL]).dropna(subset=cols)
        d = d.sort_values(entity_col, kind="stable")
        ent = d[entity_col].to_numpy()
        ai, bi = pair_indices(ent)
        out = {"_np": np.array([len(ai)], np.int64)}
        for f in fields:
            v = d[f].to_numpy()
            out["_a_" + f] = np.array(
                [np.int64((v[ai] == v[bi]).sum())], np.int64)
        return pd.DataFrame(out)

    proj = ds.select_columns(cols)
    mparts = bucketed_map_groups(
        add_bucket_column(proj, entity_col, num_buckets),
        pair_kernel, num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()
    n_pairs = np.int64(mparts["_np"].sum()) if len(mparts) else np.int64(0)
    agree = {f: (np.int64(mparts["_a_" + f].sum()) if len(mparts)
                 else np.int64(0)) for f in fields}

    # ---- u: exact frequency-moment identity per field ----------------
    def freq_partial(field: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            d = df.dropna(subset=cols)
            g = d.groupby(field, sort=False, observed=True).size()
            return g.rename("_c").reset_index()
        return f

    u_val = {}
    n_total = None
    for f in fields:
        fc = (proj.map_batches(freq_partial(f), batch_size=None,
                               batch_format="pandas")
              .to_pandas().groupby(f, sort=True)["_c"].sum())
        nv = fc.to_numpy(np.int64)
        nn = np.int64(nv.sum())
        n_total = nn
        u_val[f] = np.int64((nv * nv).sum()) / (nn * nn) if nn else np.nan

    rows = []
    for f in fields:
        m_k = agree[f] / n_pairs if n_pairs else np.nan
        u_k = u_val[f]
        w_a = (np.log2(m_k / u_k)
               if n_pairs and 0.0 < m_k and 0.0 < u_k else np.nan)
        w_d = (np.log2((1.0 - m_k) / (1.0 - u_k))
               if n_pairs and m_k < 1.0 and u_k < 1.0 else np.nan)
        rows.append((f, n_pairs, m_k, u_k, w_a, w_d))
    return ray.data.from_arrow(pa.table({
        "field": pa.array([r[0] for r in rows]),
        "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
        "m": pa.array(np.round([r[2] for r in rows], round_digits),
                      pa.float64()),
        "u": pa.array(np.round([r[3] for r in rows], round_digits),
                      pa.float64()),
        "w_agree": pa.array(np.round([r[4] for r in rows], round_digits),
                            pa.float64()),
        "w_disagree": pa.array(
            np.round([r[5] for r in rows], round_digits), pa.float64()),
    }))
