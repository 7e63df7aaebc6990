"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's only dedup is latest-per-entity (SURVEY.md §2.7); these are
the training-data-pipeline extensions the engine adds as first-class ops.

Scale shapes:
- exact: two-stage reduce on a content key — per-batch winner, then ONE
  shuffle on ``hash(key) % B`` and a per-bucket winner. Collisions are
  resolved by grouping on the real key inside the bucket, not the hash.
- MinHash-LSH: per-batch vectorized signatures → explode to
  ``(band, band_hash, doc)`` rows → ONE groupby shuffle on the band key →
  candidate pairs → signature-similarity verify → connected components.
  Component linking runs on the driver over candidate PAIRS only (bounded:
  pairs, not documents; a pre-filter keeps only bands with >1 distinct doc).
- SimHash: per-batch vectorized 64-bit signatures; near-dup = Hamming
  distance <= radius within band buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.partition import BUCKET_COL, add_bucket_column, stable_hash
from featherstore_ray.stages.text import shingle_hashes, word_hashes

_MERSENNE = np.uint64((1 << 61) - 1)


# -- exact dedup -----------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset,
    key_cols: Sequence[str],
    *,
    keep_col: str,
    keep: str = "min",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Keep one row per distinct ``key_cols`` value — the min/max ``keep_col``.

    Deterministic tie-break via ``keep_col`` (reference J1's latest-wins is
    the ``keep="max", keep_col=timestamp`` special case of this).
    """
    key_cols = list(key_cols)
    ascending = keep == "min"

    def winner(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return (
            df.sort_values(key_cols + [keep_col], ascending=ascending, kind="stable")
            .drop_duplicates(subset=key_cols, keep="first")
            .reset_index(drop=True)
        )

    ds = ds.map_batches(winner, batch_size=None, batch_format="pandas")

    def add_key_hash(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for i, c in enumerate(key_cols):
            h ^= stable_hash(t[c]) * np.uint64(2 * i + 1)
        return t.append_column(
            BUCKET_COL, pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    ds = ds.map_batches(add_key_hash, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return winner(df.drop(columns=[BUCKET_COL]))

    return ds.groupby(BUCKET_COL).map_groups(final, batch_format="pandas")


# -- MinHash + LSH ---------------------------------------------------------


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures_from_hashes(
    sh: np.ndarray, soff: np.ndarray, *, num_perm: int = 128
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures over pre-computed
    shingle/element hashes (``sh`` flat, ``soff`` per-doc offsets).

    Permutation j = multiply-xorshift universal hash ``mix((x ^ b_j) * a_j)``
    — no modulo (integer division is the slow op); all ufuncs run in-place
    into two reused buffers (fresh allocations are page-fault-bound on some
    hosts). Per-doc minima via one ``reduceat`` per permutation. Empty docs
    sign as all-max (never near anything).
    """
    n_docs = len(soff) - 1
    a, b = _perm_params(num_perm)
    sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if sh.size == 0:
        return sig
    nonempty = soff[1:] > soff[:-1]
    starts = np.minimum(soff[:-1], len(sh) - 1)
    hv = np.empty_like(sh)
    tmp = np.empty_like(sh)
    shift = np.uint64(29)
    for j in range(num_perm):
        np.bitwise_xor(sh, b[j], out=hv)
        np.multiply(hv, a[j], out=hv)
        np.right_shift(hv, shift, out=tmp)
        np.bitwise_xor(hv, tmp, out=hv)
        mins = np.minimum.reduceat(hv, starts)
        sig[nonempty, j] = mins[nonempty]
    return sig


def minhash_signatures(
    texts, *, num_perm: int = 128, shingle_k: int = 3
) -> np.ndarray:
    """MinHash signatures of text documents via k-word shingles."""
    h, offsets = word_hashes(texts)
    sh, soff = shingle_hashes(h, offsets, shingle_k)
    return minhash_signatures_from_hashes(sh, soff, num_perm=num_perm)


def _band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 — fold each band's rows with odd multipliers."""
    n, num_perm = sig.shape
    r = num_perm // bands
    out = np.zeros((n, bands), dtype=np.uint64)
    prime = np.uint64(1099511628211)
    acc = np.empty(n, dtype=np.uint64)
    for b in range(bands):
        acc[:] = 0
        for j in range(r):
            np.multiply(acc, prime, out=acc)
            np.add(acc, sig[:, b * r + j], out=acc)
        out[:, b] = acc
    return out


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> pd.DataFrame:
    """Near-duplicate grouping via MinHash-LSH.

    Returns a small driver-side DataFrame ``(id_col, dup_group)`` for docs in
    a near-dup component; ``dup_group`` = min id in the component. Candidate
    verification = signature agreement >= threshold (an unbiased Jaccard
    estimator). Distributed stages: signature + band explode (map_batches),
    band-bucket groupby; only candidate PAIRS reach the driver.
    """

    def explode(t: pa.Table) -> pa.Table:
        sig = minhash_signatures(
            t[text_col], num_perm=num_perm, shingle_k=shingle_k
        )
        bh = _band_hashes(sig, bands)
        n = t.num_rows
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(bh.T.reshape(-1).view(np.int64)),
                id_col: pa.array(np.tile(ids, bands)),
                "sig": pa.array(
                    list(np.tile(sig.view(np.int64), (bands, 1))),
                    pa.list_(pa.int64()),
                ),
            }
        )

    exploded = ds.map_batches(explode, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        """Star-shaped candidates per (band, band_hash) group, vectorized:
        each row's signature is compared against its group's first row in one
        matrix equality; ``sim`` = fraction of agreeing minhashes (an
        unbiased Jaccard estimator)."""
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "sim": pd.Series(dtype="float64")})
        n = len(df)
        if n == 0:
            return empty
        df = df.sort_values(["band", "band_hash", id_col], kind="stable")
        band = df["band"].to_numpy()
        bh = df["band_hash"].to_numpy()
        ids = df[id_col].to_numpy()
        sigs = np.stack(df["sig"].to_numpy())
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new_grp)
        sizes = np.diff(np.append(starts, n))
        first_row = np.repeat(starts, sizes)
        mask = ~new_grp
        if not mask.any():
            return empty
        agree = (sigs[mask] == sigs[first_row[mask]]).mean(axis=1)
        ok = agree >= threshold
        return pd.DataFrame(
            {"a": ids[first_row[mask]][ok], "b": ids[mask][ok], "sim": agree[ok]}
        )

    pairs = (
        exploded.groupby(["band", "band_hash"])
        .map_groups(candidates, batch_format="pandas")
        .to_pandas()
    )
    # driver-side union-find over candidate pairs only (bounded; see module doc)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a_, b_ in zip(pairs["a"], pairs["b"]):
        ra, rb = find(a_), find(b_)
        if ra != rb:
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            parent[hi] = lo
    members = sorted(set(pairs["a"]) | set(pairs["b"]))
    return pd.DataFrame(
        {id_col: members, "dup_group": [find(m) for m in members]}
    )


# -- SimHash ---------------------------------------------------------------


def simhash(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str = "text",
    out_col: str = "simhash",
) -> ray.data.Dataset:
    """64-bit SimHash per document (vectorized bit-count accumulation)."""

    def _sim(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        h, offsets = word_hashes(t[text_col])
        if h.size == 0:
            return t.append_column(out_col, pa.array(np.zeros(n, np.int64)))
        bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        bits = bits.astype(np.int32)  # (n_words, 64)
        starts = np.minimum(offsets[:-1], len(h) - 1)
        sums = np.add.reduceat(bits, starts, axis=0)
        lengths = (offsets[1:] - offsets[:-1]).reshape(-1, 1)
        maj = (2 * sums > lengths) & (lengths > 0)
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        sh = (maj.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        return t.append_column(out_col, pa.array(sh.view(np.int64)))

    return ds.map_batches(_sim, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard(
    texts_a: Sequence[str], texts_b: Sequence[str], *, k: int = 3
) -> np.ndarray:
    """Exact k-word-shingle Jaccard for candidate verification (paired)."""
    out = np.zeros(len(texts_a))
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        wa, wb = ta.split(" "), tb.split(" ")
        sa = {tuple(wa[j : j + k]) for j in range(max(1, len(wa) - k + 1))}
        sb = {tuple(wb[j : j + k]) for j in range(max(1, len(wb) - k + 1))}
        u = len(sa | sb)
        out[i] = len(sa & sb) / u if u else 0.0
    return out
