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
import pyarrow.compute as pc

import ray.data

from featherstore_ray.partition import BUCKET_COL, add_bucket_column, stable_hash
from featherstore_ray.exchange import bucketed_map_groups
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

    def _sort_view(col):
        """Zero-copy numeric view for the lexsort fast path, or None."""
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if arr.null_count:
            return None
        t_ = arr.type
        if pa.types.is_timestamp(t_) or pa.types.is_date(t_):
            return arr.cast(pa.int64()).to_numpy()
        if pa.types.is_integer(t_) or pa.types.is_floating(t_):
            return arr.to_numpy()
        return None

    def winner_table(t: pa.Table) -> pa.Table:
        """Arrow-in/Arrow-out winner: null-free numeric/temporal keys take
        a numpy lexsort + run-boundary take (no Table<->DataFrame copies —
        this is the per-batch HOT path); anything else falls back to the
        pandas kernel with identical semantics (np.lexsort is stable, and
        descending keep is realized via bitwise NOT — an overflow-free
        order inversion — so equal-keep ties resolve to the same row)."""
        if t.num_rows == 0:
            return t
        views = [_sort_view(t[c]) for c in key_cols + [keep_col]]
        if any(v is None or v.dtype.kind not in "iufM" for v in views):
            return pa.Table.from_pandas(
                winner(t.to_pandas()), preserve_index=False,
            ).cast(t.schema)
        keys = [v.view(np.int64) if v.dtype.kind == "M" else v
                for v in views]
        keep_v = keys[-1]
        if not ascending:
            keep_v = ~keep_v if keep_v.dtype.kind in "iu" else -keep_v
            keys = [~k if k.dtype.kind in "iu" else -k for k in keys[:-1]] \
                + [keep_v]
        order = np.lexsort(keys[::-1])  # primary = key_cols[0], last = keep
        # run boundaries: a row starts a new key group iff ANY key changes
        first = np.empty(len(order), bool)
        first[0] = True
        change = np.zeros(len(order) - 1, bool)
        for v in keys[:-1]:
            s = v[order]
            change |= s[1:] != s[:-1]
        first[1:] = change
        return t.take(pa.array(order[first]))

    ds = ds.map_batches(winner_table, batch_size=None,
                        batch_format="pyarrow", zero_copy_batch=True)

    def add_key_hash(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for i, c in enumerate(key_cols):
            h ^= stable_hash(t[c]) * np.uint64(2 * i + 1)
        return t.append_column(
            BUCKET_COL, pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    ds = ds.map_batches(add_key_hash, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)

    def final(t: pa.Table) -> pa.Table:
        return winner_table(t.drop_columns([BUCKET_COL]))

    return bucketed_map_groups(ds, final, num_buckets=num_buckets,
                               batch_format="pyarrow")


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

    One-permutation hashing (Li/Owen/Zhang 2012) with rotation densification
    (Shrivastava/Li 2014): ONE multiply-xorshift pass over the shingle
    stream, bin by the hash's top ``log2(num_perm)`` bits, scatter-min into
    the (doc, bin) grid (``np.minimum.at``), then fill each empty bin from
    the nearest non-empty bin to its right (circular, log-doubling passes)
    and finalize every bin with its own fixed odd-multiplier mix so copied
    bins don't collide across band boundaries. O(S + n·num_perm) vs the
    classic O(S·num_perm) loop — measured 15-30x on this host. Empty docs
    sign as all-max (they only ever match other empty docs, same as the
    k-permutation kernel). ``num_perm`` must be a power of two.
    """
    n_docs = len(soff) - 1
    k = int(num_perm).bit_length() - 1
    if (1 << k) != num_perm:
        raise ValueError(f"num_perm must be a power of two, got {num_perm}")
    MAX = np.iinfo(np.uint64).max
    sig = np.full((n_docs, num_perm), MAX, dtype=np.uint64)
    if sh.size == 0 or n_docs == 0:
        return sig
    # single universal-hash pass, in-place (fresh allocations are
    # page-fault-bound on this host — reuse buffers)
    hv = np.bitwise_xor(sh, np.uint64(0x94D049BB133111EB))
    np.multiply(hv, np.uint64(0x9E3779B97F4A7C17), out=hv)
    tmp = np.right_shift(hv, np.uint64(29))
    np.bitwise_xor(hv, tmp, out=hv)
    bins = np.right_shift(hv, np.uint64(64 - k)).astype(np.int64)
    doc = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(soff))
    flat = sig.reshape(-1)
    np.minimum.at(flat, doc * num_perm + bins, hv)
    # rotation densification: after pass p every bin holds the value of the
    # nearest non-empty bin within 2^(p+1)-1 to its right (circular)
    rolled = np.empty_like(sig)
    need = np.empty(sig.shape, dtype=bool)
    step = 1
    while step < num_perm:
        idx = (np.arange(num_perm) + step) % num_perm
        np.take(sig, idx, axis=1, out=rolled)
        np.equal(sig, MAX, out=need)
        np.copyto(sig, rolled, where=need)
        step <<= 1
    # per-bin finalizer: decorrelates bins that copied the same source value
    # (two docs still agree on bin j iff their pre-mix values agree)
    fin_a, fin_b = _perm_params(num_perm, seed=7)
    empty_doc = soff[1:] == soff[:-1]
    np.bitwise_xor(sig, fin_b[None, :], out=sig)
    np.multiply(sig, fin_a[None, :], out=sig)
    sig[empty_doc] = MAX
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


def minhash_band_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
    num_buckets: int = 64,
    max_allpairs_group: int = 8,
) -> ray.data.Dataset:
    """LSH candidate pairs: Dataset of distinct (a, b) with a < b.

    Scale contract (same exchange as pipelines/tokens_features.py:148-168):
    only ``(band, band_hash, id)`` triples are shuffled — the signature
    matrix NEVER leaves its batch. Per (band, band_hash) group: all pairs
    for groups up to ``max_allpairs_group`` members (so two docs similar to
    each other but not to the group's first row still pair up), star-shaped
    beyond that (output stays linear in group size; transitive linking
    happens in connected components downstream).
    """

    def explode(t: pa.Table) -> pa.Table:
        sig = minhash_signatures(
            t[text_col], num_perm=num_perm, shingle_k=shingle_k
        )
        bh = _band_hashes(sig, bands)
        n = t.num_rows
        ids = t[id_col].to_numpy(zero_copy_only=False)
        # one mixed 64-bit group key instead of (band, band_hash): narrower
        # exchange rows; cross-band key collisions are ~2^-64 and candidates
        # are signature-verified downstream anyway
        band_col = np.repeat(np.arange(1, bands + 1, dtype=np.uint64), n)
        gk = bh.T.reshape(-1) * np.uint64(0xBF58476D1CE4E5B9) + band_col
        return pa.table(
            {
                "gk": pa.array(gk.view(np.int64)),
                id_col: pa.array(np.tile(ids, bands)),
                BUCKET_COL: pa.array(
                    (gk % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    exploded = ds.map_batches(
        explode, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def pairs_kernel(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        id_dtype = df[id_col].dtype
        empty = pd.DataFrame(
            {"a": pd.Series(dtype=id_dtype), "b": pd.Series(dtype=id_dtype)}
        )
        if n == 0:
            return empty
        df = df.sort_values(["gk", id_col], kind="stable")
        gk = df["gk"].to_numpy()
        ids = df[id_col].to_numpy()
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = gk[1:] != gk[:-1]
        # drop repeated ids within a group (same doc exploded twice)
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (~new_grp[1:]) & (ids[1:] == ids[:-1])
        keep = ~dup
        ids, new_grp = ids[keep], new_grp[keep]
        n = len(ids)
        starts = np.flatnonzero(new_grp)
        sizes = np.diff(np.append(starts, n))
        out_a, out_b = [], []
        # all-pairs for small groups (vectorized per size class)
        small = sizes <= max_allpairs_group
        for sz in np.unique(sizes[small]):
            if sz < 2:
                continue
            st = starts[small & (sizes == sz)]
            iu, ju = np.triu_indices(sz, k=1)
            out_a.append(ids[(st[:, None] + iu[None, :]).reshape(-1)])
            out_b.append(ids[(st[:, None] + ju[None, :]).reshape(-1)])
        # star for big groups: first member (= min id, sorted) vs the rest
        big_starts = starts[~small]
        big_sizes = sizes[~small]
        if len(big_starts):
            first = np.repeat(ids[big_starts], big_sizes - 1)
            member_idx = np.concatenate(
                [np.arange(s + 1, s + sz) for s, sz in zip(big_starts, big_sizes)]
            )
            out_a.append(first)
            out_b.append(ids[member_idx])
        if not out_a:
            return empty
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    cand = bucketed_map_groups(
        exploded, pairs_kernel, num_buckets=num_buckets, batch_format="pandas"
    )

    # distinct pairs: tiny second shuffle over candidate pairs only
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        h = stable_hash(t["a"]) * np.uint64(3) ^ stable_hash(t["b"])
        return t.append_column(
            BUCKET_COL, pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    cand = cand.map_batches(
        add_pair_bucket, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=[BUCKET_COL]).drop_duplicates(["a", "b"])

    return bucketed_map_groups(cand, distinct, num_buckets=num_buckets, batch_format="pandas")


def exact_dup_groups(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str = "text",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Exact-duplicate membership map: ``(id_col, dup_group)`` for every
    row whose ``text_col`` value occurs more than once; ``dup_group`` =
    the min id sharing that value. The SQL-mirrorable grouping companion
    to :func:`minhash_lsh_dedup` — plug into
    :func:`dedup_keep_best(groups=...)`.

    Shape: per-batch projection to ``(id, text-hash-bucket, text)`` pairs
    would ship full texts; instead only ``(id, content hash)`` crosses the
    ONE exchange and the per-bucket kernel groups on the 64-bit content
    hash — collision risk 2^-64 per pair, the same contract every hash
    exchange in this module carries. Output is dup membership only
    (small by construction).
    """

    def project(t: pa.Table) -> pa.Table:
        h = stable_hash(t[text_col])
        return pa.table({
            id_col: t[id_col],
            "_fsr_h": pa.array(h.view(np.int64)),
            BUCKET_COL: pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
        })

    hashed = ds.map_batches(
        project, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        grp = df.groupby("_fsr_h")[id_col]
        mn = grp.transform("min")
        sz = grp.transform("size")
        out = df.loc[sz > 1, [id_col]].copy()
        out["dup_group"] = mn[sz > 1]
        return out

    return (
        bucketed_map_groups(
            hashed, kernel, num_buckets=num_buckets, batch_format="pandas"
        )
        .to_pandas()
    )


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    num_buckets: int = 64,
    driver_pair_cap: int = 5_000_000,
) -> pd.DataFrame:
    """Near-duplicate grouping via MinHash-LSH.

    Returns a small driver-side DataFrame ``(id_col, dup_group)`` for docs in
    a near-dup component; ``dup_group`` = the component's min id (native
    ordering: numeric min for integer ids, lexicographic for strings).

    Pipeline: band-triple exchange (``minhash_band_pairs`` — signatures are
    never shuffled) → candidates-only signature fetch (recompute signatures
    for just the candidate ids, broadcast id set) → verify by signature
    agreement >= threshold (a Jaccard estimator) → vectorized connected
    components. Driver memory is bounded by the candidate-pair count, which
    LSH keeps near-linear in the true dup count; ``driver_pair_cap`` makes
    the bound explicit — above it the op AUTO-ROUTES to the fully
    distributed path (:func:`_lsh_dedup_distributed`: per-bucket signature
    attach + agreement verify, then
    ``stages.components.connected_components``) with identical output, so
    the 100 TB default needs no caller knowledge. ``driver_pair_cap=0``
    forces the distributed route (used by the parity tests).
    """
    from featherstore_ray.stages.components import components_numpy

    cand_ds = minhash_band_pairs(
        ds,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        num_buckets=num_buckets,
    ).materialize()
    if cand_ds.count() > driver_pair_cap:
        return _lsh_dedup_distributed(
            ds,
            cand_ds,
            id_col=id_col,
            text_col=text_col,
            num_perm=num_perm,
            shingle_k=shingle_k,
            threshold=threshold,
            num_buckets=num_buckets,
        )
    pairs = cand_ds.to_pandas()
    if pairs.empty:
        return pd.DataFrame({id_col: pairs["a"], "dup_group": pairs["a"]})

    # candidates-only signature fetch: recompute signatures for candidate
    # rows only (the id set broadcasts once; signatures are deterministic
    # per text so batch membership doesn't matter)
    cand_ids = np.unique(np.concatenate([pairs["a"].to_numpy(), pairs["b"].to_numpy()]))
    ids_ref = ray.put(cand_ids)

    def fetch_sigs(t: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, wanted)
        sub = t.filter(pa.array(mask))
        sig = minhash_signatures(
            sub[text_col], num_perm=num_perm, shingle_k=shingle_k
        )
        return pa.table(
            {
                id_col: sub[id_col],
                "sig": pa.array(list(sig.view(np.int64)), pa.list_(pa.int64())),
            }
        )

    sigs = ds.map_batches(
        fetch_sigs, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    sigs = sigs.drop_duplicates(id_col)
    sig_mat = np.stack(sigs["sig"].to_numpy()).astype(np.uint64)
    row_of = pd.Series(np.arange(len(sigs)), index=sigs[id_col])
    ia = row_of.reindex(pairs["a"]).to_numpy()
    ib = row_of.reindex(pairs["b"]).to_numpy()
    ok = ~(np.isnan(ia.astype(np.float64)) | np.isnan(ib.astype(np.float64)))
    ia, ib = ia[ok].astype(np.int64), ib[ok].astype(np.int64)
    agree = (sig_mat[ia] == sig_mat[ib]).mean(axis=1)
    verified = pairs.loc[ok].iloc[agree >= threshold]

    if verified.empty:
        return pd.DataFrame(
            {id_col: verified["a"], "dup_group": verified["a"]}
        )
    nodes, labels = components_numpy(
        verified["a"].to_numpy(), verified["b"].to_numpy()
    )
    return pd.DataFrame({id_col: nodes, "dup_group": labels})


def _sig_fixed_binary(sig: np.ndarray) -> pa.Array:
    """(n, num_perm) uint64 signature matrix → fixed_size_binary column."""
    n, num_perm = sig.shape
    data = np.ascontiguousarray(sig)
    return pa.Array.from_buffers(
        pa.binary(num_perm * 8), n, [None, pa.py_buffer(data)]
    )


def _sig_matrix(col, num_perm: int) -> np.ndarray:
    """fixed_size_binary column → (n, num_perm) uint64 view (zero-copy)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    data = np.frombuffer(arr.buffers()[1], dtype=np.uint64)
    return data[arr.offset * num_perm : (arr.offset + len(arr)) * num_perm
                ].reshape(-1, num_perm)


def _pairs_attach(
    cand_ds: ray.data.Dataset,
    payload_ds: ray.data.Dataset,
    *,
    id_col: str,
    payload_col: str,
    payload_type: pa.DataType,
    id_type: pa.DataType,
    num_buckets: int,
    finish,
) -> ray.data.Dataset:
    """Distributed pair-payload attach — the verify backbone shared by
    :func:`_lsh_dedup_distributed` (signatures) and
    :func:`jaccard_verify_pairs` (shingle sets).

    ``cand_ds`` is (a, b) candidate pairs; ``payload_ds`` is the
    corpus-linear (id, payload) table. Two bucket exchanges, both keyed by
    ``hash(doc id)``: exchange 1 co-locates pairs (by ``a``) with payloads
    (by id), gathers the ``a``-side payload via sorted-id searchsorted +
    one Arrow ``take``; exchange 2 re-buckets by ``b``, gathers the
    ``b``-side payload, and calls ``finish(table)`` in the same kernel on
    (a, b, _pay_a, _pay_b) — emit verified pairs there so only survivors
    leave the bucket. Nothing corpus-sized ever reaches the driver.
    """
    from featherstore_ray.partition import bucket_of

    side_col = "_fsr_side"

    def tag(key_col: str, is_payload: bool, carry: list[str],
            with_pa: bool = False):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols: dict = {}
            cols["_fsr_key"] = t[id_col] if is_payload else t[key_col]
            for c in carry:
                cols[c] = pa.nulls(n, id_type) if is_payload else t[c]
            cols[payload_col] = (
                t[payload_col] if is_payload else pa.nulls(n, payload_type))
            if with_pa:
                cols["_pay_a"] = (
                    pa.nulls(n, payload_type) if is_payload else t["_pay_a"])
            cols[side_col] = pa.array(np.full(n, int(is_payload), np.int8))
            out = pa.table(cols)
            return out.append_column(
                BUCKET_COL, pa.array(bucket_of(out["_fsr_key"], num_buckets))
            )

        return f

    def split(t: pa.Table):
        is_p = pc.equal(t[side_col], pa.scalar(1, pa.int8()))
        return t.filter(is_p), t.filter(pc.invert(is_p))

    def gather(st: pa.Table, keys: np.ndarray):
        ids = st["_fsr_key"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        pos = np.searchsorted(ids[order], keys)
        pos = np.minimum(pos, len(order) - 1)
        rows = order[pos]
        ok = ids[rows] == keys  # every pair id came from a doc row
        sel = np.flatnonzero(ok)
        pay = st[payload_col].combine_chunks().take(pa.array(rows[sel]))
        return sel, pay

    def _empty_full() -> pa.Table:
        return pa.table({
            "a": pa.array([], id_type), "b": pa.array([], id_type),
            "_pay_a": pa.array([], payload_type),
            "_pay_b": pa.array([], payload_type),
        })

    def kernel_a(t: pa.Table) -> pa.Table:
        st, pt = split(t)
        if pt.num_rows == 0 or st.num_rows == 0:
            return _empty_full().drop_columns(["_pay_b"])
        keys = pt["_fsr_key"].to_numpy(zero_copy_only=False)
        sel, pay = gather(st, keys)
        pt = pt.take(sel)
        return pa.table({"a": pt["_fsr_key"], "b": pt["b"], "_pay_a": pay})

    def kernel_b(t: pa.Table) -> pa.Table:
        st, pt = split(t)
        if pt.num_rows == 0 or st.num_rows == 0:
            return finish(_empty_full())
        keys = pt["_fsr_key"].to_numpy(zero_copy_only=False)
        sel, pay = gather(st, keys)
        pt = pt.take(sel)
        return finish(pa.table({
            "a": pt["a"], "b": pt["_fsr_key"],
            "_pay_a": pt["_pay_a"], "_pay_b": pay,
        }))

    tagged1 = cand_ds.map_batches(
        tag("a", False, ["b"]), batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).union(payload_ds.map_batches(
        tag("a", True, ["b"]), batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ))
    with_a = bucketed_map_groups(
        tagged1, kernel_a, num_buckets=num_buckets, batch_format="pyarrow"
    )
    tagged2 = with_a.map_batches(
        tag("b", False, ["a"], with_pa=True), batch_size=None,
        batch_format="pyarrow", zero_copy_batch=True,
    ).union(payload_ds.map_batches(
        tag("b", True, ["a"], with_pa=True), batch_size=None,
        batch_format="pyarrow", zero_copy_batch=True,
    ))
    return bucketed_map_groups(
        tagged2, kernel_b, num_buckets=num_buckets, batch_format="pyarrow"
    )


def _lsh_dedup_distributed(
    ds: ray.data.Dataset,
    cand_ds: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str,
    num_perm: int,
    shingle_k: int,
    threshold: float,
    num_buckets: int,
) -> pd.DataFrame:
    """The past-the-driver-cap route of :func:`minhash_lsh_dedup` — same
    output, nothing corpus-sized ever reaches the driver.

    Signatures are recomputed once as a corpus-linear ``(id, sig)`` Dataset
    (``sig`` = fixed_size_binary, the uint64 matrix row — never a Python
    list) and materialized so both attach exchanges read the same blocks;
    the agreement >= threshold filter runs inside the second exchange
    kernel (see :func:`_pairs_attach`). Components then run through
    ``connected_components`` (adaptive driver/distributed crossover). The
    result table is component membership — linear in the dup count, the
    same driver-side bound the candidate path already returns.
    """
    from featherstore_ray.stages.components import connected_components

    sig_type = pa.binary(num_perm * 8)

    def sig_batch(t: pa.Table) -> pa.Table:
        sig = minhash_signatures(
            t[text_col], num_perm=num_perm, shingle_k=shingle_k
        )
        return pa.table({id_col: t[id_col], "sig": _sig_fixed_binary(sig)})

    sigs = ds.map_batches(
        sig_batch, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    id_type = sigs.schema().base_schema.field(id_col).type

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "a": pa.array([], id_type), "b": pa.array([], id_type),
            })
        sig_a = _sig_matrix(t["_pay_a"], num_perm)
        sig_b = _sig_matrix(t["_pay_b"], num_perm)
        agree = (sig_a == sig_b).mean(axis=1)
        keep = np.flatnonzero(agree >= threshold)
        sub = t.take(keep)
        return pa.table({"a": sub["a"], "b": sub["b"]})

    verified = _pairs_attach(
        cand_ds, sigs, id_col=id_col, payload_col="sig",
        payload_type=sig_type, id_type=id_type, num_buckets=num_buckets,
        finish=finish,
    )
    comp = connected_components(
        verified, a_col="a", b_col="b",
        node_col=id_col, label_col="dup_group", num_buckets=num_buckets,
    )
    return comp.to_pandas()



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


def jaccard_verify_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    num_perm: int = 128,
    bands: int = 16,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """LSH candidates verified by EXACT n-gram Jaccard (not the signature
    estimate): (a, b, jaccard) pairs with jaccard >= threshold.

    Fully cluster-side: the candidate set comes from
    ``minhash_band_pairs`` (signatures never shuffled); each doc's UNIQUE
    k-shingle hash SET is emitted once as a corpus-linear
    ``(id, large_list<int64>)`` payload table (vectorized segment dedup —
    no per-row Python, no driver text fetch) and attached to the pairs
    through the shared two-exchange backbone (:func:`_pairs_attach`).
    The per-bucket finish computes exact |A∩B| with one lexsort over
    (pair, hash) — shingles are unique per doc, so a (pair, hash)
    duplicate IS an intersection hit — and only pairs >= threshold leave
    the bucket. Hash-set Jaccard equals tuple-set Jaccard up to 64-bit
    collisions (~2^-64/pair, the module-wide hash-exchange contract);
    the per-pair Python tuple-set reference lives on in
    :func:`ngram_jaccard` for tests.
    """
    cand = minhash_band_pairs(
        ds, id_col=id_col, text_col=text_col, num_perm=num_perm,
        bands=bands, shingle_k=shingle_k, num_buckets=num_buckets,
    )
    payload_type = pa.large_list(pa.int64())

    def shingle_sets(t: pa.Table) -> pa.Table:
        h, offsets = word_hashes(t[text_col])
        sh, soff = shingle_hashes(h, offsets, shingle_k)
        # unique-within-doc: lexsort on (doc, value), keep run starts
        n_docs = t.num_rows
        lens = soff[1:] - soff[:-1]
        doc = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        order = np.lexsort((sh, doc))
        d, v = doc[order], sh[order]
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
        uv, ud = v[first], d[first]
        uoff = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(np.bincount(ud, minlength=n_docs), out=uoff[1:])
        arr = pa.LargeListArray.from_arrays(
            pa.array(uoff), pa.array(uv.view(np.int64)))
        return pa.table({id_col: t[id_col], "sh": arr})

    payload = ds.map_batches(
        shingle_sets, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    id_type = payload.schema().base_schema.field(id_col).type

    def _segments(col):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        offs = np.asarray(arr.offsets)
        flat = np.asarray(arr.values).view(np.uint64)
        return offs, flat

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "a": pa.array([], id_type), "b": pa.array([], id_type),
                "jaccard": pa.array([], pa.float64()),
            })
        n = t.num_rows
        oa, fa = _segments(t["_pay_a"])
        ob, fb = _segments(t["_pay_b"])
        la, lb = oa[1:] - oa[:-1], ob[1:] - ob[:-1]

        def seg_gather(offs, lens, flat):
            total = int(lens.sum())
            starts = np.repeat(offs[:-1], lens)
            base = np.repeat(np.cumsum(lens) - lens, lens)
            return flat[starts + (np.arange(total) - base)]

        pid = np.concatenate([
            np.repeat(np.arange(n, dtype=np.int64), la),
            np.repeat(np.arange(n, dtype=np.int64), lb),
        ])
        vals = np.concatenate([
            seg_gather(oa, la, fa), seg_gather(ob, lb, fb)])
        order = np.lexsort((vals, pid))
        p, v = pid[order], vals[order]
        dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
        inter = np.bincount(p[1:][dup], minlength=n)
        union = la + lb - inter
        jac = np.round(
            np.divide(inter, union, out=np.zeros(n), where=union > 0), 6)
        keep = np.flatnonzero(jac >= threshold)
        sub = t.take(keep)
        return pa.table({
            "a": sub["a"], "b": sub["b"], "jaccard": pa.array(jac[keep]),
        })

    out = _pairs_attach(
        cand, payload, id_col=id_col, payload_col="sh",
        payload_type=payload_type, id_type=id_type,
        num_buckets=num_buckets, finish=finish,
    ).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


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


def dedup_keep_best(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str = "text",
    quality_col: str | None = None,
    threshold: float = 0.7,
    num_perm: int = 128,
    bands: int = 16,
    num_buckets: int = 64,
    groups: pd.DataFrame | None = None,
) -> ray.data.Dataset:
    """Canonical-document selection — the standard corpus-dedup END step:
    group near-duplicates (MinHash-LSH, ``minhash_lsh_dedup``), then keep
    exactly ONE document per group: the highest-quality one (max
    ``quality_col``; word count by default), ties to the smallest id.
    Documents in no dup group pass through untouched.

    ``groups``: a precomputed ``(id_col, dup_group)`` membership map — any
    exact or learned grouping (e.g. :func:`exact_dup_groups`,
    ``jaccard_pairs`` + components) plugs into the same winner reduction;
    ``None`` runs the default MinHash-LSH grouping.

    Shape: the (id, dup_group) map is SMALL by construction (only docs in
    a near-dup component), broadcast once; the corpus streams through a
    membership/winner filter — no second shuffle of the corpus. Winner
    selection runs on the (group, id, quality) triples, never full rows.
    """
    import ray

    import pyarrow.compute as pc

    if groups is None:
        groups = minhash_lsh_dedup(
            ds, id_col=id_col, text_col=text_col, num_perm=num_perm,
            bands=bands, threshold=threshold, num_buckets=num_buckets,
        )
    if quality_col is None:
        from featherstore_ray.stages.text import token_count

        quality_col = "n_tok_ws"
        scored = token_count(ds, text_col, quality_col)
    else:
        scored = ds
    if len(groups) == 0:
        return scored

    # quality of the grouped docs only (small, driver-side)
    gid_set = pa.array(sorted(groups[id_col].tolist()))

    def member_quality(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_in(t[id_col], value_set=gid_set))
        return sub.select([id_col, quality_col])

    q = scored.map_batches(
        member_quality, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    merged = groups.merge(q, on=id_col, how="left")
    merged = merged.sort_values(
        [quality_col, id_col], ascending=[False, True], kind="stable"
    )
    winners = merged.groupby("dup_group", sort=False).head(1)[id_col]
    losers = set(merged[id_col]) - set(winners)
    losers_ref = ray.put(pa.array(sorted(losers)))

    def keep(t: pa.Table) -> pa.Table:
        ls = ray.get(losers_ref)
        m = pc.is_in(t[id_col], value_set=ls)
        return t.filter(pc.invert(pc.fill_null(m, False)))

    return scored.map_batches(
        keep, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


# -- line-level dedup (CCNet-style) ----------------------------------------


def line_dedup(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    num_buckets: int = 64,
    out_col: str = "text_dedup",
) -> ray.data.Dataset:
    """Corpus-wide line-level exact dedup (the CCNet / RefinedWeb cleaning
    step): every distinct line survives exactly once — at its first
    occurrence in ``(doc_id, line_no)`` order — and every other occurrence
    (including repeats within the same document) is dropped; documents are
    reassembled from their surviving lines in original order.

    Output: ``(id_col, out_col, n_kept, n_dropped)`` — one row per input
    document, empty string when every line lost.

    Scale shape (100 TB): two narrow exchanges, no broadcast state.
      1. explode docs → ``(doc, line_no, line)`` rows, hash-partition on the
         LINE → per-bucket winner = min (doc, line_no) per distinct line
         (exact string compare inside the bucket, so hash collisions are
         harmless);
      2. union winners with a per-doc spine ``(doc, n_lines)`` and
         hash-partition on the DOC → reassemble. Only surviving lines +
         one spine row per doc cross the second exchange.
    A hash-only variant (shuffle 128-bit line hashes instead of line text)
    would halve exchange bytes at the cost of exactness; not needed while
    the oracle contract requires exact string semantics.
    """
    _TAG_SPINE, _TAG_LINE = 0, 1

    def explode(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(texts, sep)
        flat = lists.flatten()
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        nl = off[1:] - off[:-1]
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: np.repeat(ids, nl),
                "line_no": np.arange(len(flat)) - np.repeat(off[:-1], nl),
                "line": flat,
            }
        )

    def winner_kernel(df: pd.DataFrame) -> pd.DataFrame:
        w = (
            df.sort_values(["line", id_col, "line_no"], kind="stable")
            .drop_duplicates("line")[[id_col, "line_no", "line"]]
        )
        w["tag"] = np.int8(_TAG_LINE)
        return w

    def spine(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_lines = pc.add(pc.count_substring(texts, sep), 1)
        return pa.table(
            {
                id_col: t[id_col],
                "line_no": pc.cast(n_lines, pa.int64()),  # reuse slot
                "line": pa.nulls(t.num_rows, pa.string()),
                "tag": pa.array(
                    np.full(t.num_rows, _TAG_SPINE, np.int8)
                ),
            }
        )

    def assemble_kernel(df: pd.DataFrame) -> pd.DataFrame:
        sp = df[df["tag"] == _TAG_SPINE]
        out = pd.DataFrame(
            {id_col: sp[id_col].to_numpy(), "n_lines": sp["line_no"].to_numpy()}
        )
        keep = df[df["tag"] == _TAG_LINE].sort_values(
            [id_col, "line_no"], kind="stable"
        )
        g = keep.groupby(id_col, sort=False)
        agg = pd.DataFrame(
            {out_col: g["line"].agg(sep.join), "n_kept": g.size()}
        )
        out = out.merge(agg, left_on=id_col, right_index=True, how="left")
        out[out_col] = out[out_col].fillna("")
        out["n_kept"] = out["n_kept"].fillna(0).astype(np.int64)
        out["n_dropped"] = (out["n_lines"] - out["n_kept"]).astype(np.int64)
        return out[[id_col, out_col, "n_kept", "n_dropped"]]

    lines = ds.map_batches(
        explode, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    winners = bucketed_map_groups(
        add_bucket_column(lines, "line", num_buckets),
        winner_kernel,
        num_buckets=num_buckets,
        batch_format="pandas",
    )
    doc_spine = ds.map_batches(
        spine, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    both = add_bucket_column(winners, id_col, num_buckets).union(
        add_bucket_column(doc_spine, id_col, num_buckets)
    )
    return bucketed_map_groups(
        both,
        assemble_kernel,
        num_buckets=num_buckets,
        batch_format="pandas",
    )


_JP_P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for shingle combine


def pair_indices(sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-segment unordered index pairs ``(a_idx, b_idx)`` with
    ``a_idx < b_idx``, for a key array whose equal keys are contiguous
    (pre-sorted). Fully vectorized triangular expansion: the element at
    in-segment position p pairs with the (d - 1 - p) elements after it.
    Shared by the Jaccard similarity join and co-occurrence counting.
    """
    m = len(sorted_keys)
    if m < 2:
        z = np.empty(0, np.int64)
        return z, z
    seg = np.ones(m, dtype=bool)
    seg[1:] = sorted_keys[1:] != sorted_keys[:-1]
    starts = np.nonzero(seg)[0]
    lens = np.diff(np.append(starts, m))
    pos = np.arange(m) - np.repeat(starts, lens)
    reps = np.repeat(lens, lens) - 1 - pos
    T = int(reps.sum())
    if T == 0:
        z = np.empty(0, np.int64)
        return z, z
    a_idx = np.repeat(np.arange(m), reps)
    csum = np.concatenate(([0], np.cumsum(reps)))
    offset = np.arange(T) - csum[a_idx] + 1
    return a_idx, a_idx + offset


def jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    round_digits: int = 6,
    num_buckets: int = 64,
    metric: str = "jaccard",
) -> ray.data.Dataset:
    """EXACT all-pairs word-k-gram Jaccard similarity join (no MinHash,
    no candidates): ``(a, b, jaccard)`` for every unordered doc pair with
    ``round(|A∩B| / |A∪B|, 6) >= threshold``, where A/B are the DISTINCT
    k-gram shingle sets (docs with < k words have no shingles and never
    pair). Matches the SQL self-join on shared shingles bit-for-bit
    (shingles travel as order-sensitive 64-bit polynomial word-hash
    combines; collision probability ~ shingles²/2^64, negligible).

    Scale shape (100 TB): an inverted-index similarity join — exchange 1
    co-locates each shingle's postings (per-doc set sizes ride along, so
    NO driver-side size broadcast); the per-shingle kernel emits
    triangular candidate pairs fully vectorized; exchange 2 co-locates
    each pair's partial counts by hash(a) and finalizes. Cost is
    Σ freq(shingle)² — exact by construction; for corpora with hot
    shingles cap the posting length upstream (stopword-shingle removal)
    or use the MinHash route (``minhash_band_pairs``), which this op
    oracles.

    ``metric="containment"`` switches the score to Broder's MAX
    containment ``|A∩B| / min(|A|, |B|)`` — the asymmetric near-dup
    signal that catches a short document embedded inside a long one
    (quotes, partial copies), which symmetric Jaccard dilutes toward 0.
    Same physical plan; only the finalize denominator changes. The
    output column is named after the metric.
    """
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    kk = int(k)

    def shingles(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id": pa.array([], pa.int64()),
             "sh": pa.array([], pa.int64()),
             "sz": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        h, off = word_hashes(t[text_col])
        total = len(h)
        if total < kk:
            return empty
        n = t.num_rows
        lens = off[1:] - off[:-1]
        doc_of = np.repeat(np.arange(n), lens)
        valid = doc_of[:total - kk + 1] == doc_of[kk - 1:]
        comb = h[:total - kk + 1].copy()
        for j in range(1, kk):
            comb = comb * _JP_P + h[j:total - kk + 1 + j]
        doc_v = doc_of[:total - kk + 1][valid]
        comb_v = comb[valid]
        if len(doc_v) == 0:
            return empty
        order = np.lexsort((comb_v, doc_v))
        doc_s, comb_s = doc_v[order], comb_v[order]
        first = np.ones(len(doc_s), dtype=bool)
        first[1:] = (doc_s[1:] != doc_s[:-1]) | (comb_s[1:] != comb_s[:-1])
        doc_u, comb_u = doc_s[first], comb_s[first]
        sizes = np.bincount(doc_u, minlength=n)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "id": pa.array(ids[doc_u]),
                "sh": pa.array(comb_u.view(np.int64)),
                "sz": pa.array(sizes[doc_u].astype(np.int64)),
            }
        )

    posting = add_bucket_column(
        ds.map_batches(
            shingles, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "sh",
        num_buckets,
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "sa": pa.array([], pa.int64()), "sb": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        sh = t["sh"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        sz = t["sz"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sh))
        sh, ids, sz = sh[order], ids[order], sz[order]
        a_idx, b_idx = pair_indices(sh)
        if len(a_idx) == 0:
            return empty
        # partial-aggregate identical pairs within this shingle bucket
        key = pd.DataFrame(
            {"a": ids[a_idx], "b": ids[b_idx],
             "sa": sz[a_idx], "sb": sz[b_idx]}
        )
        agg = key.groupby(["a", "b"], sort=False).agg(
            sa=("sa", "first"), sb=("sb", "first"), n=("sa", "size")
        ).reset_index()
        res = pa.Table.from_pandas(agg, preserve_index=False)
        return res.replace_schema_metadata(None)

    partials = add_bucket_column(
        bucketed_map_groups(
            posting, pair_partials, num_buckets=num_buckets,
            batch_format="pyarrow",
        ),
        "a",
        num_buckets,
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()),
                 "b": pa.array([], pa.int64()),
                 metric: pa.array([], pa.float64())}
            )
        df = t.select(["a", "b", "sa", "sb", "n"]).to_pandas()
        g = df.groupby(["a", "b"], sort=False).agg(
            sa=("sa", "first"), sb=("sb", "first"), n=("n", "sum")
        ).reset_index()
        inter = g["n"].to_numpy()
        sa, sb = g["sa"].to_numpy(), g["sb"].to_numpy()
        if metric == "jaccard":
            denom = sa + sb - inter
        else:
            denom = np.minimum(sa, sb)
        j = np.round(inter / denom, round_digits)
        keep = j >= threshold
        return pa.table(
            {
                "a": pa.array(g["a"].to_numpy()[keep].astype(np.int64)),
                "b": pa.array(g["b"].to_numpy()[keep].astype(np.int64)),
                metric: pa.array(j[keep]),
            }
        )

    return bucketed_map_groups(
        partials, finalize, num_buckets=num_buckets, batch_format="pyarrow"
    )


# -- cross-document duplicated-span statistics -------------------------------


def dup_spans(
    ds: ray.data.Dataset,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact cross-document duplicated k-gram statistics (the per-document
    signal behind suffix-style exact substring dedup, cf. Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): for every
    document with ≥ k whitespace tokens, the number of k-token window
    positions whose exact k-gram occurs in at least one OTHER document.

    Output: (doc_id, total_ngrams, dup_ngrams, dup_ratio) — rank by
    dup_ratio to find documents dominated by boilerplate shared with the
    rest of the corpus.

    Scale shape: two narrow exchanges, no text shuffle.

    1. per-batch partial: distinct (kgram, doc) with position counts —
       exchange volume is bounded by distinct (kgram, doc) pairs, the same
       bound as :func:`featherstore_ray.stages.text.inverted_index`;
    2. kgram-bucket exchange: each kgram's partials land in one bucket;
       kgrams seen in ≥ 2 distinct docs contribute their per-doc position
       counts to (doc, dup_partial) rows;
    3. doc-bucket exchange: sums dup partials with the per-doc window
       totals (a cheap streaming side pass). Both union sides carry the
       identical int64 schema, so no pandas null-padding coercion.

    Kgrams are the literal joined token strings (exact, oracle-clean); a
    64-bit-hash variant would shrink step-2 traffic at 100 TB at the cost
    of a ~n²/2⁶⁴ false-dup probability.
    """
    K = int(k)
    from featherstore_ray.stages.text import _explode_words

    def _kgram_frame(t: pa.Table) -> tuple[pd.Series, np.ndarray]:
        """Flat kgram strings + owning doc-row index for one batch."""
        flat, offsets = _explode_words(t[text_col])
        lens = np.diff(offsets)
        n = len(flat)
        words = flat.to_numpy(zero_copy_only=False)  # object array
        m = n - K + 1
        if m <= 0:
            return pd.Series([], dtype=object), np.empty(0, np.int64)
        kg = words[:m].copy()
        for j in range(1, K):
            kg = kg + " "
            kg = kg + words[j: j + m]
        # windows crossing a doc boundary are invalid: the last K-1
        # positions of every doc (covers docs shorter than K entirely)
        valid = np.ones(m, dtype=bool)
        ends = offsets[1:]
        for j in range(1, K):
            pos = ends - j
            sel = (lens >= j) & (pos < m)
            valid[pos[sel]] = False
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        return pd.Series(kg[valid], dtype=object), doc_idx[:m][valid]

    def kg_partial(t: pa.Table) -> pa.Table:
        kg, doc_idx = _kgram_frame(t)
        ids = t[doc_id_col].to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"kg": kg, "_doc": ids[doc_idx]})
            .groupby(["kg", "_doc"], sort=False)
            .size()
            .rename("npos")
            .reset_index()
        )
        return pa.table({
            "kg": pa.array(g["kg"], pa.string()),
            "_doc": pa.array(g["_doc"].to_numpy(dtype=np.int64)),
            "npos": pa.array(g["npos"].to_numpy(dtype=np.int64)),
        })

    sel = ds.select_columns([doc_id_col, text_col])
    partials = sel.map_batches(
        kg_partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def per_kgram(t: pa.Table) -> pa.Table:
        df = t.select(["kg", "_doc", "npos"]).to_pandas()
        nd = df.groupby("kg", sort=False)["_doc"].nunique()
        dup_kg = nd.index[nd.to_numpy() >= 2]
        d = df[df["kg"].isin(dup_kg)]
        out = d.groupby("_doc", sort=False)["npos"].sum().reset_index()
        return pa.table({
            "_doc": pa.array(out["_doc"].to_numpy(dtype=np.int64)),
            "dup": pa.array(out["npos"].to_numpy(dtype=np.int64)),
            "total": pa.array(np.zeros(len(out), np.int64)),
        })

    dup_parts = bucketed_map_groups(
        add_bucket_column(partials, "kg", num_buckets),
        per_kgram, num_buckets=num_buckets, batch_format="pyarrow",
    )

    def total_partial(t: pa.Table) -> pa.Table:
        _, offsets = _explode_words(t[text_col])
        lens = np.diff(offsets)
        tot = np.maximum(lens - (K - 1), 0)
        keep = tot > 0
        ids = t[doc_id_col].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "_doc": pa.array(ids.astype(np.int64)),
            "dup": pa.array(np.zeros(int(keep.sum()), np.int64)),
            "total": pa.array(tot[keep].astype(np.int64)),
        })

    total_parts = sel.map_batches(
        total_partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def finalize(t: pa.Table) -> pa.Table:
        df = t.select(["_doc", "dup", "total"]).to_pandas()
        g = df.groupby("_doc", sort=False)[["dup", "total"]].sum()
        g = g[g["total"] > 0].reset_index()
        ratio = np.round(
            g["dup"].to_numpy(dtype=np.float64)
            / g["total"].to_numpy(dtype=np.float64), round_digits)
        return pa.table({
            doc_id_col: pa.array(g["_doc"].to_numpy(dtype=np.int64)),
            "total_ngrams": pa.array(g["total"].to_numpy(dtype=np.int64)),
            "dup_ngrams": pa.array(g["dup"].to_numpy(dtype=np.int64)),
            "dup_ratio": pa.array(ratio, pa.float64()),
        })

    both = dup_parts.union(total_parts)
    return bucketed_map_groups(
        add_bucket_column(both, "_doc", num_buckets),
        finalize, num_buckets=num_buckets, batch_format="pyarrow",
    )


def token_set_dedup(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Vocabulary-fingerprint duplicate groups — the bag-of-words member
    of the dedup family (exact_dedup needs byte equality, MinHash is
    approximate set overlap; this catches shuffled / repetition-edited
    copies EXACTLY when the token SET is unchanged): each document's
    canonical key is its space-joined sorted DISTINCT-token set
    (single-space tokenization; '' kept — it sorts first, mirroring
    ``list_sort(list_distinct(...))``); documents sharing a key form
    one group. Output one row per document in a group of >= 2:
    (doc_id, group_key, group_size, keep) with ``keep = 1`` on the
    smallest doc_id of the group (the deterministic survivor
    convention).

    Scale shape: the canonical key is computed per batch (vectorized
    sort per doc over the batch's flattened token arrays); ONE
    hash(key) exchange co-locates each group; group size and survivor
    fall out per bucket. Keys are corpus-scale strings — for very long
    documents swap the key for its stable 128-bit hash (loses the
    oracle, keeps the semantics).
    """
    proj = ds.select_columns([id_col, text_col])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[id_col, text_col])
        if df.empty:
            return pd.DataFrame({
                "_id": pd.Series(dtype="int64"),
                "_k": pd.Series(dtype="object"),
            })
        toks = df[text_col].str.split(" ")
        key = toks.map(lambda t: " ".join(sorted(set(t))))
        return pd.DataFrame({
            "_id": df[id_col].to_numpy(np.int64),
            "_k": key.to_numpy(dtype=object),
        })

    def groups(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "group_key": pd.Series(dtype="object"),
                "group_size": pd.Series(dtype="int64"),
                "keep": pd.Series(dtype="int64"),
            })
        df = df.sort_values(["_k", "_id"], kind="stable")
        sz = df.groupby("_k", sort=False)["_id"].transform("size")
        mn = df.groupby("_k", sort=False)["_id"].transform("min")
        out = df[sz >= 2]
        return pd.DataFrame({
            "doc_id": out["_id"].to_numpy(np.int64),
            "group_key": out["_k"].to_numpy(dtype=object),
            "group_size": sz[sz >= 2].to_numpy(np.int64),
            "keep": (out["_id"].to_numpy(np.int64)
                     == mn[sz >= 2].to_numpy(np.int64)).astype(np.int64),
        })

    return bucketed_map_groups(
        add_bucket_column(
            proj.map_batches(keyed, batch_size=None,
                             batch_format="pandas"),
            "_k", num_buckets),
        groups, num_buckets=num_buckets, batch_format="pandas",
    )
