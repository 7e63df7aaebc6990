"""Exact substring-level deduplication (suffix-style, Lee et al. 2022).

The reference has no substring dedup (its only dedup is latest-per-entity,
SURVEY.md §2.7; duckdb.go:560-660 is row-level); this is the missing
first-class family a 100 TB text pipeline hits first — train-set
contamination at substring granularity. :func:`~featherstore_ray.stages.
dedup.dup_spans` reports hash-approximate per-doc k-gram statistics; this
module finds the EXACT maximal byte spans covered by a duplicated
substring of length >= L.

The reduction that makes it exact AND bucketable: position p is covered by
a duplicated substring of length >= L  <=>  some length-EXACTLY-L window
containing p occurs >= 2 times in the corpus (a duplicated string of
length >= L always contains a duplicated length-L window over p; the
window itself is the witness in the other direction). So the op is a
dedup over the corpus's length-L windows — equivalently the depth-L
TRUNCATED suffix sort: a suffix has LCP >= L with another suffix iff its
length-L prefix window is duplicated. Truncating at depth L is what lets
suffix neighborhoods bucket by a window hash with exact byte
verification, instead of a multi-round prefix-doubling suffix-array build
(log n all-to-all shuffles at 100 TB).

Scale shape — two corpus-local passes over one shared read, two narrow
exchanges, one anchor exchange:

1. per-batch PARTIAL: content-only 64-bit polynomial rolling hash of
   every length-L window (windows never cross doc boundaries; the byte
   buffer is scanned in bounded chunks so temporaries stay ~40 B/char x
   4 MiB regardless of block size), collapsed to distinct ``(h, n)`` per
   batch — the exchange moves per-batch distinct hashes, never text;
2. ONE bucket exchange on ``h``: exact global counts; hashes with
   ``n >= 2`` form the candidate set, streamed to a single sorted uint64
   array and broadcast ONCE via ``ray.put`` (``candidate_cap`` bounds the
   array; the cap bounds DISTINCT duplicated-window hashes, not corpus
   size — 50M candidates = 400 MB);
3. verify pass (actor pool; the sorted candidate array is fetched
   zero-copy from the object store once per actor in ``__init__``):
   windows whose hash hits the set ship their actual L bytes into ONE
   bucket exchange on ``h``; per bucket, grouping by the raw bytes (the
   truncated suffix sort) keeps only windows whose exact content occurs
   >= 2 times — hash collisions die here, so the result is exact;
4. anchor positions exchange by ``hash(doc_id)``; overlapping or adjacent
   windows merge into maximal ``(doc_id, span_start, span_end)`` islands.

Null ``doc_id`` rows are dropped on both sides per the repo's grouped-
reducing-op contract (oracles carry ``WHERE doc_id IS NOT NULL``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from featherstore_ray.exchange import bucketed_map_groups
from featherstore_ray.partition import BUCKET_COL, add_bucket_column
from featherstore_ray.stages.text import _byte_view

# FNV-1a 64-bit prime: odd, hence invertible mod 2^64 — the rolling hash
# normalizes window sums by B^i via the modular inverse so the hash
# depends on window CONTENT only (batch-/position-invariant by algebra,
# pinned by tests).
_B = 0x100000001B3
_BINV = pow(_B, -1, 1 << 64)
_HASH_CHUNK = 1 << 22  # 4 MiB of text per vectorized hash sweep


def _chunk_hashes(buf: np.ndarray, L: int) -> np.ndarray:
    """Content-only polynomial hashes of every length-L window of ``buf``.

    h(i) = sum_{k<L} buf[i+k] * BINV^k  (mod 2^64), computed as
    B^i * (S[i+L] - S[i]) with S the prefix sum of buf[j] * BINV^j —
    all uint64 wraparound arithmetic, O(n) and fully vectorized."""
    n = len(buf)
    nw = n - L + 1
    if nw <= 0:
        return np.empty(0, np.uint64)
    powi = np.empty(n, np.uint64)
    powi[0] = 1
    np.cumprod(np.full(n - 1, _BINV, np.uint64), out=powi[1:])
    q = buf.astype(np.uint64)
    q *= powi
    s = np.empty(n + 1, np.uint64)
    s[0] = 0
    np.cumsum(q, out=s[1:])
    h = s[L:].copy()
    h -= s[:-L]
    # reuse powi's head as B^i (cumprod of B over the window range)
    powb = np.empty(nw, np.uint64)
    powb[0] = 1
    np.cumprod(np.full(nw - 1, _B, np.uint64), out=powb[1:])
    h *= powb
    return h


def _window_scan(
    t: pa.Table, id_col: str, text_col: str, L: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All valid length-L windows of one batch.

    Returns ``(h, wdoc, pos, buf, starts)``: content hash, owning batch
    row index (int32), 0-indexed position within the doc, the relative
    byte buffer, and each window's start offset in ``buf``. Windows never
    cross doc boundaries; docs shorter than L (incl. null/empty) and
    null-``doc_id`` docs contribute none."""
    empty = (np.empty(0, np.uint64), np.empty(0, np.int32),
             np.empty(0, np.int64), np.empty(0, np.uint8),
             np.empty(0, np.int64))
    if t.num_rows == 0:
        return empty
    data, off = _byte_view(t[text_col])
    base, end = int(off[0]), int(off[-1])
    if end - base < L:
        return empty
    buf = data[base:end]
    offr = off - base
    lengths = np.diff(offr)
    nb = len(buf)
    docpos = np.repeat(np.arange(len(lengths), dtype=np.int32), lengths)
    # chunked hash sweep: window hash is content-only, so per-chunk local
    # positions produce identical values — temporaries stay bounded
    parts = []
    for c0 in range(0, nb - L + 1, _HASH_CHUNK):
        c1 = min(c0 + _HASH_CHUNK + L - 1, nb)
        parts.append(_chunk_hashes(buf[c0:c1], L))
    h = np.concatenate(parts) if parts else np.empty(0, np.uint64)
    nw = nb - L + 1
    valid = docpos[:nw] == docpos[L - 1:]
    idcol = t[id_col]
    idcol = idcol.combine_chunks() if isinstance(idcol, pa.ChunkedArray) else idcol
    if idcol.null_count:
        docok = pc.is_valid(idcol).to_numpy(zero_copy_only=False)
        valid &= docok[docpos[:nw]]
    starts = np.flatnonzero(valid).astype(np.int64)
    wdoc = docpos[starts]
    pos = starts - offr[wdoc]
    return h[valid], wdoc, pos, buf, starts


class _WindowVerify:
    """Verify-pass actor: the sorted candidate hash array is fetched from
    the object store ONCE per actor (zero-copy numpy view of the
    ``ray.put`` block); each batch re-derives its window hashes and ships
    only hits — (window bytes, doc_id, pos) — onward."""

    def __init__(self, cand_ref, id_col: str, text_col: str, L: int,
                 num_buckets: int):
        self.cands = ray.get(cand_ref)
        self.id_col, self.text_col = id_col, text_col
        self.L, self.num_buckets = L, num_buckets

    def __call__(self, t: pa.Table) -> pa.Table:
        L = self.L
        h, wdoc, pos, buf, starts = _window_scan(
            t, self.id_col, self.text_col, L)
        idx = np.searchsorted(self.cands, h)
        np.minimum(idx, max(len(self.cands) - 1, 0), out=idx)
        hit = (np.take(self.cands, idx) == h) if len(self.cands) else \
            np.zeros(len(h), bool)
        starts = starts[hit]
        # chunked gather: dup-heavy corpora can flag nearly every window,
        # and materializing hits x L bytes at once would cost ~L x the
        # block's text size — bound the temp at ~64 MB
        step = max(1, (64 << 20) // max(L, 1))
        arange_l = np.arange(L, dtype=np.int64)
        wb = np.concatenate([
            buf[starts[i:i + step, None] + arange_l].view(f"S{L}").ravel()
            for i in range(0, len(starts), step)
        ]) if len(starts) else np.empty(0, f"S{L}")
        idcol = t[self.id_col]
        ids = pc.take(
            idcol.combine_chunks() if isinstance(idcol, pa.ChunkedArray)
            else idcol,
            pa.array(wdoc[hit].astype(np.int64)))
        return pa.table({
            "w": pa.array(wb),
            "doc_id": ids,
            "pos": pa.array(pos[hit]),
            BUCKET_COL: pa.array(
                (h[hit] % np.uint64(self.num_buckets)).astype(np.int32)),
        })


def substring_dedup(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 25,
    num_buckets: int = 64,
    candidate_cap: int = 50_000_000,
    materialize_input: bool = True,
) -> ray.data.Dataset:
    """Exact duplicated-substring spans: every maximal 0-indexed byte range
    ``[span_start, span_end)`` of each doc covered by a substring of
    length >= ``min_len`` that occurs >= 2 times ANYWHERE in the corpus
    (other docs or elsewhere in the same doc — Lee et al. semantics).

    Output: ``(doc_id, span_start, span_end, n_windows)`` — one row per
    maximal span; ``n_windows`` is the number of duplicated length-L
    anchor windows merged into it. Module docstring has the dataflow.

    ``candidate_cap`` bounds the broadcast candidate array (distinct
    duplicated-window hashes, 8 B each); beyond it, raise — shard the run
    by key range or raise ``min_len`` rather than silently truncating.
    """
    L = int(min_len)
    if L < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    proj = ds.select_columns([id_col, text_col])
    if materialize_input:
        proj = proj.materialize()  # partial + verify passes share one read

    def partial(t: pa.Table) -> pa.Table:
        h, _, _, _, _ = _window_scan(t, id_col, text_col, L)
        uh, n = np.unique(h, return_counts=True)
        return pa.table({
            "h": pa.array(uh),
            "n": pa.array(n.astype(np.int64)),
            BUCKET_COL: pa.array(
                (uh % np.uint64(num_buckets)).astype(np.int32)),
        })

    partials = proj.map_batches(
        partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)

    def dup_hashes(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("h", sort=False)["n"].sum()
        return pd.DataFrame({"h": tot.index[tot.to_numpy() >= 2]})

    cand_ds = bucketed_map_groups(partials, dup_hashes,
                                  num_buckets=num_buckets)
    parts = [b["h"].to_numpy(zero_copy_only=False)
             for b in cand_ds.iter_batches(batch_format="pyarrow")]
    cands = np.sort(np.concatenate(parts)) if parts else \
        np.empty(0, np.uint64)
    if len(cands) > candidate_cap:
        raise ValueError(
            f"{len(cands)} candidate window hashes exceed candidate_cap="
            f"{candidate_cap}; shard by key range or raise min_len")
    if len(cands) == 0:
        # nothing duplicated: emit a TYPED empty result (an all-empty
        # pipeline would lose its schema entirely)
        sch = proj.schema()
        id_type = dict(zip(sch.names, sch.types))[id_col]
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], id_type),
            "span_start": pa.array([], pa.int64()),
            "span_end": pa.array([], pa.int64()),
            "n_windows": pa.array([], pa.int64()),
        }))
    cand_ref = ray.put(cands)

    flagged = proj.map_batches(
        _WindowVerify,
        fn_constructor_kwargs=dict(
            cand_ref=cand_ref, id_col=id_col, text_col=text_col, L=L,
            num_buckets=num_buckets),
        concurrency=(1, 8), batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)

    def dup_anchors(df: pd.DataFrame) -> pd.DataFrame:
        # the truncated suffix sort: group by exact window bytes; only
        # content occurring >= 2 times survives (hash collisions die here)
        sz = df.groupby("w", sort=False)["w"].transform("size")
        return df.loc[sz.to_numpy() >= 2, ["doc_id", "pos"]]

    anchors = bucketed_map_groups(flagged, dup_anchors,
                                  num_buckets=num_buckets)
    anchors = add_bucket_column(anchors, "doc_id", num_buckets)

    def merge_spans(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "doc_id": df["doc_id"],
                "span_start": pd.Series([], dtype="int64"),
                "span_end": pd.Series([], dtype="int64"),
                "n_windows": pd.Series([], dtype="int64"),
            })
        df = df.sort_values(["doc_id", "pos"], kind="stable")
        did = df["doc_id"].to_numpy()
        pos = df["pos"].to_numpy()
        new = np.empty(len(df), bool)
        new[0] = True
        # same doc + gap <= L means overlap or adjacency -> one contiguous
        # covered range; strictly greater gaps start a new maximal span
        new[1:] = (did[1:] != did[:-1]) | (pos[1:] - pos[:-1] > L)
        si = np.flatnonzero(new)
        ei = np.append(si[1:] - 1, len(df) - 1)
        return pd.DataFrame({
            "doc_id": did[si],
            "span_start": pos[si],
            "span_end": pos[ei] + L,
            "n_windows": np.diff(np.append(si, len(df))).astype(np.int64),
        })

    return bucketed_map_groups(anchors, merge_spans,
                               num_buckets=num_buckets)


def substring_clean(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 25,
    num_buckets: int = 64,
    candidate_cap: int = 50_000_000,
    spans: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Lee-et-al substring dedup applied: every doc re-emitted with its
    duplicated spans (:func:`substring_dedup` semantics) CUT OUT.
    Output: ``(doc_id, text_clean, n_removed)`` — one row per doc with a
    non-null id and text; fully-covered docs come back as empty strings.

    Scale shape: the span pipeline's exchanges plus ONE further doc-bucket
    exchange carrying a tagged Arrow union of texts and spans (typed null
    pads on each side — never pandas, so span offsets stay int64). The
    per-bucket splice is byte-level vectorized: span edges scatter into a
    coverage diff array, one cumsum marks covered bytes, one boolean
    compress builds every cleaned doc of the bucket at once, and the
    output StringArray is assembled directly from the kept buffer +
    recomputed offsets (no per-doc Python string surgery).

    ``spans``: precomputed :func:`substring_dedup` output for the SAME
    (corpus, min_len) — callers that already ran the span pipeline pass it
    here to skip recomputing it (the driver contract shares one spans
    table between the ``substring_dedup`` and ``substring_clean`` queries,
    both of which are independently SQL-oracled).
    """

    def drop_nulls(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t[id_col]), pc.is_valid(t[text_col]))
        return t.filter(m)

    docs = ds.select_columns([id_col, text_col]).map_batches(
        drop_nulls, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    if spans is None:
        spans = substring_dedup(
            docs, id_col=id_col, text_col=text_col, min_len=min_len,
            num_buckets=num_buckets, candidate_cap=candidate_cap,
            materialize_input=False)  # docs is already materialized

    id_type = dict(zip(docs.schema().names, docs.schema().types))[id_col]

    def tag_docs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_id": t[id_col].combine_chunks() if isinstance(
                t[id_col], pa.ChunkedArray) else t[id_col],
            "text": t[text_col].combine_chunks() if isinstance(
                t[text_col], pa.ChunkedArray) else t[text_col],
            "span_start": pa.nulls(n, pa.int64()),
            "span_end": pa.nulls(n, pa.int64()),
            "side": pa.array(np.zeros(n, np.int8)),
        })

    def tag_spans(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks() if isinstance(
                t["doc_id"], pa.ChunkedArray) else t["doc_id"],
            "text": pa.nulls(n, pa.string()),
            "span_start": t["span_start"],
            "span_end": t["span_end"],
            "side": pa.array(np.ones(n, np.int8)),
        })

    tagged = docs.map_batches(
        tag_docs, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).union(spans.map_batches(
        tag_spans, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True))
    tagged = add_bucket_column(tagged, "doc_id", num_buckets)

    def splice(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        tex = t.filter(pa.array(side == 0))
        sp = t.filter(pa.array(side == 1))
        if tex.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], id_type),
                "text_clean": pa.array([], pa.string()),
                "n_removed": pa.array([], pa.int64()),
            })
        data, off = _byte_view(tex["text"])
        base = int(off[0])
        buf = data[base:int(off[-1])]
        offr = off - base
        lengths = np.diff(offr)
        nd, nb = len(lengths), len(buf)
        removed = np.zeros(nd, np.int64)
        kept_buf = buf
        if sp.num_rows:
            row = pd.Index(
                tex["doc_id"].to_pandas()
            ).get_indexer(sp["doc_id"].to_pandas())
            s = sp["span_start"].to_numpy(zero_copy_only=False)
            e = sp["span_end"].to_numpy(zero_copy_only=False)
            ok = row >= 0
            row, s, e = row[ok], s[ok], e[ok]
            # clamp into the owning doc (spans derive from these texts,
            # so this is a no-op guard)
            s = np.clip(s, 0, lengths[row])
            e = np.clip(e, s, lengths[row])
            diff = np.zeros(nb + 1, np.int32)
            np.add.at(diff, offr[row] + s, 1)
            np.add.at(diff, offr[row] + e, -1)
            covered = np.cumsum(diff[:nb]) > 0
            kept_buf = buf[~covered]
            if nd:
                docpos = np.repeat(np.arange(nd, dtype=np.int64), lengths)
                removed = np.bincount(docpos[covered], minlength=nd)
        kept_len = lengths - removed
        offsets = np.zeros(nd + 1, np.int32)
        np.cumsum(kept_len, out=offsets[1:])
        arr = pa.StringArray.from_buffers(
            nd, pa.py_buffer(offsets.tobytes()),
            pa.py_buffer(np.ascontiguousarray(kept_buf).tobytes()))
        return pa.table({
            "doc_id": tex["doc_id"].combine_chunks() if isinstance(
                tex["doc_id"], pa.ChunkedArray) else tex["doc_id"],
            "text_clean": arr,
            "n_removed": pa.array(removed),
        })

    return bucketed_map_groups(tagged, splice, num_buckets=num_buckets,
                               batch_format="pyarrow")
