"""Feature materialization over the pre-tokenized sequence corpus.

The north-star workload (BASELINE.json): point-in-time join + window
features + near-dedup over the ``(doc_id, tokens, n_tok, source)`` table at
10^12-sequence design scale. Everything here is a deterministic function of
the data — no row ids needed:

- ``seq_hash``: order-sensitive rolling hash of the token array (also the
  exact-dedup key)
- event time: ``ts = BASE + mix(seq_hash) % SPAN`` — a deterministic
  pseudo-ingest-time per sequence
- spine/feature split: ``seq_hash % 4 == 0`` rows are the query spine, the
  rest are feature events; the suite as-of joins spine against features per
  doc_id with zero leakage, plus lag/lead + rolling + sessionize

Near-dedup at scale (``tokens_minhash_pairs``): per-batch vectorized MinHash
over token shingles → explode only ``(band, band_hash, seq_hash)`` rows (the
full signature matrix is NEVER shuffled — at 10^12 rows that would be ~PBs)
→ ONE groupby on the band key → candidate pairs → similarity estimated by
the number of matching bands (P[band match] = J^r).
"""

from __future__ import annotations

from datetime import timedelta

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)

BASE_TS_US = 1_700_000_000_000_000  # fixed epoch anchor
SPAN_US = 30 * 24 * 3600 * 1_000_000  # 30-day synthetic ingest window


def _token_hashes(tokens_col) -> tuple[np.ndarray, np.ndarray]:
    """Flat uint64 hashes of the int32 token stream + per-row offsets."""
    if isinstance(tokens_col, pa.ChunkedArray):
        tokens_col = tokens_col.combine_chunks()
    flat = tokens_col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    offsets = tokens_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    np.add(flat, _C1, out=flat)
    np.multiply(flat, _C2, out=flat)
    return flat, offsets


def _seq_hashes(h: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Order-sensitive sequence hash: positional reweighting via prefix sums.

    ``sum(h_i) ^ (sum(i * h_i) * C3) ^ len`` — both sums via one cumsum each,
    so permuted sequences collide only adversarially.
    """
    n = len(offsets) - 1
    lens = (offsets[1:] - offsets[:-1]).astype(np.uint64)
    if len(h) == 0:
        return np.zeros(n, np.uint64) ^ (lens * _C3)
    csum = np.empty(len(h) + 1, np.uint64)
    csum[0] = 0
    np.cumsum(h, out=csum[1:])
    pos = np.arange(len(h), dtype=np.uint64)
    ph = h * pos
    pcsum = np.empty(len(h) + 1, np.uint64)
    pcsum[0] = 0
    np.cumsum(ph, out=pcsum[1:])
    s = csum[offsets[1:]] - csum[offsets[:-1]]
    # positional sum RELATIVE to the sequence start (sum (i-b)*h_i):
    # an absolute-position sum would make the hash depend on where the row
    # sits inside its block — not a content hash at all
    p = (
        pcsum[offsets[1:]] - pcsum[offsets[:-1]]
        - offsets[:-1].astype(np.uint64) * s
    )
    return s ^ (p * _C3) ^ (lens * _C2)


def derive_doc_events(ds: ray.data.Dataset) -> ray.data.Dataset:
    """tokens table → deterministic event table
    (doc_id, ts, value, seq_hash, event_kind)."""

    def derive(t: pa.Table) -> pa.Table:
        h, offsets = _token_hashes(t["tokens"])
        sh = _seq_hashes(h, offsets)
        mixed = sh ^ (sh >> np.uint64(31))
        np.multiply(mixed, _C3, out=mixed)
        ts = BASE_TS_US + (mixed % np.uint64(SPAN_US)).astype(np.int64)
        # int8 kind flag + dictionary-encoded source: the derived table is
        # what the suite SHUFFLES — narrow columns cut exchange bytes
        kind = (sh % np.uint64(4) == 0).astype(np.int8)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        return pa.table(
            {
                # NOTE: dict-encoding doc_id was tried and measured SLOWER
                # (9.8s vs 6.8s @16): per-kernel categorical decode plus
                # pandas categorical sort/groupby costs exceed the exchange
                # byte savings at this string width
                "doc_id": t["doc_id"],
                "source": src.dictionary_encode(),
                "ts": pa.array(ts.astype("datetime64[us]")),
                "value": t["n_tok"].cast(pa.float64()),
                "seq_hash": pa.array(sh.view(np.int64)),
                "event_kind": pa.array(kind),
            }
        )

    return ds.map_batches(derive, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def tokens_feature_suite(
    tokens: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Flagship over the corpus: windows + as-of, rows moved once.

    The corpus doc_id is Zipf-skewed (top doc ~18% of rows), so the plain
    one-shuffle suite is straggler-bound: one bucket holds ~25% of the data
    and caps scaling at ~4x regardless of CPUs. The chunked suite
    (stages/chunked.py) time-slices hot entities with exact halo semantics —
    identical output (tests/test_chunked.py), straggler-free.
    """
    from featherstore_ray.stages.chunked import feature_suite_chunked

    # metadata-only count on the raw parquet read (derive preserves rows):
    # lets the chunked suite skip a full counting execution
    total = tokens.count()
    events = derive_doc_events(tokens)
    return feature_suite_chunked(
        events,
        entity_col="doc_id",
        ts_col="ts",
        value_col="value",
        type_col="event_kind",
        tiebreak="seq_hash",
        spine_type=1,
        feature_type=0,
        num_buckets=num_buckets,
        total_rows=total,
    )


def tokens_minhash_pairs(
    tokens: ray.data.Dataset,
    *,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    min_band_matches: int = 2,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Near-duplicate sequence pairs via MinHash-LSH over token shingles.

    Returns (a, b, n_bands) — candidate pairs (keyed by seq_hash, a < b)
    with the number of matching bands as the similarity evidence
    (``n_bands/bands ≈ J^r`` estimator). Only (band, band_hash, key)
    triples are shuffled; signatures stay batch-local.
    """
    from featherstore_ray.partition import BUCKET_COL
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.stages.dedup import (
        _band_hashes,
        minhash_signatures_from_hashes,
    )
    from featherstore_ray.stages.text import shingle_hashes

    def explode(t: pa.Table) -> pa.Table:
        h, offsets = _token_hashes(t["tokens"])
        seq = _seq_hashes(h, offsets).view(np.int64)
        sh, soff = shingle_hashes(h, offsets, shingle_k)
        sig = minhash_signatures_from_hashes(sh, soff, num_perm=num_perm)
        bh = _band_hashes(sig, bands)
        n = t.num_rows
        # ONE mixed group key instead of (band, band_hash): narrows the
        # 16n-row exchange by a 12B column; cross-band collisions are
        # ~2^-64 and candidates are verified by band count downstream
        band_col = np.repeat(
            np.arange(1, bands + 1, dtype=np.uint64), n
        )
        gk = bh.T.reshape(-1) * _C2 + band_col
        return pa.table(
            {
                "gk": pa.array(gk.view(np.int64)),
                "key": pa.array(np.tile(seq, bands)),
                BUCKET_COL: pa.array(
                    (gk % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    exploded = tokens.map_batches(explode, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Star-shaped candidate pairs per (band, band_hash) group, fully
        vectorized: sort → boundary mask → (first key of group, other keys).
        Star (vs all-pairs) keeps output linear in group size; components
        are still linked transitively downstream."""
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
            )
        df = df.sort_values(["gk", "key"], kind="stable")
        gk = df["gk"].to_numpy()
        key = df["key"].to_numpy()
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = gk[1:] != gk[:-1]
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (~new_grp[1:]) & (key[1:] == key[:-1])
        keep = ~dup
        key = key[keep]
        new_grp = new_grp[keep]
        n = len(key)
        starts = np.flatnonzero(new_grp)
        sizes = np.diff(np.append(starts, n))
        first = np.repeat(key[starts], sizes)
        mask = ~new_grp
        return pd.DataFrame({"a": first[mask], "b": key[mask]})

    cand = bucketed_map_groups(exploded, pairs, num_buckets=num_buckets, batch_format="pandas")

    def count_bands(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], sort=False).size().reset_index(name="n_bands")
        return g[g["n_bands"] >= min_band_matches]

    # second tiny shuffle over candidate pairs only
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            BUCKET_COL,
            pa.array(((a * _C2 ^ b) % np.uint64(num_buckets)).astype(np.int32)),
        )

    cand = cand.map_batches(add_pair_bucket, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return count_bands(df.drop(columns=[BUCKET_COL]))

    return bucketed_map_groups(cand, final, num_buckets=num_buckets, batch_format="pandas")
