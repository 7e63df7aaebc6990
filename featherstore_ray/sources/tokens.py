"""Deterministic synthetic pre-tokenized sequence corpus (driver input_hint).

Table shape (BASELINE.json input_hint / FIXTURES.md §2):

    doc_id:string, tokens:list<int32>, n_tok:int32, source:string

Synthesized deterministically (fixed seed, per-block RNG streams — NO
wall-clock, no global RNG) so every run, process and parallelism level sees
byte-identical data. Distribution is deliberately skewed: doc_id drawn
Zipf-ish over a bounded id space (hot doc_ids recur) and ``source`` has a
hot head — the skew the salting/repartition logic must survive.

Generation is itself a Ray Data pipeline (``ray.data.range(num_blocks)`` →
``map_batches`` one-block-per-task) so corpus creation scales with the
cluster; results are cached as partitioned Parquet under a cache dir.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

SEED = 20240817
VOCAB = 50257  # GPT-2-ish vocab size
MAX_LEN = 512

DEFAULT_CACHE = os.environ.get("FSR_TOKENS_CACHE", "/tmp/fsr_tokens")

# rows per generated block — sized so one block ≈ tens of MB of list data
ROWS_PER_BLOCK = 25_000


def _gen_block(block_id: int, rows: int, num_doc_ids: int) -> pa.Table:
    """One deterministic block: RNG stream keyed by (SEED, block_id)."""
    rng = np.random.default_rng(np.random.SeedSequence([SEED, block_id]))
    # Zipf-ish skew over a bounded doc-id space: hot ids recur across blocks
    raw = rng.zipf(1.2, size=rows)
    doc_idx = (raw - 1) % num_doc_ids
    lengths = np.minimum(
        MAX_LEN, 1 + np.floor(rng.exponential(96.0, size=rows)).astype(np.int64)
    )
    total = int(lengths.sum())
    flat = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    offsets = np.zeros(rows + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
    # hot-head source distribution: src0 takes ~50%
    src_idx = np.minimum(rng.geometric(0.5, size=rows) - 1, 19)
    doc_ids = np.char.add("doc", np.char.zfill(doc_idx.astype("U9"), 9))
    sources = np.char.add("src", src_idx.astype("U2"))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32)),
            "source": pa.array(sources),
        }
    )


def tokens_dataset(
    num_rows: int,
    *,
    num_doc_ids: int | None = None,
) -> ray.data.Dataset:
    """Lazy deterministic corpus of ``num_rows`` sequences (no caching)."""
    num_doc_ids = num_doc_ids or max(1, num_rows // 2)
    num_blocks = max(1, -(-num_rows // ROWS_PER_BLOCK))

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for bid in batch["id"].to_pylist():
            rows = min(ROWS_PER_BLOCK, num_rows - bid * ROWS_PER_BLOCK)
            out.append(_gen_block(bid, rows, num_doc_ids))
        return pa.concat_tables(out)

    return (
        ray.data.range(num_blocks)
        .map_batches(gen, batch_format="pyarrow", batch_size=1)
    )


def tokens_parquet(
    num_rows: int,
    *,
    cache_dir: str = DEFAULT_CACHE,
    num_doc_ids: int | None = None,
    row_group_size: int | None = None,
) -> str:
    """Materialize (once) the corpus as partitioned Parquet; return the dir.

    Cache key = row count (+ row-group size when overridden); generation is
    deterministic so a cached dir is always valid. Writes one file per
    generated block for parallel reads. ``row_group_size`` controls the
    finest split granularity a reader gets WITHOUT re-decoding (a block
    split inside one row group decodes that group once per split) — pass a
    small value for compute-heavy consumers that want blocks >> files.
    """
    suffix = "" if row_group_size is None else f"-rg{row_group_size}"
    out = Path(cache_dir) / f"rows{num_rows}{suffix}"
    done = out / "_SUCCESS"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    num_doc_ids = num_doc_ids or max(1, num_rows // 2)
    num_blocks = max(1, -(-num_rows // ROWS_PER_BLOCK))
    for bid in range(num_blocks):
        rows = min(ROWS_PER_BLOCK, num_rows - bid * ROWS_PER_BLOCK)
        path = out / f"part-{bid:05d}.parquet"
        if not path.exists():
            tmp = out / f".part-{bid:05d}.tmp"
            pq.write_table(
                _gen_block(bid, rows, num_doc_ids), tmp,
                compression="zstd",
                **({"row_group_size": row_group_size}
                   if row_group_size else {}),
            )
            tmp.rename(path)
    done.touch()
    return str(out)


def sf_num_rows(sf_dir: str) -> int:
    """Map a driver sf dir to a corpus size (sf0.001→10k, sf0.01→100k, sf0.1→1M).

    sf=1 would be 10M sequences (~1 GB zstd parquet); the 10^12-sequence
    design point is the same pipeline at 10^5× the partition count.
    """
    name = Path(sf_dir).name  # e.g. "sf0.01"
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(1000, int(sf * 10_000_000))
