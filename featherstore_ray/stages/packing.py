"""Sequence packing — assemble documents into fixed-token-budget training
sequences (the standard LLM pre-training batching step).

Greedy contiguous packing: within each group (e.g. ``source``), documents in
``id_col`` order accumulate into a sequence until adding the next one would
exceed ``budget`` tokens; that document starts the next sequence. A document
larger than the budget occupies a sequence alone. Deterministic — the same
rule a per-doc scan applies ("add while acc + n <= budget"), which is what
the recursive-CTE oracle encodes.

Scale shape (100 TB): ONE exchange on the group key, then a per-group kernel
whose inner loop is over SEQUENCES (``searchsorted`` into the token cumsum
per emitted bin), not rows — O(bins log docs) Python steps per group, all
row-level math vectorized. Groups pack independently, so the partitioning
key is also the resume/shard key for writers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from featherstore_ray.exchange import bucketed_map_groups
from featherstore_ray.partition import BUCKET_COL, add_bucket_column


def pack_greedy(n_tok: np.ndarray, budget: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy contiguous packing of one ordered token-count array.

    Returns (seq_id, seq_offset) per document. Inner loop over bins:
    each bin extends to the last cumsum position still within budget
    (``searchsorted`` right), minimum one document.
    """
    n = len(n_tok)
    seq_id = np.empty(n, dtype=np.int64)
    c = np.cumsum(n_tok, dtype=np.int64)
    bases = np.empty(n, dtype=np.int64)
    s, base, b = 0, 0, 0
    while s < n:
        e = int(np.searchsorted(c, base + budget, side="right"))
        e = max(e, s + 1)
        seq_id[s:e] = b
        bases[s:e] = base
        base = int(c[e - 1])
        s, b = e, b + 1
    seq_offset = c - n_tok - bases
    return seq_id, seq_offset


def pack_sequences(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    group_col: str = "source",
    size_col: str = "n_tokens",
    budget: int = 512,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Assign every document a ``(seq_id, seq_offset)`` inside its group's
    packed training sequences. Output columns: ``(id_col, group_col,
    size_col, seq_id, seq_offset)``; ``seq_id`` is 0-based per group in
    ``id_col`` order."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, id_col], kind="stable")
        out = []
        for _, g in df.groupby(group_col, sort=False):
            sid, off = pack_greedy(
                g[size_col].to_numpy(dtype=np.int64), budget
            )
            out.append(
                pd.DataFrame(
                    {
                        id_col: g[id_col].to_numpy(),
                        group_col: g[group_col].to_numpy(),
                        size_col: g[size_col].to_numpy(),
                        "seq_id": sid,
                        "seq_offset": off,
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                columns=[id_col, group_col, size_col, "seq_id", "seq_offset"]
            )
        return pd.concat(out, ignore_index=True)

    bucketed = add_bucket_column(
        ds.select_columns([id_col, group_col, size_col]),
        group_col,
        num_buckets,
    )
    return bucketed_map_groups(
        bucketed, kernel, num_buckets=num_buckets, batch_format="pandas"
    )
