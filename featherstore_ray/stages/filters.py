"""Vectorized filters: entity semi-join and inclusive time-range.

Reference parity:
- entity semi-join (keep rows whose entity is in a requested small set):
  pkg/storage/parquet/parquet.go:642-676 and the SQL ``WHERE entity_id IN``
  at pkg/storage/duckdb/duckdb.go:620-625. The small ID list is broadcast
  (captured in the task closure — KBs), never shuffled.
- time-range filter with **inclusive** bounds on both ends:
  pkg/storage/parquet/parquet.go:728 (``!t.Before(start) && !t.After(end)``)
  and pkg/storage/duckdb/duckdb.go:683-689 (``>= ? AND <= ?``).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def semi_join_filter(
    ds: ray.data.Dataset,
    key: str,
    values: Sequence[Any],
) -> ray.data.Dataset:
    """Keep rows whose ``key`` column is in ``values`` (broadcast semi-join).

    ``values`` must be driver-side small (an ID list); for large key sets use
    a bucket-partitioned join instead.
    """
    value_set = pa.array(sorted(set(values)))

    def _filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[key], value_set=value_set))

    return ds.map_batches(_filter, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def time_range_filter(
    ds: ray.data.Dataset,
    ts_col: str,
    start,
    end,
) -> ray.data.Dataset:
    """Keep rows with ``start <= ts <= end`` — inclusive both ends.

    Inclusivity matches the reference exactly (parquet.go:728).
    """
    start_s = pa.scalar(start)
    end_s = pa.scalar(end)

    def _filter(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        mask = pc.and_kleene(pc.greater_equal(ts, start_s), pc.less_equal(ts, end_s))
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(_filter, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def history(
    ds: ray.data.Dataset,
    *,
    entity_col: str,
    ts_col: str,
    entity_ids: Sequence[Any] | None = None,
    start=None,
    end=None,
    sort_desc: bool = True,
) -> ray.data.Dataset:
    """GetFeatureHistory: entity + inclusive time-range filter, ts-desc order.

    Mirrors pkg/storage/duckdb/duckdb.go:683-689 (row-level event-time
    predicate — the normative path; we deliberately do NOT replicate the
    Parquet path's write-time file pruning, a correctness hazard noted in
    SURVEY.md S5).
    """
    out = ds
    if entity_ids is not None:
        out = semi_join_filter(out, entity_col, entity_ids)
    if start is not None and end is not None:
        out = time_range_filter(out, ts_col, start, end)
    elif start is not None:
        s = pa.scalar(start)
        out = out.map_batches(lambda t, s=s: t.filter(pc.fill_null(pc.greater_equal(t[ts_col], s), False)), batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
    elif end is not None:
        e = pa.scalar(end)
        out = out.map_batches(lambda t, e=e: t.filter(pc.fill_null(pc.less_equal(t[ts_col], e), False)), batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
    if sort_desc:
        out = out.sort(ts_col, descending=True)
    return out


def _bloom_positions(h, i: int, num_bits: int):
    """Bit position of derived hash ``i`` for pre-mixed key hashes ``h``
    (golden-ratio odd-constant remix) — shared by build and probe so the
    two sides can never drift."""
    import numpy as np

    return (
        h * np.uint64(2 * i + 1)
        + np.uint64(0x9E3779B97F4A7C15 * (i + 1) % (1 << 64))
    ) % np.uint64(num_bits)


def build_bloom(
    keys, *, num_bits: int = 1 << 20, num_hashes: int = 4
) -> dict:
    """Bloom filter over a key array: k derived hashes scatter into an
    m-bit numpy bitset. Deterministic (fixed multiplicative mixers), tiny
    (m/8 bytes regardless of key count) — the broadcast side of
    ``bloom_semi_join``. False-positive rate ~ (1 - e^(-kn/m))^k."""
    import numpy as np

    from featherstore_ray.partition import stable_hash

    h = stable_hash(pa.array(list(keys)) if not isinstance(
        keys, (pa.Array, pa.ChunkedArray)) else keys)
    bits = np.zeros(num_bits // 8 + 1, dtype=np.uint8)
    for i in range(num_hashes):
        hi = _bloom_positions(h, i, num_bits)
        np.bitwise_or.at(bits, (hi // 8).astype(np.int64),
                         (1 << (hi % 8)).astype(np.uint8))
    return {"bits": bits, "num_bits": num_bits, "num_hashes": num_hashes}


def bloom_semi_join(
    facts: ray.data.Dataset,
    keys,
    key_col: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    exact: bool = True,
) -> ray.data.Dataset:
    """Semi-join a fact stream against a key set via a broadcast Bloom
    filter — the 100 TB shape of ``semi_join_filter``: the filter side
    costs ``num_bits/8`` bytes in the object store no matter how many keys
    (a raw ``is_in`` set for 10^9 keys would broadcast GBs), and the fact
    side streams map-only, no shuffle.

    With ``exact=True`` (default) survivors are re-checked against the
    true key set, so the OUTPUT is the exact semi-join (SQL ``WHERE key IN
    (...)`` — oracled); the bloom is then a cheap pre-filter that drops
    ~all non-members before the expensive set probe. ``exact=False`` skips
    the verify for the pure sketch behavior (false positives ~
    (1-e^(-kn/m))^k, no false negatives).
    """
    import numpy as np

    import ray

    from featherstore_ray.partition import stable_hash

    keys_arr = (
        keys if isinstance(keys, (pa.Array, pa.ChunkedArray))
        else pa.array(list(keys))
    )
    bloom = build_bloom(
        keys_arr, num_bits=num_bits, num_hashes=num_hashes
    )
    bloom_ref = ray.put(bloom)
    exact_ref = ray.put(keys_arr if exact else None)

    def _filter(batch: pa.Table) -> pa.Table:
        bl = ray.get(bloom_ref)
        bits, m, k = bl["bits"], bl["num_bits"], bl["num_hashes"]
        h = stable_hash(batch[key_col])
        keep = np.ones(len(h), dtype=bool)
        for i in range(k):
            hi = _bloom_positions(h, i, m)
            keep &= (
                bits[(hi // 8).astype(np.int64)]
                & (1 << (hi % 8)).astype(np.uint8)
            ) != 0
        out = batch.filter(pa.array(keep))
        vs = ray.get(exact_ref)
        if vs is not None and out.num_rows:
            out = out.filter(pc.is_in(out[key_col], value_set=vs))
        return out

    return facts.map_batches(
        _filter, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def anti_join_filter(
    ds: ray.data.Dataset,
    key: str,
    values,
) -> ray.data.Dataset:
    """Keep rows whose ``key`` is NOT in ``values`` (broadcast anti-join —
    SQL ``WHERE key NOT IN (...)``). Matching SQL's three-valued logic,
    NULL keys are DROPPED: ``NULL NOT IN (non-empty list)`` evaluates to
    NULL, which a WHERE clause filters out. The complement of
    ``semi_join_filter``; same broadcast contract (driver-side small key
    set — for key sets too big to broadcast raw, build a bloom of the
    FACT side instead or use a partitioned join)."""
    value_set = (
        values if isinstance(values, (pa.Array, pa.ChunkedArray))
        else pa.array(sorted(set(values)))
    )

    def _filter(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch[key], value_set=value_set)
        keep = pc.and_(
            pc.invert(pc.fill_null(m, False)), pc.is_valid(batch[key])
        )
        return batch.filter(keep)

    return ds.map_batches(
        _filter, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
