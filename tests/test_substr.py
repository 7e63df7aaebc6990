"""Exact substring dedup (stages/substr.py) vs a brute-force reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from featherstore_ray.stages.substr import substring_dedup

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _brute_spans(texts: dict, L: int) -> pd.DataFrame:
    """Reference: count every length-L window, merge duplicated anchors."""
    from collections import Counter

    c = Counter()
    for s in texts.values():
        if s is None:
            continue
        for i in range(len(s) - L + 1):
            c[s[i:i + L]] += 1
    rows = []
    for d, s in texts.items():
        if s is None:
            continue
        anchors = [i for i in range(len(s) - L + 1) if c[s[i:i + L]] >= 2]
        if not anchors:
            continue
        st = prev = anchors[0]
        n = 1
        for a in anchors[1:]:
            if a - prev > L:
                rows.append((d, st, prev + L, n))
                st, n = a, 0
            prev = a
            n += 1
        rows.append((d, st, prev + L, n))
    return (pd.DataFrame(rows, columns=["doc_id", "span_start", "span_end",
                                        "n_windows"])
            .sort_values(["doc_id", "span_start"]).reset_index(drop=True))


def _run(ds, L, **kw) -> pd.DataFrame:
    out = substring_dedup(ds, min_len=L, **kw).to_pandas()
    return (out.sort_values(["doc_id", "span_start"])
            .reset_index(drop=True).astype("int64"))


def test_matches_brute_force_on_documents(ray_session):
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    ref = _brute_spans(texts, 25)
    out = _run(ray.data.from_arrow(t), 25)
    pd.testing.assert_frame_equal(out, ref.astype("int64"))


def test_within_doc_duplicates_and_merging(ray_session):
    # "abcdefgh" repeats inside doc 1 AND in doc 2; doc 3 is clean
    texts = {
        1: "xxabcdefghyy--abcdefghzz",
        2: "ooabcdefghpp",
        3: "nothing-duplicated-here!",
    }
    t = pa.table({"doc_id": list(texts), "text": list(texts.values())})
    ref = _brute_spans(texts, 8)
    out = _run(ray.data.from_arrow(t), 8, num_buckets=4)
    pd.testing.assert_frame_equal(out, ref.astype("int64"))
    # doc 3 produced no span at all
    assert 3 not in set(out["doc_id"])


def test_batch_boundary_invariance(ray_session):
    """Content hashes must not depend on batching (CLAUDE.md contract):
    1 block vs 7 blocks produce identical spans."""
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    one = _run(ray.data.from_arrow(t), 30, num_buckets=8)
    many = _run(ray.data.from_arrow(t).repartition(7), 30, num_buckets=8)
    pd.testing.assert_frame_equal(one, many)


def test_min_len_longer_than_docs_is_empty(ray_session):
    t = pa.table({"doc_id": [1, 2], "text": ["short", "tiny"]})
    out = substring_dedup(ray.data.from_arrow(t), min_len=50, num_buckets=4)
    # Dataset-level schema is typed even when empty (to_pandas() of a
    # zero-block dataset drops columns — Ray quirk, not the op's contract)
    assert set(out.schema().names) == {"doc_id", "span_start", "span_end",
                                       "n_windows"}
    assert out.count() == 0


def test_null_doc_id_and_null_text_dropped(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, None, 2, 3], pa.int64()),
        "text": ["AAAAABBBBB", "AAAAABBBBB", "AAAAABBBBB", None],
    })
    # null-id rows are out of contract entirely: their windows neither
    # appear in the output nor count as duplicate occurrences
    out = _run(ray.data.from_arrow(t), 10, num_buckets=4)
    ref = _brute_spans({1: "AAAAABBBBB", 2: "AAAAABBBBB"}, 10)
    pd.testing.assert_frame_equal(out, ref.astype("int64"))


def test_whole_doc_duplicate_span_covers_doc(ray_session):
    t = pa.table({"doc_id": [1, 2], "text": ["identical-doc-text"] * 2})
    out = _run(ray.data.from_arrow(t), 5, num_buckets=4)
    assert (out["span_start"] == 0).all()
    assert (out["span_end"] == len("identical-doc-text")).all()
    assert len(out) == 2


def test_candidate_cap_raises(ray_session):
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    with pytest.raises(ValueError, match="candidate_cap"):
        substring_dedup(ray.data.from_arrow(t), min_len=15,
                        candidate_cap=10).to_pandas()


def test_min_len_validation(ray_session):
    t = pa.table({"doc_id": [1], "text": ["abc"]})
    with pytest.raises(ValueError, match="min_len"):
        substring_dedup(ray.data.from_arrow(t), min_len=0)


def _brute_clean(texts: dict, L: int) -> pd.DataFrame:
    from collections import Counter

    c = Counter()
    for s in texts.values():
        for i in range(len(s) - L + 1):
            c[s[i:i + L]] += 1
    rows = []
    for d, s in texts.items():
        covered = [False] * len(s)
        for i in range(len(s) - L + 1):
            if c[s[i:i + L]] >= 2:
                for j in range(i, i + L):
                    covered[j] = True
        rows.append((d, "".join(ch for ch, cv in zip(s, covered) if not cv),
                     sum(covered)))
    return (pd.DataFrame(rows, columns=["doc_id", "text_clean", "n_removed"])
            .sort_values("doc_id").reset_index(drop=True))


def test_substring_clean_matches_brute_force(ray_session):
    from featherstore_ray.stages.substr import substring_clean

    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    ref = _brute_clean(texts, 25)
    out = (substring_clean(ray.data.from_arrow(t), min_len=25)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype({"n_removed": "int64"}), ref.astype({"n_removed": "int64"}))


def test_substring_clean_edge_cases(ray_session):
    from featherstore_ray.stages.substr import substring_clean

    texts = {
        1: "QQidenticalQQ",       # fully covered (doc 2 is its twin)
        2: "QQidenticalQQ",
        3: "half-XXXXXXXXXX-unique-tail-here",  # partial span
        4: "XXXXXXXXXXextra",
        5: "all unique text nothing shared",
    }
    t = pa.table({
        "doc_id": pa.array(list(texts) + [None, 6], pa.int64()),
        "text": list(texts.values()) + ["QQidenticalQQ", None],
    })
    out = (substring_clean(ray.data.from_arrow(t).repartition(3),
                           min_len=8, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # null id / null text rows are out of contract entirely
    ref = _brute_clean(texts, 8)
    pd.testing.assert_frame_equal(
        out.astype({"n_removed": "int64"}), ref.astype({"n_removed": "int64"}))
    assert out.loc[out["doc_id"] == 1, "text_clean"].iloc[0] == ""
    assert (out.loc[out["doc_id"] == 5, "n_removed"] == 0).all()
