"""Multinomial Naive Bayes over a text corpus — train + score in one op.

The generative sibling of :func:`featherstore_ray.stages.ann.logreg_train`:
class priors from label frequencies, per-class token likelihoods with
Laplace smoothing over a bounded deterministic vocabulary, then every doc
scored with the learned table. Language identification from raw counts is
the canonical use (the heuristic `lang_id` stage is the zero-training
cousin).

Scale shape (three streaming passes, no all-to-all beyond the vocab top-N):
1. vocabulary — the shared word-count partial + ONE bucket exchange
   (:func:`featherstore_ray.stages.text.vocab_count`), top-V rows to the
   driver (V rows, not corpus rows);
2. training counts — each block collapses to (class, vocab-token, count)
   partials (≤ C × V rows per block) plus per-class doc counts, merged
   driver-side into a (V × C) log-probability table;
3. scoring — the table broadcast once; each block scores its docs with two
   vectorized gathers (token → vocab id, vocab id → per-class log-prob) and
   one scatter-add. Row layout preserved; no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from featherstore_ray.stages.text import _explode_words, vocab_count

__all__ = ["naive_bayes"]


def naive_bayes(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    vocab_size: int = 128,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Train multinomial NB on labeled docs, score every doc with text.

    Semantics (mirrored literally by the oracle): vocabulary = top
    ``vocab_size`` whitespace tokens by corpus count (ties → token
    ascending) over docs with non-null text; training uses docs with
    non-null text AND label; ``P(t|c) = (count(t,c)+1) / (Σ_t count(t,c)
    + V)``; ``score(d,c) = ln P(c) + Σ_{t∈d∩vocab} ln P(t|c)`` (token
    multiplicity counts; out-of-vocab tokens are ignored). Scores are
    ROUNDED before the argmax and ties take the lexicographically
    smallest class, so cross-engine ulp noise can't flip a prediction.

    Output: one row per doc with non-null text — (id, pred_{label_col},
    score).
    """
    V = int(vocab_size)
    pred_col = f"pred_{label_col}"

    vocab_df = vocab_count(
        ds, text_col, top_n=V, num_buckets=num_buckets
    ).to_pandas()  # ≤ V rows — the one driver materialization, bounded
    vocab = pa.array(sorted(vocab_df["token"].tolist()), type=pa.string())
    vocab_idx = {t: i for i, t in enumerate(vocab.to_pylist())}

    def count_partial(t: pa.Table) -> pa.Table:
        keep = pc.and_kleene(
            pc.is_valid(t[text_col]), pc.is_valid(t[label_col])
        )
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.table({
                "lang": pa.array([], type=pa.string()),
                "tok": pa.array([], type=pa.string()),
                "c": pa.array([], type=pa.int64()),
            })
        flat, offsets = _explode_words(t[text_col])
        tok_doc = np.repeat(
            np.arange(t.num_rows, dtype=np.int64), np.diff(offsets)
        )
        in_vocab = pc.index_in(flat, value_set=vocab)
        valid = pc.is_valid(in_vocab).to_numpy(zero_copy_only=False)
        labels = t[label_col].combine_chunks().cast(pa.string())
        tok_lang = labels.take(pa.array(tok_doc[valid]))
        toks = flat.filter(pa.array(valid))
        counts = (
            pa.table({"lang": tok_lang, "tok": toks})
            .group_by(["lang", "tok"]).aggregate([("tok", "count")])
            .rename_columns(["lang", "tok", "c"])
        )
        docs = (
            pa.table({"lang": labels})
            .group_by("lang").aggregate([("lang", "count")])
            .rename_columns(["lang", "c"])
        )
        docs = docs.add_column(
            1, "tok", pa.array([None] * docs.num_rows, type=pa.string())
        )
        return pa.concat_tables([counts, docs.select(["lang", "tok", "c"])])

    parts = (
        ds.select_columns([text_col, label_col])
        .map_batches(count_partial, batch_size=None, batch_format="pyarrow",
                     zero_copy_batch=True)
        .to_pandas()
    )
    merged = (
        parts.groupby(["lang", "tok"], dropna=False, sort=True)["c"]
        .sum().reset_index()
    )
    doc_counts = merged[merged["tok"].isna()]
    tok_counts = merged[merged["tok"].notna()]
    classes = sorted(doc_counts["lang"].tolist())
    C = len(classes)

    if C == 0:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            pred_col: pa.array([], type=pa.string()),
            "score": pa.array([], type=pa.float64()),
        }))

    cls_idx = {c: i for i, c in enumerate(classes)}
    n_docs = np.zeros(C)
    for lang, c in zip(doc_counts["lang"], doc_counts["c"]):
        n_docs[cls_idx[lang]] = float(c)
    logprior = np.log(n_docs / n_docs.sum())

    Vn = len(vocab)  # actual vocab size (≤ vocab_size on tiny corpora);
    cnt = np.zeros((Vn, C))  # the smoothing denominator mirrors it in SQL
    for lang, tok, c in zip(
        tok_counts["lang"], tok_counts["tok"], tok_counts["c"]
    ):
        cnt[vocab_idx[tok], cls_idx[lang]] = float(c)
    ctot = cnt.sum(axis=0)
    logprob = np.log((cnt + 1.0) / (ctot + Vn))  # (Vn, C)

    import ray as ray_mod

    model_ref = ray_mod.put((vocab, logprob, logprior, classes))

    def score(t: pa.Table, *, _ref=model_ref) -> pa.Table:
        import ray as r

        voc, lp, lpr, cls = r.get(_ref)
        t = t.filter(pc.is_valid(t[text_col]))
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                pred_col: pa.array([], type=pa.string()),
                "score": pa.array([], type=pa.float64()),
            })
        flat, offsets = _explode_words(t[text_col])
        tok_doc = np.repeat(
            np.arange(t.num_rows, dtype=np.int64), np.diff(offsets)
        )
        idx = pc.index_in(flat, value_set=voc)
        valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        ids = idx.to_numpy(zero_copy_only=False)
        scores = np.tile(lpr, (t.num_rows, 1))
        np.add.at(
            scores, tok_doc[valid], lp[ids[valid].astype(np.int64)]
        )
        scores = np.round(scores, round_digits)
        best = scores.argmax(axis=1)  # first max = smallest class name
        return pa.table({
            id_col: t[id_col],
            pred_col: pa.array([cls[b] for b in best], type=pa.string()),
            "score": pa.array(scores[np.arange(len(best)), best]),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
