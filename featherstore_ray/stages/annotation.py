"""Annotation-QA family: multi-rater agreement and noisy-label fusion.

Training-data labeling pipelines need two audits the statistics family
doesn't cover: "do the raters agree at all?" (Fleiss' kappa — the
N-rater generalization of :func:`~featherstore_ray.stages.aggregate.
cohen_kappa`, which is 2-rater) and "given they disagree, what is each
item's most likely true label and how reliable is each rater?"
(Dawid & Skene 1979 — confusion-matrix EM, the canonical crowd-label
aggregation model).

Scale shape shared by both ops: responses reduce to (item, annotator,
label, count) partials per batch, then ONE hash(item) exchange
co-locates each item's complete response set. Per-item statistics never
leave their bucket; only bounded partials move afterwards (per-label
totals for kappa; annotator-confusion / prior moment partials for EM —
the annotator and label vocabularies are bounded by contract, like the
type vocabulary in ``markov_stationary``; for ID-grade annotator sets
route the confusion fold through a second bucket exchange instead of
the driver).

Cross-engine notes: counts are exact ints; every smooth step (division,
ln, exp softmax) is mirrored term-for-term in the oracles and 6dp
output rounding absorbs summation-order ulps. The EM label argmax
rounds posteriors at 9dp first (ties -> smallest label) — the
changepoint / weighted_sample rounding convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from featherstore_ray.exchange import bucketed_map_groups, repartition_by_bucket
from featherstore_ray.partition import BUCKET_COL, add_bucket_column

__all__ = ["fleiss_kappa", "dawid_skene"]


def _response_partials(
    ds: ray.data.Dataset,
    item_col: str,
    label_col: str,
    annotator_col: str | None,
    num_buckets: int,
) -> ray.data.Dataset:
    """(item [, annotator], label, _c) count partials, bucketed by item."""
    cols = [item_col] + ([annotator_col] if annotator_col else []) + [label_col]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=cols)
        if df.empty:
            out = df[cols].copy()
            out["_c"] = pd.Series(dtype="int64")
            return out
        return (
            df.groupby(cols, sort=False).size().rename("_c").reset_index()
        )

    parts = ds.select_columns(cols).map_batches(
        partial, batch_size=None, batch_format="pandas")
    return add_bucket_column(parts, item_col, num_buckets)


def fleiss_kappa(
    ds: ray.data.Dataset,
    *,
    item_col: str,
    label_col: str,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Fleiss' kappa over multi-rater item labels, generalized to a
    varying number of ratings per item (Fleiss 1971): items with fewer
    than 2 ratings are dropped (no pair to agree) on BOTH sides; with
    ``c_ik`` the per-(item, label) counts and ``n_i = sum_k c_ik``,

        P_i  = (sum_k c_ik^2 - n_i) / (n_i (n_i - 1))
        Pbar = mean_i P_i
        p_k  = sum_i c_ik / sum_i n_i          (kept items only)
        Pe   = sum_k p_k^2
        kappa = (Pbar - Pe) / (1 - Pe)         (NULL when Pe == 1)

    Output: one row (n_items, n_ratings, p_bar, p_e, kappa).

    Scale shape: per-batch (item, label) count partials, one hash(item)
    exchange, each bucket emits per-label totals plus three bucket
    scalars; the driver folds |labels| + buckets rows.
    """
    parts = _response_partials(ds, item_col, label_col, None, num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        empty = pd.DataFrame({
            "_l": pd.Series(dtype="object"),
            "_cl": pd.Series(dtype="int64"),
            "_sp": pd.Series(dtype="float64"),
            "_ni": pd.Series(dtype="int64"),
            "_nt": pd.Series(dtype="int64"),
        })
        if df.empty:
            return empty
        cnt = (
            df.groupby([item_col, label_col], sort=True)["_c"]
            .sum().rename("c").reset_index()
        )
        per_item = cnt.groupby(item_col, sort=True)["c"].agg(
            n="sum", s2=lambda s: int((s.to_numpy(np.int64) ** 2).sum()))
        keep = per_item[per_item["n"] >= 2]
        if keep.empty:
            return empty
        n = keep["n"].to_numpy(np.int64)
        s2 = keep["s2"].to_numpy(np.int64)
        sp = float(((s2 - n) / (n * (n - 1))).sum())
        kept_cnt = cnt[cnt[item_col].isin(keep.index)]
        cl = kept_cnt.groupby(label_col, sort=True)["c"].sum()
        out = pd.DataFrame({
            "_l": cl.index.astype(object),
            "_cl": cl.to_numpy(np.int64),
            "_sp": 0.0,
            "_ni": np.int64(0),
            "_nt": np.int64(0),
        })
        out.loc[0, "_sp"] = sp
        out.loc[0, "_ni"] = len(keep)
        out.loc[0, "_nt"] = int(n.sum())
        return out

    folded = bucketed_map_groups(
        parts, kernel, num_buckets=num_buckets, batch_format="pandas"
    ).to_pandas()
    if folded.empty or folded["_ni"].sum() == 0:
        return ray.data.from_arrow(pa.table({
            "n_items": pa.array([0], pa.int64()),
            "n_ratings": pa.array([0], pa.int64()),
            "p_bar": pa.array([None], pa.float64()),
            "p_e": pa.array([None], pa.float64()),
            "kappa": pa.array([None], pa.float64()),
        }))
    n_items = int(folded["_ni"].sum())
    n_tot = int(folded["_nt"].sum())
    p_bar = folded["_sp"].sum() / n_items
    cl = folded.groupby("_l", sort=True)["_cl"].sum().to_numpy(np.float64)
    p_e = float(((cl / n_tot) ** 2).sum())
    kappa = None if p_e == 1.0 else round(
        (p_bar - p_e) / (1.0 - p_e), round_digits)
    return ray.data.from_arrow(pa.table({
        "n_items": pa.array([n_items], pa.int64()),
        "n_ratings": pa.array([n_tot], pa.int64()),
        "p_bar": pa.array([round(p_bar, round_digits)], pa.float64()),
        "p_e": pa.array([round(p_e, round_digits)], pa.float64()),
        "kappa": pa.array([kappa], pa.float64()),
    }))


def dawid_skene(
    ds: ray.data.Dataset,
    *,
    item_col: str,
    annotator_col: str,
    label_col: str,
    iters: int = 2,
    alpha: float = 0.1,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Dawid-Skene confusion-matrix EM for true-label inference from
    noisy raters (Dawid & Skene 1979), fixed schedule — ``iters``
    M-steps, each followed by an E-step; NO convergence test, so the
    oracle can mirror the identical unrolled chain:

      post0(i,k) = c_ik / n_i                     (vote-share init)
      M: conf(a,l,k) = (sum_i c_ial post(i,k) + alpha)
                       / (sum_l' . + K alpha);  prior(k) = mean_i post(i,k)
      E: s(i,k) = ln prior(k) + sum_{a,l} c_ial ln conf(a,l,k)
         post(i,k) = softmax_k(s)   (max-subtracted, mirrored exactly)

    Multiple responses by one annotator on one item each contribute an
    independent likelihood factor (the ``c_ial`` weights). Output one
    row per item: (item, label_hat, confidence, n_resp) where label_hat
    is the posterior argmax with posteriors ROUNDED at 9dp first (ties
    -> smallest label — the changepoint convention, so near-exact ties
    cannot flip across engines) and confidence is the winner's
    posterior rounded to ``round_digits``.

    Scale shape: one hash(item) exchange materialized ONCE
    (``repartition_by_bucket``) and re-read zero-copy every round; per
    round each bucket emits (annotator, label, k) confusion partials +
    K prior partials; the driver folds an A x K x K tensor (annotator
    and label vocabularies bounded by contract — see module docstring).
    """
    parts = _response_partials(
        ds, item_col, label_col, annotator_col, num_buckets)
    mat, _ = repartition_by_bucket(parts, num_buckets=num_buckets)

    vocab = mat.map_batches(
        lambda df: df[[annotator_col, label_col]].drop_duplicates(),
        batch_size=None, batch_format="pandas").to_pandas()
    if vocab.empty:
        return ray.data.from_arrow(pa.table({
            item_col: pa.array([], pa.string()),
            "label_hat": pa.array([], pa.string()),
            "confidence": pa.array([], pa.float64()),
            "n_resp": pa.array([], pa.int64()),
        }))
    labels = np.sort(vocab[label_col].unique())
    annotators = np.sort(vocab[annotator_col].unique())
    k = len(labels)
    a_n = len(annotators)
    l_idx = {v: i for i, v in enumerate(labels)}
    a_idx = {v: i for i, v in enumerate(annotators)}

    def _posteriors(df: pd.DataFrame, logconf, logprior):
        """Per-item posterior matrix for one whole-bucket frame."""
        items, inv = np.unique(df[item_col].to_numpy(), return_inverse=True)
        ai = df[annotator_col].map(a_idx).to_numpy(np.int64)
        li = df[label_col].map(l_idx).to_numpy(np.int64)
        c = df["_c"].to_numpy(np.float64)
        if logconf is None:
            cik = np.zeros((len(items), k), np.float64)
            np.add.at(cik, (inv, li), c)
            post = cik / cik.sum(axis=1, keepdims=True)
        else:
            s = np.tile(logprior, (len(items), 1))
            np.add.at(s, inv, c[:, None] * logconf[ai, li, :])
            e = np.exp(s - s.max(axis=1, keepdims=True))
            post = e / e.sum(axis=1, keepdims=True)
        return items, inv, ai, li, c, post

    def make_mstep(logconf, logprior):
        def mstep(df: pd.DataFrame) -> pd.DataFrame:
            df = df.drop(columns=[BUCKET_COL])
            if df.empty:
                return pd.DataFrame({
                    "_kind": pd.Series(dtype="int64"),
                    "_a": pd.Series(dtype="int64"),
                    "_l": pd.Series(dtype="int64"),
                    "_k": pd.Series(dtype="int64"),
                    "_w": pd.Series(dtype="float64"),
                })
            items, inv, ai, li, c, post = _posteriors(df, logconf, logprior)
            num = np.zeros((a_n, k, k), np.float64)
            np.add.at(num, (ai, li), c[:, None] * post[inv])
            az, lz, kz = np.nonzero(num)
            pr = post.sum(axis=0)
            return pd.DataFrame({
                "_kind": np.concatenate([
                    np.zeros(len(az), np.int64),
                    np.ones(k, np.int64),
                    np.full(1, 2, np.int64)]),
                "_a": np.concatenate([az, np.zeros(k + 1, np.int64)]),
                "_l": np.concatenate([lz, np.zeros(k + 1, np.int64)]),
                "_k": np.concatenate([kz, np.arange(k), [0]]),
                "_w": np.concatenate([num[az, lz, kz], pr,
                                      [float(len(items))]]),
            })
        return mstep

    logconf, logprior = None, None
    for _ in range(iters):
        folded = mat.map_batches(
            make_mstep(logconf, logprior), batch_size=None,
            batch_format="pandas").to_pandas()
        num = np.zeros((a_n, k, k), np.float64)
        cm = folded[folded["_kind"] == 0]
        # fold partials in deterministic (a, l, k) order
        g = cm.groupby(["_a", "_l", "_k"], sort=True)["_w"].sum()
        ii = g.index.to_frame().to_numpy(np.int64)
        num[ii[:, 0], ii[:, 1], ii[:, 2]] = g.to_numpy()
        conf = (num + alpha) / (num.sum(axis=1, keepdims=True) + k * alpha)
        pv = (folded[folded["_kind"] == 1]
              .groupby("_k", sort=True)["_w"].sum()
              .reindex(range(k), fill_value=0.0).to_numpy())
        n_items = folded.loc[folded["_kind"] == 2, "_w"].sum()
        prior = pv / n_items
        logconf, logprior = np.log(conf), np.log(prior)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({
                item_col: df[item_col] if item_col in df else
                pd.Series(dtype="object"),
                "label_hat": pd.Series(dtype="object"),
                "confidence": pd.Series(dtype="float64"),
                "n_resp": pd.Series(dtype="int64"),
            })
        items, inv, ai, li, c, post = _posteriors(df, logconf, logprior)
        pr9 = np.round(post, 9)
        win = np.argmax(pr9, axis=1)  # first max = smallest label on ties
        nr = np.zeros(len(items), np.int64)
        np.add.at(nr, inv, df["_c"].to_numpy(np.int64))
        return pd.DataFrame({
            item_col: items,
            "label_hat": labels[win].astype(object),
            "confidence": np.round(post[np.arange(len(items)), win],
                                   round_digits),
            "n_resp": nr,
        })

    return mat.map_batches(final, batch_size=None, batch_format="pandas")
