"""Behavioral gates for the annotation-QA family (fleiss_kappa,
dawid_skene) — planted-truth semantics the oracle sweep can't certify
(both engines could be wrong the same way)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.stages.annotation import dawid_skene, fleiss_kappa


def _resp_ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


def test_fleiss_kappa_perfect_agreement_is_one(ray_session):
    rows = []
    for item in range(6):
        lab = "ab"[item % 2]
        rows += [(item, lab)] * 5  # 5 unanimous raters per item
    df = pd.DataFrame(rows, columns=["item", "label"])
    out = fleiss_kappa(_resp_ds(df), item_col="item",
                       label_col="label").to_pandas()
    assert out.loc[0, "kappa"] == 1.0
    assert out.loc[0, "n_items"] == 6 and out.loc[0, "n_ratings"] == 30


def test_fleiss_kappa_matches_published_worked_example(ray_session):
    # Fleiss (1971) psychiatric-diagnosis table (the standard worked
    # example): 10 items x 14 raters x 5 categories -> kappa ~ 0.210.
    counts = [
        [0, 0, 0, 0, 14],
        [0, 2, 6, 4, 2],
        [0, 0, 3, 5, 6],
        [0, 3, 9, 2, 0],
        [2, 2, 8, 1, 1],
        [7, 7, 0, 0, 0],
        [3, 2, 6, 3, 0],
        [2, 5, 3, 2, 2],
        [6, 5, 2, 1, 0],
        [0, 2, 2, 3, 7],
    ]
    rows = []
    for item, row in enumerate(counts):
        for lab, c in enumerate(row):
            rows += [(item, f"cat{lab}")] * c
    df = pd.DataFrame(rows, columns=["item", "label"])
    out = fleiss_kappa(_resp_ds(df, 5), item_col="item",
                       label_col="label").to_pandas()
    assert round(out.loc[0, "p_bar"], 3) == 0.378
    assert round(out.loc[0, "p_e"], 3) == 0.213
    assert round(out.loc[0, "kappa"], 3) == 0.210


def test_fleiss_kappa_single_rating_items_dropped(ray_session):
    df = pd.DataFrame({
        "item": [0, 0, 0, 1],  # item 1 has one rating -> dropped
        "label": ["a", "a", "b", "a"],
    })
    out = fleiss_kappa(_resp_ds(df, 2), item_col="item",
                       label_col="label").to_pandas()
    assert out.loc[0, "n_items"] == 1 and out.loc[0, "n_ratings"] == 3


def _planted_responses(seed: int = 3):
    """30 items, 6 raters: 4 reliable (flip 10%), 2 adversarial (always
    cyclic-shift the truth). Returns (responses df, truth array)."""
    rng = np.random.default_rng(seed)
    labs = np.array(["x", "y", "z"])
    truth = labs[rng.integers(0, 3, 30)]
    rows = []
    for i, t in enumerate(truth):
        ti = np.where(labs == t)[0][0]
        for a in range(4):
            lab = t if rng.random() > 0.1 else labs[(ti + 1) % 3]
            rows.append((i, a, lab))
        for a in (4, 5):
            rows.append((i, a, labs[(ti + 1) % 3]))
    return pd.DataFrame(rows, columns=["item", "rater", "label"]), truth


def test_dawid_skene_recovers_planted_truth(ray_session):
    df, truth = _planted_responses()
    out = (dawid_skene(_resp_ds(df, 4), item_col="item",
                       annotator_col="rater", label_col="label")
           .to_pandas().sort_values("item").reset_index(drop=True))
    # EM downweights the two systematically-wrong raters: >= 28/30 items
    # recovered even though raw majority is only 4-vs-2 with 10% noise
    assert (out["label_hat"].to_numpy() == truth).sum() >= 28
    assert (out["n_resp"] == 6).all()
    assert ((out["confidence"] > 0) & (out["confidence"] <= 1)).all()


def test_dawid_skene_partition_invariance(ray_session):
    df, _ = _planted_responses(seed=11)
    a = (dawid_skene(_resp_ds(df, 2), item_col="item",
                     annotator_col="rater", label_col="label")
         .to_pandas().sort_values("item").reset_index(drop=True))
    b = (dawid_skene(_resp_ds(df, 9), item_col="item",
                     annotator_col="rater", label_col="label",
                     num_buckets=5)
         .to_pandas().sort_values("item").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
