"""naive_bayes: separable-corpus accuracy + batch invariance."""

import pandas as pd
import ray.data

from featherstore_ray.stages.nbayes import naive_bayes


def _corpus():
    # two trivially separable "languages"
    en = ["the cat sat on the mat", "the dog ate the food",
          "a cat and a dog", "the mat was red"]
    fr = ["le chat est sur le tapis", "le chien mange la nourriture",
          "un chat et un chien", "le tapis est rouge"]
    rows = []
    for i, t in enumerate(en):
        rows.append({"doc_id": i, "text": t, "lang": "en"})
    for i, t in enumerate(fr):
        rows.append({"doc_id": 100 + i, "text": t, "lang": "fr"})
    rows.append({"doc_id": 200, "text": "le chat sat", "lang": None})
    return pd.DataFrame(rows)


def test_nb_separates_and_scores_unlabeled():
    out = naive_bayes(
        ray.data.from_pandas(_corpus()), vocab_size=64
    ).to_pandas().set_index("doc_id")
    assert (out.loc[:3, "pred_lang"] == "en").all()
    assert (out.loc[100:103, "pred_lang"] == "fr").all()
    # the unlabeled doc is still scored (2 french tokens vs 1 english)
    assert out.loc[200, "pred_lang"] == "fr"
    assert (out["score"] < 0).all()


def test_nb_batch_invariance():
    df = _corpus()
    one = naive_bayes(ray.data.from_pandas(df)).to_pandas()
    many = naive_bayes(
        ray.data.from_pandas(df).repartition(5)
    ).to_pandas()
    pd.testing.assert_frame_equal(
        one.sort_values("doc_id").reset_index(drop=True),
        many.sort_values("doc_id").reset_index(drop=True),
    )
