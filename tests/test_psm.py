"""psm_att: brute-force matching parity on a random embedding table."""

import numpy as np
import pandas as pd
import ray.data

from featherstore_ray.stages.ann import logreg_train, psm_att


def _table(n=120, d=8, seed=3):
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)).astype(np.float32)
    lab = (rng.uniform(size=n) < 0.4).astype(np.int32)  # label 0 = treated
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(X.ravel()), d).cast(pa.list_(pa.float32())),
        "label": pa.array(lab),
    })
    return tbl


def _brute(df, w, outcome_dim=1):
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    p = np.round(1.0 / (1.0 + np.exp(-(X @ w))), 6)
    y = X[:, outcome_dim]
    tr = df["label"].to_numpy() == 0
    ids = df["vec_id"].to_numpy()
    diffs, dists = [], []
    for i in np.flatnonzero(tr):
        cand = np.flatnonzero(~tr)
        d = np.abs(p[cand] - p[i])
        # min distance, then min vec_id
        order = np.lexsort((ids[cand], d))
        j = cand[order[0]]
        diffs.append(y[i] - y[j])
        dists.append(abs(p[i] - p[j]))
    return (round(float(np.mean(diffs)), 6), round(float(np.mean(dists)), 6),
            int(tr.sum()), int((~tr).sum()))


def test_psm_att_matches_bruteforce():
    tbl = _table()
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = psm_att(ds, outcome_dim=1, treat_label=0, iters=3, lr=0.5
                  ).to_pandas().iloc[0]
    w = (
        logreg_train(ray.data.from_arrow(tbl), positive_label=0,
                     iters=3, lr=0.5)
        .to_pandas().sort_values("j")["weight"].to_numpy()
    )
    df = pd.DataFrame({
        "vec_id": tbl["vec_id"].to_numpy(),
        "embedding": [np.asarray(v) for v in tbl["embedding"].to_pylist()],
        "label": tbl["label"].to_numpy(),
    })
    att, dist, nt, nc = _brute(df, w)
    assert out["n_treat"] == nt and out["n_control"] == nc
    assert abs(out["att"] - att) < 2e-6
    assert abs(out["mean_match_dist"] - dist) < 2e-6
