"""als_rank1: pure-numpy reference parity + residual decrease."""

import numpy as np
import pandas as pd
import ray.data

from featherstore_ray.stages.mf import als_rank1


def _numpy_als(df, iters):
    users = np.sort(df["u"].unique())
    items = np.sort(df["i"].unique())
    ui = np.searchsorted(users, df["u"].to_numpy())
    ii = np.searchsorted(items, df["i"].to_numpy())
    r = df["v"].to_numpy(dtype=np.float64)
    v = np.ones(len(items))
    for _ in range(iters):
        num = np.bincount(ui, r * v[ii], minlength=len(users))
        den = np.bincount(ui, v[ii] ** 2, minlength=len(users))
        u = num / den
        num = np.bincount(ii, r * u[ui], minlength=len(items))
        den = np.bincount(ii, u[ui] ** 2, minlength=len(items))
        v = num / den
    num = np.bincount(ui, r * v[ii], minlength=len(users))
    den = np.bincount(ui, v[ii] ** 2, minlength=len(users))
    u = num / den
    return users, u, items, v, ui, ii, r


def test_als_rank1_matches_numpy_reference():
    rng = np.random.default_rng(11)
    n = 300
    df = pd.DataFrame({
        "u": rng.integers(0, 20, n),
        "i": rng.choice(list("abcdef"), n),
        "v": rng.uniform(1, 10, n),
    })
    out = als_rank1(
        ray.data.from_pandas(df).repartition(4), "u", "i", "v",
        iters=3, num_buckets=8,
    ).to_pandas()
    users, u, items, v, ui, ii, r = _numpy_als(df, 3)
    got_u = out[out["kind"] == "user"].set_index("entity")["factor"]
    got_v = out[out["kind"] == "item"].set_index("entity")["factor"]
    for k, exp in zip(users, u):
        assert abs(got_u[str(k)] - round(exp, 6)) < 1e-6
    for k, exp in zip(items, v):
        assert abs(got_v[str(k)] - round(exp, 6)) < 1e-6
    # factorization quality: rank-1 fit beats the zero predictor
    pred = u[ui] * v[ii]
    assert ((r - pred) ** 2).sum() < (r ** 2).sum()


def test_als_rank1_exact_on_true_rank1_matrix():
    # a genuinely rank-1 matrix is recovered exactly (up to scale)
    users = np.arange(6)
    items = np.array(["x", "y", "z"])
    uf = np.array([1.0, 2.0, 3.0, 0.5, 4.0, 1.5])
    vf = np.array([2.0, 1.0, 3.0])
    rows = [(u, i, uf[a] * vf[b]) for a, u in enumerate(users)
            for b, i in enumerate(items)]
    df = pd.DataFrame(rows, columns=["u", "i", "v"])
    out = als_rank1(
        ray.data.from_pandas(df).repartition(2), "u", "i", "v",
        iters=2, num_buckets=4,
    ).to_pandas()
    gu = out[out["kind"] == "user"].set_index("entity")["factor"]
    gv = out[out["kind"] == "item"].set_index("entity")["factor"]
    pred = np.array([[gu[str(u)] * gv[i] for i in items] for u in users])
    true = np.outer(uf, vf)
    assert np.allclose(pred, true, atol=1e-4)
