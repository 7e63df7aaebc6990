"""decision_stump: hand-computable splits + degenerate-input contracts."""

import numpy as np
import pandas as pd
import ray.data

from featherstore_ray.stages.tree import decision_stump


def test_stump_perfect_split():
    # y is a step function of x: any threshold between 4 and 5 is perfect.
    df = pd.DataFrame({
        "x": [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
        "y": [0.0, 0.0, 0.0, 0.0, 0.0, 10.0, 10.0, 10.0],
    })
    out = decision_stump(
        ray.data.from_pandas(df), ["x"], "y", num_bins=8
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # bins are width (7-0)/8 = 0.875; x=4.0 -> bin 4, x=5.0 -> bin 5.
    assert r["split_bin"] == 4
    assert r["n_left"] == 5 and r["n_right"] == 3
    assert r["left_mean"] == 0.0 and r["right_mean"] == 10.0
    # gain = total SSE / n = var(y) = (5*3/64)*100 ... just check positivity
    # and that it equals the population variance of y (perfect split).
    assert abs(r["gain"] - np.var(df["y"].to_numpy())) < 1e-9


def test_stump_constant_feature_and_nulls():
    df = pd.DataFrame({
        "flat": [3.0] * 6,
        "x": [1.0, 2.0, 3.0, 4.0, None, 6.0],
        "y": [0.0, 0.0, 1.0, 1.0, 1.0, None],
    })
    out = decision_stump(
        ray.data.from_pandas(df), ["flat", "x"], "y", num_bins=4
    ).to_pandas()
    # constant feature emits no row; x drops its null row and y's null row
    assert list(out["feature"]) == ["x"]
    assert out.iloc[0]["n_left"] + out.iloc[0]["n_right"] == 4


def test_stump_tie_takes_smallest_bin():
    # symmetric y: splits at bin 0 and bin 2 give identical gain
    df = pd.DataFrame({
        "x": [0.0, 1.0, 2.0, 3.0],
        "y": [1.0, 0.0, 0.0, 1.0],
    })
    out = decision_stump(
        ray.data.from_pandas(df), ["x"], "y", num_bins=4
    ).to_pandas()
    assert out.iloc[0]["split_bin"] == 0


def test_stump_batch_invariance():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "a": rng.normal(size=500),
        "b": rng.uniform(size=500),
        "y": rng.normal(size=500),
    })
    one = decision_stump(
        ray.data.from_pandas(df), ["a", "b"], "y"
    ).to_pandas()
    many = decision_stump(
        ray.data.from_pandas(df).repartition(7), ["a", "b"], "y"
    ).to_pandas()
    pd.testing.assert_frame_equal(
        one.sort_values("feature").reset_index(drop=True),
        many.sort_values("feature").reset_index(drop=True),
    )


def test_boosted_stumps_reduces_sse():
    from featherstore_ray.stages.tree import boosted_stumps

    rng = np.random.default_rng(11)
    x1 = rng.uniform(size=600)
    x2 = rng.uniform(size=600)
    y = np.where(x1 > 0.5, 3.0, -1.0) + 0.5 * x2 + rng.normal(
        scale=0.05, size=600)
    df = pd.DataFrame({"x1": x1, "x2": x2, "y": y})
    model = boosted_stumps(
        ray.data.from_pandas(df).repartition(4), ["x1", "x2"], "y",
        rounds=5, lr=0.5, num_bins=16,
    ).to_pandas()
    assert len(model) == 5
    assert (model["gain"] > 0).all()
    assert list(model["round"]) == [1, 2, 3, 4, 5]
    # apply the model: residual SSE must drop well below base variance
    base = y.mean()
    pred = np.full_like(y, base)
    lo = {f: df[f].min() for f in ("x1", "x2")}
    hi = {f: df[f].max() for f in ("x1", "x2")}
    for _, r in model.iterrows():
        f = r["feature"]
        b = np.clip(np.floor((df[f] - lo[f]) * 16 / (hi[f] - lo[f])),
                    0, 15)
        pred += 0.5 * np.where(b <= r["split_bin"], r["left_value"],
                               r["right_value"])
    sse_model = ((y - pred) ** 2).sum()
    sse_base = ((y - base) ** 2).sum()
    assert sse_model < 0.25 * sse_base
