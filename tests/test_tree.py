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
