"""ips_policy_eval: hand-computed reference, null handling, empty input."""

import numpy as np
import pandas as pd
import ray.data

from featherstore_ray.stages.policy import ips_policy_eval


def _run(df: pd.DataFrame) -> pd.DataFrame:
    return ips_policy_eval(
        ray.data.from_pandas(df).repartition(3),
        context_col="ctx", action_col="act", reward_col="r",
    ).to_pandas().set_index("policy_shift")


def test_ips_hand_computed():
    # actions sorted: a(idx0, cnt2), b(idx1, cnt1), c(idx2, cnt1); N=4, k=3
    df = pd.DataFrame({
        "ctx": [0, 1, 2, 3],
        "act": ["a", "b", "a", "c"],
        "r": [1.0, 2.0, 3.0, 4.0],
    })
    out = _run(df)
    # shift per row: (aidx - ctx) mod 3 -> (0-0)=0, (1-1)=0, (0-2)=1, (2-3)=2
    assert out.loc[0, "n_matched"] == 2
    assert out.loc[1, "n_matched"] == 1
    assert out.loc[2, "n_matched"] == 1
    mu_a, mu_b, mu_c = 2 / 4, 1 / 4, 1 / 4
    ips0 = (1.0 / mu_a + 2.0 / mu_b) / 4
    snips0 = (1.0 / mu_a + 2.0 / mu_b) / (1 / mu_a + 1 / mu_b)
    assert abs(out.loc[0, "ips"] - round(ips0, 6)) < 1e-9
    assert abs(out.loc[0, "snips"] - round(snips0, 6)) < 1e-9
    assert abs(out.loc[1, "ips"] - round(3.0 / mu_a / 4, 6)) < 1e-9


def test_ips_nulls_excluded_and_empty():
    df = pd.DataFrame({
        "ctx": [0, 1, None, 2],
        "act": ["a", None, "a", "a"],
        "r": [1.0, 2.0, 3.0, None],
    })
    out = _run(df)
    # only row 0 survives; k=1 so shift 0, mu=1, ips = 1/1/1
    assert list(out.index) == [0]
    assert out.loc[0, "n_matched"] == 1
    assert out.loc[0, "ips"] == 1.0

    empty = pd.DataFrame({"ctx": pd.Series([], dtype="int64"),
                          "act": pd.Series([], dtype="object"),
                          "r": pd.Series([], dtype="float64")})
    out2 = ips_policy_eval(
        ray.data.from_pandas(empty),
        context_col="ctx", action_col="act", reward_col="r",
    )
    # typed empty result (Ray's to_pandas drops empty-dataset schemas,
    # so assert on the Arrow schema instead)
    import pyarrow as pa

    assert out2.count() == 0
    assert "ips" in pa.schema(out2.schema().base_schema).names
