"""HyperLogLog distinct sketch: accuracy vs exact, determinism, merge paths."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from featherstore_ray.stages.sketch import hll_distinct

EVENTS = "/root/testdata/sf0.01/events.parquet"


def test_hll_accuracy_vs_exact(ray_session):
    t = pq.read_table(EVENTS, columns=["event_type", "user_id"])
    exact = (
        t.to_pandas().groupby("event_type")["user_id"].nunique().to_dict()
    )
    approx = hll_distinct(
        ray.data.from_arrow(t), ["event_type"], "user_id", precision=12
    ).set_index("event_type")["approx_distinct"].to_dict()
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(3, 0.05 * e), (k, approx[k], e)


def test_hll_large_cardinality(ray_session):
    n = 200_000
    t = pa.table(
        {
            "g": pa.array(np.zeros(n, dtype=np.int64)),
            "v": pa.array(np.arange(n, dtype=np.int64)),  # all distinct
        }
    )
    out = hll_distinct(ray.data.from_arrow(t), ["g"], "v", precision=12)
    est = int(out["approx_distinct"].iloc[0])
    assert abs(est - n) <= 0.05 * n, est


def test_hll_deterministic_and_shuffle_final(ray_session):
    t = pq.read_table(EVENTS, columns=["event_type", "user_id"])
    a = hll_distinct(ray.data.from_arrow(t), ["event_type"], "user_id")
    b = hll_distinct(ray.data.from_arrow(t), ["event_type"], "user_id")
    pd.testing.assert_frame_equal(a, b)
    c = (
        hll_distinct(
            ray.data.from_arrow(t), ["event_type"], "user_id",
            final="shuffle", num_buckets=4,
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a.sort_values("event_type").reset_index(drop=True), c,
        check_dtype=False,
    )


def test_hll_null_group_keys_dont_corrupt(ray_session):
    # null keys factorize to -1; pre-fix they scatter-minned into the LAST
    # group's register row. The null group is dropped; real groups exact.
    n = 3000
    g = np.array(["a"] * 1000 + ["z"] * 1000 + [None] * 1000, dtype=object)
    t = pa.table(
        {
            "g": pa.array(g),
            "v": pa.array(np.arange(n, dtype=np.int64) % 40),
        }
    )
    out = hll_distinct(ray.data.from_arrow(t), ["g"], "v", precision=12)
    got = out.set_index("g")["approx_distinct"].to_dict()
    assert None not in got and np.nan not in got
    for k in ("a", "z"):
        assert abs(got[k] - 40) <= 2, got


def test_hll_multi_key_groups(ray_session):
    import pyarrow.compute as pc

    t = pq.read_table(EVENTS, columns=["event_type", "user_id"])
    t = t.append_column(
        "half", pc.cast(pc.greater(t["user_id"], 75), pa.int64())
    )
    out = hll_distinct(
        ray.data.from_arrow(t), ["event_type", "half"], "user_id"
    ).set_index(["event_type", "half"])["approx_distinct"]
    exact = t.to_pandas().groupby(["event_type", "half"])["user_id"].nunique()
    assert set(out.index) == set(exact.index)
    for k, e in exact.items():
        assert abs(int(out[k]) - e) <= max(3, 0.05 * e), (k, int(out[k]), e)


# -- grouped_quantiles_sketch -----------------------------------------------


def test_quantile_sketch_accuracy_vs_exact(ray_session):
    from featherstore_ray.stages.misc import grouped_quantiles
    from featherstore_ray.stages.sketch import grouped_quantiles_sketch

    t = pq.read_table(EVENTS, columns=["event_type", "value"])
    qs = (0.1, 0.5, 0.9, 0.99)
    exact = (
        grouped_quantiles(
            ray.data.from_arrow(t), ["event_type"], "value", quantiles=qs
        )
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    approx = grouped_quantiles_sketch(
        ray.data.from_arrow(t).repartition(8),  # force multi-batch merge
        ["event_type"],
        "value",
        quantiles=qs,
        compression=200,
    ).set_index("event_type").sort_index()
    assert list(exact.index) == list(approx.index)
    spread = float(t["value"].to_pandas().std())
    for q in qs:
        col = f"value_p{int(q * 100)}"
        err = (exact[col] - approx[col]).abs().max()
        assert err <= 0.05 * spread, (col, err, spread)


def test_quantile_sketch_deterministic_and_shuffle_final(ray_session):
    from featherstore_ray.stages.sketch import grouped_quantiles_sketch

    t = pq.read_table(EVENTS, columns=["event_type", "value"])
    a = grouped_quantiles_sketch(
        ray.data.from_arrow(t), ["event_type"], "value", quantiles=(0.5, 0.9)
    )
    b = grouped_quantiles_sketch(
        ray.data.from_arrow(t), ["event_type"], "value", quantiles=(0.5, 0.9)
    )
    pd.testing.assert_frame_equal(a, b)
    c = (
        grouped_quantiles_sketch(
            ray.data.from_arrow(t), ["event_type"], "value",
            quantiles=(0.5, 0.9), final="shuffle", num_buckets=4,
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a.sort_values("event_type").reset_index(drop=True), c,
        check_dtype=False,
    )


def test_quantile_sketch_hot_group_exactish_tails(ray_session):
    # one group, 300k rows: partials stay tiny; tails track the exact value
    from featherstore_ray.stages.sketch import grouped_quantiles_sketch

    n = 300_000
    rng = np.random.default_rng(3)
    v = rng.normal(0, 1, n)
    t = pa.table(
        {"g": pa.array(np.zeros(n, np.int64)), "v": pa.array(v)}
    )
    out = grouped_quantiles_sketch(
        ray.data.from_arrow(t).repartition(16), ["g"], "v",
        quantiles=(0.001, 0.5, 0.999), compression=200,
    )
    for q in (0.001, 0.5, 0.999):
        exact = np.quantile(v, q)
        got = out[f"v_p{int(q * 100)}" if q >= 0.01 else "v_p0"].iloc[0]
        assert abs(got - exact) < 0.05, (q, got, exact)


def test_heavy_hitters_zipf_exact_topk(ray_session):
    # distinct keys >> capacity: the MG truncation path actually runs, and
    # the recount still restores the EXACT SQL top-k (Zipf head clears the
    # n/(capacity+1) survival bound)
    import duckdb

    from featherstore_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(7)
    keys = rng.zipf(1.3, size=200_000).astype(np.int64)
    assert len(np.unique(keys)) > 4 * 256  # truncation is exercised
    t = pa.table({"k": pa.array(keys)})
    got = heavy_hitters(
        ray.data.from_arrow(t).repartition(8), "k", k=10, capacity=256
    )
    exp = duckdb.connect().execute(
        "SELECT k, count(*) AS n FROM t GROUP BY k "
        "ORDER BY n DESC, k LIMIT 10"
    ).df()
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()


def test_heavy_hitters_nulls_and_no_recount_bound(ray_session):
    from featherstore_ray.stages.sketch import heavy_hitters

    t = pa.table({"s": pa.array(["a", "b", "a", None, "c", "a", "b", None])})
    got = heavy_hitters(ray.data.from_arrow(t), "s", k=2, capacity=16)
    assert got.to_dict("records") == [
        {"s": "a", "n": 3}, {"s": "b", "n": 2}
    ]
    # recount=False returns LOWER BOUNDS (MG counters under-count)
    rng = np.random.default_rng(3)
    keys = rng.zipf(1.5, size=50_000).astype(np.int64)
    t2 = pa.table({"k": pa.array(keys)})
    lb = heavy_hitters(
        ray.data.from_arrow(t2).repartition(4), "k",
        k=3, capacity=64, recount=False,
    )
    true = pd.Series(keys).value_counts()
    for _, row in lb.iterrows():
        assert row["n"] <= true[row["k"]]
    assert lb["k"].iloc[0] == true.index[0]  # head key still ranks first


def test_cms_frequencies_bounds_and_merge_invariance(ray_session):
    from featherstore_ray.stages.sketch import cms_frequencies

    rng = np.random.default_rng(13)
    # zipf-ish: a few heavy keys + a long tail
    keys = np.concatenate([
        np.repeat(["hot_a", "hot_b", "hot_c"], [5000, 3000, 1000]),
        np.array([f"tail{i}" for i in rng.integers(0, 2000, 4000)]),
    ])
    t = pa.table({"k": rng.permutation(keys)})
    true = pd.Series(keys).value_counts()
    probe = ["hot_a", "hot_b", "hot_c", "tail5", "never_seen"]

    est = cms_frequencies(
        ray.data.from_arrow(t).repartition(6), "k", probe,
        depth=4, width=4096,
    ).set_index("k")["est"]
    n = len(keys)
    for p in probe:
        tv = int(true.get(p, 0))
        assert est[p] >= tv, (p, est[p], tv)          # one-sided
        assert est[p] <= tv + int(np.e / 4096 * n) + 1  # ε·N overcount bound
    # heavy keys essentially exact at this width
    assert est["hot_a"] == 5000 and est["hot_b"] == 3000

    # merge associativity: result independent of blocking
    est2 = cms_frequencies(
        ray.data.from_arrow(t).repartition(13), "k", probe,
        depth=4, width=4096,
    ).set_index("k")["est"]
    pd.testing.assert_series_equal(est, est2)


# -- decayed top-k -----------------------------------------------------------


def _exact_decayed(t, key_col, ts_col, half_life_s, t_ref):
    import numpy as np
    import pandas as pd

    df = pd.DataFrame({"k": t[key_col].to_pandas(),
                       "ts": t[ts_col].to_pandas()}).dropna()
    sec = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) / 1e6
    df["w"] = np.exp2((sec - t_ref) / half_life_s)
    return df.groupby("k")["w"].sum().sort_values(ascending=False)


def test_decayed_topk_exact_with_recount(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from featherstore_ray.stages.sketch import decayed_topk

    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["user_id", "ts"])
    t_ref = float(np.datetime64("2024-02-01", "us").astype(np.int64)) / 1e6
    hl = 86_400.0
    exact = _exact_decayed(t, "user_id", "ts", hl, t_ref)
    out = decayed_topk(ray.data.from_arrow(t), "user_id", "ts", k=10,
                       half_life_s=hl, t_ref=t_ref, capacity=4096)
    ref = exact.round(6).reset_index()
    ref.columns = ["user_id", "score"]
    ref = (ref.sort_values(["score", "user_id"], ascending=[False, True],
                           kind="stable").head(10).reset_index(drop=True))
    assert out["user_id"].tolist() == ref["user_id"].tolist()
    assert np.allclose(out["score"], ref["score"], atol=2e-6)


def test_decayed_topk_error_bound_small_capacity(ray_session):
    """Misra-Gries under decay: every surviving counter under-counts by at
    most (total decayed mass)/(capacity+1)."""
    import numpy as np
    import pyarrow.parquet as pq

    from featherstore_ray.stages.sketch import decayed_topk

    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["user_id", "ts"])
    t_ref = float(np.datetime64("2024-02-01", "us").astype(np.int64)) / 1e6
    hl = 7 * 86_400.0
    cap = 8
    exact = _exact_decayed(t, "user_id", "ts", hl, t_ref)
    bound = exact.sum() / (cap + 1)
    out = decayed_topk(ray.data.from_arrow(t).repartition(4), "user_id",
                       "ts", k=cap, half_life_s=hl, t_ref=t_ref,
                       capacity=cap, recount=False)
    for _, row in out.iterrows():
        err = exact[row["user_id"]] - row["score"]
        assert -1e-6 <= err <= bound + 1e-6


def test_decayed_state_fold_equals_batch(ray_session):
    """Folding micro-batches through DecayedTopKState == one-shot
    decayed_topk (merge associativity)."""
    import numpy as np
    import pyarrow.parquet as pq

    from featherstore_ray.stages.sketch import DecayedTopKState, decayed_topk

    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["user_id", "ts"])
    hl = 86_400.0
    st = DecayedTopKState("user_id", "ts", half_life_s=hl, capacity=4096)
    for lo in range(0, t.num_rows, 97):
        st.update(t.slice(lo, 97))
    top = st.topk(10)
    top["w"] = top["w"].round(6)
    batch = decayed_topk(ray.data.from_arrow(t), "user_id", "ts", k=10,
                         half_life_s=hl, capacity=4096)
    assert top["k"].tolist() == batch["user_id"].tolist()
    assert np.allclose(top["w"], batch["score"], atol=2e-6)


def test_decayed_topk_validates_half_life(ray_session):
    import pyarrow as pa
    import pytest as _pytest

    from featherstore_ray.stages.sketch import DecayedTopKState, decayed_topk

    t = pa.table({"k": [1], "ts": pa.array([0], pa.timestamp("us"))})
    with _pytest.raises(ValueError, match="half_life"):
        decayed_topk(ray.data.from_arrow(t), "k", "ts", half_life_s=0)
    with _pytest.raises(ValueError, match="half_life"):
        DecayedTopKState("k", "ts", half_life_s=-1.0)
