"""Behavioral gates for the round-5 third-session families.

The sf0.001 oracle sweep (test_entry_contract) certifies cross-engine
equality; these tests pin the SEMANTICS on planted inputs — the oracle
can't tell "both engines wrong the same way" from "right".
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _ds(df: pd.DataFrame) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(3)


# ---------------------------------------------------------------- bh_fdr


def test_bh_fdr_rejections_are_prefix_of_rank_order():
    from featherstore_ray.stages.aggregate import bh_fdr

    rng = np.random.default_rng(7)
    rows = []
    for g in range(12):
        # groups 0-2 get a real shift, the rest don't
        shift = 5.0 if g < 3 else 0.0
        for i in range(40):
            rows.append((g, "a", float(rng.normal(shift, 1.0))))
            rows.append((g, "b", float(rng.normal(0.0, 1.0))))
    df = pd.DataFrame(rows, columns=["g", "lab", "v"])
    out = bh_fdr(_ds(df), "g", "v", "lab", "a", "b", alpha=0.3).to_pandas()
    out = out.sort_values("p_rank")
    rej = out["rejected"].to_numpy()
    # rejections form a prefix of the p-value ranking (BH definition)
    k = int(rej.sum())
    assert (rej[:k] == 1).all() and (rej[k:] == 0).all()
    # the three shifted groups are all rejected
    assert set(out.loc[out["rejected"] == 1, "g"]) >= {0, 1, 2}


# ------------------------------------------------------------- esd


def test_esd_outliers_finds_planted_extremes_despite_masking():
    from featherstore_ray.stages.aggregate import esd_outliers

    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, 200)
    base[0], base[1] = 60.0, 55.0  # two big outliers mask each other
    df = pd.DataFrame({
        "g": ["x"] * 200,
        "v": base,
        "id": np.arange(200, dtype=np.int64),
    })
    out = esd_outliers(_ds(df), "g", "v", "id",
                       lambdas=(3.5, 3.5, 3.5)).to_pandas()
    flagged = set(out.loc[out["is_outlier"] == 1, "id"])
    assert {0, 1} <= flagged
    # sticky count: outliers are exactly rounds 1..k
    assert sorted(out.loc[out["is_outlier"] == 1, "rnd"]) == list(
        range(1, len(flagged) + 1))


# ------------------------------------------------------------ ransac


def test_ransac_recovers_consensus_line_under_outliers():
    from featherstore_ray.stages.aggregate import ransac_line

    rng = np.random.default_rng(11)
    n = 400
    x = rng.uniform(0, 50, n)
    y = 3.0 * x + 10.0 + rng.normal(0, 0.5, n)
    y[:60] += rng.uniform(200, 400, 60)  # 15% wild outliers
    df = pd.DataFrame({"rid": np.arange(n, dtype=np.int64),
                       "x": x, "y": y})
    out = ransac_line(_ds(df), "rid", "x", "y",
                      num_candidates=8, eps=3.0).to_pandas()
    best = out[out["is_best"] == 1].iloc[0]
    # consensus line is the true one, not the OLS-dragged one
    assert abs(best["b"] - 3.0) < 0.3
    assert best["inliers"] > 0.6 * n


# -------------------------------------------------------------- sprt


def test_sprt_decision_is_sticky_and_correct_direction():
    from featherstore_ray.stages.aggregate import sprt_test

    rng = np.random.default_rng(5)
    days = pd.date_range("2024-01-01", periods=40, freq="D")
    rows = []
    for d in days:
        for _ in range(200):
            rows.append((d, int(rng.random() < 0.3)))
    df = pd.DataFrame(rows, columns=["ts", "ok"])
    out = sprt_test(_ds(df), "ts", "ok", p0=0.2, p1=0.3).to_pandas()
    out = out.sort_values("day").reset_index(drop=True)
    states = out["state"].to_list()
    assert states[-1] == "accept_h1"
    first = states.index("accept_h1")
    assert all(s == "accept_h1" for s in states[first:])
    assert all(s == "continue" for s in states[:first])


# -------------------------------------------------------- knn_shapley


def test_knn_shapley_values_same_label_neighbors():
    from featherstore_ray.stages.ann import knn_shapley

    rng = np.random.default_rng(2)
    # two tight clusters; labels match clusters; one mislabeled point
    a = rng.normal(0, 0.05, (30, 4)) + np.array([1, 0, 0, 0])
    b = rng.normal(0, 0.05, (30, 4)) - np.array([1, 0, 0, 0])
    X = np.vstack([a, b]).astype(np.float32)
    lab = np.array([0] * 30 + [1] * 30, np.int64)
    lab[0] = 1  # poison: nearest cluster-0 point carries label 1
    test = pa.table({
        "vec_id": pa.array([1000], pa.int64()),
        "embedding": pa.array([np.array([1, 0, 0, 0], np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array([0], pa.int64()),
    })
    # plain list_ column: from_pandas would tensor-cast ndarray cells
    train = pa.table({
        "vec_id": pa.array(np.arange(60, dtype=np.int64)),
        "embedding": pa.array([v for v in X], pa.list_(pa.float32())),
        "label": pa.array(lab),
    })
    ds = ray.data.from_arrow(train).repartition(3)
    out = knn_shapley(ds, test, k=3).to_pandas()
    sh = out.set_index("vec_id")["shapley"]
    # efficiency-style sanity: correct-label near neighbors are worth
    # more than the poisoned point, which must be NEGATIVE
    assert sh[0] < 0
    good_near = out[(out["rnk"] <= 5) & (out["vec_id"] != 0)]["vec_id"]
    assert (sh[good_near] > 0).all()


# ------------------------------------------------------ markov chain


def test_markov_stationary_deterministic_cycle_is_uniform():
    from featherstore_ray.stages.window import markov_stationary

    # a->b->c->a cycle replayed by many entities: after any number of
    # steps from uniform, the distribution stays uniform
    rows = []
    for e in range(9):
        for i, t in enumerate(["a", "b", "c"] * 4):
            rows.append((e, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=i), t, e * 100 + i))
    df = pd.DataFrame(rows, columns=["e", "ts", "t", "tb"])
    out = markov_stationary(
        _ds(df), entity_col="e", ts_col="ts", type_col="t",
        tiebreak="tb", iters=7).to_pandas()
    assert len(out) == 3
    # prob is rounded to 6dp for the oracle mirror
    np.testing.assert_allclose(out["prob"], 1 / 3, atol=1e-6)


# ------------------------------------------------------------- hurst


def test_hurst_trending_beats_alternating():
    from featherstore_ray.stages.window import hurst

    n = 256
    ts = pd.date_range("2024-01-01", periods=n, freq="h")
    trend = np.cumsum(np.ones(n))          # perfectly persistent
    alt = np.tile([1.0, -1.0], n // 2)     # perfectly anti-persistent
    df = pd.DataFrame({
        "e": np.repeat([1, 2], n),
        "ts": np.tile(ts, 2),
        "v": np.concatenate([trend, alt]),
        "tb": np.arange(2 * n, dtype=np.int64),
    })
    out = hurst(_ds(df), entity_col="e", ts_col="ts", value_col="v",
                tiebreak="tb").to_pandas().set_index("e")
    assert out.loc[1, "hurst"] > 0.9
    assert out.loc[2, "hurst"] < 0.3


# -------------------------------------------------------------- sax


def test_sax_word_tracks_shape():
    from featherstore_ray.stages.window import sax_symbols

    ts = pd.date_range("2024-01-01", periods=32, freq="h")
    # low plateau then high plateau -> word like aaaa dddd (seg_len 8)
    v = np.concatenate([np.full(16, -1.0), np.full(16, 1.0)])
    v += np.linspace(0, 0.01, 32)  # break zero variance, keep order
    df = pd.DataFrame({"e": 1, "ts": ts, "v": v,
                       "tb": np.arange(32, dtype=np.int64)})
    out = sax_symbols(_ds(df), entity_col="e", ts_col="ts", value_col="v",
                      tiebreak="tb", seg_len=8).to_pandas()
    word = out.iloc[0]["word"]
    assert out.iloc[0]["n_segs"] == 4
    assert word[:2] == "aa" and word[-2:] == "dd"


# ---------------------------------------------------- fellegi-sunter


def test_fellegi_sunter_weights_order_by_discriminativeness():
    from featherstore_ray.stages.linkage import fellegi_sunter

    rng = np.random.default_rng(9)
    rows = []
    for e in range(60):
        stable = f"s{e % 30}"            # semi-identifying field
        for r in range(3):
            noisy = f"n{rng.integers(0, 3)}"  # 3-value noise field
            rows.append((e, stable, noisy))
    df = pd.DataFrame(rows, columns=["e", "stable", "noisy"])
    out = fellegi_sunter(_ds(df), "e", ["stable", "noisy"]).to_pandas()
    out = out.set_index("field")
    # the field that always agrees within an entity but rarely across
    # entities must carry the larger agreement weight
    assert out.loc["stable", "m"] == 1.0
    assert out.loc["stable", "w_agree"] > out.loc["noisy", "w_agree"]


# ----------------------------------------------------------- skyline


def test_skyline_nd_keeps_duplicates_and_honors_directions():
    from featherstore_ray.stages.misc import skyline_nd

    df = pd.DataFrame({
        "id": np.arange(7, dtype=np.int64),
        "price": [1.0, 1.0, 2.0, 2.0, 3.0, 0.5, 5.0],
        "size":  [5,   5,   9,   4,   9,   1,   10],
    })
    # min price, max size: (0.5,1) frontier; (1,5)x2 both kept (identical
    # vectors never dominate each other); (2,9) on frontier; (2,4) is
    # dominated by (1,5); (3,9) dominated by (2,9); (5,10) frontier.
    out = skyline_nd(_ds(df), ["price", "size"],
                      directions=["min", "max"]).to_pandas()
    assert sorted(out["id"]) == [0, 1, 2, 5, 6]


def test_skyline_nd_matches_brute_force_3d():
    from featherstore_ray.stages.misc import skyline_nd, _skyline_mask

    rng = np.random.default_rng(13)
    X = rng.integers(0, 12, (300, 3)).astype(np.float64)
    df = pd.DataFrame({"id": np.arange(300, dtype=np.int64),
                       "a": X[:, 0], "b": X[:, 1], "c": X[:, 2]})
    out = skyline_nd(_ds(df), ["a", "b", "c"]).to_pandas()
    le = (X[:, None, :] <= X[None, :, :]).all(-1)
    lt = (X[:, None, :] < X[None, :, :]).any(-1)
    dominated = (le & lt).any(0)
    assert sorted(out["id"]) == sorted(np.where(~dominated)[0])
    # the chunked kernel agrees with brute force at a tiny chunk size too
    np.testing.assert_array_equal(_skyline_mask(X, chunk=17), ~dominated)


# ------------------------------------------------------------ cox_ph


def test_cox_ph_matches_subject_level_newton_and_sign():
    from featherstore_ray.stages.survival import cox_ph

    rng = np.random.default_rng(21)
    # treated (x=1) fail ~3x faster; some censoring in both arms
    n = 120
    x = np.repeat([0, 1], n // 2)
    dur = np.where(x == 1, rng.integers(1, 50, n),
                   rng.integers(40, 150, n)).astype(np.int64)
    obs = (rng.random(n) < 0.8).astype(np.int64)
    df = pd.DataFrame({"x": x, "duration": dur, "observed": obs})
    out = cox_ph(_ds(df), group_col="x", duration_col="duration",
                 observed_col="observed", iters=4).to_pandas().iloc[0]

    # independent subject-level reference: explicit risk-set loops
    beta = 0.0
    for _ in range(4):
        U = I = 0.0
        for t in np.unique(dur[obs == 1]):
            at_risk = dur >= t
            s0 = np.sum(np.exp(beta * x[at_risk]))
            s1 = np.sum(x[at_risk] * np.exp(beta * x[at_risk]))
            events = (dur == t) & (obs == 1)
            d, d1 = events.sum(), (events & (x == 1)).sum()
            p = s1 / s0
            U += d1 - d * p
            I += d * p * (1 - p)
        beta += U / I
    assert out["beta"] > 0.5  # treated hazard is clearly higher
    np.testing.assert_allclose(out["beta"], beta, atol=2e-6)
    np.testing.assert_allclose(out["hr"], np.exp(beta), atol=1e-5)


# -------------------------------------------------------- t_closeness


def test_t_closeness_flags_concentrated_class_only():
    from featherstore_ray.stages.aggregate import t_closeness

    # global domain {0,1,2}; class "mirror" matches the global mix,
    # class "conc" is all-2 (max distance), class "half" in between
    rows = ([("mirror", v) for v in [0, 1, 2] * 20]
            + [("conc", 2)] * 30
            + [("half", v) for v in [1, 2] * 15])
    df = pd.DataFrame(rows, columns=["cls", "v"])
    out = t_closeness(_ds(df), ["cls"], "v", t=0.3).to_pandas()
    out = out.set_index("cls")
    # exact ordered-EMDs: global q = [20, 35, 65]/120; cum-diff sums over
    # the m-1 = 2 interior steps, halved:
    #   conc  p=[0,0,1]       -> (20/120 + 55/120)/2 = 0.3125
    #   mirror p=[1/3,1/3,1/3] -> (20/120 + 25/120)/2 = 0.1875
    #   half  p=[0,.5,.5]      -> (20/120 +  5/120)/2 = 25/240
    np.testing.assert_allclose(out.loc["conc", "emd"], 75 / 240, atol=1e-6)
    np.testing.assert_allclose(out.loc["mirror", "emd"], 45 / 240,
                               atol=1e-6)
    np.testing.assert_allclose(out.loc["half", "emd"], 25 / 240, atol=1e-6)
    assert out.loc["conc", "is_risky"] == 1
    assert out.loc["mirror", "is_risky"] == 0
    assert out.loc["half", "is_risky"] == 0


def test_vif_detects_planted_collinearity():
    from featherstore_ray.stages.aggregate import vif

    rng = np.random.default_rng(7)
    n = 4000
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    x3 = x1 + x2 + rng.normal(scale=0.05, size=n)  # near-collinear
    ds = ray.data.from_arrow(pa.table({"x1": x1, "x2": x2, "x3": x3}))
    out = vif(ds, ["x1", "x2", "x3"]).to_pandas().set_index("col")
    # x3 is almost x1+x2: all three VIFs blow up, x3's the most
    assert out.loc["x3", "vif"] > 100
    assert out.loc["x1", "vif"] > 100
    # independent columns -> VIF ~ 1
    y = rng.normal(size=n)
    ds2 = ray.data.from_arrow(pa.table({"x1": x1, "x2": x2, "y": y}))
    out2 = vif(ds2, ["x1", "x2", "y"]).to_pandas().set_index("col")
    assert abs(out2.loc["y", "vif"] - 1.0) < 0.05


def test_vif_general_k_matches_inverse_corr_and_listwise_nulls():
    from featherstore_ray.stages.aggregate import vif

    rng = np.random.default_rng(11)
    n = 1000
    x = rng.normal(size=(n, 4))
    x[:, 3] += 0.8 * x[:, 0]
    cols = ["a", "b", "c", "d"]
    tbl = {c: x[:, i].copy() for i, c in enumerate(cols)}
    # poke nulls into one column; listwise semantics = drop those rows
    a = tbl["b"].copy()
    mask = rng.random(n) < 0.1
    a[mask] = np.nan
    tbl["b"] = a
    ds = ray.data.from_arrow(pa.table(tbl))
    out = vif(ds, cols).to_pandas().set_index("col")["vif"]
    keep = ~mask
    ref = np.diag(np.linalg.inv(np.corrcoef(x[keep].T)))
    for i, c in enumerate(cols):
        np.testing.assert_allclose(out[c], ref[i], rtol=1e-4)


def test_vif_degenerate_inputs_yield_nulls():
    from featherstore_ray.stages.aggregate import vif

    # zero-variance column
    ds = ray.data.from_arrow(pa.table({
        "a": np.arange(10.0), "b": np.ones(10), "c": np.arange(10.0) ** 2,
    }))
    out = vif(ds, ["a", "b", "c"]).to_pandas()
    assert out["vif"].isna().all()
    # exactly-collinear pair -> det ~ 0 -> nulls, not inf
    v = np.arange(20.0)
    ds2 = ray.data.from_arrow(pa.table({
        "a": v, "b": 2.0 * v, "c": np.sin(v),
    }))
    out2 = vif(ds2, ["a", "b", "c"]).to_pandas()
    assert out2["vif"].isna().all()


def test_rdd_recovers_planted_jump():
    from featherstore_ray.stages.aggregate import rdd_estimate

    rng = np.random.default_rng(3)
    n = 6000
    x = rng.uniform(0.0, 100.0, size=n)
    u = x - 50.0
    y = 2.0 + 0.5 * u + 3.0 * (u >= 0) + rng.normal(scale=0.3, size=n)
    ds = ray.data.from_arrow(pa.table({"x": x, "y": y}))
    out = rdd_estimate(ds, "x", "y", cutoff=50.0, bandwidth=20.0
                       ).to_pandas().set_index("side")
    assert abs(out.loc["right", "effect"] - 3.0) < 0.1
    assert abs(out.loc["left", "slope"] - 0.5) < 0.05
    assert abs(out.loc["right", "slope"] - 0.5) < 0.05
    # bandwidth excludes far rows
    assert out["n"].sum() < n
    # no jump -> effect ~ 0
    y2 = 2.0 + 0.5 * u + rng.normal(scale=0.3, size=n)
    ds2 = ray.data.from_arrow(pa.table({"x": x, "y": y2}))
    out2 = rdd_estimate(ds2, "x", "y", cutoff=50.0, bandwidth=20.0)
    eff = out2.to_pandas()["effect"].iloc[0]
    assert abs(eff) < 0.1


def test_rdd_degenerate_side_yields_null_effect():
    from featherstore_ray.stages.aggregate import rdd_estimate

    # all mass on the right side -> left fit undefined -> null effect
    x = np.array([10.0, 11.0, 12.0, 13.0])
    y = np.array([1.0, 2.0, 3.0, 4.0])
    ds = ray.data.from_arrow(pa.table({"x": x, "y": y}))
    out = rdd_estimate(ds, "x", "y", cutoff=5.0, bandwidth=50.0
                       ).to_pandas().set_index("side")
    assert out.loc["left", "n"] == 0
    assert np.isnan(out.loc["left", "intercept"])
    assert np.isnan(out.loc["left", "effect"])
    with pytest.raises(ValueError):
        rdd_estimate(ds, "x", "y", cutoff=5.0, bandwidth=0.0)


def test_burrows_delta_separates_styles_and_is_partition_invariant():
    from featherstore_ray.stages.text import burrows_delta

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    # authors A and A2 share a Zipf profile; B inverts it
    pA = 1.0 / np.arange(1, 31); pA /= pA.sum()
    pB = pA[::-1]
    def corpus(src, p, n_docs=40):
        return [(src, " ".join(rng.choice(vocab, size=60, p=p)))
                for _ in range(n_docs)]
    rows = corpus("authA", pA) + corpus("authA2", pA) + corpus("authB", pB)
    tbl = pa.table({"source": [r[0] for r in rows],
                    "text": [r[1] for r in rows]})
    ds = ray.data.from_arrow(tbl)
    out = (burrows_delta(ds, top_k=20).to_pandas()
           .set_index(["source_a", "source_b"])["delta"])
    assert out[("authA", "authA2")] < out[("authA", "authB")]
    assert out[("authA", "authA2")] < out[("authA2", "authB")]
    # block-boundary invariance: same result at a different partitioning
    out2 = (burrows_delta(ray.data.from_arrow(tbl).repartition(7),
                          top_k=20).to_pandas()
            .set_index(["source_a", "source_b"])["delta"])
    pd.testing.assert_series_equal(out.sort_index(), out2.sort_index())


# ---------------------------------------------------------- bradley_terry


def test_bradley_terry_recovers_dominance_order(ray_session):
    from featherstore_ray.stages.aggregate import bradley_terry

    # 30 users x 10 days; type counts per (user, day): a=3 > b=2 > c=1
    rows = []
    base = pd.Timestamp("2024-01-01")
    for u in range(30):
        for d in range(10):
            ts = base + pd.Timedelta(days=d, hours=1)
            rows += [(u, ts, "a")] * 3 + [(u, ts, "b")] * 2 + [(u, ts, "c")]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    out = (bradley_terry(_ds(df), entity_col="user_id", ts_col="ts",
                         type_col="event_type")
           .to_pandas().set_index("item"))
    assert out.loc["a", "score"] > out.loc["b", "score"] > out.loc["c", "score"]
    # a beats b and c in all 300 cells; c never wins a real comparison
    assert out.loc["a", "wins"] == 600 and out.loc["a", "losses"] == 0
    assert out.loc["c", "wins"] == 0 and out.loc["c", "losses"] == 600
    assert abs(out["score"].sum() - 1.0) < 1e-5
    # scores stay positive thanks to the pseudo-win smoothing
    assert (out["score"] > 0).all()


def test_bradley_terry_ties_produce_no_comparisons(ray_session):
    from featherstore_ray.stages.aggregate import bradley_terry

    base = pd.Timestamp("2024-03-01")
    df = pd.DataFrame({
        "user_id": [1, 1, 2, 2],
        "ts": [base] * 4,
        "event_type": ["x", "y", "x", "y"],  # equal counts everywhere
    })
    out = (bradley_terry(_ds(df), entity_col="user_id", ts_col="ts",
                         type_col="event_type").to_pandas())
    assert out.empty  # no strict winner anywhere -> no items


def test_bradley_terry_partition_invariance(ray_session):
    from featherstore_ray.stages.aggregate import bradley_terry

    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 14 * 24, n), unit="h"),
        "event_type": rng.choice(["a", "b", "c", "d"], n,
                                 p=[0.4, 0.3, 0.2, 0.1]),
    })
    a = (bradley_terry(ray.data.from_pandas(df).repartition(2),
                       entity_col="user_id", ts_col="ts",
                       type_col="event_type").to_pandas()
         .sort_values("item").reset_index(drop=True))
    b = (bradley_terry(ray.data.from_pandas(df).repartition(11),
                       entity_col="user_id", ts_col="ts",
                       type_col="event_type", num_buckets=7).to_pandas()
         .sort_values("item").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------- random_walks


def test_random_walks_follow_edges_and_stop_at_sinks(ray_session):
    from featherstore_ray.stages.graph import random_walks

    # path 0->1->2, plus 2->0 back edge except node 3 is a pure sink
    edges = pd.DataFrame({
        "src": [0, 1, 2, 0, 0],  # duplicate edge 0->1 must be ignored
        "dst": [1, 2, 0, 3, 1],
    })
    out = (random_walks(_ds(edges), walk_len=3, walks_per_node=2)
           .to_pandas())
    eset = {(0, 1), (1, 2), (2, 0), (0, 3)}
    w = out.sort_values(["start", "walk", "step"])
    for (_s, _w), g in w.groupby(["start", "walk"]):
        seq = g["node"].tolist()
        for a, b in zip(seq, seq[1:]):
            assert (a, b) in eset
        # steps are consecutive from 0 (early stop only at the sink)
        assert g["step"].tolist() == list(range(len(seq)))
    # node 3 is a sink: both its walks are step-0 only
    n3 = w[w["start"] == 3]
    assert len(n3) == 2 and (n3["step"] == 0).all()
    # every node got walks_per_node step-0 rows
    s0 = w[w["step"] == 0]
    assert s0.groupby("start").size().tolist() == [2, 2, 2, 2]


def test_random_walks_partition_invariance(ray_session):
    from featherstore_ray.stages.graph import random_walks

    rng = np.random.default_rng(9)
    edges = pd.DataFrame({
        "src": rng.integers(0, 40, 300),
        "dst": rng.integers(0, 40, 300),
    })
    a = (random_walks(ray.data.from_pandas(edges).repartition(2),
                      walk_len=3, walks_per_node=2).to_pandas()
         .sort_values(["start", "walk", "step"]).reset_index(drop=True))
    b = (random_walks(ray.data.from_pandas(edges).repartition(13),
                      walk_len=3, walks_per_node=2, num_buckets=7)
         .to_pandas()
         .sort_values(["start", "walk", "step"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------- permutation_test


def test_permutation_test_detects_real_and_null_effects(ray_session):
    from featherstore_ray.stages.aggregate import permutation_test

    rng = np.random.default_rng(21)
    n = 2000
    g = np.where(rng.random(n) < 0.5, "a", "b")
    # strong planted effect: +2.0 on group a
    v = rng.normal(size=n) + np.where(g == "a", 2.0, 0.0)
    df = pd.DataFrame({"g": g, "v": v, "id": np.arange(n)})
    out = permutation_test(_ds(df), "g", "v", "id", group_a="a",
                           group_b="b", n_perm=100).to_pandas()
    assert out.loc[0, "p_value"] <= 1 / 101 + 1e-6     # maximally extreme
    assert abs(out.loc[0, "d_obs"] - 2.0) < 0.2

    # null: same distribution in both groups -> p not small
    v0 = rng.normal(size=n)
    df0 = pd.DataFrame({"g": g, "v": v0, "id": np.arange(n)})
    out0 = permutation_test(_ds(df0), "g", "v", "id", group_a="a",
                            group_b="b", n_perm=100).to_pandas()
    assert out0.loc[0, "p_value"] > 0.05


def test_permutation_test_degenerate_single_group(ray_session):
    from featherstore_ray.stages.aggregate import permutation_test

    df = pd.DataFrame({"g": ["a"] * 5, "v": [1.0] * 5, "id": range(5)})
    out = permutation_test(_ds(df), "g", "v", "id", group_a="a",
                           group_b="b").to_pandas()
    assert pd.isna(out.loc[0, "p_value"]) and out.loc[0, "n_perm_eff"] == 0


def test_permutation_test_partition_invariance(ray_session):
    from featherstore_ray.stages.aggregate import permutation_test

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 500),
        "v": rng.normal(size=500),
        "id": np.arange(500),
    })
    a = permutation_test(ray.data.from_pandas(df).repartition(2),
                         "g", "v", "id", group_a="a",
                         group_b="b").to_pandas()
    b = permutation_test(ray.data.from_pandas(df).repartition(9),
                         "g", "v", "id", group_a="a",
                         group_b="b").to_pandas()
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------ mondrian_anonymize


def test_mondrian_partitions_respect_k_and_cover_all_rows(ray_session):
    from featherstore_ray.stages.aggregate import mondrian_anonymize

    rng = np.random.default_rng(8)
    n = 800
    df = pd.DataFrame({"x": rng.normal(size=n),
                       "y": rng.integers(0, 50, n).astype(float)})
    out = mondrian_anonymize(_ds(df), ["x", "y"], k=50,
                             depth=4).to_pandas()
    assert (out["n"] >= 50).all()          # k-anonymity holds
    assert out["n"].sum() == n             # every row in one partition
    assert len(out) > 1                    # it actually split
    # ranges are consistent
    assert (out["x_lo"] <= out["x_hi"]).all()
    assert (out["y_lo"] <= out["y_hi"]).all()
    # sibling partitions split on x don't overlap in x beyond the median
    # (left hi <= right lo for pids 2j / 2j+1 produced by an x split at
    # depth levels 1 and 3; weaker global check: pids are unique)
    assert out["pid"].is_unique


def test_mondrian_never_splits_below_k(ray_session):
    from featherstore_ray.stages.aggregate import mondrian_anonymize

    df = pd.DataFrame({"x": np.arange(30, dtype=float),
                       "y": np.zeros(30)})
    out = mondrian_anonymize(_ds(df), ["x", "y"], k=20,
                             depth=5).to_pandas()
    # 30 rows can never split into two >=20 halves -> single partition
    assert len(out) == 1 and out.loc[0, "n"] == 30
    assert out.loc[0, "x_lo"] == 0.0 and out.loc[0, "x_hi"] == 29.0


def test_mondrian_partition_invariance(ray_session):
    from featherstore_ray.stages.aggregate import mondrian_anonymize

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"x": rng.normal(size=300),
                       "y": rng.normal(size=300)})
    a = (mondrian_anonymize(ray.data.from_pandas(df).repartition(2),
                            ["x", "y"], k=30, depth=3).to_pandas()
         .sort_values("pid").reset_index(drop=True))
    b = (mondrian_anonymize(ray.data.from_pandas(df).repartition(11),
                            ["x", "y"], k=30, depth=3,
                            num_buckets=5).to_pandas()
         .sort_values("pid").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ----------------------------------------------------- markov_attribution


def test_markov_attribution_critical_channel_gets_all_credit(ray_session):
    from featherstore_ray.stages.window import markov_attribution

    # every converting journey passes through channel "b"; channel "a"
    # appears but never leads anywhere except b or drop-off
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for u in range(20):
        seq = (["a", "b", "conv"] if u % 2 == 0 else ["a"])
        for i, s in enumerate(seq):
            rows.append((u, t0 + pd.Timedelta(minutes=i), s, u * 10 + i))
    df = pd.DataFrame(rows, columns=["e", "ts", "t", "tb"])
    out = (markov_attribution(_ds(df), entity_col="e", ts_col="ts",
                              type_col="t", conv_type="conv",
                              tiebreak="tb")
           .to_pandas().set_index("channel"))
    # removing b kills all conversion; removing a too (all paths start a)
    assert out.loc["b", "removal_effect"] == 1.0
    assert out.loc["a", "removal_effect"] == 1.0
    assert abs(out["share"].sum() - 1.0) < 1e-6
    assert (out["p_conv_base"] > 0).all()


def test_markov_attribution_useless_channel_gets_zero(ray_session):
    from featherstore_ray.stages.window import markov_attribution

    # "c" only ever appears AFTER the conversion (a fresh journey that
    # drops off) -> removing it cannot change p(conv)
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for u in range(10):
        for i, s in enumerate(["a", "conv", "c"]):
            rows.append((u, t0 + pd.Timedelta(minutes=i), s, i))
    df = pd.DataFrame(rows, columns=["e", "ts", "t", "tb"])
    out = (markov_attribution(_ds(df), entity_col="e", ts_col="ts",
                              type_col="t", conv_type="conv",
                              tiebreak="tb")
           .to_pandas().set_index("channel"))
    assert out.loc["c", "removal_effect"] == 0.0
    assert out.loc["a", "removal_effect"] == 1.0


def test_markov_attribution_partition_invariance(ray_session):
    from featherstore_ray.stages.window import markov_attribution

    rng = np.random.default_rng(6)
    n = 600
    df = pd.DataFrame({
        "e": rng.integers(0, 30, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10000, n), unit="min"),
        "t": rng.choice(["a", "b", "c", "conv"], n,
                        p=[0.35, 0.3, 0.25, 0.1]),
        "tb": np.arange(n, dtype=np.int64),
    })
    a = (markov_attribution(ray.data.from_pandas(df).repartition(2),
                            entity_col="e", ts_col="ts", type_col="t",
                            conv_type="conv", tiebreak="tb").to_pandas()
         .sort_values("channel").reset_index(drop=True))
    b = (markov_attribution(ray.data.from_pandas(df).repartition(11),
                            entity_col="e", ts_col="ts", type_col="t",
                            conv_type="conv", tiebreak="tb",
                            num_buckets=7).to_pandas()
         .sort_values("channel").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------------ elo_ratings


def test_elo_ratings_dominant_item_rises_and_sum_is_conserved(ray_session):
    from featherstore_ray.stages.aggregate import elo_ratings

    rows = []
    base = pd.Timestamp("2024-01-01")
    for u in range(20):
        for d in range(10):
            ts = base + pd.Timedelta(days=d, hours=2)
            rows += [(u, ts, "a")] * 3 + [(u, ts, "b")] * 2 + [(u, ts, "c")]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    out = (elo_ratings(_ds(df), entity_col="user_id", ts_col="ts",
                       type_col="event_type")
           .to_pandas().set_index("item"))
    assert out.loc["a", "rating"] > out.loc["b", "rating"] \
        > out.loc["c", "rating"]
    # zero-sum updates: total rating mass is conserved
    assert abs(out["rating"].sum() - 3000.0) < 1e-3
    assert out.loc["a", "wins"] == 400 and out.loc["a", "losses"] == 0


def test_elo_ratings_matches_manual_single_day(ray_session):
    from featherstore_ray.stages.aggregate import elo_ratings

    # one user, one day, a beats b once (counts 2 vs 1)
    df = pd.DataFrame({
        "user_id": [1, 1, 1],
        "ts": [pd.Timestamp("2024-02-01")] * 3,
        "event_type": ["a", "a", "b"],
    })
    out = (elo_ratings(_ds(df), entity_col="user_id", ts_col="ts",
                       type_col="event_type", k_factor=16.0)
           .to_pandas().set_index("item"))
    # equal start ratings -> e = 0.5, delta = 16 * 1 * 0.5 = 8
    assert out.loc["a", "rating"] == 1008.0
    assert out.loc["b", "rating"] == 992.0


def test_elo_ratings_partition_invariance(ray_session):
    from featherstore_ray.stages.aggregate import elo_ratings

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 20 * 24, n), unit="h"),
        "event_type": rng.choice(["a", "b", "c", "d"], n),
    })
    a = (elo_ratings(ray.data.from_pandas(df).repartition(2),
                     entity_col="user_id", ts_col="ts",
                     type_col="event_type").to_pandas()
         .sort_values("item").reset_index(drop=True))
    b = (elo_ratings(ray.data.from_pandas(df).repartition(9),
                     entity_col="user_id", ts_col="ts",
                     type_col="event_type", num_buckets=7).to_pandas()
         .sort_values("item").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------------ mcnemar_test


def test_mcnemar_counts_discordant_pairs_exactly(ray_session):
    from featherstore_ray.stages.aggregate import mcnemar_test

    # entities: 3 (1,0) flips, 1 (0,1) flip, 2 concordant-1, 1 concordant-0
    rows = []
    for e, (x, y) in enumerate([(1, 0), (1, 0), (1, 0), (0, 1),
                                (1, 1), (1, 1), (0, 0)]):
        # split each entity across two rows to exercise the OR fold
        rows.append((e, bool(x), False))
        rows.append((e, False, bool(y)))
    df = pd.DataFrame(rows, columns=["e", "x", "y"])
    out = mcnemar_test(_ds(df), "e", "x", "y").to_pandas()
    assert out.loc[0, "n_pairs"] == 7
    assert out.loc[0, "n10"] == 3 and out.loc[0, "n01"] == 1
    assert out.loc[0, "n11"] == 2 and out.loc[0, "n00"] == 1
    # continuity-corrected: (|3-1|-1)^2 / 4 = 0.25
    assert out.loc[0, "stat"] == 0.25


def test_mcnemar_no_discordance_yields_null(ray_session):
    from featherstore_ray.stages.aggregate import mcnemar_test

    df = pd.DataFrame({"e": [1, 2], "x": [True, False],
                       "y": [True, False]})
    out = mcnemar_test(_ds(df), "e", "x", "y").to_pandas()
    assert pd.isna(out.loc[0, "stat"])
    assert out.loc[0, "n11"] == 1 and out.loc[0, "n00"] == 1


# --------------------------------------------------------------- rollup_agg


def test_rollup_levels_and_grand_total(ray_session):
    from featherstore_ray.stages.aggregate import rollup_agg

    df = pd.DataFrame({
        "k1": ["x", "x", "x", "y"],
        "k2": ["p", "p", "q", "p"],
        "v": [1.0, 2.0, 4.0, 8.0],
    })
    out = rollup_agg(_ds(df), ["k1", "k2"], "v").to_pandas()
    fin = out[out["level"] == 0].set_index(["k1", "k2"])
    assert fin.loc[("x", "p"), "sum_v"] == 3.0
    assert fin.loc[("x", "q"), "n"] == 1
    mid = out[out["level"] == 1].set_index("k1")
    assert mid.loc["x", "sum_v"] == 7.0 and mid.loc["x", "n"] == 3
    assert mid["k2"].isna().all()
    gt = out[out["level"] == 2]
    assert len(gt) == 1 and gt.iloc[0]["sum_v"] == 15.0
    assert gt.iloc[0]["n"] == 4
    assert out.loc[out["level"] == 0, "n"].sum() == 4


def test_rollup_partition_invariance(ray_session):
    from featherstore_ray.stages.aggregate import rollup_agg

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "k1": rng.choice(["a", "b", "c"], 300),
        "k2": rng.choice(["u", "v"], 300),
        "v": rng.normal(size=300),
    })
    srt = ["level", "k1", "k2"]
    a = (rollup_agg(ray.data.from_pandas(df).repartition(2),
                    ["k1", "k2"], "v").to_pandas()
         .sort_values(srt).reset_index(drop=True))
    b = (rollup_agg(ray.data.from_pandas(df).repartition(9),
                    ["k1", "k2"], "v", num_buckets=5).to_pandas()
         .sort_values(srt).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------- token_set_dedup


def test_token_set_dedup_catches_reorder_and_repetition(ray_session):
    import pyarrow as pa
    from featherstore_ray.stages.dedup import token_set_dedup

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "big data fast engine",
            "engine fast data big",          # reorder of 1
            "big big data fast fast engine",  # repetition edit of 1
            "totally different words here",
            "big data slow engine",           # different SET -> no group
        ]),
    })
    out = (token_set_dedup(ray.data.from_arrow(docs).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert (out["group_size"] == 3).all()
    assert out["keep"].tolist() == [1, 0, 0]   # smallest id survives
    assert (out["group_key"] == "big data engine fast").all()


def test_token_set_dedup_no_dups_is_empty(ray_session):
    import pyarrow as pa
    from featherstore_ray.stages.dedup import token_set_dedup

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta", "gamma delta"]),
    })
    out = token_set_dedup(ray.data.from_arrow(docs)).to_pandas()
    assert len(out) == 0


# --------------------------------------------------------------- ab_power


def test_ab_power_detects_design_sensitivity(ray_session):
    from featherstore_ray.stages.aggregate import ab_power

    rng = np.random.default_rng(23)

    def panel(n_users, lift):
        rows = []
        for u in range(n_users):
            arm = u % 2 == 0
            p = 0.30 + (lift if arm else 0.0)
            rows.append((u, arm, bool(rng.random() < p)))
        return pd.DataFrame(rows, columns=["e", "arm", "conv"])

    big = ab_power(_ds(panel(4000, 0.10)), "e", "arm",
                   "conv").to_pandas().iloc[0]
    small = ab_power(_ds(panel(200, 0.10)), "e", "arm",
                     "conv").to_pandas().iloc[0]
    assert big["power"] > 0.9            # 10pp lift on 2k/arm: ~sure
    assert small["power"] < big["power"]
    assert small["mde"] > big["mde"]     # smaller n -> bigger MDE
    assert big["n_a"] + big["n_b"] == 4000
    # power and mde agree with the closed form recomputed from outputs
    import math
    se = big["se"]
    z = abs(big["p_a"] - big["p_b"]) / se
    exact = 0.5 * (1 + math.erf((z - 1.959963984540054) / math.sqrt(2)))
    # inputs are 6dp-rounded outputs, so allow their propagation
    assert abs(big["power"] - exact) < 1e-4


def test_ab_power_degenerate_unanimous_conversion(ray_session):
    from featherstore_ray.stages.aggregate import ab_power

    df = pd.DataFrame({"e": range(10), "arm": [True, False] * 5,
                       "conv": [True] * 10})
    out = ab_power(_ds(df), "e", "arm", "conv").to_pandas().iloc[0]
    assert out["se"] == 0.0 and pd.isna(out["power"]) \
        and pd.isna(out["mde"])
