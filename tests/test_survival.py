"""Kaplan-Meier + time_to_event vs a textbook reference and edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.stages.survival import kaplan_meier, time_to_event


def _km_reference(durations, observed):
    """Plain-Python product-limit estimator (textbook)."""
    rows = []
    s = 1.0
    for t in sorted(set(durations)):
        n = sum(1 for x in durations if x >= t)
        d = sum(1 for x, o in zip(durations, observed) if x == t and o)
        if d > 0:
            s *= 1.0 - d / n
            rows.append((t, n, d, s))
    return rows


def test_kaplan_meier_matches_reference(ray_session):
    rng = np.random.default_rng(3)
    n = 500
    grp = rng.integers(0, 3, n)
    dur = rng.integers(1, 60, n).astype(np.int64)
    obs = rng.random(n) < 0.7
    t = pa.table({"g": pa.array(grp, pa.int64()),
                  "duration": pa.array(dur),
                  "observed": pa.array(obs)})
    out = kaplan_meier(
        ray.data.from_arrow(t).repartition(4),
        group_col="g", duration_col="duration", observed_col="observed",
        num_buckets=4,
    ).to_pandas()
    for g in range(3):
        mask = grp == g
        ref = _km_reference(dur[mask].tolist(), obs[mask].tolist())
        got = out[out["g"] == g].sort_values("t").reset_index(drop=True)
        assert len(got) == len(ref)
        for i, (rt, rn, rd, rs) in enumerate(ref):
            assert got.loc[i, "t"] == rt
            assert got.loc[i, "n_risk"] == rn
            assert got.loc[i, "d_events"] == rd
            assert abs(got.loc[i, "survival"] - rs) < 1e-6


def test_kaplan_meier_all_die_hits_zero(ray_session):
    """d == n at the last event time → survival exactly 0 (the ln(0)
    special case), and only for that group."""
    t = pa.table({
        "g": pa.array([0, 0, 0, 1, 1], pa.int64()),
        "duration": pa.array([5, 5, 5, 3, 9], pa.int64()),
        "observed": pa.array([True, True, True, True, False]),
    })
    out = kaplan_meier(
        ray.data.from_arrow(t), group_col="g", duration_col="duration",
        observed_col="observed", num_buckets=2,
    ).to_pandas().set_index(["g", "t"])
    assert out.loc[(0, 5), "survival"] == 0.0
    assert abs(out.loc[(1, 3), "survival"] - 0.5) < 1e-9


def test_time_to_event_derivation(ray_session):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3600_000_000, "us")
    # user 1: click@0h, purchase@2h, click@5h  -> duration 2h, observed
    # user 2: click@0h, click@4h               -> duration 4h, censored
    # user 3: purchase@1h                      -> duration 0,  observed
    t = pa.table({
        "u": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([base, base + 2 * h, base + 5 * h,
                        base, base + 4 * h, base + h]),
        "et": pa.array(["click", "purchase", "click", "click", "click",
                        "purchase"]),
    })
    out = (
        time_to_event(
            ray.data.from_arrow(t).repartition(3),
            entity_col="u", ts_col="ts", type_col="et", target="purchase",
            num_buckets=2,
        )
        .to_pandas().set_index("u").sort_index()
    )
    hours = 3600 * 1_000_000
    assert out.loc[1, "duration"] == 2 * hours and bool(out.loc[1, "observed"])
    assert out.loc[2, "duration"] == 4 * hours and not bool(out.loc[2, "observed"])
    assert out.loc[3, "duration"] == 0 and bool(out.loc[3, "observed"])


def test_logrank_detects_separated_curves(ray_session):
    from featherstore_ray.stages.survival import logrank

    rng = np.random.default_rng(151)
    n = 400
    # group 0 fails fast, group 1 slow; ~25% censored each
    g = rng.integers(0, 2, n)
    dur = np.where(g == 0, rng.exponential(10, n),
                   rng.exponential(30, n)).astype(np.int64) + 1
    obs = rng.random(n) < 0.75
    t = pa.table({
        "g": pa.array(g, pa.int64()),
        "duration": pa.array(dur),
        "observed": pa.array(obs),
    })
    out = logrank(
        ray.data.from_arrow(t).repartition(4), group_col="g",
        duration_col="duration", observed_col="observed",
    ).to_pandas().iloc[0]
    assert out["chi2"] > 10  # clearly separated curves
    assert out["o1"] > out["e1"]  # group 0 dies more than expected

    # identical distributions -> small statistic
    dur2 = rng.exponential(20, n).astype(np.int64) + 1
    t2 = pa.table({"g": pa.array(g, pa.int64()),
                   "duration": pa.array(dur2),
                   "observed": pa.array(obs)})
    out2 = logrank(ray.data.from_arrow(t2), group_col="g",
                   duration_col="duration",
                   observed_col="observed").to_pandas().iloc[0]
    assert out2["chi2"] < 6


def test_logrank_manual_small_case(ray_session):
    """Hand-computable case: O/E/V at each event time."""
    from featherstore_ray.stages.survival import logrank

    # g0: events at 1, 2; g1: event at 2, censored at 3
    t = pa.table({
        "g": pa.array([0, 0, 1, 1], pa.int64()),
        "duration": pa.array([1, 2, 2, 3], pa.int64()),
        "observed": pa.array([True, True, True, False]),
    })
    out = logrank(ray.data.from_arrow(t), group_col="g",
                  duration_col="duration",
                  observed_col="observed").to_pandas().iloc[0]
    # t=1: d=1, n1=2, n2=2 -> e1 = 0.5, v = 1*(1/2)*(1/2)*(3/3) = 0.25
    # t=2: d=2, n1=1, n2=2 -> e1 = 2/3, v = 2*(1/3)*(2/3)*(1/2) = 2/9
    o1, e1 = 2, 0.5 + 2 / 3
    v = 0.25 + 2 / 9
    z = (o1 - e1) / np.sqrt(v)
    assert out["o1"] == 2
    assert abs(out["e1"] - round(e1, 6)) < 1e-9
    assert abs(out["z"] - z) < 1e-6
    assert abs(out["chi2"] - z * z) < 1e-5


def test_rmst_matches_reference_and_horizon(ray_session):
    from featherstore_ray.stages.survival import rmst

    def ref(dur, obs, tau):
        s, prev, area = 1.0, 0, 0.0
        for t in sorted(set(dur)):
            if t > tau:
                break
            n = sum(1 for x in dur if x >= t)
            d = sum(1 for x, o in zip(dur, obs) if x == t and o)
            if d:
                area += s * (t - prev)
                prev = t
                s *= 1 - d / n
        return area + s * (tau - prev)

    rng = np.random.default_rng(161)
    n = 300
    g = rng.integers(0, 3, n)
    dur = rng.integers(1, 100, n).astype(np.int64)
    obs = rng.random(n) < 0.7
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "duration": pa.array(dur),
                  "observed": pa.array(obs)})
    out = rmst(
        ray.data.from_arrow(t).repartition(3), group_col="g",
        duration_col="duration", observed_col="observed", tau=60,
        num_buckets=2,
    ).to_pandas().set_index("g")
    for gg in range(3):
        mask = g == gg
        want = ref(dur[mask].tolist(), obs[mask].tolist(), 60)
        assert abs(out.loc[gg, "rmst"] - want) < 1e-6, gg
    # censored-only group survives the whole horizon
    t2 = pa.table({"g": pa.array([9] * 4, pa.int64()),
                   "duration": pa.array([5, 6, 7, 8], pa.int64()),
                   "observed": pa.array([False] * 4)})
    out2 = rmst(ray.data.from_arrow(t2), group_col="g",
                duration_col="duration", observed_col="observed",
                tau=50).to_pandas()
    assert out2["rmst"].iloc[0] == 50.0
    # scale: report in tens
    out3 = rmst(ray.data.from_arrow(t2), group_col="g",
                duration_col="duration", observed_col="observed",
                tau=50, scale=10.0).to_pandas()
    assert out3["rmst"].iloc[0] == 5.0


# ----------------------------------------------------- cumulative_incidence


def test_cif_matches_hand_computed_aalen_johansen(ray_session):
    from featherstore_ray.stages.survival import cumulative_incidence

    # one group; durations/causes (0 = censored):
    # t=1: cause1 x1 (n=6); t=2: censored x1; t=3: cause2 x1 (n=4);
    # t=4: cause1 x1 (n=3); t=5: censored x2
    df = pd.DataFrame({
        "g": ["a"] * 6,
        "t": [1, 2, 3, 4, 5, 5],
        "k": [1, 0, 2, 1, 0, 0],
    })
    out = (cumulative_incidence(
        ray.data.from_pandas(df).repartition(3), group_col="g",
        duration_col="t", cause_col="k")
        .to_pandas().sort_values(["cause", "t"]).reset_index(drop=True))
    # S(0)=1; S(1)=5/6; S(3)=5/6*3/4=0.625; S(4)=0.625*2/3
    # CIF1(1)=1*1/6; CIF1(4)=1/6+0.625*1/3
    # CIF2(3)=S(1-)... = 5/6 * 1/4
    exp = {
        (1, 1): round(1 / 6, 6),
        (1, 4): round(1 / 6 + 0.625 / 3, 6),
        (2, 3): round(5 / 6 / 4, 6),
    }
    got = {(r["cause"], r["t"]): r["cif"] for _, r in out.iterrows()}
    assert got.keys() == exp.keys()
    for key in exp:
        assert abs(got[key] - exp[key]) < 1e-9, key
    # competing-risks identity: total failure prob <= 1 and
    # CIF1(max)+CIF2(max) = 1 - S(last event time)
    tot = exp[(1, 4)] + exp[(2, 3)]
    assert abs(tot - (1 - 0.625 * 2 / 3)) < 1e-6


def test_cif_partition_invariance_and_monotone(ray_session):
    from featherstore_ray.stages.survival import cumulative_incidence

    rng = np.random.default_rng(19)
    n = 400
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], n),
        "t": rng.integers(1, 50, n),
        "k": rng.choice([0, 1, 2], n, p=[0.3, 0.4, 0.3]),
    })
    a = (cumulative_incidence(ray.data.from_pandas(df).repartition(2),
                              group_col="g", duration_col="t",
                              cause_col="k").to_pandas()
         .sort_values(["g", "cause", "t"]).reset_index(drop=True))
    b = (cumulative_incidence(ray.data.from_pandas(df).repartition(9),
                              group_col="g", duration_col="t",
                              cause_col="k", num_buckets=5).to_pandas()
         .sort_values(["g", "cause", "t"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # CIF is nondecreasing in t within (group, cause), bounded by 1
    for _, grp in a.groupby(["g", "cause"]):
        assert (np.diff(grp["cif"].to_numpy()) >= -1e-12).all()
    assert (a["cif"] <= 1.0 + 1e-9).all()
