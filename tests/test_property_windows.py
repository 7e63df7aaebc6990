"""Property-based checks: window kernels vs brute-force references on
randomized small inputs (hypothesis drives the shapes/values)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

import ray.data

from featherstore_ray.stages.window import rolling_aggregate, sessionize
from featherstore_ray.stages.asof import asof_join


@st.composite
def event_tables(draw):
    n = draw(st.integers(1, 60))
    ent = draw(
        st.lists(st.integers(0, 4), min_size=n, max_size=n)
    )
    # timestamps with deliberate duplicates (peer rows)
    ts = draw(
        st.lists(st.integers(0, 50), min_size=n, max_size=n)
    )
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.integers(-100, 100)),
            min_size=n,
            max_size=n,
        )
    )
    return pa.table(
        {
            "eid": pa.array(range(n), pa.int64()),
            "entity": pa.array(ent, pa.int64()),
            "ts": pa.array([t * 1000 for t in ts], pa.timestamp("us")),
            "value": pa.array(
                [None if v is None else float(v) for v in vals], pa.float64()
            ),
        }
    )


def brute_rolling(df, w_us):
    out_sum, out_cnt = [], []
    for _, row in df.iterrows():
        win = df[
            (df["entity"] == row["entity"])
            & (df["ts"] >= row["ts"] - pd.Timedelta(microseconds=w_us))
            & (df["ts"] <= row["ts"])
        ]
        vals = win["value"].dropna()
        out_cnt.append(len(vals))
        out_sum.append(vals.sum() if len(vals) else np.nan)
    return np.array(out_sum), np.array(out_cnt)


@settings(max_examples=12, deadline=None)
@given(tbl=event_tables(), w_ms=st.integers(1, 40))
def test_rolling_matches_bruteforce(tbl, w_ms):
    w_us = w_ms * 1000
    out = (
        rolling_aggregate(
            ray.data.from_arrow(tbl),
            entity_col="entity",
            ts_col="ts",
            value_col="value",
            window=w_us,
            tiebreak="eid",
            round_digits=None,
            num_buckets=2,
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    exp_sum, exp_cnt = brute_rolling(tbl.to_pandas(), w_us)
    assert (out["value_rcount"].to_numpy() == exp_cnt).all()
    np.testing.assert_allclose(
        out["value_rsum"].to_numpy(), exp_sum, equal_nan=True, atol=1e-9
    )


@settings(max_examples=8, deadline=None)
@given(tbl=event_tables(), gap_ms=st.integers(1, 30))
def test_sessionize_matches_bruteforce(tbl, gap_ms):
    gap_us = gap_ms * 1000
    out = (
        sessionize(
            ray.data.from_arrow(tbl),
            entity_col="entity",
            ts_col="ts",
            gap=gap_us,
            tiebreak="eid",
            num_buckets=2,
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    exp = {}
    for e, g in df.groupby("entity"):
        g = g.sort_values(["ts", "eid"])
        sid, prev = 0, None
        for _, row in g.iterrows():
            if prev is not None and (row["ts"] - prev).value // 1000 > gap_us:
                sid += 1
            exp[row["eid"]] = sid
            prev = row["ts"]
    got = dict(zip(out["eid"], out["session_id"]))
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(tbl=event_tables())
def test_asof_never_leaks(tbl):
    df = tbl.to_pandas()
    spine = tbl.filter(pa.compute.equal(pa.compute.bit_wise_and(tbl["eid"], 1), 1))
    feats = tbl.filter(pa.compute.equal(pa.compute.bit_wise_and(tbl["eid"], 1), 0))
    if spine.num_rows == 0:
        return
    out = asof_join(
        ray.data.from_arrow(spine),
        ray.data.from_arrow(feats),
        entity_col="entity",
        spine_ts="ts",
        feature_ts="ts",
        feature_cols=["ts", "value"],
        tiebreak="eid",
        num_buckets=2,
    ).to_pandas()
    assert len(out) == spine.num_rows
    m = out["ts_asof"].notna()
    assert (
        out.loc[m, "ts_asof"].to_numpy("datetime64[us]")
        <= out.loc[m, "ts"].to_numpy("datetime64[us]")
    ).all()


@st.composite
def typed_event_tables(draw):
    """Events with a type column for the suite (spine/feature split)."""
    n = draw(st.integers(2, 80))
    ent = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    ts = draw(st.lists(st.integers(0, 60), min_size=n, max_size=n))
    typ = draw(st.lists(st.integers(0, 1), min_size=n, max_size=n))
    vals = draw(
        st.lists(st.integers(-50, 50), min_size=n, max_size=n)
    )
    return pa.table(
        {
            "eid": pa.array(range(n), pa.int64()),
            "entity": pa.array(ent, pa.int64()),
            "ts": pa.array([t * 1_000_000 for t in ts], pa.timestamp("us")),
            "etype": pa.array(typ, pa.int64()),
            "value": pa.array([float(v) for v in vals], pa.float64()),
        }
    )


@settings(max_examples=10, deadline=None)
@given(
    tbl=typed_event_tables(),
    chunk_rows=st.integers(3, 20),
    w_s=st.integers(2, 30),
)
def test_chunked_suite_property_parity(tbl, chunk_rows, w_s):
    """Chunked path == plain path for arbitrary small inputs, thresholds
    forced so chunking really happens (every entity hot, tiny chunks)."""
    from datetime import timedelta

    from featherstore_ray.pipelines.feature_suite import feature_suite
    from featherstore_ray.stages.chunked import feature_suite_chunked

    kw = dict(
        entity_col="entity", ts_col="ts", value_col="value",
        type_col="etype", tiebreak="eid", spine_type=1, feature_type=0,
        num_buckets=4,
        rolling_window=timedelta(seconds=w_s),
        session_gap=timedelta(seconds=2),
    )
    plain = feature_suite(ray.data.from_arrow(tbl), **kw).to_pandas()
    chunked = feature_suite_chunked(
        ray.data.from_arrow(tbl),
        hot_row_threshold=1,
        target_chunk_rows=chunk_rows,
        **kw,
    ).to_pandas()
    cols = sorted(plain.columns)
    p = plain[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    c = chunked[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    assert len(p) == len(c)
    pd.testing.assert_frame_equal(p, c, check_dtype=False)


@st.composite
def ranked_tables(draw):
    n = draw(st.integers(1, 80))
    # heavy ties + nulls to stress splitter/bucket edges
    vals = draw(st.lists(
        st.one_of(st.none(), st.sampled_from([0.0, 1.0, 1.0, 2.5, -3.0, 7.0])),
        min_size=n, max_size=n,
    ))
    parts = draw(st.integers(1, 5))
    buckets = draw(st.integers(1, 6))
    return vals, parts, buckets


@settings(max_examples=25, deadline=None)
@given(ranked_tables())
def test_global_rank_property(case):
    from featherstore_ray.stages.misc import global_rank

    vals, parts, buckets = case
    t = pa.table({
        "v": pa.array(vals, pa.float64()),
        "i": list(range(len(vals))),
    })
    out = global_rank(
        ray.data.from_arrow(t).repartition(parts), "v", "i",
        num_buckets=buckets, sample_per_batch=4,
    ).to_pandas()
    ref = (
        t.to_pandas().dropna(subset=["v"])
        .sort_values(["v", "i"], kind="stable").reset_index(drop=True)
    )
    assert len(out) == len(ref)
    if not len(ref):  # all-null input: empty result, no schema to check
        return
    out = out.sort_values("rnk").reset_index(drop=True)
    assert (out["rnk"].to_numpy() == np.arange(1, len(ref) + 1)).all()
    assert (out["i"].to_numpy() == ref["i"].to_numpy()).all()


@settings(max_examples=25, deadline=None)
@given(event_tables())
def test_expanding_zscore_property(tbl):
    from featherstore_ray.stages.window import expanding_zscore

    out = (
        expanding_zscore(
            ray.data.from_arrow(tbl).repartition(2),
            entity_col="entity", ts_col="ts", value_col="value",
            tiebreak="eid", num_buckets=3, round_digits=None,
        ).to_pandas().set_index("eid").sort_index()["value_xz"]
    )
    df = tbl.to_pandas().sort_values(["entity", "ts", "eid"],
                                     kind="stable")
    for ent, g in df.groupby("entity"):
        seen = []
        for _, row in g.iterrows():
            want = np.nan
            prior = [x for x in seen if not pd.isna(x)]
            if not pd.isna(row["value"]) and len(prior) >= 2:
                mu = float(np.mean(prior))
                sd = float(np.std(prior, ddof=1))
                if sd > 0:
                    want = (row["value"] - mu) / sd
            got = out[row["eid"]]
            if np.isnan(want):
                assert pd.isna(got), (ent, row["eid"], got)
            else:
                assert abs(got - want) < 1e-9, (ent, row["eid"])
            seen.append(row["value"])


@settings(max_examples=20, deadline=None)
@given(event_tables())
def test_ohlc_property(tbl):
    from featherstore_ray.stages.aggregate import ohlc

    out = ohlc(
        ray.data.from_arrow(tbl).repartition(3),
        "entity", "ts", "value", "eid", num_buckets=3, round_digits=None,
    ).to_pandas()
    df = tbl.to_pandas().dropna(subset=["value"])
    if df.empty:
        assert len(out) == 0
        return
    df = df.assign(period=df["ts"].dt.floor("D"))
    got = out.set_index(["entity", "period"]).sort_index()
    ref_groups = df.groupby(["entity", "period"])
    assert len(got) == ref_groups.ngroups
    for key, g in ref_groups:
        g = g.sort_values(["ts", "eid"], kind="stable")
        r = got.loc[key]
        assert r["open"] == g["value"].iloc[0], key
        assert r["close"] == g["value"].iloc[-1], key
        assert r["high"] == g["value"].max(), key
        assert r["low"] == g["value"].min(), key
        assert r["volume"] == len(g), key


@settings(max_examples=20, deadline=None)
@given(event_tables())
def test_gini_property(tbl):
    from featherstore_ray.stages.aggregate import gini

    raw = gini(
        ray.data.from_arrow(tbl).repartition(3),
        "entity", "value", num_buckets=3, round_digits=None,
    ).to_pandas()
    df = tbl.to_pandas().dropna(subset=["value"])
    if df.empty:  # all-null values: empty result, no schema to index
        assert len(raw) == 0
        return
    out = raw.set_index("entity")["gini"]
    assert len(out) == df["entity"].nunique()
    for ent, g in df.groupby("entity"):
        x = np.sort(g["value"].to_numpy(dtype=np.float64))
        n, s = len(x), x.sum()
        if s == 0:
            assert pd.isna(out[ent]), ent
            continue
        want = 2.0 * np.sum((np.arange(n) + 1) * x) / (n * s) \
            - (n + 1.0) / n
        assert abs(out[ent] - want) < 1e-9, ent


@st.composite
def band_inputs(draw):
    nl = draw(st.integers(1, 40))
    nr = draw(st.integers(1, 30))
    # values on a coarse grid so exact band-boundary hits are common
    lv = draw(st.lists(st.integers(-20, 20), min_size=nl, max_size=nl))
    rv = draw(st.lists(st.integers(-20, 20), min_size=nr, max_size=nr))
    eps = draw(st.sampled_from([1.0, 2.5, 3.0]))
    return lv, rv, eps


@settings(max_examples=25, deadline=None)
@given(band_inputs())
def test_band_join_property_vs_bruteforce(inp):
    from featherstore_ray.stages.join import band_join

    lv, rv, eps = inp
    lt = pa.table({"lid": pa.array(range(len(lv)), pa.int64()),
                   "lv": pa.array([float(v) for v in lv])})
    rt = pa.table({"rid": pa.array(range(len(rv)), pa.int64()),
                   "rv": pa.array([float(v) for v in rv])})
    out = band_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        left_val="lv", right_val="rv", eps=eps,
        left_cols=["lid", "lv"], right_cols=["rid", "rv"],
        num_buckets=4,
    ).to_pandas()
    # a zero-pair result surfaces as a COLUMN-LESS empty DataFrame (the
    # documented Ray empty-block schema loss) — guard on length first
    got = set(zip(out["lid"], out["rid"])) if len(out) else set()
    want = {(i, j) for i, a in enumerate(lv) for j, b in enumerate(rv)
            if a - eps <= b <= a + eps}
    assert got == want  # exact: every pair once, boundaries closed


@st.composite
def interval_sets(draw):
    n = draw(st.integers(1, 50))
    ent = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    s = draw(st.lists(st.integers(0, 60), min_size=n, max_size=n))
    ln = draw(st.lists(st.integers(0, 15), min_size=n, max_size=n))
    return ent, s, ln


@settings(max_examples=25, deadline=None)
@given(interval_sets())
def test_merge_intervals_property(inp):
    from featherstore_ray.stages.join import merge_intervals

    ent, s, ln = inp
    e = [a + b for a, b in zip(s, ln)]
    t = pa.table({
        "ent": pa.array(ent, pa.int64()),
        "s": pa.array(s, pa.int64()),
        "e": pa.array(e, pa.int64()),
    })
    out = merge_intervals(
        ray.data.from_arrow(t), entity_col="ent", start_col="s",
        end_col="e", num_buckets=2,
    ).to_pandas()
    # invariants: islands disjoint & ordered; counts sum to inputs;
    # every input interval is covered by exactly one island
    assert out["n_merged"].sum() == len(ent)
    for g, grp in out.groupby("ent"):
        gg = grp.sort_values("start")
        assert (gg["start"].to_numpy()[1:] > gg["end"].to_numpy()[:-1]).all()
    for a, b, c in zip(ent, s, e):
        isl = out[(out["ent"] == a) & (out["start"] <= b)
                  & (out["end"] >= c)]
        assert len(isl) == 1, (a, b, c)


@st.composite
def cp_tables(draw):
    n = draw(st.integers(2, 50))
    ent = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    ts = draw(st.lists(st.integers(0, 40), min_size=n, max_size=n))
    vals = draw(st.lists(st.integers(-20, 20), min_size=n, max_size=n))
    return pa.table({
        "eid": pa.array(range(n), pa.int64()),
        "entity": pa.array(ent, pa.int64()),
        "ts": pa.array([t * 1000 for t in ts], pa.timestamp("us")),
        "value": pa.array([float(v) for v in vals], pa.float64()),
    })


@settings(max_examples=25, deadline=None)
@given(cp_tables())
def test_changepoint_matches_bruteforce(t):
    from featherstore_ray.stages.window import changepoint

    out = changepoint(
        ray.data.from_arrow(t).repartition(2),
        entity_col="entity", ts_col="ts", value_col="value",
        tiebreak="eid", num_buckets=2,
    ).to_pandas()
    if len(out) == 0:
        # all-empty wide-op results surface columnless through to_pandas
        # (Ray drops the schema) — valid when no entity has >= 2 rows
        out = pd.DataFrame({"entity": pd.Series([], dtype=np.int64),
                            "cp_k": [], "gain": []})
    out = out.set_index("entity")

    df = t.to_pandas().sort_values(["entity", "ts", "eid"],
                                   kind="stable")
    for e, g in df.groupby("entity"):
        x = g["value"].to_numpy(dtype=np.float64)
        n = len(x)
        if n < 2:
            assert e not in out.index
            continue

        def sse(a):
            return float((a * a).sum() - a.sum() ** 2 / len(a))

        gains = np.round(
            [sse(x) - sse(x[:k]) - sse(x[k:]) for k in range(1, n)], 6)
        k_best = int(np.argmax(gains)) + 1
        assert out.loc[e, "cp_k"] == k_best
        assert abs(out.loc[e, "gain"] - gains[k_best - 1]) < 1e-5
