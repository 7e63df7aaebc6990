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
