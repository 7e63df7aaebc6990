"""Streaming tumbling windows: watermark emission, lateness, parity."""

from datetime import timedelta

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.stages.streaming import (
    TumblingWindowState,
    streaming_tumbling,
)
from featherstore_ray.stages.window import tumbling_aggregate

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _mk(ts_s, vals, ent=1):
    return pd.DataFrame(
        {
            "user_id": np.full(len(ts_s), ent, dtype=np.int64),
            "ts": pd.to_datetime(np.asarray(ts_s), unit="s"),
            "value": np.asarray(vals, dtype=np.float64),
        }
    )


def _state(**kw):
    return TumblingWindowState(
        entity_col="user_id", ts_col="ts", value_col="value",
        width=timedelta(seconds=100), **kw,
    )


def test_watermark_closes_windows_exactly_once():
    st = _state()
    # window 0 = [0, 100); window 1 = [100, 200)
    out0 = st.process(_mk([10, 20], [1.0, 2.0]))
    assert len(out0) == 0  # watermark 20 < 100: nothing closes
    out1 = st.process(_mk([105], [5.0]))
    # watermark 105 >= 100: window 0 closes with its complete sum
    assert len(out1) == 1
    assert out1["n_events"].iloc[0] == 2 and out1["sum_value"].iloc[0] == 3.0
    out2 = st.flush()
    assert len(out2) == 1  # window 1, exactly once, never re-emitted
    assert out2["sum_value"].iloc[0] == 5.0
    assert st.emitted == 2 and st.dropped_late == 0


def test_allowed_lateness_merges_then_drops():
    st = _state(allowed_lateness=timedelta(seconds=50))
    st.process(_mk([10], [1.0]))
    # ts 120: watermark = 120-50 = 70 < 100 -> window 0 still open
    assert len(st.process(_mk([120], [4.0]))) == 0
    # a late row for window 0 within lateness MERGES
    assert len(st.process(_mk([90], [2.0]))) == 0
    # ts 160: watermark 110 -> window 0 closes with the merged late row
    closed = st.process(_mk([160], [8.0]))
    assert len(closed) == 1
    assert closed["n_events"].iloc[0] == 2
    assert closed["sum_value"].iloc[0] == 3.0
    # beyond-lateness row for the CLOSED window 0 is dropped and counted
    assert len(st.process(_mk([30], [9.0]))) == 0
    assert st.dropped_late == 1
    rest = st.flush()
    assert rest["sum_value"].sum() == 12.0  # 4 + 8 in window 1


def test_streaming_tumbling_matches_batch(ray_session):
    cols = ["user_id", "ts", "value"]
    kw = dict(
        entity_col="user_id", ts_col="ts", value_col="value",
        width=timedelta(days=1), num_buckets=8,
    )
    batch = tumbling_aggregate(
        ray.data.read_parquet(EVENTS, columns=cols), **kw
    ).to_pandas()
    stream = streaming_tumbling(
        ray.data.read_parquet(EVENTS, columns=cols),
        micro_batch_rows=64, **kw
    ).to_pandas()
    key = ["user_id", "window_start"]
    b = batch.sort_values(key).reset_index(drop=True)
    s = stream.sort_values(key).reset_index(drop=True)
    assert len(b) == len(s) and len(b) > 0
    pd.testing.assert_frame_equal(
        b[sorted(b.columns)], s[sorted(s.columns)], check_dtype=False
    )


def test_pre_epoch_windows_not_swallowed():
    # negative timestamps give NEGATIVE window ids; the first watermark
    # must not mark them closed (closed_below starts None, not 0)
    st = _state()
    out0 = st.process(_mk([-150, -120], [1.0, 2.0]))
    assert len(out0) == 0
    out1 = st.process(_mk([50], [4.0]))  # watermark 50 closes window -2
    assert len(out1) == 1
    assert out1["n_events"].iloc[0] == 2 and out1["sum_value"].iloc[0] == 3.0
    rest = st.flush()
    assert st.emitted == 2 and st.dropped_late == 0
    assert rest["sum_value"].iloc[0] == 4.0


def _sess(**kw):
    from featherstore_ray.stages.streaming import SessionWindowState

    return SessionWindowState(
        entity_col="user_id", ts_col="ts", value_col="value",
        gap=timedelta(seconds=30), **kw,
    )


def test_session_watermark_closes_exactly_once():
    st = _sess()
    out0 = st.process(_mk([10, 25], [1.0, 2.0]))  # one session, still open
    assert len(out0) == 0
    # ts 100: watermark 100 > 25+30 -> session [10,25] closes
    out1 = st.process(_mk([100], [5.0]))
    assert len(out1) == 1
    r = out1.iloc[0]
    assert r["session_id"] == 0 and r["n_events"] == 2
    assert r["sum_value"] == 3.0 and r["duration_sec"] == 15.0
    rest = st.flush()
    assert len(rest) == 1 and rest["session_id"].iloc[0] == 1
    assert st.emitted == 2 and st.dropped_late == 0


def test_session_late_row_dropped_after_close_merged_before():
    st = _sess(allowed_lateness=timedelta(seconds=60))
    st.process(_mk([10], [1.0]))
    # ts 80: watermark 20 -> open; 80 > 10+30 so it's a NEW session
    assert len(st.process(_mk([80], [4.0]))) == 0
    # ts 35 is late (watermark 20... now 35<80) but bridges [10] and [80]?
    # 35 <= 10+30 extends s0; 80 <= 35+30+... 80 > 65 -> still two sessions
    assert len(st.process(_mk([35], [2.0]))) == 0
    assert len(st.open[1]) == 2
    # ts 150: watermark 90 > 35+30 closes s0 (merged late row included)
    closed = st.process(_mk([150], [8.0]))
    assert len(closed) == 1
    assert closed["n_events"].iloc[0] == 2 and closed["sum_value"].iloc[0] == 3.0
    # a row at/under closed_until (65) is DROPPED as late
    assert len(st.process(_mk([60], [9.0]))) == 0
    assert st.dropped_late == 1


def test_session_bridge_merges_two_open_sessions():
    st = _sess(allowed_lateness=timedelta(seconds=500))
    st.process(_mk([10], [1.0]))
    st.process(_mk([100], [2.0]))  # big lateness: both stay open
    assert len(st.open[1]) == 2
    # 55 bridges: 55<=10+30? no... 55-10=45>30 -> doesn't extend s0.
    # use 40: 40<=10+30 extends s0 to last=40; then 100<=40+30? no.
    st.process(_mk([40], [4.0]))
    assert len(st.open[1]) == 2
    # 70 extends s0 (70<=40+30) AND bridges to s1 (100<=70+30): ONE session
    st.process(_mk([70], [8.0]))
    assert len(st.open[1]) == 1
    out = st.flush()
    assert len(out) == 1
    assert out["n_events"].iloc[0] == 4 and out["sum_value"].iloc[0] == 15.0
    assert out["duration_sec"].iloc[0] == 90.0


def test_streaming_sessions_match_batch(ray_session):
    from featherstore_ray.stages.streaming import streaming_sessionize
    from featherstore_ray.stages.window import session_stats

    ds = ray.data.read_parquet(EVENTS, columns=["user_id", "ts", "value"])
    got = (
        streaming_sessionize(
            ds, entity_col="user_id", ts_col="ts",
            gap=timedelta(minutes=30), value_col="value",
            micro_batch_rows=256, num_buckets=8,
        )
        .to_pandas()
    )
    exp = (
        session_stats(
            ray.data.read_parquet(EVENTS, columns=["user_id", "ts", "value"]),
            entity_col="user_id", ts_col="ts",
            gap=timedelta(minutes=30), value_col="value", num_buckets=8,
        )
        .to_pandas()
    )
    key = ["user_id", "session_id"]
    g = got[sorted(got.columns)].sort_values(key).reset_index(drop=True)
    x = exp[sorted(exp.columns)].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, x, check_dtype=False)


def test_streaming_dedup_state_suppresses_late_duplicates(ray_session):
    from featherstore_ray.stages.streaming import StreamingDedupState

    s = StreamingDedupState("k")
    b1 = pa.table({"k": pa.array([1, 2, 1], pa.int64()),
                   "v": pa.array([10, 20, 11], pa.int64())})
    out1 = s.update(b1)
    assert out1["k"].to_pylist() == [1, 2]   # in-batch dup dropped
    assert out1["v"].to_pylist() == [10, 20]  # first occurrence wins
    b2 = pa.table({"k": pa.array([2, 3, 1], pa.int64()),
                   "v": pa.array([21, 30, 12], pa.int64())})
    out2 = s.update(b2)
    assert out2["k"].to_pylist() == [3]       # late dups suppressed
    assert s.update(b1).num_rows == 0          # full replay: nothing new


def test_streaming_dedup_equals_batch_first_per_key(ray_session):
    import duckdb

    from featherstore_ray.stages.streaming import streaming_dedup

    rng = np.random.default_rng(77)
    n = 5000
    t = pa.table({
        "eid": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(rng.integers(0, 300, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10**9, n), pa.int64()),
    })
    for mb in (64, 4096):  # micro-batch size must not change the result
        out = streaming_dedup(
            ray.data.from_arrow(t).repartition(4),
            key_col="k", order_cols=["ts", "eid"],
            micro_batch_rows=mb, num_buckets=8,
        ).to_pandas().sort_values("k").reset_index(drop=True)
        con = duckdb.connect()
        con.register("e", t)
        exp = con.execute(
            """
            SELECT eid, k, ts FROM (
              SELECT *, row_number() OVER (
                PARTITION BY k ORDER BY ts, eid) rn FROM e)
            WHERE rn = 1 ORDER BY k
            """
        ).df()
        assert out["eid"].tolist() == exp["eid"].tolist()


def test_lateness_audit_cross_bucket_carry():
    import numpy as np
    import pandas as pd
    import ray

    from datetime import timedelta

    from featherstore_ray.stages.streaming import lateness_audit

    base = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60_000_000, "us")  # 1 min
    # arrival order 0..5; event times: a spike at arrival 1 makes
    # arrivals 2..4 late by 10/5/1 min; arrival 5 on time.
    ts = np.array([base, base + 10 * m, base + 0 * m, base + 5 * m,
                   base + 9 * m, base + 11 * m])
    df = pd.DataFrame({"oid": np.arange(6, dtype=np.int64), "ts": ts})
    out = (
        lateness_audit(
            ray.data.from_pandas(df).repartition(3),
            order_col="oid", ts_col="ts",
            delays=[timedelta(0), timedelta(minutes=2),
                    timedelta(minutes=6)],
            # 3 range buckets of 2 arrivals each: the wm carry for
            # arrivals 2+ comes from arrival 1 in an EARLIER bucket
            num_buckets=3,
        ).to_pandas().set_index("delay_s")
    )
    # lateness (min): [never, 0, 10, 5, 1, 0(new max)]
    assert out.loc[0, "n_late"] == 3        # >0: late 10, 5, 1
    assert out.loc[120, "n_late"] == 2      # >2min: 10, 5
    assert out.loc[360, "n_late"] == 1      # >6min: 10
    assert (out["n_total"] == 6).all()
    assert abs(out.loc[0, "late_frac"] - 0.5) < 1e-9


def test_streaming_asof_batch_size_invariance():
    import pandas as pd
    import ray.data

    from featherstore_ray.stages.streaming import streaming_asof

    rng = pd.date_range("2024-01-01", periods=200, freq="min")
    rows = []
    for i, t in enumerate(rng):
        rows.append({
            "event_id": i, "user_id": i % 5, "ts": t,
            "event_type": "click" if i % 3 else "purchase",
            "value": float(i),
        })
    df = pd.DataFrame(rows)
    outs = []
    for mb in (7, 512):
        out = streaming_asof(
            ray.data.from_pandas(df).repartition(4),
            entity_col="user_id", ts_col="ts", value_col="value",
            tiebreak="event_id", spine_type="purchase",
            feature_type="click", micro_batch_rows=mb, num_buckets=4,
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # zero-leakage invariant: matched click is never after the purchase
    m = outs[0]
    nn = m["value_asof"].notna()
    clicks = df[df["event_type"] == "click"].set_index("event_id")
    # every matched value is a click value with ts <= purchase ts
    for _, r in m[nn].iterrows():
        src = df[(df["value"] == r["value_asof"])
                 & (df["event_type"] == "click")].iloc[0]
        assert src["ts"] <= r["ts"] and src["user_id"] == r["user_id"]
