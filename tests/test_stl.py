"""stl_decompose: additive identity, phase capture, partition invariance."""

import numpy as np
import pandas as pd
import ray.data

from featherstore_ray.stages.window import stl_decompose


def _series():
    # hourly points over 6 days, two users, daily square-wave seasonality
    ts = pd.date_range("2024-01-01", periods=24 * 6, freq="h")
    rows = []
    for uid in (1, 2):
        for i, t in enumerate(ts):
            seas = 5.0 if t.hour < 12 else -5.0
            rows.append({"user_id": uid, "ts": t, "event_id": i,
                         "value": 100.0 + 0.1 * i + seas * (uid)})
    return pd.DataFrame(rows)


def test_stl_identity_and_phase():
    df = _series()
    out = stl_decompose(
        ray.data.from_pandas(df), entity_col="user_id", ts_col="ts",
        value_col="value", window=pd.Timedelta(hours=12),
        tiebreak="event_id", round_digits=None,
    ).to_pandas()
    # additive identity holds exactly pre-rounding
    np.testing.assert_allclose(
        out["trend"] + out["seasonal"] + out["resid"],
        out["value"], rtol=0, atol=1e-9,
    )
    # seasonal sign tracks the square wave away from the day edges
    mid = out[(out["ts"].dt.hour > 2) & (out["ts"].dt.hour < 10)]
    assert (mid["seasonal"] > 0).all()


def test_stl_partition_invariance():
    df = _series()
    one = stl_decompose(
        ray.data.from_pandas(df), entity_col="user_id", ts_col="ts",
        value_col="value", window=pd.Timedelta(hours=12),
        tiebreak="event_id",
    ).to_pandas()
    many = stl_decompose(
        ray.data.from_pandas(df).repartition(9), entity_col="user_id",
        ts_col="ts", value_col="value", window=pd.Timedelta(hours=12),
        tiebreak="event_id",
    ).to_pandas()
    key = ["user_id", "ts", "event_id"]
    pd.testing.assert_frame_equal(
        one.sort_values(key).reset_index(drop=True),
        many.sort_values(key).reset_index(drop=True),
    )
