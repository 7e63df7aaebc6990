"""SCD-2 history build vs DuckDB, incl. null attrs and same-ts changes."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.stages.latest import scd2_history


def _compare(t: pa.Table, num_buckets=4):
    out = scd2_history(
        ray.data.from_arrow(t),
        entity_col="k",
        ts_col="ts",
        attr_cols=["attr"],
        tiebreak="seq",
        num_buckets=num_buckets,
    ).to_pandas()
    con = duckdb.connect()
    con.register("log", t)
    exp = con.execute(
        """
        WITH c AS (
            SELECT k, ts, seq, attr FROM (
                SELECT k, ts, seq, attr,
                       lag(attr) OVER w AS prev, row_number() OVER w AS rn
                FROM log WHERE k IS NOT NULL
                WINDOW w AS (PARTITION BY k ORDER BY ts, seq)
            ) WHERE rn = 1 OR prev IS DISTINCT FROM attr
        )
        SELECT k, attr, ts AS valid_from, lead(ts) OVER w2 AS valid_to,
               lead(ts) OVER w2 IS NULL AS is_current
        FROM c WINDOW w2 AS (PARTITION BY k ORDER BY ts, seq)
        """
    ).df()
    cols = sorted(out.columns)
    assert sorted(exp.columns) == cols
    o = out[cols].sort_values(["k", "valid_from"]).reset_index(drop=True)
    x = exp[cols].sort_values(["k", "valid_from"]).reset_index(drop=True)
    assert len(o) == len(x)
    pd.testing.assert_frame_equal(o[cols], x[cols], check_dtype=False)
    return o


def _log(ks, tss, attrs):
    return pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "ts": pa.array(np.array(tss, dtype="datetime64[us]")),
            "seq": pa.array(list(range(len(ks))), pa.int64()),
            "attr": pa.array(attrs, pa.string()),
        }
    )


def test_scd2_basic(ray_session):
    t = _log(
        [1, 1, 1, 1, 2, 2],
        ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
         "2024-01-01", "2024-01-05"],
        ["a", "a", "b", "b", "x", "x"],
    )
    o = _compare(t)
    # k=1 compacts to [a: 01-01..01-03) [b: 01-03..open); k=2 to one row
    assert len(o) == 3
    assert o.loc[o["is_current"], "valid_to"].isna().all()
    assert int(o["is_current"].sum()) == 2


def test_scd2_null_attr_and_null_key(ray_session):
    """NULL attr values compare IS DISTINCT FROM (null→null is NOT a
    change; null→value is); a NULL entity key is dropped entirely."""
    t = _log(
        [1, 1, 1, None, 3],
        ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-01",
         "2024-01-01"],
        [None, None, "v", "z", None],
    )
    o = _compare(t)
    assert len(o) == 3  # k=1: (null, v); k=3: (null); null key dropped
    assert set(o["k"]) == {1, 3}


def test_scd2_randomized(ray_session):
    rng = np.random.default_rng(5)
    n = 3000
    base = np.datetime64("2024-01-01", "us")
    t = _log(
        rng.integers(0, 40, n).tolist(),
        (base + rng.integers(0, 10**9, n).astype("timedelta64[us]")).tolist(),
        [f"s{v}" for v in rng.integers(0, 3, n)],
    )
    _compare(t, num_buckets=8)
