"""ε-band (non-equi numeric) join vs DuckDB, incl. boundary/null cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from featherstore_ray.stages.join import band_join


def _compare(lt: pa.Table, rt: pa.Table, eps: float, num_buckets=8):
    out = band_join(
        ray.data.from_arrow(lt),
        ray.data.from_arrow(rt),
        left_val="lv",
        right_val="rv",
        eps=eps,
        left_cols=["lid", "lv"],
        right_cols=["rid", "rv"],
        num_buckets=num_buckets,
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    exp = con.execute(
        f"""
        SELECT l.lid, l.lv, r.rid, r.rv FROM l, r
        WHERE r.rv BETWEEN l.lv - {eps!r} AND l.lv + {eps!r}
        """
    ).df()
    cols = ["lid", "rid", "lv", "rv"]
    o = out[cols].sort_values(cols).reset_index(drop=True)
    x = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(o) == len(x)
    pd.testing.assert_frame_equal(o, x, check_dtype=False)
    return len(o)


def test_band_join_random_matches_duckdb(ray_session):
    rng = np.random.default_rng(11)
    lt = pa.table(
        {
            "lid": pa.array(np.arange(400), pa.int64()),
            "lv": pa.array(np.round(rng.uniform(-100, 100, 400), 2)),
        }
    )
    rt = pa.table(
        {
            "rid": pa.array(np.arange(150), pa.int64()),
            "rv": pa.array(np.round(rng.uniform(-100, 100, 150), 2)),
        }
    )
    n = _compare(lt, rt, 3.0)
    assert n > 100  # non-trivial overlap actually exercised


def test_band_join_exact_boundaries(ray_session):
    """Values sitting exactly on band edges and exactly eps apart: each
    pair must appear exactly once (the claimed-band filter) and pairs at
    distance exactly eps are INCLUDED (BETWEEN is closed)."""
    eps = 2.5
    vals = np.array([-5.0, -2.5, 0.0, 2.5, 5.0, 7.5])
    lt = pa.table({"lid": pa.array(np.arange(6), pa.int64()),
                   "lv": pa.array(vals)})
    rt = pa.table({"rid": pa.array(np.arange(6), pa.int64()),
                   "rv": pa.array(vals)})
    _compare(lt, rt, eps, num_buckets=4)


def test_band_join_nulls_match_nothing(ray_session):
    lt = pa.table({"lid": pa.array([0, 1], pa.int64()),
                   "lv": pa.array([1.0, None])})
    rt = pa.table({"rid": pa.array([0, 1], pa.int64()),
                   "rv": pa.array([None, 1.5])})
    n = _compare(lt, rt, 1.0)
    assert n == 1  # only (0, 1)
