"""dbscan: hand-built cluster geometry + partition invariance."""

import numpy as np
import pandas as pd
import ray.data

from featherstore_ray.stages.spatial import dbscan


def _points():
    # cluster A: 4 points in a tight square (all core at eps=1.5/minpts=4)
    a = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)]
    # cluster B: 4 points far away
    b = [(100.0, 100.0), (101.0, 100.0), (100.0, 101.0), (101.0, 101.0)]
    # border: within eps of one A-core point, neighborhood too small? no —
    # (2.0, 0) reaches (1,0),(1,1): |N|=3 < 4 -> non-core, but neighbors
    # core -> border, joins A's cluster (label min id = 0)
    border = [(2.0, 0.0)]
    # noise: reaches nothing
    noise = [(50.0, 50.0)]
    pts = a + b + border + noise
    return pd.DataFrame({
        "pid": np.arange(len(pts), dtype=np.int64),
        "x": [p[0] for p in pts],
        "y": [p[1] for p in pts],
    })


def test_dbscan_geometry():
    out = dbscan(
        ray.data.from_pandas(_points()), id_col="pid", x_col="x",
        y_col="y", eps=1.5, min_pts=4, num_buckets=4,
        driver_edge_cap=2_000_000,
    ).to_pandas().sort_values("pid").reset_index(drop=True)
    # 8 core + 1 border; noise point 9 omitted
    assert list(out["pid"]) == list(range(9))
    assert out["is_core"].sum() == 8
    assert (out.loc[out["pid"] <= 3, "cluster"] == 0).all()
    assert (out.loc[(out["pid"] >= 4) & (out["pid"] <= 7), "cluster"]
            == 4).all()
    brow = out[out["pid"] == 8].iloc[0]
    assert brow["cluster"] == 0 and not brow["is_core"]


def test_dbscan_distributed_route_matches():
    df = _points()
    a = dbscan(ray.data.from_pandas(df), id_col="pid", x_col="x",
               y_col="y", eps=1.5, min_pts=4, num_buckets=4,
               ).to_pandas().sort_values("pid").reset_index(drop=True)
    b = dbscan(ray.data.from_pandas(df).repartition(6), id_col="pid",
               x_col="x", y_col="y", eps=1.5, min_pts=4, num_buckets=4,
               driver_edge_cap=0,  # force distributed components
               ).to_pandas().sort_values("pid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
