"""radius_join: brute-force parity, boundary inclusivity, null coords."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from featherstore_ray.stages.spatial import radius_join


def _brute(lt: pd.DataFrame, rt: pd.DataFrame, r: float) -> set:
    out = set()
    for _, l in lt.dropna(subset=["lx", "ly"]).iterrows():
        for _, g in rt.dropna(subset=["rx", "ry"]).iterrows():
            dx, dy = l["lx"] - g["rx"], l["ly"] - g["ry"]
            if dx * dx + dy * dy <= r * r:
                out.add((int(l["lid"]), int(g["rid"])))
    return out


def _run(lt: pd.DataFrame, rt: pd.DataFrame, r: float) -> pd.DataFrame:
    return radius_join(
        ray.data.from_pandas(lt).repartition(3),
        ray.data.from_pandas(rt).repartition(2),
        left_x="lx", left_y="ly", right_x="rx", right_y="ry",
        radius=r,
        left_cols=["lid", "lx", "ly"], right_cols=["rid", "rx", "ry"],
        num_buckets=4,
    ).to_pandas()


def test_radius_join_bruteforce_parity():
    rng = np.random.default_rng(7)
    lt = pd.DataFrame({
        "lid": np.arange(80),
        "lx": rng.uniform(0, 50, 80),
        "ly": rng.uniform(0, 50, 80),
    })
    rt = pd.DataFrame({
        "rid": np.arange(60),
        "rx": rng.uniform(0, 50, 60),
        "ry": rng.uniform(0, 50, 60),
    })
    out = _run(lt, rt, 5.0)
    got = set(zip(out["lid"].astype(int), out["rid"].astype(int)))
    assert got == _brute(lt, rt, 5.0)
    # dist column is the exact sqrt of the exact squared distance
    dx = out["lx"] - out["rx"]
    dy = out["ly"] - out["ry"]
    assert (out["dist"].to_numpy()
            == np.sqrt((dx * dx + dy * dy).to_numpy())).all()
    # no duplicate pairs from the 3x3 replication
    assert len(out) == len(got)


def test_radius_join_boundary_inclusive_and_nulls():
    lt = pd.DataFrame({
        "lid": [0, 1, 2],
        "lx": [0.0, 10.0, np.nan],
        "ly": [0.0, 10.0, 5.0],
    })
    rt = pd.DataFrame({
        "rid": [0, 1, 2],
        "rx": [3.0, 10.0, 0.0],
        "ry": [4.0, 13.0, np.nan],
    })
    # (0,0)->(3,4): dist exactly 5.0 — inclusive; null coords match nothing
    out = _run(lt, rt, 5.0)
    got = set(zip(out["lid"].astype(int), out["rid"].astype(int)))
    assert got == {(0, 0), (1, 1)}
    assert float(out.set_index("lid").loc[0, "dist"]) == 5.0


def test_radius_join_negative_coords_cell_boundaries():
    # points straddling cell 0 / cell -1 boundaries must still pair
    lt = pd.DataFrame({"lid": [0], "lx": [-0.5], "ly": [-0.5]})
    rt = pd.DataFrame({"rid": [0, 1], "rx": [0.5, 100.0],
                       "ry": [0.5, 100.0]})
    out = _run(lt, rt, 2.0)
    assert set(out["rid"].astype(int)) == {0}


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_radius_join_property(data):
    nl = data.draw(st.integers(1, 25))
    nr = data.draw(st.integers(1, 25))
    r = data.draw(st.sampled_from([0.5, 1.0, 3.0, 10.0]))
    coords = st.floats(-20, 20, allow_nan=False, width=32)
    lt = pd.DataFrame({
        "lid": np.arange(nl),
        "lx": [data.draw(coords) for _ in range(nl)],
        "ly": [data.draw(coords) for _ in range(nl)],
    })
    rt = pd.DataFrame({
        "rid": np.arange(nr),
        "rx": [data.draw(coords) for _ in range(nr)],
        "ry": [data.draw(coords) for _ in range(nr)],
    })
    out = _run(lt, rt, r)
    if len(out) == 0:
        got = set()
    else:
        got = set(zip(out["lid"].astype(int), out["rid"].astype(int)))
        assert len(out) == len(got)
    assert got == _brute(lt, rt, r)
