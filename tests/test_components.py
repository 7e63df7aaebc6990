"""Connected components: numpy and distributed paths agree."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from featherstore_ray.stages.components import (
    components_numpy,
    connected_components,
)


def test_components_numpy_basic():
    # {1,2,3} via chain, {9,10} pair, isolated edge {7,7} self-loop
    a = np.array([1, 2, 10, 7])
    b = np.array([2, 3, 9, 7])
    nodes, labels = components_numpy(a, b)
    got = dict(zip(nodes, labels))
    assert got == {1: 1, 2: 1, 3: 1, 9: 9, 10: 9, 7: 7}


def test_components_numpy_min_is_numeric_not_lexicographic():
    # component {9, 10}: numeric min is 9 (str-min would be "10")
    nodes, labels = components_numpy(np.array([10]), np.array([9]))
    assert dict(zip(nodes, labels)) == {9: 9, 10: 9}


def test_components_numpy_strings():
    nodes, labels = components_numpy(
        np.array(["b", "c"], dtype=object), np.array(["a", "b"], dtype=object)
    )
    assert dict(zip(nodes, labels)) == {"a": "a", "b": "a", "c": "a"}


def test_distributed_matches_numpy(ray_session):
    rng = np.random.default_rng(3)
    # random graph: 300 nodes, 400 edges — several components, some chains
    a = rng.integers(0, 300, size=400)
    b = rng.integers(0, 300, size=400)
    nodes, labels = components_numpy(a, b)
    exp = pd.DataFrame({"node": nodes, "dup_group": labels})

    edges = ray.data.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    got = (
        connected_components(edges, num_buckets=8)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    exp = exp.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_long_chain_converges(ray_session):
    # worst case for hash-min: a single path graph 0-1-2-...-40
    n = 41
    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(np.arange(n - 1), pa.int64()),
                "b": pa.array(np.arange(1, n), pa.int64()),
            }
        )
    )
    out = connected_components(edges, num_buckets=4).to_pandas()
    assert (out["dup_group"] == 0).all()
    assert len(out) == n
