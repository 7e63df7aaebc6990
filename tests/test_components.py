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
        connected_components(edges, num_buckets=8, driver_edge_cap=0)
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
    out = connected_components(edges, num_buckets=4, driver_edge_cap=0).to_pandas()
    assert (out["dup_group"] == 0).all()
    assert len(out) == n


def test_pagerank_ring_and_star(ray_session):
    from featherstore_ray.stages.graph import pagerank

    # directed ring 0->1->...->9->0: symmetric, so rank stays uniform 1/10
    n = 10
    ring = pa.table(
        {
            "src": pa.array(np.arange(n), pa.int64()),
            "dst": pa.array((np.arange(n) + 1) % n, pa.int64()),
        }
    )
    out = (
        pagerank(ray.data.from_arrow(ring), iters=4, num_buckets=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    np.testing.assert_allclose(out["pr"], np.full(n, 0.1), atol=1e-9)
    # star 1..5 -> 0 (0 is dangling): hub accumulates, leaves drop to base
    star = pa.table(
        {
            "src": pa.array(np.arange(1, 6), pa.int64()),
            "dst": pa.array(np.zeros(5), pa.int64()),
        }
    )
    s1 = (
        pagerank(ray.data.from_arrow(star), iters=3, num_buckets=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    s2 = (
        pagerank(
            ray.data.from_arrow(star).repartition(4), iters=3, num_buckets=2
        )
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(s1, s2)  # partition/bucket invariant
    base = 0.15 / 6
    leaf = base  # leaves have no in-edges after iter 1
    np.testing.assert_allclose(s1["pr"].iloc[1:], np.full(5, leaf), atol=1e-6)
    # hub at iter >= 2: base + d * 5 * leaf (each leaf deg 1)
    np.testing.assert_allclose(
        s1["pr"].iloc[0], base + 0.85 * 5 * leaf, atol=1e-6
    )
    # duplicate edges ignored
    dup = pa.table(
        {
            "src": pa.array([1, 1, 2], pa.int64()),
            "dst": pa.array([0, 0, 0], pa.int64()),
        }
    )
    d1 = (
        pagerank(ray.data.from_arrow(dup), iters=2, num_buckets=2)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    nd = pa.table(
        {"src": pa.array([1, 2], pa.int64()), "dst": pa.array([0, 0], pa.int64())}
    )
    d2 = (
        pagerank(ray.data.from_arrow(nd), iters=2, num_buckets=2)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(d1, d2)


def test_triangle_count_brute_force(ray_session):
    """Oriented wedge-check result equals the O(n^3) brute count, with
    duplicate and self-loop edges in the input."""
    import itertools

    from featherstore_ray.stages.graph import triangle_count

    rng = np.random.default_rng(11)
    a = rng.integers(0, 25, 300)
    b = rng.integers(0, 25, 300)
    t = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    got = triangle_count(
        ray.data.from_arrow(t), num_buckets=8
    ).to_pandas()["triangles"][0]
    E = {tuple(sorted(p)) for p in zip(a.tolist(), b.tolist()) if p[0] != p[1]}
    nodes = sorted({x for e in E for x in e})
    brute = sum(
        1 for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in E and (x, z) in E and (y, z) in E
    )
    assert got == brute > 0


def test_triangle_count_no_triangles(ray_session):
    from featherstore_ray.stages.graph import triangle_count

    # a path graph has zero triangles
    t = pa.table({"a": pa.array([0, 1, 2, 3], pa.int64()),
                  "b": pa.array([1, 2, 3, 4], pa.int64())})
    got = triangle_count(
        ray.data.from_arrow(t), num_buckets=4
    ).to_pandas()["triangles"][0]
    assert got == 0


def test_adaptive_driver_path_matches_distributed(ray_session):
    """Default driver_edge_cap routes small edge sets through the numpy
    crossover; output must be identical to the distributed rounds."""
    rng = np.random.default_rng(11)
    a = rng.integers(0, 120, size=200)
    b = rng.integers(0, 120, size=200)
    edges = ray.data.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    fast = (connected_components(edges, num_buckets=4)
            .to_pandas().sort_values("node").reset_index(drop=True))
    slow = (connected_components(edges, num_buckets=4, driver_edge_cap=0)
            .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert fast["node"].dtype == np.int64


def test_adaptive_driver_path_strings(ray_session):
    edges = ray.data.from_arrow(
        pa.table({"a": ["x", "y", "q"], "b": ["y", "x", "q"]})
    )
    out = (connected_components(edges)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert list(out["node"]) == ["q", "x", "y"]
    assert list(out["dup_group"]) == ["q", "x", "x"]


def test_label_propagation_two_cliques(ray_session):
    """Two 4-cliques joined by one bridge edge: after 3 rounds each clique
    converges to its min node id; the bridge does not merge them."""
    import pandas as pd

    from featherstore_ray.stages.graph import label_propagation

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = c1 + c2 + [(3, 10)]
    t = pa.table({
        "a": pa.array([e[0] for e in edges], pa.int64()),
        "b": pa.array([e[1] for e in edges], pa.int64()),
    })
    out = (
        label_propagation(ray.data.from_arrow(t), iters=3, num_buckets=4)
        .to_pandas().set_index("node")["community"]
    )
    assert set(out.loc[[0, 1, 2]].unique()) == {0}
    assert set(out.loc[[11, 12, 13]].unique()) == {10}


def test_label_propagation_matches_unrolled_sql(ray_session):
    """Randomized graph vs the identical unrolled-CTE schedule in DuckDB
    (modal neighbor label, min-label ties, fixed 3 rounds)."""
    import duckdb
    import pandas as pd

    from featherstore_ray.stages.graph import label_propagation

    rng = np.random.default_rng(17)
    a = rng.integers(0, 60, 300)
    b = rng.integers(0, 60, 300)
    t = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    out = (
        label_propagation(ray.data.from_arrow(t).repartition(4),
                          iters=3, num_buckets=8)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", t)
    ctes = [
        "edges AS (SELECT DISTINCT a, b FROM e)",
        "sym AS (SELECT a AS src, b AS dst FROM edges"
        " UNION SELECT b, a FROM edges)",
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym)",
    ]
    for i in range(1, 4):
        ctes.append(
            f"v{i} AS (SELECT s.dst AS node, l.label, count(*) AS c "
            f"FROM sym s JOIN l{i-1} l ON l.node = s.src GROUP BY 1, 2)")
        ctes.append(
            f"l{i} AS (SELECT node, label FROM (SELECT node, label, "
            f"row_number() OVER (PARTITION BY node ORDER BY c DESC, label)"
            f" AS rn FROM v{i}) WHERE rn = 1)")
    exp = con.execute(
        "WITH " + ",".join(ctes)
        + " SELECT node, label AS community FROM l3 ORDER BY node"
    ).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_k_core_matches_pure_python_peeler(ray_session):
    """Fixed-schedule k-core peeling vs a reference peeler on a skewed
    graph (dense 60-node core + 440 degree-1 leaves): the cascade must
    drop every leaf and agree on surviving degrees exactly."""
    import numpy as np
    import pyarrow as pa

    from featherstore_ray.stages.graph import k_core

    def ref_kcore(a, b, k, iters):
        e = set()
        for x, y in zip(a, b):
            if x != y:
                e.add((x, y))
                e.add((y, x))
        for _ in range(iters):
            deg = {}
            for s, d in e:
                deg[s] = deg.get(s, 0) + 1
            alive = {n for n, dg in deg.items() if dg >= k}
            e = {(s, d) for s, d in e if s in alive and d in alive}
        deg = {}
        for s, d in e:
            deg[s] = deg.get(s, 0) + 1
        return dict(sorted(deg.items()))

    rng = np.random.default_rng(5)
    n = 3000
    core_a = rng.integers(0, 60, n)
    core_b = (core_a + rng.integers(1, 5, n)) % 60
    leaf = np.arange(60, 500)
    a = np.concatenate([core_a, leaf])
    b = np.concatenate([core_b, leaf % 60])
    t = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    got = (
        k_core(ray.data.from_arrow(t).repartition(4), k=8, iters=3,
               num_buckets=8)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    want = ref_kcore(a.tolist(), b.tolist(), 8, 3)
    assert 0 < len(got) < len(set(a) | set(b))
    assert list(got["node"]) == list(want.keys())
    assert list(got["degree"]) == list(want.values())


def test_link_prediction_exact_scores_and_cross_batch_dedupe():
    import numpy as np
    import pandas as pd
    import ray

    from featherstore_ray.stages.graph import link_prediction

    # items: i1 {1,2,3} (deg 3), i2 {1,2} (deg 2), i3 {1,2} duplicated
    # incidence rows split across blocks (dedupe must be global),
    # i4 {4} (deg 1 -> no pairs), i5 hub {1..5} dropped by max_degree=4
    rows = [
        ("i1", 1), ("i1", 2), ("i1", 3),
        ("i2", 1), ("i2", 2),
        ("i3", 1), ("i3", 2), ("i3", 1), ("i3", 2),  # dupes
        ("i4", 4),
        ("i5", 1), ("i5", 2), ("i5", 3), ("i5", 4), ("i5", 5),
    ]
    df = pd.DataFrame(rows, columns=["item", "node"])
    out = (
        link_prediction(
            ray.data.from_pandas(df).repartition(5),
            item_col="item", node_col="node",
            min_common=1, max_degree=4, num_buckets=2,
        )
        .to_pandas().set_index(["a", "b"]).sort_index()
    )
    # pair (1,2): i1 (deg 3) + i2, i3 (deg 2 each) -> cn=3
    assert out.loc[(1, 2), "cn"] == 3
    aa = 1 / np.log(3) + 2 * (1 / np.log(2))
    ra = 1 / 3 + 2 * (1 / 2)
    assert abs(out.loc[(1, 2), "adamic_adar"] - round(aa, 6)) < 1e-9
    assert abs(out.loc[(1, 2), "resource_alloc"] - round(ra, 6)) < 1e-9
    # pairs (1,3) and (2,3): only i1
    assert out.loc[(1, 3), "cn"] == 1 and out.loc[(2, 3), "cn"] == 1
    # hub i5 contributes nothing; node 5 appears in no pair
    assert not any(5 in k for k in out.index)
    # deg-1 item forms no pair; node 4 absent
    assert not any(4 in k for k in out.index)
