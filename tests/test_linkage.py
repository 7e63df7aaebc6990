"""Fuzzy string self-join (Ed-Join prefix filter) tests."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

import ray

from featherstore_ray.stages.linkage import fuzzy_join, levenshtein_batch


def _lev_ref(a: str, b: str) -> int:
    """Scalar unit-cost Levenshtein reference DP."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_batch_matches_reference():
    rng = np.random.default_rng(7)
    alpha = "abcde"
    strs = ["".join(rng.choice(list(alpha), size=rng.integers(0, 12)))
            for _ in range(40)]
    a = [strs[i] for i in rng.integers(0, 40, size=200)]
    b = [strs[i] for i in rng.integers(0, 40, size=200)]
    got = levenshtein_batch(pa.array(a, pa.string()), pa.array(b, pa.string()))
    want = np.array([_lev_ref(x, y) for x, y in zip(a, b)], np.int64)
    np.testing.assert_array_equal(got, want)


def test_levenshtein_batch_known_values():
    a = pa.array(["kitten", "", "abc", "flaw"], pa.string())
    b = pa.array(["sitting", "ab", "abc", "lawn"], pa.string())
    np.testing.assert_array_equal(
        levenshtein_batch(a, b), np.array([3, 2, 0, 2], np.int64))


def _brute_pairs(values, max_dist):
    """All distinct non-null value pairs within the edit distance."""
    names = sorted({v for v in values if v is not None})
    return sorted(
        (a, b, _lev_ref(a, b))
        for a, b in itertools.combinations(names, 2)
        if _lev_ref(a, b) <= max_dist
    )


@pytest.mark.parametrize("max_dist", [1, 2, 3])
def test_fuzzy_join_complete_vs_brute_force(ray_session, max_dist):
    """Prefix-filter blocking must lose NO pairs (Ed-Join completeness)."""
    rng = np.random.default_rng(max_dist)
    vocab = ["red", "blue", "hot", "cold", "gear", "pin", "cog", "ring"]
    values = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 4)))
        for _ in range(300)
    ]
    values += [None, "", "a"]  # null / too-short edge cases
    ds = ray.data.from_arrow(pa.table({"name": pa.array(values, pa.string())}))
    out = (
        fuzzy_join(ds, text_col="name", max_dist=max_dist, q=2, num_buckets=8)
        .to_pandas().sort_values(["name_a", "name_b"]).reset_index(drop=True)
    )
    got = list(zip(out["name_a"], out["name_b"], out["dist"]))
    assert got == _brute_pairs(values, max_dist)


def test_fuzzy_join_short_values_pair_via_length_bands(ray_session):
    """Values too short for the gram pigeonhole still pair (band keys)."""
    ds = ray.data.from_arrow(pa.table(
        {"name": pa.array(["cog", "hot", "a", "b", "", None], pa.string())}))
    out = (
        fuzzy_join(ds, text_col="name", max_dist=3, q=2)
        .to_pandas().sort_values(["name_a", "name_b"]).reset_index(drop=True)
    )
    got = list(zip(out["name_a"], out["name_b"], out["dist"]))
    assert got == _brute_pairs(["cog", "hot", "a", "b", ""], 3)
    assert ("cog", "hot", 2) in got  # zero shared grams — bands caught it


def test_fuzzy_join_empty_result_keeps_schema(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"name": pa.array(["aaaaaaaaaa", "zzzzzzzzzz"], pa.string())}))
    out = fuzzy_join(ds, text_col="name", max_dist=1, q=2)
    assert out.count() == 0
    # Dataset-level schema survives even with zero rows (Ray's to_pandas
    # drops columns on any empty dataset — a consumer quirk, not ours)
    assert sorted(out.schema().names) == ["dist", "name_a", "name_b"]


def test_entity_resolution_string_components(ray_session):
    """fuzzy pairs + string-keyed connected components + self-loops:
    transitive near-names share one lexicographic-min canon; isolated
    names canonicalize to themselves."""
    from featherstore_ray.stages.components import connected_components

    # chain: 'red pin' ~ 'red pinn' ~ 'red pinnn' (transitive), isolate far
    vals = ["red pin", "red pinn", "red pinnn", "zzzz qqqq xxxx", None]
    ds = ray.data.from_arrow(pa.table({"name": pa.array(vals, pa.string())}))
    pairs = fuzzy_join(ds, text_col="name", max_dist=1, q=2)

    def _self_edges(t):
        import pyarrow.compute as pc
        u = pc.unique(t["name"]).drop_null().cast(pa.string())
        return pa.table({"name_a": u, "name_b": u})

    edges = pairs.select_columns(["name_a", "name_b"]).union(
        ds.map_batches(_self_edges, batch_size=None, batch_format="pyarrow"))
    out = connected_components(
        edges, a_col="name_a", b_col="name_b",
        node_col="name", label_col="canon", num_buckets=4,
    ).to_pandas().set_index("name")["canon"]
    assert out["red pin"] == out["red pinn"] == out["red pinnn"] == "red pin"
    assert out["zzzz qqqq xxxx"] == "zzzz qqqq xxxx"
    assert len(out) == 4
