"""funnel + inverted_index tests (order semantics, cross-block dedupe)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from featherstore_ray.stages.aggregate import funnel
from featherstore_ray.stages.text import inverted_index


def _ts(s):
    return pd.Timestamp(s)


def test_funnel_order_and_strictness(ray_session):
    rows = [
        # u1 completes in order
        (1, _ts("2024-01-01 00:00"), "view"),
        (1, _ts("2024-01-01 01:00"), "click"),
        (1, _ts("2024-01-01 02:00"), "purchase"),
        # u2 clicked BEFORE viewing — click never counts
        (2, _ts("2024-01-01 01:00"), "click"),
        (2, _ts("2024-01-01 02:00"), "view"),
        # u3 click at the SAME instant as view — strictly-after excludes
        (3, _ts("2024-01-01 00:00"), "view"),
        (3, _ts("2024-01-01 00:00"), "click"),
        # u4 view only
        (4, _ts("2024-01-01 00:00"), "view"),
        # u5 second click qualifies even though first was early
        (5, _ts("2024-01-01 01:00"), "click"),
        (5, _ts("2024-01-01 02:00"), "view"),
        (5, _ts("2024-01-01 03:00"), "click"),
        (5, _ts("2024-01-01 04:00"), "purchase"),
        # noise event type is ignored
        (1, _ts("2024-01-01 00:30"), "error"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    out = funnel(
        ray.data.from_arrow(t), entity_col="user_id", ts_col="ts",
        type_col="event_type", stages=["view", "click", "purchase"],
        num_buckets=4,
    ).to_pandas().set_index("stage")["users"]
    assert out["view"] == 5
    assert out["click"] == 2      # u1 and u5 only
    assert out["purchase"] == 2   # u1 and u5


def test_inverted_index_dedup_across_blocks(ray_session):
    t1 = pa.table({"doc_id": pa.array([3, 1], pa.int64()),
                   "text": pa.array(["b a  a", "a c"], pa.string())})
    t2 = pa.table({"doc_id": pa.array([2], pa.int64()),
                   "text": pa.array(["a b"], pa.string())})
    ds = ray.data.from_arrow(t1).union(ray.data.from_arrow(t2))
    out = inverted_index(ds, num_buckets=4).to_pandas().set_index("token")
    assert out.loc["a", "df"] == 3 and out.loc["a", "postings"] == "1,2,3"
    assert out.loc["b", "df"] == 2 and out.loc["b", "postings"] == "2,3"
    assert out.loc["c", "df"] == 1 and out.loc["c", "postings"] == "1"
    assert "" not in out.index  # double space never emits an empty token


def test_skyline_matches_brute_force(ray_session):
    from featherstore_ray.stages.misc import skyline

    rng = np.random.default_rng(5)
    # anti-correlated + duplicated coordinates to exercise tie semantics
    price = np.round(rng.uniform(0, 10, 500), 1)
    size = np.round(10 - price + rng.normal(0, 2, 500), 0)
    t = pa.table({"price": pa.array(price), "size": pa.array(size),
                  "id": pa.array(np.arange(500), pa.int64())})
    out = skyline(
        ray.data.from_arrow(t), min_col="price", max_col="size",
        keep_cols=["id"],
    ).to_pandas()
    pts = list(zip(price, size, range(500)))
    brute = {
        i for p, s, i in pts
        if not any(
            q <= p and r >= s and (q < p or r > s) for q, r, _ in pts)
    }
    assert set(out["id"]) == brute
    assert len(brute) > 3


def test_transition_counts_manual(ray_session):
    from featherstore_ray.stages.aggregate import transition_counts

    t = pa.table({
        "u": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array(pd.to_datetime([
            "2024-01-01", "2024-01-02", "2024-01-03",
            "2024-01-01", "2024-01-02", "2024-01-01"])),
        "etype": pa.array(["a", "b", "a", "a", "b", "a"], pa.string()),
        "eid": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })
    out = transition_counts(
        ray.data.from_arrow(t), entity_col="u", ts_col="ts",
        type_col="etype", order_col="eid", num_buckets=4,
    ).to_pandas().set_index(["prev_type", "next_type"])["n"]
    assert out[("a", "b")] == 2
    assert out[("b", "a")] == 1
    assert len(out) == 2  # u3's single event contributes nothing
