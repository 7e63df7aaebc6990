"""ANN top-k, grouped aggregation, and the synthetic tokens source."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data

from featherstore_ray.sources.tokens import tokens_dataset, tokens_parquet
from featherstore_ray.stages.aggregate import grouped_aggregate
from featherstore_ray.stages.ann import cosine_topk, lsh_topk

EMB = "/root/testdata/sf0.001/embeddings.parquet"
LI = "/root/testdata/sf0.001/lineitem.parquet"


def test_cosine_topk_matches_duckdb():
    emb = pq.read_table(EMB)
    queries = emb.filter(pc.is_in(emb["vec_id"], value_set=pa.array([0, 1, 2])))
    out = cosine_topk(
        ray.data.from_arrow(emb), queries, k=5, concurrency=2
    ).to_pandas()
    con = duckdb.connect()
    con.register("embeddings", emb)
    exp = con.execute(
        """
        WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings
                   WHERE vec_id IN (0,1,2)),
        s AS (SELECT qid, vec_id,
                     round(list_cosine_similarity(qe, embedding), 4) AS score
              FROM q, embeddings WHERE vec_id != qid)
        SELECT qid AS query_id, vec_id, score FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
                    ORDER BY score DESC, vec_id) rn FROM s)
        WHERE rn <= 5
        """
    ).df()
    m = out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    e = exp.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    assert len(m) == len(e) == 15
    assert (m["vec_id"].to_numpy() == e["vec_id"].to_numpy()).all()
    np.testing.assert_allclose(m["score"], e["score"], atol=2e-4)


def test_lsh_topk_reasonable_recall():
    emb = pq.read_table(EMB)
    queries = emb.filter(pc.is_in(emb["vec_id"], value_set=pa.array([0, 1, 2])))
    exact = cosine_topk(ray.data.from_arrow(emb), queries, k=5).to_pandas()
    approx = lsh_topk(
        ray.data.from_arrow(emb), queries, k=5, num_planes=4
    ).to_pandas()
    # bucketed search returns a subset of candidates; overlap should be nonzero
    inter = set(map(tuple, approx[["query_id", "vec_id"]].values)) & set(
        map(tuple, exact[["query_id", "vec_id"]].values)
    )
    assert len(inter) >= 3


def test_grouped_aggregate_matches_duckdb():
    li = pq.read_table(LI)
    out = grouped_aggregate(
        ray.data.from_arrow(li),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "avg_price": ("l_extendedprice", "mean"),
            "max_disc": ("l_discount", "max"),
            "n": ("l_orderkey", "count"),
        },
        round_digits=4,
        num_buckets=4,
    ).to_pandas()
    con = duckdb.connect()
    con.register("lineitem", li)
    exp = con.execute(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(max(l_discount), 4) AS max_disc,
               count(l_orderkey) AS n
        FROM lineitem GROUP BY 1, 2
        """
    ).df()
    m = out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    e = exp.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    assert len(m) == len(e)
    np.testing.assert_allclose(m["sum_qty"], e["sum_qty"], atol=1e-3)
    np.testing.assert_allclose(m["avg_price"], e["avg_price"], atol=1e-3)
    assert (m["n"].to_numpy() == e["n"].to_numpy()).all()


def test_tokens_deterministic_and_valid(tmp_path):
    d1 = tokens_parquet(3000, cache_dir=str(tmp_path / "a"))
    d2 = tokens_parquet(3000, cache_dir=str(tmp_path / "b"))
    t1 = pq.read_table(d1)
    t2 = pq.read_table(d2)
    assert t1.equals(t2)  # byte-identical across generations
    assert t1.num_rows == 3000
    # n_tok invariant: equals len(tokens) on every row
    n_tok = t1["n_tok"].to_numpy()
    lens = pc.list_value_length(t1["tokens"]).to_numpy()
    assert (n_tok == lens).all()
    assert n_tok.min() >= 1 and n_tok.max() <= 512
    # skew present: hot doc_ids recur
    vc = t1.to_pandas()["doc_id"].value_counts()
    assert vc.iloc[0] > 50
    assert t1.to_pandas()["source"].value_counts().iloc[0] > 1000

    ds = tokens_dataset(3000)
    assert ds.count() == 3000
    assert pa.schema(ds.schema().base_schema).field("tokens").type == pa.list_(
        pa.int32()
    )


def test_ivf_topk_recall_and_exactness():
    from featherstore_ray.stages.ann import ivf_topk

    emb = pq.read_table(EMB)
    queries = emb.filter(pc.is_in(emb["vec_id"], value_set=pa.array([0, 1, 2])))
    exact = cosine_topk(ray.data.from_arrow(emb), queries, k=5).to_pandas()
    # full probe = exact result
    full = ivf_topk(
        ray.data.from_arrow(emb), queries, k=5, n_centroids=8, n_probe=8
    ).to_pandas()
    e = exact.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    f = full.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    assert (e["vec_id"].to_numpy() == f["vec_id"].to_numpy()).all()
    # partial probe: decent recall, deterministic
    approx = ivf_topk(
        ray.data.from_arrow(emb), queries, k=5, n_centroids=8, n_probe=3
    ).to_pandas()
    inter = set(map(tuple, approx[["query_id", "vec_id"]].values)) & set(
        map(tuple, exact[["query_id", "vec_id"]].values)
    )
    assert len(inter) >= 8  # >= ~half of 15 exact hits recovered
    approx2 = ivf_topk(
        ray.data.from_arrow(emb), queries, k=5, n_centroids=8, n_probe=3
    ).to_pandas()
    pd.testing.assert_frame_equal(
        approx.sort_values(["query_id", "vec_id"]).reset_index(drop=True),
        approx2.sort_values(["query_id", "vec_id"]).reset_index(drop=True),
    )


def test_lsh_dup_pairs_subset_of_exact():
    import pyarrow.parquet as pq

    from featherstore_ray.stages.ann import embedding_dup_pairs, lsh_dup_pairs

    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    exact = (
        embedding_dup_pairs(ray.data.from_arrow(emb), emb, threshold=0.4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    approx = (
        lsh_dup_pairs(ray.data.from_arrow(emb), threshold=0.4, num_buckets=8)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    exact_pairs = {(a, b): s for a, b, s in exact.itertuples(index=False)}
    # precision 1.0: every LSH pair is an exact pair with the same score
    for a, b, s in approx.itertuples(index=False):
        assert (a, b) in exact_pairs, (a, b)
        assert abs(exact_pairs[(a, b)] - s) < 1e-9
    # usable recall on this corpus
    if len(exact):
        assert len(approx) / len(exact) >= 0.5, (len(approx), len(exact))
    # deterministic
    approx2 = (
        lsh_dup_pairs(ray.data.from_arrow(emb), threshold=0.4, num_buckets=8)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(approx, approx2)


def test_kmeans_assign_separated_clusters(ray_session):
    from featherstore_ray.stages.ann import kmeans_assign

    rng = np.random.default_rng(7)
    a = rng.normal(0.0, 0.05, (40, 4)) + np.array([10, 0, 0, 0])
    b = rng.normal(0.0, 0.05, (40, 4)) + np.array([-10, 0, 0, 0])
    vecs = np.concatenate([a, b])
    t = pa.table(
        {
            "vec_id": np.arange(80, dtype=np.int64),
            "embedding": pa.array(list(vecs.astype(np.float32))),
        }
    )
    out = (
        kmeans_assign(ray.data.from_arrow(t).repartition(4), k=2, iters=3)
        .to_pandas()
        .sort_values("vec_id")
    )
    cl = out["cluster"].to_numpy()
    # both well-separated blobs end up pure (labels are 0/1 in some order)
    assert len(set(cl[:40])) == 1 and len(set(cl[40:])) == 1
    assert cl[0] != cl[40]


def test_kmeans_assign_batch_invariant_and_empty_cluster(ray_session):
    from featherstore_ray.stages.ann import kmeans_assign

    # only two distinct points but k=3: init takes vec 0,1,2 where vec 2
    # duplicates vec 0 -> cluster 2 never wins a point (tie -> lowest id),
    # stays on its initial centroid, and the run must not crash
    pts = np.array([[0.0, 0.0], [5.0, 5.0], [0.0, 0.0], [5.0, 5.0]] * 5)
    t = pa.table(
        {
            "vec_id": np.arange(len(pts), dtype=np.int64),
            "embedding": pa.array(list(pts.astype(np.float32))),
        }
    )
    one = (
        kmeans_assign(ray.data.from_arrow(t), k=3, iters=2)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    many = (
        kmeans_assign(ray.data.from_arrow(t).repartition(5), k=3, iters=2)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)
    assert set(one["cluster"]) == {0, 1}


def test_semantic_dedup_single_cluster_matches_bruteforce(ray_session):
    from featherstore_ray.stages.ann import semantic_dedup

    rng = np.random.default_rng(21)
    base = rng.normal(size=(30, 6))
    # rows 30..44 are near-copies of rows 0..14 (should be marked dup)
    vecs = np.concatenate([base, base[:15] + rng.normal(0, 1e-3, (15, 6))])
    t = pa.table(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": pa.array(list(vecs.astype(np.float32))),
        }
    )
    thr = 0.9
    got = (
        semantic_dedup(
            ray.data.from_arrow(t).repartition(4),
            k=1, iters=1, threshold=thr, block_rows=7,  # force strip path
        )
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    # brute force: max cosine vs any lower id (float64, rounded like engine)
    m = vecs.astype(np.float32).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    exp_ms = np.full(len(m), -1.0)
    for i in range(1, len(m)):
        exp_ms[i] = round(sims[i, :i].max(), 4)
    np.testing.assert_allclose(got["max_sim"], exp_ms, atol=1e-9)
    assert (got["is_dup"].to_numpy() == (exp_ms >= thr)).all()
    assert got["is_dup"].to_numpy()[30:].all()  # the planted near-copies


def test_semantic_dedup_partition_invariant_and_subset(ray_session):
    from featherstore_ray.stages.ann import semantic_dedup

    rng = np.random.default_rng(22)
    vecs = rng.normal(size=(60, 5))
    vecs[45:] = vecs[:15] * 1.001  # dups across the id space
    t = pa.table(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": pa.array(list(vecs.astype(np.float32))),
        }
    )
    kw = dict(k=3, iters=2, threshold=0.95)
    one = (
        semantic_dedup(ray.data.from_arrow(t), **kw)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    many = (
        semantic_dedup(ray.data.from_arrow(t).repartition(6), **kw)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)
    # clustered dup set is a subset of the global (k=1) dup set
    glob = (
        semantic_dedup(ray.data.from_arrow(t), k=1, iters=1, threshold=0.95)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert set(one.loc[one["is_dup"], "vec_id"]) <= set(
        glob.loc[glob["is_dup"], "vec_id"]
    )


def test_co_occurrence_exact_and_invariant(ray_session):
    from featherstore_ray.stages.aggregate import co_occurrence

    # baskets: {1,2,3}, {1,2}, {2,3}, {1,2} (with dup 2), {5}
    g = [10, 10, 10, 11, 11, 12, 12, 13, 13, 13, 14]
    i = [1, 2, 3, 1, 2, 2, 3, 1, 2, 2, 5]
    t = pa.table(
        {"o": pa.array(g, pa.int64()), "p": pa.array(i, pa.int64())}
    )
    kw = dict(group_col="o", item_col="p", num_buckets=4)
    one = (
        co_occurrence(ray.data.from_arrow(t), **kw)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    many = (
        co_occurrence(ray.data.from_arrow(t).repartition(6), **kw)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)
    got = {(r.a, r.b): r.n for r in one.itertuples()}
    assert got == {(1, 2): 3, (1, 3): 1, (2, 3): 2}
    filt = (
        co_occurrence(ray.data.from_arrow(t), min_count=2, **kw)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert {(r.a, r.b): r.n for r in filt.itertuples()} == {(1, 2): 3, (2, 3): 2}


def test_group_corr_matches_duckdb_both_finals():
    from featherstore_ray.stages.aggregate import group_corr

    li = pq.read_table(LI)
    con = duckdb.connect()
    con.register("lineitem", li)
    exp = con.execute(
        """SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6)
               AS corr_xy FROM lineitem GROUP BY 1 ORDER BY 1"""
    ).df()
    for final in ("driver", "shuffle"):
        out = group_corr(
            ray.data.from_arrow(li), ["l_returnflag"],
            "l_quantity", "l_extendedprice",
            final=final, num_buckets=4,
        ).to_pandas().sort_values("l_returnflag").reset_index(drop=True)
        np.testing.assert_allclose(out["corr_xy"], exp["corr_xy"], atol=2e-6)


def test_group_corr_degenerate_groups():
    from featherstore_ray.stages.aggregate import group_corr

    t = pa.table({
        "g": ["a", "a", "a", "b", "c", "c"],
        "x": [1.0, 2.0, 3.0, 5.0, 7.0, 7.0],   # c: zero x variance
        "y": [2.0, 4.0, 6.0, 1.0, 3.0, 9.0],
    })
    out = group_corr(
        ray.data.from_arrow(t), ["g"], "x", "y", num_buckets=2
    ).to_pandas().set_index("g")["corr_xy"]
    assert out["a"] == 1.0
    assert np.isnan(out["b"]) and np.isnan(out["c"])


def test_group_linear_fit_matches_polyfit():
    from featherstore_ray.stages.aggregate import group_linear_fit

    rng = np.random.default_rng(7)
    g = np.repeat(["a", "b", "c"], 50)
    x = np.tile(np.arange(50, dtype=np.float64), 3)
    y = np.where(g == "a", 2.0 * x + 1.0,
                 np.where(g == "b", -0.5 * x + 3.0, rng.normal(size=150)))
    t = pa.table({"g": g, "x": x, "y": y})
    for final in ("driver", "shuffle"):
        out = group_linear_fit(
            ray.data.from_arrow(t), ["g"], "x", "y",
            final=final, num_buckets=4,
        ).to_pandas().set_index("g")
        for key in ("a", "b", "c"):
            sl, ic = np.polyfit(x[g == key], y[g == key], 1)
            assert abs(out.loc[key, "slope"] - sl) < 1e-6
            assert abs(out.loc[key, "intercept"] - ic) < 1e-6
        assert out.loc["a", "r2"] == 1.0 and out.loc["b", "r2"] == 1.0
        assert (out["n"] == 50).all()


def test_group_linear_fit_degenerate():
    from featherstore_ray.stages.aggregate import group_linear_fit

    t = pa.table({
        "g": ["a", "b", "b", "c", "c"],
        "x": [1.0, 4.0, 4.0, 1.0, 2.0],   # a: n=1; b: zero x variance
        "y": [2.0, 1.0, 3.0, 5.0, 5.0],   # c: zero y variance → r2 null
    })
    out = group_linear_fit(
        ray.data.from_arrow(t), ["g"], "x", "y", num_buckets=2
    ).to_pandas().set_index("g")
    assert np.isnan(out.loc["a", "slope"]) and np.isnan(out.loc["b", "slope"])
    assert out.loc["c", "slope"] == 0.0
    assert np.isnan(out.loc["c", "r2"])


def test_group_entropy_matches_manual():
    from featherstore_ray.stages.aggregate import group_entropy

    t = pa.table({
        "g": ["u"] * 4 + ["v"] * 3 + ["w"],
        "c": ["a", "a", "b", "b", "a", "a", "a", "x"],
    })
    out = group_entropy(
        ray.data.from_arrow(t), ["g"], "c", num_buckets=2
    ).to_pandas().set_index("g")["entropy"]
    assert out["u"] == round(np.log(2), 6)  # 50/50 split
    assert out["v"] == 0.0                  # single category
    assert out["w"] == 0.0


def test_histogram_matches_duckdb():
    from featherstore_ray.stages.aggregate import histogram

    ev = pq.read_table("/root/testdata/sf0.001/events.parquet")
    out = histogram(
        ray.data.from_arrow(ev), "value", num_bins=10
    ).to_pandas().sort_values("bin").reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", ev)
    exp = con.execute("""
        WITH mm AS (SELECT CAST(min(value) AS DOUBLE) mn,
                           CAST(max(value) AS DOUBLE) mx
                    FROM events WHERE value IS NOT NULL),
        b AS (SELECT CAST(least(floor((CAST(value AS DOUBLE) - mn)
                                      / (mx - mn) * CAST(10 AS DOUBLE)),
                                CAST(9 AS DOUBLE)) AS BIGINT) AS bin
              FROM events, mm WHERE value IS NOT NULL)
        SELECT bin, count(*) AS cnt FROM b GROUP BY bin ORDER BY bin
    """).df()
    assert (out["bin"].to_numpy() == exp["bin"].to_numpy()).all()
    assert (out["cnt"].to_numpy() == exp["cnt"].to_numpy()).all()
    assert int(out["cnt"].sum()) == ev.num_rows
    assert (out["lo"] < out["hi"]).all()


def test_group_mode_tiebreak_lexicographic():
    from featherstore_ray.stages.aggregate import group_mode

    t = pa.table({
        "g": ["u", "u", "u", "u", "v", "v", "w"],
        "c": ["b", "b", "a", "a", "z", None, "q"],
    })
    out = group_mode(
        ray.data.from_arrow(t), ["g"], "c", num_buckets=2
    ).to_pandas().set_index("g")
    assert out.loc["u", "mode"] == "a"          # tie 2-2 → lexicographic min
    assert out.loc["u", "mode_count"] == 2
    assert out.loc["v", "mode"] == "z"          # nulls dropped
    assert out.loc["v", "mode_count"] == 1
    assert out.loc["w", "mode"] == "q"


def test_cohort_retention_manual():
    from featherstore_ray.stages.aggregate import cohort_retention

    day = 86_400_000_000  # µs
    ts = pa.array(
        [0, day // 2, 2 * day,          # e1: day0 twice (dedup), day2
         day, day,                      # e2: day1 twice (dedup)
         0, day, 2 * day],              # e3: days 0,1,2
        pa.timestamp("us"),
    )
    t = pa.table({"e": [1, 1, 1, 2, 2, 3, 3, 3], "ts": ts})
    out = cohort_retention(
        ray.data.from_arrow(t), entity_col="e", ts_col="ts", num_buckets=2
    ).to_pandas()
    out["d"] = out["cohort_day"].astype("datetime64[us]").astype("int64") // day
    cells = {(r.d, r.day_offset): r.users for r in out.itertuples()}
    # cohort day0 = {e1, e3}: offsets 0 (both), 1 (e3), 2 (both)
    # cohort day1 = {e2}: offset 0 only
    assert cells == {(0, 0): 2, (0, 1): 1, (0, 2): 2, (1, 0): 1}


def test_cube_levels():
    from featherstore_ray.stages.aggregate import cube

    t = pa.table({
        "a": ["x", "x", "y"],
        "b": ["p", "q", "p"],
        "v": [1.0, 2.0, 4.0],
    })
    out = cube(
        ray.data.from_arrow(t), ["a", "b"], {"s": ("v", "sum")},
        num_buckets=2,
    ).to_pandas()
    cells = {
        (r.a if pd.notna(r.a) else None, r.b if pd.notna(r.b) else None): r.s
        for r in out.itertuples()
    }
    assert cells == {
        ("x", "p"): 1.0, ("x", "q"): 2.0, ("y", "p"): 4.0,  # finest
        ("x", None): 3.0, ("y", None): 4.0,                  # by a
        (None, "p"): 5.0, (None, "q"): 2.0,                  # by b (not in ROLLUP)
        (None, None): 7.0,                                   # grand total
    }


def test_snapshot_diff_null_semantics():
    from featherstore_ray.stages.join import snapshot_diff

    old = pa.table({"k": [1, 2, 3, 4], "v": [1.0, None, 3.0, 4.0]})
    new = pa.table({"k": [2, 3, 4, 5], "v": [None, 9.0, 4.0, 5.0]})
    out = snapshot_diff(
        ray.data.from_arrow(old), ray.data.from_arrow(new), ["k"], ["v"],
        num_buckets=2,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    got = {int(r.k): r.status for r in out.itertuples()}
    # k=2: NULL == NULL → unchanged (absent); k=4: equal → absent
    assert got == {1: "removed", 3: "changed", 5: "added"}
    ch = out[out.status == "changed"].iloc[0]
    assert ch["v_old"] == 3.0 and ch["v_new"] == 9.0


def test_quantile_bins_equal_frequency():
    from featherstore_ray.stages.misc import quantile_bins

    t = pa.table({"v": np.arange(100, dtype=np.float64)})
    out = (
        quantile_bins(ray.data.from_arrow(t).repartition(5), "v", num_bins=4)
        .to_pandas().sort_values("bin").reset_index(drop=True)
    )
    assert list(out["bin"]) == [0, 1, 2, 3]
    # quartile edges at 24.75/49.5/74.25: strict > cut → 25/25/25/25
    assert list(out["n"]) == [25, 25, 25, 25]
    assert out["n"].sum() == 100


def test_mad_outliers_manual():
    from featherstore_ray.stages.misc import mad_outliers

    t = pa.table({
        "g": ["a"] * 7 + ["b"] * 3,
        "v": [1.0, 1, 1, 1, 1, 2, 100.0,   # med 1, MAD 0 → 2 and 100 out
              5.0, 5, 5],                   # all equal → MAD 0, none out
    })
    out = (
        mad_outliers(ray.data.from_arrow(t), "g", "v", k=3.0, num_buckets=2)
        .to_pandas().set_index("g")
    )
    assert out.loc["a", "n"] == 7 and out.loc["a", "n_outliers"] == 2
    assert out.loc["a", "med"] == 1.0 and out.loc["a", "mad"] == 0.0
    assert out.loc["b", "n_outliers"] == 0 and out.loc["b", "mad"] == 0.0


def test_quantize_embeddings_roundtrip_and_layouts():
    from featherstore_ray.stages.ann import quantize_embeddings

    rng = np.random.default_rng(11)
    m = rng.normal(size=(40, 8)).astype(np.float32)
    m[:, 3] = 7.5  # degenerate dimension
    t = pa.table({
        "vec_id": pa.array(np.arange(40)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), pa.float32()), 8).cast(
                pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(4)

    wide = quantize_embeddings(ds, out="list").to_pandas()
    codes = np.stack(wide.sort_values("vec_id")["code"].to_numpy())
    assert codes.dtype == np.int8 and codes.shape == (40, 8)
    assert (codes[:, 3] == -128).all()  # degenerate dim → constant code

    # dequantize error bounded by half a quantization step per dimension
    lo, hi = m.min(axis=0), m.max(axis=0)
    step = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
    deq = (codes + 128.0) * step + lo
    err = np.abs(deq - m)[:, [d for d in range(8) if d != 3]]
    assert err.max() <= step.max() / 2 + 1e-6

    # long layout agrees with the list layout
    long = quantize_embeddings(ds, out="long").to_pandas()
    piv = long.pivot(index="vec_id", columns="dim", values="q").sort_index()
    np.testing.assert_array_equal(piv.to_numpy(), codes.astype(np.int64))


def test_ks_test_matches_scipy_style_reference():
    from featherstore_ray.stages.aggregate import ks_test

    rng = np.random.default_rng(17)
    rows = []
    for g, (mu_b, n_a, n_b) in {"g1": (0.0, 80, 60), "g2": (1.5, 50, 70),
                                "only_a": (0.0, 30, 0)}.items():
        rows += [(g, "A", float(x)) for x in rng.normal(0, 1, n_a)]
        rows += [(g, "B", float(x)) for x in rng.normal(mu_b, 1, n_b)]
    # duplicated values exercise tie pooling
    rows += [("g1", "A", 0.5)] * 5 + [("g1", "B", 0.5)] * 3
    t = pa.table({
        "g": [r[0] for r in rows],
        "lab": [r[1] for r in rows],
        "v": [r[2] for r in rows],
    })
    out = ks_test(ray.data.from_arrow(t).repartition(4), "g", "v", "lab",
                  "A", "B", num_buckets=2).to_pandas().set_index("g")["ks"]
    assert "only_a" not in out.index  # one-sided groups dropped

    def ref_ks(a, b):
        pts = np.sort(np.concatenate([a, b]))
        fa = np.searchsorted(np.sort(a), pts, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), pts, side="right") / len(b)
        return np.abs(fa - fb).max()

    df = pd.DataFrame(rows, columns=["g", "lab", "v"])
    for g in ("g1", "g2"):
        a = df[(df.g == g) & (df.lab == "A")]["v"].to_numpy()
        b = df[(df.g == g) & (df.lab == "B")]["v"].to_numpy()
        assert abs(out[g] - ref_ks(a, b)) < 1e-6, g
    # shifted distribution separates harder than identical one
    assert out["g2"] > out["g1"]


def test_grouped_weighted_stats_matches_manual():
    from featherstore_ray.stages.aggregate import grouped_weighted_stats

    rng = np.random.default_rng(23)
    g = rng.choice(["a", "b"], 300)
    x = rng.normal(2.0, 1.0, 300)
    w = rng.integers(0, 5, 300).astype(float)  # zeros excluded by contract
    t = pa.table({"g": g, "x": x, "w": w})
    for final in ("driver", "shuffle"):
        out = grouped_weighted_stats(
            ray.data.from_arrow(t).repartition(4), ["g"], "x", "w",
            final=final, num_buckets=2,
        ).to_pandas().set_index("g")
        for key in ("a", "b"):
            m = (g == key) & (w > 0)
            wm = np.average(x[m], weights=w[m])
            wv = np.average((x[m] - wm) ** 2, weights=w[m])
            assert abs(out.loc[key, "wmean"] - wm) < 1e-6
            assert abs(out.loc[key, "wvar"] - wv) < 1e-6
            assert abs(out.loc[key, "wsum"] - w[m].sum()) < 1e-9


def test_robust_scale_nulls_and_zero_iqr():
    from featherstore_ray.stages.misc import robust_scale

    t = pa.table({
        "g": ["a", "a", "a", "a", "b", "b", "b", None, "c"],
        "v": [1.0, 2.0, 3.0, 4.0, 7.0, 7.0, 7.0, 5.0, None],
        "i": list(range(9)),
    })
    out = (
        robust_scale(ray.data.from_arrow(t).repartition(3), "g", "v",
                     num_buckets=4)
        .to_pandas().set_index("i").sort_index()
    )
    # group a: q1=1.75, med=2.5, q3=3.25 -> iqr=1.5
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        assert abs(out.loc[i, "v_rs"] - round((v - 2.5) / 1.5, 6)) < 1e-9
    # constant group b: iqr 0 -> null; null group key -> null; null value -> null
    assert out.loc[[4, 5, 6, 7, 8], "v_rs"].isna().all()


def test_pmi_matches_manual_and_block_invariant():
    from collections import Counter

    from featherstore_ray.stages.text import pmi

    docs = ["x y x y z", "x y q", "z", "", "y x y x"] * 3
    toks = [d.split(" ") for d in docs]
    uc = Counter(w for t in toks for w in t)
    bc = Counter((t[i], t[i + 1]) for t in toks for i in range(len(t) - 1))
    nu = sum(uc.values())
    nb = nu - len(docs)
    expect = {
        k: round(np.log((n / nb) / ((uc[k[0]] / nu) * (uc[k[1]] / nu))), 6)
        for k, n in bc.items() if n >= 3
    }
    for parts in (1, 4):
        out = pmi(
            ray.data.from_arrow(pa.table({"text": docs})).repartition(parts),
            min_count=3, num_buckets=4,
        ).to_pandas()
        got = {(r.a, r.b): (r.n, r.pmi) for r in out.itertuples()}
        assert set(got) == set(expect)
        for k, want in expect.items():
            assert got[k][0] == bc[k]
            assert abs(got[k][1] - want) < 1e-9


def test_mutual_info_independent_and_dependent():
    from featherstore_ray.stages.aggregate import mutual_info

    # perfectly dependent: y = f(x) -> mi == hx == hy, nmi == 1
    x = ["a", "b", "c", "a", "b", "c"] * 50
    t = pa.table({"x": x, "y": [s.upper() for s in x]})
    out = mutual_info(
        ray.data.from_arrow(t).repartition(4), "x", "y"
    ).to_pandas().iloc[0]
    assert abs(out["mi"] - out["hx"]) < 1e-9
    assert abs(out["nmi"] - 1.0) < 1e-9
    # independent uniform grid -> mi == 0
    xs = [a for a in "ab" for _ in range(100)]
    ys = (["p"] * 50 + ["q"] * 50) * 2
    out2 = mutual_info(
        ray.data.from_arrow(pa.table({"x": xs, "y": ys})).repartition(3),
        "x", "y",
    ).to_pandas().iloc[0]
    assert abs(out2["mi"]) < 1e-9


def test_target_encode_shrinkage_and_unseen():
    from featherstore_ray.stages.misc import target_encode

    t = pa.table({
        "c": ["a"] * 100 + ["b"] * 2 + [None] * 3,
        "y": [1.0] * 100 + [10.0, 10.0] + [None, 4.0, 4.0],
        "i": list(range(105)),
    })
    out = (
        target_encode(ray.data.from_arrow(t).repartition(4), "c", "y",
                      smoothing=10.0)
        .to_pandas().set_index("i").sort_index()
    )
    prior = (100 * 1.0 + 2 * 10.0 + 2 * 4.0) / 104
    assert abs(out.loc[0, "y_te"] - round((100 + 10 * prior) / 110, 6)) < 1e-9
    # thin category shrinks hard toward the prior
    assert abs(out.loc[100, "y_te"]
               - round((20.0 + 10 * prior) / 12, 6)) < 1e-9
    # null category -> exactly the prior; null target rows still encoded
    assert abs(out.loc[102, "y_te"] - round(prior, 6)) < 1e-9
    assert out["y_te"].notna().all()


def test_global_rank_matches_argsort_with_ties_and_nulls():
    from featherstore_ray.stages.misc import global_rank

    rng = np.random.default_rng(7)
    v = rng.choice([1.0, 2.0, 2.0, 3.5, None], 500).astype(object)
    t = pa.table({"i": list(range(500)), "v": pa.array(list(v), pa.float64())})
    out = (
        global_rank(ray.data.from_arrow(t).repartition(5), "v", "i",
                    num_buckets=4, sample_per_batch=16)
        .to_pandas().sort_values("rnk").reset_index(drop=True)
    )
    df = t.to_pandas().dropna(subset=["v"]).sort_values(
        ["v", "i"], kind="stable").reset_index(drop=True)
    assert len(out) == len(df)
    assert (out["rnk"].to_numpy() == np.arange(1, len(df) + 1)).all()
    assert (out["i"].to_numpy() == df["i"].to_numpy()).all()


def test_ohlc_merge_across_blocks():
    import pandas as pd

    from featherstore_ray.stages.aggregate import ohlc

    # block 1 holds the earliest open AND the latest close; block 2 sits in
    # the middle — the merge must pick open/close with separate sorts.
    b1 = pa.table({
        "u": [1, 1], "ts": pa.array(pd.to_datetime(
            ["2024-01-01 01:00", "2024-01-01 23:00"]
        ).astype("datetime64[us]")),
        "v": [5.0, 9.0], "eid": [1, 6],
    })
    b2 = pa.table({
        "u": [1, 1, 1], "ts": pa.array(pd.to_datetime(
            ["2024-01-01 05:00", "2024-01-01 12:00", "2024-01-01 23:00"]
        ).astype("datetime64[us]")),
        "v": [1.0, 20.0, 7.0], "eid": [2, 3, 4],
    })
    out = ohlc(
        ray.data.from_arrow(b1).union(ray.data.from_arrow(b2)),
        "u", "ts", "v", "eid", num_buckets=2,
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # open = v at earliest ts; close = max (ts, eid) -> eid 6 wins the tie
    assert (r["open"], r["high"], r["low"], r["close"], r["volume"]) == (
        5.0, 20.0, 1.0, 9.0, 5)


def test_chi2_independence_and_dependence():
    from featherstore_ray.stages.aggregate import chi2_test

    # independent uniform grid -> chi2 == 0
    xs = [a for a in "ab" for _ in range(100)]
    ys = (["p"] * 50 + ["q"] * 50) * 2
    out = chi2_test(
        ray.data.from_arrow(pa.table({"x": xs, "y": ys})).repartition(3),
        "x", "y",
    ).to_pandas().iloc[0]
    assert abs(out["chi2"]) < 1e-9 and out["dof"] == 1
    # perfect dependence 2x2, n=200 -> chi2 == n
    t = pa.table({"x": ["a"] * 100 + ["b"] * 100,
                  "y": ["p"] * 100 + ["q"] * 100})
    out2 = chi2_test(ray.data.from_arrow(t).repartition(4), "x", "y"
                     ).to_pandas().iloc[0]
    assert abs(out2["chi2"] - 200.0) < 1e-9 and out2["dof"] == 1


def test_welch_t_matches_manual():
    from featherstore_ray.stages.aggregate import welch_t

    rng = np.random.default_rng(11)
    g = rng.choice(["u1", "u2"], 400)
    lab = rng.choice(["click", "purchase", "view"], 400)
    v = rng.normal(0, 1, 400) + (lab == "click") * 0.5
    t = pa.table({"g": g, "lab": lab, "v": v})
    out = welch_t(
        ray.data.from_arrow(t).repartition(4),
        "g", "v", "lab", "click", "purchase",
    ).to_pandas().set_index("g")
    for key in ("u1", "u2"):
        a = v[(g == key) & (lab == "click")]
        b = v[(g == key) & (lab == "purchase")]
        v1 = a.var(ddof=1) / len(a)
        v2 = b.var(ddof=1) / len(b)
        want_t = (a.mean() - b.mean()) / np.sqrt(v1 + v2)
        want_dof = (v1 + v2) ** 2 / (
            v1 * v1 / (len(a) - 1) + v2 * v2 / (len(b) - 1))
        assert abs(out.loc[key, "t"] - want_t) < 1e-5, key
        assert abs(out.loc[key, "dof"] - want_dof) < 1e-4, key


def test_share_of_group_nulls_and_zero_total():
    from featherstore_ray.stages.misc import share_of_group

    t = pa.table({
        "g": ["a", "a", "b", "b", "c"],
        "v": pa.array([1.0, 3.0, 2.0, -2.0, None], pa.float64()),
        "i": list(range(5)),
    })
    out = (
        share_of_group(ray.data.from_arrow(t).repartition(2), "g", "v")
        .to_pandas().set_index("i").sort_index()["v_share"]
    )
    assert abs(out[0] - 0.25) < 1e-9 and abs(out[1] - 0.75) < 1e-9
    # zero group total -> null; null value -> null
    assert out[[2, 3, 4]].isna().all()


def test_rfm_matches_manual():
    import pandas as pd

    from featherstore_ray.stages.aggregate import rfm

    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-05 00:00", "2024-01-03 00:00",
        "2024-01-11 12:00",
    ]).astype("datetime64[us]")
    t = pa.table({
        "u": [1, 1, 2, 2], "ts": pa.array(ts),
        "v": [10.0, 5.0, 7.0, 1.0],
    })
    out = rfm(ray.data.from_arrow(t).repartition(2), "u", "ts", "v"
              ).to_pandas().set_index("u")
    # now = 2024-01-11 12:00
    assert abs(out.loc[1, "recency_days"] - 6.5) < 1e-9
    assert out.loc[1, "frequency"] == 2 and out.loc[1, "monetary"] == 15.0
    assert out.loc[2, "recency_days"] == 0.0 and out.loc[2, "monetary"] == 8.0


def test_pca_project_matches_numpy_full_matrix():
    from featherstore_ray.stages.ann import pca_project

    rng = np.random.default_rng(3)
    d, n, k = 16, 300, 4
    # anisotropic data so components are well separated
    m = rng.normal(0, 1, (n, d)) * np.linspace(5, 0.1, d)
    t = pa.table({
        "vec_id": list(range(n)),
        "embedding": pa.array([row.tolist() for row in m],
                              pa.list_(pa.float32())),
    })
    m64 = np.stack([np.asarray(r, dtype=np.float64)
                    for r in t["embedding"].to_pylist()])
    out = (
        pca_project(ray.data.from_arrow(t).repartition(5),
                    n_components=k, round_digits=None)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    mean = m64.mean(axis=0)
    cov = np.cov(m64, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    comp = evecs[:, np.argsort(evals)[::-1][:k]]
    amax = np.argmax(np.abs(comp), axis=0)
    sg = np.sign(comp[amax, np.arange(k)])
    comp = comp * sg
    want = (m64 - mean) @ comp
    got = out[[f"pc{j}" for j in range(k)]].to_numpy()
    np.testing.assert_allclose(got, want, atol=1e-8)
    # variance ordering: pc0 explains the most
    v = got.var(axis=0)
    assert v[0] > v[1] > v[2] > v[3]


def test_count_distinct_and_time_features():
    import pandas as pd

    from featherstore_ray.stages.aggregate import count_distinct, time_features

    t = pa.table({
        "g": ["a", "a", "a", "b", None],
        "v": [1, 1, 2, 3, 4],
    })
    out = count_distinct(
        ray.data.from_arrow(t).repartition(3), "g", "v", num_buckets=2
    ).to_pandas().set_index("g")["n_distinct"]
    assert out["a"] == 2 and out["b"] == 1 and len(out) == 2

    ts = pd.to_datetime([
        "2024-01-01 00:30",   # Monday
        "2024-01-06 23:15",   # Saturday
        "1970-01-01 05:00",   # Thursday (epoch day 0)
        None,
    ]).astype("datetime64[us]")
    tf = time_features(
        ray.data.from_arrow(pa.table({"i": [0, 1, 2, 3],
                                      "ts": pa.array(ts)})), "ts"
    ).to_pandas().set_index("i").sort_index()
    assert list(tf.loc[0, ["dow", "hour", "day", "month"]]) == [0, 0, 1, 1]
    assert not tf.loc[0, "is_weekend"]
    assert tf.loc[1, "dow"] == 5 and tf.loc[1, "is_weekend"]
    assert tf.loc[2, "dow"] == 3 and tf.loc[2, "hour"] == 5
    assert tf.loc[3, ["dow", "hour", "day", "month"]].isna().all()


def test_moment_partial_ops_drop_null_group_keys():
    from featherstore_ray.stages.aggregate import (
        group_corr, group_linear_fit, grouped_weighted_stats)

    rng = np.random.default_rng(9)
    g = pa.array(["a"] * 50 + [None] * 10, pa.string())
    x = rng.normal(0, 1, 60)
    y = 2 * x + rng.normal(0, 0.1, 60)
    t = pa.table({"g": g, "x": x, "y": y})
    ds = ray.data.from_arrow(t).repartition(3)
    assert len(group_corr(ds, ["g"], "x", "y").to_pandas()) == 1
    assert len(group_linear_fit(ds, ["g"], "x", "y").to_pandas()) == 1
    w = pa.table({"g": g, "x": x, "w": np.ones(60)})
    out = grouped_weighted_stats(
        ray.data.from_arrow(w).repartition(3), ["g"], "x", "w")
    assert len(out.to_pandas()) == 1


def test_empty_and_null_robustness_for_driver_mergers():
    import pandas as pd

    from featherstore_ray.stages.aggregate import (
        co_occurrence, funnel, transition_counts)
    from featherstore_ray.stages.misc import source_mix

    ts = pa.array(pd.to_datetime(["2024-01-01", "2024-01-02"]
                                 ).astype("datetime64[us]"))
    ev = pa.table({"u": [1, 1], "ts": ts, "et": ["click", "view"]})
    # funnel with zero matching events -> all-zero rows, no crash
    out = funnel(ray.data.from_arrow(ev), entity_col="u", ts_col="ts",
                 type_col="et", stages=["signup", "buy"],
                 num_buckets=2).to_pandas()
    assert list(out["users"]) == [0, 0]
    # transitions on an entity with one event -> typed empty, no crash
    one = pa.table({"u": [1], "ts": ts.slice(0, 1), "et": ["click"]})
    tr = transition_counts(ray.data.from_arrow(one), entity_col="u",
                           ts_col="ts", type_col="et",
                           num_buckets=2).to_pandas()
    # Ray's to_pandas drops the schema of a fully-empty dataset; the point
    # is the merge no longer raises KeyError
    assert len(tr) == 0
    # co_occurrence with null items -> nulls dropped, no TypeError
    b = pa.table({"g": [1, 1, 1, 2], "it": ["a", "b", None, "a"]})
    co = co_occurrence(ray.data.from_arrow(b), group_col="g", item_col="it",
                       num_buckets=2).to_pandas()
    assert len(co) == 1 and (co.iloc[0]["a"], co.iloc[0]["b"]) == ("a", "b")
    # source_mix with INT source column: counts align by raw value
    src = pa.table({"s": [0, 0, 0, 0, 10, 10], "k": [1, 2, 3, 4, 5, 6]})
    mixed = source_mix(ray.data.from_arrow(src), "s", "k",
                       {0: 0.5, 10: 0.5}).to_pandas()
    # cap = min(4/.5, 2/.5) = 4 -> keep ~2 of each source; exact keep set is
    # hash-determined, but source 10 must NOT be starved by misaligned counts
    assert set(mixed["s"].unique()) <= {0, 10}
    assert (mixed["s"] == 10).sum() >= 1


def test_expect_rules_count_violations():
    from featherstore_ray.stages.misc import expect

    t = pa.table({
        "v": pa.array([1.0, 50.0, None, 2000.0, -1.0], pa.float64()),
        "c": ["a", "b", "zz", "a", None],
        "k": [1, 2, 2, 3, 3],
        "s": ["{x}", "nope", "{y}", None, "{z}"],
    })
    out = expect(
        ray.data.from_arrow(t).repartition(3),
        [
            {"col": "v", "kind": "not_null"},
            {"col": "v", "kind": "between", "lo": 0.0, "hi": 100.0},
            {"col": "c", "kind": "in_set", "values": ["a", "b"]},
            {"col": "s", "kind": "regex", "pattern": r"^\{.*\}$"},
            {"col": "k", "kind": "unique"},
        ],
        num_buckets=2,
    ).to_pandas().set_index("rule")
    assert out.loc["v:not_null", "violations"] == 1
    assert out.loc["v:between", ["violations", "total"]].tolist() == [2, 4]
    assert out.loc["c:in_set", "violations"] == 1
    assert out.loc["s:regex", ["violations", "total"]].tolist() == [1, 4]
    # k has 5 non-null rows, 3 distinct -> 2 duplicates
    assert out.loc["k:unique", ["violations", "total"]].tolist() == [2, 5]
    assert not out["passed"].any()


def test_gini_known_values():
    from featherstore_ray.stages.aggregate import gini

    t = pa.table({
        "g": ["eq"] * 4 + ["conc"] * 4 + ["zero"] * 2 + [None],
        "v": [5.0, 5.0, 5.0, 5.0,      # perfect equality -> G = 0
              0.0, 0.0, 0.0, 12.0,     # all mass on one -> G = (n-1)/n
              0.0, 0.0,                # zero total -> null
              9.0],                    # null group dropped
    })
    out = gini(ray.data.from_arrow(t).repartition(3), "g", "v",
               num_buckets=2).to_pandas().set_index("g")["gini"]
    assert len(out) == 3
    assert abs(out["eq"]) < 1e-9
    assert abs(out["conc"] - 0.75) < 1e-9
    assert pd.isna(out["zero"])


def test_hhi_and_wilson_ci_known_values():
    from featherstore_ray.stages.aggregate import hhi, wilson_ci

    t = pa.table({
        "g": ["u"] * 4 + ["m"] * 4 + [None],
        "c": ["a", "b", "c", "d", "a", "a", "a", "b", "a"],
    })
    out = hhi(ray.data.from_arrow(t).repartition(3), "g", "c",
              num_buckets=2).to_pandas().set_index("g")["hhi"]
    assert len(out) == 2
    assert abs(out["u"] - 0.25) < 1e-9              # uniform over 4
    assert abs(out["m"] - (0.75**2 + 0.25**2)) < 1e-9

    w = pa.table({
        "g": ["a"] * 100 + ["b"] * 4,
        "lab": ["yes"] * 30 + ["no"] * 70 + ["yes"] * 0 + ["no"] * 4,
    })
    ci = wilson_ci(ray.data.from_arrow(w).repartition(2), "g", "lab",
                   "yes").to_pandas().set_index("g")
    assert ci.loc["a", "n"] == 100 and abs(ci.loc["a", "rate"] - 0.3) < 1e-9
    # Wilson 95% for 30/100: ~[0.2189, 0.3952]
    assert abs(ci.loc["a", "ci_lo"] - 0.218938) < 1e-4
    assert abs(ci.loc["a", "ci_hi"] - 0.395551) < 1e-3
    # zero successes at n=4: lower bound is exactly 0 under Wilson
    assert ci.loc["b", "rate"] == 0.0 and ci.loc["b", "ci_lo"] == 0.0
    assert 0.3 < ci.loc["b", "ci_hi"] < 0.8


def test_mann_whitney_matches_manual_with_ties():
    from featherstore_ray.stages.aggregate import mann_whitney

    rng = np.random.default_rng(17)
    g = rng.choice(["u1", "u2"], 300)
    lab = rng.choice(["click", "purchase", "view"], 300)
    # discretized values -> plenty of ties
    v = np.round(rng.normal(0, 1, 300) + (lab == "click") * 0.8, 1)
    t = pa.table({"g": g, "lab": lab, "v": v})
    out = mann_whitney(
        ray.data.from_arrow(t).repartition(4),
        "g", "v", "lab", "click", "purchase", num_buckets=2,
    ).to_pandas().set_index("g")

    def ref(a, b):
        allv = np.concatenate([a, b])
        order = np.argsort(allv, kind="stable")
        ranks = np.empty(len(allv))
        sv = allv[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0
            i = j
        r1 = ranks[: len(a)].sum()
        n1, n2, n = len(a), len(b), len(allv)
        u = r1 - n1 * (n1 + 1) / 2.0
        _, counts = np.unique(allv, return_counts=True)
        tie = float((counts.astype(float) ** 3 - counts).sum())
        var = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
        return u, (u - n1 * n2 / 2.0) / np.sqrt(var)

    for key in ("u1", "u2"):
        a = v[(g == key) & (lab == "click")]
        b = v[(g == key) & (lab == "purchase")]
        want_u, want_z = ref(a, b)
        assert abs(out.loc[key, "u"] - want_u) < 1e-6, key
        assert abs(out.loc[key, "z"] - want_z) < 1e-5, key
    # the click shift should separate: |z| clearly positive
    assert (out["z"].abs() > 1.5).all()


def test_psi_drift_matches_brute_force(ray_session):
    """PSI bins/shares/terms vs a direct numpy computation, incl. clipped
    out-of-range values, nulls out of contract, and identical-window
    (psi ~ 0) sanity."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from featherstore_ray.stages.aggregate import psi_drift

    rng = np.random.default_rng(7)
    n = 4000
    v = np.concatenate([rng.normal(300, 120, n), rng.normal(520, 160, n)])
    v[::97] = -50.0   # clips into bin 0
    v[1::97] = 2000.0  # clips into bin 9
    ts = np.concatenate([
        np.full(n, np.datetime64("2024-01-05", "us")),
        np.full(n, np.datetime64("2024-01-25", "us")),
    ])
    t = pa.table({
        "value": pa.array(np.append(v, [np.nan]), pa.float64()),
        "ts": pa.array(np.append(ts, [np.datetime64("2024-01-05", "us")])),
    })
    out = psi_drift(
        ray.data.from_arrow(t).repartition(5), "value", "ts",
        cutoff="2024-01-15 00:00:00", lo=0.0, hi=1000.0, num_bins=10,
    ).to_pandas().sort_values("bin").reset_index(drop=True)

    b = np.minimum(np.maximum(np.floor(v / 100.0), 0.0), 9.0).astype(int)
    ref = np.bincount(b[:n], minlength=10)
    cur = np.bincount(b[n:], minlength=10)
    sr = (ref + 1.0) / (ref.sum() + 10.0)
    sc = (cur + 1.0) / (cur.sum() + 10.0)
    assert (out["n_ref"].to_numpy() == ref).all()
    assert (out["n_cur"].to_numpy() == cur).all()
    assert np.allclose(out["psi_term"], np.round((sr - sc) * np.log(sr / sc), 6))
    assert out["psi_term"].sum() > 0.1  # the shifted mean is visible

    same = psi_drift(
        ray.data.from_arrow(pa.table({
            "value": pa.array(np.tile(v[:n], 2)),
            "ts": pa.array(ts),
        })), "value", "ts",
        cutoff="2024-01-15 00:00:00", lo=0.0, hi=1000.0, num_bins=10,
    ).to_pandas()
    assert abs(same["psi_term"].sum()) < 1e-9  # identical windows

    import pytest as _pytest
    with _pytest.raises(ValueError, match="num_bins"):
        psi_drift(ray.data.from_arrow(t), "value", "ts",
                  cutoff="2024-01-15", lo=0.0, hi=0.0)


def test_logreg_train_parity_and_invariance(ray_session):
    from featherstore_ray.stages.ann import logreg_train

    rng = np.random.default_rng(11)
    n, d = 200, 8
    X32 = rng.normal(size=(n, d)).astype(np.float32)
    w_true = rng.normal(size=d)
    y = (X32.astype(np.float64) @ w_true + rng.normal(size=n) > 0)
    labels = np.where(y, 0, rng.integers(1, 5, size=n)).astype(np.int32)
    off = (np.arange(n + 1) * d).astype(np.int32)
    t = pa.table({
        "embedding": pa.ListArray.from_arrays(
            off, pa.array(X32.ravel(), pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    iters, lr = 4, 0.5
    one = (logreg_train(ray.data.from_arrow(t), iters=iters, lr=lr)
           .to_pandas().sort_values("j").reset_index(drop=True))
    many = (logreg_train(ray.data.from_arrow(t).repartition(7),
                         iters=iters, lr=lr)
            .to_pandas().sort_values("j").reset_index(drop=True))
    # gradient partials are associative sums: block layout changes nothing
    # beyond float summation order, absorbed by the 6dp rounding
    pd.testing.assert_frame_equal(one, many)

    X = X32.astype(np.float64)
    yy = (labels == 0).astype(np.float64)
    w = np.zeros(d)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * ((p - yy) @ X) / n
    assert np.abs(np.round(w, 6) - one["weight"].to_numpy()).max() <= 1e-6

    def loss(wv):
        z = X @ wv
        return np.mean(np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0)
                       - yy * z)

    assert loss(w) < loss(np.zeros(d)) - 1e-3  # it actually learns


def test_dp_group_counts_mechanism(ray_session):
    from featherstore_ray.stages.aggregate import dp_group_counts

    keys = np.repeat(np.arange(10, dtype=np.int64), [5, 3, 8, 1, 9, 2, 7,
                                                      4, 6, 10])
    t = pa.table({"user_id": pa.array(
        list(keys) + [None, None], pa.int64())})
    eps = 0.5
    one = (dp_group_counts(ray.data.from_arrow(t), "user_id", epsilon=eps,
                           num_buckets=4)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    many = (dp_group_counts(ray.data.from_arrow(t).repartition(6),
                            "user_id", epsilon=eps, num_buckets=4)
            .to_pandas().sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, many)  # partials are associative
    assert len(one) == 10  # null keys excluded

    # closed-form mirror of the deterministic noise stream
    true_n = pd.Series(keys).value_counts().sort_index().to_numpy()
    h = (np.arange(10, dtype=np.uint64) * np.uint64(2654435761)) \
        % np.uint64(4294967296)
    u = (h.astype(np.float64) + 0.5) / 4294967296.0
    lap = -(1.0 / eps) * np.sign(u - 0.5) * np.log(1 - 2 * np.abs(u - 0.5))
    np.testing.assert_allclose(one["dp_count"].to_numpy(),
                               np.round(true_n + lap, 6), atol=1e-9)
    # the mechanism actually perturbs (some group's noise is non-trivial)
    assert np.abs(lap).max() > 0.1

def test_anova_f_matches_manual():
    from featherstore_ray.stages.aggregate import anova_f

    rng = np.random.default_rng(23)
    g = rng.choice(["u1", "u2"], 600)
    cat = rng.choice(["a", "b", "c"], 600)
    v = rng.normal(0, 1, 600) + (cat == "a") * 0.8
    t = pa.table({"g": g, "cat": cat, "v": v})
    out = anova_f(
        ray.data.from_arrow(t).repartition(4), "g", "cat", "v",
        round_digits=None,
    ).to_pandas().set_index("g")
    for key in ("u1", "u2"):
        vals = [v[(g == key) & (cat == c)] for c in ("a", "b", "c")]
        nn = sum(len(x) for x in vals)
        mean = np.concatenate(vals).mean()
        ssb = sum(len(x) * (x.mean() - mean) ** 2 for x in vals)
        ssw = sum(((x - x.mean()) ** 2).sum() for x in vals)
        want_f = (ssb / 2) / (ssw / (nn - 3))
        want_eta = ssb / (ssb + ssw)
        assert abs(out.loc[key, "f_stat"] - want_f) < 1e-6, key
        assert abs(out.loc[key, "eta_sq"] - want_eta) < 1e-9, key
        assert out.loc[key, "k"] == 3 and out.loc[key, "n"] == nn


def test_anova_f_degenerate_groups():
    from featherstore_ray.stages.aggregate import anova_f

    t = pa.table({
        "g": ["one_cat"] * 4 + ["zero_ssw"] * 4 + ["tiny"] * 2,
        "cat": ["a"] * 4 + ["a", "a", "b", "b"] + ["a", "b"],
        "v": [1.0, 2.0, 3.0, 4.0] + [5.0, 5.0, 7.0, 7.0] + [1.0, 2.0],
    })
    out = anova_f(ray.data.from_arrow(t), "g", "cat", "v").to_pandas()
    got = out.set_index("g")
    assert "one_cat" not in got.index          # k < 2 dropped
    assert "tiny" not in got.index             # n == k dropped
    assert np.isnan(got.loc["zero_ssw", "f_stat"])  # ssw == 0 -> NULL F
    assert got.loc["zero_ssw", "eta_sq"] == 1.0


def test_hard_negative_topk_excludes_same_label(ray_session):
    from featherstore_ray.stages.ann import hard_negative_topk

    rng = np.random.default_rng(9)
    n, d = 300, 16
    emb = rng.normal(size=(n, d))
    labels = rng.integers(0, 4, n).astype(np.int32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([row.astype(np.float32) for row in emb]),
        "label": pa.array(labels, pa.int32()),
    })
    q = t.slice(0, 2)
    out = hard_negative_topk(
        ray.data.from_arrow(t).repartition(4), q, k=5,
    ).to_pandas()
    norm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    for qi in (0, 1):
        got = out[out["query_id"] == qi]
        assert len(got) == 5
        # no same-label or self rows
        assert (labels[got["vec_id"].to_numpy()] != labels[qi]).all()
        # matches brute force with rounded-score ordering + id tie-break
        scores = np.round(norm @ norm[qi], 4)
        mask = (labels != labels[qi])
        order = sorted(np.flatnonzero(mask),
                       key=lambda i: (-scores[i], i))[:5]
        assert got["vec_id"].tolist() == list(order)


def test_mmr_select_exact_parity_when_candidates_cover_corpus(ray_session):
    """candidates >= corpus -> the candidate-restricted MMR equals exact
    brute-force greedy MMR (rounded scores, min-id ties)."""
    from featherstore_ray.stages.ann import mmr_select

    rng = np.random.default_rng(31)
    n, d, m, lam = 120, 8, 10, 0.7
    emb = rng.normal(size=(n, d))
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([row.astype(np.float32) for row in emb]),
    })
    q = rng.normal(size=d)
    out = mmr_select(
        ray.data.from_arrow(t).repartition(4), q, m=m, lam=lam,
        candidates=n + 50,
    ).to_pandas()

    # brute-force reference (float32 storage round-trip like the engine)
    mat = emb.astype(np.float32).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    rel = np.round(mat @ qn, 6)
    picked, max_sim = [], np.full(n, -np.inf)
    for rank in range(m):
        score = rel if rank == 0 else np.round(
            lam * rel - (1 - lam) * max_sim, 6)
        score = np.where(np.isin(np.arange(n), picked), -np.inf, score)
        i = int(np.argmax(score))
        picked.append(i)
        max_sim = np.maximum(max_sim, np.round(mat @ mat[i], 6))
    assert out["vec_id"].tolist() == picked
    assert (np.diff(out["rank"].to_numpy()) == 1).all()


def test_mmr_select_diversifies(ray_session):
    """Two tight clusters equally relevant: plain top-2-by-relevance stays
    inside one cluster; MMR's second pick crosses to the other."""
    from featherstore_ray.stages.ann import mmr_select

    a = np.array([1.0, 0.02, 0.0])
    b = np.array([1.0, -0.02, 0.0])
    cluster = np.stack([a, a + [0, 0.001, 0], b, b + [0, 0.001, 0]])
    t = pa.table({
        "vec_id": pa.array(np.arange(4), pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in cluster]),
    })
    out = mmr_select(
        ray.data.from_arrow(t), np.array([1.0, 0.0, 0.0]), m=2, lam=0.5,
        candidates=10,
    ).to_pandas()
    first, second = out["vec_id"].tolist()
    assert {first < 2, second < 2} == {True, False}  # one from each cluster


def test_kcenter_select_matches_brute_force(ray_session):
    from featherstore_ray.stages.ann import kcenter_select

    rng = np.random.default_rng(7)
    n, d, m = 150, 8, 6
    emb = rng.normal(size=(n, d))
    t = pa.table({
        "vec_id": pa.array(np.arange(n) + 10, pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in emb]),
    })
    out = kcenter_select(
        ray.data.from_arrow(t).repartition(4), m=m,
    ).to_pandas()

    mat = emb.astype(np.float32).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sel = [0]  # min id = 10 = row 0
    dist = np.full(n, np.inf)
    picks = [(1, 10, None)]
    for r in range(1, m):
        dist = np.minimum(dist, np.round(1.0 - mat @ mat[sel[-1]], 6))
        masked = dist.copy()
        masked[sel] = -np.inf
        order = np.lexsort((np.arange(n) + 10, -masked))
        i = int(order[0])
        sel.append(i)
        picks.append((r + 1, i + 10, masked[i]))
    assert out["vec_id"].tolist() == [p[1] for p in picks]
    got_d = out["dist"].to_numpy()
    assert np.isnan(got_d[0])
    np.testing.assert_allclose(
        got_d[1:], [p[2] for p in picks[1:]], atol=1e-9)


def test_kcenter_select_m_exceeds_corpus(ray_session):
    from featherstore_ray.stages.ann import kcenter_select

    t = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]),
    })
    out = kcenter_select(ray.data.from_arrow(t), m=10).to_pandas()
    assert len(out) == 3
    assert sorted(out["vec_id"]) == [1, 2, 3]


def test_embedding_outliers_matches_numpy(ray_session):
    from featherstore_ray.stages.ann import embedding_outliers

    rng = np.random.default_rng(12)
    n, d = 400, 6
    emb = rng.normal(size=(n, d))
    emb[7] += 10.0   # planted gross outlier
    emb[123] -= 8.0
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in emb]),
    })
    out = embedding_outliers(
        ray.data.from_arrow(t).repartition(4), top_k=10,
    ).to_pandas()

    x = emb.astype(np.float32).astype(np.float64)
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    prec = np.linalg.inv(cov + 1e-6 * np.eye(d))
    q = np.round(np.einsum("ij,ij->i", (x - mean) @ prec, x - mean), 6)
    order = np.lexsort((np.arange(n), -q))[:10]
    assert out["vec_id"].tolist() == list(order)
    np.testing.assert_allclose(out["maha_sq"].to_numpy(), q[order],
                               rtol=1e-6)
    assert {7, 123} <= set(out["vec_id"].head(2))


def test_k_anonymity_finds_small_classes(ray_session):
    from featherstore_ray.stages.aggregate import k_anonymity

    t = pa.table({
        "qa": ["x"] * 7 + ["x"] * 2 + ["y"] * 3 + [None],
        "qb": ["a"] * 7 + ["b"] * 2 + ["a"] * 3 + ["a"],
    })
    out = k_anonymity(
        ray.data.from_arrow(t).repartition(3), ["qa", "qb"], k=5,
        num_buckets=4,
    ).to_pandas().sort_values(["qa", "qb"]).reset_index(drop=True)
    # (x,a)=7 safe; (x,b)=2 and (y,a)=3 risky; null row excluded
    assert out[["qa", "qb"]].values.tolist() == [["x", "b"], ["y", "a"]]
    assert out["n"].tolist() == [2, 3]


def test_benford_uniform_vs_benford_data(ray_session):
    from featherstore_ray.stages.aggregate import benford

    rng = np.random.default_rng(3)
    # log-uniform magnitudes follow Benford closely
    v = 10 ** rng.uniform(0, 4, 20000)
    t = pa.table({"v": pa.array(v)})
    out = benford(
        ray.data.from_arrow(t).repartition(4), "v",
    ).to_pandas()
    assert out["n_obs"].sum() == 20000
    chi2 = out["chi2_term"].sum()
    assert chi2 < 30  # 8 dof; Benford-conforming data stays small
    # digit-1 share near log10(2) = 0.301
    assert abs(out.loc[out["digit"] == 1, "n_obs"].iloc[0] / 20000
               - 0.301) < 0.02
    # zeros / negatives / nulls excluded from the audit entirely
    t2 = pa.table({"v": pa.array([0.0, -5.0, None, 19.0, 2.0])})
    out2 = benford(ray.data.from_arrow(t2), "v").to_pandas()
    assert out2["n_obs"].sum() == 2
    assert out2.set_index("digit").loc[1, "n_obs"] == 1
    assert out2.set_index("digit").loc[2, "n_obs"] == 1


def test_theil_sen_robust_to_outlier(ray_session):
    from featherstore_ray.stages.aggregate import theil_sen

    x = np.arange(30, dtype=np.float64)
    y = 2.0 * x + 1.0
    y_out = y.copy()
    y_out[17] += 500.0  # one gross outlier
    t = pa.table({
        "g": pa.array(["clean"] * 30 + ["dirty"] * 30),
        "x": pa.array(np.concatenate([x, x])),
        "y": pa.array(np.concatenate([y, y_out])),
    })
    out = theil_sen(
        ray.data.from_arrow(t).repartition(3), "g", "x", "y",
        num_buckets=4,
    ).to_pandas().set_index("g")
    assert out.loc["clean", "ts_slope"] == 2.0
    assert abs(out.loc["dirty", "ts_slope"] - 2.0) < 0.2  # OLS would be ~3
    assert out.loc["clean", "n_pairs"] == 30 * 29 // 2


def test_theil_sen_equal_x_pairs_excluded(ray_session):
    from featherstore_ray.stages.aggregate import theil_sen

    t = pa.table({
        "g": pa.array(["a"] * 4),
        "x": pa.array([1.0, 1.0, 2.0, 3.0]),
        "y": pa.array([0.0, 10.0, 2.0, 3.0]),
    })
    out = theil_sen(ray.data.from_arrow(t), "g", "x", "y").to_pandas()
    # pairs: (1,2):both x=1 excluded once -> 5 valid of 6
    assert out.loc[0, "n_pairs"] == 5


def test_pq_encode_reconstruction_improves_with_codes(ray_session):
    from featherstore_ray.stages.ann import pq_encode

    rng = np.random.default_rng(15)
    n, d = 300, 16
    emb = rng.normal(size=(n, d))
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in emb]),
    })
    errs = {}
    for k in (2, 8, 32):
        out = pq_encode(
            ray.data.from_arrow(t).repartition(3),
            m_subspaces=4, n_codes=k, train_sample=n,
        ).to_pandas()
        assert len(out) == n
        assert out[[f"code{s}" for s in range(4)]].max().max() < k
        errs[k] = out["recon_err"].mean()
    assert errs[32] < errs[8] < errs[2]
    # normalized vectors: total err bounded by ||x||^2 = 1 per subspace sum
    assert errs[2] < 1.0


def test_pq_encode_matches_numpy_reference(ray_session):
    from featherstore_ray.stages.ann import _pq_codebooks, pq_encode

    rng = np.random.default_rng(8)
    n, d, M, K = 200, 8, 2, 4
    emb = rng.normal(size=(n, d))
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in emb]),
    })
    ds = ray.data.from_arrow(t)
    out = pq_encode(
        ds.repartition(2), m_subspaces=M, n_codes=K, train_sample=n,
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)
    books = _pq_codebooks(ds, "embedding", m_subspaces=M, n_codes=K,
                          train_sample=n, seed=13)
    x = emb.astype(np.float32).astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    sub = d // M
    for s in range(M):
        seg = x[:, s * sub:(s + 1) * sub]
        dist = ((seg[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        np.testing.assert_array_equal(
            out[f"code{s}"].to_numpy(), np.argmin(dist, axis=1))


def test_pq_topk_recall_against_exact(ray_session):
    from featherstore_ray.stages.ann import cosine_topk, pq_topk

    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.slice(0, 3)
    ds = ray.data.from_arrow(emb)
    approx = pq_topk(ds, queries, k=10, m_subspaces=32, n_codes=16,
                     train_sample=500).to_pandas()
    exact = cosine_topk(ray.data.from_arrow(emb), queries,
                        k=10).to_pandas()
    recs = []
    for qid in exact["query_id"].unique():
        a = set(approx.loc[approx["query_id"] == qid, "vec_id"])
        e = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        recs.append(len(a & e) / len(e))
    # 2-dim subspaces x 16 codes: measured 0.7-0.8 here; chance ~0.02
    assert np.mean(recs) >= 0.6, recs
    # ADC+R re-rank: exact scoring of 4k candidates must not lower recall
    # and must beat the raw scan on mean recall
    rr = pq_topk(ray.data.from_arrow(emb), queries, k=10, m_subspaces=32,
                 n_codes=16, train_sample=500, rerank=4).to_pandas()
    recs_rr = []
    for qid in exact["query_id"].unique():
        a = set(rr.loc[rr["query_id"] == qid, "vec_id"])
        e = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        recs_rr.append(len(a & e) / len(e))
    assert np.mean(recs_rr) >= np.mean(recs), (recs_rr, recs)
    assert np.mean(recs_rr) >= 0.8, recs_rr


def test_common_paths_matches_duckdb(ray_session):
    import duckdb
    from datetime import timedelta

    from featherstore_ray.stages.aggregate import common_paths

    rng = np.random.default_rng(27)
    n = 3000
    base = np.datetime64("2024-01-01", "us")
    ev = pa.table({
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "ts": pa.array(base + rng.integers(0, 10**10, n)
                       .astype("timedelta64[us]")),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
        "event_id": pa.array(np.arange(n), pa.int64()),
    })
    out = common_paths(
        ray.data.from_arrow(ev).repartition(4),
        gap=timedelta(minutes=30), top_n=15, max_len=5, num_buckets=8,
    ).to_pandas()
    con = duckdb.connect()
    con.register("events", ev)
    exp = con.execute(
        """
        WITH o AS (
            SELECT user_id, ts, event_id, event_type, lag(ts) OVER w AS prev
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT *, sum(CASE WHEN prev IS NULL
                          OR date_diff('microsecond', prev, ts) > 1800000000
                          THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
            FROM o
        ),
        r AS (SELECT user_id, sid, event_type,
                     row_number() OVER (PARTITION BY user_id, sid
                                        ORDER BY ts, event_id) AS rn
              FROM s),
        p AS (SELECT user_id, sid,
                     string_agg(event_type, '>' ORDER BY rn) AS path
              FROM r WHERE rn <= 5 GROUP BY user_id, sid),
        c AS (SELECT path, count(*) AS n FROM p GROUP BY path)
        SELECT path, n FROM c ORDER BY n DESC, path LIMIT 15
        """
    ).df()
    assert out["path"].tolist() == exp["path"].tolist()
    assert out["n"].tolist() == exp["n"].tolist()


def test_wasserstein_matches_scipy_style_reference(ray_session):
    from featherstore_ray.stages.aggregate import wasserstein

    rng = np.random.default_rng(33)
    rows = []
    for g, shift in (("u1", 0.0), ("u2", 2.5)):
        for v in rng.normal(0, 1, 250):
            rows.append((g, "click", v))
        for v in rng.normal(shift, 1, 200):
            rows.append((g, "purchase", v))
    rows.append(("only_click", "click", 1.0))
    t = pa.table({
        "g": pa.array([r[0] for r in rows]),
        "lab": pa.array([r[1] for r in rows]),
        "v": pa.array([r[2] for r in rows]),
    })
    out = wasserstein(
        ray.data.from_arrow(t).repartition(4), "g", "v", "lab",
        "click", "purchase", num_buckets=4,
    ).to_pandas().set_index("g")

    def w1_ref(a, b):
        # exact empirical W1 via pooled-grid ECDF integral
        xs = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
        return float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(xs)))

    for g, shift in (("u1", 0.0), ("u2", 2.5)):
        a = np.array([r[2] for r in rows if r[0] == g and r[1] == "click"])
        b = np.array([r[2] for r in rows
                      if r[0] == g and r[1] == "purchase"])
        assert abs(out.loc[g, "w1"] - w1_ref(a, b)) < 1e-6
    # mean shift dominates W1 (unlike KS, which saturates)
    assert out.loc["u2", "w1"] > out.loc["u1", "w1"] + 1.5
    assert "only_click" not in out.index  # missing label -> dropped


def test_item_similarity_matches_duckdb(ray_session):
    import duckdb

    from featherstore_ray.stages.aggregate import item_similarity

    rng = np.random.default_rng(61)
    n = 3000
    t = pa.table({
        "basket": pa.array(rng.integers(0, 400, n), pa.int64()),
        "item": pa.array(rng.integers(0, 30, n), pa.int64()),
    })
    out = item_similarity(
        ray.data.from_arrow(t).repartition(5),
        group_col="basket", item_col="item", k=3, min_count=2,
        num_buckets=8,
    ).to_pandas()
    con = duckdb.connect()
    con.register("li", t)
    exp = con.execute(
        """
        WITH d AS (SELECT DISTINCT basket, item FROM li),
        ic AS (SELECT item, count(*) AS ci FROM d GROUP BY 1),
        pc AS (SELECT x.item AS a, y.item AS b, count(*) AS n
               FROM d x JOIN d y ON x.basket = y.basket AND x.item < y.item
               GROUP BY 1, 2 HAVING count(*) >= 2),
        sym AS (SELECT a, b, n FROM pc UNION ALL SELECT b, a, n FROM pc),
        s AS (SELECT sym.a AS item, sym.b AS neighbor, n AS n_co,
                     round(n / sqrt(ia.ci * ib.ci), 6) AS cosine
              FROM sym JOIN ic ia ON ia.item = sym.a
              JOIN ic ib ON ib.item = sym.b)
        SELECT item, neighbor, n_co, cosine FROM (
          SELECT *, row_number() OVER (PARTITION BY item
                    ORDER BY cosine DESC, neighbor) AS rn FROM s)
        WHERE rn <= 3
        """
    ).df()
    cols = ["item", "neighbor", "n_co", "cosine"]
    o = out[cols].sort_values(cols).reset_index(drop=True)
    x = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(o) == len(x) and len(o) > 0
    pd.testing.assert_frame_equal(o, x, check_dtype=False)


def test_transition_times_known_values(ray_session):
    from featherstore_ray.stages.aggregate import transition_times

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")  # 1 second
    # user 1: a@0 b@10 a@30 ; user 2: a@0 b@40 ; null-type row ignored
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
        "ts": pa.array([base, base + 10 * s, base + 30 * s,
                        base, base + 20 * s, base + 40 * s]),
        "event_type": pa.array(["a", "b", "a", "a", None, "b"]),
        "event_id": pa.array(list(range(6)), pa.int64()),
    })
    out = transition_times(
        ray.data.from_arrow(t).repartition(3), num_buckets=4,
    ).to_pandas().set_index(["from_type", "to_type"])
    # a->b gaps: 10 (u1), 40 (u2: null row neither forms nor breaks)
    assert out.loc[("a", "b"), "n"] == 2
    assert out.loc[("a", "b"), "median_gap_sec"] == 25.0
    assert out.loc[("a", "b"), "mean_gap_sec"] == 25.0
    # b->a gap: 20 (u1)
    assert out.loc[("b", "a"), "n"] == 1
    assert out.loc[("b", "a"), "median_gap_sec"] == 20.0


def test_spearman_monotone_and_ties(ray_session):
    from featherstore_ray.stages.aggregate import spearman

    rng = np.random.default_rng(71)
    x = rng.normal(size=300)
    rows = {
        "mono": (x, np.exp(x)),                    # monotone -> rho = 1
        "anti": (x, -x ** 3),                      # anti-monotone -> -1
        "noisy": (x, x + rng.normal(0, 5, 300)),   # weak positive
    }
    t = pa.table({
        "g": pa.array(sum([[k] * 300 for k in rows], [])),
        "x": pa.array(np.concatenate([v[0] for v in rows.values()])),
        "y": pa.array(np.concatenate([v[1] for v in rows.values()])),
    })
    out = spearman(
        ray.data.from_arrow(t).repartition(4), "g", "x", "y",
        num_buckets=4,
    ).to_pandas().set_index("g")
    assert out.loc["mono", "spearman"] == 1.0
    assert out.loc["anti", "spearman"] == -1.0
    assert 0.0 < out.loc["noisy", "spearman"] < 0.6

    # tie handling: mid-ranks vs scipy-style reference on small data
    xs = np.array([1.0, 1.0, 2.0, 3.0, 3.0, 3.0])
    ys = np.array([2.0, 1.0, 3.0, 5.0, 5.0, 4.0])
    t2 = pa.table({"g": pa.array(["t"] * 6), "x": pa.array(xs),
                   "y": pa.array(ys)})
    got = spearman(ray.data.from_arrow(t2), "g", "x", "y",
                   round_digits=9).to_pandas()["spearman"].iloc[0]

    def midrank(v):
        order = np.argsort(v, kind="stable")
        r = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(v):
            j = i
            while j < len(v) and sv[j] == sv[i]:
                j += 1
            r[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return r

    rx, ry = midrank(xs), midrank(ys)
    want = np.corrcoef(rx, ry)[0, 1]
    assert abs(got - want) < 1e-9


def test_trimmed_mean_known_and_robust(ray_session):
    from featherstore_ray.stages.aggregate import trimmed_mean

    v = list(range(1, 11))          # 1..10, alpha=0.1 trims 1 each end
    t = pa.table({
        "g": pa.array(["a"] * 10 + ["tiny"]),
        "v": pa.array([float(x) for x in v] + [7.0]),
    })
    out = trimmed_mean(
        ray.data.from_arrow(t).repartition(2), "g", "v", alpha=0.1,
        num_buckets=2,
    ).to_pandas().set_index("g")
    assert out.loc["a", "trimmed_mean"] == np.mean(v[1:-1])
    assert out.loc["a", "n"] == 10
    assert out.loc["tiny", "trimmed_mean"] == 7.0  # floor(0.1*1)=0: no trim
    # robustness: one huge outlier barely moves the 10% trim
    v2 = np.concatenate([np.ones(99), [1e9]])
    t2 = pa.table({"g": pa.array(["r"] * 100), "v": pa.array(v2)})
    got = trimmed_mean(ray.data.from_arrow(t2), "g", "v",
                       alpha=0.1).to_pandas()["trimmed_mean"].iloc[0]
    assert got == 1.0


def test_geometric_median_matches_weiszfeld_and_resists_outlier(ray_session):
    from featherstore_ray.stages.ann import geometric_median

    rng = np.random.default_rng(81)
    n, d = 200, 4
    emb = rng.normal(size=(n, d))
    emb[0] = [1000.0, 0, 0, 0]  # gross outlier
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in emb]),
    })
    out = geometric_median(
        ray.data.from_arrow(t).repartition(3), iters=5, round_digits=9,
    ).to_pandas().iloc[0].to_numpy()

    x = emb.astype(np.float32).astype(np.float64)
    m = x.mean(axis=0)
    for _ in range(5):
        dist = np.maximum(np.linalg.norm(x - m, axis=1), 1e-9)
        inv = 1.0 / dist
        m = (x * inv[:, None]).sum(axis=0) / inv.sum()
    np.testing.assert_allclose(out, m, atol=1e-6)
    # robust: median stays near origin despite the outlier-dragged mean
    assert np.linalg.norm(out) < 1.0
    assert np.linalg.norm(x.mean(axis=0)) > 3.0


def test_weighted_median_known_values(ray_session):
    from featherstore_ray.stages.aggregate import weighted_median

    t = pa.table({
        "g": pa.array(["a"] * 4 + ["b"] * 3 + ["skip"]),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 5.0]),
        "w": pa.array([1.0, 1.0, 5.0, 1.0, 2.0, 1.0, 1.0, None]),
    })
    out = weighted_median(
        ray.data.from_arrow(t).repartition(3), "g", "v", "w",
        num_buckets=2,
    ).to_pandas().set_index("g")
    # a: total 8, half 4 -> cum 1,2,7,8 -> first >= 4 is v=3
    assert out.loc["a", "w_median"] == 3.0
    # b: total 4, half 2 -> cum 2,3,4 -> v=10 (cum 2 >= 2, closed)
    assert out.loc["b", "w_median"] == 10.0
    assert "skip" not in out.index  # null-weight-only group drops

    # tie pooling: all weight at one value
    t2 = pa.table({"g": ["t"] * 3, "v": [5.0, 5.0, 9.0],
                   "w": [1.0, 1.0, 1.0]})
    got = weighted_median(ray.data.from_arrow(t2), "g", "v",
                          "w").to_pandas()["w_median"].iloc[0]
    assert got == 5.0


def test_group_sample_deterministic_and_uniform(ray_session):
    from featherstore_ray.stages.misc import group_sample

    rng = np.random.default_rng(99)
    n = 6000
    t = pa.table({
        "src": pa.array(rng.choice(["a", "b", "c"], n)),
        "kid": pa.array(rng.permutation(n).astype(np.int64)),
    })
    a = group_sample(ray.data.from_arrow(t).repartition(4),
                     "src", "kid", 50, num_buckets=4).to_pandas()
    b = group_sample(ray.data.from_arrow(t).repartition(9),
                     "src", "kid", 50, num_buckets=8).to_pandas()
    ka = a.sort_values(["src", "kid"]).reset_index(drop=True)
    kb = b.sort_values(["src", "kid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(ka, kb)  # partitioning-invariant
    assert (a.groupby("src").size() == 50).all()
    # roughly uniform over the key range (hash draw, not prefix)
    assert a["kid"].mean() > n * 0.25 and a["kid"].mean() < n * 0.75


def test_auc_matches_pairwise_definition(ray_session):
    from featherstore_ray.stages.aggregate import auc

    rng = np.random.default_rng(101)
    rows_g, rows_v, rows_l = [], [], []
    for g, sep in (("good", 2.0), ("rand", 0.0)):
        pos = rng.normal(sep, 1, 80)
        neg = rng.normal(0, 1, 120)
        rows_g += [g] * 200
        rows_v += list(pos) + list(neg)
        rows_l += ["p"] * 80 + ["n"] * 120
    # a tie-heavy group: integer scores
    rows_g += ["ties"] * 8
    rows_v += [1.0, 1.0, 2.0, 2.0, 1.0, 2.0, 3.0, 0.0]
    rows_l += ["p", "p", "p", "n", "n", "n", "p", "n"]
    t = pa.table({"g": pa.array(rows_g), "v": pa.array(rows_v),
                  "lab": pa.array(rows_l)})
    out = auc(
        ray.data.from_arrow(t).repartition(4), "g", "v", "lab", "p", "n",
        num_buckets=4,
    ).to_pandas().set_index("g")

    def auc_ref(pos, neg):
        wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
        return wins / (len(pos) * len(neg))

    for g in ("good", "rand", "ties"):
        pos = [v for gg, v, l in zip(rows_g, rows_v, rows_l)
               if gg == g and l == "p"]
        neg = [v for gg, v, l in zip(rows_g, rows_v, rows_l)
               if gg == g and l == "n"]
        assert abs(out.loc[g, "auc"] - auc_ref(pos, neg)) < 1e-6, g
    assert out.loc["good", "auc"] > 0.85
    assert 0.35 < out.loc["rand", "auc"] < 0.65


def test_calibration_bins_perfect_and_biased(ray_session):
    from featherstore_ray.stages.aggregate import calibration_bins

    rng = np.random.default_rng(111)
    n = 20000
    s = rng.uniform(0, 1, n)
    y = (rng.uniform(0, 1, n) < s)  # perfectly calibrated labels
    t = pa.table({
        "score": pa.array(s),
        "lab": pa.array(np.where(y, "pos", "neg")),
    })
    out = calibration_bins(
        ray.data.from_arrow(t).repartition(4), "score", "lab", "pos",
        n_bins=10,
    ).to_pandas()
    assert out["n"].sum() == n and len(out) == 10
    # calibrated: per-bin frac_pos tracks avg_score
    np.testing.assert_allclose(out["frac_pos"], out["avg_score"],
                               atol=0.05)
    # brier of a calibrated uniform scorer ~ E[s(1-s)] = 1/6
    brier = (out["brier"] * out["n"]).sum() / n
    assert abs(brier - 1 / 6) < 0.01
    # biased scorer: constant 0.9 on balanced labels -> frac_pos ~ 0.5
    t2 = pa.table({
        "score": pa.array(np.full(1000, 0.9)),
        "lab": pa.array(["pos", "neg"] * 500),
    })
    out2 = calibration_bins(ray.data.from_arrow(t2), "score", "lab",
                            "pos").to_pandas()
    assert len(out2) == 1 and out2["bin"].iloc[0] == 9
    assert abs(out2["frac_pos"].iloc[0] - 0.5) < 1e-9


def test_ndcg_perfect_and_shuffled(ray_session):
    from featherstore_ray.stages.aggregate import ndcg

    # "perfect": score order equals gain order -> ndcg 1
    # "worst": inverted order -> low ndcg; "empty_gain": idcg 0 -> NULL
    rows = []
    for i, gain in enumerate([3.0, 2.0, 1.0, 0.0]):
        rows.append(("perfect", 10.0 - i, gain, i))
        rows.append(("worst", float(i), gain, 100 + i))
    rows.append(("empty_gain", 5.0, 0.0, 200))
    t = pa.table({
        "g": pa.array([r[0] for r in rows]),
        "s": pa.array([r[1] for r in rows]),
        "gain": pa.array([r[2] for r in rows]),
        "tb": pa.array([r[3] for r in rows], pa.int64()),
    })
    out = ndcg(
        ray.data.from_arrow(t).repartition(3), "g", "s", "gain", "tb",
        k=10, num_buckets=2,
    ).to_pandas().set_index("g")
    assert out.loc["perfect", "ndcg"] == 1.0
    assert 0 < out.loc["worst", "ndcg"] < 0.85
    assert np.isnan(out.loc["empty_gain", "ndcg"])

    # manual check for "worst": order by s desc = gains [0,1,2,3]
    dcg = sum(g / np.log2(i + 2) for i, g in enumerate([0.0, 1.0, 2.0, 3.0]))
    idcg = sum(g / np.log2(i + 2) for i, g in enumerate([3.0, 2.0, 1.0, 0.0]))
    assert abs(out.loc["worst", "ndcg"] - dcg / idcg) < 1e-6


def test_top_items_per_group_ties_and_counts(ray_session):
    from featherstore_ray.stages.aggregate import top_items_per_group

    t = pa.table({
        "g": pa.array(["u"] * 7 + ["v"] * 2 + [None]),
        "it": pa.array(["a", "a", "a", "b", "b", "c", "d",
                        "x", "y", "z"]),
    })
    out = top_items_per_group(
        ray.data.from_arrow(t).repartition(3), "g", "it", 3,
        num_buckets=2,
    ).to_pandas()
    u = out[out["g"] == "u"].reset_index(drop=True)
    # a(3), b(2), then count-1 tie c < d
    assert u["it"].tolist() == ["a", "b", "c"]
    assert u["n"].tolist() == [3, 2, 1]
    v = out[out["g"] == "v"]
    assert sorted(v["it"]) == ["x", "y"]  # fewer than k items
    assert out["g"].notna().all()


def test_target_encode_distributed_route_parity(ray_session):
    """driver_cat_cap=0 forces the bucket-merge + hash_join route; output
    must equal the broadcast route row-for-row (incl. null cats/targets)."""
    from featherstore_ray.stages.misc import target_encode

    t = pa.table({
        "c": ["a"] * 100 + ["b"] * 2 + [None] * 3,
        "y": [1.0] * 100 + [10.0, 10.0] + [None, 4.0, 4.0],
        "i": list(range(105)),
    })
    kw = dict(smoothing=10.0)
    drv = (
        target_encode(ray.data.from_arrow(t).repartition(4), "c", "y", **kw)
        .to_pandas().sort_values("i").reset_index(drop=True)
    )
    dist = (
        target_encode(ray.data.from_arrow(t).repartition(4), "c", "y",
                      driver_cat_cap=0, num_buckets=8, **kw)
        .to_pandas().sort_values("i").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(drv, dist[drv.columns], check_dtype=False)


def test_target_encode_high_cardinality_distributed(ray_session):
    """ID-grade cat_col (10^6 distinct categories): the auto-routed
    distributed merge must match the closed form without any driver-side
    category materialization."""
    from featherstore_ray.stages.misc import target_encode

    n = 1_000_000
    cat = np.arange(n, dtype=np.int64)
    y = (cat % 7).astype(np.float64)
    t = pa.table({"c": pa.array(cat), "y": pa.array(y)})
    m = 20.0
    out = (
        target_encode(
            ray.data.from_arrow(t).repartition(8), "c", "y",
            driver_cat_cap=1000, num_buckets=16, smoothing=m,
        )
        .to_pandas().sort_values("c").reset_index(drop=True)
    )
    prior = y.mean()
    exp = np.round((y + m * prior) / (1 + m), 6)
    np.testing.assert_allclose(out["y_te"].to_numpy(), exp, atol=2e-6)
    assert len(out) == n


def test_group_standardize_distributed_route_parity(ray_session):
    from featherstore_ray.stages.misc import group_standardize

    rng = np.random.default_rng(7)
    n = 3000
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "e": pa.array(
            np.concatenate([rng.integers(0, 40, n - 2), [97, 98]]).astype(
                np.int64)),
        "v": pa.array(np.concatenate([rng.normal(50, 20, n - 2), [7.0, 7.0]])),
    })
    kw = dict(methods=("zscore", "minmax"))
    drv = (
        group_standardize(ray.data.from_arrow(t).repartition(6), "e", "v",
                          **kw)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    dist = (
        group_standardize(ray.data.from_arrow(t).repartition(6), "e", "v",
                          driver_group_cap=0, num_buckets=8, **kw)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(drv, dist[drv.columns], check_dtype=False)


def test_seasonal_mase_manual(ray_session):
    """Hand-checked two-entity case: entity 10 has exact 24h seasonality
    (mase 0); entity 20 lacks any row 24h back (omitted)."""
    from datetime import datetime, timedelta

    from featherstore_ray.stages.aggregate import seasonal_mase

    base = datetime(2024, 1, 1)
    rows = []
    # entity 10: value repeats every 24h over 3 days, 2 samples/day
    for d in range(3):
        for h, v in ((0, 5.0), (12, 9.0)):
            rows.append((10, base + timedelta(days=d, hours=h), v))
    # entity 20: all rows inside one day -> no seasonal predictor
    for h in range(4):
        rows.append((20, base + timedelta(hours=h), float(h)))
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
    })
    out = seasonal_mase(
        ray.data.from_arrow(t).repartition(3),
        period=timedelta(hours=24), num_buckets=4,
    ).to_pandas()
    assert list(out["user_id"]) == [10]
    r = out.iloc[0]
    # scored rows: days 1-2, both samples (prev + seasonal both exist)
    assert r["n_scored"] == 4
    assert r["mae_seasonal"] == 0.0 and r["mase"] == 0.0
    assert r["mae_naive"] == 4.0  # |5-9| and |9-5| alternating


def test_woe_iv_matches_closed_form():
    import pandas as pd

    from featherstore_ray.stages.aggregate import woe_iv

    df = pd.DataFrame({
        "cat": ["a"] * 10 + ["b"] * 10 + ["c"] * 5 + [None],
        "y":   [1] * 8 + [0] * 2 + [1] * 2 + [0] * 8 + [0] * 5 + [1],
    })
    out = (
        woe_iv(ray.data.from_pandas(df).repartition(3), "cat", "y",
               smoothing=0.5)
        .to_pandas().set_index("cat").sort_index()
    )
    # null category excluded on both sides
    assert set(out.index) == {"a", "b", "c"}
    pos = np.array([8.0, 2.0, 0.0])
    n = np.array([10.0, 10.0, 5.0])
    neg = n - pos
    dp = (pos + 0.5) / (pos.sum() + 0.5 * 3)
    dn = (neg + 0.5) / (neg.sum() + 0.5 * 3)
    woe = np.log(dp / dn)
    iv = float(((dp - dn) * woe).sum())
    np.testing.assert_allclose(out["woe"].to_numpy(),
                               np.round(woe, 6), atol=1e-9)
    np.testing.assert_allclose(out["iv"].to_numpy(),
                               np.full(3, round(iv, 6)), atol=1e-9)
    assert out["n_pos"].tolist() == [8, 2, 0]
    assert out["n_neg"].tolist() == [2, 8, 5]


def test_conformal_interval_coverage_and_formula():
    import pandas as pd

    from featherstore_ray.stages.aggregate import conformal_interval

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "g": ["x"] * n + ["y"] * n,
        "k": np.arange(2 * n, dtype=np.int64),
        "v": np.concatenate([rng.normal(10, 2, n), rng.normal(-5, 0.5, n)]),
    })
    out = (
        conformal_interval(
            ray.data.from_pandas(df).repartition(4), "g", "k", "v",
            alpha=0.2, cal_fraction=0.5, num_buckets=2,
        ).to_pandas().set_index("g")
    )
    # deterministic split: recompute calibration mask + exact reference
    h = (df["k"].to_numpy().astype(np.uint64) % np.uint64(1 << 32)) \
        * np.uint64(2654435761) % np.uint64(1 << 32)
    cal = df[h < np.uint64(int(0.5 * (1 << 32)))]
    for g in ["x", "y"]:
        ys = np.sort(cal.loc[cal["g"] == g, "v"].to_numpy())
        m = len(ys)
        assert out.loc[g, "n_cal"] == m

        def q(xs, level):
            hh = level * (len(xs) - 1)
            i = int(np.floor(hh))
            return xs[i] + (xs[min(i + 1, len(xs) - 1)] - xs[i]) * (hh - i)

        med = q(ys, 0.5)
        rs = np.sort(np.abs(ys - med))
        lev = min(1.0, np.ceil(0.8 * (m + 1)) / m)
        qh = q(rs, lev)
        assert abs(out.loc[g, "center"] - round(med, 6)) < 1e-9
        assert abs(out.loc[g, "q_hat"] - round(qh, 6)) < 1e-9
        # marginal coverage on the full sample is ~1-alpha
        vals = df.loc[df["g"] == g, "v"].to_numpy()
        cov = np.mean((vals >= out.loc[g, "lo"]) & (vals <= out.loc[g, "hi"]))
        assert cov >= 0.75


def test_temperature_mix_rebalances_toward_uniform():
    import pandas as pd

    from featherstore_ray.stages.misc import temperature_mix

    df = pd.DataFrame({
        "k": np.arange(1000),
        "s": ["big"] * 900 + ["small"] * 100,
    })
    out = temperature_mix(
        ray.data.from_pandas(df).repartition(4), "s", "k", alpha=0.5,
    ).to_pandas()
    got = out.groupby("s").size()
    # natural shares 0.9/0.1 -> alpha=0.5 targets ~0.75/0.25
    assert 0.70 < got["big"] / len(out) < 0.80
    assert got["small"] > 150  # upsampled: more copies than source rows
    # copy ids are dense per (key): every key's copies are 0..c-1
    mx = out.groupby("k")["copy_id"].agg(["max", "count"])
    assert (mx["max"] + 1 == mx["count"]).all()
    # deterministic
    out2 = temperature_mix(
        ray.data.from_pandas(df).repartition(2), "s", "k", alpha=0.5,
    ).to_pandas()
    a = out.sort_values(["k", "copy_id"]).reset_index(drop=True)
    b = out2.sort_values(["k", "copy_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_quantile_map_identity_and_singleton():
    import pandas as pd

    from featherstore_ray.stages.misc import quantile_map

    df = pd.DataFrame({
        "id": range(7),
        "g": ["r", "r", "r", "r", "a", "a", "b"],
        "v": [10.0, 20.0, 30.0, 40.0, 5.0, 6.0, 99.0],
    })
    out = quantile_map(
        ray.data.from_pandas(df).repartition(2), "g", "v", "r",
        num_buckets=4,
    ).to_pandas().set_index("id").sort_index()
    # the reference group (distinct values) maps onto itself
    assert list(out.loc[0:3, "mapped"]) == [10.0, 20.0, 30.0, 40.0]
    # group a: p=0 -> ref min, p=1 -> ref max
    assert out.loc[4, "mapped"] == 10.0
    assert out.loc[5, "mapped"] == 40.0
    # singleton group: percent_rank 0 -> ref min
    assert out.loc[6, "mapped"] == 10.0


def test_ipf_raking_margins_converge():
    import pandas as pd

    from featherstore_ray.stages.aggregate import ipf_raking

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "r": rng.choice(["a", "b", "c"], 400, p=[0.6, 0.3, 0.1]),
        "c": rng.choice(["x", "y"], 400, p=[0.8, 0.2]),
    })
    out = ipf_raking(
        ray.data.from_pandas(df).repartition(3), "r", "c", iters=20,
    ).to_pandas()
    n = out["n"].sum()
    # after 20 rounds, margins are (numerically) at the uniform targets
    rm = out.groupby("r")["weight"].sum()
    cm = out.groupby("c")["weight"].sum()
    assert np.allclose(rm, n / 3, atol=1e-3)
    assert np.allclose(cm, n / 2, atol=1e-3)
    # total mass preserved
    assert abs(out["weight"].sum() - n) < 1e-3


def test_did_hand_computed_and_missing_cell():
    import pandas as pd

    from featherstore_ray.stages.aggregate import did_estimate

    df = pd.DataFrame({
        "t": [0, 0, 0, 0, 1, 1, 1, 1],
        "p": [0, 0, 1, 1, 0, 0, 1, 1],
        "y": [1.0, 3.0, 2.0, 4.0, 5.0, 7.0, 10.0, 14.0],
    })
    out = did_estimate(
        ray.data.from_pandas(df).repartition(3), "t", "p", "y",
    ).to_pandas().set_index(["treated", "post"])
    # cell means: 2, 3, 6, 12 -> did = (12-6) - (3-2) = 5
    assert out.loc[(0, 0), "mean_value"] == 2.0
    assert out.loc[(1, 1), "mean_value"] == 12.0
    assert (out["did"] == 5.0).all()
    assert (out["n"] == 2).all()

    # a missing cell -> did is null, cells still reported
    out2 = did_estimate(
        ray.data.from_pandas(df[df["t"] + df["p"] > 0]), "t", "p", "y",
    ).to_pandas()
    assert len(out2) == 3 and out2["did"].isna().all()


def test_ate_stratified_closed_form_and_arm_filter():
    import pandas as pd

    from featherstore_ray.stages.aggregate import ate_stratified

    df = pd.DataFrame({
        "s": [1, 1, 1, 1, 2, 2, 2, 2, 3, 3],
        "t": [1, 1, 0, 0, 1, 0, 0, 0, 1, 1],  # stratum 3 has no control
        "y": [4.0, 6.0, 1.0, 3.0, 10.0, 7.0, 8.0, 9.0, 100.0, 200.0],
    })
    out = (
        ate_stratified(ray.data.from_pandas(df).repartition(3),
                       "t", "y", "s")
        .to_pandas().set_index("s").sort_index()
    )
    # stratum 3 (single-arm) excluded
    assert set(out.index) == {1, 2}
    assert out.loc[1, "diff"] == round(5.0 - 2.0, 6)
    assert out.loc[2, "diff"] == round(10.0 - 8.0, 6)
    ate = (4 * 3.0 + 4 * 2.0) / 8
    assert (out["ate"] == round(ate, 6)).all()
    assert out.loc[1, "n1"] == 2 and out.loc[2, "n0"] == 3


def test_isotonic_calibration_pav_parity():
    import pandas as pd

    from featherstore_ray.stages.aggregate import isotonic_calibration

    rng = np.random.default_rng(11)
    n = 5000
    score = np.round(rng.uniform(0, 1, n), 2)
    # true monotone relationship + noise so PAV actually pools
    y = (rng.uniform(0, 1, n) < 0.2 + 0.6 * score).astype(np.int64)
    df = pd.DataFrame({"s": score, "y": y})
    out = (
        isotonic_calibration(
            ray.data.from_pandas(df).repartition(6), "s", "y")
        .to_pandas().sort_values("score").reset_index(drop=True)
    )

    # pure-python PAV reference over the distinct-score table
    g = df.groupby("s", sort=True)["y"].agg(["sum", "count"])
    blocks = []  # (sum, count, k)
    for sv, cv in zip(g["sum"].to_numpy(dtype=float),
                      g["count"].to_numpy(dtype=float)):
        cur = [sv, cv, 1]
        while blocks and blocks[-1][0] / blocks[-1][1] >= cur[0] / cur[1]:
            p = blocks.pop()
            cur = [cur[0] + p[0], cur[1] + p[1], cur[2] + p[2]]
        blocks.append(cur)
    ref = np.concatenate([
        np.full(int(k), sv / cv) for sv, cv, k in blocks])
    np.testing.assert_allclose(out["calibrated"].to_numpy(),
                               np.round(ref, 6), atol=1e-9)
    # invariants: monotone non-decreasing; weighted mass preserved
    cal = out["calibrated"].to_numpy()
    assert (np.diff(cal) >= 0).all()
    # calibrated values are 6dp-rounded -> mass error up to n * 5e-7
    assert abs((cal * out["n"].to_numpy()).sum() - y.sum()) < 0.01
    assert out["n"].sum() == n


def test_pr_curve_confusion_counts_and_best_f1():
    import pandas as pd

    from featherstore_ray.stages.aggregate import pr_curve

    df = pd.DataFrame({
        "s": [0.9, 0.8, 0.8, 0.6, 0.4, 0.4, 0.2],
        "y": [1,   1,   0,   1,   0,   0,   1],
    })
    out = (
        pr_curve(ray.data.from_pandas(df).repartition(3), "s", "y")
        .to_pandas().sort_values("threshold", ascending=False)
        .reset_index(drop=True)
    )
    assert out["threshold"].tolist() == [0.9, 0.8, 0.6, 0.4, 0.2]
    assert out["tp"].tolist() == [1, 2, 3, 3, 4]
    assert out["fp"].tolist() == [0, 1, 1, 3, 3]
    assert out["fn"].tolist() == [3, 2, 1, 1, 0]
    # F1 at t=0.6: p=3/4, r=3/4 -> 0.75; best row
    assert abs(out.loc[2, "f1"] - 0.75) < 1e-9
    assert out.loc[2, "is_best"]
    assert out["is_best"].sum() == 1


def test_dr_ate_recovers_effect_under_confounding():
    import pandas as pd

    from featherstore_ray.stages.ann import dr_ate

    rng = np.random.default_rng(5)
    n, d = 2000, 8
    X = rng.normal(0, 1, (n, d)).astype(np.float32)
    # confounded treatment: depends on X[:,0]
    p = 1 / (1 + np.exp(-2.0 * X[:, 0]))
    t = (rng.uniform(0, 1, n) < p).astype(np.int64)
    # outcome in X[:,1]: effect +1.0 plus the confounder
    X[:, 1] = (1.0 * t + 1.5 * X[:, 0]
               + rng.normal(0, 0.3, n)).astype(np.float32)
    # explicit Arrow list type: from_pandas would tensor-cast the
    # uniform-length list column (the known to_pandas/ArrowTensor gotcha)
    tab = pa.table({
        "embedding": pa.array([list(map(float, r)) for r in X],
                              pa.list_(pa.float32())),
        "label": pa.array(np.where(t == 1, 0, 7).astype(np.int64)),
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
    })
    out = dr_ate(
        ray.data.from_arrow(tab).repartition(4),
        outcome_dim=1, treat_label=0, iters=8, lr=0.5, clip=0.05,
    ).to_pandas().iloc[0]
    # the naive difference absorbs the confounder (inflated well above 1)
    assert out["ate_naive"] > 1.6
    # AIPW pulls the estimate back toward the true effect
    assert abs(out["ate_dr"] - 1.0) < abs(out["ate_naive"] - 1.0) - 0.2
    assert out["n"] == n and out["n_treat"] == int(t.sum())


def test_knn_graph_bruteforce_parity():
    from featherstore_ray.stages.ann import knn_graph

    rng = np.random.default_rng(9)
    n, d, k = 120, 16, 4
    X = rng.normal(0, 1, (n, d)).astype(np.float32)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              pa.list_(pa.float32())),
    })
    out = (
        knn_graph(ray.data.from_arrow(tab).repartition(5), k=k,
                  block_rows=32)
        .to_pandas().sort_values(["id", "rank"]).reset_index(drop=True)
    )
    Xd = X.astype(np.float64)
    Xn = Xd / np.linalg.norm(Xd, axis=1, keepdims=True)
    S = np.round(Xn @ Xn.T, 4)
    np.fill_diagonal(S, -np.inf)
    for i in range(n):
        row = out[out["id"] == i]
        order = np.lexsort((np.arange(n), -S[i]))[:k]
        assert row["neighbor"].tolist() == list(order)
        np.testing.assert_allclose(row["cosine"].to_numpy(), S[i][order])
        assert row["rank"].tolist() == list(range(1, k + 1))


def test_rrf_fuse_bruteforce_parity():
    from featherstore_ray.stages.ann import rrf_fuse

    rng = np.random.default_rng(13)
    n, d = 200, 8
    X = rng.normal(0, 1, (n, d)).astype(np.float32)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              pa.list_(pa.float32())),
    })
    q0 = np.asarray(X[0], dtype=np.float64)
    q1 = np.asarray(X[1], dtype=np.float64)
    out = (
        rrf_fuse(ray.data.from_arrow(tab).repartition(4), [q0, q1],
                 k0=60, top=10, num_buckets=4)
        .to_pandas().reset_index(drop=True)
    )
    Xd = X.astype(np.float64)
    Xn = Xd / np.linalg.norm(Xd, axis=1, keepdims=True)
    rrf_ref = np.zeros(n)
    ranks = {}
    for qi, q in enumerate([q0, q1]):
        qn = q / np.linalg.norm(q)
        s = np.round(Xn @ qn, 4)
        order = np.lexsort((np.arange(n), -s))
        rk = np.empty(n, dtype=np.int64)
        rk[order] = np.arange(1, n + 1)
        ranks[qi] = rk
        rrf_ref = rrf_ref + 1.0 / (60 + rk)
    top_ids = np.lexsort((np.arange(n), -rrf_ref))[:10]
    assert out["vec_id"].tolist() == list(top_ids)
    np.testing.assert_allclose(out["rrf"].to_numpy(), rrf_ref[top_ids])
    assert out["rank_0"].tolist() == list(ranks[0][top_ids])


def test_lift_table_exact_decile_math():
    import pandas as pd

    from featherstore_ray.stages.misc import lift_table

    n = 100
    # score = 100-i so rank i+1 has id i; positives are the top 20 ids
    df = pd.DataFrame({
        "s": (100 - np.arange(n)).astype(np.float64),
        "y": (np.arange(n) < 20).astype(np.int64),
        "tb": np.arange(n, dtype=np.int64),
    })
    out = (
        lift_table(ray.data.from_pandas(df).repartition(4),
                   "s", "y", "tb", n_bins=10, num_buckets=2)
        .to_pandas().set_index("bin").sort_index()
    )
    assert out["n"].tolist() == [10] * 10
    assert out["n_pos"].tolist() == [10, 10, 0, 0, 0, 0, 0, 0, 0, 0]
    assert abs(out.loc[1, "cum_capture"] - 0.5) < 1e-9
    assert abs(out.loc[2, "cum_capture"] - 1.0) < 1e-9
    # base rate 0.2 -> top-decile lift = 1.0/0.2 = 5
    assert abs(out.loc[1, "lift"] - 5.0) < 1e-9
    assert abs(out.loc[10, "lift"] - 0.0) < 1e-9


def test_bootstrap_ci_deterministic_and_covers_mean():
    import pandas as pd

    from featherstore_ray.stages.aggregate import bootstrap_ci

    rng = np.random.default_rng(17)
    n = 300
    df = pd.DataFrame({
        "g": ["a"] * n,
        "k": np.arange(n, dtype=np.int64),
        "v": rng.normal(50, 5, n),
    })
    out1 = bootstrap_ci(ray.data.from_pandas(df).repartition(3),
                        "g", "k", "v", n_boot=200).to_pandas()
    out2 = bootstrap_ci(ray.data.from_pandas(df).repartition(5),
                        "g", "k", "v", n_boot=200).to_pandas()
    # deterministic across partitionings
    pd.testing.assert_frame_equal(
        out1.sort_values("g").reset_index(drop=True),
        out2.sort_values("g").reset_index(drop=True))
    r = out1.iloc[0]
    assert r["lo"] < r["mean"] < r["hi"]
    # CI width ~ 2*1.96*sigma/sqrt(n) ~ 1.13; sane bounds
    assert 0.4 < r["hi"] - r["lo"] < 3.0
    assert abs(r["mean"] - df["v"].mean()) < 1e-6

    # exact reference replicate means for the hash draw rule
    v = df.sort_values("k")["v"].to_numpy()
    seq = (np.arange(200, dtype=np.uint64)[:, None] * np.uint64(n)
           + np.arange(1, n + 1, dtype=np.uint64)[None, :])
    idx = ((seq * np.uint64(2654435761)) % np.uint64(1 << 32)
           % np.uint64(n)).astype(np.int64)
    ms = np.sort(v[idx].sum(axis=1) / n)

    def q(xs, level):
        h = level * (len(xs) - 1)
        i = int(np.floor(h))
        return xs[i] + (xs[min(i + 1, len(xs) - 1)] - xs[i]) * (h - i)

    assert abs(r["lo"] - round(q(ms, 0.025), 6)) < 1e-9
    assert abs(r["hi"] - round(q(ms, 0.975), 6)) < 1e-9


def test_seasonality_index_exact_profile():
    import pandas as pd

    from featherstore_ray.stages.aggregate import seasonality_index

    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3_600_000_000, "us")
    # entity 1: hour 0 mean 10 (2 rows), hour 3 mean 30 (1 row)
    ts = np.array([base, base + 24 * h, base + 3 * h])
    df = pd.DataFrame({
        "e": [1, 1, 1],
        "ts": ts,
        "v": [8.0, 12.0, 30.0],
    })
    out = (
        seasonality_index(ray.data.from_pandas(df).repartition(2),
                          "e", "ts", "v", num_buckets=2)
        .to_pandas().set_index("hour").sort_index()
    )
    assert out.loc[0, "n"] == 2 and out.loc[3, "n"] == 1
    em = 50.0 / 3
    assert abs(out.loc[0, "hour_mean"] - 10.0) < 1e-9
    assert abs(out.loc[0, "idx"] - round(10.0 / em, 6)) < 1e-9
    assert abs(out.loc[3, "idx"] - round(30.0 / em, 6)) < 1e-9


def test_ecod_outliers_matches_numpy(ray_session):
    from featherstore_ray.stages.ann import ecod_outliers

    rng = np.random.default_rng(31)
    n, d = 300, 4
    emb = rng.normal(size=(n, d))
    emb[17] += 9.0          # planted right-tail outlier
    emb[50] = emb[51]       # exact duplicate rows → tie handling
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in emb]),
    })
    out = ecod_outliers(
        ray.data.from_arrow(t).repartition(5), dims=d, range_buckets=3,
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)

    x = emb.astype(np.float32).astype(np.float64)
    ol = np.zeros(n)
    orr = np.zeros(n)
    for j in range(d):
        v = x[:, j]
        le = (v[:, None] >= v[None, :]).sum(axis=1)      # count <= x
        ge = (v[:, None] <= v[None, :]).sum(axis=1)      # count >= x
        ol += -np.log(le / n)
        orr += -np.log(ge / n)
    np.testing.assert_allclose(out["o_left"].to_numpy(),
                               np.round(ol, 6), atol=2e-6)
    np.testing.assert_allclose(out["o_right"].to_numpy(),
                               np.round(orr, 6), atol=2e-6)
    np.testing.assert_allclose(
        out["score"].to_numpy(), np.round(np.maximum(ol, orr), 6),
        atol=2e-6)
    # planted outlier has the top score; duplicates share identical scores
    assert out.loc[out["score"].idxmax(), "vec_id"] == 17
    assert out.loc[50, "score"] == out.loc[51, "score"]


def test_ecod_outliers_partition_invariance(ray_session):
    from featherstore_ray.stages.ann import ecod_outliers

    rng = np.random.default_rng(7)
    emb = rng.normal(size=(120, 3))
    t = pa.table({
        "vec_id": pa.array(np.arange(120), pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in emb]),
    })
    a = ecod_outliers(ray.data.from_arrow(t).repartition(2),
                      dims=3).to_pandas().sort_values("vec_id")
    b = ecod_outliers(ray.data.from_arrow(t).repartition(9),
                      dims=3, range_buckets=2).to_pandas().sort_values("vec_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
