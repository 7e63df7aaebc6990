"""Round-3 corpus operators: vocab count, text normalization, weighted
sampling, bloom semi-join — each vs a DuckDB oracle or an exact path."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import pytest

import ray.data

DOCS = "/root/testdata/sf0.01/documents.parquet"
ORDERS = "/root/testdata/sf0.01/orders.parquet"
CUSTOMER = "/root/testdata/sf0.01/customer.parquet"


def test_vocab_count_matches_duckdb(ray_session):
    from featherstore_ray.stages.text import vocab_count

    out = vocab_count(
        ray.data.read_parquet(DOCS, columns=["text"]), top_n=50,
        num_buckets=8,
    ).to_pandas()
    con = duckdb.connect()
    exp = con.execute(
        f"""
        SELECT token, n FROM (
            SELECT token, count(*) AS n FROM (
                SELECT unnest(string_split(text, ' ')) AS token
                FROM read_parquet('{DOCS}')
            ) GROUP BY token
        ) ORDER BY n DESC, token LIMIT 50
        """
    ).df()
    o = out.sort_values(["n", "token"], ascending=[False, True]).reset_index(
        drop=True
    )
    x = exp.sort_values(["n", "token"], ascending=[False, True]).reset_index(
        drop=True
    )
    # the synthetic corpus vocabulary is smaller than 50 — both engines
    # must agree on the full list then
    assert len(o) == len(x) and len(o) > 0
    pd.testing.assert_frame_equal(o, x, check_dtype=False)


def test_normalize_text_matches_duckdb(ray_session):
    from featherstore_ray.stages.text import normalize_text

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "  Hello   WORLD  ",
                    "a\tb\n\nc",
                    "already clean",
                    "MIXED   Case\t tabs",
                ]
            ),
        }
    )
    out = normalize_text(ray.data.from_arrow(t)).to_pandas().sort_values(
        "doc_id"
    )
    con = duckdb.connect()
    con.register("d", t)
    exp = con.execute(
        r"""
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text_norm
        FROM d ORDER BY doc_id
        """
    ).df()
    assert list(out["text_norm"]) == list(exp["text_norm"])
    assert list(out["text_norm"])[:2] == ["hello world", "a b c"]


def test_weighted_sample_matches_duckdb(ray_session):
    from featherstore_ray.stages.misc import weighted_sample
    from featherstore_ray.stages.text import token_count

    k = 100
    weighted = token_count(
        ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    ).select_columns(["doc_id", "n_tok_ws"])
    out = weighted_sample(weighted, "doc_id", "n_tok_ws", k).to_pandas()
    con = duckdb.connect()
    exp = con.execute(
        f"""
        SELECT doc_id, n_tok_ws FROM (
            SELECT doc_id, n_tok_ws,
                   ROW_NUMBER() OVER (
                     ORDER BY round(pow(
                       ((doc_id % 4294967296) * 2654435761 % 4294967296
                         + 0.5) / 4294967296.0,
                       1.0 / greatest(n_tok_ws, 1e-12)), 6) DESC, doc_id
                   ) AS rn
            FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tok_ws
                  FROM read_parquet('{DOCS}'))
        ) WHERE rn <= {k}
        """
    ).df()
    assert len(out) == k
    assert sorted(out["doc_id"]) == sorted(exp["doc_id"])


def test_weighted_sample_respects_weights(ray_session):
    # two strata: weight 50 vs weight 1 — the heavy stratum must dominate
    from featherstore_ray.stages.misc import weighted_sample

    n = 4000
    t = pa.table(
        {
            "kid": pa.array(np.arange(n), pa.int64()),
            "w": pa.array(
                np.where(np.arange(n) < n // 2, 50.0, 1.0), pa.float64()
            ),
        }
    )
    out = weighted_sample(
        ray.data.from_arrow(t), "kid", "w", 400
    ).to_pandas()
    heavy = (out["kid"] < n // 2).mean()
    assert heavy > 0.9, heavy  # E[heavy] ~ 0.98 under A-ES


def test_bloom_semi_join_exact_matches_is_in(ray_session):
    from featherstore_ray.stages.filters import bloom_semi_join

    cust = pq.read_table(CUSTOMER, columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))[
        "c_custkey"
    ]
    out = bloom_semi_join(
        ray.data.read_parquet(
            ORDERS, columns=["o_orderkey", "o_custkey", "o_totalprice"]
        ),
        keys,
        "o_custkey",
    ).to_pandas()
    con = duckdb.connect()
    exp = con.execute(
        f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM read_parquet('{ORDERS}')
        WHERE o_custkey IN (
            SELECT c_custkey FROM read_parquet('{CUSTOMER}')
            WHERE c_mktsegment = 'BUILDING')
        """
    ).df()
    assert len(out) == len(exp) and len(out) > 0
    assert sorted(out["o_orderkey"]) == sorted(exp["o_orderkey"])


def test_bloom_prefilter_no_false_negatives_and_low_fp(ray_session):
    from featherstore_ray.stages.filters import bloom_semi_join

    rng = np.random.default_rng(17)
    members = np.unique(rng.integers(0, 10**9, 5_000))
    non_members = np.setdiff1d(
        np.unique(rng.integers(10**9, 2 * 10**9, 20_000)), members
    )
    facts = pa.table(
        {"k": pa.array(np.concatenate([members, non_members]), pa.int64())}
    )
    out = bloom_semi_join(
        ray.data.from_arrow(facts), pa.array(members), "k",
        num_bits=1 << 18, num_hashes=4, exact=False,
    ).to_pandas()
    got = set(out["k"])
    assert set(members) <= got  # bloom never drops a member
    fp = len(got - set(members)) / max(len(non_members), 1)
    assert fp < 0.05, fp  # m=262144, n=5000, k=4 -> fp ~ 1e-5


def test_repetition_ratio_matches_duckdb(ray_session):
    from featherstore_ray.stages.text import repetition_ratio

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a a a a",          # 0.75
                    "all distinct words here",  # 0
                    "x",                # 0
                    "spam spam ham spam eggs",  # 2/5 = 0.4
                ]
            ),
        }
    )
    out = repetition_ratio(
        ray.data.from_arrow(t)
    ).to_pandas().sort_values("doc_id")
    assert list(out["rep_ratio"]) == [0.75, 0.0, 0.0, 0.4]
    con = duckdb.connect()
    exp = con.execute(
        f"""
        SELECT doc_id,
               round(1 - len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' ')), 6) AS rep_ratio
        FROM read_parquet('{DOCS}')
        ORDER BY doc_id
        """
    ).df()
    got = repetition_ratio(
        ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["rep_ratio"], exp["rep_ratio"])


def test_top_n_per_group_matches_duckdb(ray_session):
    from featherstore_ray.stages.latest import top_n_per_group

    events = "/root/testdata/sf0.01/events.parquet"
    out = top_n_per_group(
        ray.data.read_parquet(
            events, columns=["event_id", "user_id", "ts", "value"]
        ),
        group_col="user_id", order_col="ts", n=3,
        descending=True, tiebreak="event_id", num_buckets=8,
    ).to_pandas()
    con = duckdb.connect()
    exp = con.execute(
        f"""
        SELECT event_id, user_id, ts, value FROM (
            SELECT event_id, user_id, ts, value,
                   ROW_NUMBER() OVER (
                     PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM read_parquet('{events}')
        ) WHERE rn <= 3
        """
    ).df()
    cols = ["event_id", "user_id"]
    o = out.sort_values(cols).reset_index(drop=True)
    x = exp.sort_values(cols).reset_index(drop=True)
    assert len(o) == len(x) and len(o) > 0
    pd.testing.assert_frame_equal(
        o[sorted(o.columns)], x[sorted(x.columns)], check_dtype=False
    )


def test_pivot_counts_matches_duckdb(ray_session):
    from featherstore_ray.stages.aggregate import pivot_counts

    events = "/root/testdata/sf0.01/events.parquet"
    out = pivot_counts(
        ray.data.read_parquet(events, columns=["user_id", "event_type"]),
        "user_id", "event_type",
        values=["click", "error", "purchase", "signup", "view"],
        num_buckets=8,
    ).to_pandas()
    con = duckdb.connect()
    exp = con.execute(
        f"""
        SELECT user_id,
               count(*) FILTER (event_type = 'click')    AS event_type_click,
               count(*) FILTER (event_type = 'error')    AS event_type_error,
               count(*) FILTER (event_type = 'purchase') AS event_type_purchase,
               count(*) FILTER (event_type = 'signup')   AS event_type_signup,
               count(*) FILTER (event_type = 'view')     AS event_type_view
        FROM read_parquet('{events}') GROUP BY user_id
        """
    ).df()
    o = out.sort_values("user_id").reset_index(drop=True)
    x = exp.sort_values("user_id").reset_index(drop=True)
    assert len(o) == len(x) and len(o) > 0
    pd.testing.assert_frame_equal(
        o[sorted(o.columns)], x[sorted(x.columns)], check_dtype=False
    )


def test_pivot_counts_discovers_values(ray_session):
    from featherstore_ray.stages.aggregate import pivot_counts

    t = pa.table(
        {
            "g": pa.array([1, 1, 2, 2, 2], pa.int64()),
            "p": pa.array(["a", "b", "a", "a", None]),
        }
    )
    out = pivot_counts(
        ray.data.from_arrow(t), "g", "p", num_buckets=4
    ).to_pandas().sort_values("g").reset_index(drop=True)
    assert sorted(c for c in out.columns if c != "g") == ["p_a", "p_b"]
    assert list(out["p_a"]) == [1, 2]
    assert list(out["p_b"]) == [1, 0]


def test_keyed_set_ops(ray_session):
    from featherstore_ray.stages.misc import except_keys, intersect_keys

    l = pa.table({"k": pa.array([1, 1, 2, 3, 5], pa.int64())})
    r = pa.table({"k": pa.array([2, 3, 4], pa.int64())})
    inter = intersect_keys(
        ray.data.from_arrow(l), ray.data.from_arrow(r), ["k"], num_buckets=4
    ).to_pandas()
    assert sorted(inter["k"]) == [2, 3]
    exc = except_keys(
        ray.data.from_arrow(l), ray.data.from_arrow(r), ["k"], num_buckets=4
    ).to_pandas()
    assert sorted(exc["k"]) == [1, 5]
    # EMPTY result keeps its Dataset schema (the exchange drops empty
    # blocks; the typed seed block preserves it). NOTE: Ray's to_pandas on
    # a fully-empty dataset still yields a column-less frame — that is a
    # Ray conversion limitation, so the schema check is Dataset-level.
    sub = pa.table({"k": pa.array([1, 2], pa.int64())})
    empty = except_keys(
        ray.data.from_arrow(sub), ray.data.from_arrow(l), ["k"],
        num_buckets=4,
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema().base_schema] == ["k"]


def test_explode_with_position(ray_session):
    from featherstore_ray.stages.misc import explode

    t = pa.table(
        {
            "rid": pa.array([10, 11, 12], pa.int64()),
            "xs": pa.array([[1, 2, 3], [], [7]], pa.list_(pa.int64())),
        }
    )
    out = explode(
        ray.data.from_arrow(t), "xs", keep_cols=["rid"]
    ).to_pandas().sort_values(["rid", "pos"]).reset_index(drop=True)
    assert list(out["rid"]) == [10, 10, 10, 12]
    assert list(out["pos"]) == [0, 1, 2, 0]
    assert list(out["xs_item"]) == [1, 2, 3, 7]


def test_pivot_sum_empty_group_is_null(ray_session):
    # SQL SUM(CASE WHEN p=v THEN x END) is NULL for a group with no
    # matching rows (and for all-null matched values) — not 0.0
    from featherstore_ray.stages.aggregate import pivot_counts

    t = pa.table(
        {
            "g": pa.array([1, 1, 2, 3], pa.int64()),
            "p": pa.array(["a", "b", "a", "a"]),
            "x": pa.array([1.5, 2.0, 4.0, None], pa.float64()),
        }
    )
    out = pivot_counts(
        ray.data.from_arrow(t), "g", "p",
        values=["a", "b"], value_col="x", agg="sum", num_buckets=4,
    ).to_pandas().sort_values("g").reset_index(drop=True)
    assert sorted(out.columns) == ["g", "p_a", "p_b"]
    assert out["p_a"].iloc[0] == 1.5 and out["p_b"].iloc[0] == 2.0
    assert out["p_a"].iloc[1] == 4.0
    assert pd.isna(out["p_b"].iloc[1])  # group 2 has no p='b' rows
    assert pd.isna(out["p_a"].iloc[2])  # group 3 matched only a NULL x


def test_keyed_set_ops_null_keys(ray_session):
    # SQL INTERSECT/EXCEPT treat NULL keys as equal values
    from featherstore_ray.stages.misc import except_keys, intersect_keys

    l = pa.table({"k": pa.array([1, None, 2], pa.int64())})
    r = pa.table({"k": pa.array([None, 2, 4], pa.int64())})
    inter = intersect_keys(
        ray.data.from_arrow(l), ray.data.from_arrow(r), ["k"], num_buckets=4
    ).to_pandas()
    assert len(inter) == 2  # {NULL, 2}
    assert inter["k"].isna().sum() == 1 and set(inter["k"].dropna()) == {2}
    exc = except_keys(
        ray.data.from_arrow(l), ray.data.from_arrow(r), ["k"], num_buckets=4
    ).to_pandas()
    assert list(exc["k"].dropna()) == [1] and exc["k"].isna().sum() == 0


def test_pack_greedy_known():
    from featherstore_ray.stages.packing import pack_greedy

    sid, off = pack_greedy(np.array([100, 100, 100, 301, 50, 260, 10]), 300)
    # [100,100,100] fills 300; [301] oversized alone; [50] + 260 would
    # overflow -> [50,?] no: 50+260=310>300 so 260 starts new; [260,10] fits
    assert sid.tolist() == [0, 0, 0, 1, 2, 3, 3]
    assert off.tolist() == [0, 100, 200, 0, 0, 0, 260]


def test_pack_sequences_batch_invariant(ray_session):
    from featherstore_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(3)
    n = 400
    t = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": np.array([f"s{i % 7}" for i in range(n)]),
            "n_tokens": rng.integers(1, 200, n),
        }
    )

    def run(blocks):
        return (
            pack_sequences(
                ray.data.from_arrow(t).repartition(blocks),
                budget=512, num_buckets=8,
            )
            .to_pandas()
            .sort_values(["source", "doc_id"])
            .reset_index(drop=True)
        )

    one, many = run(1), run(6)
    pd.testing.assert_frame_equal(one, many)
    # every sequence within budget unless it is a single oversized doc
    g = one.groupby(["source", "seq_id"])["n_tokens"]
    tot, cnt = g.sum(), g.count()
    assert ((tot <= 512) | (cnt == 1)).all()
    # offsets are the running sum within each sequence
    assert (
        one.groupby(["source", "seq_id"])["n_tokens"]
        .apply(lambda s: s.cumsum().shift(fill_value=0).tolist())
        .explode()
        .astype(int)
        .to_numpy()
        == one["seq_offset"].to_numpy()
    ).all()


def test_event_sequence_order_cap_and_invariance(ray_session):
    from featherstore_ray.stages.aggregate import event_sequence

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00"] * 2 + ["2024-01-01 00:00:05",
         "2024-01-01 00:00:01", "2024-01-01 00:00:02"]
    )
    t = pa.table(
        {
            "user_id": [1, 1, 1, 1, 2],
            "ts": ts,
            "event_type": ["a", "b", "c", "d", "x"],
            "event_id": [11, 10, 12, 13, 14],  # tie at t0 -> id 10 first
        }
    )

    def run(blocks, max_len):
        return (
            event_sequence(
                ray.data.from_arrow(t).repartition(blocks),
                max_len=max_len, num_buckets=4,
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )

    out = run(1, None)
    assert out["journey"].tolist() == ["b>a>d>c", "x"]
    assert out["n_events"].tolist() == [4, 1]
    capped = run(3, 2)
    assert capped["journey"].tolist() == ["b>a", "x"]
    assert capped["n_events"].tolist() == [4, 1]  # count is uncapped
    pd.testing.assert_frame_equal(run(1, 2), capped)


def test_unpivot_matches_melt(ray_session):
    from featherstore_ray.stages.aggregate import unpivot

    t = pa.table(
        {"k": [1, 2, 3], "a": [1.0, 2.0, 3.0], "b": [10, None, 30]}
    )
    out = (
        unpivot(ray.data.from_arrow(t).repartition(2), ["k"], ["a", "b"])
        .to_pandas()
        .sort_values(["metric", "k"])
        .reset_index(drop=True)
    )
    exp = (
        t.to_pandas()
        .melt(id_vars=["k"], var_name="metric", value_name="value")
        .sort_values(["metric", "k"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)


def test_rollup_matches_duckdb(ray_session):
    import duckdb

    from featherstore_ray.stages.aggregate import rollup

    t = pa.table(
        {
            "s": ["x", "x", "y", "y", "y"],
            "l": ["en", "fr", "en", "en", "fr"],
            "v": [1, 2, 3, 4, 5],
        }
    )
    out = rollup(
        ray.data.from_arrow(t).repartition(3),
        ["s", "l"],
        {"n": ("v", "count"), "sv": ("v", "sum")},
    ).to_pandas()
    exp = duckdb.connect().execute(
        "SELECT s, l, count(v) AS n, CAST(sum(v) AS BIGINT) AS sv "
        "FROM t GROUP BY ROLLUP(s, l)"
    ).df()

    def canon(df):
        df = df.copy()
        for c in ["s", "l"]:
            df[c] = df[c].astype(object).where(df[c].notna(), "~null~")
        return (
            df.astype({"n": "int64", "sv": "int64"})
            .sort_values(["s", "l"])
            .reset_index(drop=True)[["s", "l", "n", "sv"]]
        )

    pd.testing.assert_frame_equal(canon(out), canon(exp))


def test_label_centroids_null_labels_and_invariance(ray_session):
    from featherstore_ray.stages.ann import label_centroids

    t = pa.table(
        {
            "label": pa.array([0, 0, 1, None, 1], pa.int32()),
            "embedding": pa.array(
                [[1.0, 3.0], [3.0, 5.0], [2.0, 2.0], [9.0, 9.0], [4.0, 0.0]],
                pa.list_(pa.float32()),
            ),
        }
    )

    def run(blocks):
        return (
            label_centroids(ray.data.from_arrow(t).repartition(blocks))
            .to_pandas()
            .sort_values(["label", "dim"])
            .reset_index(drop=True)
        )

    out = run(1)
    # null-label row dropped (not scattered into another label's sum)
    assert out["centroid"].tolist() == [2.0, 4.0, 3.0, 1.0]
    pd.testing.assert_frame_equal(run(3), out)


def test_ngram_counts_boundaries_and_invariance(ray_session):
    from featherstore_ray.stages.text import ngram_counts

    t = pa.table(
        {"text": ["a b c", "c a b", "x", "", "a b"]}
    )  # "c a"/"b c" never cross docs; 1-token and empty docs emit nothing

    def run(blocks, n=2):
        return (
            ngram_counts(
                ray.data.from_arrow(t).repartition(blocks), n=n,
                top_n=10, num_buckets=4,
            )
            .to_pandas()
            .reset_index(drop=True)
        )

    out = run(1)
    assert out.iloc[0].tolist() == ["a b", 3]
    got = dict(zip(out["token"], out["n"]))
    assert got == {"a b": 3, "b c": 1, "c a": 1}
    pd.testing.assert_frame_equal(run(4), out)
    # trigrams: only within-doc windows survive
    tri = run(1, n=3)
    assert dict(zip(tri["token"], tri["n"])) == {"a b c": 1, "c a b": 1}


def test_profile_columns_nulls(ray_session):
    from featherstore_ray.stages.misc import profile_columns

    t = pa.table(
        {"a": [1.0, None, 3.0, None], "b": [4, 5, 6, 7]}
    )
    out = (
        profile_columns(ray.data.from_arrow(t).repartition(2), ["a", "b"])
        .to_pandas()
        .sort_values("column_name")
        .reset_index(drop=True)
    )
    assert out["n"].tolist() == [2, 4]
    assert out["n_null"].tolist() == [2, 0]
    assert out["min"].tolist() == [1.0, 4.0]
    assert out["max"].tolist() == [3.0, 7.0]
    assert out["mean"].tolist() == [2.0, 5.5]


def test_time_weighted_avg_manual(ray_session):
    from featherstore_ray.stages.window import time_weighted_avg

    t = pa.table({
        "e": [1, 1, 1, 2, 2, 3],
        "ts": pa.array(
            np.array([0, 10, 30, 5, 5, 7], dtype="int64"),
            pa.timestamp("us")),
        "v": [1.0, 3.0, 99.0, 4.0, 6.0, 8.0],
    })
    out = time_weighted_avg(
        ray.data.from_arrow(t), entity_col="e", ts_col="ts", value_col="v",
        num_buckets=2,
    ).to_pandas().set_index("e")["twa"]
    # entity 1: 1.0 for 10us + 3.0 for 20us → 70/30
    assert out[1] == round(70 / 30, 6)
    # entity 2: both at same ts → zero duration → dropped; entity 3: single
    assert 2 not in out.index and 3 not in out.index


def test_corr_matrix_matches_numpy(ray_session):
    from featherstore_ray.stages.aggregate import corr_matrix

    rng = np.random.default_rng(7)
    x = rng.normal(size=500)
    t = pa.table({
        "a": x, "b": 2 * x + rng.normal(size=500), "c": rng.normal(size=500),
    })
    out = corr_matrix(
        ray.data.from_arrow(t).repartition(4), ["a", "b", "c"]
    ).to_pandas().set_index(["col_x", "col_y"])["corr"]
    df = t.to_pandas()
    for a, b in [("a", "b"), ("a", "c"), ("b", "c")]:
        assert abs(out[(a, b)] - np.corrcoef(df[a], df[b])[0, 1]) < 1e-6
    assert len(out) == 3


def test_vocab_encode_manual(ray_session):
    from featherstore_ray.stages.text import vocab_encode

    t = pa.table({
        "doc_id": [0, 1],
        "text": ["b a b", "c b"],
    })
    out = vocab_encode(ray.data.from_arrow(t)).to_pandas()
    # counts: b=3 (id 0), a=1, c=1 → ties by token: a=1, c=2
    got = out.set_index(["doc_id", "pos"])["token_id"]
    assert got[(0, 1)] == 0 and got[(0, 2)] == 1 and got[(0, 3)] == 0
    assert got[(1, 1)] == 2 and got[(1, 2)] == 0


def test_chunk_text_manual(ray_session):
    from featherstore_ray.stages.text import chunk_text

    words = [f"w{i}" for i in range(10)]
    t = pa.table({
        "doc_id": [7, 8],
        "text": [" ".join(words), "solo"],
    })
    out = chunk_text(
        ray.data.from_arrow(t), window=4, stride=3
    ).to_pandas().set_index(["doc_id", "chunk_id"])["chunk_text"]
    assert out[(7, 0)] == "w0 w1 w2 w3"
    assert out[(7, 1)] == "w3 w4 w5 w6"
    assert out[(7, 2)] == "w6 w7 w8 w9"
    assert out[(7, 3)] == "w9"
    assert out[(8, 0)] == "solo"
    assert len(out) == 5


def test_token_match_manual(ray_session):
    from featherstore_ray.stages.text import token_match

    t = pa.table({
        "doc_id": [0, 1],
        "text": ["spark is sparky and sharp", "no hits here"],
    })
    out = token_match(
        ray.data.from_arrow(t), r"^sp\w+$"
    ).to_pandas()
    assert out["doc_id"].tolist() == [0, 0]
    assert out["ord"].tolist() == [1, 2]
    assert out["match"].tolist() == ["spark", "sparky"]


def test_dup_spans_manual(ray_session):
    from featherstore_ray.stages.dedup import dup_spans

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b c d e",      # shares "a b c" and "b c d" with doc 1
            "x a b c d y",    # shares "a b c", "b c d" (and nothing else)
            "q r s",          # unique trigram
            "a b",            # too short → excluded
        ],
    })
    out = dup_spans(
        ray.data.from_arrow(t), k=3, num_buckets=4
    ).to_pandas().set_index("doc_id")
    assert out.loc[0, "total_ngrams"] == 3
    assert out.loc[0, "dup_ngrams"] == 2
    assert out.loc[0, "dup_ratio"] == round(2 / 3, 6)
    assert out.loc[1, "total_ngrams"] == 4
    assert out.loc[1, "dup_ngrams"] == 2
    assert out.loc[2, "dup_ngrams"] == 0
    assert 3 not in out.index


def test_shuffle_shard_partition_invariant(ray_session):
    import pyarrow as pa

    from featherstore_ray.stages.misc import shuffle_shard

    ids = np.arange(1000, dtype=np.int64)
    t = pa.table({"doc_id": ids})

    def run(nparts):
        return (
            shuffle_shard(ray.data.from_arrow(t).repartition(nparts),
                          "doc_id", num_shards=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )

    a, b = run(2), run(7)
    pd.testing.assert_frame_equal(a, b)  # layout independent of blocking
    # positions are a contiguous 0..n_s-1 enumeration inside each shard
    for s, grp in a.groupby("shard"):
        pos = np.sort(grp["pos"].to_numpy())
        assert (pos == np.arange(len(grp))).all()
    assert set(a["shard"].unique()) == set(range(8))
    # the hash order actually shuffles: consecutive keys land apart
    first = a.sort_values(["shard", "pos"]).groupby("shard").head(20)
    assert first["doc_id"].diff().abs().dropna().median() > 10


def test_source_mix_proportions_and_determinism(ray_session):
    import pyarrow as pa

    from featherstore_ray.stages.misc import source_mix

    rng = np.random.default_rng(3)
    src = np.repeat(["web", "code", "books", "junk"], [8000, 3000, 1500, 500])
    ids = rng.permutation(len(src)).astype(np.int64)
    t = pa.table({"doc_id": ids, "source": src})
    target = {"web": 0.5, "code": 0.3, "books": 0.2}

    out = (source_mix(ray.data.from_arrow(t).repartition(5),
                      "source", "doc_id", target)
           .to_pandas())
    assert "junk" not in set(out["source"])  # unlisted sources dropped
    mix = out["source"].value_counts(normalize=True)
    for s, w in target.items():
        assert abs(mix[s] - w) < 0.03, (s, mix[s], w)
    # books is the binding source: kept (nearly) whole
    assert out["source"].value_counts()["books"] >= 1450

    out2 = (source_mix(ray.data.from_arrow(t).repartition(11),
                       "source", "doc_id", target).to_pandas())
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True))

    with pytest.raises(ValueError):
        source_mix(ray.data.from_arrow(t), "source", "doc_id",
                   {"web": 0.5, "absent": 0.5}).to_pandas()


def test_bpe_train_matches_pure_python_reference():
    from collections import Counter

    from featherstore_ray.stages.text import bpe_train

    def ref_bpe(texts, k):
        """Batched-round BPE (the engine's parallel-trainer semantics):
        per round, count pairs once, then greedily select ALL
        symbol-disjoint merges in (count desc, pair asc) order."""
        wc = Counter(w for t in texts for w in t.split(" ") if w)
        words = {w: list(w) for w in wc}
        merges = []
        while len(merges) < k:
            pc = Counter()
            for w, syms in words.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += wc[w]
            cand = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            used, picked = set(), []
            for (a, b), n in cand:
                if n < 2:
                    break
                if a in used or b in used or a + b in used:
                    continue
                picked.append((a, b, n))
                used |= {a, b, a + b}
                if len(merges) + len(picked) == k:
                    break
            if not picked:
                break
            merges += picked
            for a, b, _n in picked:
                for w, syms in words.items():
                    out, i = [], 0
                    while i < len(syms):
                        if (i + 1 < len(syms) and syms[i] == a
                                and syms[i + 1] == b):
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    words[w] = out
        return merges

    texts = [
        "the cat sat on the mat", "the bat and the cat", "  ",
        "aaaa aaa aa a", "banana bandana", "the the the", "",
    ] * 3
    want = ref_bpe(texts, 12)
    got = bpe_train(
        ray.data.from_arrow(pa.table({"text": texts})).repartition(4),
        num_merges=12, num_buckets=4,
    )
    assert len(got) == len(want)
    for i, (a, b, n) in enumerate(want):
        r = got.iloc[i]
        assert (r["left"], r["right"], r["n"]) == (a, b, n), (i, want[i], r)


def test_char_entropy_manual_and_edges():
    from collections import Counter
    import math

    from featherstore_ray.stages.text import char_entropy

    texts = ["aaaa", "abab", "", None, "abcd"]
    out = (
        char_entropy(ray.data.from_arrow(pa.table({
            "doc_id": list(range(5)), "text": texts,
        })).repartition(2))
        .to_pandas().set_index("doc_id").sort_index()["char_entropy"]
    )
    for i, t in enumerate(texts):
        if not t:
            assert pd.isna(out[i])
            continue
        c = Counter(t)
        want = -sum((k / len(t)) * math.log(k / len(t)) for k in c.values())
        assert abs(out[i] - round(want, 6)) < 1e-9, (i, t)
    assert out[0] == 0.0 and out[4] > out[1] > 0


def test_apply_bpe_matches_reference_encoder():
    from featherstore_ray.stages.text import apply_bpe

    merges = [("a", "b"), ("ab", "c"), ("d", "e"), ("abc", "abc")]
    ranks = {p: i for i, p in enumerate(merges)}

    def ref_encode(word):
        syms = list(word)
        while len(syms) > 1:
            cand = [(ranks[(syms[i], syms[i + 1])], i)
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in ranks]
            if not cand:
                break
            r, _ = min(cand)
            a, b = merges[r]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    texts = ["abc abcabc de", "ababab", "", "xyz abcd", "abcabcabcabc"]
    out = (
        apply_bpe(ray.data.from_arrow(pa.table({
            "doc_id": list(range(len(texts))), "text": texts,
        })).repartition(2), merges)
        .to_pandas().set_index("doc_id").sort_index()["n_tok_bpe"]
    )
    for i, t in enumerate(texts):
        want = sum(len(ref_encode(w)) for w in t.split(" ") if w)
        assert out[i] == want, (i, t, out[i], want)


def test_json_extract_scalar_modes_and_misses():
    from featherstore_ray.stages.text import json_extract_scalar

    t = pa.table({
        "i": list(range(5)),
        "j": ['{"k": 7, "s": "hi"}', '{"k": -3}', '{"other": 1}', None,
              '{"f": 2.5, "k": 0}'],
    })
    for engine in ("regex", "python"):
        out = json_extract_scalar(
            ray.data.from_arrow(t).repartition(2), "j", "k", engine=engine
        ).to_pandas().set_index("i").sort_index()["k"]
        assert list(out.fillna(-999).astype(int)) == [7, -3, -999, -999, 0], engine
    s = json_extract_scalar(
        ray.data.from_arrow(t), "j", "s", value_type="string"
    ).to_pandas().set_index("i").sort_index()["s"]
    assert s[0] == "hi" and s[1:].isna().all()
    f = json_extract_scalar(
        ray.data.from_arrow(t), "j", "f", value_type="float"
    ).to_pandas().set_index("i").sort_index()["f"]
    assert f[4] == 2.5 and f[[0, 1, 2, 3]].isna().all()


def test_json_extract_regex_key_escaping_and_bools():
    from featherstore_ray.stages.text import json_extract_scalar

    t = pa.table({
        "i": [0, 1, 2, 3],
        "j": ['{"axb": 7}', '{"a.b": 9}', '{"k": true}', '{"k": 2}'],
    })
    # dotted key must match literally, not as regex wildcard
    out = json_extract_scalar(ray.data.from_arrow(t), "j", "a.b"
                              ).to_pandas().set_index("i")["a.b"]
    assert pd.isna(out[0]) and out[1] == 9
    # booleans are missing on BOTH engines; ints pass through
    for engine in ("regex", "python"):
        k = json_extract_scalar(ray.data.from_arrow(t), "j", "k",
                                engine=engine
                                ).to_pandas().set_index("i")["k"]
        assert pd.isna(k[2]) and k[3] == 2, engine


def test_pmi_null_docs_do_not_shift_nb():
    from featherstore_ray.stages.text import pmi

    base = ["x y x y", "x y"] * 5
    with_nulls = base + [None] * 7
    a = pmi(ray.data.from_arrow(pa.table({"text": base})), min_count=2
            ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    b = pmi(
        ray.data.from_arrow(
            pa.table({"text": pa.array(with_nulls, pa.string())})
        ).repartition(3),
        min_count=2,
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_unigram_train_invariants_and_block_invariance():
    import math

    from featherstore_ray.stages.text import _viterbi_pieces, unigram_train

    docs = ["banana band bandana", "the band and the banana", "ana ana ban",
            ""] * 4
    outs = []
    for parts in (1, 3):
        out = unigram_train(
            ray.data.from_arrow(pa.table({"text": docs})).repartition(parts),
            vocab_size=20, seed_size=60, max_piece_len=4, num_rounds=3,
            num_buckets=4,
        )
        outs.append(out)
    # partition-count invariant (merge correctness)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    # every character of the corpus is in the vocabulary
    corpus_chars = {ch for d in docs for w in d.split(" ") for ch in w}
    assert corpus_chars <= set(out["piece"])
    # probabilities normalize
    assert abs(np.exp(out["logprob"]).sum() - 1.0) < 1e-4
    # the learned model segments every corpus word (chars guarantee it),
    # and frequent substrings like 'an'/'ban'/'ana' earn multi-char pieces
    logp = dict(zip(out["piece"], out["logprob"]))
    for w in {w for d in docs for w in d.split(" ") if w}:
        pieces = _viterbi_pieces(w, logp, 4)
        assert "".join(pieces) == w
    assert any(len(p) > 1 for p in out["piece"]), out["piece"].tolist()


def test_viterbi_pieces_prefers_max_likelihood():
    import math

    from featherstore_ray.stages.text import _viterbi_pieces

    logp = {"a": math.log(0.3), "b": math.log(0.3), "ab": math.log(0.4)}
    assert _viterbi_pieces("ab", logp, 2) == ["ab"]       # 0.4 > 0.09
    logp2 = {"a": math.log(0.5), "b": math.log(0.5), "ab": math.log(0.2)}
    assert _viterbi_pieces("ab", logp2, 2) == ["a", "b"]  # 0.25 > 0.2
    assert _viterbi_pieces("aab", logp2, 2) == ["a", "a", "b"]


def test_apply_unigram_counts_and_unknown_chars():
    import math

    from featherstore_ray.stages.text import _viterbi_pieces, apply_unigram

    vocab = pd.DataFrame({
        "piece": ["ab", "a", "b", "c"],
        "logprob": [math.log(0.4), math.log(0.25), math.log(0.25),
                    math.log(0.1)],
    })
    texts = ["ab abc", "aaa", "", "azb"]  # 'z' unseen in the vocabulary
    out = (
        apply_unigram(
            ray.data.from_arrow(pa.table({
                "doc_id": list(range(4)), "text": texts,
            })).repartition(2),
            vocab, max_piece_len=2,
        ).to_pandas().set_index("doc_id").sort_index()["n_tok_unigram"]
    )
    # 'ab'=1 piece; 'abc'=['ab','c']=2; 'aaa'=3; ''=0
    assert list(out[[0, 1, 2]]) == [3, 3, 0]
    # unknown char falls back to a single-char piece, no hang
    assert out[3] == 3
    logp = dict(zip(vocab["piece"], vocab["logprob"]))
    assert _viterbi_pieces("azb", logp, 2) == ["a", "z", "b"]


def test_viterbi_unknown_fallback_cannot_outscore_real_paths():
    import math

    from featherstore_ray.stages.text import _viterbi_pieces

    # vocab lacks 'a' alone, but 'ab' spans it: the legit path must win
    logp = {"ab": math.log(0.01), "b": math.log(0.9)}
    assert _viterbi_pieces("ab", logp, 2) == ["ab"]


def test_cross_split_leakage_matches_brute_force(ray_session):
    """Randomized corpus with planted shared trigrams: distributed
    gram-partitioned overlap == per-doc set-intersection reference."""
    from featherstore_ray.stages.text import cross_split_leakage

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(30)]
    texts, splits = [], []
    for i in range(120):
        words = rng.choice(vocab, size=rng.integers(2, 20)).tolist()
        texts.append(" ".join(words))
        splits.append("val" if i % 5 == 0 else "train")
    t = pa.table({
        "doc_id": pa.array(np.arange(120), pa.int64()),
        "text": pa.array(texts),
        "split": pa.array(splits),
    })
    out = (
        cross_split_leakage(
            ray.data.from_arrow(t).repartition(4),
            key_col="doc_id", text_col="text", split_col="split",
            test_label="val", n=3, num_buckets=8,
        ).to_pandas().set_index("doc_id")["leak_ngrams"]
    )

    def grams(s):
        w = s.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    train_grams = set()
    for txt, sp in zip(texts, splits):
        if sp == "train":
            train_grams |= grams(txt)
    for i, (txt, sp) in enumerate(zip(texts, splits)):
        if sp != "val":
            assert i not in out.index
            continue
        want = len(grams(txt) & train_grams)
        if want == 0:
            assert i not in out.index
        else:
            assert out.loc[i] == want, i


def test_readability_known_values(ray_session):
    from featherstore_ray.stages.text import readability

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["The cat sat. The dog ran!", "bcdfg", None]),
    })
    out = (
        readability(ray.data.from_arrow(t))
        .to_pandas().set_index("doc_id")
    )
    assert list(out.index) == [0, 1]  # null text dropped
    r = out.loc[0]
    # "The cat sat. The dog ran!": 6 space-tokens, 2 sentences,
    # vowel runs: e,a,a,e,o,a = 6
    assert r["n_words"] == 6 and r["n_sentences"] == 2
    assert r["n_syllables"] == 6
    want = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert abs(r["flesch"] - want) < 1e-9
    # vowel-less single word: 1 word, clamped 1 sentence, 0 syllables
    r1 = out.loc[1]
    assert r1["n_words"] == 1 and r1["n_sentences"] == 1
    assert r1["n_syllables"] == 0


def test_zipf_fit_recovers_planted_slope(ray_session):
    """Corpus with token i repeated round(1000 * (i+1)^-1.2) times: the
    fitted slope recovers -1.2 and r2 ~ 1 (rank-rounding noise only)."""
    from featherstore_ray.stages.text import zipf_fit

    words = []
    for i in range(80):
        reps = int(round(1000.0 * (i + 1) ** -1.2))
        words.extend([f"tok{i:03d}"] * max(reps, 1))
    rng = np.random.default_rng(2)
    order = rng.permutation(len(words))
    texts = [" ".join(np.asarray(words, dtype=object)[order[i::10]])
             for i in range(10)]
    t = pa.table({"text": pa.array(texts)})
    out = zipf_fit(
        ray.data.from_arrow(t).repartition(3), top_n=80, num_buckets=4
    ).to_pandas().iloc[0]
    assert out["n_terms"] == 80
    assert abs(out["slope"] + 1.2) < 0.05
    assert out["r2"] > 0.99


def test_mlm_mask_deterministic_and_rate(ray_session):
    from featherstore_ray.stages.text import mlm_mask

    rng = np.random.default_rng(44)
    texts = [" ".join(f"w{j}" for j in range(rng.integers(1, 60)))
             for _ in range(200)]
    t = pa.table({
        "doc_id": pa.array(np.arange(200), pa.int64()),
        "text": pa.array(texts),
    })
    out = mlm_mask(
        ray.data.from_arrow(t).repartition(4), rate=0.15,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    out2 = mlm_mask(
        ray.data.from_arrow(t).repartition(7), rate=0.15,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # partitioning-invariant (the hash depends only on (doc, position))
    pd.testing.assert_frame_equal(out, out2)
    # masked count consistent with the rendered text
    for _, r in out.head(20).iterrows():
        assert r["masked_text"].split(" ").count("[MASK]") == r["n_masked"]
    # aggregate rate near 15%
    total = sum(len(s.split(" ")) for s in texts)
    assert abs(out["n_masked"].sum() / total - 0.15) < 0.02
    # token count preserved
    for i in (0, 5, 99):
        assert len(out.loc[i, "masked_text"].split(" ")) == len(
            texts[i].split(" "))


def test_feature_hashing_reference_and_presence_rows(ray_session):
    from featherstore_ray.stages.text import feature_hashing

    texts = ["a b a c", "c c", "a"]
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(texts),
    })
    D = 8
    out = feature_hashing(
        ray.data.from_arrow(t).repartition(2), num_features=D,
    ).to_pandas()

    # reference: vocab ids by (count desc, token asc): a=0, c=1, b=2
    ids = {"a": 0, "c": 1, "b": 2}
    import collections
    ref = collections.defaultdict(int)
    present = set()
    for doc, s in enumerate(texts):
        for w in s.split(" "):
            h = (ids[w] * 2654435761) % (1 << 32)
            b = h % D
            present.add((doc, b))
            ref[(doc, b)] += 1 if h < (1 << 31) else -1
    got = {(r["doc_id"], r["bucket"]): r["val"]
           for _, r in out.iterrows()}
    assert set(got) == present  # presence rows even when val == 0
    for k in present:
        assert got[k] == ref[k], k


def test_regex_extract_named_groups_and_misses(ray_session):
    from featherstore_ray.stages.text import regex_extract

    t = pa.table({
        "rid": pa.array([0, 1, 2, 3], pa.int64()),
        "raw": pa.array(["order-42/EU", "order-7/US", "malformed", None]),
    })
    out = regex_extract(
        ray.data.from_arrow(t), "raw",
        r"order-(?P<oid>[0-9]+)/(?P<region>[A-Z]+)", keep_cols=["rid"],
    ).to_pandas().sort_values("rid").reset_index(drop=True)
    assert out["oid"].tolist()[:2] == ["42", "7"]
    assert out["region"].tolist()[:2] == ["EU", "US"]
    # misses (incl. null input) are true NULLs, not empty strings
    assert out["oid"].isna().tolist() == [False, False, True, True]
    assert out["region"].isna().tolist() == [False, False, True, True]


def test_bpe_train_prefix_stable(ray_session):
    """tokenize_bpe relies on prefix-stability: training with a smaller
    num_merges must be an exact prefix of a larger training (batched
    greedy selection truncates deterministically at the cap)."""
    from featherstore_ray.stages.text import bpe_train

    texts = [
        "the cat sat on the mat", "the bat and the cat",
        "aaaa aaa aa a", "banana bandana", "the the the",
    ] * 3
    ds = lambda: ray.data.from_arrow(pa.table({"text": texts})).repartition(3)
    small = bpe_train(ds(), num_merges=5, num_buckets=4)
    big = bpe_train(ds(), num_merges=12, num_buckets=4)
    pd.testing.assert_frame_equal(small, big.head(5).reset_index(drop=True))


# --------------------------------------------------------- keyword_extract


def test_keyword_extract_rake_semantics(ray_session):
    import pyarrow as pa
    from featherstore_ray.stages.text import keyword_extract

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "deep learning of deep learning",
            "the deep learning a neural network",
            "neural network and deep learning",
        ]),
    })
    out = (keyword_extract(ray.data.from_arrow(docs).repartition(2),
                           top_n=10)
           .to_pandas().set_index("phrase"))
    # "deep learning" occurs 4x as its own phrase
    assert out.loc["deep learning", "n"] == 4
    assert out.loc["deep learning", "words"] == 2
    assert out.loc["neural network", "n"] == 2
    # RAKE hand-check: freq(deep)=4, deg(deep)=8 -> wscore 2.0 (same for
    # learning); freq(neural)=2, deg=4 -> 2.0; phrase scores = 4.0
    assert out.loc["deep learning", "score"] == 4.0
    assert out.loc["neural network", "score"] == 4.0


def test_keyword_extract_drops_long_runs_and_is_partition_invariant(
        ray_session):
    import pyarrow as pa
    from featherstore_ray.stages.text import keyword_extract

    rng = np.random.default_rng(13)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "the", "a"]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(60)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(60), pa.int64()),
        "text": pa.array(texts),
    })
    a = (keyword_extract(ray.data.from_arrow(docs).repartition(2),
                         max_phrase_len=3, top_n=40).to_pandas()
         .reset_index(drop=True))
    b = (keyword_extract(ray.data.from_arrow(docs).repartition(9),
                         max_phrase_len=3, top_n=40,
                         num_buckets=7).to_pandas()
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a["words"] <= 3).all()
