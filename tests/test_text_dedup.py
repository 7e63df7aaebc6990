"""Text analysis + dedup family over the real documents table."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from featherstore_ray.stages.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    minhash_signatures,
    ngram_jaccard,
    simhash,
)
from featherstore_ray.stages.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(DOCS)


def test_token_count_matches_duckdb(docs):
    out = token_count(ray.data.from_arrow(docs)).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(
        "SELECT doc_id, len(string_split(text, ' ')) AS n_tok_ws FROM documents"
    ).df()
    m = out.sort_values("doc_id").reset_index(drop=True)
    e = exp.sort_values("doc_id").reset_index(drop=True)
    assert (m["n_tok_ws"].to_numpy() == e["n_tok_ws"].to_numpy()).all()


def test_quality_score_matches_duckdb(docs):
    out = quality_score(ray.data.from_arrow(docs)).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(
        r"""
        SELECT doc_id,
               length(text) AS char_count,
               len(string_split(text, ' ')) AS word_count,
               len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is)\b'))
                 AS stop_hits
        FROM documents
        """
    ).df()
    m = out.sort_values("doc_id").reset_index(drop=True)
    e = exp.sort_values("doc_id").reset_index(drop=True)
    for c in ["char_count", "word_count", "stop_hits"]:
        assert (m[c].to_numpy() == e[c].to_numpy()).all(), c
    # internal consistency of derived ratios
    np.testing.assert_allclose(
        m["stop_ratio"], (m["stop_hits"] / m["word_count"]).round(6)
    )


def test_lang_id_deterministic(docs):
    out1 = lang_id(ray.data.from_arrow(docs)).to_pandas().sort_values("doc_id")
    out2 = lang_id(ray.data.from_arrow(docs)).to_pandas().sort_values("doc_id")
    assert (out1["lang_pred"].to_numpy() == out2["lang_pred"].to_numpy()).all()
    assert set(out1["lang_pred"]) <= {"en", "es", "fr", "de", "zh", "und"}
    # texts are english word-soup: english should dominate
    assert (out1["lang_pred"] == "en").mean() > 0.5


def test_fingerprint_identical_for_identical_text():
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c d e f", "a b c d e f", "x y z w q"]),
        }
    )
    out = fingerprint(ray.data.from_arrow(tbl)).to_pandas().sort_values("doc_id")
    fps = list(out["fingerprint"])
    assert fps[0] == fps[1] != fps[2]


def test_exact_dedup(docs):
    # duplicate the table; dedup on text keeps the min doc_id copy
    shifted = docs.set_column(
        0, "doc_id", pa.compute.add(docs["doc_id"], 10_000)
    )
    both = pa.concat_tables([docs, shifted])
    out = exact_dedup(
        ray.data.from_arrow(both), ["text"], keep_col="doc_id", num_buckets=8
    ).to_pandas()
    assert len(out) == docs.num_rows
    assert out["doc_id"].max() < 10_000


def test_minhash_signatures_similarity():
    texts = pa.array(
        [
            "the quick brown fox jumps over the lazy dog again and again",
            "the quick brown fox jumps over the lazy dog again and again today",
            "completely different words here about spark and arrow engines",
        ]
    )
    sig = minhash_signatures(texts, num_perm=128)
    sim_close = (sig[0] == sig[1]).mean()
    sim_far = (sig[0] == sig[2]).mean()
    jac = ngram_jaccard(
        [texts[0].as_py(), texts[0].as_py()],
        [texts[1].as_py(), texts[2].as_py()],
    )
    assert sim_close > 0.5 and sim_close > jac[0] - 0.25
    assert sim_far < 0.2


def test_minhash_lsh_dedup_finds_planted_dups(docs):
    # plant 20 near-duplicates: copy rows, tweak one word
    base = docs.to_pandas().head(20).copy()
    dup = base.copy()
    dup["doc_id"] = dup["doc_id"] + 50_000
    dup["text"] = dup["text"] + " extra"
    both = pd.concat([docs.to_pandas(), dup], ignore_index=True)
    groups = minhash_lsh_dedup(
        ray.data.from_pandas(both), id_col="doc_id", threshold=0.5
    )
    got_pairs = set(zip(groups["dup_group"], groups["doc_id"]))
    planted = {(i, i + 50_000) for i in base["doc_id"]}
    found = {(g, d) for g, d in got_pairs if d >= 50_000 and g == d - 50_000}
    assert len(found) >= 15  # LSH is probabilistic; most planted pairs found
    # deterministic across runs
    groups2 = minhash_lsh_dedup(
        ray.data.from_pandas(both), id_col="doc_id", threshold=0.5
    )
    assert groups.equals(groups2)


def test_simhash_hamming(docs):
    out = simhash(ray.data.from_arrow(docs), id_col="doc_id").to_pandas()
    assert out["simhash"].nunique() > 400  # distinct docs spread out
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon zeta eta theta",
                    "alpha beta gamma delta epsilon zeta eta iota",
                ]
            ),
        }
    )
    two = simhash(ray.data.from_arrow(tbl), id_col="doc_id").to_pandas()
    a, b = np.uint64(two["simhash"][0]), np.uint64(two["simhash"][1])
    ham = bin(int(a) ^ int(b)).count("1")
    assert ham < 24  # similar docs → close hashes


def test_dedup_keep_best_keeps_highest_quality(ray_session):
    from featherstore_ray.stages.dedup import dedup_keep_best, minhash_lsh_dedup

    import pyarrow.parquet as pq

    docs = "/root/testdata/sf0.01/documents.parquet"
    ds = lambda: ray.data.read_parquet(docs, columns=["doc_id", "text"])
    groups = minhash_lsh_dedup(ds(), id_col="doc_id", threshold=0.6)
    out = dedup_keep_best(
        ds(), id_col="doc_id", threshold=0.6
    ).to_pandas()
    total = pq.read_metadata(docs).num_rows
    # exactly one survivor per dup group; everything ungrouped survives
    n_groups = groups["dup_group"].nunique()
    assert len(out) == total - len(groups) + n_groups
    kept = set(out["doc_id"])
    for g, sub in groups.groupby("dup_group"):
        assert len(kept & set(sub["doc_id"])) == 1, g
    # the survivor is the longest (max n_tok_ws), ties to smallest id
    full = ray.data.read_parquet(docs, columns=["doc_id", "text"]).to_pandas()
    full["n"] = full["text"].str.count(" ") + 1
    qual = full.set_index("doc_id")["n"]
    for g, sub in groups.groupby("dup_group"):
        ids = sorted(sub["doc_id"])
        best = max(ids, key=lambda i: (qual[i], -i))
        assert (kept & set(ids)) == {best}, (g, best)


def test_tf_idf_vs_duckdb(ray_session):
    # multi-block input: df merge must be batch-boundary-invariant
    import duckdb

    from featherstore_ray.stages.text import tf_idf

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "a b b c",
                    "a a d",
                    "b c c c",
                    "e",
                    "a e e b",
                ]
            ),
        }
    )
    got = (
        tf_idf(ray.data.from_arrow(docs).repartition(3))
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    exp = duckdb.connect().execute(
        """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM docs
        ),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
               FROM tok GROUP BY 1),
        n AS (SELECT count(*) AS n FROM docs)
        SELECT tf.doc_id, tf.token, tf.tf,
               round(tf.tf * ln(n.n::DOUBLE / df.df), 6) AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
        ORDER BY doc_id, token
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # a corpus-wide token ('a' is in 3/5 docs) scores below a rare one
    rare = got[(got["doc_id"] == 4) & (got["token"] == "e")]["tfidf"].iloc[0]
    common = got[(got["doc_id"] == 2) & (got["token"] == "a")]["tfidf"].iloc[0]
    assert rare > 0 and common > 0


def test_decontaminate_known_counts(ray_session):
    from featherstore_ray.stages.text import benchmark_ngram_set, decontaminate

    bench = benchmark_ngram_set(
        pa.array(["a b c d e"]), n=3
    )  # grams: "a b c", "b c d", "c d e"
    assert bench == {"a b c", "b c d", "c d e"}
    corpus = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a b c d e",      # all 3 grams
                "x a b c y",      # 1 gram
                "a b c a b c",    # gram "a b c" twice -> DISTINCT count 1
                "q r",            # too short, no grams
            ],
        }
    )
    out = (
        decontaminate(ray.data.from_arrow(corpus), bench, n=3)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["contam_ngrams"].tolist() == [3, 1, 1, 0]
    assert out["contaminated"].tolist() == [True, True, True, False]


def test_decontaminate_batch_boundary_invariant(docs, ray_session):
    """Same result whether the corpus arrives as 1 block or 8."""
    from featherstore_ray.stages.text import benchmark_ngram_set, decontaminate

    ids = docs["doc_id"].to_numpy()
    bench = benchmark_ngram_set(docs.filter(pa.array(ids % 17 == 0))["text"])

    def run(blocks):
        ds = ray.data.from_arrow(docs).repartition(blocks)
        return (
            decontaminate(ds, bench)
            .to_pandas()[["doc_id", "contam_ngrams"]]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(1), run(8))


def test_line_dedup_first_occurrence_wins(ray_session):
    from featherstore_ray.stages.dedup import line_dedup

    corpus = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "keep A\nkeep B\nkeep A",   # in-doc repeat drops too
                "keep B\nonly in 1",        # "keep B" already owned by doc 0
                "keep A",                   # all lines lost -> empty doc
            ],
        }
    )
    out = (
        line_dedup(ray.data.from_arrow(corpus), num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text_dedup"].tolist() == ["keep A\nkeep B", "only in 1", ""]
    assert out["n_kept"].tolist() == [2, 1, 0]
    assert out["n_dropped"].tolist() == [1, 1, 1]


def test_line_dedup_hot_line_across_docs(ray_session):
    """One line repeated in every doc (the boilerplate-footer case) must
    survive exactly once, at the smallest doc_id."""
    from featherstore_ray.stages.dedup import line_dedup

    n = 300
    corpus = pa.table(
        {
            "doc_id": list(range(n)),
            "text": [f"unique {i}\nshared footer" for i in range(n)],
        }
    )
    out = (
        line_dedup(
            ray.data.from_arrow(corpus).repartition(8), num_buckets=8
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == n
    assert (out["n_kept"].to_numpy() == np.where(np.arange(n) == 0, 2, 1)).all()
    assert out.loc[0, "text_dedup"] == "unique 0\nshared footer"
    assert out.loc[5, "text_dedup"] == "unique 5"


def test_lm_score_invariance_nulls_and_signal(ray_session):
    from featherstore_ray.stages.text import lm_score

    texts = (
        ["the cat sat on the mat and the dog sat too"] * 5
        + ["the mat and the cat and the dog sat on it"] * 5
        + ["zqxjkwv bzzkq xqzzv jjqx"]  # unlike the corpus -> high NLL
        + ["", None, "a"]               # <2 bytes -> null score
    )
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    one = (
        lm_score(ray.data.from_arrow(t))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    many = (
        lm_score(ray.data.from_arrow(t).repartition(7))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # the LM is corpus-global: block boundaries must not change counts
    pd.testing.assert_frame_equal(one, many)
    assert one["lm_nll"].iloc[-3:].isna().all()
    # the garbage doc scores strictly worse than every corpus-like doc
    assert one["lm_nll"].iloc[10] > one["lm_nll"].iloc[:10].max() + 0.5
    # pure-python reference on one doc
    corpus = [x for x in texts if x]
    from collections import Counter
    cnt, tot = Counter(), Counter()
    for x in corpus:
        bs = x.encode()
        for i in range(len(bs) - 1):
            cnt[(bs[i], bs[i + 1])] += 1
            tot[bs[i]] += 1
    bs = texts[0].encode()
    ref = np.mean(
        [-np.log((cnt[(bs[i], bs[i + 1])] + 1) / (tot[bs[i]] + 256.0))
         for i in range(len(bs) - 1)]
    )
    assert abs(one["lm_nll"].iloc[0] - round(ref, 6)) < 1e-9


def test_jaccard_pairs_exact_and_invariant(ray_session):
    from featherstore_ray.stages.dedup import jaccard_pairs

    texts = [
        "a b c d e",        # shingles: abc bcd cde
        "a b c d x",        # abc bcd cdx -> inter 2, union 4, J=0.5
        "a b c d e",        # identical to doc 0 -> J=1.0
        "z y",              # < 3 words: no shingles, never pairs
        "q r s t u v",      # unrelated
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    kw = dict(id_col="doc_id", k=3, threshold=0.3, num_buckets=8)
    one = (
        jaccard_pairs(ray.data.from_arrow(t), **kw)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    many = (
        jaccard_pairs(ray.data.from_arrow(t).repartition(5), **kw)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)
    got = {(r.a, r.b): r.jaccard for r in one.itertuples()}
    assert got == {(0, 1): 0.5, (0, 2): 1.0, (1, 2): 0.5}


def test_redact_all_rules(ray_session):
    from featherstore_ray.stages.text import redact

    texts = [
        "mail me at bob.smith+x@corp.example.com today",
        "see https://example.com/a?b=1 and http://x.y/z now",
        "call 11-746-963-6749 or extension 42",
        "plain text with no pii at all",
        "",
    ]
    t = pa.table(
        {"i": pa.array(np.arange(5), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = (
        redact(ray.data.from_arrow(t))
        .to_pandas().sort_values("i")["text_redacted"].tolist()
    )
    assert out == [
        "mail me at <EMAIL> today",
        "see <URL> and <URL> now",
        "call <PHONE> or extension <NUM>",
        "plain text with no pii at all",
        "",
    ]


def test_bm25_manual():
    import math

    from featherstore_ray.stages.text import bm25

    t = pa.table({
        "doc_id": [0, 1],
        "text": ["a a b", "a c"],
    })
    out = (
        bm25(ray.data.from_arrow(t))
        .to_pandas().set_index(["doc_id", "token"])["score"]
    )
    N, avgdl = 2.0, 2.5
    k1, b = 1.2, 0.75

    def ref(tf, df, dl):
        idf = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
        return round(idf * (tf * (k1 + 1.0))
                     / (tf + k1 * (1 - b + (b * dl) / avgdl)), 6)

    assert out[(0, "a")] == ref(2, 2, 3)
    assert out[(0, "b")] == ref(1, 1, 3)
    assert out[(1, "c")] == ref(1, 1, 2)
    # common token scores below rare token at equal tf/dl
    assert out[(1, "a")] < out[(1, "c")]


def test_association_rules_manual():
    from featherstore_ray.stages.aggregate import association_rules

    # baskets: {x,y} {x,y} {x} {y,z}  → pair (x,y) n=2; N=4; n_x=3 n_y=3
    t = pa.table({
        "g": [1, 1, 2, 2, 3, 4, 4],
        "i": ["x", "y", "x", "y", "x", "y", "z"],
    })
    out = association_rules(
        ray.data.from_arrow(t), group_col="g", item_col="i", min_count=2,
        num_buckets=2,
    ).to_pandas().set_index(["antecedent", "consequent"])
    r = out.loc[("x", "y")]
    assert r["n"] == 2
    assert r["support"] == round(2 / 4, 6)
    assert r["confidence"] == round(2 / 3, 6)
    assert r["lift"] == round((2 / 3) / (3 / 4), 6)
    # both directions emitted; (y,z) below min_count → absent
    assert ("y", "x") in out.index and ("y", "z") not in out.index


def test_exact_dedup_arrow_fast_path_matches_pandas_fallback(ray_session):
    """Numeric-key batches take the numpy lexsort path; string keys and
    null keep values fall back to pandas — both must pick identical
    winners for keep=min AND keep=max."""
    import numpy as np

    rng = np.random.default_rng(3)
    n = 5000
    num = pa.table({
        "k1": pa.array(rng.integers(0, 200, n), pa.int64()),
        "k2": pa.array(rng.integers(0, 3, n), pa.uint64()),
        "keep": pa.array(rng.permutation(n), pa.int64()),
        "payload": pa.array(rng.normal(size=n)),
    })
    for keep in ("min", "max"):
        out = exact_dedup(
            ray.data.from_arrow(num).repartition(4), ["k1", "k2"],
            keep_col="keep", keep=keep, num_buckets=8,
        ).to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)
        df = num.to_pandas()
        ref = (df.sort_values(["k1", "k2", "keep"], ascending=keep == "min",
                              kind="stable")
               .drop_duplicates(["k1", "k2"]).sort_values(["k1", "k2"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(out, ref, check_dtype=False)

    # string key -> pandas fallback, same semantics
    s = pa.table({
        "k": pa.array([f"key{i % 37}" for i in range(1000)]),
        "keep": pa.array(np.arange(1000)[::-1].copy(), pa.int64()),
    })
    out = exact_dedup(ray.data.from_arrow(s).repartition(3), ["k"],
                      keep_col="keep", keep="max", num_buckets=4
                      ).to_pandas().sort_values("k").reset_index(drop=True)
    ref = (s.to_pandas().sort_values(["k", "keep"], ascending=False,
                                     kind="stable")
           .drop_duplicates(["k"]).sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_dsir_select_parity_and_invariance(ray_session):
    from featherstore_ray.stages.text import dsir_select

    rng = np.random.default_rng(7)
    en_words = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast"]
    xx_words = ["zq", "xj", "kw", "vb", "qq", "jx"]
    texts, langs = [], []
    for i in range(60):
        lang = "en" if i % 3 else "xx"
        words = en_words if lang == "en" else xx_words
        texts.append(" ".join(rng.choice(words, size=12)))
        langs.append(lang)
    texts += ["", "a"]          # <2 bytes: logw = 0 but still selectable
    langs += ["en", "xx"]
    ids = np.arange(len(texts), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts),
                  "lang": pa.array(langs)})
    k = 15
    one = (dsir_select(ray.data.from_arrow(t), k=k)
           .to_pandas().reset_index(drop=True))
    many = (dsir_select(ray.data.from_arrow(t).repartition(7), k=k)
            .to_pandas().reset_index(drop=True))
    # corpus-global LMs + block-local top-k: block boundaries change nothing
    pd.testing.assert_frame_equal(one, many)
    assert len(one) == k

    # pure-python reference
    import math
    from collections import Counter
    cr, ct = Counter(), Counter()
    for x, lg in zip(texts, langs):
        bs = x.encode()
        grams = [bs[i:i + 2] for i in range(len(bs) - 1)]
        cr.update(grams)
        if lg == "en":
            ct.update(grams)
    tr, tt = sum(cr.values()), sum(ct.values())
    rows = []
    for i, x in zip(ids, texts):
        bs = x.encode()
        lw = sum(
            math.log((ct.get(bs[j:j + 2], 0) + 1) / (tt + 65536))
            - math.log((cr[bs[j:j + 2]] + 1) / (tr + 65536))
            for j in range(len(bs) - 1)
        )
        h = (int(i) * 2654435761) % 2 ** 32
        g = -math.log(-math.log((h + 0.5) / 2 ** 32))
        rows.append((int(i), round(lw, 6), round(lw + g, 6)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    for (rid, rlw, rkey), got in zip(rows[:k], one.itertuples(index=False)):
        assert rid == got.doc_id
        assert abs(rlw - got.dsir_logw) < 1e-6
        assert abs(rkey - got.dsir_key) < 1e-6
    # en docs must dominate the selection (importance weights favor target)
    sel_lang = {int(i): lg for i, lg in zip(ids, langs)}
    frac_en = np.mean([sel_lang[d] == "en" for d in one["doc_id"]])
    assert frac_en >= 0.8


def test_lm_score_kneser_ney(ray_session):
    from featherstore_ray.stages.text import lm_score

    texts = (
        ["the cat sat on the mat and the dog sat too"] * 5
        + ["the mat and the cat and the dog sat on it"] * 5
        + ["zqxjkwv bzzkq xqzzv jjqx"]
        + ["", None, "a"]
    )
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    one = (lm_score(ray.data.from_arrow(t), smoothing="kneser_ney",
                    out_col="nll")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    many = (lm_score(ray.data.from_arrow(t).repartition(7),
                     smoothing="kneser_ney", out_col="nll")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, many)
    assert one["nll"].iloc[-3:].isna().all()
    # garbage doc scores strictly worse than every corpus-like doc
    assert one["nll"].iloc[10] > one["nll"].iloc[:10].max() + 0.5

    # pure-python interpolated-KN reference on one doc
    from collections import Counter
    corpus = [x for x in texts if x]
    cnt = Counter()
    for x in corpus:
        bs = x.encode()
        for i in range(len(bs) - 1):
            cnt[(bs[i], bs[i + 1])] += 1
    tn = Counter(); nf = Counter(); nr = Counter()
    for (c1, c2), n in cnt.items():
        tn[c1] += n; nf[c1] += 1; nr[c2] += 1
    types = len(cnt)
    import math
    bs = texts[0].encode()
    D = 0.75
    ref = np.mean([
        -math.log((max(cnt[(bs[i], bs[i+1])] - D, 0.0)
                   + D * nf[bs[i]] * (nr[bs[i+1]] / types)) / tn[bs[i]])
        for i in range(len(bs) - 1)
    ])
    assert abs(one["nll"].iloc[0] - round(ref, 6)) < 2e-6


def test_containment_catches_embedded_doc(ray_session):
    """A short doc fully contained in a long one: containment = 1.0 while
    Jaccard is diluted below any useful threshold."""
    from featherstore_ray.stages.dedup import jaccard_pairs

    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"filler{i}" for i in range(60))
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([short, long_]),
    })
    cont = jaccard_pairs(
        ray.data.from_arrow(t), id_col="doc_id", k=3, threshold=0.9,
        metric="containment",
    ).to_pandas()
    assert len(cont) == 1 and cont["containment"].iloc[0] == 1.0
    jac = jaccard_pairs(
        ray.data.from_arrow(t), id_col="doc_id", k=3, threshold=0.3,
    ).to_pandas()
    assert len(jac) == 0  # symmetric metric misses the embedding


def test_minhash_lsh_dedup_distributed_route_parity(docs):
    """driver_pair_cap=0 forces the fully distributed route (sig attach via
    two bucket exchanges + distributed components); output must be
    IDENTICAL to the driver-verify path on the same input."""
    base = docs.to_pandas().head(20).copy()
    dup = base.copy()
    dup["doc_id"] = dup["doc_id"] + 50_000
    dup["text"] = dup["text"] + " extra"
    both = pd.concat([docs.to_pandas(), dup], ignore_index=True)

    driver = minhash_lsh_dedup(
        ray.data.from_pandas(both), id_col="doc_id", threshold=0.5
    )
    dist = minhash_lsh_dedup(
        ray.data.from_pandas(both), id_col="doc_id", threshold=0.5,
        driver_pair_cap=0,
    )
    key = ["doc_id", "dup_group"]
    d1 = driver.sort_values(key).reset_index(drop=True)
    d2 = dist[key].astype(d1.dtypes).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(d1, d2)


def test_jaccard_verify_pairs_cluster_parity(docs):
    """The cluster-side exact verify (shingle-set attach + per-bucket
    intersect) must equal the per-pair Python tuple-set reference on the
    same candidate set — and no text ever reaches the driver."""
    from featherstore_ray.stages.dedup import (
        jaccard_verify_pairs,
        minhash_band_pairs,
        ngram_jaccard,
    )

    base = docs.to_pandas().head(25).copy()
    dup = base.copy()
    dup["doc_id"] = dup["doc_id"] + 50_000
    dup["text"] = dup["text"] + " extra"
    both = pd.concat([docs.to_pandas(), dup], ignore_index=True)

    got = jaccard_verify_pairs(
        ray.data.from_pandas(both), id_col="doc_id", threshold=0.5,
    )
    cand = minhash_band_pairs(
        ray.data.from_pandas(both), id_col="doc_id",
    ).to_pandas()
    texts = both.set_index("doc_id")["text"]
    jac = ngram_jaccard(
        texts.reindex(cand["a"]).tolist(),
        texts.reindex(cand["b"]).tolist(),
    )
    ref = cand.assign(jaccard=np.round(jac, 6))
    ref = ref[ref["jaccard"] >= 0.5].sort_values(["a", "b"]).reset_index(
        drop=True)
    assert len(got) >= 20  # the planted near-dups verify
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
