"""Text analysis over the documents table — vectorized, no per-row Python.

Large-scale training-data ops: token counting, quality scoring, language ID,
document fingerprinting. All Arrow-native (``pyarrow.compute``, RE2 regexes —
the same regex engine DuckDB uses, so oracle SQL stays bit-identical) or
flat-array numpy on exploded word lists (``reduceat`` per document).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# Stopword profiles for the language-ID heuristic (deterministic order).
_LANG_PROFILES: list[tuple[str, frozenset[str]]] = [
    ("en", frozenset("the a and of to in is that it for".split())),
    ("es", frozenset("el la de que y en los se del por".split())),
    ("fr", frozenset("le la de et les des en du que une".split())),
    ("de", frozenset("der die und das von zu mit den im ist".split())),
    ("zh", frozenset("的 了 是 在 我 有 和 就 不 人".split())),
]

_STOPWORDS_EN = "the|a|and|of|to|in|is"


def token_count(
    ds: ray.data.Dataset, text_col: str = "text", out_col: str = "n_tok_ws"
) -> ray.data.Dataset:
    """Whitespace token count: ``len(split(text, ' '))``.

    Matches DuckDB ``len(string_split(text, ' '))`` exactly (empty string →
    1, the singleton empty token).
    """

    def _count(t: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(t[text_col], " "), 1)
        return t.append_column(out_col, pc.cast(n, pa.int64()))

    return ds.map_batches(_count, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


# GPT-2-flavored pre-tokenizer classes, RE2-compatible (both pyarrow and
# DuckDB run RE2, so the oracle agrees bit-for-bit): a token is a letter
# run (with optional leading space), a digit run, a punctuation run, or
# residual whitespace. A real BPE would then split these further against a
# merges table — the COUNT of pre-tokens is the standard length proxy.
_BPE_PRETOKEN = r" ?[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


def token_count_bpe(
    ds: ray.data.Dataset, text_col: str = "text", out_col: str = "n_tok_bpe"
) -> ray.data.Dataset:
    """BPE-style pre-token count per document (GPT-2-ish regex classes)."""

    def _count(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[text_col], _BPE_PRETOKEN)
        return t.append_column(out_col, pc.cast(n, pa.int64()))

    return ds.map_batches(
        _count, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def quality_score(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Heuristic quality features: char/word counts, avg word len, stopword ratio.

    ``stop_hits`` counts English stopword occurrences with an RE2 word-boundary
    regex — pyarrow and DuckDB both run RE2, so the oracle
    (``len(regexp_extract_all(...))``) agrees bit-for-bit.
    """
    pattern = rf"\b({_STOPWORDS_EN})\b"

    def _score(t: pa.Table) -> pa.Table:
        chars = pc.cast(pc.utf8_length(t[text_col]), pa.int64())
        words = pc.cast(pc.add(pc.count_substring(t[text_col], " "), 1), pa.int64())
        stops = pc.cast(pc.count_substring_regex(t[text_col], pattern), pa.int64())
        # chars excluding the single-space separators, per word
        awl = pc.divide(
            pc.cast(pc.subtract(chars, pc.subtract(words, 1)), pa.float64()),
            pc.cast(words, pa.float64()),
        )
        ratio = pc.divide(
            pc.cast(stops, pa.float64()), pc.cast(words, pa.float64())
        )
        t = t.append_column("char_count", chars)
        t = t.append_column("word_count", words)
        t = t.append_column("avg_word_len", pc.round(awl, ndigits=round_digits))
        t = t.append_column("stop_hits", stops)
        t = t.append_column("stop_ratio", pc.round(ratio, ndigits=round_digits))
        return t

    return ds.map_batches(_score, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def quality_filter(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    min_words: int = 5,
    max_words: int = 100_000,
    min_stop_ratio: float = 0.0,
    max_stop_ratio: float = 1.0,
    min_avg_word_len: float = 0.0,
    max_avg_word_len: float = 40.0,
) -> ray.data.Dataset:
    """Corpus cleaning: keep documents whose quality features fall inside
    the configured bands (the standard pre-training filter shape: drop
    too-short/too-long docs, gibberish with no stopwords, and runaway
    average word lengths). Pure column predicates over ``quality_score``
    output — streams, no shuffle; SQL-oracle-able end to end.
    """
    scored = quality_score(ds, text_col)

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["word_count"], min_words),
                pc.less_equal(t["word_count"], max_words),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["stop_ratio"], min_stop_ratio),
                    pc.less_equal(t["stop_ratio"], max_stop_ratio),
                ),
                pc.and_(
                    pc.greater_equal(t["avg_word_len"], min_avg_word_len),
                    pc.less_equal(t["avg_word_len"], max_avg_word_len),
                ),
            ),
        )
        return t.filter(m)

    return scored.map_batches(
        keep, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def _explode_words(texts: pa.ChunkedArray | pa.Array):
    """Split texts on single spaces → (flat word array, int64 offsets)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern(texts, " ")
    flat = lists.flatten()
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offsets


def _token_count_partial(
    t: pa.Table, text_col: str, *, key_name: str = "token",
    count_name: str = "n",
) -> pa.Table:
    """Per-batch (token, count) vocabulary partial — THE shared word-count
    kernel (vocab_count / frequency_spectrum / pmi / bpe_train /
    vocab_encode all collapse batches through this exact shape)."""
    flat, _ = _explode_words(t[text_col])
    agg = (
        pa.table({key_name: flat})
        .group_by(key_name)
        .aggregate([(key_name, "count")])
    )
    return agg.rename_columns([key_name, count_name])


def burrows_delta(
    ds: ray.data.Dataset,
    text_col: str = "text",
    source_col: str = "source",
    *,
    top_k: int = 50,
    num_buckets: int = 32,
    round_digits: int | None = 6,
) -> ray.data.Dataset:
    """Burrows' Delta — the classic stylometry / authorship-attribution
    distance between corpora: z-score each source's relative frequency of
    the global top-``top_k`` words (mean/std ACROSS sources, population
    form ``mean(f²) − mean(f)²``), then ``delta(s1, s2) = mean_w |z₁ −
    z₂|`` per unordered source pair. Low delta = stylistically similar
    sources — the standard audit for "did these two corpus slices come
    from the same generator/author".

    Scale shape: per-batch (source, token, n) Arrow partials → ONE bucket
    exchange on ``hash(token)`` (a token's total lives entirely in its
    bucket, so each bucket's local top-k candidates contain every global
    top-k token); buckets also emit per-source token-total side rows, so
    the corpus streams ONCE with no second pass. The driver finish is
    bounded by buckets × top_k × sources. Tokenization is the engine
    canon (single-space split = ``string_split(text, ' ')``); top-k ties
    break (count DESC, token ASC) on both sides.
    """
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[source_col]),
                             pc.is_valid(t[text_col])))
        if t.num_rows == 0:
            return pa.table({source_col: pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        flat, offsets = _explode_words(t[text_col])
        reps = np.diff(offsets)
        src = t[source_col].combine_chunks().take(
            pa.array(np.repeat(np.arange(t.num_rows), reps)))
        agg = (
            pa.table({source_col: src, "token": flat})
            .group_by([source_col, "token"])
            .aggregate([([], "count_all")])
        )
        return agg.rename_columns([source_col, "token", "n"])

    partials = ds.select_columns([source_col, text_col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)
    bucketed = add_bucket_column(partials, "token", num_buckets)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        cnt = (df.groupby([source_col, "token"], sort=False)["n"]
               .sum().reset_index(name="c"))
        tot = (cnt.groupby(source_col, sort=True)["c"]
               .sum().reset_index(name="c"))
        tot["kind"] = "tot"
        tot["token"] = None
        tot["g"] = 0.0
        g = cnt.groupby("token", sort=False)["c"].sum()
        keep = (g.reset_index(name="g")
                .sort_values(["g", "token"], ascending=[False, True],
                             kind="mergesort").head(top_k))
        tok = cnt.merge(keep, on="token", how="inner")
        tok["kind"] = "tok"
        cols = ["kind", source_col, "token", "c", "g"]
        out = pd.concat([tok[cols], tot[cols]], ignore_index=True)
        out["c"] = out["c"].astype(np.float64)
        out["g"] = out["g"].astype(np.float64)
        return out

    merged = bucketed_map_groups(
        bucketed, per_bucket, num_buckets=num_buckets,
        batch_format="pandas").to_pandas()  # ≤ B × (top_k·S + S) rows

    tots = (merged[merged["kind"] == "tot"]
            .groupby(source_col, sort=True)["c"].sum())
    sources = list(tots.index)
    tok = merged[merged["kind"] == "tok"]
    if len(tok) == 0 or len(sources) < 2:
        return ray.data.from_arrow(pa.table({
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "delta": pa.array([], pa.float64()),
        }))
    g = (tok.groupby("token", sort=False)[["g"]].first()
         .reset_index()
         .sort_values(["g", "token"], ascending=[False, True],
                      kind="mergesort").head(top_k))
    top_tokens = list(g["token"])
    k, s_n = len(top_tokens), len(sources)
    t_idx = {t: i for i, t in enumerate(top_tokens)}
    s_idx = {s: i for i, s in enumerate(sources)}
    f = np.zeros((s_n, k))
    sel = tok[tok["token"].isin(t_idx)]
    rows = sel[source_col].map(s_idx).to_numpy(dtype=np.int64)
    cols_i = sel["token"].map(t_idx).to_numpy(dtype=np.int64)
    f[rows, cols_i] = sel["c"].to_numpy() / tots.to_numpy()[rows]
    mu = f.mean(axis=0)
    var = (f * f).mean(axis=0) - mu * mu
    sd = np.sqrt(np.where(var > 0, var, 0.0))
    with np.errstate(invalid="ignore", divide="ignore"):
        z = np.where(sd > 0, (f - mu) / sd, 0.0)
    out_a, out_b, out_d = [], [], []
    for i in range(s_n):
        for j in range(i + 1, s_n):
            out_a.append(sources[i])
            out_b.append(sources[j])
            d = np.abs(z[i] - z[j]).mean()
            out_d.append(round(d, round_digits)
                         if round_digits is not None else d)
    return ray.data.from_arrow(pa.table({
        "source_a": pa.array(out_a, pa.string()),
        "source_b": pa.array(out_b, pa.string()),
        "delta": pa.array(out_d, pa.float64()),
    }))


def lang_id(
    ds: ray.data.Dataset, text_col: str = "text", out_col: str = "lang_pred"
) -> ray.data.Dataset:
    """N-gram-free stopword-profile language ID (deterministic heuristic).

    Scores each language by stopword hits per document (flat exploded words,
    one vectorized ``isin`` + ``reduceat`` per language); ties and zero-hit
    docs resolve to the first profile in deterministic order, 'und' when no
    profile hits.
    """

    def _lang(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], pa.string()))
        flat, offsets = _explode_words(t[text_col])
        words = pd.Series(flat.to_pandas(), copy=False)
        scores = np.zeros((len(_LANG_PROFILES), n), dtype=np.int64)
        seg = offsets[:-1]
        nonempty = offsets[1:] > offsets[:-1]
        for i, (_, stops) in enumerate(_LANG_PROFILES):
            hits = words.isin(stops).to_numpy().astype(np.int64)
            if hits.size:
                csum = np.concatenate(([0], np.cumsum(hits)))
                scores[i] = csum[offsets[1:]] - csum[seg]
        best = np.argmax(scores, axis=0)  # first max wins (deterministic)
        total = scores.sum(axis=0)
        labels = np.array([name for name, _ in _LANG_PROFILES])
        pred = np.where((total > 0) & nonempty, labels[best], "und")
        return t.append_column(out_col, pa.array(pred))

    return ds.map_batches(_lang, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


_FP_P1 = np.uint64(0x9E3779B185EBCA87)
_FP_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_FP_P3 = np.uint64(0x165667B19E3779F9)


def word_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Exploded word uint64 hashes + per-doc offsets (shared by fingerprint,
    MinHash and SimHash)."""
    flat, offsets = _explode_words(texts)
    np_words = flat.to_numpy(zero_copy_only=False).astype(object)
    h = pd.util.hash_array(np_words) if len(np_words) else np.empty(0, np.uint64)
    return h.astype(np.uint64), offsets


def shingle_hashes(
    h: np.ndarray, offsets: np.ndarray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling k-word shingle hashes on the flat word-hash array — fully
    vectorized, no per-document loop.

    Shingle i combines hashes i..i+k-1 with distinct odd multipliers (a
    rolling polynomial over the word stream). Computed once over the WHOLE
    flat array; shingles that would cross a document boundary are dropped by
    a vectorized validity mask. Documents shorter than k fall back to their
    first single-word hash. Returns (flat shingles, doc offsets).
    """
    n_docs = len(offsets) - 1
    lengths = offsets[1:] - offsets[:-1]
    n = len(h)
    out_lens = np.maximum(lengths - (k - 1), np.minimum(lengths, 1))
    out_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_offsets[1:])
    total = int(out_offsets[-1])
    shingles = np.empty(total, dtype=np.uint64)
    if total == 0:
        return shingles, out_offsets
    mults = (_FP_P1, _FP_P2, _FP_P3)
    if n >= k:
        # full[i] = hash of the k-window starting at flat position i.
        # In-place ufuncs: fresh allocations are pathologically slow on some
        # hosts (page-fault bound); two buffers instead of 2k temporaries.
        m = n - k + 1
        full = np.multiply(h[:m], mults[0])
        tmp = np.empty_like(full)
        for j in range(1, k):
            np.multiply(h[j : j + m], mults[j % len(mults)], out=tmp)
            np.bitwise_xor(full, tmp, out=full)
        # a window starting at i is valid iff it stays inside its doc. The
        # invalid starts are exactly the last k-1 positions of every doc
        # (and that also covers all positions of docs shorter than k).
        valid = np.ones(m, dtype=bool)
        ends = offsets[1:]
        for j in range(1, k):
            pos = ends - j
            sel = (lengths >= j) & (pos < m)
            valid[pos[sel]] = False
    else:
        full = np.empty(0, np.uint64)
        valid = np.empty(0, bool)
    # long-doc shingles fill every output slot except the one reserved per
    # short (0 < len < k) doc — both sides enumerate docs in order.
    short_docs = (lengths > 0) & (lengths < k)
    out_long = np.ones(total, dtype=bool)
    out_long[out_offsets[:-1][short_docs]] = False
    shingles[out_long] = full[valid]
    shingles[out_offsets[:-1][short_docs]] = h[offsets[:-1][short_docs]] * _FP_P1
    return shingles, out_offsets


def fingerprint(
    ds: ray.data.Dataset,
    text_col: str = "text",
    out_col: str = "fingerprint",
    *,
    k: int = 3,
) -> ray.data.Dataset:
    """Rolling-hash document fingerprint: min k-word-shingle hash per doc.

    A winnowing-style content fingerprint (deterministic uint64 reported as
    int64 for Arrow/SQL friendliness); empty docs fingerprint to 0.
    """

    def _fp(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        h, offsets = word_hashes(t[text_col])
        sh, soff = shingle_hashes(h, offsets, k)
        fp = np.zeros(n, dtype=np.uint64)
        nonempty = soff[1:] > soff[:-1]
        if sh.size:
            mins = np.minimum.reduceat(sh, np.minimum(soff[:-1], len(sh) - 1))
            fp[nonempty] = mins[nonempty]
        return t.append_column(out_col, pa.array(fp.view(np.int64)))

    return ds.map_batches(_fp, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def normalize_text(
    ds: ray.data.Dataset,
    text_col: str = "text",
    out_col: str = "text_norm",
) -> ray.data.Dataset:
    """Standard corpus text canonicalization: lowercase, collapse every
    whitespace run to one space, trim the ends. Pure streaming map; RE2 on
    both sides, so the DuckDB oracle (``trim(regexp_replace(lower(text),
    '\\s+', ' ', 'g'))``) agrees bit-for-bit."""

    def _norm(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t[text_col])
        s = pc.replace_substring_regex(s, r"\s+", " ")
        s = pc.utf8_trim(s, " ")
        return t.append_column(out_col, s)

    return ds.map_batches(
        _norm, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def vocab_count(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    top_n: int = 100,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Corpus vocabulary: the ``top_n`` whitespace tokens by document-corpus
    frequency (ties break by token ascending) — the classic word count with
    the engine's scale shape:

    - per-batch PARTIAL: explode + Arrow ``group_by`` count, so the
      exchange moves (token, partial_count) rows bounded by per-batch
      vocabulary, never corpus tokens;
    - ONE bucket shuffle on ``hash(token)``: every token's partials land in
      one bucket → exact per-token totals; each bucket emits only its local
      top ``top_n`` (a token's global total lives entirely in its bucket,
      so the global top-N survives);
    - tiny final: B x top_n rows through a single-group top-N.

    Output: (token:string, n:int64). Oracle: unnest(string_split) GROUP BY
    ORDER BY n DESC, token LIMIT N.
    """
    def partial(t: pa.Table) -> pa.Table:
        return _token_count_partial(t, text_col)

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return _bucketed_topn(partials, top_n=top_n, num_buckets=num_buckets)


def _bucketed_topn(
    partials: ray.data.Dataset,
    *,
    top_n: int,
    num_buckets: int,
    key_col: str = "token",
) -> ray.data.Dataset:
    """Exact global top-N over (key, partial-count) rows: ONE bucket
    shuffle on ``hash(key)`` (a key's total lives entirely in its bucket),
    each bucket emits its local top-N, tiny single-group final. Ties break
    by key ascending on both levels."""
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    bucketed = add_bucket_column(partials, key_col, num_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        agg = (
            t.select([key_col, "n"])
            .group_by(key_col)
            .aggregate([("n", "sum")])
            .rename_columns([key_col, "n"])
        )
        df = agg.to_pandas().sort_values(
            ["n", key_col], ascending=[False, True], kind="stable"
        ).head(top_n)
        df[BUCKET_COL] = 0  # route the survivors to one final group
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)

    locals_ = bucketed_map_groups(
        bucketed, per_bucket, num_buckets=num_buckets, batch_format="pyarrow"
    )

    def final(t: pa.Table) -> pa.Table:
        df = (
            t.select([key_col, "n"])
            .to_pandas()
            .sort_values(["n", key_col], ascending=[False, True],
                         kind="stable")
            .head(top_n)
            .reset_index(drop=True)
        )
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)

    return bucketed_map_groups(
        locals_, final, num_buckets=1, batch_format="pyarrow"
    )


def ngram_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    n: int = 2,
    top_n: int = 100,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Corpus top-N word n-grams (whitespace tokens joined by a single
    space). N-grams never cross document boundaries.

    The n-gram strings are built without any per-row loop: the flat token
    array is self-joined at offsets 0..n-1 (``binary_join_element_wise``
    on n sliced views), then start positions whose window would straddle a
    document boundary are masked out via the list offsets. Same scale
    shape as ``vocab_count``: per-batch partial counts → one bucket
    shuffle → exact global top-N.
    """
    if n < 1:
        raise ValueError("n must be >= 1")

    def partial(t: pa.Table) -> pa.Table:
        flat, offsets = _explode_words(t[text_col])
        total = len(flat)
        n_starts = total - n + 1
        if n_starts <= 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        if n == 1:
            grams = flat
        else:
            views = [flat.slice(i, n_starts) for i in range(n)]
            grams = pc.binary_join_element_wise(*views, " ")
            # start j is invalid when an interior doc boundary b lies in
            # (j, j+n): j in [b-n+1, b-1]
            ends = offsets[1:-1]
            inv = (ends[:, None] - np.arange(1, n)[None, :]).ravel()
            inv = inv[(inv >= 0) & (inv < n_starts)]
            if len(inv):
                valid = np.ones(n_starts, dtype=bool)
                valid[inv] = False
                grams = grams.filter(pa.array(valid))
        agg = (
            pa.table({"token": grams})
            .group_by("token")
            .aggregate([("token", "count")])
        )
        return agg.rename_columns(["token", "n"])

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return _bucketed_topn(partials, top_n=top_n, num_buckets=num_buckets)


def tf_idf(
    ds: ray.data.Dataset,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Per-(document, token) TF-IDF over whitespace tokens: ``tf`` is the
    in-document term count, ``tfidf = round(tf * ln(N / df), 6)`` with
    ``df`` the number of documents containing the token and ``N`` the
    corpus document count.

    Two passes, NO shuffle: pass 1 collapses each batch to its distinct
    (token, containing-doc count) partials plus a doc-count marker row —
    exchange volume is per-batch vocabulary, merged driver-side (for an
    unbounded vocabulary route the merge through the vocab_count-style
    hash(token) bucket exchange instead). The merged idf map is broadcast
    (serialized once into the object store with the stage closure) and
    pass 2 is row-local: per-doc token counts joined to idf in-batch.
    Re-executes ``ds`` lineage twice, like heavy_hitters.

    Output: (doc_id, token, tf:int64, tfidf:float64).
    """

    def df_partial(t: pa.Table) -> pa.Table:
        flat, offsets = _explode_words(t[text_col])
        doc_idx = np.repeat(
            np.arange(t.num_rows, dtype=np.int64), np.diff(offsets)
        )
        dfr = pd.DataFrame({"_d": doc_idx, "token": flat.to_pandas()})
        cnt = (
            dfr.drop_duplicates()
            .groupby("token", as_index=False)
            .size()
            .rename(columns={"size": "df"})
        )
        # marker row (null token) carries the batch's document count
        cnt = pd.concat(
            [cnt, pd.DataFrame({"token": [None], "df": [t.num_rows]})],
            ignore_index=True,
        )
        return pa.Table.from_pandas(
            cnt, preserve_index=False
        ).replace_schema_metadata(None)

    sel = ds.select_columns([doc_id_col, text_col])
    parts = sel.map_batches(
        df_partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    n_docs = int(parts.loc[parts["token"].isna(), "df"].sum())
    dfs = (
        parts[parts["token"].notna()]
        .groupby("token")["df"].sum()
    )
    idf = np.log(float(n_docs) / dfs)  # pandas Series: token -> idf

    def tf_map(t: pa.Table) -> pa.Table:
        flat, offsets = _explode_words(t[text_col])
        doc_idx = np.repeat(
            np.arange(t.num_rows, dtype=np.int64), np.diff(offsets)
        )
        g = (
            pd.DataFrame({"_d": doc_idx, "token": flat.to_pandas()})
            .groupby(["_d", "token"], as_index=False, sort=True)
            .size()
            .rename(columns={"size": "tf"})
        )
        doc_ids = t[doc_id_col].to_numpy(zero_copy_only=False)[
            g["_d"].to_numpy()
        ]
        tfidf = np.round(
            g["tf"].to_numpy(dtype=np.float64)
            * idf.reindex(g["token"]).to_numpy(dtype=np.float64),
            round_digits,
        )
        return pa.table(
            {
                doc_id_col: pa.array(doc_ids),
                "token": pa.Array.from_pandas(g["token"]),
                "tf": pa.array(g["tf"].to_numpy(dtype=np.int64)),
                "tfidf": pa.array(tfidf),
            }
        )

    return sel.map_batches(
        tf_map, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def repetition_ratio(
    ds: ray.data.Dataset,
    text_col: str = "text",
    out_col: str = "rep_ratio",
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Gopher-style word-repetition quality signal per document:
    ``1 - distinct_words / total_words`` (0 = no repetition). Pure
    streaming map, vectorized: one explode + one lexsort over (row,
    word-hash) + boundary count — no per-row Python. Oracle:
    ``1 - len(list_distinct(string_split(text,' '))) /
    len(string_split(text,' '))``."""

    def _rep(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], pa.float64()))
        flat, offsets = _explode_words(t[text_col])
        total = (offsets[1:] - offsets[:-1]).astype(np.int64)
        h = pd.util.hash_array(
            flat.to_numpy(zero_copy_only=False).astype(object)
        )
        row = np.repeat(np.arange(n, dtype=np.int64), total)
        order = np.lexsort((h, row))
        rs, hs = row[order], h[order]
        new = np.concatenate(
            ([True], (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1]))
        )
        distinct = np.bincount(rs[new], minlength=n)
        ratio = np.where(
            total > 0, 1.0 - distinct / np.maximum(total, 1), 0.0
        )
        return t.append_column(
            out_col, pa.array(np.round(ratio, round_digits))
        )

    return ds.map_batches(
        _rep, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def ngram_strings(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Flat word n-gram STRINGS + owning doc index, fully vectorized.

    Grams are built on the whole flat word array with one Arrow
    ``binary_join_element_wise`` over shifted slices; grams that would cross
    a document boundary are dropped by an index-equality mask (same trick as
    ``shingle_hashes``). Docs with fewer than ``n`` words emit no grams —
    exactly DuckDB's ``range(1, len(words) - n + 2)`` being empty. String
    (not hashed) grams so oracle SQL matches literally.
    """
    flat, offsets = _explode_words(texts)
    total = len(flat)
    n_docs = len(offsets) - 1
    doc_idx = np.repeat(
        np.arange(n_docs, dtype=np.int64), offsets[1:] - offsets[:-1]
    )
    if total < n:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    parts = [flat.slice(i, total - n + 1) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    valid = doc_idx[: total - n + 1] == doc_idx[n - 1 :]
    return (
        grams.to_numpy(zero_copy_only=False)[valid],
        doc_idx[: total - n + 1][valid],
    )


def benchmark_ngram_set(texts, n: int = 3) -> frozenset:
    """Distinct word n-grams of a (small) benchmark corpus — the broadcast
    side of ``decontaminate``. Size is O(benchmark), never O(corpus)."""
    grams, _ = ngram_strings(texts, n)
    return frozenset(grams.tolist())


class _DecontamStage:
    """Actor-pool stage: benchmark n-gram set deserialized ONCE per actor
    (ST2 pattern — a real benchmark set is 1e6-1e8 grams; per-task
    ``ray.get`` would re-deserialize it per block)."""

    def __init__(self, bench_ref, *, text_col: str, n: int):
        import ray

        self.bench = (
            ray.get(bench_ref) if not isinstance(bench_ref, frozenset)
            else bench_ref
        )
        self.text_col = text_col
        self.n = n

    def __call__(self, t: pa.Table) -> pa.Table:
        n_rows = t.num_rows
        counts = np.zeros(n_rows, dtype=np.int64)
        if n_rows:
            grams, doc_idx = ngram_strings(t[self.text_col], self.n)
            if len(grams):
                hit = pd.Series(grams, copy=False).isin(self.bench).to_numpy()
                if hit.any():
                    # distinct matched grams per doc
                    d = pd.DataFrame(
                        {"d": doc_idx[hit], "g": grams[hit]}
                    ).drop_duplicates()
                    vc = d["d"].value_counts()
                    counts[vc.index.to_numpy()] = vc.to_numpy()
        t = t.append_column("contam_ngrams", pa.array(counts))
        return t.append_column("contaminated", pa.array(counts > 0))


def decontaminate(
    ds: ray.data.Dataset,
    benchmark_ngrams: frozenset | object,
    *,
    text_col: str = "text",
    n: int = 3,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Benchmark decontamination: per document, the number of DISTINCT word
    n-grams that also appear in a benchmark set (broadcast via ``ray.put``),
    plus a boolean flag. The standard eval-leakage filter for training
    corpora (flag-then-drop); narrow map, no shuffle — scale-safe at 100 TB
    as long as the benchmark side stays broadcastable (it is by definition
    the small side).

    ``benchmark_ngrams``: a ``frozenset`` (tests) or an ``ObjectRef`` to one
    (production — put once, fetched once per actor).
    """
    return ds.map_batches(
        _DecontamStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(
            bench_ref=benchmark_ngrams, text_col=text_col, n=n
        ),
        # the ctor arg is an ObjectRef: actor RESTART could not replay it if
        # the ref went out of scope; the stage is deterministic, so disable
        # restarts and let the driver-level retry re-create the pool instead
        max_restarts=0,
    )


def wrap_words(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    words_per_line: int = 8,
    sep: str = "\n",
) -> ray.data.Dataset:
    """Reshape space-separated text into ``sep``-joined lines of
    ``words_per_line`` words — fully vectorized (two Arrow ``binary_join``
    passes over one flat word array, zero per-row Python). Matches DuckDB
    ``list_transform(range(1, len(w)+1, k), i -> array_to_string(w[i:i+k-1],
    ' '))`` exactly. Test adapter for line-level ops over the newline-free
    synthetic corpus; real corpora skip this."""
    wpl = words_per_line

    def _wrap(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        flat, offsets = _explode_words(t[text_col])
        lengths = offsets[1:] - offsets[:-1]
        n_lines = -(-lengths // wpl)  # ceil; split() never yields 0 words
        total_lines = int(n_lines.sum())
        line_base = np.concatenate(([0], np.cumsum(n_lines)))
        within = np.arange(total_lines) - np.repeat(line_base[:-1], n_lines)
        starts = np.repeat(offsets[:-1], n_lines) + within * wpl
        if offsets[-1] >= (1 << 31):  # Arrow list offsets are int32
            raise ValueError(
                "wrap_words block has too many words for int32 list "
                f"offsets ({int(offsets[-1])}); read with more blocks"
            )
        line_offsets = np.append(starts, offsets[-1]).astype(np.int32)
        lines = pc.binary_join(
            pa.ListArray.from_arrays(line_offsets, flat), " "
        )
        joined = pc.binary_join(
            pa.ListArray.from_arrays(line_base.astype(np.int32), lines), sep
        )
        return t.set_column(
            t.schema.get_field_index(text_col), text_col, joined
        )

    return ds.map_batches(
        _wrap, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def _byte_view(col) -> tuple[np.ndarray, np.ndarray]:
    """Raw UTF-8 byte buffer + per-doc ABSOLUTE int64 offsets of a string
    column (zero-copy: no per-row materialization). Null/empty docs have
    zero length. Positions outside ``[off[0], off[-1])`` belong to no doc."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.type != pa.string():
        arr = arr.cast(pa.string())
    raw = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    off = raw[arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    buf = arr.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8)
        if buf is not None else np.empty(0, np.uint8)
    )
    return data, off


def lm_score(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "lm_nll",
    round_digits: int = 6,
    materialize_input: bool = True,
    smoothing: str = "addone",
    discount: float = 0.75,
) -> ray.data.Dataset:
    """Char-bigram language-model perplexity scoring (the CCNet-style
    quality signal: docs unlike the corpus score high): train a byte-level
    bigram LM with add-one smoothing on the corpus itself, then score each
    doc with its average negative log-likelihood ``avg(-ln P(c2|c1))``
    over its bigrams. Docs with < 2 bytes score null.

    ``smoothing="kneser_ney"`` swaps the table for interpolated
    Kneser-Ney with absolute ``discount`` D (the standard n-gram LM
    smoother — Chen & Goodman 1999): ``P(c2|c1) = (max(n12 - D, 0)
    + D * N1+(c1 .) * Pcont(c2)) / n(c1 .)`` with the continuation
    distribution ``Pcont(c2) = N1+(. c2) / |{(c1, c2): n12 > 0}|``;
    contexts unseen in training back off to ``Pcont`` alone. Only the
    driver-side table construction differs — the count partials and the
    broadcast scoring pass are shared with the add-one path.

    Scale shape (100 TB): pass 1 collapses each block to its nonzero
    (bigram-code, count) pairs — <= 64Ki rows per block no matter the
    input — merged driver-side into the 256x256 count matrix; the smoothed
    log-prob table (512 KB) broadcasts once via ``ray.put``; pass 2 is a
    row-local vectorized lookup + segment-sum. No shuffle anywhere. For a
    fixed reference LM (score corpus B under corpus A's model) pass the
    precomputed table via ``counts``-style refactor — the broadcast path
    is identical.
    """
    import ray

    proj = ds.select_columns([id_col, text_col])
    if materialize_input:
        proj = proj.materialize()  # two passes share one read of the corpus

    def partial(t: pa.Table) -> pa.Table:
        data, off = _byte_view(t[text_col])
        if t.num_rows == 0 or len(data) < 2 or off[-1] - off[0] < 2:
            return pa.table(
                {"code": pa.array([], pa.int32()),
                 "n": pa.array([], pa.int64())}
            )
        codes = data[:-1].astype(np.int32) * 256 + data[1:]
        valid = np.zeros(len(data) - 1, dtype=bool)
        valid[off[0]:max(off[-1] - 1, off[0])] = True
        b = off[1:-1]
        b = b[(b > 0) & (b < len(data))]
        valid[b - 1] = False  # bigram would cross a doc boundary
        cnt = np.bincount(codes[valid], minlength=65536)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {"code": pa.array(nz.astype(np.int32)),
             "n": pa.array(cnt[nz].astype(np.int64))}
        )

    parts = proj.map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # <= 64Ki rows per block, tiny
    counts = np.zeros(65536, dtype=np.int64)
    if len(parts):
        np.add.at(
            counts, parts["code"].to_numpy().astype(np.int64),
            parts["n"].to_numpy(),
        )
    row_tot = counts.reshape(256, 256).sum(axis=1)
    if smoothing == "addone":
        logp = np.log(
            (counts + 1.0) / (np.repeat(row_tot, 256) + 256.0)
        )
    elif smoothing == "kneser_ney":
        m = counts.reshape(256, 256)
        seen = m > 0
        n1f = seen.sum(axis=1).astype(np.float64)    # N1+(c1 .)
        n1r = seen.sum(axis=0).astype(np.float64)    # N1+(. c2)
        types = max(float(seen.sum()), 1.0)
        pcont = n1r / types                          # continuation dist
        d = float(discount)
        num = (np.maximum(m - d, 0.0)
               + d * n1f[:, None] * pcont[None, :])
        with np.errstate(divide="ignore", invalid="ignore"):
            p = num / row_tot.astype(np.float64)[:, None]
        # unseen context: back off to the continuation distribution
        p = np.where(row_tot[:, None] > 0, p,
                     np.broadcast_to(pcont, (256, 256)))
        logp = np.log(p).ravel()
    else:
        raise ValueError(f"unknown smoothing {smoothing!r}")
    logp_ref = ray.put(logp)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 out_col: pa.array([], pa.float64())}
            )
        lp = ray.get(logp_ref)
        data, off = _byte_view(t[text_col])
        lens = off[1:] - off[:-1]
        m = np.maximum(lens - 1, 0)
        if len(data) >= 2:
            codes = data[:-1].astype(np.int32) * 256 + data[1:]
            valid = np.zeros(len(data) - 1, dtype=bool)
            valid[off[0]:max(off[-1] - 1, off[0])] = True
            b = off[1:-1]
            b = b[(b > 0) & (b < len(data))]
            valid[b - 1] = False
            s = -lp[codes[valid]]
        else:
            s = np.empty(0, np.float64)
        csum = np.concatenate(([0.0], np.cumsum(s)))
        doc_off = np.concatenate(([0], np.cumsum(m)))
        sums = csum[doc_off[1:]] - csum[doc_off[:-1]]
        nll = np.round(
            np.divide(sums, m, out=np.zeros_like(sums), where=m > 0),
            round_digits,
        )
        return pa.table(
            {
                id_col: t[id_col],
                out_col: pa.array(nll, mask=m == 0),
            }
        )

    return proj.map_batches(
        score, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def _bigram_codes(data: np.ndarray, off: np.ndarray):
    """Byte-bigram codes of every doc in a block, doc-boundary aware.

    Returns ``(codes, m)``: ``codes`` are the int32 bigram codes
    (``256*c1 + c2``) of all docs concatenated in doc order, ``m`` the
    per-doc bigram counts (``len - 1``, floored at 0) — so
    ``np.repeat(doc_mask, m)`` aligns any per-doc mask with ``codes``."""
    lens = off[1:] - off[:-1]
    m = np.maximum(lens - 1, 0)
    if len(data) < 2 or off[-1] - off[0] < 2:
        return np.empty(0, np.int32), m
    codes = data[:-1].astype(np.int32) * 256 + data[1:]
    valid = np.zeros(len(data) - 1, dtype=bool)
    valid[off[0]:max(off[-1] - 1, off[0])] = True
    b = off[1:-1]
    b = b[(b > 0) & (b < len(data))]
    valid[b - 1] = False  # bigram would cross a doc boundary
    return codes[valid], m


def dsir_select(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_val: str = "en",
    k: int = 50,
    round_digits: int = 6,
    materialize_input: bool = True,
) -> ray.data.Dataset:
    """DSIR data selection (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): pick the ``k`` raw documents whose
    hashed-feature distribution looks most like a target corpus, via
    Gumbel-top-k over importance log-weights.

    Features are byte bigrams (the paper's hashed n-grams with a perfect
    64Ki hash). Both feature LMs use add-one smoothing over the full 64Ki
    vocabulary; the target corpus is the subset ``target_col == target_val``
    of the input itself (select-more-like-these). Per doc,
    ``logw = sum over bigram occurrences of ln p_target(b) - ln p_raw(b)``
    and the resampling key is ``round(logw + Gumbel(doc_id), 6)`` where the
    Gumbel noise derives from the multiplicative hash
    ``(doc_id * 2654435761) mod 2^32`` — fully deterministic and
    SQL-mirrorable. Ties break by ``id_col`` ascending. Output: the
    selected rows' ``(id_col, dsir_logw, dsir_key)``, key-descending.

    Scale shape (100 TB): pass 1 collapses each block to <= 64Ki
    (code, n_raw, n_target) rows merged driver-side; the 512 KB log-ratio
    table broadcasts once via ``ray.put``; pass 2 is row-local scoring that
    emits only its block-top-k — the driver merges ``k x num_blocks`` tiny
    partials. No shuffle anywhere.
    """
    import ray

    proj = ds.select_columns([id_col, text_col, target_col])
    if materialize_input:
        proj = proj.materialize()  # two passes share one read

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"code": pa.array([], pa.int32()),
             "n_raw": pa.array([], pa.int64()),
             "n_tgt": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        data, off = _byte_view(t[text_col])
        codes, m = _bigram_codes(data, off)
        if len(codes) == 0:
            return empty
        tgt_doc = pc.equal(
            t[target_col], pa.scalar(target_val)
        ).combine_chunks().to_numpy(zero_copy_only=False)
        tgt_doc = np.asarray(tgt_doc, dtype=bool)
        tgt = np.repeat(tgt_doc, m)
        n_raw = np.bincount(codes, minlength=65536)
        n_tgt = np.bincount(codes[tgt], minlength=65536)
        nz = np.nonzero(n_raw)[0]
        return pa.table(
            {"code": pa.array(nz.astype(np.int32)),
             "n_raw": pa.array(n_raw[nz].astype(np.int64)),
             "n_tgt": pa.array(n_tgt[nz].astype(np.int64))}
        )

    parts = proj.map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    n_raw = np.zeros(65536, dtype=np.int64)
    n_tgt = np.zeros(65536, dtype=np.int64)
    if len(parts):
        codes = parts["code"].to_numpy().astype(np.int64)
        np.add.at(n_raw, codes, parts["n_raw"].to_numpy())
        np.add.at(n_tgt, codes, parts["n_tgt"].to_numpy())
    tot_raw, tot_tgt = n_raw.sum(), n_tgt.sum()
    lam = (
        np.log((n_tgt + 1.0) / (tot_tgt + 65536.0))
        - np.log((n_raw + 1.0) / (tot_raw + 65536.0))
    )
    lam_ref = ray.put(lam)

    def block_topk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {id_col: pa.array([], pa.int64()),
             "dsir_logw": pa.array([], pa.float64()),
             "dsir_key": pa.array([], pa.float64())}
        )
        if t.num_rows == 0:
            return empty
        lr = ray.get(lam_ref)
        data, off = _byte_view(t[text_col])
        codes, m = _bigram_codes(data, off)
        s = lr[codes] if len(codes) else np.empty(0, np.float64)
        csum = np.concatenate(([0.0], np.cumsum(s)))
        doc_off = np.concatenate(([0], np.cumsum(m)))
        logw = csum[doc_off[1:]] - csum[doc_off[:-1]]
        ids = np.asarray(
            t[id_col].combine_chunks().to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        h = (ids * np.int64(2654435761)) & np.int64(0xFFFFFFFF)
        u = (h.astype(np.float64) + 0.5) / 4294967296.0
        gum = -np.log(-np.log(u))
        key = np.round(logw + gum, round_digits)
        # block-local top-k: key desc, id asc (matches the oracle's
        # ORDER BY dsir_key DESC, doc_id)
        order = np.lexsort((ids, -key))[: min(k, len(ids))]
        return pa.table(
            {id_col: pa.array(ids[order]),
             "dsir_logw": pa.array(np.round(logw[order], round_digits)),
             "dsir_key": pa.array(key[order])}
        )

    cand = proj.map_batches(
        block_topk, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()  # k rows per block, tiny
    cand = cand.sort_values(
        ["dsir_key", id_col], ascending=[False, True], kind="stable"
    ).head(k).reset_index(drop=True)
    return ray.data.from_arrow(pa.Table.from_pandas(cand, preserve_index=False))


# Default PII masking rules, applied IN ORDER (most specific first so the
# generic digit-run rule can't eat a phone number's structure). RE2-only
# syntax — pyarrow and DuckDB both run RE2, so oracle SQL
# (nested regexp_replace(..., 'g')) agrees bit-for-bit.
DEFAULT_REDACT_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^ ]+", "<URL>"),
    (r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    (r"[0-9]+", "<NUM>"),
]


def redact(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    rules: list[tuple[str, str]] | None = None,
    out_col: str = "text_redacted",
) -> ray.data.Dataset:
    """PII scrubbing: replace every match of each rule pattern (emails,
    URLs, phone numbers, digit runs by default) with its mask token,
    rules applied in order. Pure streaming map, vectorized RE2
    (``pc.replace_substring_regex``) — no shuffle, no Python per row.
    """
    rs = list(rules or DEFAULT_REDACT_RULES)

    def _redact(t: pa.Table) -> pa.Table:
        col = t[text_col]
        for pat, repl in rs:
            col = pc.replace_substring_regex(
                col, pattern=pat, replacement=repl
            )
        return t.append_column(out_col, col)

    return ds.map_batches(
        _redact, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def inverted_index(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Corpus inverted index: one row per distinct whitespace token with
    its document frequency and the comma-joined ascending doc-id posting
    list. Per-batch tokenize + local (token, doc) distinct narrows the
    postings BEFORE the single token exchange; the per-token kernel
    dedupes across blocks, sorts and joins. Empty tokens (consecutive
    delimiters) are dropped on both sides.

    Scale note: hot stopword tokens concentrate their posting list in one
    kernel invocation — at corpus scale cap or drop ultra-high-df tokens
    upstream (the vocab_count op gives the df profile), exactly like the
    jaccard_pairs hot-shingle guidance."""
    import pandas as pd

    def postings(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col].combine_chunks().cast(pa.string()),
                                " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = t[id_col].combine_chunks().take(parent)
        keep = pc.not_equal(flat, "")
        d = pd.DataFrame({
            "token": flat.filter(keep).to_numpy(zero_copy_only=False),
            "doc": ids.filter(keep).to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        return pa.table({"token": pa.array(d["token"], pa.string()),
                         "doc": pa.array(d["doc"].to_numpy(), pa.int64())})

    from ..exchange import bucketed_map_groups
    from ..partition import BUCKET_COL, add_bucket_column

    parts = ds.select_columns([id_col, text_col]).map_batches(
        postings, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=[BUCKET_COL]).drop_duplicates()
        d = d.sort_values(["token", "doc"])
        g = d.groupby("token", sort=True)
        out = pd.DataFrame({
            "df": g["doc"].size().astype("int64"),
            "postings": g["doc"].agg(
                lambda s: ",".join(str(v) for v in s)),
        }).reset_index()
        return out

    return bucketed_map_groups(
        add_bucket_column(parts, "token", num_buckets),
        finalize, num_buckets=num_buckets, batch_format="pandas",
    )


def bm25(
    ds: ray.data.Dataset,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Per-(document, token) Okapi BM25 score over whitespace tokens::

        idf   = ln((N − df + 0.5) / (df + 0.5) + 1)        (Lucene variant)
        score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    with ``dl`` the document's token count and ``avgdl`` the corpus mean.
    Same two-pass no-shuffle shape as :func:`tf_idf`: pass 1 collapses each
    batch to (token, containing-doc count) partials plus a marker row
    carrying the batch's doc and token totals (exchange volume = per-batch
    vocabulary, merged driver-side); the merged idf map is broadcast with
    the stage closure and pass 2 is row-local. Re-executes ``ds`` lineage
    twice, like tf_idf.

    Output: (doc_id, token, tf:int64, score:float64).
    """
    kp1 = k1 + 1.0
    one_minus_b = 1.0 - b

    def df_partial(t: pa.Table) -> pa.Table:
        flat, offsets = _explode_words(t[text_col])
        doc_idx = np.repeat(
            np.arange(t.num_rows, dtype=np.int64), np.diff(offsets)
        )
        dfr = pd.DataFrame({"_d": doc_idx, "token": flat.to_pandas()})
        cnt = (
            dfr.drop_duplicates()
            .groupby("token", as_index=False)
            .size()
            .rename(columns={"size": "df"})
        )
        cnt["toks"] = 0
        marker = pd.DataFrame(
            {"token": [None], "df": [t.num_rows], "toks": [len(flat)]}
        )
        cnt = pd.concat([cnt, marker], ignore_index=True)
        return pa.Table.from_pandas(
            cnt, preserve_index=False
        ).replace_schema_metadata(None)

    sel = ds.select_columns([doc_id_col, text_col])
    parts = sel.map_batches(
        df_partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    marker = parts["token"].isna()
    n_docs = float(parts.loc[marker, "df"].sum())
    avgdl = float(parts.loc[marker, "toks"].sum()) / n_docs
    dfs = parts[~marker].groupby("token")["df"].sum()
    idf = np.log((n_docs - dfs + 0.5) / (dfs + 0.5) + 1.0)

    def score_map(t: pa.Table) -> pa.Table:
        flat, offsets = _explode_words(t[text_col])
        dl = np.diff(offsets)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), dl)
        g = (
            pd.DataFrame({"_d": doc_idx, "token": flat.to_pandas()})
            .groupby(["_d", "token"], as_index=False, sort=True)
            .size()
            .rename(columns={"size": "tf"})
        )
        di = g["_d"].to_numpy()
        tf = g["tf"].to_numpy(dtype=np.float64)
        dlr = dl.astype(np.float64)[di]
        score = np.round(
            idf.reindex(g["token"]).to_numpy(dtype=np.float64)
            * (tf * kp1)
            / (tf + k1 * (one_minus_b + (b * dlr) / avgdl)),
            round_digits,
        )
        return pa.table({
            doc_id_col: pa.array(
                t[doc_id_col].to_numpy(zero_copy_only=False)[di]),
            "token": pa.Array.from_pandas(g["token"]),
            "tf": pa.array(g["tf"].to_numpy(dtype=np.int64)),
            "score": pa.array(score, pa.float64()),
        })

    return sel.map_batches(
        score_map, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )


def vocab_encode(
    ds: ray.data.Dataset,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Tokenizer-style corpus encoding: build the full whitespace vocabulary,
    assign dense ids by (corpus count DESC, token ASC) — id 0 is the most
    frequent token, the standard tokenizer layout — then re-encode every
    document as (doc_id, pos, token_id) with 1-based positions.

    Scale shape: vocabulary totals come from the :func:`vocab_count`
    partial pattern (per-batch (token, count) partials → one token-bucket
    exchange; exchange volume is per-batch vocabulary, never corpus
    tokens); the id map is vocabulary-bounded, merged driver-side and
    broadcast in the encode closure; the encode pass itself is a streaming
    row-local map. Output rows = corpus tokens (written, not collected).
    """
    def partial(t: pa.Table) -> pa.Table:
        return _token_count_partial(t, text_col)

    sel = ds.select_columns([doc_id_col, text_col])
    parts = sel.select_columns([text_col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # vocabulary-bounded by construction
    totals = parts.groupby("token")["n"].sum().reset_index()
    totals = totals.sort_values(
        ["n", "token"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)
    id_map = pd.Series(
        np.arange(len(totals), dtype=np.int64), index=totals["token"]
    )

    def encode(t: pa.Table) -> pa.Table:
        flat, offsets = _explode_words(t[text_col])
        lens = np.diff(offsets)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offsets[:-1], lens) + 1
        tid = id_map.reindex(flat.to_pandas()).to_numpy(dtype=np.int64)
        return pa.table({
            doc_id_col: pa.array(
                t[doc_id_col].to_numpy(zero_copy_only=False)[doc_idx]),
            "pos": pa.array(pos),
            "token_id": pa.array(tid),
        })

    return sel.map_batches(
        encode, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def chunk_text(
    ds: ray.data.Dataset,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
    out_col: str = "chunk_text",
) -> ray.data.Dataset:
    """Sliding-window training-chunk splitter: each document becomes
    overlapping chunks of up to ``window`` whitespace tokens starting every
    ``stride`` tokens (chunk j covers tokens ``[j·stride, j·stride+window)``;
    starts run while ``j·stride < len``, so the tail chunk may be short).
    Output: (doc_id, chunk_id, chunk_text) — the context-length splitting
    pass that precedes sequence packing.

    Scale shape: pure streaming flat-map, no exchange. The chunk texts are
    rebuilt by slicing the document's byte buffer directly (token offsets →
    byte offsets), never by re-joining word lists in Python.
    """
    W, S = int(window), int(stride)

    def chunks(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(texts, " ")
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offsets)
        n_chunks = np.where(lens > 0, (lens - 1) // S + 1, 0)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_chunks)
        cum = np.concatenate(([0], np.cumsum(n_chunks)))
        cid = np.arange(int(cum[-1]), dtype=np.int64) - np.repeat(
            cum[:-1], n_chunks)
        # token index span of each chunk (within doc), clipped to doc end
        tok_lo = cid * S
        tok_hi = np.minimum(tok_lo + W, lens[doc_idx])
        # chunk text = byte slice of the ORIGINAL document buffer (keeps the
        # single-space separators; no Python re-join). Token k of doc d
        # starts at doc_start + Σ_{w<k}(wordlen_w + 1); word byte-lengths
        # come from the split array's offsets.
        flat = lists.flatten()
        buf = flat.buffers()
        word_offs = np.frombuffer(buf[1], dtype=np.int32)[
            flat.offset: flat.offset + len(flat) + 1].astype(np.int64)
        otext = texts
        obuf = otext.buffers()
        ooffs = np.frombuffer(obuf[1], dtype=np.int32)[
            otext.offset: otext.offset + len(otext) + 1].astype(np.int64)
        odata = np.frombuffer(obuf[2], dtype=np.uint8) if obuf[2] else (
            np.empty(0, np.uint8))
        step = (word_offs[1:] - word_offs[:-1]) + 1
        csum = np.concatenate(([0], np.cumsum(step)))
        doc_base = csum[offsets[:-1]]
        tok_start = csum[offsets[:-1][doc_idx] + tok_lo] - doc_base[doc_idx]
        tok_end = csum[offsets[:-1][doc_idx] + tok_hi] - 1 - doc_base[doc_idx]
        abs_lo = ooffs[:-1][doc_idx] + tok_start
        abs_hi = ooffs[:-1][doc_idx] + tok_end
        out_lens = abs_hi - abs_lo
        out_offs64 = np.concatenate(([0], np.cumsum(out_lens)))
        if out_offs64[-1] >= (1 << 31):  # Arrow string offsets are int32
            raise ValueError(
                "chunk_text output exceeds 2 GiB in one block "
                f"({int(out_offs64[-1])} bytes) — overlap amplification "
                "overflowed int32 string offsets; reduce the block size "
                "(read with more blocks) or the window/stride ratio"
            )
        out_offs = out_offs64.astype(np.int32)
        out_buf = np.empty(int(out_offs[-1]), dtype=np.uint8)
        # gather chunk bytes: vectorized per-chunk copy via repeat/arange
        idx = np.repeat(abs_lo, out_lens) + (
            np.arange(int(out_offs[-1]), dtype=np.int64)
            - np.repeat(out_offs[:-1].astype(np.int64), out_lens))
        np.take(odata, idx, out=out_buf)
        chunk_arr = pa.StringArray.from_buffers(
            len(cid), pa.py_buffer(out_offs.tobytes()),
            pa.py_buffer(out_buf.tobytes()))
        return pa.table({
            doc_id_col: pa.array(
                t[doc_id_col].to_numpy(zero_copy_only=False)[doc_idx]),
            "chunk_id": pa.array(cid),
            out_col: chunk_arr,
        })

    return ds.select_columns([doc_id_col, text_col]).map_batches(
        chunks, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def token_match(
    ds: ray.data.Dataset,
    pattern: str,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Extract-all for token-shaped patterns: every whitespace token matching
    the RE2 ``pattern``, exploded as (doc_id, ord, match) with a 1-based
    per-document ordinal in token order — the structured-span extraction
    pass (IDs, entities, markers) of a text pipeline.

    Scale shape: streaming map; ONE vectorized Arrow RE2 scan over the flat
    exploded word array per batch (``pc.match_substring_regex``), never a
    per-row Python regex loop.
    """

    def extract(t: pa.Table) -> pa.Table:
        flat, offsets = _explode_words(t[text_col])
        lens = np.diff(offsets)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        hit = pc.match_substring_regex(flat, pattern).to_numpy(
            zero_copy_only=False)
        hit = np.asarray(hit, dtype=bool)
        kept = np.flatnonzero(hit)
        kdoc = doc_idx[kept]
        # ordinal within doc among kept tokens
        csum = np.concatenate(([0], np.cumsum(hit.astype(np.int64))))
        ordinal = (csum[kept + 1] - csum[offsets[:-1][kdoc]])
        return pa.table({
            doc_id_col: pa.array(
                t[doc_id_col].to_numpy(zero_copy_only=False)[kdoc]),
            "ord": pa.array(ordinal.astype(np.int64)),
            "match": flat.take(pa.array(kept)),
        })

    return ds.select_columns([doc_id_col, text_col]).map_batches(
        extract, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def frequency_spectrum(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Token frequency spectrum — count-of-counts (how many distinct tokens
    occur exactly k times), the Zipf/heap audit behind vocabulary sizing
    and Good-Turing smoothing.

    Scale shape: per-batch PARTIAL token counts (the :func:`vocab_count`
    partial — the exchange moves per-batch vocabulary, never corpus
    tokens); ONE bucket shuffle on ``hash(token)`` makes per-token totals
    exact in-bucket; each bucket then collapses to its local
    (freq, num_tokens) spectrum, and the driver sums spectra across
    buckets (bounded by distinct frequencies — thousands at most, by
    Zipf). Output: (freq:int64, num_tokens:int64).
    """
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def partial(t: pa.Table) -> pa.Table:
        return _token_count_partial(t, text_col)

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    bucketed = add_bucket_column(partials, "token", num_buckets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        vc = df.groupby("token")["n"].sum().value_counts()
        return pd.DataFrame({
            "freq": vc.index.to_numpy().astype(np.int64),
            "num_tokens": vc.to_numpy().astype(np.int64),
        })

    spectra = bucketed_map_groups(
        bucketed,
        lambda df: kernel(df.drop(columns=[BUCKET_COL])),
        num_buckets=num_buckets, batch_format="pandas",
    )
    merged = (
        spectra.to_pandas()
        .groupby("freq", as_index=False)["num_tokens"].sum()
        .sort_values("freq").reset_index(drop=True)
    )
    return ray.data.from_arrow(pa.Table.from_pandas(
        merged, preserve_index=False))


def pmi(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    min_count: int = 5,
    round_digits: int = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Adjacent-bigram pointwise mutual information over whitespace
    tokens — the collocation statistic behind phrase mining (word2vec
    phrases, "new york"-style merges) and tokenizer-merge auditing:
    ``pmi(a,b) = ln((c_ab/NB) / ((c_a/NU)·(c_b/NU)))`` with ``NB`` total
    bigram windows and ``NU`` total tokens. Bigrams never cross document
    boundaries; pairs with ``c_ab < min_count`` are dropped.

    Scale shape: the unigram side collapses to per-batch vocabulary
    partials merged on the driver (Heaps-law bounded) and broadcast ONCE
    via ``ray.put``; the bigram side stays distributed — per-batch
    (a, b, count) partials, ONE bucket exchange on ``hash(a)`` (every
    partial of a pair shares ``a``, so totals are exact in-bucket), and
    each bucket finishes its own pairs against the broadcast vocabulary.
    ``NB = NU − n_docs`` exactly over NON-NULL docs (every such doc of L
    tokens has L−1 windows; ``split`` gives every non-null doc ≥1 token
    and null docs contribute nothing), so no extra pass is needed.
    Output: (a, b, n:int64, pmi:double rounded).
    """
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    proj = ds.select_columns([text_col])

    def upartial(t: pa.Table) -> pa.Table:
        agg = _token_count_partial(t, text_col)
        # null-token marker row carries this batch's NON-NULL document
        # count (null docs contribute 0 tokens and 0 bigram windows, so
        # they must not shift NB = NU − n_docs)
        n_docs = t.num_rows - t[text_col].null_count
        return pa.table({
            "token": pa.concat_arrays(
                [agg["token"].combine_chunks(), pa.array([None], pa.string())]
            ),
            "n": pa.concat_arrays(
                [agg["n"].cast(pa.int64()).combine_chunks(),
                 pa.array([n_docs], pa.int64())]
            ),
        })

    udf = (
        proj.map_batches(upartial, batch_size=None, batch_format="pyarrow",
                         zero_copy_batch=True)
        .to_pandas()
    )
    marker = udf["token"].isna()
    n_docs = int(udf.loc[marker, "n"].sum())
    uc = udf[~marker].groupby("token")["n"].sum()
    nu = float(uc.sum())
    nb = float(uc.sum() - n_docs)
    uc_ref = ray.put(uc)

    def bpartial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        })
        flat, offsets = _explode_words(t[text_col])
        n_starts = len(flat) - 1
        if n_starts <= 0:
            return empty
        a = flat.slice(0, n_starts)
        b = flat.slice(1, n_starts)
        # start j is invalid when an interior doc boundary sits at j+1
        inv = offsets[1:-1] - 1
        inv = inv[(inv >= 0) & (inv < n_starts)]
        if len(inv):
            valid = np.ones(n_starts, dtype=bool)
            valid[inv] = False
            mask = pa.array(valid)
            a, b = a.filter(mask), b.filter(mask)
        if len(a) == 0:
            return empty
        agg = (
            pa.table({"a": a, "b": b})
            .group_by(["a", "b"])
            .aggregate([("a", "count")])
        )
        return pa.table({
            "a": agg["a"], "b": agg["b"],
            "n": agg["a_count"].cast(pa.int64()),
        })

    partials = proj.map_batches(
        bpartial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    bucketed = add_bucket_column(partials, "a", num_buckets)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop(columns=[BUCKET_COL])
            .groupby(["a", "b"], as_index=False, sort=False)["n"].sum()
        )
        g = g[g["n"] >= min_count]
        u = ray.get(uc_ref)
        ca = g["a"].map(u).to_numpy(dtype=np.float64)
        cb = g["b"].map(u).to_numpy(dtype=np.float64)
        n = g["n"].to_numpy(dtype=np.float64)
        val = np.round(
            np.log((n / nb) / ((ca / nu) * (cb / nu))), round_digits
        )
        out = g.reset_index(drop=True)
        out["pmi"] = val
        return out

    return bucketed_map_groups(
        bucketed, finalize, num_buckets=num_buckets, batch_format="pandas"
    )


def _greedy_nonoverlap(m: np.ndarray) -> np.ndarray:
    """Left-to-right non-overlapping selection from a boolean match mask:
    within every maximal run of consecutive matches keep positions 0, 2,
    4, … (the classic BPE "aaa" → ("aa", "a") rule). Returns the kept
    match indices."""
    pos = np.flatnonzero(m)
    if len(pos) == 0:
        return pos
    run_id = np.cumsum(np.diff(pos, prepend=pos[0] - 2) != 1) - 1
    run_start = pos[np.flatnonzero(np.diff(run_id, prepend=-1))]
    return pos[(pos - run_start[run_id]) % 2 == 0]


def bpe_train(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    num_merges: int = 30,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Byte-pair-encoding tokenizer training — learn the ``num_merges``
    highest-count adjacent symbol merges over the corpus (GPT-2-style:
    merges never cross word boundaries). Ties break lexicographically on
    (left, right) so the merge table is deterministic across runs,
    partitionings and engines.

    Scale shape (the HF-tokenizers factorization): BPE statistics depend
    only on the DISTINCT-word frequency table, so pass 1 collapses the
    corpus to (word, count) — per-batch vocabulary partials, ONE
    hash(word) exchange — and the merge rounds run over that Heaps-law-
    bounded table, never the corpus.

    **Batched rounds** (the parallel-BPE-trainer semantics): each Ray
    round counts pairs once (per-batch weighted partials, driver-merged:
    active pair space is vocab-bounded), then selects ALL
    symbol-disjoint merges greedily in (count desc, left, right) order —
    a pair whose symbols are untouched by every earlier selection this
    round has provably unchanged counts, so each recorded ``n`` is exact
    at selection time — and applies them in one vectorized rewrite pass.
    Synchronous rounds drop from ``num_merges`` to roughly the longest
    learned token's merge depth (~log of its length). The merge list is
    prefix-stable in ``num_merges`` (selection is a deterministic greedy
    truncated at the cap), so one training serves every smaller table.
    NOTE: batched selection can order merges differently from the
    strictly sequential recount-after-every-merge variant whenever a
    symbol created this round would out-count a later disjoint pair; the
    pytest reference implements the same batched rule.

    Returns a driver-side DataFrame (rank:int64, left, right, n:int64) —
    tokenizer merge tables are tiny by construction. Iterative and
    string-rewriting, so no SQL oracle; exactness is pytest-gated against
    a pure-Python reference implementation.
    """
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    # pass 1: exact (word, count) table — vocab_count without the top-N cut
    def partial(t: pa.Table) -> pa.Table:
        return _token_count_partial(t, text_col, key_name="w", count_name="c")

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge_counts(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop(columns=[BUCKET_COL])
            .groupby("w", as_index=False, sort=False)["c"].sum()
        )

    words = bucketed_map_groups(
        add_bucket_column(parts, "w", num_buckets),
        merge_counts, num_buckets=num_buckets, batch_format="pandas",
    )

    # symbol-stream representation: per word, a list<string> of symbols
    def to_symbols(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["w"].str.len() > 0].copy()
        df["syms"] = df["w"].map(list)
        return df[["syms", "c"]]

    table = words.map_batches(
        to_symbols, batch_size=None, batch_format="pandas"
    ).materialize()

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        syms = df["syms"]
        lens = syms.str.len().to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(s, dtype=object) for s in syms])
        wid = np.repeat(np.arange(len(lens)), lens)
        cnt = df["c"].to_numpy(dtype=np.int64)
        a, b = flat[:-1], flat[1:]
        same = wid[:-1] == wid[1:]
        g = pd.DataFrame({
            "a": a[same], "b": b[same], "n": cnt[wid[:-1][same]],
        })
        return g.groupby(["a", "b"], as_index=False, sort=False)["n"].sum()

    merges: list[tuple[str, str, int]] = []
    while len(merges) < num_merges:
        pc_all = table.map_batches(
            pair_partial, batch_size=None, batch_format="pandas"
        ).to_pandas()
        if pc_all.empty:
            break
        tot = pc_all.groupby(["a", "b"], as_index=False)["n"].sum()
        tot = tot.sort_values(["n", "a", "b"],
                              ascending=[False, True, True], kind="stable")
        # batched greedy: take every symbol-disjoint merge this round
        # (disjoint ⇒ counts provably unchanged by earlier selections;
        # a+b goes into `used` so a string-colliding later pair waits)
        used: set = set()
        picked: list[tuple[str, str, int]] = []
        for a, b, n in tot.itertuples(index=False):
            if n < 2:
                break
            a, b = str(a), str(b)
            if a in used or b in used or (a + b) in used:
                continue
            picked.append((a, b, int(n)))
            used.update((a, b, a + b))
            if len(merges) + len(picked) == num_merges:
                break
        if not picked:
            break
        merges.extend(picked)
        round_pairs = [(a, b) for a, b, _ in picked]

        def rewrite(df: pd.DataFrame, pairs=round_pairs) -> pd.DataFrame:
            syms = df["syms"]
            lens = syms.str.len().to_numpy(dtype=np.int64)
            if lens.sum() == 0:
                return df
            flat = np.concatenate(
                [np.asarray(s, dtype=object) for s in syms])
            wid = np.repeat(np.arange(len(lens)), lens)
            new_lens = lens
            for la, lb in pairs:  # disjoint — order only matters for ties
                m = np.zeros(len(flat), dtype=bool)
                m[:-1] = (flat[:-1] == la) & (flat[1:] == lb) & (
                    wid[:-1] == wid[1:])
                keep = _greedy_nonoverlap(m)
                if len(keep) == 0:
                    continue
                flat[keep] = la + lb
                alive = np.ones(len(flat), dtype=bool)
                alive[keep + 1] = False
                shrink = np.bincount(wid[keep], minlength=len(new_lens))
                new_lens = new_lens - shrink
                flat, wid = flat[alive], wid[alive]
            out = df.copy()
            out["syms"] = np.split(
                flat, np.cumsum(new_lens)[:-1].tolist())
            return out

        table = table.map_batches(
            rewrite, batch_size=None, batch_format="pandas"
        ).materialize()

    return pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges],
        "n": np.array([m[2] for m in merges], dtype=np.int64),
    })


def char_entropy(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "char_entropy",
    *,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Per-document character entropy (nats) — the randomness quality
    signal that separates natural text from boilerplate/base64/padding
    spam: ``H = −Σ p(c)·ln p(c)`` over the doc's byte frequencies (byte ==
    character for ASCII corpora, matching the SQL per-char oracle; for
    multibyte text this is byte-level entropy). Empty/null docs → null.

    Pure streaming map, no shuffle: each batch reads the zero-copy UTF-8
    buffer (:func:`_byte_view`), bincounts distinct (doc, byte) keys once
    and segment-sums the −p·ln p terms back per doc — no per-row loop, no
    dense docs × 256 matrix.
    """
    def kernel(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], pa.float64()))
        data, off = _byte_view(t[text_col])
        lens = (off[1:] - off[:-1]).astype(np.int64)
        h = np.full(n, np.nan)
        total = int(off[-1] - off[0])
        if total:
            doc = np.repeat(np.arange(n, dtype=np.int64), lens)
            key = doc * 256 + data[off[0]:off[-1]].astype(np.int64)
            uk, uc = np.unique(key, return_counts=True)
            ud = uk >> 8
            p = uc.astype(np.float64) / lens[ud].astype(np.float64)
            terms = -p * np.log(p)
            acc = np.zeros(n, dtype=np.float64)
            np.add.at(acc, ud, terms)
            nz = lens > 0
            h[nz] = acc[nz]
        return t.append_column(out_col, pa.array(np.round(h, round_digits)))

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def apply_bpe(
    ds: ray.data.Dataset,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_tok_bpe",
    *,
    keep_text: bool = False,
) -> ray.data.Dataset:
    """Encode the corpus with a learned BPE merge table (the inference
    side of :func:`bpe_train`): per document, the token count after
    applying merges GPT-2-style — repeatedly merge the LOWEST-RANK pair
    present in each word (leftmost-greedy, non-overlapping) until none
    applies. ``merges`` is the ``bpe_train`` output frame or a list of
    (left, right) in rank order.

    Scale shape: the merge table broadcasts in the stage closure (KBs);
    each batch encodes only its DISTINCT words (the word-level cache every
    production tokenizer uses — per-batch vocabulary is Heaps-bounded, so
    the per-word loop is off the per-token hot path) and doc token counts
    come from one vectorized segment-sum over the exploded word stream.
    No shuffle.
    """
    if hasattr(merges, "itertuples"):
        pairs = [(str(r.left), str(r.right)) for r in merges.itertuples()]
    else:
        pairs = [(str(a), str(b)) for a, b in merges]
    ranks = {p: i for i, p in enumerate(pairs)}

    def enc_len(word: str) -> int:
        syms = list(word)
        while len(syms) > 1:
            best, r_best = None, len(ranks)
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and r < r_best:
                    r_best, best = r, (syms[i], syms[i + 1])
            if best is None:
                break
            a, b = best
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    def kernel(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        flat, offsets = _explode_words(t[text_col])
        words = pd.Series(flat.to_pandas(), copy=False)
        uniq = words.unique()
        lut = pd.Series(
            [enc_len(w) if w else 0 for w in uniq], index=uniq,
            dtype="int64",
        )
        per_word = words.map(lut).to_numpy(dtype=np.int64)
        counts = np.add.reduceat(
            np.concatenate([per_word, [0]]), np.minimum(offsets[:-1],
                                                        len(per_word)),
        )
        counts = np.where(offsets[1:] > offsets[:-1], counts, 0)
        return t.append_column(out_col, pa.array(counts.astype(np.int64)))

    cols = [id_col, text_col] if not keep_text else None
    proj = ds.select_columns(cols) if cols else ds
    return proj.map_batches(
        kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


_JSON_PATTERNS = {
    "int": r'"{key}"\s*:\s*(?P<v>-?\d+)',
    "float": r'"{key}"\s*:\s*(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)',
    "string": r'"{key}"\s*:\s*"(?P<v>(?:[^"\\]|\\.)*)"',
}


def json_extract_scalar(
    ds: ray.data.Dataset,
    json_col: str,
    key: str,
    *,
    out_col: str | None = None,
    value_type: str = "int",
    engine: str = "regex",
) -> ray.data.Dataset:
    """Extract a top-level scalar field from a JSON string column — the
    semi-structured props/payload projection every event pipeline needs
    before feature building. Missing key / null / non-matching rows → null.

    ``engine="regex"`` (default): one vectorized RE2 ``extract_regex``
    per batch — zero-copy, no per-row parse; RE2 on both sides makes the
    DuckDB ``regexp_extract`` oracle an exact mirror. String values come
    back raw (escapes NOT decoded — the documented fast-path contract).
    ``engine="python"``: ``json.loads`` per row for nested/escaped
    payloads (actor-friendly slow path; same output contract, decoded
    strings).
    """
    import json as _json
    import re as _re

    if value_type not in _JSON_PATTERNS:
        raise ValueError(f"value_type {value_type!r}")
    out = out_col or key
    # escape the key: regex metacharacters in a field name must match
    # literally, not as pattern syntax
    pat = _JSON_PATTERNS[value_type].format(key=_re.escape(key))
    arrow_t = {"int": pa.int64(), "float": pa.float64(),
               "string": pa.string()}[value_type]

    def rx(t: pa.Table) -> pa.Table:
        col = t[json_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ext = pc.extract_regex(col, pat)
        v = pc.struct_field(ext, "v")
        if value_type != "string":
            v = v.cast(arrow_t)
        return t.append_column(out, v)

    def py(t: pa.Table) -> pa.Table:
        vals = []
        for s in t[json_col].to_pylist():
            try:
                v = _json.loads(s).get(key) if s is not None else None
            except (ValueError, AttributeError):
                v = None
            # booleans are ints in Python but not in Arrow — treat as
            # missing, like the regex path; numeric types coerce the way
            # the regex path reads them (2.5 → 2 for int: leading digits
            # = truncation toward zero)
            if isinstance(v, bool):
                v = None
            elif value_type == "int":
                v = int(v) if isinstance(v, (int, float)) else None
            elif value_type == "float":
                v = float(v) if isinstance(v, (int, float)) else None
            else:
                v = v if isinstance(v, str) else None
            vals.append(v)
        return t.append_column(out, pa.array(vals, arrow_t))

    fn = rx if engine == "regex" else py
    return ds.map_batches(
        fn, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


_UNK_LP = -1e6  # unknown-character penalty: below any real logprob


def _viterbi_pieces(word: str, logp: dict, maxlen: int):
    """Best unigram-LM segmentation of ``word`` (ties → LONGEST last
    piece: candidate lengths are tried longest-first with a strict
    improvement test). Training keeps every corpus character in ``logp``
    so a segmentation always exists there; at ENCODE time a position no
    known piece reaches falls back to a single-char "unknown" piece with
    a large penalty (``_UNK_LP``) — so unknown characters can't hang the
    backtrack AND can't out-score any legitimate spanning path. Returns
    the piece list."""
    n = len(word)
    neg = float("-inf")
    best = [neg] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        lo = max(0, i - maxlen)
        for j in range(lo, i):
            if best[j] == neg:
                continue
            lp = logp.get(word[j:i])
            if lp is None:
                continue
            s = best[j] + lp
            if s > best[i]:
                best[i], back[i] = s, i - j
        if back[i] == 0:  # position unreachable: unknown-char fallback
            back[i] = 1
            best[i] = best[i - 1] + _UNK_LP
    out, i = [], n
    while i > 0:
        l = back[i]
        out.append(word[i - l:i])
        i -= l
    out.reverse()
    return out


def unigram_train(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    vocab_size: int = 100,
    seed_size: int = 1000,
    max_piece_len: int = 6,
    num_rounds: int = 4,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Unigram-LM tokenizer training (SentencePiece-style, hard-EM
    variant) — the sampling-friendly sibling of :func:`bpe_train`: learn a
    ``vocab_size`` piece vocabulary with log-probabilities by iterating
    (Viterbi segmentation of every word under the current model) →
    (re-estimate piece probabilities) → (prune lowest-count pieces on a
    geometric schedule), single characters always retained so every word
    stays segmentable. Deterministic: count ties prune lexicographically,
    Viterbi ties prefer the longer final piece.

    Scale shape (the bpe_train factorization): the corpus collapses ONCE
    to the Heaps-bounded distinct-word count table (shared vocab partial +
    one hash(word) exchange); seeding and every EM round are map_batches
    over that table with the piece table broadcast in the closure (KBs),
    emitting per-batch piece-count partials merged driver-side. Rounds
    touch vocab, never the corpus.

    Returns a driver-side DataFrame (piece:string, logprob:float64,
    n:int64) sorted by count desc, piece asc. Iterative and not
    SQL-expressible → rows-only; invariants are pytest-gated.
    """
    import math

    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def wpartial(t: pa.Table) -> pa.Table:
        return _token_count_partial(t, text_col, key_name="w", count_name="c")

    parts = ds.select_columns([text_col]).map_batches(
        wpartial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    words = bucketed_map_groups(
        add_bucket_column(parts, "w", num_buckets),
        lambda df: df.drop(columns=[BUCKET_COL])
        .groupby("w", as_index=False, sort=False)["c"].sum(),
        num_buckets=num_buckets, batch_format="pandas",
    ).map_batches(
        lambda df: df[df["w"].str.len() > 0],
        batch_size=None, batch_format="pandas",
    ).materialize()

    # seed: weighted substring counts over the word table
    def seed_partial(df: pd.DataFrame) -> pd.DataFrame:
        acc: dict = {}
        for w, c in zip(df["w"], df["c"]):
            n = len(w)
            for l in range(1, min(max_piece_len, n) + 1):
                for j in range(n - l + 1):
                    s = w[j:j + l]
                    acc[s] = acc.get(s, 0) + c
        return pd.DataFrame({"p": list(acc), "n": list(acc.values())})

    seeds = (
        words.map_batches(seed_partial, batch_size=None,
                          batch_format="pandas")
        .to_pandas().groupby("p", as_index=False)["n"].sum()
        .sort_values(["n", "p"], ascending=[False, True], kind="stable")
    )
    chars = set(seeds.loc[seeds["p"].str.len() == 1, "p"])
    top = seeds.head(seed_size)
    pieces = set(top["p"]) | chars
    counts = dict(zip(seeds["p"], seeds["n"].astype(float)))
    cur = {p: counts[p] for p in pieces}

    def em_counts(cur_logp: dict) -> pd.Series:
        def epart(df: pd.DataFrame) -> pd.DataFrame:
            acc: dict = {}
            for w, c in zip(df["w"], df["c"]):
                for p in _viterbi_pieces(w, cur_logp, max_piece_len):
                    acc[p] = acc.get(p, 0) + c
            return pd.DataFrame({"p": list(acc), "n": list(acc.values())})

        return (
            words.map_batches(epart, batch_size=None, batch_format="pandas")
            .to_pandas().groupby("p")["n"].sum()
        )

    # geometric prune schedule seed_size -> vocab_size over num_rounds
    sizes = [
        max(vocab_size, int(round(seed_size
                                  * (vocab_size / seed_size)
                                  ** ((r + 1) / num_rounds))))
        for r in range(num_rounds)
    ]
    em = None
    for target in sizes:
        tot = float(sum(cur.values()))
        logp = {p: math.log(c / tot) for p, c in cur.items() if c > 0}
        for ch in chars:  # unsegmentable-word floor
            logp.setdefault(ch, math.log(0.5 / tot))
        em = em_counts(logp)
        ranked = em.reset_index().sort_values(
            ["n", "p"], ascending=[False, True], kind="stable")
        keep = set(ranked.head(target)["p"]) | chars
        cur = {
            p: float(em.get(p, 0.0)) if em.get(p, 0.0) > 0 else 1.0
            for p in keep
        }

    tot = float(sum(cur.values()))
    out = pd.DataFrame({
        "piece": list(cur), "n": [int(v) for v in cur.values()],
    })
    out["logprob"] = np.log(np.array([cur[p] for p in out["piece"]]) / tot)
    out = out.sort_values(["n", "piece"], ascending=[False, True],
                          kind="stable").reset_index(drop=True)
    out["logprob"] = out["logprob"].round(6)
    return out[["piece", "logprob", "n"]]


def apply_unigram(
    ds: ray.data.Dataset,
    vocab: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_tok_unigram",
    *,
    max_piece_len: int = 6,
) -> ray.data.Dataset:
    """Encode the corpus with a learned unigram-LM vocabulary (the
    inference side of :func:`unigram_train`): per document, the piece
    count of the Viterbi-best segmentation of each word. Same scale shape
    as :func:`apply_bpe`: the (KB-sized) piece table broadcasts in the
    closure, each batch segments only its DISTINCT words (Heaps-bounded
    word cache), and doc counts come from one vectorized segment-sum.
    """
    logp = dict(zip(vocab["piece"], vocab["logprob"].astype(float)))

    def enc_len(word: str) -> int:
        return len(_viterbi_pieces(word, logp, max_piece_len)) if word else 0

    def kernel(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        flat, offsets = _explode_words(t[text_col])
        words = pd.Series(flat.to_pandas(), copy=False)
        uniq = words.unique()
        lut = pd.Series([enc_len(w) for w in uniq], index=uniq,
                        dtype="int64")
        per_word = words.map(lut).to_numpy(dtype=np.int64)
        counts = np.add.reduceat(
            np.concatenate([per_word, [0]]),
            np.minimum(offsets[:-1], len(per_word)),
        )
        counts = np.where(offsets[1:] > offsets[:-1], counts, 0)
        return t.append_column(out_col, pa.array(counts.astype(np.int64)))

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def cross_split_leakage(
    ds: ray.data.Dataset,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    test_label: str = "val",
    n: int = 3,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Train/test contamination audit: for every TEST document, the number
    of its DISTINCT word n-grams that also occur in ANY train document —
    the split-leakage check run before training on a freshly split corpus.
    Unlike :func:`decontaminate` (benchmark side broadcast), BOTH sides
    here are corpus-scale, so the overlap is computed by partitioning on
    the gram itself. Output: ``(key, leak_ngrams)`` for leaked test docs
    only (``leak_ngrams ≥ 1``). Null keys/texts drop.

    Scale shape: per batch, distinct ``(gram, key, is_test)`` triples
    (the tf_idf posting volume); ONE hash(gram) exchange — a gram's train
    presence and its test owners co-locate, so each bucket emits disjoint
    per-key distinct-gram counts; a second tiny hash(key) exchange sums
    the partials. No side is ever broadcast or materialized whole.
    """
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    def emit(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        keep = pc_.and_(pc_.is_valid(t[key_col]), pc_.is_valid(t[text_col]))
        t = t.filter(keep)
        grams, didx = ngram_strings(t[text_col], n)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        is_test = pc_.equal(
            t[split_col], test_label).to_numpy(zero_copy_only=False)
        d = pd.DataFrame({
            "_gram": grams,
            key_col: keys[didx],
            "_is_test": is_test[didx],
        }).drop_duplicates(["_gram", key_col])
        return pa.Table.from_pandas(d, preserve_index=False)

    posts = ds.select_columns([key_col, text_col, split_col]).map_batches(
        emit, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    posts = add_bucket_column(posts, "_gram", num_buckets)

    def per_gram(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).drop_duplicates(
            ["_gram", key_col])
        train_grams = df.loc[~df["_is_test"], "_gram"].unique()
        hits = df[df["_is_test"]
                  & df["_gram"].isin(pd.Index(train_grams))]
        out = hits.groupby(key_col, sort=False).size().rename("_c")
        return out.reset_index()

    partials = bucketed_map_groups(
        posts, per_gram, num_buckets=num_buckets, batch_format="pandas"
    )
    partials = add_bucket_column(partials, key_col, num_buckets)

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, sort=False)["_c"].sum()
        return pd.DataFrame({
            key_col: g.index.to_numpy(),
            "leak_ngrams": g.to_numpy().astype(np.int64),
        })

    return bucketed_map_groups(
        partials, per_key, num_buckets=num_buckets, batch_format="pandas"
    )


def readability(
    ds: ray.data.Dataset,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Flesch reading ease + Flesch-Kincaid grade per document — the
    classic readability pair next to the length/stopword quality_score
    family. Heuristic counts, mirrored literally by the oracle:
    words = space-split tokens (empty tokens count, like SQL
    ``string_split``), sentences = ``[.!?]+`` runs clamped to ≥ 1,
    syllables = ``[aeiouy]+`` vowel runs of the lowercased text.
    Null-text rows drop on both sides.

    Narrow map, zero shuffle: three Arrow regex/count kernels per batch
    (compiled in C, no Python row loop).
    """

    def kernel(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        txt = t[text_col]
        n_words = pc.add(pc.count_substring(txt, " "), 1)
        n_sent = pc.max_element_wise(
            pc.count_substring_regex(txt, "[.!?]+"), 1)
        n_syll = pc.count_substring_regex(
            pc.utf8_lower(txt), "[aeiouy]+")
        w = n_words.to_numpy(zero_copy_only=False).astype(np.float64)
        s = n_sent.to_numpy(zero_copy_only=False).astype(np.float64)
        y = n_syll.to_numpy(zero_copy_only=False).astype(np.float64)
        a = w / s
        b = y / w
        flesch = np.round(206.835 - 1.015 * a - 84.6 * b, round_digits)
        grade = np.round(0.39 * a + 11.8 * b - 15.59, round_digits)
        return pa.table({
            key_col: t[key_col],
            "n_words": pc.cast(n_words, pa.int64()),
            "n_sentences": pc.cast(n_sent, pa.int64()),
            "n_syllables": pc.cast(n_syll, pa.int64()),
            "flesch": pa.array(flesch),
            "fk_grade": pa.array(grade),
        })

    return ds.select_columns([key_col, text_col]).map_batches(
        kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def zipf_fit(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    top_n: int = 500,
    num_buckets: int = 32,
    round_digits: int = 6,
) -> ray.data.Dataset:
    """Zipf-law audit of the corpus vocabulary: OLS fit of ``ln(freq)``
    on ``ln(rank)`` over the top ``top_n`` tokens — slope ≈ −1 is the
    healthy-natural-text signature; a flat slope flags boilerplate /
    template floods, a cliff flags truncated vocab. Output one row:
    ``(n_terms, slope, intercept, r2)``.

    Scale shape: the frequency table comes from :func:`vocab_count`'s
    exact bucketed top-N (per-batch partials, one token exchange); the
    regression runs on K ≤ top_n points driver-side. Tied counts make the
    fit order-independent (y depends only on the count; x is the rank
    index), so no tie contract is needed beyond K itself.
    """
    top = vocab_count(
        ds, text_col, top_n=top_n, num_buckets=num_buckets
    ).to_pandas()
    top = top.sort_values(["n", "token"], ascending=[False, True],
                          kind="stable")
    k = len(top)
    x = np.log(np.arange(1, k + 1, dtype=np.float64))
    y = np.log(top["n"].to_numpy(dtype=np.float64))
    n = float(k)
    sx, sy = x.sum(), y.sum()
    sxx, sxy, syy = (x * x).sum(), (x * y).sum(), (y * y).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy))
    return ray.data.from_arrow(pa.table({
        "n_terms": pa.array([np.int64(k)]),
        "slope": pa.array([round(float(slope), round_digits)]),
        "intercept": pa.array([round(float(intercept), round_digits)]),
        "r2": pa.array([round(float(r2), round_digits)]),
    }))


def mlm_mask(
    ds: ray.data.Dataset,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    rate: float = 0.15,
    mask_token: str = "[MASK]",
) -> ray.data.Dataset:
    """Deterministic MLM-style corpus masking — the masked-language-model
    data-prep pass: each whitespace token is replaced by ``mask_token``
    iff a multiplicative hash of ``(doc_id, 1-based position)`` falls
    under ``rate`` — reproducible across engines, runs and partitionings
    (the hash_split convention), and SQL-expressible so the op is fully
    oracled. Output: (key, masked_text, n_masked). Null key/text rows
    drop.

    Zero shuffle, fully vectorized: one ``split_pattern`` explode, one
    uint64 hash over the flat token index, one ``binary_join`` rebuild —
    no Python loop touches tokens (int64 list offsets, so an amplifying
    batch cannot overflow int32).
    """
    cut = np.uint64(int(rate * (1 << 32)))
    m32 = np.uint64(1 << 32)
    mult = np.uint64(2654435761)
    pmix = np.uint64(1000003)

    def kernel(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[text_col]))
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.table({
                key_col: t[key_col],
                "masked_text": pa.array([], pa.string()),
                "n_masked": pa.array([], pa.int64()),
            })
        flat, offsets = _explode_words(t[text_col])
        counts = offsets[1:] - offsets[:-1]
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        doc_idx = np.repeat(np.arange(t.num_rows), counts)
        pos = (np.arange(len(flat), dtype=np.int64)
               - np.repeat(offsets[:-1], counts) + 1).astype(np.uint64)
        h = ((keys[doc_idx] * pmix + pos) % m32) * mult % m32
        mask = h < cut
        words = flat.to_numpy(zero_copy_only=False)
        masked = np.where(mask, mask_token, words)
        lists = pa.LargeListArray.from_arrays(
            offsets, pa.array(masked, pa.string()))
        joined = pc.binary_join(lists, " ")
        n_masked = np.bincount(doc_idx, weights=mask,
                               minlength=t.num_rows).astype(np.int64)
        return pa.table({
            key_col: t[key_col],
            "masked_text": joined,
            "n_masked": pa.array(n_masked),
        })

    return ds.select_columns([key_col, text_col]).map_batches(
        kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def feature_hashing(
    ds: ray.data.Dataset,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 64,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Hashing-trick bag-of-words featurizer: each token folds into one of
    ``num_features`` signed buckets and a document becomes sparse
    ``(doc_id, bucket, val)`` rows — the fixed-width, vocabulary-free*
    text vectorizer (Weinberger et al.). Bucket and sign derive from a
    multiplicative hash of the token's frequency-ranked vocabulary id
    (the :func:`vocab_encode` assignment), which keeps the map
    deterministic AND SQL-expressible; (*) at 100 TB swap the id hash for
    ``stable_hash(token)`` to drop the vocabulary pass — same plan, same
    output shape, no exchange. A (doc, bucket) pair with ≥ 1 token
    emits a row even when signs cancel to 0, matching SQL GROUP BY.

    Scale shape: vocabulary totals via the shared token-count partials
    (one token exchange, vocabulary-bounded); the id map broadcasts in
    the encode closure; the featurize pass is a streaming per-batch
    flat-token bincount — output rows ≤ docs × num_features.
    """
    def partial(t: pa.Table) -> pa.Table:
        return _token_count_partial(t, text_col)

    sel = ds.select_columns([doc_id_col, text_col])
    parts = sel.select_columns([text_col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    totals = parts.groupby("token")["n"].sum().reset_index()
    totals = totals.sort_values(
        ["n", "token"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)
    id_map = pd.Series(
        np.arange(len(totals), dtype=np.int64), index=totals["token"]
    )
    m32 = np.uint64(1 << 32)
    mult = np.uint64(2654435761)
    half = np.uint64(1 << 31)

    def featurize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            doc_id_col: pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int64()),
            "val": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        flat, offsets = _explode_words(t[text_col])
        if len(flat) == 0:
            return empty
        lens = np.diff(offsets)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        tid = id_map.reindex(
            flat.to_pandas()).to_numpy(dtype=np.int64).astype(np.uint64)
        h = (tid % m32) * mult % m32
        bucket = (h % np.uint64(num_features)).astype(np.int64)
        sign = np.where(h < half, 1, -1).astype(np.int64)
        key = doc_idx * num_features + bucket
        size = t.num_rows * num_features
        vals = np.bincount(key, weights=sign, minlength=size)
        present = np.bincount(key, minlength=size) > 0
        idx = np.flatnonzero(present)
        docs = t[doc_id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            doc_id_col: pa.array(docs[idx // num_features]),
            "bucket": pa.array((idx % num_features).astype(np.int64)),
            "val": pa.array(vals[idx].astype(np.int64)),
        })

    return sel.map_batches(
        featurize, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )


def regex_extract(
    ds: ray.data.Dataset,
    text_col: str,
    pattern: str,
    *,
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Structured field extraction — :func:`redact`'s parsing sibling:
    pull every NAMED group of an RE2 ``pattern`` out of ``text_col`` as
    its own string column (``(?P<name>...)`` groups), NULL for
    non-matching rows (mirrored in SQL as ``CASE WHEN regexp_matches
    THEN regexp_extract END`` — DuckDB's bare ``regexp_extract``
    returns '' on a miss, which is NOT the same thing). Both engines run
    RE2, so match semantics agree exactly.

    Narrow map, zero shuffle: one Arrow ``extract_regex`` C kernel per
    batch — never a Python row loop.
    """
    keep_cols = list(keep_cols) if keep_cols else []

    def kernel(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t[text_col], pattern)
        cols = {c: t[c] for c in keep_cols}
        st = ex.combine_chunks() if isinstance(ex, pa.ChunkedArray) else ex
        for f in st.type:
            field_vals = st.field(f.name)
            # a non-matching row yields a null STRUCT; propagate it into
            # each child column (struct children keep their own validity)
            if st.null_count:
                field_vals = pc.if_else(pc.is_valid(st), field_vals,
                                        pa.nulls(len(st), pa.string()))
            cols[f.name] = field_vals
        return pa.table(cols)

    return ds.select_columns(
        list(dict.fromkeys(keep_cols + [text_col]))
    ).map_batches(
        kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def keyword_extract(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    stopwords: tuple = ("the", "a", "of", "and", "to", "in", "is", "it"),
    max_phrase_len: int = 4,
    top_n: int = 100,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """RAKE keyword extraction (Rose et al. 2010) — corpus-level key
    phrases for tagging / dedup-blocking / topic labeling: candidate
    phrases are maximal stopword-free token runs (single-space
    tokenization; '' counts as a stopword) of length <=
    ``max_phrase_len`` (longer runs are DISCARDED entirely — the
    standard cap — contributing nothing to word stats either); per word
    over kept phrase members, ``freq`` = occurrences, ``deg`` = sum of
    containing-phrase lengths (self included — documented variant),
    ``wscore = deg / freq``; a phrase occurrence scores the sum of its
    member wscores and identical phrase texts aggregate (n =
    occurrences, score = max over the float-identical occurrence sums).
    Output: top ``top_n`` rows (phrase, words, n, score) by
    (6dp-rounded score DESC, phrase ASC) — the deterministic-cut
    convention.

    Scale shape: per-batch token/island construction is vectorized
    (pandas C-level split + run-length islands; a doc never spans
    blocks, so (doc, island) identifies an occurrence globally); word
    stats take ONE hash(word) exchange of (word, freq, deg) partials;
    scoring takes one tagged-union hash(word) exchange (sentinel
    fills, never null pads) and one hash(phrase) exchange whose kernel
    emits only its bucket's top ``top_n`` — the driver merges at most
    buckets x ``top_n`` rows.
    """
    from featherstore_ray.exchange import bucketed_map_groups
    from featherstore_ray.partition import BUCKET_COL, add_bucket_column

    stops = set(stopwords) | {""}
    cap = int(max_phrase_len)

    _EMPTY = {
        "_d": pd.Series(dtype="int64"),
        "_g": pd.Series(dtype="int64"),
        "_w": pd.Series(dtype="object"),
        "_ph": pd.Series(dtype="object"),
        "_L": pd.Series(dtype="int64"),
    }

    def members(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[id_col, text_col]).reset_index(drop=True)
        if df.empty:
            return pd.DataFrame(_EMPTY)
        toks = df[text_col].str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        doc = np.repeat(df[id_col].to_numpy(np.int64), lens)
        w = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks.to_numpy()])
        pos = np.arange(len(w), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        nonstop = ~pd.Series(w, dtype=object).isin(stops).to_numpy()
        doc, pos, w = doc[nonstop], pos[nonstop], w[nonstop]
        if len(w) == 0:
            return pd.DataFrame(_EMPTY)
        new = np.ones(len(w), dtype=bool)
        new[1:] = (doc[1:] != doc[:-1]) | (pos[1:] != pos[:-1] + 1)
        occ = np.cumsum(new) - 1
        L = np.bincount(occ)
        keep = (L <= cap)[occ]
        doc, w, occ = doc[keep], w[keep], occ[keep]
        if len(w) == 0:
            return pd.DataFrame(_EMPTY)
        newk = np.ones(len(occ), dtype=bool)
        newk[1:] = occ[1:] != occ[:-1]
        occk = np.cumsum(newk) - 1
        st = np.flatnonzero(newk)
        posk = np.arange(len(occ), dtype=np.int64) - np.repeat(
            st, np.diff(np.append(st, len(occ))))
        n_occ = occk[-1] + 1
        pw = np.full((n_occ, cap), "", dtype=object)
        pw[occk, posk] = w
        phrase = pw[:, 0]
        for j in range(1, cap):
            nxt = pw[:, j]
            phrase = np.where(nxt == "", phrase, phrase + " " + nxt)
        lk = np.bincount(occk)
        return pd.DataFrame({
            "_d": doc,
            "_g": occ,
            "_w": w,
            "_ph": phrase[occk],
            "_L": lk[occk],
        })

    mem = ds.select_columns([id_col, text_col]).map_batches(
        members, batch_size=None, batch_format="pandas").materialize()

    def wpartial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_w", sort=False)["_L"].agg(["size", "sum"])
        return pd.DataFrame({
            "_w": g.index.to_numpy(dtype=object),
            "_f": g["size"].to_numpy(np.int64),
            "_deg": g["sum"].to_numpy(np.int64),
        })

    def wscore(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        g = df.groupby("_w", sort=True)[["_f", "_deg"]].sum()
        return pd.DataFrame({
            "_w": g.index.to_numpy(dtype=object),
            "_wsc": g["_deg"].to_numpy(np.float64)
            / g["_f"].to_numpy(np.float64),
        })

    scores = bucketed_map_groups(
        add_bucket_column(
            mem.map_batches(wpartial, batch_size=None,
                            batch_format="pandas"),
            "_w", num_buckets),
        wscore, num_buckets=num_buckets, batch_format="pandas",
    )

    # tagged union on word: annotate member rows with their wscore
    def tag_mem(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "_w": df["_w"].to_numpy(dtype=object),
            "_d": df["_d"].to_numpy(np.int64),
            "_g": df["_g"].to_numpy(np.int64),
            "_ph": df["_ph"].to_numpy(dtype=object),
            "_wsc": np.zeros(len(df)),
            "_kind": np.zeros(len(df), np.int64),
        })

    def tag_score(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "_w": df["_w"].to_numpy(dtype=object),
            "_d": np.full(len(df), -1, np.int64),
            "_g": np.full(len(df), -1, np.int64),
            "_ph": np.full(len(df), "", dtype=object),
            "_wsc": df["_wsc"].to_numpy(np.float64),
            "_kind": np.ones(len(df), np.int64),
        })

    tagged = mem.map_batches(
        tag_mem, batch_size=None, batch_format="pandas").union(
        scores.map_batches(tag_score, batch_size=None,
                           batch_format="pandas"))

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        sc = df[df["_kind"] == 1].set_index("_w")["_wsc"]
        m = df[df["_kind"] == 0]
        if m.empty:
            return pd.DataFrame({
                "_ph": pd.Series(dtype="object"),
                "_d": pd.Series(dtype="int64"),
                "_g": pd.Series(dtype="int64"),
                "_wsc": pd.Series(dtype="float64"),
            })
        return pd.DataFrame({
            "_ph": m["_ph"].to_numpy(dtype=object),
            "_d": m["_d"].to_numpy(np.int64),
            "_g": m["_g"].to_numpy(np.int64),
            "_wsc": m["_w"].map(sc).to_numpy(np.float64),
        })

    annotated = bucketed_map_groups(
        add_bucket_column(tagged, "_w", num_buckets),
        annotate, num_buckets=num_buckets, batch_format="pandas",
    )

    def per_phrase(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if df.empty:
            return pd.DataFrame({
                "phrase": pd.Series(dtype="object"),
                "words": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "score": pd.Series(dtype="float64"),
            })
        occ = (df.groupby(["_ph", "_d", "_g"], sort=True)["_wsc"]
               .agg(["sum", "size"]).reset_index())
        g = occ.groupby("_ph", sort=True).agg(
            words=("size", "max"), n=("sum", "size"),
            score=("sum", "max"))
        out = pd.DataFrame({
            "phrase": g.index.to_numpy(dtype=object),
            "words": g["words"].to_numpy(np.int64),
            "n": g["n"].to_numpy(np.int64),
            "score": np.round(g["score"].to_numpy(np.float64),
                              round_digits),
        })
        out = out.sort_values(["score", "phrase"],
                              ascending=[False, True]).head(top_n)
        return out.reset_index(drop=True)

    parts = bucketed_map_groups(
        add_bucket_column(annotated, "_ph", num_buckets),
        per_phrase, num_buckets=num_buckets, batch_format="pandas",
    ).to_pandas()
    if parts.empty:
        parts = pd.DataFrame({
            "phrase": pd.Series(dtype="object"),
            "words": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        })
    out = (parts.sort_values(["score", "phrase"],
                             ascending=[False, True])
           .head(top_n).reset_index(drop=True))
    return ray.data.from_arrow(pa.table({
        "phrase": pa.array(out["phrase"].astype(str), pa.string()),
        "words": pa.array(out["words"].to_numpy(np.int64), pa.int64()),
        "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
        "score": pa.array(out["score"].to_numpy(np.float64),
                          pa.float64()),
    }))
