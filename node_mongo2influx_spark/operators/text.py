"""Text analysis operators (SURVEY.md §2.12): quality scoring, token
counting, language ID, document fingerprinting.

All pure Column expressions — these run per document over the full corpus,
so they must stay inside whole-stage codegen. The DuckDB oracle SQL for each
is generated from the same constants (stopword sets, regexes) to keep both
sides in lock-step; see plans/llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from node_mongo2influx_spark.functions.fold import ascii_lower, ascii_lower_py

#: Stopword markers per language for the lang-ID heuristic. Order matters:
#: ties break toward the earlier language.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "is", "in", "it", "a"),
    "es": ("el", "la", "de", "que", "y", "los", "una"),
    "fr": ("le", "les", "des", "et", "une", "est", "dans"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
}

#: Stopwords for the quality scorer's stopword-ratio feature.
QUALITY_STOPWORDS: tuple[str, ...] = ("the", "a", "of", "to", "and", "in", "is", "it")

#: BPE-ish tokenizer: alpha runs, digit runs, or single non-space symbols.
BPE_ISH_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _spread_heavy_scan(df: DataFrame) -> DataFrame:
    """Give a HEAVY per-row Column chain the cluster's parallelism.

    A zero-shuffle chain inherits the SCAN's split count, and a bench/
    test-sized corpus arrives as ONE parquet split — the whole chain
    (BPE replace chain, char-entropy fold, pair explodes) then runs on a
    single core while 31 idle (r11 optimization round; the mapInPandas
    twin of this lesson is round 5's `ensure_min_partitions` on the
    minhash kernel). Scale-adaptive by construction: at real scale the
    scan already has hundreds of splits and this is a no-op; the target
    is defaultParallelism, never a constant. Only operators whose
    per-row work dwarfs a ~600 KB row exchange call this — spreading a
    LIGHT chain was the round-7 1.22× regression (knn_cosine_pq).
    """
    from node_mongo2influx_spark.functions.skew import ensure_min_partitions

    return ensure_min_partitions(
        df, df.sparkSession.sparkContext.defaultParallelism
    )


def _words(text_col: str) -> str:
    return f"split(translate({text_col}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')"


def _marker_count(text_col: str, markers: tuple[str, ...]) -> Column:
    lst = ", ".join(f"'{m}'" for m in markers)
    return F.expr(f"size(filter({_words(text_col)}, w -> w IN ({lst})))")


def _quality_features(text_col: str) -> dict[str, Column]:
    """The shared quality feature expressions (single definition — both
    quality() and quality_filter() and their oracles depend on these)."""
    n_chars = F.length(text_col)
    n_tokens = F.size(F.split(F.col(text_col), " "))
    alpha_only = F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")
    return {
        "n_chars_m": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": n_chars.cast("double") / n_tokens,
        "non_alpha_ratio": (n_chars - F.length(alpha_only)).cast("double") / n_chars,
        "stopword_ratio": _marker_count(text_col, QUALITY_STOPWORDS).cast("double")
        / n_tokens,
    }


def quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: char/token counts, average token
    length, non-alpha ratio, stopword ratio."""
    f = _quality_features(text_col)
    return df.where(f["n_chars_m"] > 0).select(
        F.col(id_col),
        f["n_chars_m"].alias("n_chars_m"),
        f["n_tokens"].alias("n_tokens"),
        F.round(f["avg_token_len"], 4).alias("avg_token_len"),
        F.round(f["non_alpha_ratio"], 4).alias("non_alpha_ratio"),
        F.round(f["stopword_ratio"], 4).alias("stopword_ratio"),
    )


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
        # Pattern passed as a Column literal: embedding it in an expr()
        # string would put \s through SQL string-escape processing.
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_REGEX), 0)
        ).alias("bpe_ish_tokens"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-stopword language ID: score each language by marker hits,
    argmax with fixed preference order, 'unknown' when nothing matches.

    Returns (id, label, predicted, <lang>_score...). ``label`` is the
    fixture's ground-truth column when present.
    """
    scores = {
        f"{lang}_score": _marker_count(text_col, markers)
        for lang, markers in LANG_MARKERS.items()
    }
    out = df.withColumns(scores)
    langs = list(LANG_MARKERS)
    all_scores = [F.col(f"{lang}_score") for lang in langs]
    pred: Column = F.lit("unknown")
    # Built back-to-front so earlier languages win ties.
    for i in reversed(range(len(langs))):
        later = [F.col(f"{lang}_score") for lang in langs[i + 1:]]
        cond = F.col(f"{langs[i]}_score") >= (
            F.greatest(*later) if len(later) > 1 else (later[0] if later else F.lit(0))
        )
        pred = F.when(cond, F.lit(langs[i])).otherwise(pred)
    pred = F.when(F.greatest(*all_scores) <= 0, F.lit("unknown")).otherwise(pred)
    cols = [F.col(id_col)]
    if "lang" in df.columns:
        cols.append(F.col("lang").alias("label"))
    cols.append(pred.alias("predicted"))
    cols.extend(F.col(f"{lang}_score") for lang in langs)
    return out.select(*cols)


def lang_id_oracle_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB SQL equivalent of :func:`lang_id`, generated from the same
    LANG_MARKERS so the two can never drift."""
    langs = list(LANG_MARKERS)
    score_exprs = ",\n               ".join(
        f"len(list_filter(string_split(translate({text_col}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), "
        f"w -> w IN ({', '.join(repr(m) for m in LANG_MARKERS[lang])}))) AS {lang}_score"
        for lang in langs
    )
    # Same back-to-front tie-break as the Spark side.
    case = "'unknown'"
    for i in reversed(range(len(langs))):
        later = [f"{lang}_score" for lang in langs[i + 1:]]
        if len(later) > 1:
            cond = f"{langs[i]}_score >= greatest({', '.join(later)})"
        elif later:
            cond = f"{langs[i]}_score >= {later[0]}"
        else:
            cond = f"{langs[i]}_score >= 0"
        case = f"CASE WHEN {cond} THEN '{langs[i]}' ELSE {case} END"
    greatest_all = f"greatest({', '.join(f'{lang}_score' for lang in langs)})"
    return f"""
        SELECT {id_col}, lang AS label,
               CASE WHEN {greatest_all} <= 0 THEN 'unknown' ELSE {case} END AS predicted,
               {', '.join(f'{lang}_score' for lang in langs)}
        FROM (
            SELECT {id_col}, lang,
               {score_exprs}
            FROM {table}
        ) t
    """


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_non_alpha: float = 0.3,
    min_stopword: float = 0.01,
) -> DataFrame:
    """Composed corpus quality gate: keep rows passing token-count bounds,
    non-alpha ceiling, stopword floor. Returns the input columns plus the
    computed features (so downstream stages can re-threshold without
    recomputing). All Column expressions — the filter runs scan-side."""
    f = _quality_features(text_col)
    return (
        df.where(f["n_chars_m"] > 0)
        .withColumns(
            {
                "n_tokens": f["n_tokens"],
                "non_alpha_ratio": f["non_alpha_ratio"],
                "stopword_ratio": f["stopword_ratio"],
            }
        )
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("non_alpha_ratio") < max_non_alpha)
            & (F.col("stopword_ratio") > min_stopword)
        )
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf: one shuffle on (doc, term); df: one shuffle on term. The tf⋈df
    join is deliberately UNHINTED: the vocabulary of a web-scale corpus is
    unbounded (URLs, typos, numbers — billions of distinct tokens at
    100 TB), so a broadcast hint would force an OOM-sized broadcast. Both
    sides are already partitioned on ``w`` from their aggregates, so the
    join needs no extra shuffle; AQE still converts it to broadcast while
    the vocabulary is actually small. idf smoothed as ln((1+N)/(1+df)).
    Deterministic tie-break on the term string. Returns
    (id, term, tfidf, rank).

    Fully lazy: N (the corpus size) is a 1-row aggregate cross-joined onto
    the scored terms — Spark broadcasts it (BroadcastNestedLoopJoin over a
    single row), so building the operator triggers no job and composing it
    never re-scans the corpus for a driver-side count.
    """
    from pyspark.sql import Window

    tokens = df.select(
        F.col(id_col),
        F.explode(F.split(ascii_lower(F.col(text_col)), " ")).alias("w"),
    ).where(F.col("w") != "")
    # NOT persisted (measured r11): the explode does run once per branch
    # here too, but tf is corpus-TOKEN-sized — materializing (doc, w, tf)
    # into the cache cost 1.25× vs recomputing the cheap explode. Persist
    # pays off only for the vocabulary-sized aggregates (cooccurrence_pmi,
    # bigram_lm_scores, word_subsample_weights), not token-level tables.
    tf = tokens.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count_distinct(id_col).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf_raw",
            F.col("tf") * F.log((1.0 + F.col("__n_docs")) / (1.0 + F.col("df"))),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf_raw").desc(), F.col("w"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("w").alias("term"),
            F.round("tfidf_raw", 6).alias("tfidf"),
            F.col("rank"),
        )
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace-normalized md5 content fingerprint + leading-2-byte shard
    bucket (the dedup partition key at scale)."""
    normalized = ascii_lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    fp = F.md5(normalized.cast("binary"))
    return df.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        F.substring(fp, 1, 4).alias("shard_bucket"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization — the dedup key for web-crawl corpora. Pure
# regexp_replace chain (RE2-compatible patterns, so the same rules run in
# DuckDB for the oracle): scheme dropped, host lowercased, leading www.
# stripped, query string / fragment dropped, trailing slash trimmed.
# ---------------------------------------------------------------------------

def canonical_url(url: Column) -> Column:
    """Canonical form of a URL for exact dedup. Column-only — runs inside
    whole-stage codegen, the right shape for a per-row map at 100 TB."""
    u = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")  # scheme
    u = F.regexp_replace(u, r"[?#].*$", "")                         # query/frag
    host = ascii_lower(F.regexp_extract(u, r"^([^/]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(u, r"^[^/]*(/.*)?$", 1)
    path = F.regexp_replace(path, r"/+$", "")
    return F.concat(host, path)


def canonical_url_duckdb_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` (same regexes, same order)."""
    u = f"regexp_replace({expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    u = f"regexp_replace({u}, '[?#].*$', '')"
    host = f"regexp_replace(translate(regexp_extract({u}, '^([^/]*)', 1), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '^www\\.', '')"
    path = f"regexp_replace(regexp_extract({u}, '^[^/]*(/.*)?$', 1), '/+$', '')"
    return f"({host} || {path})"


def url_domain(url: Column) -> Column:
    """Registrable-ish domain: last two labels of the canonical host.
    (A real pipeline uses the public-suffix list; two labels is the
    deterministic, dependency-free stand-in and is exact for .com-style
    hosts, which the synthesized fixture URLs are.)"""
    host = F.regexp_extract(canonical_url(url), r"^([^/]*)", 1)
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def cooccurrence_pairs(
    df: DataFrame,
    text_col: str = "text",
    max_dist: int = 2,
    k: int = 50,
) -> DataFrame:
    """Corpus-wide word co-occurrence counts (skip-gram window): every
    unordered word pair within ``max_dist`` positions, counted across the
    corpus, top-``k``. The classic co-occurrence-matrix build behind
    GloVe-style embeddings and collocation mining.

    Pair generation is a per-row JVM expression with NO positional
    lookups: for each distance d the word array is zipped against its
    own d-shifted slice (``arrays_zip(slice(ws,1,n-d), slice(ws,d+1,
    n-d))``), so codegen walks two arrays in lockstep instead of calling
    element_at per index (measured 15× faster at sf0.1 — 0.6 s vs 9.4 s;
    per-index lambdas re-evaluate the subscript machinery per element).
    The only shuffle is the pair-count aggregation (map-side combined,
    keyed on ONE concatenated pair string, split back after the top-k);
    the top-k is TakeOrderedAndProject. Pairs are canonicalized
    (least, greatest) so 'a b' and 'b a' count together. Ordering by the
    joined key equals ordering by (w1, w2): the separator sorts below
    every word character.
    """
    df = _spread_heavy_scan(df)
    ws = F.split(ascii_lower(F.col(text_col)), " ")
    n = F.size(ws)

    def pairs_at(d: int):
        ln = F.greatest(n - d, F.lit(0))
        z = F.arrays_zip(F.slice(ws, 1, ln), F.slice(ws, d + 1, ln))
        return F.transform(
            z,
            lambda s: F.concat_ws(
                " ", F.least(s["0"], s["1"]), F.greatest(s["0"], s["1"])
            ),
        )
    pairs = F.concat(*[pairs_at(d) for d in range(1, max_dist + 1)])
    top = (
        df.select(F.explode(pairs).alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pk")
        .limit(k)
    )
    return top.select(
        F.split_part("pk", F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part("pk", F.lit(" "), F.lit(2)).alias("w2"),
        "n",
    ).orderBy(F.col("n").desc(), "w1", "w2")


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) — the
    cheap gibberish/compression-quality signal (very low entropy =
    repeated filler, very high = random bytes or encoded junk).

    ZERO-shuffle formulation (same pattern as the repetition-ratio
    fold): sort the characters in-row, fold over runs accumulating
    Σ count·log2(count), finish with log2(n) − Σ/n. Nothing explodes,
    nothing aggregates across rows — the whole operator is one
    whole-stage-codegen map over the corpus. Empty documents are
    excluded (entropy undefined).
    """
    df = _spread_heavy_scan(df)
    cs = F.array_sort(F.split(F.col(text_col), ""))
    n = F.size(cs)
    # Run-length spelling (r11 optimization round): the old per-CHAR fold
    # allocated a (prev, run, s) struct accumulator and branched per
    # element — interpreted HOF cost O(n) heavy steps. Here the per-char
    # work is one string comparison (run-END markers via the shifted-
    # slice zip; the final element's NULL partner coalesces to true), and
    # the expensive log2 fold runs over the ~|alphabet| run-length array
    # instead of every character. Summation ORDER is unchanged — run
    # contributions still accumulate in sorted-char order — so the result
    # is bit-identical (asserted row-for-row at sf0.1 before the swap).
    nxt = F.slice(cs, 2, F.greatest(n - 1, F.lit(0)))
    marker = F.zip_with(cs, nxt, lambda a, b: F.coalesce(a != b, F.lit(True)))
    zipped = F.arrays_zip(marker, F.sequence(F.lit(1), n))
    ends = F.transform(F.filter(zipped, lambda s: s["0"]), lambda s: s["1"])
    prev = F.concat(F.array(F.lit(0)), F.slice(ends, 1, F.size(ends) - 1))
    runs = F.zip_with(ends, prev, lambda e, p: e - p)
    fold = F.aggregate(
        runs,
        F.lit(0.0),
        lambda acc, r: acc + r.cast("double") * F.log2(r.cast("double")),
    )
    return df.where(F.length(text_col) > 0).select(
        F.col(id_col),
        F.round(
            F.log2(n.cast("double")) - fold / n.cast("double"), 6
        ).alias("char_entropy"),
    )


#: PII patterns: (tag, regex, replacement). Bodies are written in the
#: common subset of Java regex (Spark) and RE2 (DuckDB) — character
#: classes, +/{n} quantifiers, no backrefs — so both engines match
#: identically. The email pattern additionally carries a NEGATIVE
#: LOOKBEHIND on the Spark side only: Java's backtracking find() retries
#: `[a-z0-9]+@` at EVERY position of an alnum run, rescanning the run
#: each time — O(len²), wedged on a 2 M-char token (longdoc sweep,
#: round 9). The lookbehind rejects mid-run start positions in O(1), so
#: only run STARTS attempt the scan (linear), and the match set is
#: IDENTICAL: a mid-run attempt can only succeed where the run-start
#: attempt already matched through that span. RE2 (the DuckDB oracle)
#: has no lookbehind and no backtracking — it keeps the plain body and
#: is linear by construction.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"(?<![a-z0-9])[a-z0-9]+@[a-z]+\.[a-z]+", "<EMAIL>"),
    ("phone", r"\+1-555-[0-9]{4}", "<PHONE>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
    keep_text: bool = False,
) -> DataFrame:
    """Detect-and-redact PII spans: per-pattern match counts plus the
    redacted text's fingerprint (``keep_text=True`` adds the redacted
    text itself for pipelines that write it onward). Pure Column regex
    work (regexp_count / regexp_replace — JVM codegen, corpus-parallel,
    no Python); patterns apply in order, each over the previous
    pattern's output.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(rx)).alias(f"n_{tag}")
        for tag, rx, _ in patterns
    ]
    red = F.col(text_col)
    for _, rx, repl in patterns:
        red = F.regexp_replace(red, rx, repl)
    cols = [F.col(id_col), *counts, F.md5(red).alias("redacted_md5")]
    if keep_text:
        cols.append(red.alias("redacted_text"))
    return df.select(*cols)


def bigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document bigram language-model score against the corpus's own
    statistics — the CCNet/KenLM-style perplexity quality filter (very
    high perplexity = gibberish/OCR junk, very low = boilerplate), with
    the external LM replaced by the corpus's self-trained add-one bigram
    model so the whole thing is closed-form and oracle-checkable.

    P(w_i | w_{i-1}) = (C(w_{i-1} w_i) + 1) / (C(w_{i-1}) + V), bits/word
    = -avg log2 P over the document's bigrams, perplexity = 2^bits.

    Scale shape: two corpus-wide count aggregations (bigrams, unigrams —
    both map-side combined), V as a 1-row global aggregate broadcast to
    the scoring join, then each document's bigrams join their counts and
    reduce per doc. All joins key on the n-gram text; at 100 TB key them
    on xxhash64 (8-byte exchange) exactly as the contamination audit
    does. Documents with fewer than 2 words have no bigrams and drop out
    (a one-word doc has no LM evidence either way).
    """
    staged = df.select(
        F.col(id_col), F.split(ascii_lower(F.col(text_col)), " ").alias("__w")
    )
    ln = F.greatest(F.size("__w") - 1, F.lit(0))
    z = F.arrays_zip(F.slice("__w", 1, ln), F.slice("__w", 2, ln))
    bg = staged.select(
        F.col(id_col),
        F.explode(
            F.transform(
                z, lambda s: F.struct(s["0"].alias("w1"), s["1"].alias("w2"))
            )
        ).alias("b"),
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    # Both count tables are consumed twice (bcount: scoring join; ucount:
    # vocab total + scoring join) and the planner does not share their
    # explode+groupBy subtrees across branches — persisting the
    # vocabulary-sized aggregates cuts a full corpus explode each (r11).
    # bg itself stays unpersisted: per-bigram rows are corpus-sized, the
    # wrong thing to pin in memory at 100 TB; its two executions are the
    # accepted trade.
    bcount = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bc")).persist()
    ucount = (
        staged.select(F.explode("__w").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("uc"))
        .persist()
    )
    vocab = ucount.agg(F.count(F.lit(1)).alias("v"))
    t = F.log2(
        (F.col("bc") + 1).cast("double")
        / (F.col("uc") + F.col("v")).cast("double")
    )
    terms = (
        bg.join(bcount, ["w1", "w2"])
        .join(ucount, "w1")
        .crossJoin(F.broadcast(vocab))
    )
    return terms.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg(t), 4).alias("bits_per_word"),
        F.round(F.pow(F.lit(2.0), -F.avg(t)), 2).alias("perplexity"),
    )


def word_subsample_weights(
    df: DataFrame,
    text_col: str = "text",
    t: float = 1e-3,
    top_n: int = 50,
) -> DataFrame:
    """Frequency-based word subsampling weights (word2vec-style).

    High-frequency words carry little training signal per occurrence;
    the classic remedy keeps an occurrence of word w with probability
    p_keep = min(1, (sqrt(f/t) + 1) * t/f) where f is the word's corpus
    frequency and ``t`` the subsample threshold — rare words are always
    kept, the head is downsampled toward sqrt.

    Returns the ``top_n`` most frequent words with their count, corpus
    frequency, and keep probability. One data-sized explode+aggregate
    (map-side partial combine keeps the shuffle at vocabulary width),
    a 1-row total broadcast back, and a top-k (TakeOrderedAndProject —
    never a global sort).
    """
    words = df.select(
        F.explode(F.split(ascii_lower(F.col(text_col)), " ")).alias("word")
    )
    # counts feeds the 1-row total AND the output spine: persist the
    # vocab-sized aggregate so the corpus explode runs once (r11).
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")).persist()
    total = counts.agg(F.sum("cnt").alias("total"))
    freq = F.col("cnt").cast("double") / F.col("total")
    keep = F.least(
        F.lit(1.0), (F.sqrt(freq / t) + F.lit(1.0)) * (F.lit(t) / freq)
    )

    def _r6(c: Column) -> Column:
        return F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0

    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "word",
            "cnt",
            _r6(freq).alias("freq"),
            _r6(keep).alias("p_keep"),
        )
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(top_n)
    )


def bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """Okapi BM25 keyword retrieval: top-N documents for a fixed term set.

    The lexical-search counterpart to the ANN operators: score(d) =
    sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with
    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1) (the non-negative Lucene
    variant).

    Scale shape: for a FIXED query, no inverted index and no vocabulary
    shuffle is needed — one map-side-combined pass reduces the corpus to
    a SINGLE stats row (N, avgdl, one df counter per term), broadcast
    back over a second scan that scores and top-Ks
    (TakeOrderedAndProject). Per-term tf is a filter-count over the
    already-split word array, all inside whole-stage codegen.
    """
    for t in terms:
        if "'" in t:
            raise ValueError("terms must not contain quotes")
    df = _spread_heavy_scan(df)
    words = F.split(ascii_lower(F.col(text_col)), " ")

    def _tf(term: str) -> Column:
        # A closure factory: an inline two-arg lambda would be taken for
        # PySpark's (element, index) higher-order signature.
        return F.size(F.filter(words, lambda w: w == F.lit(term)))

    docs = df.select(
        F.col(id_col),
        F.size(words).alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    # docs is consumed twice (the stats aggregate and the scoring pass)
    # and the planner does not share the scan+split+tf subtree between
    # them — the corpus paid the per-term filter chain twice (measured
    # r11). The persisted frame is NARROW (id + a handful of ints per
    # row, not the text), so the cache is a small fraction of the scan.
    ).persist()
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = docs.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        norm = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        score = score + idf * (tf * (k1 + 1.0)) / norm

    def _r6(c: Column) -> Column:
        return F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0

    return (
        scored.select(
            F.col(id_col),
            F.col("dl"),
            _r6(score).alias("bm25"),
        )
        .where(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(top_n)
    )


def sft_render(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    response_budget: int = 48,
    user_tag: str = "<|user|>",
    assistant_tag: str = "<|assistant|>",
    end_tag: str = "<|end|>",
) -> DataFrame:
    """Render documents into SFT (supervised fine-tuning) chat-template
    examples with a response token budget — the formatting step between a
    cleaned corpus and a trainer's packed batches.

    Each document is split at its word midpoint into a synthetic
    prompt/response pair, the response is truncated to
    ``response_budget`` words, and the pair is rendered as
    ``user_tag\\nprompt\\nassistant_tag\\nresponse end_tag``. Output
    carries the rendered text's length + md5 (join key for downstream
    packing/dedup) and the token accounting a data buyer audits:
    prompt/response word counts, kept count, truncation flag.

    Pure Column ops (split/slice/array_join/concat) — zero shuffles,
    renders at scan speed; the template literals are parameters, so a
    real tokenizer's special tokens drop in unchanged.
    """
    words = F.split(ascii_lower(F.col(text_col)), " ")
    n = F.size(words)
    np_ = F.floor((n + F.lit(1)) / 2).cast("int")
    prompt = F.slice(words, F.lit(1), np_)
    resp = F.slice(words, np_ + 1, F.greatest(n - np_, F.lit(0)))
    kept = F.slice(
        resp, F.lit(1), F.least(F.size(resp), F.lit(response_budget))
    )
    rendered = F.concat(
        F.lit(user_tag + "\n"),
        F.array_join(prompt, " "),
        F.lit("\n" + assistant_tag + "\n"),
        F.array_join(kept, " "),
        F.lit(end_tag),
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.size(prompt).cast("long").alias("n_prompt_words"),
        F.size(resp).cast("long").alias("n_response_words"),
        F.size(kept).cast("long").alias("n_response_kept"),
        (F.size(resp) > response_budget).alias("truncated"),
        F.length(rendered).cast("long").alias("n_chars_rendered"),
        F.md5(rendered).alias("rendered_md5"),
    )


#: Broadcast-hint gate for the bm25 query-vocabulary sides (same rule
#: as similarity._QUERY_BROADCAST_MAX_BYTES: hints are for bounded
#: sides only; an explicit broadcast() overrides the auto threshold).
_BM25_QUERY_BROADCAST_MAX_BYTES = 8 * 1024 * 1024


def bm25_multi_topk(
    df: DataFrame,
    queries: "dict[int, tuple[str, ...]] | DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
) -> DataFrame:
    """Okapi BM25 top-N per query for a BATCH of queries — the inverted-
    index path that :func:`bm25_topk`'s fixed-query shortcut does not
    scale to (one tf column per term stops working when the term set is
    the union of thousands of queries).

    ``queries`` is either a dict ``{query_id: (term, ...)}`` — a
    driver-held batch, bounded by construction — or a DataFrame with
    columns ``(query_id int, w string)`` for the UNBOUNDED query-stream
    shape ("score the whole eval corpus"): the query set then stays a
    distributed frame end-to-end, and every query-sized join side
    (query terms, the per-term document-frequency aggregate, the
    vocabulary restriction) takes a broadcast hint ONLY when the
    optimizer's sizeInBytes estimate says it is broadcast-class
    (functions/skew.bounded_for_broadcast — unknown/huge estimates
    withhold the hint and AQE still picks a runtime broadcast when the
    real size is small). VERDICT r7 #1: this was the one
    unbounded-in-principle broadcast left.

    Scale shape: the corpus explodes ONCE into postings restricted to
    the query vocabulary (literal ``isin`` for the dict face — pushed
    into the scan; a semi-join for the stream face, so only matching
    tokens shuffle); document frequency per term is a second aggregate
    of the postings; query terms and per-term df join onto the
    postings; corpus stats (N, avgdl) are a 1-row broadcast. Per-
    (query, doc) scores sum EXACT INTEGER nano-units (each term
    contribution is rounded to 1e-9 before the sum) so the reassociated
    distributed sum is bit-identical to any sequential engine — double
    prefix sums drift in the low bits under reassociation. Top-N per
    query is one rank window partitioned by query id.

    A doc scores iff it contains ≥1 query term, which equals
    :func:`bm25_topk`'s ``bm25 > 0`` cut: absent terms contribute 0 and
    the Lucene idf variant is strictly positive.
    """
    from pyspark.sql import Window

    from node_mongo2influx_spark.functions.skew import bounded_for_broadcast

    spark = df.sparkSession
    df = _spread_heavy_scan(df)
    words = F.split(ascii_lower(F.col(text_col)), " ")
    base = df.select(F.col(id_col).alias("doc"), words.alias("ws"))
    tokens = base.select(
        "doc", F.size("ws").alias("dl"), F.explode("ws").alias("w")
    )
    if isinstance(queries, DataFrame):
        qterms = queries.select(
            F.col("query_id").cast("int").alias("query_id"),
            F.col("w").cast("string").alias("w"),
        )
        vocab = qterms.select("w").distinct()
        bounded = bounded_for_broadcast(
            qterms, _BM25_QUERY_BROADCAST_MAX_BYTES
        )
        restricted = tokens.join(
            F.broadcast(vocab) if bounded else vocab, "w", "semi"
        )
        qterms_side = F.broadcast(qterms) if bounded else qterms
    else:
        all_terms = sorted({t for ts in queries.values() for t in ts})
        for t in all_terms:
            if "'" in t:
                raise ValueError("terms must not contain quotes")
        qterms = spark.createDataFrame(
            [(qid, t) for qid, ts in sorted(queries.items()) for t in ts],
            "query_id int, w string",
        )
        bounded = True  # driver-held dict: bounded by construction
        restricted = tokens.where(F.col("w").isin(all_terms))
        qterms_side = F.broadcast(qterms)
    postings = restricted.groupBy("doc", "dl", "w").agg(
        F.count(F.lit(1)).alias("tf")
    # postings feeds both dfreq and the scoring spine; without a persist
    # the corpus explode + vocabulary restriction + tf groupBy ran once
    # per branch (measured r11). Vocab-restricted postings are tiny
    # relative to the corpus — the classic inverted-index cache.
    ).persist()
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("ws")).alias("avgdl"),
    )
    dfreq = postings.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    # dfreq is ≤ |query vocabulary| rows: hint it exactly when the query
    # side itself passed the gate (its own post-aggregate estimate is
    # unknown to the optimizer, but its bound is the vocabulary's)
    dfreq_side = F.broadcast(dfreq) if bounded else dfreq
    tf = F.col("tf").cast("double")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = (
        idf
        * (tf * (k1 + 1.0))
        / (tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    nano = F.floor(contrib * 1e9 + F.lit(0.5)).cast("long")
    scored = (
        postings.join(qterms_side, "w")
        .join(dfreq_side, "w")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc")
        .agg(F.sum(nano).alias("nanos"))
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("nanos").desc(), F.col("doc")
    )
    return (
        scored.withColumn("rk", F.row_number().over(rank_w))
        .where(F.col("rk") <= top_n)
        .select(
            "query_id",
            F.col("doc").alias(id_col),
            F.col("rk").alias("rank"),
            (
                F.floor(F.col("nanos").cast("double") / 1e3 + F.lit(0.5))
                / 1e6
            ).alias("bm25"),
        )
        .orderBy("query_id", "rank")
    )


def cooccurrence_pmi(
    df: DataFrame,
    text_col: str = "text",
    max_dist: int = 2,
    min_count: int = 5,
    k: int = 30,
) -> DataFrame:
    """Pointwise mutual information over the skip-gram co-occurrence
    matrix: pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ) — the collocation
    score that separates genuinely associated pairs from pairs that
    co-occur only because both words are frequent (raw counts, which
    :func:`cooccurrence_pairs` ranks by, can't tell these apart).

    Shuffle budget: pair counts (map-side combined, one concatenated
    key), unigram counts (vocab-wide), two 1-row totals broadcast back,
    and the pair⋈unigram joins are UNHINTED — the vocabulary scales
    with the corpus, exactly the tfidf rule. Top-k by pmi among pairs
    seen ≥ ``min_count`` times (PMI of a count-1 pair is noise).
    """
    df = _spread_heavy_scan(df)
    ws = F.split(ascii_lower(F.col(text_col)), " ")
    n = F.size(ws)

    def pairs_at(d: int):
        ln = F.greatest(n - d, F.lit(0))
        z = F.arrays_zip(F.slice(ws, 1, ln), F.slice(ws, d + 1, ln))
        return F.transform(
            z,
            lambda s: F.concat_ws(
                " ", F.least(s["0"], s["1"]), F.greatest(s["0"], s["1"])
            ),
        )

    pairs = F.concat(*[pairs_at(d) for d in range(1, max_dist + 1)])
    # Both count tables are consumed from multiple branches (pc: the join
    # spine + pair_tot; uc: the w1 join, the w2 join, word_tot) and the
    # planner does NOT reuse the explode+groupBy exchanges across those
    # branches — the pre-persist plan re-ran the skip-gram explode twice
    # and the unigram explode three times (five corpus scans, measured
    # r11). persist() pins the vocab-sized aggregates instead: one pair
    # pass + one word pass over the corpus, every branch reads the cache.
    pc = (
        df.select(F.explode(pairs).alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
        .select(
            F.split_part("pk", F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part("pk", F.lit(" "), F.lit(2)).alias("w2"),
            "n_pair",
        )
        .persist()
    )
    uc = (
        df.select(F.explode(ws).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .persist()
    )
    pair_tot = pc.agg(F.sum("n_pair").alias("tp"))
    word_tot = uc.agg(F.sum("cw").alias("tw"))
    joined = (
        pc.join(uc.select(F.col("w").alias("w1"), F.col("cw").alias("c1")), "w1")
        .join(uc.select(F.col("w").alias("w2"), F.col("cw").alias("c2")), "w2")
        .crossJoin(F.broadcast(pair_tot))
        .crossJoin(F.broadcast(word_tot))
    )
    pmi = F.log(
        (F.col("n_pair").cast("double") / F.col("tp"))
        / (
            (F.col("c1").cast("double") / F.col("tw"))
            * (F.col("c2").cast("double") / F.col("tw"))
        )
    )

    def _r6(c: Column) -> Column:
        return F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0

    return (
        joined.select(
            "w1", "w2", "n_pair", "c1", "c2", _r6(pmi).alias("pmi")
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# BPE vocabulary training + application (round 5)
# ---------------------------------------------------------------------------
def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, n) distinct-word frequency table — the compressed corpus
    representation subword-tokenizer training consumes. ONE aggregate
    pass; at 100 TB this is the only stage that touches the corpus."""
    df = _spread_heavy_scan(df)
    return (
        df.select(
            F.explode(F.split(ascii_lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


#: Per-WORD length bound for BPE (the longdoc sweep, round 9). A single
#: whitespace-free megabyte token is not natural language, and both BPE
#: loops are quadratic-class in word length (the driver merge loop
#: re-hashes the word's full symbol tuple per touched merge; the greedy
#: encoder merges one pair per O(len) scan) — a 2 M-char token wedged
#: the driver for 10+ minutes at 7 GB RSS. The contract, matching what
#: real trainers do (SentencePiece's max length guard, spam-run
#: filters): words longer than this are EXCLUDED from training
#: statistics and pass through encoding as bare character symbols (no
#: merges applied — consistent with never having been trained on;
#: round-trip to the input word still holds). 1024 is ~128× the longest
#: fixture word, so every previously-witnessed value is unchanged; the
#: bounded worst case is O(1024²) ≈ 1 M ops per word.
BPE_MAX_WORD_CHARS = 1024


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """Train a byte-pair-encoding merge list (classic Sennrich BPE).

    Scale shape: tokenizer training must NEVER iterate over the corpus —
    one distributed :func:`word_frequencies` aggregate compresses the
    corpus to its vocab-sized (word, count) table (the same input
    HF-tokenizers / subword-nmt train on), and the merge loop runs
    driver-side over that dict. A 100 TB corpus and a 100 GB corpus with
    the same vocabulary train in the same driver time after the one agg.
    Words past ``BPE_MAX_WORD_CHARS`` never enter the statistics (see
    the constant's note — and a degenerate megabyte run would otherwise
    DOMINATE the learned merges from a single spam document).

    Deterministic: ties on pair count break lexicographically, so the
    merge list is a pure function of the frequency table. Returns the
    ordered merges ``[(left, right), ...]``; symbols are strings (chars,
    then grown subwords; ``end_of_word`` marks word finals so suffixes
    and prefixes tokenize differently, per the original BPE paper).
    """
    rows = (
        word_frequencies(df, text_col)
        .where(F.length("w") <= BPE_MAX_WORD_CHARS)
        .collect()
    )
    words: dict[tuple[str, ...], int] = {}
    for r in rows:
        syms = tuple(r["w"]) + ((end_of_word,) if end_of_word else ())
        words[syms] = words.get(syms, 0) + r["n"]
    return _bpe_merge_loop(words, n_merges)


def _bpe_apply_merge(
    syms: tuple[str, ...], a: str, b: str, ab: str
) -> tuple[str, ...]:
    """Left-to-right non-overlapping replacement of the adjacent pair
    (a, b) with ab — the single merge step shared by both loop
    implementations."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _bpe_merge_loop(
    words: dict[tuple[str, ...], int], n_merges: int
) -> list[tuple[str, str]]:
    """Incremental Sennrich merge loop (VERDICT r5 #6): pair counts +
    a pair→words inverted index + a lazy-invalidation max-heap, so each
    merge touches only the words CONTAINING the merged pair instead of
    rescanning the whole vocabulary.

    The naive loop (kept as :func:`_bpe_merge_loop_reference`, the
    pytest equivalence yardstick) costs O(vocab · word_len) PER MERGE —
    at the 32k-merge / 100k+-vocab scale real tokenizers train at,
    that's a quadratic-class driver loop. Here a merge costs
    O(|affected words| · word_len · log): affected words come off the
    inverted index, their old pair counts are subtracted, the transform
    applied, new counts added, and only CHANGED pairs re-enter the heap
    (stale heap entries are skipped when their recorded count no longer
    matches — classic lazy invalidation). Σ|affected| across all merges
    is bounded by total symbol turnover, which empirically grows
    ~linearly with vocab (tools/scale_probe.py ``bpe_merge_loop_vocab``).

    Deterministic and EXACTLY equivalent to the naive loop: the heap
    orders by (-count, pair), matching min((-count, pair)) — highest
    count, lexicographically smallest pair on ties.
    """
    import heapq

    words = dict(words)
    pc: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[tuple[str, ...]]] = {}

    def count_pairs(syms: tuple[str, ...], n: int, sign: int) -> None:
        for p in zip(syms, syms[1:]):
            c = pc.get(p, 0) + sign * n
            if c > 0:
                pc[p] = c
            else:
                pc.pop(p, None)
            if sign > 0:
                index.setdefault(p, set()).add(syms)
            changed.add(p)

    changed: set[tuple[str, str]] = set()
    for syms, n in words.items():
        count_pairs(syms, n, +1)
    heap = [(-n, p) for p, n in pc.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        while heap:
            negn, p = heap[0]
            if pc.get(p) == -negn:
                best = p
                break
            heapq.heappop(heap)  # stale entry (count changed since push)
        if best is None:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        affected = [w for w in index.pop(best, ()) if w in words]
        changed = set()
        for w in affected:
            n = words.pop(w)
            count_pairs(w, n, -1)
            t = _bpe_apply_merge(w, a, b, ab)
            words[t] = words.get(t, 0) + n
            count_pairs(t, n, +1)
        for p in changed:
            if p in pc:
                heapq.heappush(heap, (-pc[p], p))
    return merges


def _bpe_merge_loop_reference(
    words: dict[tuple[str, ...], int], n_merges: int
) -> list[tuple[str, str]]:
    """The naive full-rescan Sennrich loop — O(vocab) per merge. Kept as
    the equivalence reference for :func:`_bpe_merge_loop` (pytest pins
    identical merge lists on randomized vocabularies)."""
    words = dict(words)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new: dict[tuple[str, ...], int] = {}
        for syms, n in words.items():
            t = _bpe_apply_merge(syms, a, b, a + b)
            new[t] = new.get(t, 0) + n
        words = new
    return merges


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Apply a trained merge list to the corpus: (id, tokens, n_tokens).

    Rank-based greedy encoding (always merge the lowest-rank adjacent
    pair — the GPT-2 formulation), which reproduces the training-time
    tokenization exactly. Runs as ``mapInPandas`` with a per-batch word
    cache: each DISTINCT word in a batch is encoded once, so cost tracks
    the vocabulary, not the token count. The merge list itself is
    model-sized and ships inside the serialized kernel — no join, no
    shuffle; tokenization happens at scan speed. NULL text yields NULL
    tokens (same omission rule as the other kernels)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def kernel(batches):
        import re

        import pandas as pd

        # ASCII-\s split to match the JVM side EXACTLY: word_frequencies
        # (training) and bpe_replace_chain (the fixed-table face) split
        # on Java regex \s+, which is ASCII-only — Python's str.split()
        # also breaks on Unicode whitespace (U+00A0 etc.), which would
        # make the encoder see words the trainer never counted.
        ws = re.compile(r"\s+", re.ASCII)

        cache: dict[str, list[str]] = {}

        def enc_word(wd: str) -> list[str]:
            got = cache.get(wd)
            if got is not None:
                return got
            syms = list(wd) + ([end_of_word] if end_of_word else [])
            if len(wd) > BPE_MAX_WORD_CHARS:
                # never in training statistics (bpe_train applies the
                # same bound) -> no merges learned FOR it; encoding it
                # as bare characters keeps the round-trip exact and the
                # cost linear (the greedy loop below merges one pair
                # per O(len) scan — quadratic on a megabyte token)
                cache[wd] = syms
                return syms
            while len(syms) > 1:
                best_i, best_r = -1, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_r is None or r < best_r):
                        best_i, best_r = i, r
                if best_r is None:
                    break
                syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            cache[wd] = syms
            return syms

        for pdf in batches:
            toks = [
                None
                if t is None
                else [
                    s
                    for wd in ws.split(ascii_lower_py(t))
                    if wd
                    for s in enc_word(wd)
                ]
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": [None if x is None else len(x) for x in toks],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, tokens array<string>, n_tokens int"
    )


def clean_lines_c4(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning as pure Column expressions: keep only
    lines with >= ``min_words`` words that end in terminal punctuation
    (period/!/?/quote), drop exact repeated lines within the document
    (first occurrence wins — ``array_distinct`` preserves order), and
    rejoin. Returns (id, clean_text, n_lines_in, n_lines_kept) so the
    drop rate is observable without a second pass.

    This is the TRANSFORM face of the quality suite (quality/gopher
    flags only score): the standard boilerplate strip before dedup and
    packing. Zero Python, zero shuffle — line filtering happens inside
    whole-stage codegen at scan speed, which is the only acceptable cost
    for a full-corpus rewrite at 100 TB.
    """
    lines = F.split(F.col(text_col), "\n")
    trimmed = F.transform(lines, lambda l: F.trim(l))
    kept = F.filter(
        trimmed,
        lambda l: (F.size(F.split(l, r"\s+")) >= min_words)
        & l.rlike("[.!?\"']$"),
    )
    deduped = F.array_distinct(kept)
    return df.select(
        F.col(id_col),
        F.array_join(deduped, "\n").alias("clean_text"),
        F.size(lines).cast("int").alias("n_lines_in"),
        F.size(deduped).cast("int").alias("n_lines_kept"),
    )


def bpe_replace_chain(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    end_of_word: str = "</w>",
    guard: str = "§",
) -> DataFrame:
    """Fixed-merge-table BPE tokenization as a pure Column replace chain:
    (id, n_tokens, tokens_md5) with ZERO Python and zero shuffle.

    The document is rendered as a guarded symbol string — every symbol
    flanked by a doubled ``guard`` character (``§§a§§b§§</w>§§``) — and
    each merge ``(a, b)`` becomes one ``replace('§a§§b§' -> '§ab§')``:
    the pattern consumes one guard from each side, so adjacent matches
    never share characters and left-to-right replace-all reproduces the
    non-overlapping merge semantics exactly. For a creation-ordered merge
    list (every operand produced by a strictly earlier merge — what
    :func:`bpe_train` emits) this sequential chain is provably equivalent
    to the rank-greedy encoder in :func:`bpe_tokenize`, and
    tests/test_text.py pins that equivalence corpus-wide.

    Scale shape: this is the deployment face of a FIXED tokenizer — the
    merge table is baked into the plan as string literals, so a 100 TB
    corpus tokenizes inside whole-stage codegen at scan speed with no
    join, no broadcast, no Python worker. Word boundaries cannot leak:
    only word-final symbols contain ``end_of_word``, and no trained merge
    has such a symbol on its LEFT side, so no pattern can span two words.
    Output stays narrow (count + md5 of the space-joined token stream);
    the full token array face is :func:`bpe_tokenize`.
    """
    df = _spread_heavy_scan(df)
    g2 = guard * 2
    words = F.filter(
        F.split(
            F.replace(ascii_lower(F.col(text_col)), F.lit(guard), F.lit("")),
            r"\s+",
        ),
        lambda w: w != "",
    )
    rendered = F.transform(
        words,
        lambda w: F.concat(
            F.array_join(F.split(w, ""), g2), F.lit(g2 + end_of_word)
        ),
    )
    s = F.when(F.size(rendered) == 0, F.lit(g2)).otherwise(
        F.concat(F.lit(g2), F.array_join(rendered, g2), F.lit(g2))
    )
    for a, b in merges:
        s = F.replace(
            s,
            F.lit(f"{guard}{a}{g2}{b}{guard}"),
            F.lit(f"{guard}{a}{b}{guard}"),
        )
    # Two-step select: the merged symbol string feeds THREE outputs
    # (guard count, guard-stripped length, md5). Aliasing it in its own
    # projection keeps CollapseProject from inlining the whole chain
    # three times (Spark only collapses multi-referenced aliases when
    # they're cheap) — measured 3× smaller generated code and a ~12%
    # warm / ~2.5× cold (codegen compile) win at sf0.1.
    mid = df.select(F.col(id_col), s.alias("__s"))
    sc = F.col("__s")
    n_guard = F.length(sc) - F.length(F.replace(sc, F.lit(guard), F.lit("")))
    canon = F.trim(F.replace(sc, F.lit(g2), F.lit(" ")))
    return mid.select(
        F.col(id_col),
        (n_guard / 2 - 1).cast("int").alias("n_tokens"),
        F.md5(canon).alias("tokens_md5"),
    )
