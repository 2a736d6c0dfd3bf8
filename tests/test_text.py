"""Text analysis operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from node_mongo2influx_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "en"),
            (2, "el perro y la casa de que", "es"),
            (3, "xyzzy qwerty plugh", "xx"),
            (4, "Hello, world! 42 times.", "en"),
        ],
        "doc_id long, text string, lang string",
    )


def test_quality_features(docs):
    rows = {r["doc_id"]: r for r in text.quality(docs).collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 6
    assert r1["n_chars_m"] == 22
    assert r1["stopword_ratio"] == round(2 / 6, 4)  # 'the' twice
    assert rows[4]["non_alpha_ratio"] > 0


def test_token_counts(docs):
    rows = {r["doc_id"]: r for r in text.token_counts(docs).collect()}
    assert rows[1]["ws_tokens"] == 6
    # "Hello, world! 42 times." -> Hello , world ! 42 times . = 7
    assert rows[4]["bpe_ish_tokens"] == 7


def test_lang_id_heuristic(docs):
    rows = {r["doc_id"]: r for r in text.lang_id(docs).collect()}
    assert rows[1]["predicted"] == "en"
    assert rows[2]["predicted"] == "es"
    assert rows[3]["predicted"] == "unknown"
    assert rows[1]["label"] == "en"


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "a  b\tc"), (2, "A b C"), (3, "totally different")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(df).collect()}
    assert rows[1] == rows[2]  # whitespace + case normalized
    assert rows[1] != rows[3]
    out = text.fingerprint(df).first()
    assert out["shard_bucket"] == out["fingerprint"][:4]


def test_cooccurrence_pairs_window(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    rows = {
        (r["w1"], r["w2"]): r["n"]
        for r in text.cooccurrence_pairs(df, max_dist=2).collect()
    }
    # d=1: (a,b), (a,b); d=2: (a,a)
    assert rows == {("a", "b"): 2, ("a", "a"): 1}


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, "aab")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["char_entropy"]
        for r in text.char_entropy(df).collect()
    }
    import math

    assert rows[1] == 0.0
    assert rows[2] == 1.0
    assert rows[3] == 2.0
    exp = round(-(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3), 6)
    assert abs(rows[4] - exp) < 1e-9


def test_redact_pii_counts_and_output(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, "mail bob@host.org and sue@corp.net or +1-555-1234 now")],
        "doc_id long, text string",
    )
    r = text.redact_pii(df).first()
    assert (r["n_email"], r["n_phone"]) == (2, 1)
    exp = "mail <EMAIL> and <EMAIL> or <PHONE> now"
    assert r["redacted_md5"] == hashlib.md5(exp.encode()).hexdigest()


def test_bigram_lm_scores_known_corpus(spark):
    # corpus: "a b" x2 and "a c". unigrams: a=3, b=2? no: docs are
    # "a b", "a b", "a c" -> unigrams a:3 b:2 c:1, V=3.
    # bigram counts: (a,b):2, (a,c):1.
    # P(b|a) = (2+1)/(3+3) = 0.5 ; P(c|a) = (1+1)/(3+3) = 1/3.
    import math

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in text.bigram_lm_scores(df).collect()}
    assert rows[1]["n_bigrams"] == 1
    assert rows[1]["bits_per_word"] == round(-math.log2(0.5), 4) == 1.0
    assert rows[3]["bits_per_word"] == round(-math.log2(1 / 3), 4)
    assert rows[3]["perplexity"] == 3.0
    # one-word docs have no bigrams and drop out
    df2 = spark.createDataFrame([(9, "solo")], "doc_id long, text string")
    assert text.bigram_lm_scores(df2).count() == 0


def test_bm25_matches_python(spark, sf_dir):
    import math

    from node_mongo2influx_spark.plans import load_registry
    from node_mongo2influx_spark.plans.llm_ops import _BM25_TERMS

    rows = load_registry()["bm25_keyword_topk"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    k1, b = 1.2, 0.75
    toks = {d["doc_id"]: d["text"].lower().split(" ") for d in docs}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    dfreq = {
        t: sum(1 for w in toks.values() if t in w) for t in _BM25_TERMS
    }
    scores = {}
    for did, w in toks.items():
        s = 0.0
        for t in _BM25_TERMS:
            tf = w.count(t)
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        scores[did] = s
    expect = sorted(
        ((round(math.floor(s * 1e6 + 0.5) / 1e6, 10), did) for did, s in scores.items() if s > 0),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    got = [(r["bm25"], r["doc_id"]) for r in rows]
    assert [(s, d) for s, d in got] == [(s, d) for s, d in expect]
    assert all(r["dl"] == len(toks[r["doc_id"]]) for r in rows)


def test_approx_top_words_accuracy(spark, sf_dir):
    # independent accuracy gate: run the SKETCH directly (the registry
    # query now outputs bounded-witness booleans, r7) vs exact counts
    from collections import Counter

    from pyspark.sql import functions as F

    from node_mongo2influx_spark.plans import load_registry
    from node_mongo2influx_spark.plans.tables import load

    rows = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
        .agg(F.expr("approx_top_k(word, 20, 10000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("word"), F.col("e.count").alias("approx_count"))
        .collect()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect()
    exact = Counter(w for d in docs for w in d["text"].lower().split(" "))
    got = {r["word"]: r["approx_count"] for r in rows}
    assert len(rows) == 20
    # heavy-hitter guarantee: the exact top-10 all surface in the sketch's
    # top-20, with counts within 5%
    top10 = [w for w, _ in exact.most_common(10)]
    for w in top10:
        assert w in got, w
        assert abs(got[w] - exact[w]) <= max(1, 0.05 * exact[w]), (w, got[w], exact[w])
    # and the registry query's witness row holds
    wit = load_registry()["approx_top_words"].fn(spark, sf_dir).collect()
    assert len(wit) == 1
    w0 = wit[0]
    assert w0["n_items"] == min(20, len(exact))
    assert w0["all_within_bound"] and w0["heavy_hitters_covered"]


def test_bm25_multi_agrees_with_fixed_query_path(spark, sf_dir):
    # Internal consistency of the two BM25 formulations: for the same
    # term set, the inverted-index multi-query path must rank documents
    # identically to the fixed-query stats-broadcast path (scores follow
    # different rounding routes — nano-int sum vs direct 1e-6 floor — so
    # compare the ranking, not the floats).
    from node_mongo2influx_spark.operators import text as t
    from node_mongo2influx_spark.plans.tables import load

    docs = load(spark, sf_dir, "documents")
    terms = ("join", "window", "hash")
    fixed = [
        r["doc_id"]
        for r in t.bm25_topk(docs, terms=terms, top_n=15).collect()
    ]
    multi = [
        r["doc_id"]
        for r in t.bm25_multi_topk(docs, queries={0: terms}, top_n=15)
        .orderBy("rank")
        .collect()
    ]
    assert multi == fixed


# ---------------------------------------------------------------------------
# BPE train / tokenize (round 5)
# ---------------------------------------------------------------------------
def _naive_bpe_train(texts, n_merges, eow="</w>"):
    # reference trainer over the RAW token stream (no freq-table
    # compression) — proves word_frequencies-based training is lossless
    stream = [list(w) + [eow] for t in texts for w in t.lower().split()]
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms in stream:
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + 1
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        nxt = []
        for syms in stream:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append(out)
        stream = nxt
    return merges


def test_bpe_train_matches_naive_stream_trainer(spark):
    texts = [
        "low low low low low lower lower newest newest newest",
        "newest newest newest widest widest widest the the the the",
        "lowest newest low wide wider the a a a",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = text.bpe_train(df, n_merges=20)
    assert got == _naive_bpe_train(texts, 20)
    assert len(got) == 20 and all(isinstance(a, str) and isinstance(b, str) for a, b in got)


def test_bpe_incremental_loop_equals_reference_on_random_vocabs():
    # The heap/inverted-index merge loop must produce EXACTLY the naive
    # full-rescan loop's merge list — same counts, same lexicographic
    # tie-breaks — on randomized vocabularies (including repeated-symbol
    # words, where overlapping pair occurrences are the tricky case).
    import random

    from node_mongo2influx_spark.operators.text import (
        _bpe_merge_loop,
        _bpe_merge_loop_reference,
    )

    rng = random.Random(42)
    alphabet = "abcde"
    for trial in range(25):
        vocab = {}
        for _ in range(rng.randint(1, 40)):
            w = tuple(
                rng.choice(alphabet) for _ in range(rng.randint(1, 8))
            ) + ("</w>",)
            vocab[w] = vocab.get(w, 0) + rng.randint(1, 9)
        n_merges = rng.randint(1, 30)
        got = _bpe_merge_loop(vocab, n_merges)
        ref = _bpe_merge_loop_reference(vocab, n_merges)
        assert got == ref, (trial, vocab, got, ref)


def test_bpe_tokenize_roundtrip_and_determinism(spark):
    texts = ["low lower lowest", "the newest widest", None]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges = text.bpe_train(df.where(F.col("text").isNotNull()), n_merges=15)
    out = {r["doc_id"]: r for r in text.bpe_tokenize(df, merges).collect()}
    # null text -> null tokens, not a crash
    assert out[2]["tokens"] is None and out[2]["n_tokens"] is None
    for i, t in enumerate(texts[:2]):
        toks = out[i]["tokens"]
        assert out[i]["n_tokens"] == len(toks)
        # tokens reassemble the lowercased words exactly
        rebuilt = "".join(toks).replace("</w>", " ").strip()
        assert rebuilt == " ".join(t.lower().split())
        # every token is either a learned subword or a single char/eow
        vocab = {a + b for a, b in merges}
        for s in toks:
            assert s in vocab or len(s.replace("</w>", "x")) <= 4


def test_bpe_tokenize_agrees_with_training_segmentation(spark):
    # rank-based greedy encoding must reproduce the segmentation the
    # trainer ends with: re-encode each training word and compare token
    # counts against a direct re-train at the same merge count.
    texts = ["banana bandana ban banana", "an a ana banana band"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges = text.bpe_train(df, n_merges=8)
    # apply merges manually to each distinct word (training replay)
    def replay(word):
        syms = list(word) + ["</w>"]
        for a, b in merges:
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
    out = {r["doc_id"]: r["tokens"] for r in text.bpe_tokenize(df, merges).collect()}
    for i, t in enumerate(texts):
        expect = [s for w in t.lower().split() for s in replay(w)]
        assert out[i] == expect


def test_clean_lines_c4(spark):
    doc = "\n".join(
        [
            "This is a good sentence.",       # kept
            "short",                           # dropped: < 3 words
            "no terminal punctuation here",    # dropped: no punctuation
            "Another good line stays here!",   # kept
            "This is a good sentence.",        # dropped: exact repeat
            "  Padded but still a keeper.  ",  # kept (trimmed)
            "Is this kept as well?",           # kept
        ]
    )
    df = spark.createDataFrame([(1, doc), (2, None)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.clean_lines_c4(df).collect()}
    r = out[1]
    assert r["clean_text"].split("\n") == [
        "This is a good sentence.",
        "Another good line stays here!",
        "Padded but still a keeper.",
        "Is this kept as well?",
    ]
    assert (r["n_lines_in"], r["n_lines_kept"]) == (7, 4)
    # null text passes through as null, not a crash
    assert out[2]["clean_text"] is None
    # plan stays JVM-side (no Python eval)
    plan = text.clean_lines_c4(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_replace_chain_matches_greedy_encoder(spark, sf_dir):
    # The replace-chain (fixed-merge, pure-Column) tokenizer must agree
    # with the rank-greedy mapInPandas encoder corpus-wide: same token
    # count and same md5 of the space-joined token stream for every doc.
    # This is the equivalence the bpe_tokenize_fixed oracle leans on.
    from node_mongo2influx_spark.plans.llm_ops import _BPE_FIXED_MERGES

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chain = {
        r["doc_id"]: r
        for r in text.bpe_replace_chain(
            docs, merges=_BPE_FIXED_MERGES
        ).collect()
    }
    greedy = (
        text.bpe_tokenize(docs, merges=_BPE_FIXED_MERGES)
        .select(
            "doc_id",
            "n_tokens",
            F.md5(F.concat_ws(" ", F.col("tokens"))).alias("tokens_md5"),
        )
        .collect()
    )
    assert len(chain) == len(greedy) > 0
    for r in greedy:
        c = chain[r["doc_id"]]
        assert c["n_tokens"] == r["n_tokens"], r["doc_id"]
        assert c["tokens_md5"] == r["tokens_md5"], r["doc_id"]


def test_bpe_replace_chain_edge_inputs(spark):
    # Guard chars in text are stripped pre-render (cannot forge symbol
    # boundaries); empty/whitespace-only text tokenizes to zero tokens.
    from node_mongo2influx_spark.plans.llm_ops import _BPE_FIXED_MERGES

    df = spark.createDataFrame(
        [(0, "low§er lower"), (1, ""), (2, "   "), (3, "er er er")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text.bpe_replace_chain(
            df, merges=_BPE_FIXED_MERGES
        ).collect()
    }
    assert out[1]["n_tokens"] == 0 and out[2]["n_tokens"] == 0
    # '§' stripped: 'low§er' tokenizes as 'lower'
    assert out[0]["n_tokens"] > 0
    # 'er' + '</w>' is merge ('er','</w>') -> one token per word
    assert out[3]["n_tokens"] == 3


def test_bpe_tokenize_ascii_whitespace_matches_jvm_split(spark):
    # Unicode whitespace (U+00A0 — ubiquitous in scraped web text) must
    # NOT split words in bpe_tokenize: training (word_frequencies) and
    # the fixed-table face (bpe_replace_chain) split on Java \s+, which
    # is ASCII-only, and the three surfaces must agree on what a word is.
    from node_mongo2influx_spark.plans.llm_ops import _BPE_FIXED_MERGES

    df = spark.createDataFrame(
        [(0, "low\u00a0er lower"), (1, "er er er")],
        "doc_id long, text string",
    )
    chain = {
        r["doc_id"]: r
        for r in text.bpe_replace_chain(df, merges=_BPE_FIXED_MERGES).collect()
    }
    greedy = (
        text.bpe_tokenize(df, merges=_BPE_FIXED_MERGES)
        .select(
            "doc_id",
            "n_tokens",
            F.md5(F.concat_ws(" ", F.col("tokens"))).alias("tokens_md5"),
        )
        .collect()
    )
    for r in greedy:
        assert chain[r["doc_id"]]["n_tokens"] == r["n_tokens"], r["doc_id"]
        assert chain[r["doc_id"]]["tokens_md5"] == r["tokens_md5"], r["doc_id"]


def test_bm25_multi_query_stream_face(spark, sf_dir, monkeypatch, tmp_path):
    # Round 8 (VERDICT r7 #1): queries as a DataFrame — the unbounded
    # query-stream shape. Must produce IDENTICAL rows to the dict face,
    # hint its query-sized join sides only when the size gate passes,
    # and still produce identical rows with the gate forced shut (the
    # path a truly unbounded stream takes — AQE recovers the strategy).
    # The query frame is parquet-backed: file stats give the optimizer a
    # real size estimate (a raw createDataFrame LogicalRDD reports
    # UNKNOWN, which the gate conservatively treats as unbounded).
    from node_mongo2influx_spark.operators import text as t
    from node_mongo2influx_spark.plans.tables import load

    docs = load(spark, sf_dir, "documents")
    queries = {0: ("join", "window", "hash"), 1: ("data", "query", "merge")}
    spark.createDataFrame(
        [(qid, w) for qid, ts in queries.items() for w in ts],
        "query_id int, w string",
    ).write.parquet(str(tmp_path / "q"))
    qdf = spark.read.parquet(str(tmp_path / "q"))
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    dict_rows = sorted(t.bm25_multi_topk(docs, queries).collect(), key=key)
    assert dict_rows, "fixture terms must match some documents"
    hinted = t.bm25_multi_topk(docs, qdf)
    assert sorted(hinted.collect(), key=key) == dict_rows
    n_hints_bounded = (
        hinted._jdf.queryExecution().analyzed().toString().count("ResolvedHint")
    )
    # gate forced shut: the query-vocabulary hints (vocab semi-join,
    # qterms, dfreq) are withheld; only the 1-row stats hint remains
    monkeypatch.setattr(t, "_BM25_QUERY_BROADCAST_MAX_BYTES", 0)
    unhinted = t.bm25_multi_topk(docs, qdf)
    n_hints_gated = (
        unhinted._jdf.queryExecution().analyzed().toString().count("ResolvedHint")
    )
    # gated face keeps ONLY the 1-row stats hint; the bounded face adds
    # the query-sized ones (vocab semi-join, qterms, dfreq)
    assert n_hints_gated == 1 and n_hints_bounded >= n_hints_gated + 3, (
        n_hints_bounded, n_hints_gated,
    )
    assert sorted(unhinted.collect(), key=key) == dict_rows
