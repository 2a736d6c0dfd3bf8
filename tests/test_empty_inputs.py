"""Empty-input robustness: every core operator must accept an EMPTY frame
(right schema, zero rows) and return an empty result without raising.

At 100 TB this is not a corner case — a filter stage, a partition, a CDC
micro-batch, or an incremental delta is routinely empty, and an operator
that assumes rows (reduce without identity, first() on nothing, kernel fed
zero batches, eager trainer over an empty sample) kills the whole job.
The r5 upsert empty-delta crash (ADVICE r4) is the class this pins down.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from node_mongo2influx_spark.operators import dedup, sampling, text


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def empty_pairs(spark):
    return spark.createDataFrame([], "doc_a long, doc_b long")


@pytest.fixture(scope="module")
def empty_vecs(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>")


def test_dedup_exact_empty(empty_docs):
    assert dedup.exact(empty_docs).count() == 0


def test_ngram_jaccard_empty(empty_docs):
    assert dedup.ngram_jaccard_pairs(empty_docs).count() == 0


def test_minhash_lsh_empty(empty_docs):
    assert dedup.minhash_lsh_pairs(empty_docs, threshold=0.5).count() == 0


def test_components_empty(empty_pairs):
    assert dedup.components_from_pairs(empty_pairs).count() == 0


def test_components_empty_string_ids(spark):
    pairs = spark.createDataFrame([], "doc_a string, doc_b string")
    assert dedup.components_from_pairs(pairs).count() == 0


def test_segment_dedup_empty(empty_docs):
    assert dedup.segment_dedup(empty_docs).count() == 0


def test_cdc_chunks_empty(empty_docs):
    assert dedup.cdc_chunks(empty_docs).count() == 0


def test_simhash_empty(empty_docs):
    assert dedup.simhash(empty_docs).count() == 0


def test_text_quality_empty(empty_docs):
    assert text.quality(empty_docs).count() == 0


def test_tfidf_empty(empty_docs):
    # global doc-count scalar over zero rows must not poison the join
    assert text.tfidf_top_terms(empty_docs).count() == 0


def test_lang_id_empty(empty_docs):
    assert text.lang_id(empty_docs).count() == 0


def test_bm25_empty_corpus(empty_docs):
    # corpus stats (N, avgdl) over zero docs: no division blow-up
    assert text.bm25_topk(empty_docs, terms=("join", "hash")).count() == 0


def test_cooccurrence_pmi_empty(empty_docs):
    assert text.cooccurrence_pmi(empty_docs).count() == 0


def test_sft_render_empty(empty_docs):
    assert text.sft_render(empty_docs).count() == 0


def test_pack_sequences_empty(spark):
    lens = spark.createDataFrame([], "doc_id long, n_tokens int")
    assert sampling.pack_sequences(lens, ctx_len=2048, n_buckets=4).count() == 0


def test_quota_sample_empty(spark):
    docs = spark.createDataFrame([], "doc_id long, text string, source string")
    assert sampling.quota_sample(docs).count() == 0


def test_shuffle_order_empty(empty_docs):
    assert sampling.shuffle_order(empty_docs).count() == 0


def test_assign_split_empty(empty_docs):
    assert sampling.assign_split(empty_docs).count() == 0


def test_cosine_pairs_empty(empty_vecs):
    from node_mongo2influx_spark.operators import similarity

    assert similarity.cosine_pairs(
        empty_vecs, id_col="vec_id", vec_col="embedding", threshold=0.4
    ).count() == 0


def test_incremental_exact_empty_delta(spark):
    # base rows exist, the delta is empty — the routine no-op ingest
    df = spark.createDataFrame(
        [(1, "some base text", False)],
        "doc_id long, text string, is_delta boolean",
    )
    out = dedup.incremental_exact(df, F.col("is_delta"))
    assert out.count() == 0


def test_incremental_exact_empty_base(spark):
    # first-ever ingest: base empty, all delta rows classify as new/dup_delta
    df = spark.createDataFrame(
        [(1, "a", True), (2, "a", True), (3, "b", True)],
        "doc_id long, text string, is_delta boolean",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in dedup.incremental_exact(df, F.col("is_delta")).collect()
    }
    assert got == {1: "new", 2: "dup_delta", 3: "new"}
