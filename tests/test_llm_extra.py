"""Round-3 LLM-pipeline queries: python/numpy cross-checks independent of
the DuckDB oracles (these catch engine-side bugs the oracle shares, e.g. a
wrong split regex used identically on both sides)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from node_mongo2influx_spark.plans import load_registry


@pytest.fixture(scope="module")
def reg():
    return load_registry()


def test_doc_repetition_ratio_matches_python(spark, sf_dir, reg):
    got = {
        r["doc_id"]: (r["top_word_count"], r["n_words"], r["repetition_ratio"])
        for r in reg["doc_repetition_ratio"].fn(spark, sf_dir).collect()
    }
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    assert len(got) == len(docs)
    for row in docs:
        c = Counter(row["text"].split(" "))
        top, n = max(c.values()), sum(c.values())
        gt, gn, gr = got[row["doc_id"]]
        assert (gt, gn) == (top, n), row["doc_id"]
        assert gr == pytest.approx(round(top / n, 4), abs=1e-9)
        assert 0 < gr <= 1


def test_top_bigrams_matches_python(spark, sf_dir, reg):
    got = [(r["bigram"], r["n"]) for r in reg["top_bigrams"].fn(spark, sf_dir).collect()]
    c: Counter = Counter()
    for row in spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect():
        w = row["text"].split(" ")
        c.update(" ".join(p) for p in zip(w, w[1:]))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == want


def test_label_centroid_cosine_matches_numpy(spark, sf_dir, reg):
    got = {
        r["vec_id"]: (r["label"], r["cos_to_centroid"])
        for r in reg["label_centroid_cosine"].fn(spark, sf_dir).collect()
    }
    pdf = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    mat = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
    labels = pdf["label"].to_numpy()
    ids = pdf["vec_id"].to_numpy()
    assert len(got) == len(ids)
    for lab in np.unique(labels):
        mask = labels == lab
        cent = mat[mask].mean(axis=0)
        cos = (mat[mask] @ cent) / (
            np.linalg.norm(mat[mask], axis=1) * np.linalg.norm(cent)
        )
        for vid, c in zip(ids[mask], cos):
            glab, gcos = got[vid]
            assert glab == lab
            assert gcos == pytest.approx(round(c, 4), abs=2e-4)


def test_weighted_sample_biases_toward_weight_and_plans_topk(spark, sf_dir):
    # A-ES semantics: inclusion probability rises with weight, so the
    # sample's mean doc length must exceed the corpus mean; and the
    # plan must be a TakeOrderedAndProject (distributed top-k), never a
    # global sort.
    from node_mongo2influx_spark.plans import load_registry
    from node_mongo2influx_spark.plans.tables import load
    from pyspark.sql import functions as F

    reg = load_registry()
    df = reg["weighted_sample_aes"].fn(spark, sf_dir)
    jvm = spark._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan, plan

    sampled_mean = df.agg(F.avg("weight")).first()[0]
    corpus_mean = (
        load(spark, sf_dir, "documents").agg(F.avg("n_chars")).first()[0]
    )
    assert sampled_mean > corpus_mean * 1.1, (sampled_mean, corpus_mean)
