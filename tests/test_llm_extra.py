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


def test_id_integrity_qa_matches_python(spark, sf_dir, reg):
    got = {
        r["table_name"]: r.asDict()
        for r in reg["id_integrity_qa"].fn(spark, sf_dir).collect()
    }
    for table, col in (
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("events", "event_id"),
    ):
        ids = [
            r[col]
            for r in spark.read.parquet(f"{sf_dir}/{table}.parquet")
            .select(col)
            .collect()
        ]
        nn = [i for i in ids if i is not None]
        c = Counter(nn)
        row = got[table]
        assert row["n_rows"] == len(ids)
        assert row["n_null_id"] == len(ids) - len(nn)
        assert row["n_distinct_id"] == len(c)
        assert row["n_dup_excess"] == len(nn) - len(c)
        assert row["max_id_multiplicity"] == (max(c.values()) if c else None)
        assert row["min_id"] == (min(nn) if nn else None)
        assert row["max_id"] == (max(nn) if nn else None)
        # the dense fixtures really do have unique ids — the census is
        # the evidence the tie-break contracts lean on
        assert row["n_dup_excess"] == 0 and row["n_null_id"] == 0


def test_id_integrity_qa_hostile_ids(spark, tmp_path, reg):
    # duplicate ids, NULL ids, and one empty table: the census must
    # count them exactly, and the empty table's row must be ABSENT
    # (matching the oracle's GROUP BY shape, not a NULL-filled global
    # aggregate row).
    d = str(tmp_path / "hostile_ids")
    spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,)], "doc_id long"
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame([(7,), (None,), (None,)], "vec_id long").write.parquet(
        f"{d}/embeddings.parquet"
    )
    spark.createDataFrame([], "event_id long").write.parquet(
        f"{d}/events.parquet"
    )
    got = {r["table_name"]: r.asDict() for r in reg["id_integrity_qa"].fn(spark, d).collect()}
    assert set(got) == {"documents", "embeddings"}
    doc = got["documents"]
    assert (
        doc["n_rows"],
        doc["n_null_id"],
        doc["n_distinct_id"],
        doc["n_dup_excess"],
        doc["max_id_multiplicity"],
        doc["min_id"],
        doc["max_id"],
    ) == (5, 1, 2, 2, 3, 1, 2)
    emb = got["embeddings"]
    assert (
        emb["n_rows"],
        emb["n_null_id"],
        emb["n_distinct_id"],
        emb["n_dup_excess"],
        emb["max_id_multiplicity"],
        emb["min_id"],
        emb["max_id"],
    ) == (3, 2, 1, 0, 1, 7, 7)


def test_referential_integrity_qa_counts_orphans(spark, tmp_path, reg):
    # handmade star: order 10 exists, 20 doesn't; customer 1 exists,
    # 2 doesn't; NULL FKs are reported separately, never as orphans.
    d = str(tmp_path / "hostile_fks")
    spark.createDataFrame(
        [(10, 1), (20, 1), (20, 1), (None, 1)],
        "l_orderkey long, dummy long",
    ).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        [(10, 1), (10, 2), (11, None)], "o_orderkey long, o_custkey long"
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame([(1,)], "c_custkey long").write.parquet(
        f"{d}/customer.parquet"
    )
    spark.createDataFrame([], "user_id long").write.parquet(
        f"{d}/events.parquet"
    )
    got = {
        r["relation"]: r.asDict()
        for r in reg["referential_integrity_qa"].fn(spark, d).collect()
    }
    # empty child -> relation row ABSENT (oracle GROUP BY shape)
    assert set(got) == {
        "lineitem.l_orderkey->orders",
        "orders.o_custkey->customer",
    }
    li = got["lineitem.l_orderkey->orders"]
    assert (
        li["n_rows"],
        li["n_null_fk"],
        li["n_distinct_fk"],
        li["n_orphan_rows"],
        li["n_orphan_keys"],
    ) == (4, 1, 2, 2, 1)
    o = got["orders.o_custkey->customer"]
    assert (
        o["n_rows"],
        o["n_null_fk"],
        o["n_distinct_fk"],
        o["n_orphan_rows"],
        o["n_orphan_keys"],
    ) == (3, 1, 2, 1, 1)


def test_fk_integrity_dense_fixture_clean(spark, sf_dir, reg):
    # the dense fixtures are referentially intact — the baseline the
    # audit exists to verify after a migration
    rows = reg["referential_integrity_qa"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_orphan_rows"] == 0 and r["n_null_fk"] == 0, r
