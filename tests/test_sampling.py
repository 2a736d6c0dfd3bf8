"""Deterministic split/sample tests: stability, coverage, rate accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from node_mongo2influx_spark.operators import sampling
from node_mongo2influx_spark.plans.tables import load


def test_split_total_and_stability(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = sampling.assign_split(docs).select("doc_id", "split")
    b = sampling.assign_split(docs).select("doc_id", "split")
    # every row gets exactly one split, assignments identical across runs
    assert a.count() == docs.count()
    assert a.exceptAll(b).count() == 0
    got = {r["split"] for r in a.select("split").distinct().collect()}
    assert got <= {"train", "val", "test"}


def test_split_fractions_roughly_hold(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    counts = {
        r["split"]: r["n"]
        for r in sampling.assign_split(docs)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # 90/5/5 within generous tolerance at 500 docs (binomial noise)
    assert abs(counts.get("train", 0) / n - 0.90) < 0.06
    assert abs(counts.get("val", 0) / n - 0.05) < 0.04
    assert abs(counts.get("test", 0) / n - 0.05) < 0.04


def test_split_stable_under_corpus_growth(spark, sf_dir):
    # The defining property: a document's split never changes when more
    # data arrives — assignment on a subset equals assignment on the full
    # corpus restricted to that subset.
    docs = load(spark, sf_dir, "documents")
    sub = docs.where("doc_id % 3 = 0")
    full = sampling.assign_split(docs).where("doc_id % 3 = 0").select("doc_id", "split")
    part = sampling.assign_split(sub).select("doc_id", "split")
    assert full.exceptAll(part).count() == 0 and part.exceptAll(full).count() == 0


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    fr = {"src0": 1.0, "src1": 0.0}
    got = sampling.stratified_sample(docs, fr, default_fraction=0.5)
    per = {
        r["source"]: r["n"]
        for r in got.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_src0 = docs.where("source = 'src0'").count()
    assert per.get("src0") == n_src0  # fraction 1.0 keeps everything
    assert "src1" not in per  # fraction 0.0 keeps nothing
    # determinism
    again = sampling.stratified_sample(docs, fr, default_fraction=0.5)
    assert got.exceptAll(again).count() == 0


def test_pack_sequences_layout(spark):
    # ids 0,4,8,12 all hash to bucket 0 (mod 4); laid out in id order the
    # start offsets are 0, 1000, 2000, 3000 → bins 0, 0, 0, 1 at ctx 2048.
    rows = [(0, 1000), (4, 1000), (8, 1000), (12, 5000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["bucket"], r["bin"], r["start_offset"])
        for r in sampling.pack_sequences(df, ctx_len=2048, n_buckets=4).collect()
    }
    assert got[0] == (0, 0, 0)
    assert got[4] == (0, 0, 1000)
    assert got[8] == (0, 0, 2000)
    assert got[12] == (0, 1, 3000)


def test_salts_are_independent(spark, sf_dir):
    # With the same salt, sampling at 50% then splitting would correlate;
    # different salts must give ~independent membership. Check the sampled
    # subset's train fraction stays near 90%.
    docs = load(spark, sf_dir, "documents")
    sampled = sampling.stratified_sample(
        docs, {}, default_fraction=0.5, salt="sample-v1"
    )
    frac = (
        sampling.assign_split(sampled).where("split = 'train'").count()
        / sampled.count()
    )
    assert abs(frac - 0.90) < 0.06


def test_chunk_windows_layout(spark):
    # 100 words, ctx=64, stride=48 -> starts at words 1, 49, 97:
    # chunk 0 full (64), chunk 1 spans 49..100 (52), chunk 2 spans 97..100 (4)
    words = [f"w{i}" for i in range(1, 101)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = {
        r["chunk_no"]: r
        for r in sampling.chunk_windows(df, ctx=64, stride=48).collect()
    }
    assert sorted(rows) == [0, 1, 2]
    assert [rows[i]["n_words"] for i in (0, 1, 2)] == [64, 52, 4]
    import hashlib

    exp = hashlib.md5(" ".join(words[48 : 48 + 64]).encode()).hexdigest()
    assert rows[1]["chunk_md5"] == exp
    # overlap: chunk k starts stride words in, so ctx-stride words repeat
    assert 64 - 48 == 16  # documented overlap


def test_shuffle_order_is_permutation_and_bucket_invariant(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    out = sampling.shuffle_order(docs, n_buckets=64)
    agg = out.agg(
        F.count("*").alias("n"),
        F.countDistinct("pos").alias("d"),
        F.min("pos").alias("mn"),
        F.max("pos").alias("mx"),
    ).first()
    assert (agg["n"], agg["d"], agg["mn"], agg["mx"]) == (n, n, 0, n - 1)
    # the permutation is a pure function of (id, salt): n_buckets is a
    # parallelism knob, not a semantic one
    a = {r["doc_id"]: r["pos"] for r in out.collect()}
    b = {
        r["doc_id"]: r["pos"]
        for r in sampling.shuffle_order(docs, n_buckets=16).collect()
    }
    assert a == b


def test_quota_sample_caps_and_is_deterministic(spark, sf_dir, request):
    from node_mongo2influx_spark.plans import load_registry

    reg = load_registry()
    a = reg["quota_sample_per_source"].fn(spark, sf_dir).collect()
    b = reg["quota_sample_per_source"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = {}
    for r in a:
        per.setdefault(r["source"], []).append(r["sample_rank"])
    for src, ranks in per.items():
        assert max(ranks) <= 15, src
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), src


def test_domain_mixture_weights_flatten(spark, sf_dir):
    from node_mongo2influx_spark.plans import load_registry

    rows = load_registry()["domain_mixture_weights"].fn(spark, sf_dir).collect()
    p_nat = sum(r["p_natural"] for r in rows)
    p_mix = sum(r["p_mixture"] for r in rows)
    assert abs(p_nat - 1.0) < 1e-4 and abs(p_mix - 1.0) < 1e-4
    # alpha < 1 flattens: the biggest domain is downweighted, the
    # smallest upweighted.
    big = max(rows, key=lambda r: r["w_total"])
    small = min(rows, key=lambda r: r["w_total"])
    assert big["boost"] <= 1.0 + 1e-9
    assert small["boost"] >= 1.0 - 1e-9


def test_length_bucket_padding_matches_python(spark, sf_dir):
    from node_mongo2influx_spark.plans import load_registry

    rows = load_registry()["length_bucket_padding_stats"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect()
    buckets = {}
    for d in docs:
        n = len(d["text"].split(" "))
        cap = ((n - 1) // 64 + 1) * 64
        c, s = buckets.get(cap, (0, 0))
        buckets[cap] = (c + 1, s + n)
    assert {r["bucket_cap"]: (r["n_docs"], r["token_sum"]) for r in rows} == buckets
    for r in rows:
        assert 0 <= r["pad_frac"] <= r["pad_frac_global"] < 1


def test_word_subsample_weights_matches_python(spark, sf_dir):
    from collections import Counter

    from node_mongo2influx_spark.plans import load_registry

    rows = load_registry()["word_subsample_weights"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect()
    c = Counter(w for d in docs for w in d["text"].lower().split(" "))
    total = sum(c.values())
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert [(r["word"], r["cnt"]) for r in rows] == top
    import math

    for r in rows:
        f = r["cnt"] / total
        keep = min(1.0, (math.sqrt(f / 1e-3) + 1) * (1e-3 / f))
        assert r["p_keep"] == pytest.approx(keep, abs=1e-6)
        assert r["freq"] == pytest.approx(f, abs=1e-6)


def test_leakage_safe_split_keeps_clusters_together(spark):
    from node_mongo2influx_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(200)], "doc_id long, text string"
    )
    # 40 near-dup pairs forming chains across arbitrary ids
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(40)] + [(5, 17), (17, 29)],
        "doc_a long, doc_b long",
    )
    out = sampling.leakage_safe_split(docs, pairs)
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(split_of) == 200  # every doc assigned exactly once
    for a, b in [(i, i + 100) for i in range(40)] + [(5, 17), (17, 29), (5, 29)]:
        assert split_of[a] == split_of[b], (a, b)
    # singletons are split by their own id -> identical to plain assign_split
    plain = {
        r["doc_id"]: r["split"]
        for r in sampling.assign_split(docs).collect()
    }
    clustered = {i for i in range(40)} | {i + 100 for i in range(40)} | {5, 17, 29}
    for i in set(range(200)) - clustered:
        assert split_of[i] == plain[i]
    # all three splits are populated at this size
    assert {v for v in split_of.values()} == {"train", "val", "test"}


def test_plain_split_does_leak_but_safe_split_does_not(spark):
    # The motivating property: a per-doc hash split separates some dup
    # pairs; the cluster split separates none.
    from node_mongo2influx_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, "x") for i in range(300)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 150) for i in range(150)], "doc_a long, doc_b long"
    )
    plain = {r["doc_id"]: r["split"] for r in sampling.assign_split(docs).collect()}
    leaked_plain = sum(1 for i in range(150) if plain[i] != plain[i + 150])
    assert leaked_plain > 0  # the naive split does leak
    safe = {
        r["doc_id"]: r["split"]
        for r in sampling.leakage_safe_split(docs, pairs).collect()
    }
    assert all(safe[i] == safe[i + 150] for i in range(150))


def test_curriculum_order_layout(spark):
    from node_mongo2influx_spark.operators import sampling

    rows = [(i, float((i * 37) % 100)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = sampling.curriculum_order(df, "score", n_stages=4).collect()
    assert sorted(r["pos"] for r in out) == list(range(400))  # permutation
    score = dict(rows)
    by_stage: dict[int, list] = {}
    for r in out:
        by_stage.setdefault(r["stage"], []).append(r)
    assert set(by_stage) == {0, 1, 2, 3}
    # monotone: a strictly lower score can never land in a later stage
    for r1 in out:
        for_stage = r1["stage"]
        assert 0 <= for_stage <= 3
    stages = {r["doc_id"]: r["stage"] for r in out}
    import itertools

    sample = list(itertools.islice(((a, b) for a in range(0, 400, 13)
                                    for b in range(0, 400, 17)), 500))
    for a, b in sample:
        if score[a] < score[b]:
            assert stages[a] <= stages[b]
    # global positions: every pos in stage i precedes every pos in i+1
    for i in range(3):
        assert max(r["pos"] for r in by_stage[i]) < min(
            r["pos"] for r in by_stage[i + 1]
        )
    # deterministic and n_buckets-invariant
    again = sampling.curriculum_order(df, "score", n_stages=4, n_buckets=16)
    assert sorted(map(tuple, again.collect())) == sorted(
        (r["doc_id"], r["stage"], r["pos"]) for r in out
    )
    with pytest.raises(ValueError):
        sampling.curriculum_order(df, "score", n_stages=1)


def test_curriculum_order_omits_null_scores_keeps_pos_contiguous(spark):
    # NULL-score docs are omitted, and the omission must NOT leave holes
    # in pos: a NULL stage silently dropped by the offset join AFTER
    # being counted into the offsets would start pos at k, not 0.
    from node_mongo2influx_spark.operators import sampling

    rows = [(i, float(i % 50) if i % 7 else None) for i in range(140)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = sampling.curriculum_order(df, "score", n_stages=4).collect()
    kept = [i for i, s in rows if s is not None]
    assert len(out) == len(kept)
    assert sorted(r["pos"] for r in out) == list(range(len(kept)))
    assert {r["doc_id"] for r in out} == set(kept)
