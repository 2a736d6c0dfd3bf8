"""Portable HyperLogLog (functions/hll.py): the oracle-checkable sketch tier.

The driver witnesses cross-engine hash equality (`hll_portable_distinct`,
`sliding_distinct_hll`); these tests pin the SKETCH algebra itself:

* max-merge of partial registers == registers of the union (the property
  that makes HLL the 100 TB distinct answer — map-side combine, stored
  per-batch partials, merge-on-read);
* accuracy in BOTH estimator regimes (raw harmonic ≥ 2.5·m, linear
  counting below);
* COUNT(DISTINCT) semantics for NULLs; empty input.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from node_mongo2influx_spark.functions.hll import (
    HLL_LC_CUTOFF,
    HLL_M,
    hll_count_distinct,
    hll_estimate,
    hll_registers,
)


def _est(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_raw_regime_accuracy(spark):
    # 10k distinct ids >> 2.5·m = 640: the harmonic (raw) branch. rsd for
    # m=256 is ~6.5%; 3·rsd is a comfortable deterministic bound (the
    # estimate is a pure function of the fixed FNV hash — no flakiness).
    df = spark.range(10_000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    r = _est(hll_count_distinct(df, ["g"], "v"))
    assert r["zero_buckets"] == 0 or r["hll_estimate"] > HLL_LC_CUTOFF
    assert abs(r["hll_estimate"] - 10_000) / 10_000 < 0.20


def test_linear_counting_regime_accuracy(spark):
    # 150 distinct < 2.5·m: the linear-counting branch — near-exact.
    df = spark.range(150).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    r = _est(hll_count_distinct(df, ["g"], "v"))
    assert r["zero_buckets"] > 0
    assert abs(r["hll_estimate"] - 150) / 150 < 0.10


def test_duplicates_do_not_move_the_estimate(spark):
    # 200 distinct values, each repeated 50×: registers are max() of a
    # per-value hash, so multiplicity is invisible by construction.
    once = spark.range(200).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    many = spark.range(10_000).select(
        F.lit("g").alias("g"), (F.col("id") % 200).alias("v")
    )
    assert (
        _est(hll_count_distinct(once, ["g"], "v"))["hll_estimate"]
        == _est(hll_count_distinct(many, ["g"], "v"))["hll_estimate"]
    )


def test_partial_registers_max_merge_to_union(spark):
    # The mergeability property: registers built over two DISJOINT halves,
    # max-merged, must equal the registers (and estimate) of the whole.
    df = spark.range(5_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    half_a = df.where(F.col("v") % 2 == 0)
    half_b = df.where(F.col("v") % 2 == 1)
    merged_regs = (
        hll_registers(half_a, ["g"], "v")
        .unionByName(hll_registers(half_b, ["g"], "v"))
        .groupBy("g", "__bucket")
        .agg(F.max("__m").alias("__m"))
    )
    whole = _est(hll_estimate(hll_registers(df, ["g"], "v"), ["g"]))
    merged = _est(hll_estimate(merged_regs, ["g"]))
    assert merged["sum_inv_scaled"] == whole["sum_inv_scaled"]
    assert merged["hll_estimate"] == whole["hll_estimate"]


def test_nulls_ignored_like_count_distinct(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", None), ("g", None)], "g string, v long"
    )
    r = _est(hll_count_distinct(df, ["g"], "v"))
    # 2 distinct non-null values: linear counting is exact this small
    assert r["hll_estimate"] == pytest.approx(2.0, abs=0.05)
    assert r["used_buckets"] <= 2


def test_empty_input_no_groups(spark):
    df = spark.createDataFrame([], "g string, v long")
    assert hll_count_distinct(df, ["g"], "v").count() == 0


def test_per_group_independence(spark):
    # two groups with different cardinalities estimate independently
    df = spark.range(1_000).select(
        F.when(F.col("id") < 900, "big").otherwise("small").alias("g"),
        F.col("id").alias("v"),
    )
    rows = {r["g"]: r for r in hll_count_distinct(df, ["g"], "v").collect()}
    assert abs(rows["big"]["hll_estimate"] - 900) / 900 < 0.15
    assert abs(rows["small"]["hll_estimate"] - 100) / 100 < 0.15
    assert rows["big"]["used_buckets"] + rows["big"]["zero_buckets"] == HLL_M


# ---------------------------------------------------------------------------
# histogram_quantile_sketch (plans/relational.py): the quantile sibling of
# the portable HLL — fixed-boundary integer histograms are the mergeable
# quantile sketch whose estimate IS oracle-checkable. The driver witnesses
# cross-engine equality; these pin accuracy and mergeability.
# ---------------------------------------------------------------------------


def test_histogram_quantile_accuracy_within_bin_width(spark):
    from node_mongo2influx_spark.plans.relational import (
        histogram_quantile_sketch,
    )

    rows = histogram_quantile_sketch(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        for q in ("p25", "p50", "p75"):
            # the estimate interpolates inside one 8-unit bin: it can
            # never be further than a bin width from the exact quantile
            assert abs(r[f"est_{q}"] - r[f"exact_{q}"]) <= 8.01, (r, q)


def test_histogram_counts_merge_across_slices(spark):
    # fixed boundaries ⇒ per-slice bin counts SUM to the union's counts —
    # the mergeable-partial property (per-batch storability) that
    # t-digest has but cannot oracle-check.
    df = spark.range(1_000).select(
        F.lit("g").alias("g"), (F.col("id") % 512).cast("long").alias("cents")
    )
    def hist(d):
        return d.groupBy(
            "g", F.least(F.expr("cents div 8"), F.lit(63)).alias("bin")
        ).agg(F.count(F.lit(1)).alias("cnt"))

    whole = {r["bin"]: r["cnt"] for r in hist(df).collect()}
    halves = (
        hist(df.where(F.col("id") % 2 == 0))
        .unionByName(hist(df.where(F.col("id") % 2 == 1)))
        .groupBy("g", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    merged = {r["bin"]: r["cnt"] for r in halves.collect()}
    assert merged == whole


# ---------------------------------------------------------------------------
# pca_power_probe (plans/llm_ops.py): the PCA family's oracle-exact witness.
# The driver gates cross-engine bit-equality; this gates that the unrolled
# power iteration actually converges to numpy's top eigenpair.
# ---------------------------------------------------------------------------


def test_pca_power_probe_matches_numpy(spark):
    import numpy as np

    from node_mongo2influx_spark.plans.llm_ops import pca_power_probe
    from node_mongo2influx_spark.sources.parquet_compat import read_parquet

    r = pca_power_probe(spark, "/root/testdata/sf0.001").collect()[0]
    v_probe = np.array([r[f"l{i}"] for i in range(16)])

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    mat = np.array([row["embedding"][:16] for row in emb.collect()], dtype=np.float64)
    q = np.floor(mat * 1e3 + 0.5)  # the probe's milli-unit quantization
    gram = q.T @ q
    evals, evecs = np.linalg.eigh(gram)
    top_val, top_vec = evals[-1], evecs[:, -1]

    cos = abs(float(v_probe @ top_vec) / np.linalg.norm(v_probe))
    assert cos > 0.999, f"power iteration did not converge: |cos|={cos}"
    assert abs(r["eigval"] - top_val) / top_val < 0.01


def test_source_overlap_hll_accuracy(spark):
    # the sketch intersection must track the exact shared counts — at
    # fixture scale (small sets, linear-counting regime) within a few
    # docs; the estimate is deterministic so the bound is exact-repeatable
    from node_mongo2influx_spark.plans.llm_ops import source_overlap_hll

    rows = source_overlap_hll(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        # inclusion-exclusion noise can push the estimate slightly
        # NEGATIVE for disjoint pairs (the union estimate is not
        # guaranteed subadditive) — the bound is on the absolute error
        assert abs(r["hll_intersection"] - r["exact_shared"]) <= 8.0, r


def test_bloom_membership_no_false_negatives(spark):
    # the Bloom guarantee: every exact dup is a bloom hit; false
    # positives exist but must stay near the designed epsilon
    from node_mongo2influx_spark.plans.llm_ops import dedup_incremental_bloom

    rows = dedup_incremental_bloom(spark, "/root/testdata/sf0.01").collect()
    assert rows
    assert not any(r["false_negative"] for r in rows)
    assert all(r["bloom_hit"] for r in rows if r["exact_dup"])
    non_dup = [r for r in rows if not r["exact_dup"]]
    if non_dup:
        fp_rate = sum(r["bloom_hit"] for r in non_dup) / len(non_dup)
        # designed epsilon ~0.2% at sf0.1 fill; 5% is a generous ceiling
        assert fp_rate < 0.05, fp_rate
