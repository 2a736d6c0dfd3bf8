"""Leakage-safe tokenizer-training pipeline — the round-5 operators
chained the way an SFT/pretraining data job actually uses them:

    raw documents
      → C4-style line cleaning      (boilerplate strip, drop-rate audited)
      → MinHash-LSH near-dup pairs
      → leakage-safe split          (dup clusters never straddle splits)
      → BPE training                (on the TRAIN split only — the
                                     tokenizer must not see eval text)
      → BPE tokenization            (all splits, same merge list)
      → curriculum order            (train split: short/easy first)
      → parquet partitioned by split

Everything before the final write is one lazy plan except the two
deliberate driver-side models (the BPE merge list and the split
components), both vocabulary/duplicates-sized. Run:

    PYTHONPATH=.. python tokenize_and_order.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from node_mongo2influx_spark.engine import Engine
from node_mongo2influx_spark.operators import dedup, sampling, text
from node_mongo2influx_spark.plans.tables import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tokenize_and_order"
    eng = Engine.builder(app_name="tokenize-and-order", master="local[8]")
    spark = eng.spark
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_raw = docs.count()

    # 1. line-level cleaning; keep docs with at least one surviving line.
    # The fixture word soup has no line structure, so nothing survives a
    # punctuation filter verbatim — re-line deterministically first (the
    # same synthesis the clean_lines_c4 oracle replays).
    w = F.split("text", " ")
    n_lines = F.ceil(F.size(w) / F.lit(8.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat(
            F.array_join(F.slice(w, i * 8 + 1, 8), " "),
            F.when(i % 3 == 2, F.lit("")).otherwise(F.lit(".")),
        ),
    )
    relined = docs.select("doc_id", F.array_join(lines, "\n").alias("text"))
    cleaned = text.clean_lines_c4(relined).where(F.col("n_lines_kept") > 0)
    # corpus feeds the pair generator, the split, and the summary count.
    corpus = cleaned.select(
        "doc_id", F.col("clean_text").alias("text")
    ).persist()

    # 2. near-dup pairs -> leakage-safe split. split_df feeds THREE
    # consumers below (trainer collect, tokenizer, split join) — persist
    # so the LSH pair generation + component contraction run once, not
    # per consumer (the multi-consumer recompute class CLAUDE.md flags).
    pairs = dedup.minhash_lsh_pairs(corpus, threshold=0.5)
    split_df = sampling.leakage_safe_split(corpus, pairs).persist()

    # 3. BPE: train on the train split ONLY, apply everywhere
    train_corpus = split_df.where(F.col("split") == "train")
    merges = text.bpe_train(train_corpus, n_merges=64)
    tokenized = text.bpe_tokenize(split_df, merges).join(
        split_df.select("doc_id", "split"), "doc_id"
    )

    # 4. curriculum order within the train split (shorter docs first)
    order = sampling.curriculum_order(
        tokenized.where(F.col("split") == "train").select(
            "doc_id", F.col("n_tokens").cast("double").alias("score")
        ),
        "score",
        n_stages=4,
    )
    final = tokenized.join(order.select("doc_id", "stage", "pos"), "doc_id", "left")

    final.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    n_out = back.count()
    splits = sorted(
        r["split"] for r in back.select("split").distinct().collect()
    )
    n_train = back.where(F.col("split") == "train").count()
    print(
        f"raw={n_raw} cleaned={corpus.count()} out={n_out} "
        f"splits={splits} train={n_train} merges={len(merges)}"
    )


if __name__ == "__main__":
    main()
