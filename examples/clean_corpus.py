"""End-to-end training-corpus preparation pipeline — the §2.12 operators
chained the way a pretraining data job actually uses them:

    raw documents
      → exact dedup           (content hash, keep lowest id)
      → near-dup dedup        (MinHash-LSH pairs → connected components →
                               drop non-canonical)
      → quality filter        (length / repetition / stopword signals)
      → train/val/test split  (salted hash, growth-stable)
      → sequence packing      (2048-token bins, bucketed prefix sums)
      → range-sorted parquet  (disjoint per-file id ranges)

Every stage is lazy until the final write — one Spark job graph, no
intermediate materialization except the scoped persist inside the LSH pair
generator. Run:

    PYTHONPATH=.. python clean_corpus.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from node_mongo2influx_spark.engine import Engine
from node_mongo2influx_spark.operators import dedup, sampling, text
from node_mongo2influx_spark.plans.tables import load
from node_mongo2influx_spark.sinks.parquet import range_sorted_write


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/clean_corpus"

    engine = Engine.builder(master="local[*]", app_name="clean-corpus")
    spark = engine.spark
    docs = load(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. exact dedup: keep the lowest doc_id per content hash
    keep_exact = dedup.exact(docs, text_col="text", id_col="doc_id").select(
        F.col("keep_doc_id").alias("doc_id")
    )
    docs = docs.join(keep_exact, "doc_id", "left_semi")

    # 2. near-dup dedup at scale: LSH pairs -> components -> drop dups
    pairs = dedup.minhash_lsh_pairs(
        docs, text_col="text", id_col="doc_id", threshold=0.5
    )
    comp = dedup.components_from_pairs(pairs)
    drop = comp.where(F.col("component_id") < F.col("doc_id")).select("doc_id")
    docs = docs.join(drop, "doc_id", "left_anti")

    # 3. quality filter: length + stopword heuristics (Column exprs only)
    scored = text.quality(docs, text_col="text", id_col="doc_id")
    docs = docs.join(
        scored.where(
            (F.col("n_tokens") >= 5) & (F.col("stopword_ratio") <= 0.9)
        ).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 4. deterministic split (growth-stable salted hash)
    docs = sampling.assign_split(docs)

    # 5. sequence packing: 2048-token context windows
    toks = docs.select(
        "doc_id",
        "split",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    packed = sampling.pack_sequences(
        toks.select("doc_id", "n_tokens"), ctx_len=2048, n_buckets=16
    ).join(toks.select("doc_id", "split"), "doc_id")

    # 6. layout: disjoint per-file id ranges so downstream readers prune
    range_sorted_write(packed, out, cols=("doc_id",), n_files=8)

    kept = spark.read.parquet(out)
    print(
        f"raw={n_raw} packed_rows={kept.count()} "
        f"splits={sorted(r['split'] for r in kept.select('split').distinct().collect())} "
        f"bins={kept.agg(F.count_distinct('bucket', 'bin')).first()[0]}"
    )


if __name__ == "__main__":
    main()
