"""End-to-end pretraining-data preparation with the round-4 operator set —
the stages a modern LLM data pipeline runs AFTER basic dedup (for which see
clean_corpus.py):

    raw documents
      → boilerplate screen    (segment-level dedup stats: drop documents
                               that are mostly cross-corpus boilerplate)
      → LM quality filter     (corpus-self-trained bigram perplexity +
                               char-entropy bounds — the CCNet shape)
      → PII redaction         (regex detect-and-replace, redacted text
                               carried forward)
      → train/val/test split  (salted hash, growth-stable)
      → SFT rendering         (val split rendered as chat-template
                               examples with a response budget)
      → context chunking      (64-word windows, stride 48)
      → sequence packing      (chunks into 2048-token bins)
      → global shuffle order  (deterministic permutation, no global sort)
      → range-sorted parquet  (disjoint per-file pos ranges: a training
                               reader consumes shards in order)

Everything stays lazy until the final write except the two count
aggregations inside the perplexity model (corpus statistics) and the
pointer-free segment stats — all Column expressions, no Python on the hot
path. Run:

    PYTHONPATH=.. python prepare_training_data.py [sf_dir] [out_dir]
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
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_data"

    engine = Engine.builder(master="local[*]", app_name="prepare-training")
    spark = engine.spark
    docs = load(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. boilerplate screen: drop documents where more than half the
    #    10-word segments also occur in another document
    seg = dedup.segment_dedup(docs, seg_words=10, max_docs=1)
    keep = seg.where(
        F.col("n_kept") * 2 >= F.col("n_segs")
    ).select("doc_id")
    docs = docs.join(keep, "doc_id", "left_semi")

    # 2. LM quality: corpus-self-trained bigram perplexity band +
    #    char-entropy floor (gibberish screen)
    ppl = text.bigram_lm_scores(docs)
    ent = text.char_entropy(docs)
    ok = (
        ppl.where(F.col("bits_per_word") <= 14.0)
        .select("doc_id")
        .join(ent.where(F.col("char_entropy") >= 2.0).select("doc_id"), "doc_id")
    )
    docs = docs.join(ok, "doc_id", "left_semi")

    # 3. PII redaction, redacted text carried forward
    red = text.redact_pii(docs, keep_text=True).select(
        "doc_id", F.col("redacted_text").alias("text")
    )

    # 4. growth-stable split
    split = sampling.assign_split(red)

    # 4b. SFT branch: the same cleaned+redacted corpus rendered as
    #     chat-template examples with a response budget — the
    #     instruction-tuning face next to the pretraining chunks
    sft = text.sft_render(
        red.join(
            split.where(F.col("split") == "val").select("doc_id"), "doc_id",
            "left_semi",
        )
    )
    sft.write.mode("overwrite").parquet(out + "_sft")

    # 5. context chunking: each chunk becomes one training sequence
    chunks = sampling.chunk_windows(split, ctx=64, stride=48).withColumn(
        "chunk_id", F.col("doc_id") * 1000 + F.col("chunk_no")
    )

    # 6. pack chunks into 2048-token bins
    packed = sampling.pack_sequences(
        chunks.select("chunk_id", F.col("n_words").alias("n_tokens")),
        id_col="chunk_id",
        ctx_len=2048,
        n_buckets=16,
    )

    # 7. deterministic global order for the training reader
    order = sampling.shuffle_order(packed, id_col="chunk_id")
    final = (
        packed.join(order, "chunk_id")
        .join(chunks.select("chunk_id", "doc_id", "chunk_md5"), "chunk_id")
        .join(split.select("doc_id", "split"), "doc_id")
    )

    # 8. layout: disjoint per-file pos ranges — shard k holds positions
    #    [k·N, (k+1)·N): readers stream shards sequentially
    range_sorted_write(final, out, cols=("pos",), n_files=8)

    got = spark.read.parquet(out)
    n_chunks = got.count()
    n_pos = got.agg(F.count_distinct("pos")).first()[0]
    n_sft = spark.read.parquet(out + "_sft").count()
    print(
        f"raw={n_raw} chunks={n_chunks} distinct_pos={n_pos} sft={n_sft} "
        f"splits={sorted(r['split'] for r in got.select('split').distinct().collect())}"
    )


if __name__ == "__main__":
    main()
