"""The example scripts must keep running — they are the documented usage."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_clean_corpus_example(spark, sf_dir, tmp_path, capsys):
    import clean_corpus

    old = sys.argv
    sys.argv = ["clean_corpus.py", sf_dir, str(tmp_path / "out")]
    try:
        clean_corpus.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "raw=500" in out and "splits=['test', 'train', 'val']" in out
    packed = spark.read.parquet(str(tmp_path / "out"))
    # dedup + quality filter drop some docs, never add
    assert 0 < packed.count() <= 500
    assert {"doc_id", "bucket", "bin", "n_tokens", "start_offset", "split"} <= set(
        packed.columns
    )


def test_prepare_training_data_example(spark, sf_dir, tmp_path, capsys):
    import prepare_training_data

    old = sys.argv
    sys.argv = ["prepare_training_data.py", sf_dir, str(tmp_path / "out2")]
    try:
        prepare_training_data.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "raw=500" in out
    got = spark.read.parquet(str(tmp_path / "out2"))
    n = got.count()
    assert n > 0
    # shuffle positions are a contiguous 0..n-1 permutation over chunks
    from pyspark.sql import functions as F

    agg = got.agg(
        F.count_distinct("pos").alias("d"),
        F.min("pos").alias("mn"),
        F.max("pos").alias("mx"),
    ).first()
    assert (agg["d"], agg["mn"], agg["mx"]) == (n, 0, n - 1)
    assert {"chunk_id", "doc_id", "pos", "bucket", "bin", "split"} <= set(
        got.columns
    )


def test_tokenize_and_order_example(spark, sf_dir, tmp_path, capsys):
    import tokenize_and_order

    old = sys.argv
    sys.argv = ["tokenize_and_order.py", sf_dir, str(tmp_path / "out3")]
    try:
        tokenize_and_order.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "raw=500" in out and "merges=64" in out
    got = spark.read.parquet(str(tmp_path / "out3"))
    from pyspark.sql import functions as F

    # every row tokenized; train rows carry a contiguous curriculum pos
    assert got.where(F.col("n_tokens").isNull()).count() == 0
    train = got.where(F.col("split") == "train").select("pos").collect()
    poss = sorted(r["pos"] for r in train)
    assert poss == list(range(len(poss)))
    # leakage-safety: recompute pairs on the written corpus and check no
    # pair straddles splits
    from node_mongo2influx_spark.operators import dedup

    splits = {r["doc_id"]: r["split"] for r in got.collect()}
    docs = got.select("doc_id", F.concat_ws(" ", "tokens").alias("text"))
    for r in dedup.minhash_lsh_pairs(docs, threshold=0.8).collect():
        assert splits[r["doc_a"]] == splits[r["doc_b"]]
