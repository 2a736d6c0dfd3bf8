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
