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
