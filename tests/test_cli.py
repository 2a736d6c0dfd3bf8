"""CLI end-to-end test (reuses the session via direct main() call)."""

from __future__ import annotations

import json

from node_mongo2influx_spark.cli import main


def test_cli_migrate_to_parquet(spark, sf_dir, tmp_path, capsys):
    rc = main(
        [
            "--source", sf_dir,
            "--sink", f"parquet:{tmp_path}/out",
            "--tables", "events",
            "--rename", "ts=time",
            "--drop", "props",
            "--master", "local[4]",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["tables"]["events"]["rows_written"] == 1000
    assert report["failed"] == []
    df = spark.read.parquet(f"{tmp_path}/out/events")
    assert df.count() == 1000
    assert "props" not in df.columns and "time" in df.columns


def test_cli_bad_sink_spec():
    import pytest

    with pytest.raises(SystemExit):
        main(["--source", "/tmp", "--sink", "bogus:x"])
