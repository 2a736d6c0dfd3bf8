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


def test_cli_compact(spark, sf_dir, tmp_path, capsys):
    # seed a fragmented series, then compact it via the CLI
    base = spark.read.parquet(f"{sf_dir}/region.parquet")
    for _ in range(3):
        base.repartition(6).write.mode("append").parquet(f"{tmp_path}/c/region")
    import pathlib

    before = len(list(pathlib.Path(f"{tmp_path}/c/region").rglob("*.parquet")))
    assert before >= 12  # 3 appends × ≥4 non-empty part files
    rc = main(
        ["--sink", f"parquet:{tmp_path}/c", "--compact", "region",
         "--master", "local[4]"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_after"] < before
    assert spark.read.parquet(f"{tmp_path}/c/region").count() == 3 * base.count()


def test_cli_migrate_spool_source(spark, sf_dir, tmp_path, capsys):
    import json as _json

    from node_mongo2influx_spark.plans.tables import load

    dump = tmp_path / "dump" / "readings"
    dump.mkdir(parents=True)
    rows = load(spark, sf_dir, "events").select("event_id", "ts", "value").limit(50).collect()
    with open(dump / "p0.jsonl", "w") as fh:
        for r in rows:
            fh.write(_json.dumps({
                "event_id": r["event_id"],
                "date": {"$date": int(r["ts"].timestamp() * 1000)},
                "value": r["value"],
            }) + "\n")
    rc = main([
        "--source", f"spool:{tmp_path}/dump",
        "--sink", f"parquet:{tmp_path}/out",
        "--rename", "date=time",
        "--master", "local[4]",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["tables"]["readings"]["rows_written"] == 50
    df = spark.read.parquet(f"{tmp_path}/out/readings")
    assert df.count() == 50 and "time" in df.columns


def test_cli_adhoc_sql(capsys):
    from node_mongo2influx_spark.cli import main

    rc = main([
        "--sql",
        "SELECT event_type, count(*) AS n FROM events "
        "GROUP BY event_type ORDER BY event_type",
        "--source", "/root/testdata/sf0.001",
        "--master", "local[4]",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "rows: 5" in out and "click" in out
