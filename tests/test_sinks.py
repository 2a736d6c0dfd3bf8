"""Sink adapter tests: line-protocol rendering, insertlimit batching, spool
transport, truncate semantics."""

from __future__ import annotations

import datetime
import pathlib

from node_mongo2influx_spark import TransformSpec
from node_mongo2influx_spark.sinks import InfluxLineProtocolSink, NoopSink
from node_mongo2influx_spark.sinks.influx import SpoolTransport, batches, render_lines


def _points(spark):
    return spark.createDataFrame(
        [
            (datetime.datetime(2024, 1, 1, 0, 0, 0), 1.5, 7, 'say "hi"', True),
            (datetime.datetime(2024, 1, 1, 0, 0, 1), None, 8, None, False),
        ],
        "time timestamp, value double, n long, note string, ok boolean",
    )


def test_render_lines_types_and_nulls(spark):
    lines = sorted(r["line"] for r in render_lines(_points(spark), "cpu load").collect())
    # measurement escaped; int gets 'i'; string quoted+escaped; nulls omitted
    assert lines[0] == 'cpu\\ load n=8i,ok=false 1704067201000000000'
    assert lines[1] == (
        'cpu\\ load value=1.5,n=7i,note="say \\"hi\\"",ok=true 1704067200000000000'
    )


def test_render_drops_all_null_field_rows(spark):
    # a row with every non-time field NULL would be invalid line protocol
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1), None, None),
         (datetime.datetime(2024, 1, 2), 1.0, "x")],
        "time timestamp, v double, s string",
    )
    lines = [r["line"] for r in render_lines(df, "m").collect()]
    assert len(lines) == 1 and 'v=1.0,s="x"' in lines[0]


def test_spool_truncate_removes_stale_batches(spark, tmp_path):
    from node_mongo2influx_spark.sinks.influx import SpoolTransport

    t = SpoolTransport(str(tmp_path))
    t("events", ["a b 1"])
    assert list(pathlib.Path(tmp_path, "events").glob("*.lp"))
    t.truncate("events")
    assert not list(pathlib.Path(tmp_path, "events").glob("*.lp"))


def test_truncate_without_support_raises(spark):
    import pytest

    sink = InfluxLineProtocolSink(lambda s, l: None)  # bare callable transport
    with pytest.raises(RuntimeError):
        sink.truncate("x")


def test_insertlimit_batching():
    got = list(batches(iter(["a", "b", "c", "d", "e"]), 2))
    assert got == [["a", "b"], ["c", "d"], ["e"]]


def test_spool_transport_end_to_end(spark, tmp_path):
    sink = InfluxLineProtocolSink(SpoolTransport(str(tmp_path)), insert_limit=100)
    sink.write(_points(spark), "events")
    files = list(pathlib.Path(tmp_path, "events").glob("*.lp"))
    assert files
    lines = [ln for f in files for ln in f.read_text().splitlines()]
    assert len(lines) == 2
    assert all(ln.startswith("events ") for ln in lines)


def test_noop_sink_runs_plan(spark):
    NoopSink().write(_points(spark), "x")  # must not raise


def test_full_pipeline_into_influx_sink(engine, sf_dir, tmp_path):
    from node_mongo2influx_spark.sources.catalog import DirectoryCatalog

    catalog = DirectoryCatalog(engine.spark, sf_dir)
    sink = InfluxLineProtocolSink(SpoolTransport(str(tmp_path)), insert_limit=150)
    report = engine.migrate(
        catalog, TransformSpec(rename={"ts": "time"}), sink, tables=["events"]
    )
    assert not report.failed
    lines = [
        ln
        for f in pathlib.Path(tmp_path, "events").glob("*.lp")
        for ln in f.read_text().splitlines()
    ]
    assert len(lines) == 1000
