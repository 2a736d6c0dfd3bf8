"""End-to-end migrate pipeline tests (SURVEY.md §5.2 item 2: golden tests
over sf0.001 into a collecting sink)."""

from __future__ import annotations

import pytest

from node_mongo2influx_spark import TransformSpec
from node_mongo2influx_spark.sinks import MemorySink, ParquetSink
from node_mongo2influx_spark.sources.catalog import DirectoryCatalog, is_system_table


@pytest.fixture()
def catalog(engine, sf_dir):
    return DirectoryCatalog(engine.spark, sf_dir)


def test_catalog_enumerates_all_fixture_tables(catalog):
    names = catalog.table_names()
    assert set(names) >= {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }


def test_system_prefix_filter_is_prefix_not_substring():
    # Deliberate fix of the reference's substring match (index.js:298),
    # which would skip a user table named "ecosystem".
    assert is_system_table("system.indexes", ("system.",))
    assert not is_system_table("ecosystem", ("system.", "system_"))


def test_migrate_events_end_to_end(engine, catalog):
    # The canonical reference example (examples/migrate.js:27-38):
    # rename date->time, keep everything else, drop rows without time.
    spec = TransformSpec(rename={"ts": "time"})
    sink = MemorySink()
    report = engine.migrate(catalog, spec, sink, tables=["events"])
    assert not report.failed
    [tr] = report.tables
    assert tr.table == "events"
    assert tr.rows_in == 1000
    assert tr.rows_skipped == 0
    assert tr.rows_written == 1000
    assert tr.success_rate == 100.0
    rows = sink.series["events"]
    assert len(rows) == 1000
    assert "time" in rows[0].asDict() and "ts" not in rows[0].asDict()


def test_migrate_skip_accounting(engine, catalog):
    # Null-out time for 'error' events to exercise F1 + M3 accounting
    # (rows_in = rows_written + rows_skipped, the reference's own invariant,
    # index.js:271).
    spec = TransformSpec(
        rename={"ts": "time"},
        set={"time": "CASE WHEN event_type = 'error' THEN NULL ELSE time END"},
    )
    sink = MemorySink()
    report = engine.migrate(catalog, spec, sink, tables=["events"])
    [tr] = report.tables
    assert tr.rows_in == 1000
    assert tr.rows_skipped > 0
    assert tr.rows_in == tr.rows_written + tr.rows_skipped
    assert all(r["time"] is not None for r in sink.series["events"])


def test_migrate_multi_table_parallel(engine, catalog):
    spec = TransformSpec(time_column=None)
    sink = MemorySink()
    report = engine.migrate(catalog, spec, sink, tables=["region", "nation", "customer"])
    assert {t.table for t in report.tables} == {"region", "nation", "customer"}
    assert not report.failed
    assert len(sink.series["nation"]) == 25


def test_migrate_truncate_mode(engine, catalog, tmp_path):
    spec = TransformSpec(rename={"ts": "time"})
    sink = ParquetSink(str(tmp_path / "out"))
    cfg_engine = type(engine)(engine.spark, engine.config.merged(empty_series=False))
    cfg_engine.migrate(catalog, spec, sink, tables=["events"])
    cfg_engine.migrate(catalog, spec, sink, tables=["events"])  # append → 2x
    n_appended = engine.spark.read.parquet(str(tmp_path / "out" / "events")).count()
    assert n_appended == 2000

    trunc_engine = type(engine)(engine.spark, engine.config.merged(empty_series=True))
    trunc_engine.migrate(catalog, spec, sink, tables=["events"])
    n_trunc = engine.spark.read.parquet(str(tmp_path / "out" / "events")).count()
    assert n_trunc == 1000


def test_table_failure_is_isolated(engine, catalog):
    # A transform referencing a missing column fails that table only.
    spec = TransformSpec(rename={"no_such_column": "time"}, time_column="time")
    sink = MemorySink()
    report = engine.migrate(catalog, spec, sink, tables=["events", "region"])
    failed = {t.table for t in report.failed}
    assert "events" in failed and "region" in failed  # both lack 'time' source
    # but the run completed and reported both tables
    assert len(report.tables) == 2


def test_fail_fast_aborts_run(engine, catalog):
    import pytest

    spec = TransformSpec(rename={"no_such_column": "time"})
    sink = MemorySink()
    ff = type(engine)(engine.spark, engine.config.merged(fail_fast=True))
    with pytest.raises(Exception):
        ff.migrate(catalog, spec, sink, tables=["events", "region"])


def test_influx_transport_truncate(engine, sf_dir):
    # HttpTransport.truncate: parameterized DELETE via /query, and the
    # unsafe-name guard refuses injection-shaped series names.
    import pytest

    from node_mongo2influx_spark.sinks.influx import HttpTransport

    t = HttpTransport("http://127.0.0.1:9", "db")
    with pytest.raises(ValueError):
        t.truncate('x"; DROP MEASUREMENT "y')


def test_config_merge_explicit_falsy_wins(engine):
    cfg = engine.config.merged(logging=False, table_concurrency=1)
    assert cfg.logging is False
    assert cfg.table_concurrency == 1
    with pytest.raises(ValueError):
        engine.config.merged(nonexistent_key=1)
