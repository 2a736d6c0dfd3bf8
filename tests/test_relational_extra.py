"""Extra relational operator tests not covered by the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from node_mongo2influx_spark.plans import load_registry
from node_mongo2influx_spark.plans.tables import load


def test_approx_distinct_close_to_exact(spark, sf_dir):
    reg = load_registry()
    approx = {
        r["event_type"]: r["approx_users"]
        for r in reg["approx_distinct_users"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)


def test_sessionize_invariants(spark, sf_dir):
    reg = load_registry()
    rows = reg["sessionize_events"].fn(spark, sf_dir).collect()
    total_events = load(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == total_events
    assert all(1 <= r["n_sessions"] <= r["n_events"] for r in rows)


def test_gapfill_grid_is_dense(spark, sf_dir):
    reg = load_registry()
    rows = reg["gapfill_minutely"].fn(spark, sf_dir).collect()
    times = sorted(r["bucket"] for r in rows)
    diffs = {
        (b - a).total_seconds() for a, b in zip(times, times[1:])
    }
    assert diffs == {3600.0}  # dense hourly grid, no holes
    assert any(r["n"] == 0 for r in rows) or len(rows) > 0
