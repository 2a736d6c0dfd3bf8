"""Partitioned parquet sink → partition pruning on read-back.

At 100 TB the destination layout IS the query accelerator: partitioning the
sink by day means downstream time-range queries scan only matching
directories (PartitionFilters), not the whole series.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from node_mongo2influx_spark import TransformSpec
from node_mongo2influx_spark.sinks import ParquetSink
from node_mongo2influx_spark.sources.catalog import DirectoryCatalog


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partitioned_sink_prunes_on_read(engine, sf_dir, tmp_path):
    catalog = DirectoryCatalog(engine.spark, sf_dir)
    sink = ParquetSink(str(tmp_path / "out"), partition_by=("day",))
    spec = TransformSpec(
        rename={"ts": "time"},
        set={"day": "CAST(date_trunc('day', time) AS DATE)"},
    )
    report = engine.migrate(catalog, spec, sink, tables=["events"])
    assert not report.failed and report.rows_written == 1000

    back = engine.spark.read.parquet(str(tmp_path / "out" / "events"))
    one_day = back.where(F.col("day") == "2024-01-02")
    plan = _plan(one_day)
    # the day predicate must be a partition filter (directory pruning),
    # not a data filter
    assert "PartitionFilters" in plan and "isnotnull(day" in plan
    n = one_day.count()
    assert 0 < n < 1000
    # and day directories exist on disk
    assert (tmp_path / "out" / "events" / "day=2024-01-02").exists()
