"""Parquet directory sink: one sub-directory per series.

The scale-correct default destination: columnar, splittable, exactly-once via
Spark's file commit protocol. Truncate-then-load (reference `emptySeries`,
index.js:321-336) maps onto ``mode("overwrite")`` — atomic per series, unlike
the reference's separate DELETE round-trip.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame

from node_mongo2influx_spark.sinks.base import Sink


class ParquetSink(Sink):
    supports_truncate = True

    def __init__(self, path: str, partition_by: tuple[str, ...] = ()) -> None:
        self.path = pathlib.Path(path)
        self.partition_by = partition_by
        self._truncated: set[str] = set()

    def write(self, df: DataFrame, series: str) -> int:
        mode = "overwrite" if series in self._truncated else "append"
        writer = df.write.mode(mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(str(self.path / series))
        self._truncated.discard(series)
        return -1

    def truncate(self, series: str) -> None:
        # Deferred: realized as overwrite mode on the next write, which is
        # atomic (no window where the series is empty), unlike the
        # reference's DELETE-then-insert (index.js:328).
        self._truncated.add(series)
