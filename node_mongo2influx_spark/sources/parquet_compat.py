"""Nanosecond-timestamp-safe parquet reader.

The fixture parquet files store timestamps as ``TIMESTAMP(NANOS)``, which
Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). The supported
escape is ``spark.sql.legacy.parquet.nanosAsLong`` — nanos come in as
LongType — after which Spark has lost which longs were timestamps. We
recover that from the parquet footer (pyarrow, driver-side metadata read —
one footer per table, no data scan) and rebuild proper ``TimestampType``
columns with ``timestamp_micros(v div 1000)``.

The conversion is a Column expression (JVM-side, codegen-friendly) and the
nano→micro truncation is lossless for this data (values are generated at
microsecond precision). All fixture reads go through here so the engine works
under any caller-provided SparkSession config.
"""

from __future__ import annotations

import pathlib
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The nanosAsLong conf is session-global; concurrent reads (Engine.migrate
#: runs table_concurrency threads) must not interleave their set/restore
#: windows or one thread's restore breaks another's analysis.
_CONF_LOCK = threading.Lock()


def _nanos_timestamp_columns(path: str) -> list[str]:
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    first = path
    p = pathlib.Path(path)
    if p.is_dir():
        parts = sorted(p.glob("*.parquet"))
        if not parts:
            return []
        first = str(parts[0])
    schema = pq.read_schema(first)
    return [
        f.name
        for f in schema
        if pt.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` that tolerates TIMESTAMP(NANOS) columns."""
    ns_cols = _nanos_timestamp_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    with _CONF_LOCK:
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
            # Force plan analysis while the conf is set.
            df.schema
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return df.withColumns(
        {c: F.timestamp_micros(F.expr(f"`{c}` div 1000")) for c in ns_cols}
    )
