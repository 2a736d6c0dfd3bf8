"""Fixture table loading shared by all plan modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from node_mongo2influx_spark.sources.parquet_compat import read_parquet

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load(spark, sf_dir, n) for n in TABLE_NAMES}


def stable_round(col, digits: int = 4):
    """Engine-stable rounding: floor(x·10^d + 0.5)/10^d.

    Spark's round() (BigDecimal HALF_UP on the exact decimal expansion) and
    DuckDB's round() disagree on exact .5-at-last-digit boundaries — which
    averages of 2-decimal currency values hit SYSTEMATICALLY (sum/8 ends in
    .00005). This formulation is plain IEEE double arithmetic, identical in
    both engines; pair it with stable_round_sql in the oracle.
    """
    from pyspark.sql import functions as F

    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / scale


def stable_round_sql(expr: str, digits: int = 4) -> str:
    """DuckDB-side twin of :func:`stable_round` (same doubles, same result)."""
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def load_events_timed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table under the reference's time-validity rule
    (index.js:235 / SURVEY F1): rows WITHOUT a valid timestamp are not
    time-series input. Every time-bucketing / time-ordering query loads
    through this so its Spark plan and its DuckDB oracle agree on the
    row set explicitly — Spark's window()/session_window() silently
    DROP NULL timestamps while a SQL GROUP BY time_bucket(...) keeps a
    NULL bucket, and NULL ordering defaults differ per engine (caught
    by tools/nullify_fixtures.py's ts class, round 8)."""
    from pyspark.sql import functions as F

    return load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
