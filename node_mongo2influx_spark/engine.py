"""Engine: session management + the multi-table migrate driver.

This is the Spark-first re-expression of the reference's pipeline
(/root/reference/index.js:340-370 `migrate` → :290-317 `migrateCollections`
→ :177-278 `migrateCollection`): enumerate all source tables, skip system
tables, optionally truncate each destination series, run
read → transform → time-filter → write per table with bounded cross-table
parallelism, and account rows/skips/throughput.

What collapses away under Spark (SURVEY.md §3-4): skip/limit pagination
(input splits), serial page/batch loops (partition-parallel tasks), manual
heap management, and the 500 ms throughput sampler (one-pass ``observe``
metrics + the Spark UI). What remains is ~100 lines of driver logic.
"""

from __future__ import annotations

import logging
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from node_mongo2influx_spark.config import EngineConfig
from node_mongo2influx_spark.operators.transform import TransformSpec
from node_mongo2influx_spark.sinks.base import Sink
from node_mongo2influx_spark.sources.catalog import Catalog

logger = logging.getLogger("node_mongo2influx_spark")


@dataclass
class TableReport:
    """Per-table outcome — the engine analogue of the reference's per-
    collection completion log (index.js:266-273)."""

    table: str
    rows_in: int = 0
    rows_written: int = 0
    rows_skipped: int = 0
    seconds: float = 0.0
    error: str | None = None

    @property
    def success_rate(self) -> float:
        """``100/itemCount*(itemCount-rowsSkipped)`` (index.js:271-272)."""
        if self.rows_in == 0:
            return 100.0
        return 100.0 / self.rows_in * (self.rows_in - self.rows_skipped)

    @property
    def rows_per_sec(self) -> float:
        """End-to-end analogue of the reference's `ips` (index.js:219)."""
        return self.rows_written / self.seconds if self.seconds > 0 else 0.0


@dataclass
class MigrationReport:
    tables: list[TableReport] = field(default_factory=list)
    seconds: float = 0.0

    @property
    def rows_written(self) -> int:
        return sum(t.rows_written for t in self.tables)

    @property
    def rows_skipped(self) -> int:
        return sum(t.rows_skipped for t in self.tables)

    @property
    def failed(self) -> list[TableReport]:
        return [t for t in self.tables if t.error is not None]


class Engine:
    """Owns a SparkSession + config; runs migrations and hosts the operator
    library. Instance-scoped by design (the reference is module-global,
    index.js:21-23 — two instances would share state)."""

    def __init__(self, spark: SparkSession, config: EngineConfig | None = None) -> None:
        self.spark = spark
        self.config = config or EngineConfig()

    # -- session ----------------------------------------------------------
    @staticmethod
    def builder(
        app_name: str = "node_mongo2influx_spark",
        master: str | None = None,
        config: EngineConfig | None = None,
    ) -> "Engine":
        """Create an Engine with scale-appropriate session defaults: AQE on
        (runtime partition coalescing + skew-join handling), Arrow for any
        pandas interchange, sane local shuffle parallelism."""
        cfg = config or EngineConfig()
        b = SparkSession.builder.appName(app_name)
        if master:
            b = b.master(master)
        defaults = {
            # local-mode JVM heap: Spark's 1g default is sized for a
            # driver that only coordinates, but in local[32] the SAME JVM
            # runs all 32 executor threads — big shuffles hit GC-locker
            # stalls and premature spill. Ignored when attaching to an
            # existing session; on a real cluster the resource manager
            # sets executor memory instead.
            "spark.driver.memory": "8g",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.sql.shuffle.partitions": str(cfg.shuffle_partitions),
            "spark.sql.session.timeZone": "UTC",
            # Spark's 10 MB broadcast ceiling predates modern executor
            # memory; 64 MB broadcasts mid-size dims (saving a shuffle of
            # the fact side) while truly large tables still exceed it.
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            # Let Python Data Sources (sources/mongospool.py) receive
            # pushed filters; off by default in Spark 4.1.
            "spark.sql.python.filterPushdown.enabled": "true",
            # NOTE on canChangeCachedPlanOutputPartitioning (deliberately
            # NOT set): it was briefly enabled so persisted iteration
            # intermediates would AQE-coalesce, but the iterative
            # operators now localCheckpoint instead of persist (coalescing
            # applies to checkpoints regardless), and the flag measurably
            # HURT the LSH queries — their cached mid-size tables
            # coalesced to one partition and downstream CPU-bound scoring
            # lost parallelism (dedup_minhash_lsh 0.84→1.06 s at sf0.1).
        }
        defaults.update(cfg.spark_conf)
        for k, v in defaults.items():
            b = b.config(k, v)
        return Engine(b.getOrCreate(), cfg)

    # -- the pipeline -------------------------------------------------------
    def migrate(
        self,
        catalog: Catalog,
        transform: TransformSpec,
        sink: Sink,
        tables: list[str] | None = None,
    ) -> MigrationReport:
        """Migrate every (non-system) table from ``catalog`` through
        ``transform`` into ``sink``; the reference's `migrate`
        (index.js:340-370) end to end.

        Cross-table parallelism: a driver thread pool of
        ``config.table_concurrency`` (reference `limit`, `async.eachLimit`
        index.js:294) submits concurrent Spark jobs; Spark's scheduler
        interleaves their tasks across the cluster. Within a table,
        partition parallelism replaces the reference's serial page/batch
        loops (index.js:194, :227).
        """
        if tables is not None:
            names = tables
        else:
            # Enumerate names only — Catalog.tables() would also construct
            # every DataFrame (a schema-inference scan for csv/json), all
            # discarded here and re-read in _migrate_table.
            from node_mongo2influx_spark.sources.catalog import is_system_table

            names = [
                n
                for n in catalog.table_names()
                if not is_system_table(n, self.config.system_prefixes)
            ]
        report = MigrationReport()
        t0 = time.monotonic()
        max_workers = max(1, self.config.table_concurrency)
        done = 0
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            futures = {
                pool.submit(self._migrate_table, catalog, name, transform, sink): name
                for name in names
            }
            from concurrent.futures import as_completed

            for fut in as_completed(futures):
                name = futures[fut]
                try:
                    report.tables.append(fut.result())
                except Exception as exc:
                    # Default: isolate failures per table and report them
                    # (deviation from the reference, which aborts the whole
                    # run on first error — async.eachLimit semantics,
                    # index.js:294-316). fail_fast=True restores reference
                    # behavior: cancel what hasn't started, re-raise.
                    report.tables.append(TableReport(table=name, error=str(exc)))
                    if self.config.logging:
                        logger.exception("table %s failed", name)
                    if self.config.fail_fast:
                        for f in futures:
                            f.cancel()
                        report.seconds = time.monotonic() - t0
                        raise
                done += 1
                if self.config.logging:
                    # Overall progress (reference M2, index.js:126) — but
                    # counting FINISHED tables, not started (SURVEY §4.3.4).
                    logger.info(
                        "progress: %d/%d tables (%.0f%%)",
                        done, len(names), 100.0 * done / max(len(names), 1),
                    )
        report.seconds = time.monotonic() - t0
        return report

    def _migrate_table(
        self, catalog: Catalog, name: str, transform: TransformSpec, sink: Sink
    ) -> TableReport:
        t0 = time.monotonic()
        if self.config.logging:
            logger.info("table %s: starting", name)
        if self.config.empty_series:
            sink.truncate(name)
        df = catalog.read(name)
        out, obs = transform.apply(df)
        written = sink.write(out, name)
        rep = TableReport(table=name, seconds=time.monotonic() - t0)
        if obs is not None:
            stats = obs.get
            rep.rows_in = stats["rows_in"]
            rep.rows_skipped = stats["rows_skipped"]
            rep.rows_written = (
                written if written >= 0 else rep.rows_in - rep.rows_skipped
            )
        else:
            rep.rows_written = written if written >= 0 else 0
        if self.config.logging:
            logger.info(
                "table %s: %d rows in, %d written, %d skipped "
                "(success %.1f%%, %.0f rows/s)",
                name, rep.rows_in, rep.rows_written, rep.rows_skipped,
                rep.success_rate, rep.rows_per_sec,
            )
        return rep
