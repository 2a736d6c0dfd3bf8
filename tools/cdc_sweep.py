"""Adversarial sweep for the CDC faces (round 8, VERDICT r7 #7).

The query-registry sweeps (empty/1-row/sparse/nullified fixtures) never
reach the ``guard_seq`` / ``evolve_schema`` / ``sweep_moved_keys`` /
``upsert_guarded_moving`` COMPOSITION paths — those run inside
``foreachBatch``, not as registered queries. This sweep drives each
composition through its degenerate deltas:

  1. empty delta — every mode is a no-op (upsert returns 0, store
     byte-stable, no crash on the reduce/window over zero rows),
  2. empty delta that also carries NEW columns (evolve_schema): still a
     no-op — a zero-row batch must not rewrite partitions just to widen
     their schema,
  3. 100% stale delta (every row's __seq below the stored version) —
     guarded modes leave the store set-equal; the guarded-moving face
     also under stale rows CLAIMING new partitions (no stray dirs),
  4. evolve + guard + moved key in ONE batch: a key migrates partitions,
     out of order, while the delta adds a column — one copy survives, in
     the winning row's partition, with history null-filling the column,
  5. deletes for keys that do not exist (op_col feed) — no-op, no crash,
  6. sweep_moved_keys with before-images pointing at never-written
     partitions — return value honest (0 stale partitions), no dirs
     created.

Usage: PYTHONPATH=/root/repo python tools/cdc_sweep.py
Prints one line per scenario; exits 1 on any failure.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FAILURES: list[str] = []


def check(name: str, fn) -> None:
    try:
        fn()
        print(f"OK    {name}")
    except Exception as e:  # noqa: BLE001 — a sweep reports, never dies
        FAILURES.append(name)
        print(f"FAIL  {name}: {type(e).__name__}: {e}")


def main() -> int:
    from pyspark.sql import functions as F  # noqa: F401

    from node_mongo2influx_spark.engine import Engine
    from node_mongo2influx_spark.sinks import ParquetSink

    eng = Engine.builder(app_name="cdc-sweep", master="local[8]")
    spark = eng.spark
    spark.sparkContext.setLogLevel("ERROR")
    rd = lambda p: spark.read.parquet(p)  # noqa: E731
    rd_merge = lambda p: spark.read.option(  # noqa: E731
        "mergeSchema", "true"
    ).parquet(p)
    root = Path(tempfile.mkdtemp(prefix="cdc_sweep_"))
    SCHEMA = "event_id long, value double, day string, __seq long"

    def mk(name: str):
        sink = ParquetSink(
            str(root / name), partition_by=("day",), dynamic_overwrite=True
        )
        base = spark.createDataFrame(
            [(1, 10.0, "2024-01-01", 5), (2, 20.0, "2024-01-02", 5)],
            SCHEMA,
        )
        sink.write(base, "t")
        return sink

    def rows(sink, reader=rd):
        # partition values read back TYPED (day=2024-01-01 -> DATE):
        # compare via ISO string (CLAUDE.md r4)
        return sorted(
            (r["event_id"], r["value"], str(r["day"]), r["__seq"])
            for r in reader(str(sink.path / "t")).collect()
        )

    def empty(schema=SCHEMA):
        return spark.createDataFrame([], schema)

    # 1. empty delta, every mode
    def s1():
        for mode in ("plain", "guard", "moving"):
            sink = mk(f"s1_{mode}")
            before = rows(sink)
            if mode == "plain":
                n = sink.upsert(rd, empty(), "t", keys=("event_id",))
            elif mode == "guard":
                n = sink.upsert(
                    rd, empty(), "t", keys=("event_id",), order_col="__seq"
                )
            else:
                n = sink.upsert_guarded_moving(
                    rd, empty(), "t", keys=("event_id",), order_col="__seq"
                )
            assert n == 0, (mode, n)
            assert rows(sink) == before, mode

    check("empty_delta_all_modes", s1)

    # 2. empty delta with NEW columns under evolve_schema
    def s2():
        sink = mk("s2")
        before = rows(sink)
        widened = empty(SCHEMA + ", extra string")
        n = sink.upsert(
            rd_merge, widened, "t", keys=("event_id",),
            order_col="__seq", evolve_schema=True,
        )
        assert n == 0, n
        assert rows(sink) == before
        # schema NOT widened by a zero-row batch
        assert "extra" not in rd_merge(str(sink.path / "t")).columns

    check("empty_delta_evolve_schema_noop", s2)

    # 3a. 100% stale delta, partition-scoped guard
    def s3a():
        sink = mk("s3a")
        before = rows(sink)
        stale = spark.createDataFrame(
            [(1, 99.0, "2024-01-01", 1), (2, 98.0, "2024-01-02", 2)],
            SCHEMA,
        )
        sink.upsert(rd, stale, "t", keys=("event_id",), order_col="__seq")
        assert rows(sink) == before
        sink.upsert(rd, stale, "t", keys=("event_id",), order_col="__seq")
        assert rows(sink) == before  # replay of the stale batch too

    check("all_stale_delta_guarded", s3a)

    # 3b. 100% stale delta CLAIMING brand-new partitions, guarded-moving
    def s3b():
        sink = mk("s3b")
        before = rows(sink)
        stale = spark.createDataFrame(
            [(1, 99.0, "2024-09-09", 1), (2, 98.0, "2024-09-10", 2)],
            SCHEMA,
        )
        sink.upsert_guarded_moving(
            rd, stale, "t", keys=("event_id",), order_col="__seq"
        )
        assert rows(sink) == before
        for d in ("day=2024-09-09", "day=2024-09-10"):
            assert not (sink.path / "t" / d).exists(), d

    check("all_stale_delta_guarded_moving_new_partitions", s3b)

    # 4. evolve + guard + moved key in one batch, out of order inside it
    def s4():
        sink = mk("s4")
        batch = spark.createDataFrame(
            [
                (1, 30.0, "2024-01-01", 3, None),     # stale, old day
                (1, 70.0, "2024-01-07", 7, "new"),    # winner, moved day
            ],
            SCHEMA + ", extra string",
        )
        sink.upsert_guarded_moving(
            rd_merge, batch, "t", keys=("event_id",),
            order_col="__seq", evolve_schema=True,
        )
        got = {
            r["event_id"]: (r["value"], str(r["day"]), r["__seq"], r["extra"])
            for r in rd_merge(str(sink.path / "t")).collect()
        }
        assert got[1] == (70.0, "2024-01-07", 7, "new"), got
        assert got[2][3] is None  # history null-fills the new column
        assert len(got) == 2
        assert not (sink.path / "t" / "day=2024-01-01").exists()
        # replay byte-stability (set-equal under the widened reader)
        before = sorted(map(tuple, rd_merge(str(sink.path / "t")).collect()))
        sink.upsert_guarded_moving(
            rd_merge, batch, "t", keys=("event_id",),
            order_col="__seq", evolve_schema=True,
        )
        assert sorted(
            map(tuple, rd_merge(str(sink.path / "t")).collect())
        ) == before

    check("evolve_guard_moved_key_one_batch", s4)

    # 5. deletes for keys that do not exist
    def s5():
        sink = mk("s5")
        before = rows(sink)
        ghosts = spark.createDataFrame(
            [(77,), (88,)], "event_id long"
        )
        n = sink.delete_keys(rd, ghosts, "t", keys=("event_id",))
        assert n == 0, n
        assert rows(sink) == before

    check("delete_nonexistent_keys_noop", s5)

    # 6. sweep with before-images naming never-written partitions
    def s6():
        sink = mk("s6")
        before = rows(sink)
        delta = spark.createDataFrame(
            [(1, 11.0, "2024-01-01", 6, "1999-12-31")],
            SCHEMA + ", __prev_day string",
        )
        sink.upsert(
            rd, delta.drop("__prev_day"), "t", keys=("event_id",),
            order_col="__seq",
        )
        n = sink.sweep_moved_keys(
            rd, delta, "t", keys=("event_id",), prev_cols=("__prev_day",)
        )
        assert n == 0, n  # honest: nothing was stale
        got = rows(sink)
        assert (1, 11.0, "2024-01-01", 6) in got and len(got) == len(before)
        assert not (sink.path / "t" / "day=1999-12-31").exists()

    check("sweep_phantom_before_image", s6)

    print(f"\n{len(FAILURES)} failures" + (f": {FAILURES}" if FAILURES else ""))
    return 1 if FAILURES else 0


if __name__ == "__main__":
    raise SystemExit(main())
