"""Partition-invariance audit: every registry query must produce the
IDENTICAL result set under different shuffle-partition counts.

local[32] with spark.sql.shuffle.partitions=32 is nothing like a
1000-executor cluster; any result that depends on physical partitioning
(arbitrary tie-breaks, first/last without total order, partition-local
counters leaking into output) is a latent wrong-answer at scale that the
DuckDB oracle can coincidentally agree with on one layout. This runs each
query twice — shuffle.partitions=32 then 5 (and default parallelism
perturbed) — and compares the order-insensitive value hash.

Usage: PYTHONPATH=/root/repo python tools/determinism_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from check_oracle import value_hash  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def main() -> int:
    import __spark_entry__ as entrymod
    from node_mongo2influx_spark.engine import Engine

    eng = Engine.builder(
        app_name="determinism-check",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
    )
    spark = eng.spark
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.monotonic()
        hashes = []
        try:
            for parts in ("32", "5"):
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                df = fn(spark, SF_DIR)
                hashes.append(
                    value_hash(df.columns, [tuple(r) for r in df.collect()])
                )
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: error: {str(exc)[:200]}")
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        dt = time.monotonic() - t0
        if hashes[0] != hashes[1]:
            failures.append(name)
            print(f"FAIL  {name}: partition-dependent result "
                  f"{hashes[0]} != {hashes[1]}")
        else:
            print(f"OK    {name} ({dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
