"""Capture .explain('formatted') for queries into plans/r12/.

Optimization-round evidence (OPTIMIZATION_r12.md): <query>_before.txt at the
pre-optimization HEAD, <query>_after.txt regenerated after each change.

Usage: PYTHONPATH=. python tools/r12_dump_plans.py [suffix] [query ...]
  suffix defaults to "before"; with no query list, dumps the full bench set.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = REPO / "plans" / "r12"


def main() -> None:
    import bench
    from node_mongo2influx_spark.engine import Engine
    from node_mongo2influx_spark.plans import load_registry

    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        names = [
            n
            for sec in (
                bench.HEADLINE,
                bench.EXTENDED,
                bench.EXTENDED_R4,
                bench.EXTENDED_R4B,
                bench.EXTENDED_R4C,
                bench.EXTENDED_R5,
                bench.EXTENDED_R6,
                bench.EXTENDED_R6B,
            )
            for n in sec
        ]

    eng = Engine.builder(app_name="r12-plan-dump", master="local[4]")
    spark = eng.spark
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()
    OUT.mkdir(parents=True, exist_ok=True)

    for name in names:
        df = reg[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        (OUT / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
