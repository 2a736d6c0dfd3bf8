"""Per-query cost split for the optimization round: DataFrame CONSTRUCTION
(driver-side py4j + analysis, incl. any training jobs the operator runs while
composing) vs EXECUTION (noop write of the composed frame).

bench.py times fn()+write together; this splits them so driver-side overhead
(plan analysis, py4j chatter, collect-based training) is attributable.

Usage: PYTHONPATH=. python tools/r11_profile.py [reps] [query ...]
Prints one JSON line per query: {"q", "construct": [..], "exec": [..]}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    import bench
    from node_mongo2influx_spark.engine import Engine
    from node_mongo2influx_spark.plans import load_registry

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
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

    eng = Engine.builder(app_name="r11-profile", master=f"local[{CPUS}]")
    spark = eng.spark
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()

    # same warmup as bench.py
    reg["catalog_counts"].fn(spark, SF_DIR).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    for name in names:
        fn = reg[name].fn
        cons, execs = [], []
        for _ in range(reps):
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            t1 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            cons.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
        print(
            json.dumps(
                {"q": name, "construct": cons, "exec": execs},
                separators=(",", ":"),
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
