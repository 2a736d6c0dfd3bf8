"""Measured physical metrics per registered query — shuffle discipline as
numbers, not claims.

For each query: run to full materialization (noop write) and report the
DELTA of stage-level totals from the Spark UI REST API (the same numbers
the Spark UI shows): input bytes read, shuffle bytes written, disk spill.
A query whose shuffle bytes rival its input bytes is moving the data
instead of aggregating it; spill > 0 at bench scale means partitions are
mis-sized.

Usage:
    PYTHONPATH=/root/repo python tools/query_metrics.py [sf_dir] [query ...]

Defaults to the bench headline set at sf0.1. Prints one line per query
plus a final JSON line.

CAVEAT: ``input_bytes`` reflects Hadoop input metrics; tables read
through the NTZ-timestamp compat shim (events/orders/lineitem) do not
report them, so their rows show ~0 input. Shuffle and spill deltas are
accurate for every query — they are the discipline this tool audits.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_QUERIES = (
    "migrate_events",
    "influx_line_protocol",
    "q1_pricing_summary",
    "q3_top_unshipped_revenue",
    "q5_revenue_by_nation",
    "asof_join_last_order",
    "window_topn_per_user",
    "rollup_events_daily",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_cosine_bruteforce",
    "knn_cosine_lsh",
    "text_quality",
    "doc_fingerprint",
    "rollup_incremental_refresh",
    "bm25_multi_query_topk",
    "pagerank_cust_supp",
)


def main() -> None:
    from node_mongo2influx_spark.engine import Engine
    from node_mongo2influx_spark.plans import load_registry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = tuple(sys.argv[2:]) or DEFAULT_QUERIES

    from node_mongo2influx_spark.config import EngineConfig

    # Bounded UI retention: the SQL tab retains up to 1000 executions WITH
    # full plan strings (huge for iterative queries) — a full-registry
    # sweep OOM'd the driver heap at ~100 queries before this. Stage
    # accounting below is per-stage-id (new-stages-only), so stage
    # eviction cannot corrupt the deltas either.
    eng = Engine.builder(
        app_name="query-metrics",
        master="local[32]",
        config=EngineConfig(
            spark_conf={
                "spark.sql.ui.retainedExecutions": "8",
                "spark.ui.retainedJobs": "200",
                "spark.ui.retainedStages": "1000",
            }
        ),
    )
    spark = eng.spark
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()
    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    seen: set = set()

    def new_stage_totals():
        # Sum metrics of completed stages NOT yet counted (keyed by
        # (stageId, attemptId)) — robust to UI stage eviction, unlike a
        # cumulative-total delta, which silently under-counts once the
        # retained-stages cap evicts earlier stages mid-sweep. A short
        # settle wait lets the listener bus drain before reading.
        time.sleep(0.3)
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete"
            )
        )
        fresh = [
            s for s in stages if (s["stageId"], s["attemptId"]) not in seen
        ]
        seen.update((s["stageId"], s["attemptId"]) for s in fresh)
        return (
            sum(s["inputBytes"] for s in fresh),
            sum(s["shuffleWriteBytes"] for s in fresh),
            sum(s["diskBytesSpilled"] for s in fresh),
        )

    # warm session + python workers so fixed startup doesn't pollute row 1
    reg["catalog_counts"].fn(spark, sf_dir).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    report = {}
    for name in names:
        if name not in reg:
            print(f"# skip unknown query {name}", file=sys.stderr)
            continue
        new_stage_totals()  # absorb anything since the previous query
        t0 = time.monotonic()
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        inp, shw, spill = new_stage_totals()
        report[name] = {
            "input_mb": round(inp / 1e6, 2),
            "shuffle_write_mb": round(shw / 1e6, 3),
            "spill_mb": round(spill / 1e6, 2),
            "sec": round(wall, 2),
        }
        r = report[name]
        print(
            f"# {name}: input {r['input_mb']} MB, shuffle "
            f"{r['shuffle_write_mb']} MB, spill {r['spill_mb']} MB, "
            f"{r['sec']}s",
            file=sys.stderr,
        )
    print(json.dumps({"metrics": report, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
