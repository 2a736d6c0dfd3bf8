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

    eng = Engine.builder(app_name="query-metrics", master="local[32]")
    spark = eng.spark
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()
    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    def totals():
        # completed stages only; a short settle wait lets the listener
        # bus drain before reading
        time.sleep(0.3)
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete"
            )
        )
        return (
            sum(s["inputBytes"] for s in stages),
            sum(s["shuffleWriteBytes"] for s in stages),
            sum(s["diskBytesSpilled"] for s in stages),
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
        before = totals()
        t0 = time.monotonic()
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        after = totals()
        inp, shw, spill = (a - b for a, b in zip(after, before))
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
