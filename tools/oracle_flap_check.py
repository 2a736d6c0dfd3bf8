"""DuckDB-side determinism audit: re-run every oracle K times on a
MULTI-SPLIT fixture and diff the value hashes across reps.

Why this exists (r11 optimization round, session 4): a combo_label sweep
run failed `ohlc_vwap_hourly` with a value-hash mismatch that neither
engine reproduced on re-run. Root cause: DuckDB parallelizes aggregation
across the 5 part files of a multifile fixture, so a DOUBLE sum's
combine order varies run to run — a group whose weighted mean sits
bit-exactly on a stable_round boundary (77.29125) then flips between
77.2912 and 77.2913 across invocations. Spark has the same hazard class
on its reduce-side combine. The cure is the order-canonical sorted-list
fold (both engines fold the same sorted terms left-to-right); this tool
finds WHICH oracles carry the hazard so the fix lands exactly there.

Spark is not involved: a flapping oracle identifies boundary-sitting
data + reassociation-sensitive aggregation, which is the shared hazard.

Usage: python tools/oracle_flap_check.py [fixture_dir] [reps] [query ...]
Default fixture: /tmp/sf_combo_ties-style multi-split dirs must already
exist (build with tools/multifile_fixtures.py or a sweep stage).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from tools.check_oracle import value_hash, _norm  # noqa: E402,F401
from node_mongo2influx_spark.plans import load_registry  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings"
).split()


def connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_multifile"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    only = set(sys.argv[3:])
    reg = load_registry()
    flappers = []
    for name, qd in sorted(reg.items()):
        if qd.oracle is None or (only and name not in only):
            continue
        hashes = set()
        try:
            for _ in range(reps):
                con = connect(sf_dir)
                cur = con.sql(qd.oracle)
                cols = [d[0] for d in cur.description]
                rows = cur.fetchall()
                hashes.add(value_hash(cols, rows))
                con.close()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"ERR   {name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        if len(hashes) > 1:
            print(f"FLAP  {name}: {len(hashes)} distinct hashes in {reps} reps")
            flappers.append(name)
        else:
            print(f"ok    {name}")
    print(f"\n{len(flappers)} flapping oracles" + (f": {flappers}" if flappers else ""))
    return 1 if flappers else 0


if __name__ == "__main__":
    raise SystemExit(main())
