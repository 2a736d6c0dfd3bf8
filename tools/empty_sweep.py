"""Registry-wide EMPTY-INPUT sweep: every query against zero-row fixtures.

At 100 TB an empty input is routine — a filter that matches nothing, an
empty CDC delta, a partition with no rows, a source that hasn't landed
yet. An operator that assumes rows (``first()`` on nothing, ``collect()[0]``,
a trainer over an empty sample, a numpy kernel fed a (0,)-shaped array)
kills the whole job. tests/test_empty_inputs.py pins the core operators;
this tool sweeps the FULL registry (every ``queries()`` entry), which also
exercises the query-level compositions those unit tests don't.

Pass criteria per query:
* Spark side runs without raising (the hard gate — a crash is a bug).
* If the query has a DuckDB oracle, the oracle also runs and the two
  sides hash-match (same comparator as tools/check_oracle.py) — empty
  inputs must produce IDENTICAL results too (e.g. an ungrouped aggregate
  emits its 1 NULL/0 row on both engines or on neither).

Usage: PYTHONPATH=/root/repo python tools/empty_sweep.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.check_oracle import TABLES, output_hazards, value_hash  # noqa: E402

SRC_DIR = os.environ.get("SPARK_GRAFT_EMPTY_SRC", "/root/testdata/sf0.001")
ONLY = set(sys.argv[1:])

#: Known ENGINE divergences on empty input — reported as xfail, not
#: failure. Spark's GROUPING SETS implementation (Expand → HashAggregate)
#: produces zero groups over zero rows, so even the global () grouping
#: set emits no row; the SQL standard (and DuckDB/Postgres) aggregate the
#: empty table for () and emit one grand-total row. Bounded to empty
#: inputs — any row at all makes the two agree (hash-green at every SF).
KNOWN_DIVERGENCES = {
    "rollup_events_daily": "Spark emits no () grand-total row on empty input",
    "cube_type_by_weekday": "Spark emits no () grand-total row on empty input",
    "grouping_sets_explicit": "Spark emits no () grand-total row on empty input",
}


#: SPARK_GRAFT_SWEEP_ROWS=N keeps the FIRST N rows of each table instead
#: of zero — N=1 exercises the singleton class (stddev of one sample,
#: percentile of one value, windows with one row, self-joins with no
#: second partner), a different crash/divergence class than empty.
SWEEP_ROWS = int(os.environ.get("SPARK_GRAFT_SWEEP_ROWS", "0"))
OUT_DIR = f"/tmp/sf_rows{SWEEP_ROWS}" if SWEEP_ROWS else "/tmp/sf_empty"


def build_empty_fixtures() -> None:
    """Zero-row (or first-N-row) parquet per table, schema copied from the
    sf0.001 footer (preserves the nanos/NTZ timestamp drift parquet_compat
    must absorb)."""
    import pyarrow.parquet as pq

    out = Path(OUT_DIR)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        src = Path(SRC_DIR) / f"{t}.parquet"
        if SWEEP_ROWS:
            tbl = pq.read_table(src).slice(0, SWEEP_ROWS)
        else:
            tbl = pq.read_schema(src).empty_table()
        pq.write_table(tbl, out / f"{t}.parquet")


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from node_mongo2influx_spark.engine import Engine

    build_empty_fixtures()

    eng = Engine.builder(
        app_name="empty-sweep",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
    )
    spark = eng.spark
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{OUT_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, OUT_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            msg = str(exc).replace("\n", " ")[:300]
            print(f"FAIL  {name}: spark error: {msg}")
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok-   {name}: rows-only, {len(srows)} rows ({dt:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = [str(ty) for ty in rel.types]
            drows = [tuple(r) for r in rel.fetchall()]
        except Exception as exc:
            failures.append(name)
            msg = str(exc).replace("\n", " ")[:300]
            print(f"FAIL  {name}: duckdb error: {msg}")
            continue
        problems = output_hazards(sdf.schema.fields, dcols, dtypes)
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if not problems and value_hash(scols, srows) != value_hash(dcols, drows):
            problems.append("value hash mismatch on empty input")
        if problems and name in KNOWN_DIVERGENCES and SWEEP_ROWS == 0:
            # the whitelist rationale (missing () grand-total row) only
            # exists on ZERO-row input — a 1-row-sweep failure in these
            # queries would be a real bug and must fail loudly
            print(f"xfail {name}: {KNOWN_DIVERGENCES[name]}")
        elif problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(srows)} rows ({dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
