"""Local replica of the driver's t2 correctness gate.

Runs every `queries()` entry on Spark AND its `oracle_sql()` on DuckDB at
sf0.01, then compares row count, column names, and an order-insensitive
value hash (values stringified with float rounding, rows sorted). Queries
without an oracle get a rows-only sanity check (runs, returns >= 0 rows).

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from datetime import date, datetime, timezone
from pathlib import Path

# The ambient/process timezone is deliberately NOT pinned here (ADVICE
# r9): sweep_all's tz stage runs this gate under TZ=America/New_York and
# the hostile zone must genuinely reach the JVM default zone, the Python
# workers, and DuckDB's process environment. The engine SESSION zones
# stay pinned (Engine.builder sets spark.sql.session.timeZone=UTC; the
# DuckDB connection below does SET TimeZone='UTC') — those are product
# settings, not test scaffolding. To keep the comparator itself
# zone-proof, Spark results are collected via Arrow (instants rendered
# in SESSION time, exactly like the driver's comparator) instead of
# row-collect's datetime.fromtimestamp (process-local time), and _norm
# renders any tz-aware datetime as its UTC wall value.

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # .17g round-trips the double exactly — at 9 sig digits monetary
        # sums >= 1e8 rounded to cents lose the cents identically on both
        # sides, false-passing real sub-unit mismatches. Legitimate
        # cross-engine float noise is handled by explicit round() in the
        # queries themselves (both sides), not by loose formatting here.
        return f"{v:.17g}"
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def output_hazards(spark_fields, dcols: list[str], dtypes: list[str]) -> list[str]:
    """Output-type hazards that false-pass locally but crash the DRIVER's
    comparator (it canonicalizes through pandas/arrow; we don't).

    - HUGEINT/DECIMAL: arrow round-trip stringifies "3" as "3.0" (r3).
    - binary/BLOB: pandas sort_values can't factorize bytearray (r3).
    - ARRAY/MAP/STRUCT/LIST: same crash on list/dict cells (r4).

    ``spark_fields`` is ``df.schema.fields``; ``dcols``/``dtypes`` are the
    DuckDB relation's column names and declared type strings.
    """
    problems = []
    hazards = [
        f"{c}:{t}"
        for c, t in zip(dcols, dtypes)
        if t == "HUGEINT" or t.startswith("DECIMAL")
    ]
    if hazards:
        problems.append(
            f"oracle emits arrow-hostile types ({', '.join(hazards)}) — "
            "CAST to BIGINT/DOUBLE"
        )
    bin_hazards = [
        f"spark:{f.name}:{f.dataType.simpleString()}"
        for f in spark_fields
        if "binary" in f.dataType.simpleString()
    ] + [f"oracle:{c}:{t}" for c, t in zip(dcols, dtypes) if t == "BLOB"]
    if bin_hazards:
        problems.append(
            f"binary output columns ({', '.join(bin_hazards)}) crash "
            "the driver's pandas comparator — hex() them on both sides"
        )
    nonscalar = [
        f"spark:{f.name}:{f.dataType.simpleString()}"
        for f in spark_fields
        if any(
            f.dataType.simpleString().startswith(p)
            for p in ("array", "map", "struct")
        )
    ] + [
        f"oracle:{c}:{t}"
        for c, t in zip(dcols, dtypes)
        if "[]" in t or t.startswith(("MAP", "STRUCT", "LIST"))
    ]
    if nonscalar:
        problems.append(
            f"non-scalar output columns ({', '.join(nonscalar)}) crash "
            "the driver's pandas comparator — posexplode to rows or "
            "concat_ws to a string on both sides"
        )
    return problems


def spark_rows(sdf) -> list[tuple]:
    """Collect a Spark DataFrame through Arrow.

    Timestamp instants arrive as tz-aware datetimes in SESSION time
    (UTC), independent of the process timezone — the same rendering the
    driver's arrow comparator uses. Row-collect would go through
    datetime.fromtimestamp (process-local) and shift every instant when
    the gate runs under a hostile ambient TZ.
    """
    tbl = sdf.toArrow()
    cols = [c.to_pylist() for c in tbl.columns]
    return [tuple(vals) for vals in zip(*cols)]


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from node_mongo2influx_spark.engine import Engine

    eng = Engine.builder(
        app_name="oracle-check",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
    )
    spark = eng.spark
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the Python/Arrow worker pool (same as bench.py): the first
    # kernel query otherwise pays the full pool spin-up and reads as a
    # 10s outlier in per-query timings.
    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark.range(2 * n_workers).repartition(n_workers).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    con = duckdb.connect()
    # Session pinned to UTC like the Spark side (engine.py) — no oracle
    # result may depend on the ambient zone.
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        # a table may be a single file OR a directory of part files
        # (tools/multifile_fixtures.py — Spark reads the dir natively,
        # DuckDB needs the glob)
        tp = Path(SF_DIR) / f"{t}.parquet"
        t_src = f"{tp}/*.parquet" if tp.is_dir() else str(tp)
        # The oracle-side twin of sources/parquet_compat.py: an
        # INSTANT-typed fixture (TIMESTAMPTZ parquet, what a real Mongo/
        # Influx export carries — tools/tz_fixtures.py) is rendered back
        # to UTC-wall naive TIMESTAMP in the view, so every oracle sees
        # exactly the values it sees on the NTZ fixtures. One choke
        # point; never per-query fixes.
        cols = con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{t_src}')"
        ).fetchall()
        select = ", ".join(
            f"timezone('UTC', {name}) AS {name}"
            if dtype == "TIMESTAMP WITH TIME ZONE"
            else name
            for name, dtype, *_ in cols
        )
        con.execute(
            f"CREATE VIEW {t} AS SELECT {select} "
            f"FROM read_parquet('{t_src}')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = spark_rows(sdf)
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok-   {name}: rows-only, {len(srows)} rows ({dt:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = [tuple(r) for r in rel.fetchall()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        problems = output_hazards(sdf.schema.fields, dcols, dtypes)
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if not problems:
            sh, dh = value_hash(scols, srows), value_hash(dcols, drows)
            if sh != dh:
                problems.append(f"value hash {sh} != {dh}")
                # show a few mismatching lines for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = sorted("|".join(_norm(r[i]) for i in order_s) for r in srows)
                dset = sorted("|".join(_norm(r[i]) for i in order_d) for r in drows)
                diff_s = [x for x in sset if x not in set(dset)][:3]
                diff_d = [x for x in dset if x not in set(sset)][:3]
                for x in diff_s:
                    print(f"      spark-only: {x[:160]}")
                for x in diff_d:
                    print(f"      duck-only:  {x[:160]}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(srows)} rows ({dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
