"""Build an INSTANT-TYPED copy of a fixture sf dir (timezone sweep).

Every fixture timestamp is TIMESTAMP_NTZ micros today, and every query
path runs with the wall value = the UTC instant, under a session pinned
to UTC on both engines. But the reference's real data model is
INSTANTS — a Mongo date is UTC millis on the wire (examples/
migrate.js:33), and an InfluxDB point timestamp is epoch ns — so a real
export lands as parquet ``TIMESTAMP(isAdjustedToUTC=true)``. This tool
rewrites every naive TIMESTAMP column (orders.o_orderdate,
lineitem.l_shipdate, events.ts — discovered via DESCRIBE, not
hardcoded) as TIMESTAMPTZ carrying the SAME instant (stored wall value
interpreted as UTC), leaving all values numerically identical.

What the sweep then proves, with tools/check_oracle.py on the copy —
run by tools/sweep_all.py's ``tz`` stage under a HOSTILE ambient TZ
(America/New_York) to also poke every implicit session default:

* Spark reads instant micros as TimestampType natively; with
  engine.py's pinned ``spark.sql.session.timeZone=UTC`` every
  date_trunc / window / date_format / unix_micros result is identical
  to the NTZ fixture's.
* DuckDB reads TIMESTAMPTZ; check_oracle's view layer (the oracle-side
  twin of sources/parquet_compat.py — one choke point, never per-query
  fixes) renders it back to UTC-wall naive TIMESTAMP so every oracle
  sees exactly what it sees on the NTZ fixtures, regardless of the
  connection's TimeZone.
* The hostile ambient zone genuinely reaches both engines (ADVICE r9):
  check_oracle no longer pins the process TZ, so the JVM default zone,
  the Python workers, and DuckDB's process environment all run hostile;
  only the SESSION zones are pinned (engine.py's
  spark.sql.session.timeZone and the oracle connection's SET TimeZone —
  product settings, not scaffolding). The comparator stays
  zone-invariant by collecting Spark results through Arrow (instants in
  SESSION time, the driver's rendering) and normalizing tz-aware
  datetimes to UTC wall values in _norm.

Usage:
    python tools/tz_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_tz"

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> int:
    import duckdb

    dst = Path(DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    # Interpret stored wall values as UTC when lifting to instants —
    # the same convention both query engines run under.
    con.execute("SET TimeZone='UTC'")
    for table in TABLES:
        src = f"{SRC}/{table}.parquet"
        cols = con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{src}')"
        ).fetchall()
        select, lifted = [], []
        for name, dtype, *_ in cols:
            if dtype == "TIMESTAMP":
                select.append(f"CAST({name} AS TIMESTAMPTZ) AS {name}")
                lifted.append(name)
            else:
                select.append(name)
        con.execute(
            f"COPY (SELECT {', '.join(select)} FROM read_parquet('{src}')) "
            f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
        )
        if lifted:
            out = con.sql(
                f"DESCRIBE SELECT * FROM "
                f"read_parquet('{dst / table}.parquet')"
            ).fetchall()
            types = {n: t for n, t, *_ in out}
            for name in lifted:
                assert types[name] == "TIMESTAMP WITH TIME ZONE", (
                    table, name, types[name],
                )
            print(f"{table}: {lifted} lifted to instant (TIMESTAMPTZ)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
