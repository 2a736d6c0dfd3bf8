"""Build an EXTREME-TIMESTAMP copy of a fixture sf dir (events.ts).

The reference's core data-model hazard is the time column (its validity
filter exists because Mongo rows carry whatever the application wrote,
index.js:235): epoch zero from uninitialized fields, pre-1970 values
from sign bugs and birthdates, far-future values from sentinel dates
and unit confusion (ms-as-s). The fixture clock only ever spans one
tidy month of 2024. This tool rewrites a deterministic slice of
events.ts with those shapes; running `tools/check_oracle.py` against
the copy hunts the date-arithmetic divergence class (epoch math,
date-part extraction, strftime/date_format keys, window bucketing on
negative epochs).

Usage:
    python tools/extreme_ts_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_xts"

#: event_id % 43 == slot -> replacement timestamp literal.
CASES = {
    0: "TIMESTAMP '1970-01-01 00:00:00'",           # epoch zero
    1: "TIMESTAMP '1969-12-31 23:59:59.123456'",    # just pre-epoch
    2: "TIMESTAMP '1905-06-13 07:00:00.5'",         # deep pre-epoch
    3: "TIMESTAMP '2200-01-01 12:34:56.789'",       # sentinel future
    4: "TIMESTAMP '2024-02-29 23:59:59.999999'",    # leap day, last us
}


def main() -> int:
    import duckdb

    dst = Path(DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for table in tables:
        src = f"{SRC}/{table}.parquet"
        if table != "events":
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
            )
            continue
        expr = "ts"
        for slot, rep in CASES.items():
            expr = (
                f"CASE WHEN ts IS NOT NULL AND event_id % 43 = {slot} "
                f"THEN {rep} ELSE {expr} END"
            )
        cols = [
            name if name != "ts" else f"CAST({expr} AS TIMESTAMP) AS ts"
            for name, *_ in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        con.execute(
            f"COPY (SELECT {', '.join(cols)} FROM read_parquet('{src}')) "
            f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{dst / table}.parquet') "
            "WHERE ts IS NOT NULL AND (ts < TIMESTAMP '2024-01-01' "
            "OR ts > TIMESTAMP '2025-01-01')"
        ).fetchone()[0]
        print(f"events.ts: {n} extreme timestamps injected")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
