"""Build a NON-FINITE-MEASURE copy of a fixture sf dir (NaN / ±Inf).

A Mongo double field can hold NaN and ±Infinity, and a migration tool
meets them in the wild. This tool injects all three into events.value
on small deterministic key-modulo slices (disjoint from the nullify
sweep's NULL slice mod 17, so NULL/NaN/Inf coexist when the tools are
chained). Running `tools/check_oracle.py` against the copy is a CENSUS
first, a gate second: it shows, per query, whether the engines crash
(ANSI CAST of NaN to integer raises in Spark; DuckDB's conversion error
differs), diverge (NaN grouping/ordering rules), or agree.

Round 8 ships this as the measurement instrument for the r9 contract
decision ("a non-finite measure is not a valid reading" vs "propagate")
— see ROUND_NOTES r8. It is NOT yet part of tools/sweep_all.py.

Usage:
    python tools/nonfinite_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_nonfinite"

#: event_id % mod == 0 -> replacement (primes disjoint from nullify's 17)
INJECT = [
    (29, "'NaN'::DOUBLE"),
    (31, "'Infinity'::DOUBLE"),
    (37, "'-Infinity'::DOUBLE"),
]


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
        expr = "value"
        for mod, rep in INJECT:
            expr = f"CASE WHEN event_id % {mod} = 0 THEN {rep} ELSE {expr} END"
        cols = [
            name if name != "value" else f"{expr} AS value"
            for name, *_ in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        con.execute(
            f"COPY (SELECT {', '.join(cols)} FROM read_parquet('{src}')) "
            f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
        )
        for label, pred in [
            ("nan", "isnan(value)"),
            ("+inf", "value = 'Infinity'::DOUBLE"),
            ("-inf", "value = '-Infinity'::DOUBLE"),
        ]:
            n = con.sql(
                f"SELECT count(*) FILTER (WHERE {pred}) "
                f"FROM read_parquet('{dst / table}.parquet')"
            ).fetchone()[0]
            print(f"events.value {label}: {n} injected")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
