"""Build an ADVERSARIAL-JSON copy of a fixture sf dir (events.props).

props is the schemaless dynamic-document column (the Mongo face of the
reference's data model, index.js:198) and the fixture only ever fills it
with flat well-formed ``{"k": <small int>, ...}`` objects. This tool
rewrites a deterministic slice with the JSON shapes two engines disagree
about: deep nesting, numbers past BIGINT, DUPLICATE keys (parsers pick
different winners), non-object roots, truncated/malformed text, typed
mismatches (string where int expected), explicit nulls, and unicode
keys. Running `tools/check_oracle.py` against the copy hunts the
json_extract / from_json / json_keys divergence class.

Usage:
    python tools/json_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_json"

#: event_id % 23 == slot -> replacement props (slots 17..22 untouched).
#: Slots 8-16 are the round-9 extension (ADVICE r8 + VERDICT r8 #3):
#: decimal/exponent numerics (DuckDB TRY_CAST rounds '3.7' to 4 where
#: Spark's ANSI try_cast is NULL — the INT_SHAPE contract) and hostile
#: path keys (dots/quotes/stars/whitespace — the SAFE_KEY contract in
#: functions/jsonpath.py).
CASES: dict[int, str] = {
    0: '{"a":{"b":{"c":{"d":{"e":1,"k":7}}}},"k":5}',   # deep nesting
    1: '{"k": 99999999999999999999}',                     # > BIGINT
    2: '{"k": 1, "k": 2}',                                # duplicate key
    3: "[1, 2, 3]",                                        # array root
    4: '{"k": ',                                           # malformed
    5: '{"k": "12"}',                                      # string number
    6: '{"k": null}',                                      # explicit null
    7: '{"ké": 3, "k": 4}',                                # unicode key
    8: '{"k": 3.7}',                   # non-integral double (round/trunc)
    9: '{"k": 3.0}',                   # integral double ('3.0' both)
    10: '{"k": "2.5"}',                # decimal string
    11: '{"k": -3.7}',                 # negative double (trunc dir, pmod)
    12: '{"a.b": 7, "k": 1}',          # dotted key (quoted-path class)
    13: '{"k\'q": 2, "": 5, "k": 6}',  # single-quote + EMPTY key (unsafe)
    14: '{"a b": 8, "*": 9, "k": 2}',  # interior space (safe) + star
    15: '{" k": 3, "k ": 4, "k": 5}',  # leading/trailing space (unsafe)
    16: '{"k": 1e2, "0": 11}',         # exponent number + numeric key
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
        expr = "props"
        for slot, rep in CASES.items():
            lit = rep.replace("'", "''")
            expr = (
                f"CASE WHEN props IS NOT NULL AND event_id % 23 = {slot} "
                f"THEN '{lit}' ELSE {expr} END"
            )
        cols = [
            name if name != "props" else f"{expr} AS props"
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
            "WHERE props IS NOT NULL AND event_id % 23 < 17"
        ).fetchone()[0]
        print(f"events.props: {n} adversarial rows injected")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
