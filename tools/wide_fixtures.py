"""Build a WIDE-SCHEMA dynamic-document copy of a fixture sf dir (r10).

A schemaless Mongo collection routinely carries documents with hundreds
of distinct keys (reference index.js:198 reads whatever the collection
holds); the dense fixture's props objects have a handful. This tool
rewrites deterministic event slices with the wide shapes VERDICT r9
named — the jsonpath contract (functions/jsonpath), the key-occurrence
explode (udtf_explode_props, json_props_map), and the VARIANT validity
path (variant_json_typed) have never seen them:

  event_id % 31 == 0   300 distinct keys per document, the key SET
                       rotating with event_id over a 500-key vocabulary
                       (high-cardinality key-occurrence table)
  event_id % 31 == 1   a 1000-char key name (+ "k")
  event_id % 31 == 2   duplicate-key STORM: "k" repeated 50x with
                       values 1..50 (first-wins extraction vs VARIANT
                       duplicate-key invalidity, at depth)
  event_id % 31 == 3   wide NESTED object: 100 keys under "a" (+ "k")
  event_id % 31 == 4   200 keys of 64-char names (long-key breadth)

NULL props rows keep their NULL (the nulls sweep owns that class).
Only events.parquet is rewritten; all other tables copy through.

Usage:
    python tools/wide_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
(or via the battery: tools/sweep_all.py /root/testdata/sf0.01 wide)
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_wide"

#: event_id % 31 == slot -> generator SQL (slots 5..30 untouched).
CASES: dict[int, str] = {
    0: (
        "'{' || array_to_string(list_transform(range(0, 300), "
        """i -> format('"w{:03d}":{}', (event_id * 7 + i) % 500, i)), ',') """
        """|| ',"k":1}'"""
    ),
    1: """'{"' || repeat('L', 1000) || '":1,"k":2}'""",
    2: (
        "'{' || array_to_string(list_transform(range(1, 51), "
        """i -> format('"k":{}', i)), ',') || '}'"""
    ),
    3: (
        """'{"a":{' || array_to_string(list_transform(range(0, 100), """
        """i -> format('"n{:03d}":{}', i, i * i)), ',') || '},"k":3}'"""
    ),
    4: (
        "'{' || array_to_string(list_transform(range(0, 200), "
        "i -> format('\"{}x{:03d}\":{}', repeat('K', 60), i, i)), ',') "
        "|| '}'"
    ),
}

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> int:
    import duckdb

    dst = Path(DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table in TABLES:
        src = f"{SRC}/{table}.parquet"
        if table != "events":
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
            )
            continue
        expr = "props"
        for slot, rep in CASES.items():
            expr = (
                f"CASE WHEN props IS NOT NULL AND event_id % 31 = {slot} "
                f"THEN ({rep}) ELSE {expr} END"
            )
        cols = [
            name if name != "props" else f"({expr}) AS props"
            for name, *_ in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        out = f"{dst / table}.parquet"
        con.execute(
            f"COPY (SELECT {', '.join(cols)} FROM read_parquet('{src}')) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        # census + invariants: every generated slice is VALID json (the
        # malformed class belongs to json_fixtures), and the wide rows
        # really are wide
        for label, pred, check in [
            ("300-key rotating", "event_id % 31 = 0",
             "len(json_keys(props)) = 301"),
            ("1000-char key", "event_id % 31 = 1",
             "len(json_keys(props)) = 2"),
            ("dup-key storm", "event_id % 31 = 2", "json_valid(props)"),
            ("wide nested", "event_id % 31 = 3",
             "len(json_keys(props, '$.a')) = 100"),
            ("200 long keys", "event_id % 31 = 4",
             "len(json_keys(props)) = 200"),
        ]:
            n, bad = con.sql(
                f"SELECT count(*), count(*) FILTER ("
                f"WHERE NOT json_valid(props) OR NOT ({check})) "
                f"FROM read_parquet('{out}') "
                f"WHERE props IS NOT NULL AND {pred}"
            ).fetchone()
            assert bad == 0, f"{label}: {bad}/{n} rows failed {check}"
            print(f"events.props {label}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
