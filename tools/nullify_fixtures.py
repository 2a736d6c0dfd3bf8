"""Build a NULL-INJECTED copy of a fixture sf dir for divergence hunting.

The sparsifier (tools/sparsify_fixtures.py) removes rows; this tool
removes VALUES. Group-key and measure columns on the schemaless-model
tables (events, documents, embeddings — the Mongo-shaped data where any
field can be absent, reference index.js:198) are NULLed on a
deterministic key-modulo slice. Running `tools/check_oracle.py` against
the copy catches the NULL-group-key class of oracle bugs — e.g. ADVICE
r7: approx_percentiles_by_type's rank-check equi-join silently dropped
a NULL event_type group (joins never match NULL) while the DuckDB
oracle's GROUP BY emitted it; invisible on the dense fixtures because
no fixture row has a NULL event_type.

TPC-H tables are copied unchanged: their columns are NOT NULL by spec,
and nullifying them would test a data shape the relational queries are
entitled to exclude.

Usage:
    python tools/nullify_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_nulls"

#: table -> {column: (key expr, modulus)}; key % mod == 0 -> NULL.
#: Distinct moduli per column so NULL patterns overlap partially
#: (rows with NULL type AND NULL user exist, as do each alone).
NULLS = {
    "events": {
        "event_type": ("event_id", 11),
        "user_id": ("event_id", 13),
        "value": ("event_id", 17),
        # NULL time is the reference's core data-model hazard — its
        # time-validity filter (index.js:235 / SURVEY F1) exists because
        # Mongo rows can lack a valid time entirely
        "ts": ("event_id", 19),
        # the dynamic-document JSON blob can be absent wholesale
        "props": ("event_id", 23),
    },
    "documents": {
        "lang": ("doc_id", 11),
        "source": ("doc_id", 13),
        # a schemaless corpus has documents with no text at all
        "text": ("doc_id", 17),
        "n_chars": ("doc_id", 19),
    },
    "embeddings": {
        "label": ("vec_id", 11),
        # a corpus row whose embedding was never computed — the vector
        # analogue of the missing-time hazard; every ANN/linear-algebra
        # consumer must either skip it or propagate NULL identically to
        # the DuckDB oracle
        "embedding": ("vec_id", 19),
    },
}

COPY_ONLY = (
    "region nation customer supplier part orders lineitem".split()
)


def main() -> int:
    import duckdb

    dst = Path(DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table in COPY_ONLY + list(NULLS):
        src = f"{SRC}/{table}.parquet"
        cols = con.sql(f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()
        plan = NULLS.get(table, {})
        select = []
        for name, dtype, *_ in cols:
            if name in plan:
                key, mod = plan[name]
                select.append(
                    f"CASE WHEN ({key}) % {mod} = 0 THEN NULL "
                    f"ELSE {name} END AS {name}"
                )
            else:
                select.append(name)
        con.execute(
            f"COPY (SELECT {', '.join(select)} FROM read_parquet('{src}')) "
            f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
        )
        for name in plan:
            n = con.sql(
                f"SELECT count(*) FILTER (WHERE {name} IS NULL) "
                f"FROM read_parquet('{dst / table}.parquet')"
            ).fetchone()[0]
            print(f"{table}.{name}: {n} NULLs injected")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
