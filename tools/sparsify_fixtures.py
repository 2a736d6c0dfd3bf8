"""Build a SPARSIFIED copy of a fixture sf dir for divergence hunting.

Each table is hash-cut at a different rate (deterministic, key-based), so
the copy has missing combinations everywhere: users without some event
types, documents without embeddings (and vice versa), orders without
lineitems, nations without suppliers. Running `tools/check_oracle.py`
against the sparse dir catches the whole class of oracle bugs that pass
only on dense fixtures — e.g. r4's unpivot_event_matrix, where DuckDB's
count(CASE) emits 0 for absent (user, type) combos but the Spark side
NULL-filtered them (ADVICE r4), invisible at any sf because every fixture
user has every event type.

Usage:
    python tools/sparsify_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>

Rates are primes/denominators chosen so no two related tables keep the
same subset. The cut is a plain key-modulo (``(key % mod) IN (...)``),
not a hash: subsets of sequential ids are therefore PERIODIC, which is
fine for the missing-combination coverage this tool exists to create
(what matters is that related tables keep different, partially
overlapping subsets — the differing moduli guarantee that), and the cut
is trivially reproducible on both engines.
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_sparse"

#: table -> (key expression, keep predicate over k = hash bucket)
CUTS = {
    "region": None,  # 5 rows — keep whole
    "nation": ("n_nationkey", 7, (0, 1, 2, 3, 4)),  # drop ~2/7 of nations
    "customer": ("c_custkey", 5, (0, 1, 2)),
    "supplier": ("s_suppkey", 3, (0, 1)),
    "part": ("p_partkey", 4, (0, 1, 2)),
    "orders": ("o_orderkey", 5, (0, 1, 2, 3)),
    "lineitem": ("l_orderkey * 10 + l_linenumber", 3, (0, 1)),
    "events": ("event_id", 7, (0, 1, 2)),  # drop most events
    "documents": ("doc_id", 3, (0, 1)),
    "embeddings": ("vec_id", 4, (0, 1, 2)),  # misaligned with documents
}


def main() -> int:
    import duckdb

    dst = Path(DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table, cut in CUTS.items():
        src = f"{SRC}/{table}.parquet"
        where = ""
        if cut is not None:
            key, mod, keep = cut
            keep_list = ",".join(str(k) for k in keep)
            where = f"WHERE (({key}) % {mod}) IN ({keep_list})"
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') {where}) "
            f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
        )
        n_src = con.sql(f"SELECT count(*) FROM read_parquet('{src}')").fetchone()[0]
        n_dst = con.sql(
            f"SELECT count(*) FROM read_parquet('{dst / table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n_src} -> {n_dst} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
