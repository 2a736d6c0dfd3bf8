"""Build a MULTI-FILE-per-table copy of a fixture sf dir (r10 sweep).

Every dense fixture table is ONE parquet file, so every scan is one
input split: mapInPandas kernels see one Arrow stream, window edges
never cross file boundaries, and per-file footer logic (range/z-order
writes, pruning) is witnessed only by targeted tests. A real 100 TB
table is thousands of files. This tool rewrites each table as a
DIRECTORY ``<table>.parquet/part-*.parquet`` of N round-robin splits
(row_number % N over the scan — deterministic, preserves nothing about
ordering ON PURPOSE: no query may depend on input row order), so the
full registry runs with genuinely multi-split scans on BOTH engines
(check_oracle globs directories).

Usage:
    python tools/multifile_fixtures.py [src_sf_dir] [dst_dir] [n_files]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
(or via the battery: tools/sweep_all.py /root/testdata/sf0.01 multifile)
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_multifile"
N_FILES = int(sys.argv[3]) if len(sys.argv) > 3 else 5

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> int:
    import duckdb

    con = duckdb.connect()
    for table in TABLES:
        src = f"{SRC}/{table}.parquet"
        total = con.sql(
            f"SELECT count(*) FROM read_parquet('{src}')"
        ).fetchone()[0]
        # tiny dims (region: 5 rows) still split — a part file with ONE
        # row, and possibly an EMPTY part, are exactly the boundary
        # shapes worth witnessing
        d = Path(DST) / f"{table}.parquet"
        d.mkdir(parents=True, exist_ok=True)
        for old in d.glob("*.parquet"):
            old.unlink()
        for i in range(N_FILES):
            con.execute(
                f"COPY (SELECT * EXCLUDE (__rn) FROM ("
                f"  SELECT *, row_number() OVER () AS __rn"
                f"  FROM read_parquet('{src}')"
                f") WHERE __rn % {N_FILES} = {i}) "
                f"TO '{d}/part-{i}.parquet' (FORMAT PARQUET)"
            )
        back = con.sql(
            f"SELECT count(*) FROM read_parquet('{d}/*.parquet')"
        ).fetchone()[0]
        assert back == total, f"{table}: {back} != {total}"
        print(f"{table}: {total} rows over {N_FILES} files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
