"""Build a HOSTILE-PRIMARY-ID copy of a fixture sf dir (r11).

The one input axis no registry-wide sweep can cover: duplicate and NULL
PRIMARY ids. A real mongoexport can carry both (duplicate ``_id`` across
shard dumps; ``_id`` dropped by a projection), but most of the registry's
semantics are legitimately UNDEFINED under them — every (score, id) rank
tie-break is total only for unique ids, so a full-registry run over this
fixture would fail by design, not by bug.

What IS defined on hostile ids is the audit surface built for exactly
this input (``operators/integrity.py``): ``id_integrity_qa`` /
``referential_integrity_qa`` must COUNT the damage identically on both
engines, and ``catalog_counts`` must be oblivious to it. sweep_all's
``hostile_id`` stage runs precisely that defined subset; everything else
documents the uniqueness precondition and points users at the census.

Classes (id % 20 residues, same discipline as the embed/label sweeps):

* residue 1 → id-1: collides with the residue-0 neighbor (pairwise
  duplicate ids, ~5% of rows);
* residue 2 → NULL id;
* residue 3 → id - 2^62: extreme negative ids (min/max range, and any
  arithmetic on an id would overflow ANSI);
* residue 4 → one constant id (storm: a single key covering ~5% of the
  table — worst-case per-id multiplicity).

Applied to the Mongo-shaped tables' primary ids only (documents.doc_id,
embeddings.vec_id, events.event_id); FK columns and all other tables
copy through so the referential census keeps its parents.

Usage:
    python tools/hostile_id_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir> \
        id_integrity_qa referential_integrity_qa catalog_counts
(or via the battery: PYTHONPATH=/root/repo python tools/sweep_all.py
/root/testdata/sf0.01 hostile_id)
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_hostile_id"

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

ID_COLS = {"documents": "doc_id", "embeddings": "vec_id", "events": "event_id"}


def _id_expr(col: str) -> str:
    return f"""
        CASE {col} % 20
          WHEN 1 THEN {col} - 1
          WHEN 2 THEN NULL
          WHEN 3 THEN {col} - 4611686018427387904
          WHEN 4 THEN 424242
          ELSE {col}
        END
    """


def main() -> int:
    import duckdb

    dst = Path(DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table in TABLES:
        src = f"{SRC}/{table}.parquet"
        id_col = ID_COLS.get(table)
        if id_col is None:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
            )
            continue
        cols = [
            name
            if name != id_col
            else f"CAST(({_id_expr(name)}) AS {typ}) AS {name}"
            for name, typ, *_ in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        out = f"{dst / table}.parquet"
        con.execute(
            f"COPY (SELECT {', '.join(cols)} FROM read_parquet('{src}')) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        n_rows, n_null, n_distinct = con.sql(
            f"SELECT count(*), count(*) - count({id_col}), "
            f"count(DISTINCT {id_col}) FROM read_parquet('{out}')"
        ).fetchone()
        print(
            f"{table}.{id_col}: {n_rows} rows, {n_null} NULL ids, "
            f"{n_distinct} distinct"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
