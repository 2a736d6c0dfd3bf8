"""Build a HOSTILE-LABEL copy of a fixture sf dir (r11 sweep).

VERDICT r10 #4: the wide sweep's key treatment, applied to the LABEL
axes — the columns the stratified/centroid/quality queries GROUP and
ORDER by. A schemaless source guarantees nothing about a label: real
dumps carry NULL labels, empty-string labels, case-fold-hazard unicode
labels, kilobyte labels, one label covering half the corpus, and
extreme integers. Divergence classes this hunts:

* NULL group keys on axes the r8 nulls sweep never nullified
  (lang/source/label) — NULL-group retention, NULL ordering defaults
  (Spark NULLS FIRST asc vs DuckDB NULLS LAST), NULL-key joins;
* empty-string labels — distinct from NULL in both engines, but any
  `coalesce(x, '')` spelling would silently merge the two groups;
* unicode labels with İ/ß/ı/ẞ — engine case ops diverge (the r8
  case-fold contract, functions/fold); labels that reach a lower()/
  upper() outside the contract will split differently per engine;
* kilobyte labels — group keys and sort keys at pathological width;
* duplicate storm — one label value over ~5% of rows on top of the
  organic distribution (group-size skew, tie-heavy per-group windows);
* INT_MIN / INT_MAX / negative integer labels — any arithmetic on a
  label (sum, abs, sign bucketing) overflows ANSI or flips sign.

Slices are id % 20 residues 0..4 (the same residue discipline as the
embed sweep; 75% of rows stay clean so grouped queries keep signal).
documents.lang, documents.source and embeddings.label are rewritten in
place; every other column and table copies through.

Usage:
    python tools/label_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
(or via the battery: PYTHONPATH=/root/repo python tools/sweep_all.py
/root/testdata/sf0.01 label)
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_label"

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

#: Case-fold hazard label: Turkish dotted/dotless I and sharp s in both
#: cases — lower()/upper() on these diverge between the JVM and DuckDB
#: (the r8 unicode finding). Any label path outside functions/fold
#: splits this group differently per engine.
UNI_LABEL = "İstanbul-ß-ı-ẞ"


def _doc_label_expr(col: str) -> str:
    # ~50 chars of unicode repeated 20x ≈ a kilobyte label; the suffix
    # keeps it unique-ish per original value so the long class doesn't
    # also become a duplicate storm.
    return f"""
        CASE doc_id % 20
          WHEN 0 THEN NULL
          WHEN 1 THEN 'dup-storm'
          WHEN 2 THEN '{UNI_LABEL}'
          WHEN 3 THEN repeat('Łøñg-łàbel-', 100) || {col}
          WHEN 4 THEN ''
          ELSE {col}
        END
    """


#: embeddings.label is INTEGER: NULL / storm / INT_MIN / INT_MAX / -1.
EMB_LABEL_EXPR = """
    CASE vec_id % 20
      WHEN 0 THEN NULL
      WHEN 1 THEN 7
      WHEN 2 THEN (-2147483647 - 1)
      WHEN 3 THEN 2147483647
      WHEN 4 THEN -1
      ELSE label
    END
"""


def main() -> int:
    import duckdb

    dst = Path(DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table in TABLES:
        src = f"{SRC}/{table}.parquet"
        rewrites: dict[str, str] = {}
        if table == "documents":
            rewrites = {
                "lang": _doc_label_expr("lang"),
                "source": _doc_label_expr("source"),
            }
        elif table == "embeddings":
            rewrites = {"label": EMB_LABEL_EXPR}
        if not rewrites:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
            )
            continue
        cols = [
            name
            if name not in rewrites
            else f"CAST(({rewrites[name]}) AS {typ}) AS {name}"
            for name, typ, *_ in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        out = f"{dst / table}.parquet"
        con.execute(
            f"COPY (SELECT {', '.join(cols)} FROM read_parquet('{src}')) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        for name in rewrites:
            n_null, n_distinct = con.sql(
                f"SELECT count(*) - count({name}), count(DISTINCT {name}) "
                f"FROM read_parquet('{out}')"
            ).fetchone()
            print(f"{table}.{name}: {n_null} NULLs, {n_distinct} distinct")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
