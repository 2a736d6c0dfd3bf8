"""Build an ADVERSARIAL-EMBEDDING copy of a fixture sf dir (r10 sweep).

The reference's data model is arbitrary numeric fields on schemaless
documents (index.js:198) — nothing guarantees an embedding column is
well-behaved. Every other fixture column has a hostile sweep by now;
this one pokes the vectors themselves, the four classes VERDICT r9
named:

  zero vectors     cosine/norm division by zero — does the
                   finite-measure rule extend to vectors?
  duplicate storm  many rows share ONE exact vector — rank ties in knn
                   ordering (the degenerate_fixtures class, embedding
                   column edition)
  denormal         x * 1e-40 — float32 denormals/underflow-to-zero in
                   dot products and norms
  huge             x scaled to ~±3e38 (just inside float32 max) — dot
                   products and squared norms overflow float32; both
                   engines must do the math in double
  NULL vector      whole-array NULL (also covered by the nulls sweep;
                   kept here so all vector hazards coexist in one copy)
  NULL element     one NULL inside an otherwise-valid array — the
                   aggregate(NULL) fold class (r8 list_prepend trap's
                   sibling)

Slices are vec_id % 20 residues 0..5 (25 rows per class at the 500-row
fixture; 70% of rows stay clean so recall-style queries keep signal).
Only embeddings.parquet is rewritten; all other tables copy through.

Usage:
    python tools/embedding_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
(or via the sweep battery: PYTHONPATH=/root/repo python tools/sweep_all.py
/root/testdata/sf0.01 embed)
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_embed"

#: vec_id of the in-distribution donor vector for the duplicate storm
#: (residue 6 — itself untouched by any hostile class).
DONOR = 6

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
        if table != "embeddings":
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
            )
            continue
        donor = (
            f"(SELECT embedding FROM read_parquet('{src}') "
            f"WHERE vec_id = {DONOR})"
        )
        # Class order = CASE precedence; residues are disjoint anyway.
        expr = f"""
            CASE vec_id % 20
              WHEN 0 THEN list_transform(embedding, x -> 0.0::FLOAT)
              WHEN 1 THEN {donor}
              WHEN 2 THEN list_transform(
                            embedding, x -> (x * 1e-40)::FLOAT)
              WHEN 3 THEN list_transform(
                            embedding,
                            x -> greatest(least(x * 1e39, 3e38),
                                          -3e38)::FLOAT)
              WHEN 4 THEN NULL::FLOAT[]
              WHEN 5 THEN embedding[1:6] || [NULL::FLOAT] || embedding[8:]
              ELSE embedding
            END
        """
        cols = [
            name if name != "embedding" else f"({expr}) AS embedding"
            for name, *_ in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        con.execute(
            f"COPY (SELECT {', '.join(cols)} FROM read_parquet('{src}')) "
            f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
        )
        out = f"{dst / table}.parquet"
        for label, pred in [
            ("zero-vector", "vec_id % 20 = 0"),
            ("duplicate-storm", "vec_id % 20 = 1"),
            ("denormal", "vec_id % 20 = 2"),
            ("huge(~3e38)", "vec_id % 20 = 3"),
            ("NULL-vector", "embedding IS NULL"),
            (
                "NULL-element",
                "embedding IS NOT NULL AND "
                "len(list_filter(embedding, x -> x IS NULL)) > 0",
            ),
        ]:
            n = con.sql(
                f"SELECT count(*) FROM read_parquet('{out}') WHERE {pred}"
            ).fetchone()[0]
            print(f"embeddings {label}: {n} rows")
        # Invariants the sweep relies on: lengths preserved, donor clean.
        bad_len = con.sql(
            f"SELECT count(*) FROM read_parquet('{out}') "
            f"WHERE embedding IS NOT NULL AND len(embedding) != "
            f"(SELECT len(embedding) FROM read_parquet('{src}') LIMIT 1)"
        ).fetchone()[0]
        assert bad_len == 0, f"length drift on {bad_len} rows"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
