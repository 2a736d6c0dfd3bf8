"""Build a DOUBLE-typed adversarial-embedding copy of a fixture sf dir
(r11 sweep — the embed sweep's float32 schema cannot carry the r11
hazard magnitudes).

Round 11 extended the vector-validity contract after reproducing a live
ANSI DIVIDE_BY_ZERO: a DOUBLE vector whose largest component is below
~1.5e-162 has norm² = 0 (every square underflows), and one above ~1e154
has norm² = +Inf (NaN cosines). The usable domain is now maxabs ∈
[1e-160, 1e150] (functions/vec). This stage witnesses that boundary
REGISTRY-WIDE: the embedding column becomes DOUBLE[] and carries, on
top of the r10 float classes (all representable in double), the three
magnitude classes only a double can hold:

  residue 6  x·1e-195  → maxabs ≈ 1e-198..3e-195, BELOW the floor —
             the norm²-underflow zone that CRASHED the r10 guard
  residue 7  x·1e190   → maxabs ≈ 1e187..3e190, ABOVE the ceiling —
             the norm²-overflow / NaN-cosine zone
  residue 8  sign(x)·1e-160 → maxabs EXACTLY at the floor: usable,
             denormal dot products (m·1e-320), the sharpest in-contract
             edge — both engines must produce identical cosines from
             denormal arithmetic

Residues 0..5 repeat the r10 classes (zero / duplicate storm / denormal
/ huge ~3e38 / NULL vector / NULL element); 55% of rows stay clean.
Only embeddings.parquet is rewritten; all other tables copy through.

Usage:
    python tools/embedding_double_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
(or via the battery: PYTHONPATH=/root/repo python tools/sweep_all.py
/root/testdata/sf0.01 embed_double)
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_embed_double"

#: vec_id of the in-distribution donor vector for the duplicate storm
#: (residue 9 — itself untouched by any hostile class).
DONOR = 9

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
            f"(SELECT embedding::DOUBLE[] FROM read_parquet('{src}') "
            f"WHERE vec_id = {DONOR})"
        )
        expr = f"""
            CASE vec_id % 20
              WHEN 0 THEN list_transform(embedding, x -> 0.0::DOUBLE)
              WHEN 1 THEN {donor}
              WHEN 2 THEN list_transform(embedding,
                            x -> x::DOUBLE * 1e-40)
              WHEN 3 THEN list_transform(embedding,
                            x -> greatest(least(x::DOUBLE * 1e39, 3e38),
                                          -3e38))
              WHEN 4 THEN NULL::DOUBLE[]
              WHEN 5 THEN embedding[1:6]::DOUBLE[] || [NULL::DOUBLE]
                          || embedding[8:]::DOUBLE[]
              WHEN 6 THEN list_transform(embedding,
                            x -> x::DOUBLE * 1e-195)
              WHEN 7 THEN list_transform(embedding,
                            x -> x::DOUBLE * 1e190)
              WHEN 8 THEN list_transform(embedding,
                            x -> CASE WHEN x >= 0 THEN 1e-160
                                      ELSE -1e-160 END)
              ELSE embedding::DOUBLE[]
            END
        """
        cols = [
            name if name != "embedding" else f"({expr}) AS embedding"
            for name, *_ in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        out = f"{dst / table}.parquet"
        con.execute(
            f"COPY (SELECT {', '.join(cols)} FROM read_parquet('{src}')) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        typ = con.sql(
            f"SELECT typeof(embedding) FROM read_parquet('{out}') "
            "WHERE embedding IS NOT NULL LIMIT 1"
        ).fetchone()[0]
        assert typ == "DOUBLE[]", typ
        for label, pred in [
            ("underflow(<1e-160)", "vec_id % 20 = 6"),
            ("overflow(>1e150)", "vec_id % 20 = 7"),
            ("at-floor(=1e-160)", "vec_id % 20 = 8"),
        ]:
            n = con.sql(
                f"SELECT count(*) FROM read_parquet('{out}') WHERE {pred}"
            ).fetchone()[0]
            print(f"embeddings(double) {label}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
