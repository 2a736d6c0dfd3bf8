"""Build a SCORE-TIE-STORM copy of a fixture sf dir (r11 sweep).

VERDICT r10 #3 / ROUND_NOTES r10: the embed sweep's duplicate-storm
slice exercises rank ties only through IDENTICAL vectors — but
quantized/low-precision embeddings at scale put many DISTINCT vectors
at the SAME cosine to a query, and every rank window's (score, id)
ordering must be total under that storm in BOTH engines or top-k
membership becomes partition-order-dependent.

Construction (exact by integer arithmetic, no low-bit luck):

* probe rows (vec_id < 5, the registry's knn query ids) become CONSTANT
  vectors [c, c, ..., c] with c = vec_id + 1 — permutation-invariant
  probes, and all five are parallel (cosine exactly 1.0 to each other:
  a second tie storm at the very top of every ranking).
* every other row becomes a DISTINCT PERMUTATION of the integer base
  vector [1, 2, ..., d] (seeded per vec_id). A dot product against a
  constant probe is c · sum(multiset) and a squared norm is
  sum(v_i²) — every partial sum is an integer far below 2^53, so the
  float64 result is EXACT in any summation order, in any engine: all
  ~495 corpus rows sit at the bit-identical cosine to every probe, and
  the top-10 is decided ENTIRELY by the id tie-break.
* permutation-vs-permutation cosines (neardup/pairs queries) are also
  exact integers over integers — deterministic, and heavily tied in
  bands (many permutation pairs share the same dot product).
* the TEXT edition: documents with doc_id % 10 == 7 become word-level
  permutations of ONE fixed multiset (same term frequencies, same
  length) — DISTINCT texts with IDENTICAL BM25 scores for every query,
  identical quality/length metrics, identical token counts: the text
  rankers' (score, doc_id) tie-breaks get the same storm treatment.
  n_chars is updated to match so length-derived columns stay honest.

Values 1..64 are exact in float32, inside the statistics domain
(|x| <= 100), and well inside the usable range — every contract tier
keeps full signal; only the ORDER of equals is under test.

embeddings.parquet and documents.parquet are rewritten; all other
tables copy through.

Usage:
    python tools/tiestorm_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
(or via the battery: PYTHONPATH=/root/repo python tools/sweep_all.py
/root/testdata/sf0.01 tiestorm)
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_tiestorm"

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

#: The registry's knn probe ids (vec_id < 5) become constant vectors.
N_PROBES = 5

#: Word multiset for the text tie storm: 24 distinct words with skewed
#: repeats (tf 1..4) so BM25 has real tf structure — identical across
#: all permuted docs. Plain ASCII: the storm tests ORDER, not folding.
TIE_WORDS = (
    ["alpha"] * 4 + ["bravo"] * 3 + ["charlie"] * 3 + ["delta"] * 2
    + ["echo"] * 2 + ["foxtrot"] * 2
    + "golf hotel india juliet kilo lima mike november oscar papa"
      " quebec romeo sierra tango uniform victor whiskey yankee".split()
)


def main() -> int:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = Path(DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table in TABLES:
        src = f"{SRC}/{table}.parquet"
        if table == "documents":
            tbl = con.sql(f"SELECT * FROM read_parquet('{src}')").arrow()
            doc_ids = tbl["doc_id"].to_numpy()
            texts = tbl["text"].to_pylist()
            words = np.asarray(TIE_WORDS, dtype=object)
            chars = tbl["n_chars"].to_pylist()
            for i, did in enumerate(doc_ids):
                did = int(did)
                if did % 10 == 7:
                    rng = np.random.RandomState((did * 31 + 7) % (2**31))
                    texts[i] = " ".join(words[rng.permutation(len(words))])
                    chars[i] = len(texts[i])
            new_text = pa.array(texts, type=pa.string())
            n_chars = pa.array(chars, type=tbl.schema.field("n_chars").type)
            out_tbl = tbl.set_column(
                tbl.schema.get_field_index("text"),
                pa.field("text", pa.string()),
                new_text,
            )
            out_tbl = out_tbl.set_column(
                out_tbl.schema.get_field_index("n_chars"),
                out_tbl.schema.field("n_chars"),
                n_chars,
            )
            out = f"{dst / table}.parquet"
            pq.write_table(out_tbl, out)
            n_perm, n_distinct = con.sql(
                f"SELECT count(*), count(DISTINCT text) "
                f"FROM read_parquet('{out}') WHERE doc_id % 10 = 7"
            ).fetchone()
            print(
                f"documents tie-storm: {n_perm} permuted docs, "
                f"{n_distinct} distinct texts, one shared word multiset"
            )
            assert n_distinct > n_perm * 9 // 10, "text permutations collided"
            continue
        if table != "embeddings":
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
            )
            continue
        tbl = con.sql(f"SELECT * FROM read_parquet('{src}')").arrow()
        d = con.sql(
            f"SELECT len(embedding) FROM read_parquet('{src}') "
            "WHERE embedding IS NOT NULL LIMIT 1"
        ).fetchone()[0]
        base = np.arange(1, d + 1, dtype=np.float32)
        vec_ids = tbl["vec_id"].to_numpy()
        embs = []
        for vid in vec_ids:
            vid = int(vid)
            if vid < N_PROBES:
                embs.append([float(vid + 1)] * d)
            else:
                rng = np.random.RandomState(vid % (2**31))
                embs.append(base[rng.permutation(d)].tolist())
        arr = pa.array(embs, type=pa.list_(pa.float32()))
        idx = tbl.schema.get_field_index("embedding")
        out_tbl = tbl.set_column(
            idx, pa.field("embedding", pa.list_(pa.float32())), arr
        )
        out = f"{dst / table}.parquet"
        pq.write_table(out_tbl, out)

        # Invariants the sweep relies on: every non-probe vector is a
        # DISTINCT permutation, and ALL of them sit at ONE exact cosine
        # to the constant probe (the storm is real, not approximate).
        n_vec, n_distinct, n_cos = con.sql(
            f"""
            SELECT count(*), count(DISTINCT embedding::VARCHAR),
                   count(DISTINCT
                     list_dot_product(embedding::DOUBLE[],
                                      list_transform(embedding, x -> 1.0))
                     / sqrt(list_dot_product(embedding::DOUBLE[],
                                             embedding::DOUBLE[])))
            FROM read_parquet('{out}') WHERE vec_id >= {N_PROBES}
            """
        ).fetchone()
        print(
            f"embeddings tie-storm: {n_vec} permutation rows, "
            f"{n_distinct} distinct vectors, {n_cos} distinct "
            "probe-cosine value(s)"
        )
        assert n_distinct > n_vec * 9 // 10, "permutations collided"
        assert n_cos == 1, f"storm broke: {n_cos} distinct cosines"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
