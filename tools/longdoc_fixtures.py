"""Build an EXTREME-LENGTH-document copy of a fixture sf dir.

Row-count sweeps cannot witness PER-ROW work skew: the BPE replace
chain, char-entropy fold, chunking, shingling, and fingerprint kernels
all do O(doc-length) work inside ONE task, so a single 10 MB document
is a different hazard class than 10 MB of documents (VERDICT r8 #5).
This tool replaces the text of four deterministically-chosen documents
(the four smallest doc_ids) with adversarial long bodies:

* ``words``  (~10 MB) — seeded pseudo-random vocabulary, ~1.6 M words:
  large DISTINCT shingle/bigram sets (the explode paths carry millions
  of rows from one input row) but near-zero overlap with other docs, so
  pair joins stay bounded.
* ``repeat`` (~4 MB)  — one two-char word repeated: worst case for the
  BPE merge loop and repetition/perplexity ratios, tiny distinct sets.
* ``oneword`` (~2 MB) — a single 2M-char token with no whitespace: the
  degenerate split (one word of maximal length; shingle windows
  shorter than n yield nothing).
* ``unicode`` (~2 MB) — a repeated non-ASCII phrase: byte length ≈ 2×
  char length, exercising the byte-vs-char paths at size.

n_chars is recomputed for the replaced rows. All other tables copy
through unchanged. Run the full registry against the copy with
tools/check_oracle.py (the ``longdoc`` stage of tools/sweep_all.py) —
green means every O(doc-length) kernel computes the same values in
Spark, DuckDB, and the Arrow kernels at megabyte row sizes, and none
of them dies on a 10 MB cell.

Usage:
    python tools/longdoc_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_longdoc"

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _bodies() -> list[str]:
    """The four adversarial bodies, fully deterministic (seeded LCG —
    no random module state, no platform hash seeds)."""
    # ~10 MB of pseudo-random 5-9 char words from a 50k vocabulary
    state = 123456789
    words = []
    for _ in range(1_600_000):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**64)
        words.append(f"w{state % 50_000}x{state % 7}")
    body_words = " ".join(words)
    body_repeat = "ab " * 1_400_000          # ~4.2 MB, one distinct word
    body_oneword = "z" * 2_000_000           # 2 MB, zero whitespace
    body_unicode = "héllo wörld çafé 漢字 "  # non-ASCII phrase
    body_unicode = body_unicode * 100_000    # ~2 M chars, ~3 MB bytes
    return [body_words, body_repeat, body_oneword, body_unicode]


def main() -> int:
    import duckdb

    dst = Path(DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table in TABLES:
        src = f"{SRC}/{table}.parquet"
        if table != "documents":
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
            )
            continue
        ids = [
            r[0]
            for r in con.sql(
                f"SELECT doc_id FROM read_parquet('{src}') "
                "ORDER BY doc_id LIMIT 4"
            ).fetchall()
        ]
        con.execute("CREATE TEMP TABLE rep(doc_id BIGINT, t VARCHAR)")
        con.executemany(
            "INSERT INTO rep VALUES (?, ?)",
            list(zip(ids, _bodies())),
        )
        cols = con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{src}')"
        ).fetchall()
        select = []
        for name, _dtype, *_ in cols:
            if name == "text":
                select.append("coalesce(rep.t, d.text) AS text")
            elif name == "n_chars":
                select.append(
                    "CAST(length(coalesce(rep.t, d.text)) AS BIGINT)"
                    " AS n_chars"
                )
            else:
                select.append(f"d.{name}")
        con.execute(
            f"""COPY (
                SELECT {', '.join(select)}
                FROM read_parquet('{src}') d LEFT JOIN rep USING (doc_id)
            ) TO '{dst / table}.parquet' (FORMAT PARQUET)"""
        )
        out = con.sql(
            f"SELECT doc_id, length(text) FROM "
            f"read_parquet('{dst / table}.parquet') "
            f"WHERE doc_id IN ({', '.join(map(str, ids))}) ORDER BY doc_id"
        ).fetchall()
        print(f"documents: long bodies {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
