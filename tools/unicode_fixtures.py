"""Build a UNICODE-INJECTED copy of a fixture sf dir (non-ASCII text).

The fixture corpus is pure ASCII, so every string path — JVM regexes,
Python kernels, DuckDB string functions — has only ever been compared on
the easy seventh of the code space. This tool rewrites a deterministic
slice of documents.text with the hazard classes that actually diverge
between runtimes:

- accented latin + combining marks (NFC vs NFD length/substr behavior)
- CJK and emoji incl. ZWJ clusters (supplementary-plane code points)
- unicode whitespace (NBSP, thin space) — Java's \\s+ and RE2's \\s are
  ASCII-only while Python's re defaults to Unicode (the repo's kernels
  pin re.ASCII for exactly this; the sweep proves it end to end)
- zero-width space inside words
- the two KNOWN case-mapping divergences, measured live in this repo:
  upper('ß') is 'SS' on the JVM but 'ẞ' in DuckDB, and lower('İ') is
  'i̇' (i + combining dot) on the JVM but 'i' in DuckDB — any query
  that lets a cased transform of arbitrary text reach its output hash
  will diverge here, and must either normalize or document the bound.

n_chars is recomputed (both engines count code points — verified equal
on every class above) so the derived column stays consistent with the
rewritten text. Other tables copy through unchanged: the schemaless
corpus is where arbitrary user text lives.

Usage:
    python tools/unicode_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_unicode"

#: doc_id % 13 == slot -> mutation. Slots 0..7 mutate (~62% of docs
#: untouched keeps the corpus statistically recognizable); replacements
#: and suffixes are fixed strings so both engines see identical bytes.
_MUTATIONS: dict[int, tuple[str, str]] = {
    # slot -> (kind, payload); kinds: 'suffix' appends, 'nbsp' swaps
    # every space within the first 40 characters for the payload
    0: ("suffix", " café touché naïve façade résumé"),
    1: ("suffix", " 漢字テスト 中文文本 かな"),
    2: ("suffix", " emoji 😀 chain 👨‍👩‍👧 done"),
    3: ("nbsp", " "),          # NBSP instead of the first 3 spaces
    4: ("nbsp", " "),          # thin space
    5: ("suffix", " zero​width inside"),
    6: ("suffix", " straße STRASSE ß"),      # JVM upper('ß')='SS' hazard
    7: ("suffix", " İstanbul iı İİ"),        # JVM lower('İ') hazard
}


def _mutate_sql(col: str) -> str:
    branches = []
    for slot, (kind, payload) in _MUTATIONS.items():
        if kind == "suffix":
            expr = f"{col} || '{payload}'"
        else:  # nbsp: swap every space in the first 40 chars for the payload
            expr = (
                f"replace(substr({col}, 1, 40), ' ', '{payload}') "
                f"|| substr({col}, 41)"
            )
        branches.append(f"WHEN doc_id % 13 = {slot} THEN {expr}")
    return (
        f"CASE WHEN {col} IS NULL THEN NULL "
        + " ".join(branches)
        + f" ELSE {col} END"
    )


def main() -> int:
    import duckdb

    dst = Path(DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for table in tables:
        src = f"{SRC}/{table}.parquet"
        if table != "documents":
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
            )
            continue
        # Derive the select list from the source schema (like
        # degenerate_fixtures) so a fixture variant with extra or
        # renamed columns copies through instead of being dropped;
        # only text and its derived n_chars are substituted.
        mut = _mutate_sql("text")
        cols = con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{src}')"
        ).fetchall()
        select = []
        for name, _dtype, *_ in cols:
            if name == "text":
                select.append(f"{mut} AS text")
            elif name == "n_chars":
                select.append(f"CAST(length({mut}) AS BIGINT) AS n_chars")
            else:
                select.append(name)
        con.execute(
            f"""COPY (
                SELECT {', '.join(select)}
                FROM read_parquet('{src}')
            ) TO '{dst / table}.parquet' (FORMAT PARQUET)"""
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{dst / table}.parquet') "
            "WHERE text IS NOT NULL AND text <> regexp_replace(text, "
            "'[^\\x00-\\x7F]', '', 'g')"
        ).fetchone()[0]
        print(f"documents: {n} rows now contain non-ASCII text")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
