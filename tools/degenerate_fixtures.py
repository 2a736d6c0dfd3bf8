"""Build a DEGENERATE-CARDINALITY copy of a fixture sf dir (tie storms).

The sparsifier removes rows and the nullifier removes values; this tool
removes DISTINCTNESS. Key columns collapse to one (or a handful of)
values, measures are quantized to coarse grids, timestamps truncate to
the hour/month, and half the documents/a quarter of the embeddings
become exact copies of one row. Dense fixtures are near-unique in every
column, so an ORDER BY / row_number / top-k whose sort key is not a
total order can never diverge on them — under ties, Spark and DuckDB
are each free to pick different rows, and only an explicit tie-break
column spelled on BOTH sides keeps the value hash stable. Running
`tools/check_oracle.py` against this copy hunts exactly that class
(under-specified ordering), plus single-group reductions (one
event_type, one lang, one label) and duplicate-storm dedup inputs.

All transforms are deterministic SQL over the source parquet — both
engines see the identical degenerate data, so any hash mismatch is a
genuine semantics divergence, never fixture noise.

Usage:
    python tools/degenerate_fixtures.py [src_sf_dir] [dst_dir]
    PYTHONPATH=/root/repo python tools/check_oracle.py <dst_dir>
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_ties"

#: A fixed replacement text: ~40 words so shingle/minhash/BPE paths get
#: real n-grams, with internal repetition so repetition-ratio queries
#: see runs. Half the corpus becomes THIS exact document.
_DUP_TEXT = (
    "the quick brown fox jumps over the lazy dog and the quick brown "
    "fox jumps again while the lazy dog sleeps near the quick river "
    "bank watching the brown fox jump over logs"
)

#: table -> list of "expr AS name" replacements (unlisted columns copy
#: through unchanged).
DEGEN: dict[str, dict[str, str]] = {
    "events": {
        # one event type: every per-type group becomes THE group
        "event_type": "CASE WHEN event_type IS NULL THEN NULL ELSE 'click' END",
        # five users: windows/sessions per user get deep tie stacks
        "user_id": "user_id % 5",
        # integer grid: rank/percentile/median ties everywhere
        "value": "round(value)",
        # hour buckets: many events share ONE timestamp (asof joins,
        # first/last-in-window, session gaps all tie)
        "ts": "date_trunc('hour', ts)",
    },
    "documents": {
        "lang": "CASE WHEN lang IS NULL THEN NULL ELSE 'en' END",
        "source": "CASE WHEN source IS NULL THEN NULL ELSE 'web' END",
        # duplicate storm: half the corpus is one exact document
        "text": f"CASE WHEN doc_id % 2 = 0 THEN '{_DUP_TEXT}' ELSE text END",
        # keep the derived column consistent with the rewritten text
        "n_chars": (
            f"CASE WHEN doc_id % 2 = 0 THEN len('{_DUP_TEXT}') "
            "ELSE n_chars END"
        ),
    },
    "embeddings": {
        "label": "label % 2",
        # a quarter of the vectors are exact copies of vec 1: cosine /
        # ADC / bucket scores tie exactly, so every ANN rank needs its
        # vec_id tie-break on both engines
        "embedding": (
            "CASE WHEN vec_id % 4 = 0 AND vec_id <> 1 THEN "
            "(SELECT embedding FROM src WHERE vec_id = 1) "
            "ELSE embedding END"
        ),
    },
    # TPC-H: quantize money and truncate dates — revenue top-k and
    # order-date windows hit exact ties
    "lineitem": {
        "l_extendedprice": "round(l_extendedprice / 100) * 100",
        "l_shipdate": "date_trunc('month', l_shipdate)",
        "l_commitdate": "date_trunc('month', l_commitdate)",
        "l_receiptdate": "date_trunc('month', l_receiptdate)",
    },
    "orders": {
        "o_totalprice": "round(o_totalprice / 1000) * 1000",
        "o_orderdate": "date_trunc('month', o_orderdate)",
    },
    "customer": {"c_acctbal": "round(c_acctbal / 100) * 100"},
    "supplier": {"s_acctbal": "round(s_acctbal / 100) * 100"},
    "part": {"p_retailprice": "round(p_retailprice / 10) * 10"},
}

COPY_ONLY = ["region", "nation"]


def main() -> int:
    import duckdb

    dst = Path(DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table in COPY_ONLY + list(DEGEN):
        src = f"{SRC}/{table}.parquet"
        cols = con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{src}')"
        ).fetchall()
        dtypes = {name: dtype for name, dtype, *_ in cols}
        plan = DEGEN.get(table, {})
        select = []
        for name, dtype, *_ in cols:
            if name in plan:
                # cast back so the degenerate copy keeps the source
                # schema exactly (date_trunc widens DATE->TIMESTAMP,
                # round() widens to DOUBLE, etc.)
                select.append(f"CAST({plan[name]} AS {dtype}) AS {name}")
            else:
                select.append(name)
        con.execute(
            f"COPY (WITH src AS (SELECT * FROM read_parquet('{src}')) "
            f"SELECT {', '.join(select)} FROM src) "
            f"TO '{dst / table}.parquet' (FORMAT PARQUET)"
        )
        for name in plan:
            if name not in dtypes:
                continue  # fixture variant without this column
            n = con.sql(
                f"SELECT count(DISTINCT {name}) "
                f"FROM read_parquet('{dst / table}.parquet')"
            ).fetchone()[0]
            print(f"{table}.{name}: {n} distinct after degeneration")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
