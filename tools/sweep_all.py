"""Run the full adversarial-fixture battery against the query registry.

One command for what rounds 4-8 accreted as separate hunters, each of
which has caught real divergence classes the dense fixtures cannot:

  sparse   (tools/sparsify_fixtures)   missing-combination class (r4 unpivot)
  nulls    (tools/nullify_fixtures)    NULL keys/values class (r8: NULL group
                                       keys, NULL ts/text/embedding rules)
  ties     (tools/degenerate_fixtures) under-specified-ordering class (r8:
                                       arg_max under tied timestamps)
  unicode  (tools/unicode_fixtures)    non-ASCII class (r8: case-fold
                                       contract, byte-vs-char, BLOB casts)
  nonfinite (tools/nonfinite_fixtures) NaN/±Inf class (r8: the
                                       finite-measure rule — an invalid
                                       reading becomes NULL, both sides)
  json     (tools/json_fixtures)       adversarial-props class (r8:
                                       tolerant extraction, key-occurrence
                                       map explode, VARIANT validity)
  xts      (tools/extreme_ts_fixtures) extreme-timestamp class (r8:
                                       pre-epoch floor-vs-truncate
                                       second arithmetic)
  tz       (tools/tz_fixtures)         instant-typed timestamps + hostile
                                       ambient zone (r9: TIMESTAMPTZ
                                       parquet, session/process TZ pins)
  longdoc  (tools/longdoc_fixtures)    extreme-length single documents
                                       (r9: per-row O(doc-length) work
                                       skew — 10 MB bodies in one task)
  embed    (tools/embedding_fixtures)  adversarial vectors (r10: zero/
                                       duplicate/denormal/huge/NULL-
                                       element embeddings — the vector-
                                       validity contract, functions/vec)
  wide     (tools/wide_fixtures)       wide-schema dynamic documents
                                       (r10: 300-key/long-key/dup-storm
                                       props — the jsonpath contract at
                                       Mongo-schemaless breadth)
  multifile (tools/multifile_fixtures) every table as a DIRECTORY of 5
                                       part files (r10: multi-split
                                       scans — kernel parallelism,
                                       file-boundary window edges)
  embed_double (tools/embedding_double_fixtures)
                                       DOUBLE-typed magnitude hazards a
                                       float32 column cannot carry (r11:
                                       norm²-underflow / norm²-overflow
                                       / at-floor denormal-dot classes —
                                       the extended usable range)
  tiestorm (tools/tiestorm_fixtures)   many DISTINCT vectors at ONE
                                       bit-identical cosine per probe
                                       (r11: every rank window's
                                       (score, id) order must be total
                                       under score ties)
  label    (tools/label_fixtures)      hostile label axis (r11: NULL/
                                       negative/unicode/1000-char/
                                       duplicate-storm labels through
                                       the stratified/centroid/quality
                                       group-by queries)
  combo    (ties ∘ nulls ∘ unicode)    interaction of three value
                                       transforms on one copy
  combo_label (label ∘ multifile)      hostile label values over a
                                       multi-split layout (r11: storm
                                       labels spanning file boundaries)
  combo_ties (tiestorm ∘ multifile)    bit-identical score ties spanning
                                       part files (r11: (score, id)
                                       totality independent of scan
                                       order / file placement)
  hostile_id (tools/hostile_id_fixtures)
                                       duplicate/NULL/extreme/storm
                                       PRIMARY ids (r11: runs only the
                                       defined surface — the integrity
                                       audits + catalog counts; the
                                       rest of the registry is
                                       UNDEFINED under dup ids by
                                       documented precondition)

Each stage builds its fixture copy (cheap, DuckDB-only) and runs the
FULL registry through tools/check_oracle.py (a Spark session per stage —
sequential on purpose; two local[32] sessions thrash). Exit code is the
number of failing stages. ~6 min per stage at sf0.01.

The zero-row / one-row sweeps stay separate (tools/empty_sweep.py keeps
its own xfail list and fixture builder), as does the determinism check.

Usage: PYTHONPATH=/root/repo python tools/sweep_all.py [src_sf_dir] [stage ...]
(stage names filter the battery — e.g. `sweep_all.py /root/testdata/sf0.01
ties json` re-runs just those two.)
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

#: stage name -> (builder argv, fixture dir[, query subset]).
#: Builders take (src, dst). A stage with a query subset runs ONLY those
#: registry entries — for fixtures whose hostility makes most of the
#: registry UNDEFINED by design (hostile_id: rank tie-breaks are total
#: only under unique ids; the audit queries are the defined surface).
STAGES: list[tuple] = [
    ("sparse", [["tools/sparsify_fixtures.py", SRC, "/tmp/sf_sparse"]],
     "/tmp/sf_sparse"),
    ("nulls", [["tools/nullify_fixtures.py", SRC, "/tmp/sf_nulls"]],
     "/tmp/sf_nulls"),
    ("ties", [["tools/degenerate_fixtures.py", SRC, "/tmp/sf_ties"]],
     "/tmp/sf_ties"),
    ("unicode", [["tools/unicode_fixtures.py", SRC, "/tmp/sf_unicode"]],
     "/tmp/sf_unicode"),
    ("nonfinite", [["tools/nonfinite_fixtures.py", SRC, "/tmp/sf_nonfinite"]],
     "/tmp/sf_nonfinite"),
    ("json", [["tools/json_fixtures.py", SRC, "/tmp/sf_json"]],
     "/tmp/sf_json"),
    ("xts", [["tools/extreme_ts_fixtures.py", SRC, "/tmp/sf_xts"]],
     "/tmp/sf_xts"),
    ("tz", [["tools/tz_fixtures.py", SRC, "/tmp/sf_tz"]],
     "/tmp/sf_tz"),
    ("longdoc", [["tools/longdoc_fixtures.py", SRC, "/tmp/sf_longdoc"]],
     "/tmp/sf_longdoc"),
    ("embed", [["tools/embedding_fixtures.py", SRC, "/tmp/sf_embed"]],
     "/tmp/sf_embed"),
    ("wide", [["tools/wide_fixtures.py", SRC, "/tmp/sf_wide"]],
     "/tmp/sf_wide"),
    ("multifile", [["tools/multifile_fixtures.py", SRC, "/tmp/sf_multifile"]],
     "/tmp/sf_multifile"),
    ("embed_double",
     [["tools/embedding_double_fixtures.py", SRC, "/tmp/sf_embed_double"]],
     "/tmp/sf_embed_double"),
    ("tiestorm", [["tools/tiestorm_fixtures.py", SRC, "/tmp/sf_tiestorm"]],
     "/tmp/sf_tiestorm"),
    ("label", [["tools/label_fixtures.py", SRC, "/tmp/sf_label"]],
     "/tmp/sf_label"),
    # combo: value-transform composition (ties, then unicode text
    # injection, then NULL injection — each tool is a pure per-table
    # rewrite, so they chain)
    ("combo",
     [["tools/degenerate_fixtures.py", SRC, "/tmp/sf_combo_a"],
      ["tools/unicode_fixtures.py", "/tmp/sf_combo_a", "/tmp/sf_combo_b"],
      ["tools/nullify_fixtures.py", "/tmp/sf_combo_b", "/tmp/sf_combo"]],
     "/tmp/sf_combo"),
    # layout ∘ value composition (r10): hostile documents (wide) +
    # hostile vectors (embed) + every table split into part files
    # (multifile) — hostile VALUES arriving over a hostile LAYOUT,
    # the shape a real schemaless export actually has
    ("combo_layout",
     [["tools/wide_fixtures.py", SRC, "/tmp/sf_cl_a"],
      ["tools/embedding_fixtures.py", "/tmp/sf_cl_a", "/tmp/sf_cl_b"],
      ["tools/multifile_fixtures.py", "/tmp/sf_cl_b", "/tmp/sf_combo_layout"]],
     "/tmp/sf_combo_layout"),
    # label ∘ layout (r11, ROUND_NOTES' named candidate): hostile label
    # VALUES (NULL/empty/unicode/kilobyte/storm/INT_MIN) arriving over
    # multi-split scans — a storm label now spans file boundaries, so
    # per-group windows and group-by partials merge across splits with
    # pathological keys.
    ("combo_label",
     [["tools/label_fixtures.py", SRC, "/tmp/sf_clb_a"],
      ["tools/multifile_fixtures.py", "/tmp/sf_clb_a", "/tmp/sf_combo_label"]],
     "/tmp/sf_combo_label"),
    # ties ∘ layout (r11): score-tie storms whose tied rows SPAN part
    # files — rank windows repartition on the window key, so a total
    # (score, id) order must survive arbitrary file placement of the
    # tied rows; witnesses that no tie-break leans on scan order.
    ("combo_ties",
     [["tools/tiestorm_fixtures.py", SRC, "/tmp/sf_cts_a"],
      ["tools/multifile_fixtures.py", "/tmp/sf_cts_a", "/tmp/sf_combo_ties"]],
     "/tmp/sf_combo_ties"),
    # hostile primary ids (r11): duplicate / NULL / extreme / storm ids.
    # NOT registry-safe by design — runs only the defined surface: the
    # integrity audits must COUNT the damage identically on both
    # engines, and catalog counts must be oblivious to it.
    ("hostile_id",
     [["tools/hostile_id_fixtures.py", SRC, "/tmp/sf_hostile_id"]],
     "/tmp/sf_hostile_id",
     ("id_integrity_qa", "referential_integrity_qa", "catalog_counts")),
]

#: Extra environment per stage. The tz stage runs the registry under a
#: HOSTILE ambient zone on top of the instant-typed fixture: proves no
#: engine default, oracle function, or harness conversion leans on the
#: machine's timezone (check_oracle + Engine pin their own sessions).
STAGE_ENV: dict[str, dict[str, str]] = {
    "tz": {"TZ": "America/New_York"},
}


def main() -> int:
    known = {stage[0] for stage in STAGES}
    unknown = ONLY - known
    if unknown:
        # A misspelled stage would otherwise match nothing and exit 0 —
        # a false-green for a gate script (ADVICE r8).
        print(f"sweep_all: unknown stage(s) {sorted(unknown)}; "
              f"known: {sorted(known)}")
        return 2
    failed = []
    for name, builders, fixture, *rest in STAGES:
        queries = tuple(rest[0]) if rest else ()
        if ONLY and name not in ONLY:
            continue
        env = {**os.environ, **STAGE_ENV.get(name, {})}
        for argv in builders:
            r = subprocess.run(
                [sys.executable] + argv, cwd=REPO,
                capture_output=True, text=True, env=env,
            )
            if r.returncode != 0:
                print(f"[{name}] builder {argv[0]} FAILED:\n{r.stderr[-2000:]}")
                failed.append(name)
                break
        else:
            what = (f"{len(queries)}-query defined subset" if queries
                    else "registry")
            print(f"[{name}] fixture built at {fixture}; running {what}...")
            r = subprocess.run(
                [sys.executable, "-u", "tools/check_oracle.py", fixture,
                 *queries],
                cwd=REPO, capture_output=True, text=True, env=env,
            )
            tail = "\n".join(
                ln for ln in r.stdout.replace("\r", "\n").splitlines()
                if ln.startswith("FAIL") or ln.endswith("failures")
                or " failures: " in ln
            )
            print(f"[{name}] {tail.strip() or r.stdout[-400:]}")
            if r.returncode != 0:
                failed.append(name)
    print(f"\nsweep_all: {len(failed)} failing stages"
          + (f": {failed}" if failed else ""))
    return len(failed)


if __name__ == "__main__":
    raise SystemExit(main())
