"""Compare two BENCH_r{N}.json files per query on the min basis (the
noise-robust floor; VERDICT r4 #5) and flag deltas beyond a noise band.

Usage: python tools/compare_bench.py BENCH_r4.json BENCH_r5.json [band=0.15]

Walks every section pair present in BOTH files (headline ``queries_min``
plus each ``extended*_min``), prints per-query old→new with a REGRESSED /
improved marker when |delta| exceeds the band, and exits 1 if any query
regressed — so the comparison is a mechanical check, not a judgement call.
"""

from __future__ import annotations

import json
import re
import sys


def load_bench(path: str) -> dict:
    """Accept a raw bench/BENCH_DETAIL JSON, or the driver's BENCH_r{N}
    record ({"tail": last-2000-chars, "parsed": maybe-None}). For a
    front-truncated tail, recover every complete "section": {...} block
    by regex — partial but honest (missing sections just aren't
    compared)."""
    d = json.load(open(path))
    if "queries_min" in d or "queries" in d:
        return d
    if isinstance(d.get("parsed"), dict):
        return d["parsed"]
    tail = d.get("tail", "")
    out: dict = {}
    for m in re.finditer(r'"([a-z0-9_]+)":\s*\{([^{}]*)\}', tail):
        entries = re.findall(r'"([\w]+)":\s*([0-9.]+)', m.group(2))
        if entries:
            out[m.group(1)] = {k: float(v) for k, v in entries}
    if not out:
        raise SystemExit(f"cannot extract bench sections from {path}")
    return out


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = load_bench(sys.argv[1])
    new = load_bench(sys.argv[2])
    band = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15

    sections = ["queries_min"] + sorted(
        k for k in old if k.startswith("extended") and k.endswith("_min")
    )
    regressed = []
    for sec in sections:
        a, b = old.get(sec), new.get(sec)
        if not isinstance(a, dict) or not isinstance(b, dict):
            continue
        print(f"[{sec}]")
        for q in a:
            if q not in b:
                print(f"  {q}: dropped from new bench")
                continue
            va, vb = a[q], b[q]
            delta = (vb - va) / va if va else 0.0
            mark = ""
            if delta > band:
                mark = "  << REGRESSED"
                regressed.append((sec, q, va, vb))
            elif delta < -band:
                mark = "  (improved)"
            print(f"  {q}: {va:.3f} -> {vb:.3f}  {delta:+.0%}{mark}")
    if regressed:
        print(f"\n{len(regressed)} regressions beyond {band:.0%}:")
        for sec, q, va, vb in regressed:
            print(f"  {sec}/{q}: {va:.3f} -> {vb:.3f}")
    else:
        print(f"\nno regressions beyond {band:.0%} (min basis)")
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
