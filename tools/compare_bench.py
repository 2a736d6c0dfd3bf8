"""Compare two BENCH_r{N}.json files per query on the min basis (the
noise-robust floor; VERDICT r4 #5) and flag deltas beyond a noise band.

Usage: python tools/compare_bench.py BENCH_r4.json BENCH_r5.json [band=0.15]

Walks every section pair present in BOTH files (headline ``queries_min``
plus each ``extended*_min``), prints per-query old→new with a REGRESSED /
improved marker when |delta| exceeds the band, and exits 1 if any query
regressed — so the comparison is a mechanical check, not a judgement call.

When BOTH files carry the machine-drift canary (``canary.jvm_min`` in
BENCH_DETAIL, ``canary`` in the compact line — recorded since r7,
normalized ratios precomputed as ``normalized_min`` since r8), deltas
are computed on the CANARY-NORMALIZED basis (old/canary_old vs
new/canary_new): ambient machine drift moves both a query and the
canary, so the ratio isolates the diff under test. Raw seconds are
still printed alongside.
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


def _canary_jvm(d: dict) -> "float | None":
    c = d.get("canary")
    if isinstance(c, dict):
        c = c.get("jvm_min")
    return float(c) if isinstance(c, (int, float)) and c > 0 else None


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = load_bench(sys.argv[1])
    new = load_bench(sys.argv[2])
    band = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    ca, cb = _canary_jvm(old), _canary_jvm(new)
    normalized = ca is not None and cb is not None
    if normalized:
        print(
            f"canary-normalized basis: old jvm_min {ca:.3f}, "
            f"new jvm_min {cb:.3f} (machine factor {cb / ca:.2f}x)"
        )
    else:
        print("no canary in one/both files: RAW seconds basis "
              "(cross-round machine drift not corrected)")

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
            na, nb = (va / ca, vb / cb) if normalized else (va, vb)
            delta = (nb - na) / na if na else 0.0
            mark = ""
            if delta > band:
                mark = "  << REGRESSED"
                regressed.append((sec, q, va, vb, delta))
            elif delta < -band:
                mark = "  (improved)"
            norm_txt = f"  [norm {na:.2f} -> {nb:.2f}]" if normalized else ""
            print(
                f"  {q}: {va:.3f} -> {vb:.3f}  {delta:+.0%}{norm_txt}{mark}"
            )
    basis = "canary-normalized" if normalized else "raw min"
    if regressed:
        print(f"\n{len(regressed)} regressions beyond {band:.0%} ({basis}):")
        for sec, q, va, vb, delta in regressed:
            print(f"  {sec}/{q}: {va:.3f} -> {vb:.3f} ({delta:+.0%})")
    else:
        print(f"\nno regressions beyond {band:.0%} ({basis} basis)")
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
