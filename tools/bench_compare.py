"""Per-query bench regression gate (round-4 VERDICT item 8).

Compares the two most recent ``BENCH_r{N}.json`` files (or two given paths):
for every query timed in BOTH, flags a regression when
``new > max(ratio * old, floor_secs)`` — the ratio default 1.5 is the
documented ambient spread of this box, the floor keeps sub-second noise
from tripping the gate. Exits nonzero on any flagged regression so the
check works as a CI-style diff instead of narrative.

Usage:
    python tools/bench_compare.py                # two newest BENCH_r*.json
    python tools/bench_compare.py OLD.json NEW.json [--ratio 1.5]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

RATIO = 1.5
FLOOR_SECS = 1.0


_NON_QUERY_KEYS = {"metric", "value", "unit", "sf", "env", "load_avg_1m",
                   "other_jvms", "cpu_count", "load_avg_1m_end", "n", "rc",
                   "cpus"}


def _load(path: str) -> dict:
    """Normalize either bench.py's own JSON line (full ``queries`` dict,
    e.g. BENCH_LOCAL_r*.json) or the driver's wrapper (BENCH_r*.json),
    whose ``tail`` keeps only the LAST 2000 chars of output — recover the
    per-query pairs that survived truncation (a partial set still gates)."""
    with open(path) as fh:
        d = json.load(fh)
    if d.get("rc", 0) != 0:
        print(f"NOTE: {path} recorded rc={d.get('rc')} — timings unreliable")
    if not isinstance(d.get("queries"), dict) and isinstance(
            d.get("tail"), str):
        pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)',
                           d["tail"])
        d["queries"] = {k: float(v) for k, v in pairs
                        if k not in _NON_QUERY_KEYS}
        print(f"NOTE: {os.path.basename(path)} is a truncated driver tail — "
              f"recovered {len(d['queries'])} per-query timings")
    return d


def main() -> int:
    ratio, args, argv = RATIO, [], sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--ratio"):
            if "=" in a:
                ratio = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                i += 1
                ratio = float(argv[i])
            else:
                print("--ratio needs a value")
                return 2
        else:
            args.append(a)
        i += 1
    if len(args) >= 2:
        old_p, new_p = args[0], args[1]
    else:
        benches = sorted(
            glob.glob(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)",
                                        os.path.basename(p)).group(1)))
        if len(benches) < 2:
            print("need two BENCH_r*.json files")
            return 0
        old_p, new_p = benches[-2], benches[-1]
    old, new = _load(old_p), _load(new_p)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    print(f"{os.path.basename(old_p)} -> {os.path.basename(new_p)}: "
          f"{len(shared)} shared queries, gate {ratio}x / {FLOOR_SECS}s floor")
    flagged = []
    for q in shared:
        o, n = float(oq[q]), float(nq[q])
        if n > max(ratio * o, FLOOR_SECS):
            flagged.append((q, o, n))
    tot_o = sum(float(oq[q]) for q in shared)
    tot_n = sum(float(nq[q]) for q in shared)
    print(f"shared-set total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o if tot_o else 0:.2f}x)")
    for q, o, n in sorted(flagged, key=lambda t: t[2] / max(t[1], 1e-9),
                          reverse=True):
        print(f"REGRESSION {q}: {o:.2f}s -> {n:.2f}s ({n / max(o, 1e-9):.2f}x)")
    if not flagged:
        print("OK: no per-query regressions over the gate")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
