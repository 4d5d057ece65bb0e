"""Per-query bench regression gate (round-4 VERDICT item 8).

Compares the two most recent ``BENCH_r{N}.json`` files (or two given paths):
for every query timed in BOTH, flags a regression when
``new > max(ratio * old, floor_secs)`` — the ratio default 1.5 is the
documented ambient spread of this box, the floor keeps sub-second noise
from tripping the gate. Exits nonzero on any flagged regression so the
check works as a CI-style diff instead of narrative.

Flagged queries are AUTO-RE-MEASURED before reporting (round-5 VERDICT
item 7): on this box, ambient load can inflate both recorded samples of
an unlucky query (round-4 flagged two anchors that re-measured at
parity). Since round 11 the re-measure uses the SAME estimator as the
main bench — min over 2 interleaved fresh-JVM batches via bench.py's
``_spawn_batch(only=...)``, plus the targeted third batch for >1.5x
sample spread — so two same-code gate runs agree on the flag set (the
old one-shared-JVM re-measure was order-sensitive; VERDICT r10 item 1).
Bounded: at most ``--remeasure-cap`` queries (default 8) re-run;
``--no-remeasure`` restores the raw diff.

Usage:
    python tools/bench_compare.py     # committed BENCH_LOCAL_r* baseline
                                      # vs newest driver BENCH_r*.json
    python tools/bench_compare.py OLD.json NEW.json [--ratio 1.5]
                                  [--no-remeasure] [--remeasure-cap 8]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

RATIO = 1.5
FLOOR_SECS = 1.0

#: Documented deliberate trades (kept tiny, reviewed each round): queries
#: whose implementation was deliberately REWRITTEN in a given round —
#: r6 replaced single-task global windows with two-phase range-partition
#: machinery (r5 VERDICT items 2-4; scale evidence BENCH_SF1_r06.json);
#: r11 replaced the engine-native approx-distinct paths with the
#: oracle-exact portable register-table HLL (VERDICT r10 item 2 — the
#: certification surface pays an extra agg+join at sf0.1; the
#: engine-native forms remain available as documented alternatives).
#: Reported as DELIBERATE, excluded from the exit code.
#:
#: SCOPE (round-6 ADVICE, generalized in r11): the exemption applies
#: ONLY when the OLD file predates the rewrite round — parsed from the
#: filename's r{N}; once a post-rewrite baseline exists the cost is
#: priced into the old numbers, so a fresh flag on these queries is a
#: genuine regression and fails the gate like any other. Files with no
#: round in their name fall back to the pre-r6 structural check (a
#: min-only file with no ``queries_min``/``basis``/full-results
#: pointer).
ALLOWED_TRADES = {
    "ab_purchase_ks": (6, "r6 two-phase CDF rewrite (was single-task window)"),
    "vocab_growth_curve": (6, "r6 two-phase ntile rewrite"),
    "orders_revenue_8020": (6, "r6 two-phase cumsum rewrite"),
    "part_abc_classes": (6, "r6 two-phase cumsum rewrite"),
    "customer_rfm_segments": (6, "r6 two-phase ntile x3 rewrite"),
    "daily_genre_kpis_approx":
        (11, "r11 portable register-table HLL promotion "
             "(was approx_count_distinct)"),
    "events_profile_approx":
        (11, "r11 portable register-table HLL promotion"),
    "events_daily_users_sketch":
        (11, "r11 portable register-table HLL promotion "
             "(was binary DataSketches column)"),
    "events_monthly_users_sketch_rollup":
        (11, "r11 portable register-table HLL promotion"),
}


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
    # r7+ bench.py prints a COMPACT stdout line (anchors only) and writes
    # the complete per-query dict to ``full_results_file`` — follow the
    # pointer (checked next to the given path, then the repo root) so the
    # gate sees every query, not just the anchor chain. Applies both to
    # the raw compact line and to the driver wrapper whose ``parsed``
    # carries it.
    src = d.get("parsed") if isinstance(d.get("parsed"), dict) else d
    ref = (src or {}).get("full_results_file")
    if ref and "queries_min" not in d:
        for cand in (os.path.join(os.path.dirname(os.path.abspath(path)),
                                  ref),
                     os.path.join(os.path.dirname(os.path.dirname(
                         os.path.abspath(__file__))), ref)):
            if os.path.exists(cand):
                with open(cand) as fh:
                    d = json.load(fh)
                d["_resolved_full_path"] = os.path.abspath(cand)
                print(f"NOTE: {os.path.basename(path)} is a compact "
                      f"summary — loaded full results from {cand}")
                break
        else:
            # LOUD degradation: silently gating only the ~6 anchor rows
            # would let a regression in any other query exit 0
            print(f"WARNING: {os.path.basename(path)} is a compact "
                  f"summary and its full_results_file ({ref!r}) was not "
                  f"found — gating only the "
                  f"{len((src or {}).get('queries', {}))} anchor queries "
                  f"in the compact line; fetch the full BENCH_LOCAL file "
                  f"for real coverage")
    # Surface the sample basis from a driver wrapper's parsed compact
    # line so the estimator pick below sees it even when the full-results
    # pointer did not resolve.
    if "basis" not in d and isinstance(d.get("parsed"), dict) \
            and d["parsed"].get("basis"):
        d["basis"] = d["parsed"]["basis"]
    if not isinstance(d.get("queries"), dict) and isinstance(
            d.get("tail"), str):
        pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)',
                           d["tail"])
        d["queries"] = {k: float(v) for k, v in pairs
                        if k not in _NON_QUERY_KEYS}
        print(f"NOTE: {os.path.basename(path)} is a truncated driver tail — "
              f"recovered {len(d['queries'])} per-query timings")
    return d


def _file_calib(d: dict) -> float | None:
    """A bench file's calibration reading: min over its fresh-JVM batches
    of min(start, end) kernel secs — the same least-loaded-batch basis as
    the per-query min estimator. None for pre-r12 files (no probe)."""
    vals = []
    for b in d.get("batches", []):
        e = b.get("env", {})
        vs = [v for v in (e.get("calib_secs"), e.get("calib_secs_end"))
              if v]
        if vs:
            vals.append(min(vs))
    return min(vals) if vals else None


def _remeasure(names: list[str],
               sf_dir: str) -> tuple[dict[str, float], float | None]:
    """Re-time ``names`` with the SAME estimator the main bench uses:
    min over interleaved FRESH-JVM batches via bench.py's
    ``_spawn_batch(only=...)``, plus bench.py's targeted third batch for
    queries whose two samples disagree > NOISY_RATIO (round-11, VERDICT
    r10 item 1 — the previous one-shared-JVM/2-sample re-measure was
    order-sensitive and two same-code gate runs could disagree on a
    survivor). Returns ({name: secs}, calib_secs_min_of_batches) —
    ({}, None) on any subprocess failure, in which case the caller
    reports the raw flags rather than hiding them."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    try:
        import bench
    except Exception as e:  # pragma: no cover
        print(f"NOTE: re-measure unavailable ({e}); reporting raw flags")
        return {}, None
    # explicit, not setdefault (round-12 ADVICE): a pre-set env var must
    # not silently override the dataset implied by the files under
    # comparison
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    samples: dict[str, list[float]] = {}
    calibs: list[float] = []

    def _batch_calib(b: dict) -> None:
        e = b.get("env", {})
        vals = [v for v in (e.get("calib_secs"), e.get("calib_secs_end"))
                if v]
        if vals:
            calibs.append(min(vals))

    try:
        for i in range(2):
            print(f"  re-measure fresh-JVM batch {i + 1}/2 ...")
            b = bench._spawn_batch(only=names)
            _batch_calib(b)
            for n, s in b["queries"].items():
                samples.setdefault(n, []).append(float(s))
        noisy = sorted(n for n, ss in samples.items()
                       if len(ss) >= 2
                       and max(ss) > bench.NOISY_RATIO * min(ss)
                       and min(ss) >= bench.NOISY_FLOOR_SECS)
        if noisy:
            print(f"  re-measure targeted third batch: {len(noisy)} "
                  f"high-variance queries ...")
            b = bench._spawn_batch(only=noisy)
            _batch_calib(b)
            for n, s in b["queries"].items():
                samples.setdefault(n, []).append(float(s))
    except Exception as e:  # pragma: no cover
        print(f"NOTE: re-measure failed ({e}); reporting raw flags")
        return {}, None
    return ({n: round(min(ss), 3) for n, ss in samples.items()},
            min(calibs) if calibs else None)


def main() -> int:
    ratio, args, argv = RATIO, [], sys.argv[1:]
    remeasure, cap = True, 8
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
        elif a == "--no-remeasure":
            remeasure = False
        elif a.startswith("--remeasure-cap"):
            if "=" in a:
                cap = int(a.split("=", 1)[1])
            else:
                i += 1
                cap = int(argv[i])
        else:
            args.append(a)
        i += 1
    if len(args) >= 2:
        old_p, new_p = args[0], args[1]
    else:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # No-args default (round-11, VERDICT r10 item 1): gate the newest
        # driver record against the COMMITTED fresh-min per-query baseline
        # (BENCH_LOCAL_r{N}.json, highest N — the re-pin BASELINE.md
        # promises). Fall back to the two newest driver records when no
        # committed baseline exists.
        locals_ = sorted(
            glob.glob(os.path.join(repo, "BENCH_LOCAL_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)",
                                        os.path.basename(p)).group(1)))
        benches = sorted(
            glob.glob(os.path.join(repo, "BENCH_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)",
                                        os.path.basename(p)).group(1)))
        def _is_fresh_min(p: str) -> bool:
            # tolerant scan (round-12 ADVICE): one corrupt/unreadable
            # baseline file must not crash the gate — skip it and let
            # the fallback path decide
            try:
                with open(p) as fh:
                    return json.load(fh).get("basis") == "fresh_jvm_min"
            except (OSError, ValueError):
                print(f"NOTE: skipping unparsable baseline candidate "
                      f"{os.path.basename(p)}")
                return False

        base = next((p for p in reversed(locals_) if _is_fresh_min(p)),
                    None)
        if base and benches:
            old_p, new_p = base, benches[-1]
        elif len(benches) >= 2:
            old_p, new_p = benches[-2], benches[-1]
        else:
            print("need a committed BENCH_LOCAL_r*.json baseline or two "
                  "BENCH_r*.json files")
            return 0
    old, new = _load(old_p), _load(new_p)
    # Same-file guard (round-7 ADVICE): if both compact summaries point at
    # ONE full-results file (the pre-r8 unstamped default), the comparison
    # is old==new — every ratio exactly 1.0 and the gate passes without
    # testing anything. That is a configuration error, not a clean bill.
    # Compare EFFECTIVE paths on both sides (round-8 ADVICE): a compact
    # summary resolving to FULL.json vs that same FULL.json passed
    # directly is just as vacuous as compact-vs-compact.
    old_eff = old.get("_resolved_full_path") or os.path.abspath(old_p)
    new_eff = new.get("_resolved_full_path") or os.path.abspath(new_p)
    if old_eff == new_eff:
        print(f"ERROR: old and new resolve to the SAME results file "
              f"({old_eff})"
              f" — the comparison is vacuous. Point the compact summaries "
              f"at distinct full-results files (bench.py run-stamps the "
              f"default since r8) or pass the BENCH_LOCAL files directly.")
        return 2
    # Like-for-like estimator pick (round-5 VERDICT item 5, extended for
    # the round-10 protocol): r10+ files are tagged ``basis:
    # fresh_jvm_min`` and their ``queries`` IS the min-of-fresh-JVM-
    # batches estimator; r6-r9 files carry the within-JVM median in
    # ``queries`` and the min in ``queries_min``; r1-r5 files are
    # min-only. Compare fresh-min vs fresh-min when both are r10+;
    # mixing a fresh-min file with an older one compares min-vs-min
    # (the closest pair — a median would gate against a min, a
    # guaranteed spurious flag); two r6-r9 files compare medians.
    def _min_est(d: dict) -> dict:
        if d.get("basis") == "fresh_jvm_min":
            return d.get("queries", {})
        return d.get("queries_min") or d.get("queries", {})

    o_fresh = old.get("basis") == "fresh_jvm_min"
    n_fresh = new.get("basis") == "fresh_jvm_min"
    if o_fresh and n_fresh:
        oq, nq, estimator = old["queries"], new["queries"], "fresh-jvm-min"
    elif o_fresh or n_fresh:
        oq, nq, estimator = _min_est(old), _min_est(new), "min"
    elif "queries_min" in old and "queries_min" in new:
        oq, nq, estimator = old["queries"], new["queries"], "median"
    else:
        oq, nq, estimator = _min_est(old), _min_est(new), "min"
    shared = sorted(set(oq) & set(nq))
    print(f"{os.path.basename(old_p)} -> {os.path.basename(new_p)}: "
          f"{len(shared)} shared queries ({estimator} estimator), "
          f"gate {ratio}x / {FLOOR_SECS}s floor")
    # canonical round-stamped artifacts ONLY — a loose r\d+ search would
    # misparse arbitrary filenames (e.g. "OLD_pre_r6.json")
    m_old = re.match(r"^BENCH(?:_LOCAL|_SF1)?_r0*(\d+)\.json$",
                     os.path.basename(old_p))
    old_round = int(m_old.group(1)) if m_old else None
    # structural pre-r6 fallback for round-less filenames (see scope note)
    old_is_pre_r6 = ("queries_min" not in old and "basis" not in old
                     and "full_results_file" not in old
                     and "full_results_file" not in (old.get("parsed") or {}))
    # Calibration normalization (round-12, VERDICT r11 item 3): when both
    # files carry the fixed CPU-kernel probe (bench.calibration_kernel,
    # recorded per fresh-JVM batch), the gate widens by the measured
    # contention ratio instead of adjudicating load by narrative. The
    # factor only ever RELAXES the gate (clamped ≥1 — a quieter new box
    # must still beat the raw bar) and is capped at 3x so a broken probe
    # cannot mask an arbitrary real regression.
    o_calib, n_calib = _file_calib(old), _file_calib(new)
    calib_f = 1.0
    if o_calib and n_calib:
        calib_f = min(max(n_calib / o_calib, 1.0), 3.0)
        print(f"calibration: old {o_calib:.2f}s, new {n_calib:.2f}s -> "
              f"gate widened {calib_f:.2f}x" if calib_f > 1.0 else
              f"calibration: old {o_calib:.2f}s, new {n_calib:.2f}s -> "
              f"no widening (new box not slower)")
    flagged = []
    for q in shared:
        o, n = float(oq[q]), float(nq[q])
        if n > max(ratio * o * calib_f, FLOOR_SECS):
            if q in ALLOWED_TRADES:
                trade_round, reason = ALLOWED_TRADES[q]
                pre_rewrite = (old_round < trade_round
                               if old_round is not None
                               else old_is_pre_r6 and trade_round == 6)
                if pre_rewrite:
                    print(f"DELIBERATE {q}: {o:.2f}s -> {n:.2f}s ({reason})")
                    continue
            flagged.append((q, o, n))
    tot_o = sum(float(oq[q]) for q in shared)
    tot_n = sum(float(nq[q]) for q in shared)
    print(f"shared-set total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o if tot_o else 0:.2f}x)")
    if flagged and remeasure:
        names = [q for q, _, _ in flagged][:cap]
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        print(f"re-measuring {len(names)} flagged queries in a fresh JVM "
              f"at {sf_dir} ...")
        fresh, re_calib = _remeasure(names, sf_dir)
        # the re-measure batches carry their OWN calibration — normalize
        # against the baseline's, same clamp as above, so two gate runs
        # under different ambient load agree on the survivor set
        re_f = 1.0
        if re_calib and o_calib:
            re_f = min(max(re_calib / o_calib, 1.0), 3.0)
            if re_f > 1.0:
                print(f"  re-measure calibration {re_calib:.2f}s vs old "
                      f"{o_calib:.2f}s -> gate widened {re_f:.2f}x")
        survived = []
        for q, o, n in flagged:
            f = fresh.get(q)
            if f is not None and f <= max(ratio * o * re_f, FLOOR_SECS):
                print(f"AMBIENT {q}: recorded {n:.2f}s, fresh-JVM "
                      f"{f:.2f}s vs old {o:.2f}s — under the gate, "
                      f"reclassified as noise")
            else:
                survived.append((q, o, f if f is not None else n))
        flagged = survived
    for q, o, n in sorted(flagged, key=lambda t: t[2] / max(t[1], 1e-9),
                          reverse=True):
        print(f"REGRESSION {q}: {o:.2f}s -> {n:.2f}s ({n / max(o, 1e-9):.2f}x)")
    if not flagged:
        print("OK: no per-query regressions over the gate")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
