"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the ``noop`` sink — a full evaluation of every
output column with zero write cost (a bare ``count()`` would let Catalyst
prune the computed columns and under-measure).

Contention guard: round-1's recorded bench was distorted 5-50× by a
concurrent Spark JVM (a pytest session) stealing the box. The JSON now
carries an ``env`` block — 1-minute load average at start, and the number
of OTHER live JVMs observed before this run's session starts — so any
round-over-round comparison can reject a contaminated sample; a warning
also goes to stderr when either signal is hot.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.session import get_spark
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog


def _env_snapshot() -> dict:
    """Pre-session contention signals (taken BEFORE our own JVM exists)."""
    try:
        load_1m = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        load_1m = None
    try:
        out = subprocess.run(["pgrep", "-c", "java"], capture_output=True,
                             text=True, timeout=5).stdout.strip()
        other_jvms = int(out) if out else 0
    except (OSError, ValueError, subprocess.TimeoutExpired):  # pragma: no cover
        other_jvms = None
    return {"load_avg_1m": load_1m, "other_jvms": other_jvms,
            "cpu_count": os.cpu_count()}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    env = _env_snapshot()
    ncpu = env["cpu_count"] or 1
    if (env["other_jvms"] or 0) > 0 or (env["load_avg_1m"] or 0) > 0.5 * ncpu:
        print(f"[bench] WARNING contended box: {env} — timings suspect",
              file=sys.stderr)

    spark = get_spark("bench", cpus=cpus)
    # Warm-up: JVM, codegen, parquet footers — not part of any measurement.
    # Through the catalog, not bare spark.read: events needs its
    # version-dependent TIMESTAMP(NANOS) handling (catalog.load_table).
    for t in ("part", "lineitem", "orders", "events", "documents",
              "embeddings"):
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            catalog.load_table(spark, sf_dir, t).count()
    # …and ONE untimed throwaway query action (round-8 VERDICT item 3):
    # table counts don't exercise whole-stage codegen / shuffle machinery,
    # so the first MEASURED query was absorbing ~1.4 s of JVM warm-up
    # (observed every round as a first-sample flag that re-measured
    # ambient). Burn the flagship chain once before any clock starts; the
    # env block records what ran and what it cost so the sample's
    # provenance is auditable.
    _wq = entrymod._ANCHORS[0] if getattr(entrymod, "_ANCHORS", None) \
        else next(iter(entrymod.queries()))
    _t0 = time.perf_counter()
    entrymod.queries()[_wq](spark, sf_dir) \
        .write.format("noop").mode("overwrite").save()
    env["warmup_query"] = _wq
    env["warmup_secs"] = round(time.perf_counter() - _t0, 3)
    spark.catalog.clearCache()

    # Repeats run as INTERLEAVED full passes (suite, then suite again),
    # min per query — a transient stall (GC, page-cache eviction) then
    # inflates at most one sample of a query instead of both back-to-back
    # ones, which is how round-3's first draft recorded a 45 s outlier for
    # a 1.5 s projection.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    times: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    items = list(entrymod.queries().items())
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")  # smoke-subset hook
    if only:
        keep = set(only.split(","))
        items = [(n, f) for n, f in items if n in keep]

    def _hygiene() -> None:
        # JVM-state hygiene BETWEEN measurements (untimed): queries
        # that persist() intermediates or register memory-sink temp
        # views would otherwise accumulate cached blocks across
        # 200×2 runs in this one JVM — measured effect: end-of-pass
        # GC stalls and 2-8x inflation of later shuffle-heavy
        # queries. Real deployments run one query per session.
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.name.startswith("_") and t.isTemporary:
                spark.catalog.dropTempView(t.name)

    def _measure(name, fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        samples.setdefault(name, []).append(dt)
        if name not in times or dt < times[name]:
            times[name] = round(dt, 3)  # running min drives retry triage
        _hygiene()
        return dt

    for _ in range(repeats):
        for name, fn in items:
            _measure(name, fn)

    # Outlier retry (round-4): on this box, ambient background load can
    # inflate BOTH samples of an unlucky query (round-4 recorded 2.6x on
    # an untouched anchor that re-measured at parity in a fresh JVM).
    # When a query's own samples disagree >1.5x, the environment was
    # noisy around it — grant up to two extra samples. Bounded: only the
    # high-variance few re-run, so suite time grows by seconds, not a
    # full pass.
    byname = dict(items)
    retried: dict[str, list[float]] = {}
    for name, ss in sorted(samples.items()):
        for _ in range(2):
            ss = samples[name]
            if max(ss) <= 1.5 * min(ss) or times[name] < 0.5:
                break
            _measure(name, byname[name])
            retried[name] = [round(s, 3) for s in samples[name]]

    env["load_avg_1m_end"] = round(os.getloadavg()[0], 2)
    # ``queries`` is the per-query MEDIAN (round-5 VERDICT item 5): the
    # min rewarded retried queries with best-of-4 vs best-of-2 — a small
    # systematic downward bias that compounded across rounds. The median
    # is insensitive to the sample count, so unequal retry depth no
    # longer skews cross-round comparisons. ``queries_min`` keeps the
    # old estimator so r6+ files remain comparable to the min-only
    # r1–r5 history (tools/bench_compare.py picks like-for-like), and
    # ``retried`` still exposes exactly which queries drew extra samples.
    def _median(ss: list[float]) -> float:
        ss = sorted(ss)
        m = len(ss) // 2
        return ss[m] if len(ss) % 2 else (ss[m - 1] + ss[m]) / 2

    med = {n: round(_median(ss), 3) for n, ss in samples.items()}
    total = round(sum(med.values()), 3)
    full = {
        "metric": "query_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": med,
        "queries_min": times,
        "retried": retried,
        "sf": sf,
        "env": env,
    }
    # The driver keeps only the LAST ~2000 chars of stdout and parses the
    # final line as JSON; the full 300-query dict is ~25 KB, so BENCH_r06
    # recorded "parsed": null (round-6 VERDICT item 6). Split the output:
    # the COMPLETE results go to a file (committed as BENCH_LOCAL_r{N});
    # stdout gets ONE compact line — suite total, env, and the per-query
    # seconds of the flagship/anchor chain only — sized far under the
    # tail capture so the driver's cross-round diff always has a parsed
    # summary. tools/bench_compare.py follows ``full_results_file`` when
    # gating against a compact driver artifact.
    # Default filename is RUN-STAMPED (round-7 ADVICE): a fixed
    # "BENCH_LOCAL_latest.json" default meant two consecutive rounds'
    # compact lines both pointed at the same repo-root file, so
    # bench_compare's two-newest comparison resolved OLD and NEW to
    # whichever run wrote last — old==new, every ratio 1.0, the gate
    # passing vacuously. A per-run stamp keeps every pointer unique;
    # the round refresh still pins the canonical name explicitly via
    # SPARK_GRAFT_BENCH_FULL_OUT=BENCH_LOCAL_r{N}.json.
    stamp = time.strftime("%Y%m%d_%H%M%S")
    full_out = os.environ.get("SPARK_GRAFT_BENCH_FULL_OUT",
                              f"BENCH_LOCAL_{stamp}.json")
    with open(full_out, "w") as fh:
        fh.write(json.dumps(full) + "\n")
    # the PERMANENT anchor set, not a _PRIORITY prefix: rotation rows
    # churn every round, so a prefix slice would make the driver's
    # cross-round diff compare disjoint query sets
    anchors = [n for n in getattr(entrymod, "_ANCHORS",
                                  entrymod._PRIORITY[:6]) if n in med]
    print(json.dumps({
        "metric": "query_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "n_queries": len(med),
        "queries": {n: med[n] for n in anchors},
        "full_results_file": os.path.basename(full_out),
        "sf": sf,
        "env": env,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
