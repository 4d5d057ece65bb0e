"""sf1 scale probe for the headline chain (round-5 VERDICT item 6).

The driver ships testdata at sf{0.001,0.01,0.1} only, so this tool
materializes an sf1-equivalent lake (10× rows) by replicating the sf0.1
``lineitem``/``part`` tables with key offsets — fact keys (user, order)
shift per replica so distinct-key cardinalities really grow 10×, and
``p_partkey``/``l_partkey`` shift in lockstep so the streams⋈songs join
fans out over a 10×-larger dimension exactly like a true scale-up —
then times the flagship chain at BOTH scales and reports the blowup
ratio per query. A plan that is secretly single-task or
shuffle-degenerate shows up as a super-linear (>12×) ratio long before
a real cluster would reveal it; a healthy plan lands near the data
ratio (≤ ~10× plus constant overheads).

Writes ONE JSON line (also to ``BENCH_SF1_r{N}.json`` via the round
driver convention):  {"metric": "sf1_scale_probe", "queries":
{name: {"sf0.1": s, "sf1": s, "ratio": r}}, ...}

The generated lake lives under .scale_probe/sf1 inside the repo
(gitignored) and is rebuilt only when absent — delete the dir to force
regeneration after a testdata refresh.

Usage:  python tools/scale_probe.py [--out BENCH_SF1_rN.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.session import (  # noqa: E402
    get_spark,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(REPO, ".scale_probe", "sf1")
COPIES = 10
#: the reference-surface chain the probe certifies (VERDICT r5 item 6),
#: plus the round-6 two-phase rewrites — the queries whose sf0.1 cost
#: DELIBERATELY grew (bench_compare ALLOWED_TRADES) because the
#: single-task window they replaced cannot scale; this probe is the
#: evidence side of that trade (their ratio at 10x data should track
#: the data, not a single task's sort) — plus, round 7 (VERDICT r6
#: item 3), the five most expensive operators in the suite: the
#: pair-generating / iterative ops where superlinearity would actually
#: hide. Their inputs are replica-DECORRELATED (see ensure_sf1) so 10x
#: data means 10x the pair/cluster structure, not a quadratic
#: dup-explosion the operator is not being graded on.
CHAIN = ["daily_genre_kpis", "top_songs_per_genre", "kv_genre_kpi_items",
         "pipeline_e2e_kpis",
         "customer_rfm_segments", "ab_purchase_ks",
         "orders_revenue_8020", "events_value_equidepth",
         "neardup_containment_pairs", "semantic_dedup_survivors",
         "shared_ngram_pairs_docs", "dedup_clusters",
         "part_order_pagerank"]
#: super-linear alarm: 10× data should cost ≤ ~12× wall (ratio includes
#: constant per-query overhead, so a small margin over 10 is normal)
BLOWUP = 12.0


def ensure_sf1(spark: SparkSession) -> str:
    marker = os.path.join(DST, "_BUILT_v2")  # v2: + documents/embeddings
    if os.path.exists(marker):
        return DST
    os.makedirs(DST, exist_ok=True)
    part = spark.read.parquet(os.path.join(SRC, "part.parquet"))
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    events = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    offs = {
        "p": part.agg(F.max("p_partkey")).collect()[0][0] + 1,
        "s": li.agg(F.max("l_suppkey")).collect()[0][0] + 1,
        "o": li.agg(F.max("l_orderkey")).collect()[0][0] + 1,
        "c": orders.agg(F.max("o_custkey")).collect()[0][0] + 1,
        "e": events.agg(F.max("event_id")).collect()[0][0] + 1,
        "u": events.agg(F.max("user_id")).collect()[0][0] + 1,
        "d": docs.agg(F.max("doc_id")).collect()[0][0] + 1,
        "v": emb.agg(F.max("vec_id")).collect()[0][0] + 1,
    }

    def rep(df, shifts: dict[str, str], tweak=None):
        out = None
        for i in range(COPIES):
            d = df
            for col, key in shifts.items():
                d = d.withColumn(col, F.col(col) + F.lit(i * offs[key]))
            if tweak is not None:
                d = tweak(d, i)
            out = d if out is None else out.unionByName(d)
        return out

    # Replica DECORRELATION for similarity-bearing columns: a verbatim
    # copy of every document/embedding would make each row ~COPIES-way
    # near-duplicate of its clones, so pair counts grow ~COPIES² — a
    # quadratic DATA explosion that would read as operator superlinearity.
    # Instead each replica keeps its INTERNAL similarity structure and is
    # decorrelated from the others: documents get a per-replica token
    # suffix (disjoint shingle spaces → per-replica pair structure
    # mirrors the original exactly), embeddings get a per-replica
    # circular shift (norms and within-replica cosines preserved bit-for
    # -bit; across replicas shifted random vectors decorrelate).
    def tweak_doc(d, i):
        if i == 0:
            return d
        return d.withColumn(
            "text", F.array_join(F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit(f"_r{i}"))), " "))

    def tweak_emb(d, i):
        if i == 0:
            return d
        dim = 64
        v = F.col("embedding")
        return d.withColumn(
            "embedding",
            F.concat(F.slice(v, i + 1, dim - i), F.slice(v, 1, i)))

    rep(part, {"p_partkey": "p"}).repartition(8) \
        .write.mode("overwrite").parquet(os.path.join(DST, "part.parquet"))
    rep(li, {"l_partkey": "p", "l_suppkey": "s", "l_orderkey": "o"}) \
        .repartition(32).write.mode("overwrite") \
        .parquet(os.path.join(DST, "lineitem.parquet"))
    rep(orders, {"o_orderkey": "o", "o_custkey": "c"}).repartition(16) \
        .write.mode("overwrite").parquet(os.path.join(DST, "orders.parquet"))
    rep(events, {"event_id": "e", "user_id": "u"}).repartition(16) \
        .write.mode("overwrite").parquet(os.path.join(DST, "events.parquet"))
    rep(docs, {"doc_id": "d"}, tweak=tweak_doc).repartition(16) \
        .write.mode("overwrite").parquet(os.path.join(DST, "documents.parquet"))
    rep(emb, {"vec_id": "v"}, tweak=tweak_emb).repartition(8) \
        .write.mode("overwrite").parquet(os.path.join(DST, "embeddings.parquet"))
    with open(marker, "w") as fh:
        fh.write(f"src={SRC} copies={COPIES}\n")
    return DST


def _time(spark: SparkSession, fn, sf_dir: str, n: int = 2) -> float:
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
    return round(best, 3)


def main() -> int:
    out_path = None
    argv = sys.argv[1:]
    if argv and argv[0] == "--out" and len(argv) > 1:
        out_path = argv[1]
    spark = get_spark("scale-probe")
    sf1 = ensure_sf1(spark)
    qs = entrymod.queries()
    # warm both lakes' footers AND each query's codegen/fixtures once,
    # untimed — otherwise the first-measured scale eats all the JIT
    # warm-up and the ratio reads <1× (observed: 0.58× on a 10× input)
    for d in (SRC, sf1):
        for t in ("part", "lineitem", "orders", "events", "documents",
                  "embeddings"):
            spark.read.parquet(os.path.join(d, f"{t}.parquet")).count()
        for name in CHAIN:
            qs[name](spark, d).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    result: dict[str, dict[str, float]] = {}
    worst = 0.0
    for name in CHAIN:
        t_small = _time(spark, qs[name], SRC)
        t_big = _time(spark, qs[name], sf1)
        ratio = round(t_big / max(t_small, 1e-9), 2)
        worst = max(worst, ratio)
        result[name] = {"sf0.1": t_small, "sf1": t_big, "ratio": ratio}
        print(f"# {name}: {t_small:.2f}s -> {t_big:.2f}s ({ratio:.1f}x)",
              file=sys.stderr)
    line = json.dumps({
        "metric": "sf1_scale_probe", "unit": "sec",
        "copies": COPIES, "queries": result,
        "worst_ratio": worst, "blowup_gate": BLOWUP,
        "superlinear": sorted(n for n, r in result.items()
                              if r["ratio"] > BLOWUP),
    })
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    spark.stop()
    return 1 if worst > BLOWUP else 0


if __name__ == "__main__":
    raise SystemExit(main())
