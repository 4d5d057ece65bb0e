from __future__ import annotations

import math

from pyspark.sql import functions as F

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import similarity

from .conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_cosine_expr_matches_math(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])],
                               "a array<float>, b array<float>")
    got = df.select(similarity.cosine_expr("a", "b").alias("c")).collect()[0]["c"]
    expect = 32.0 / (math.sqrt(14) * math.sqrt(77))
    assert abs(got - expect) < 1e-12


def test_bruteforce_topk_shape_and_order(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.cosine_topk(emb, q, k=5).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != r["query_id"] for r in rows)


def _clustered_embeddings(spark, n_clusters=10, per_cluster=50, dim=64, seed=3):
    """Embeddings with real neighborhood structure — the regime LSH is for.
    (The driver's synthetic embeddings are near-uniform random: there, ANY
    sublinear method's recall ≈ fraction of corpus scanned, by geometry.)"""
    import numpy as np
    rs = np.random.RandomState(seed)
    centers = rs.randn(n_clusters, dim) * 5
    rows = []
    for c in range(n_clusters):
        for i in range(per_cluster):
            v = centers[c] + rs.randn(dim) * 0.1
            rows.append((c * per_cluster + i, [float(x) for x in v], c))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_lsh_recall_on_clustered_data(spark):
    """On clustered data LSH must recover nearly all true neighbours while
    scanning a fraction of the corpus — the documented recall self-test
    (SURVEY.md §7 risk 5)."""
    emb = _clustered_embeddings(spark)
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in similarity.cosine_topk(emb, q, k=10).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in similarity.cosine_topk_lsh(
                  emb, q, k=10, dim=64, n_planes=8, multi_probe_hamming=1).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f}"


def test_lsh_on_uniform_data_returns_valid_exact_scores(spark):
    """On the driver's (near-uniform) embeddings: candidates are a subset,
    re-ranked with EXACT cosine — every returned score must equal the
    brute-force score for that pair."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in similarity.cosine_topk(emb, q, k=500).collect()}
    for r in similarity.cosine_topk_lsh(emb, q, k=10, dim=64, n_planes=6).collect():
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_lsh_bucket_determinism(spark):
    emb = _emb(spark).limit(50)
    b1 = similarity.with_lsh_bucket(emb, "embedding", dim=64, n_planes=8, seed=7)
    b2 = similarity.with_lsh_bucket(emb, "embedding", dim=64, n_planes=8, seed=7)
    assert {(r["vec_id"], r["_bucket"]) for r in b1.collect()} == \
           {(r["vec_id"], r["_bucket"]) for r in b2.collect()}


def test_ivf_recall_on_clustered_data(spark):
    """IVF with a learned codebook: probing 2 of 10 cells on well-clustered
    data must recover ~all true neighbours (neighbours share the query's
    cell by construction)."""
    emb = _clustered_embeddings(spark)
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    cents = similarity.train_ivf_centroids(emb, n_centroids=10, seed=5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in similarity.cosine_topk(emb, q, k=10).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in similarity.cosine_topk_ivf(
                  emb, q, k=10, centroids=cents, nprobe=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f}"


def test_ivf_scores_are_exact(spark):
    """IVF candidates re-rank with exact cosine — returned scores must equal
    brute-force scores for the same pair."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    cents = similarity.train_ivf_centroids(emb, n_centroids=8, seed=5)
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in similarity.cosine_topk(emb, q, k=500).collect()}
    out = similarity.cosine_topk_ivf(emb, q, k=10, centroids=cents, nprobe=2).collect()
    assert len(out) == 30
    for r in out:
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_sq8_recall_and_exact_scores(spark):
    """SQ8 prefilter + exact re-rank: high recall vs brute force, and the
    surviving rows carry EXACT cosines (bit-identical to the brute-force
    scores — the re-rank reads the original floats)."""
    emb = _clustered_embeddings(spark)
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact_rows = similarity.cosine_topk(emb, q, k=10).collect()
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact_rows}
    sq8_rows = similarity.cosine_topk_sq8(emb, q, k=10, overfetch=4).collect()
    sq8 = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in sq8_rows}
    recall = len(exact.keys() & sq8.keys()) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f}"
    for pair in exact.keys() & sq8.keys():
        assert exact[pair] == sq8[pair], pair   # re-rank is exact, not approx


def test_pq_recall_and_exact_scores(spark):
    """PQ/ADC prefilter + exact re-rank: good recall vs brute force on
    clustered data, and the surviving rows carry EXACT cosines (the
    re-rank reads the original floats, like SQ8/IVF)."""
    emb = _clustered_embeddings(spark)
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    books = similarity.train_pq_codebooks(emb, m=8, ksub=16, seed=3)
    assert books.shape == (8, 16, 8)
    exact_rows = similarity.cosine_topk(emb, q, k=10).collect()
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in exact_rows}
    pq_rows = similarity.cosine_topk_pq(emb, q, k=10, books=books,
                                        overfetch=4).collect()
    pq = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in pq_rows}
    recall = len(exact.keys() & pq.keys()) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f}"
    for pair in exact.keys() & pq.keys():
        assert exact[pair] == pq[pair], pair


def test_pq_encode_shape_and_determinism(spark):
    emb = _emb(spark).limit(40)
    books = similarity.train_pq_codebooks(emb, m=8, ksub=8, seed=11,
                                          sample_rows=40)
    c1 = similarity.pq_encode(emb, books).select("vec_id", "pq_codes")
    c2 = similarity.pq_encode(emb, books).select("vec_id", "pq_codes")
    rows1 = {r["vec_id"]: tuple(r["pq_codes"]) for r in c1.collect()}
    rows2 = {r["vec_id"]: tuple(r["pq_codes"]) for r in c2.collect()}
    assert rows1 == rows2
    assert all(len(v) == 8 and all(0 <= x < 8 for x in v)
               for v in rows1.values())


def test_pool_embeddings_matches_numpy(spark):
    import numpy as np
    emb = _emb(spark).limit(200)
    rows = emb.select("vec_id", "label", "embedding").collect()
    got = {r["label"]: (np.array(r["pooled"]), r["n_vecs"]) for r in
           similarity.pool_embeddings(emb, "label").collect()}
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            np.array(r["embedding"], dtype=np.float64))
    for lab, vecs in by_label.items():
        want = np.stack(vecs).mean(axis=0)
        have, n = got[lab]
        assert n == len(vecs)
        assert np.allclose(have, want, rtol=1e-9, atol=1e-12)


def test_pool_embeddings_weighted_and_normalized(spark):
    import pytest
    df = spark.createDataFrame(
        [(1, "g", [1.0, 0.0], 3.0), (2, "g", [0.0, 1.0], 1.0)],
        "vec_id long, label string, embedding array<double>, w double")
    out = similarity.pool_embeddings(df, "label", weight_col="w",
                                     normalize=True).collect()[0]
    v = out["pooled"]
    # weighted mean (0.75, 0.25), normalized
    import math
    nrm = math.sqrt(0.75 ** 2 + 0.25 ** 2)
    assert v[0] == pytest.approx(0.75 / nrm) and \
        v[1] == pytest.approx(0.25 / nrm)


def test_pool_embeddings_null_vectors_dont_inflate_counts(spark):
    df = spark.createDataFrame(
        [(1, "g", [2.0, 0.0]), (2, "g", None), (3, "h", None)],
        "vec_id long, label string, embedding array<double>")
    out = {r["label"]: r for r in
           similarity.pool_embeddings(df, "label").collect()}
    assert out["g"]["n_vecs"] == 1            # the NULL row didn't count
    assert out["g"]["pooled"] == [2.0, 0.0]
    assert "h" not in out                     # nothing poolable → absent


def test_jl_projection_matches_numpy(spark):
    import numpy as np
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import similarity as sim
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.orderBy("vec_id").limit(20).collect()
    got = {r["vec_id"]: np.array(r["proj"]) for r in
           sim.project_embeddings(emb.limit(20), dim=64, out_dim=16)
           .collect()}
    mat = sim._jl_matrix(64, 16, 42)
    for r in rows:
        want = np.array(r["embedding"], dtype=np.float64) @ mat
        assert np.allclose(got[r["vec_id"]], want, atol=1e-12)


def test_jl_preserves_dot_products_roughly(spark):
    """JL guarantee sanity: projected pairwise dots track true dots with
    bounded additive distortion for unit-ish vectors."""
    import numpy as np
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import similarity as sim
    rs = np.random.RandomState(0)
    v = rs.randn(30, 64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    mat = sim._jl_matrix(64, 16, 42)
    p = v @ mat
    true = v @ v.T
    approx = p @ p.T
    # additive error ~ O(1/sqrt(16)); allow a generous band
    assert np.abs(true - approx).max() < 0.9
    assert np.abs(true - approx).mean() < 0.2


def test_cosine_topk_jl_recall_on_planted_neighbors(spark):
    """JL candidate generation preserves GENUINE similarity structure:
    with planted near-duplicate groups (cosine ≈ 0.97 inside a group vs
    ≈ 0 across), project-then-rerank recovers the true neighbors. (On
    pure noise the projected ordering is meaningless by design — the JL
    additive error ~1/√out_dim dominates a 1/√dim cosine spread; that's
    a property of the data, not the operator.)"""
    import numpy as np
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import similarity as sim
    rs = np.random.RandomState(3)
    base = rs.randn(40, 64)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for g, b in enumerate(base):
        for j in range(4):                     # 4 members per group
            v = b + 0.04 * rs.randn(64)   # ‖noise‖≈0.32 ⇒ sibling cos≈0.95
            rows.append((g * 4 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") % 4 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    k = 3                                      # the 3 siblings
    exact = {(r["query_id"], r["neighbor_id"])
             for r in sim.cosine_topk(emb, queries, k=k).collect()}
    jl = {(r["query_id"], r["neighbor_id"])
          for r in sim.cosine_topk_jl(emb, queries, k=k, dim=64,
                                      out_dim=16,
                                      rerank_factor=4).collect()}
    assert len(jl & exact) / len(exact) >= 0.95


def test_assign_nearest_seed_matches_numpy_and_has_no_shuffle(spark):
    """round-4 E105: map-side nearest-seed assignment — numpy argmax
    parity, lowest-seed-id ties, and a plan with ZERO exchanges."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 6))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>")
    seeds = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("seed_id"), "embedding")
    out = similarity.assign_nearest_seed(emb, seeds)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # pure map-side
    got = {r["vec_id"]: (r["seed_id"], r["cosine"]) for r in out.collect()}
    s = vecs[:4]
    sims = (vecs @ s.T) / (np.linalg.norm(vecs, axis=1, keepdims=True)
                           * np.linalg.norm(s, axis=1))
    for i in range(40):
        j = int(np.argmax(sims[i]))        # numpy ties → first (lowest) id
        assert got[i][0] == j
        assert abs(got[i][1] - sims[i][j]) < 1e-9


# --------------------------------------------------------------------------
# round-7: oracle-exact expression twins (ann_recall_eval instruments)
# --------------------------------------------------------------------------

def test_lit_vec_double_roundtrip(spark):
    """The D-suffixed SQL literal _vec_sql builds must round-trip every
    double exactly (a plain decimal literal goes through DECIMAL and can
    land 1 ulp off — the reason _vec_sql exists)."""
    import numpy as np
    vals = list(np.random.RandomState(7).randn(64)) + [1e-05, -6.761059828902813e-05, 2.5e-300]
    got = spark.range(1).select(
        similarity._lit_vec(vals).alias("a")).collect()[0]["a"]
    assert all(g == float(v) for g, v in zip(got, vals))


def test_seq_dot_matches_engine_fold(spark):
    """_seq_dot / _seq_sq (driver-side folds) must be bit-identical to
    dot_expr's engine fold — the property every inlined LUT/norm relies
    on."""
    import numpy as np
    rs = np.random.RandomState(11)
    a = [float(x) for x in rs.randn(64)]
    b = [float(x) for x in rs.randn(64)]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(similarity.dot_expr("a", "b").alias("d"),
                    similarity.dot_expr("a", "a").alias("s")).collect()[0]
    assert got["d"] == similarity._seq_dot(a, b)
    assert got["s"] == similarity._seq_sq(a)


def test_lsh_bucket_expr_matches_numpy_udf(spark):
    """Twin ≡ numpy on the driver corpus: the expression buckets equal the
    production _bucket_udf buckets for the eval's planes (a sign flip
    would need |v·p| below one ulp of the summation-order difference)."""
    emb = _emb(spark)
    planes = similarity._hyperplanes(64, 6, 42)
    expr_b = {r["vec_id"]: r["b"] for r in emb.select(
        "vec_id", similarity.lsh_bucket_expr("embedding", planes).alias("b")
    ).collect()}
    udf_b = {r["vec_id"]: r["b"] for r in emb.select(
        "vec_id", similarity._bucket_udf(planes)(F.col("embedding")).alias("b")
    ).collect()}
    assert expr_b == udf_b


def test_project_expr_matches_numpy(spark):
    """Twin projection ≈ numpy matmul (values to float tolerance; exact
    equality is NOT promised — summation order differs, which is exactly
    why the twin exists)."""
    import numpy as np
    emb = _emb(spark)
    mat = similarity._jl_matrix(64, 16, 42)
    got = {r["vec_id"]: r["p"] for r in emb.select(
        "vec_id", similarity.project_expr("embedding", mat).alias("p")
    ).collect()}
    raw = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in emb.select("vec_id", "embedding").collect()}
    for vid, v in raw.items():
        assert np.allclose(np.asarray(got[vid]), v @ mat, atol=1e-9)


def test_pq_encode_expr_matches_numpy_encoder(spark):
    """Twin PQ codes ≡ pq_encode's numpy argmin on the driver corpus with
    the same codebook (expanded-form d² has the same minimizer; a
    disagreement would need a sub-ulp near-tie)."""
    emb = _emb(spark).orderBy("vec_id").limit(200)
    seeds = [ [float(x) for x in r["embedding"]]
              for r in emb.orderBy("vec_id").limit(16).collect() ]
    import numpy as np
    books = np.stack([np.stack([np.asarray(v[j*8:(j+1)*8]) for v in seeds])
                      for j in range(8)])
    codebook = [[v[j*8:(j+1)*8] for v in seeds] for j in range(8)]
    got = {r["vec_id"]: list(r["_code"]) for r in
           similarity.pq_encode_expr(emb.select("vec_id", "embedding"),
                                     "embedding", codebook, 8)
           .select("vec_id", "_code").collect()}
    want = {r["vec_id"]: list(r["pq_codes"]) for r in
            similarity.pq_encode(emb.select("vec_id", "embedding"), books)
            .select("vec_id", "pq_codes").collect()}
    assert got == want


def test_nearest_seeds_expr_orders_by_cosine(spark):
    """nprobe cells come out in descending-cosine order with lowest-id
    tie-break, and cell 1 equals assign_nearest_seed's choice."""
    emb = _emb(spark)
    seed_rows = emb.orderBy("vec_id").limit(16).collect()
    seeds = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in seed_rows]
    got = {r["vec_id"]: list(r["c"]) for r in emb.select(
        "vec_id",
        similarity.nearest_seeds_expr("embedding", seeds, 2).alias("c")
    ).collect()}
    seeds_df = spark.createDataFrame(
        [(sid, v) for sid, v in seeds], "seed_id long, embedding array<double>")
    want = {r["vec_id"]: r["seed_id"] for r in similarity.assign_nearest_seed(
        emb, seeds_df, id_col="vec_id").collect()}
    for vid, cells in got.items():
        assert len(cells) == 2 and cells[0] != cells[1]
        assert cells[0] == want[vid]


def test_ann_recall_eval_report_shape(spark):
    from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark import queries_extensions as qx
    rows = {r["method"]: r for r in
            qx.ann_recall_eval(spark, SF_SMOKE).collect()}
    assert set(rows) == {"lsh", "ivf", "pq", "jl", "sq8"}
    for r in rows.values():
        assert r["n_exact"] > 0
        assert 0 <= r["n_common"] <= min(r["n_approx"], r["n_exact"])
        assert 0.0 <= r["recall"] <= 1.0
        assert r["recall"] == r["n_common"] / r["n_exact"]
    # the exact-rerank-with-overfetch methods recover most of the top-k
    assert rows["sq8"]["recall"] >= 0.8
