"""Distributed k-means trainer + IVF integration."""

from __future__ import annotations

from pyspark.sql import functions as F

from inputosm_spark.operators import similarity
from inputosm_spark.sources.registry import load_table


def test_kmeans_shapes_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    c1 = similarity.kmeans_centroids(emb, k=6, iters=2)
    rows = c1.collect()
    assert len(rows) == 6  # empty clusters keep their previous centroid
    dim = emb.select(F.size("embedding")).first()[0]
    assert all(len(r.embedding) == dim for r in rows)
    # deterministic: same input partitioning -> same centroids
    c2 = {r.cid: r.embedding for r in
          similarity.kmeans_centroids(emb, k=6, iters=2).collect()}
    assert {r.cid: r.embedding for r in rows} == c2


def test_kmeans_improves_or_holds_assignment_quality(spark, sf_dir):
    """Mean best-cosine to the centroid set must not degrade vs the
    naive first-N init (Lloyd monotonicity, allowing rounding slack)."""
    emb = load_table(spark, sf_dir, "embeddings")
    naive = emb.filter(F.col("vec_id") < 6)

    def mean_best_cos(cent):
        a = similarity.ivf_assign(emb, cent, round_scale=6)
        joined = (
            emb.select(F.col("vec_id"), "embedding")
            .join(a, "vec_id")
            .join(
                cent.select(F.col("vec_id").alias("cid"),
                            F.col("embedding").alias("cemb")),
                "cid",
            )
        )
        from inputosm_spark.operators.similarity import dot_fp, fp_vec

        pairs = joined.select(
            fp_vec(F.col("embedding")).alias("a"), fp_vec(F.col("cemb")).alias("b")
        )
        cos = dot_fp("a", "b").cast("double") / (
            F.sqrt(dot_fp("a", "a").cast("double"))
            * F.sqrt(dot_fp("b", "b").cast("double"))
        )
        return pairs.agg(F.avg(cos)).first()[0]

    trained = similarity.kmeans_centroids(emb, k=6, iters=2).select(
        F.col("cid").alias("vec_id"), "embedding"
    )
    assert mean_best_cos(trained) >= mean_best_cos(naive) - 1e-6


def test_kmeans_keeps_k_on_empty_clusters(spark):
    """Degenerate corpus (two tight blobs, k=4): clusters that capture
    zero vectors must keep their previous centroid, not vanish."""
    rows = [(i, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = similarity.kmeans_centroids(emb, k=4, iters=2)
    got = cent.collect()
    assert len(got) == 4
    assert sorted(r.cid for r in got) == [0, 1, 2, 3]


def test_ivf_with_trained_centroids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.kmeans_centroids(emb, k=6, iters=2).select(
        F.col("cid").alias("vec_id"), "embedding"
    )
    out = similarity.ivf_topk(emb.filter(F.col("vec_id") < 10), emb, k=3,
                              n_probe=2, centroids=cents)
    assert out.count() == 30
    assert out.groupBy("qid").count().filter("count != 3").isEmpty()
