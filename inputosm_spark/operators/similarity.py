"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline; random-hyperplane
LSH bucketing as the scale path (candidates only within matching
buckets). Dot products run JVM-side via zip_with/aggregate — no
Python; the LSH hyperplanes are deterministic (derived from xxhash64
of the dimension index), so results are reproducible and the bucket
assignment is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(a) -> F.Column:
    # float32 arithmetic differs across engines; promote once, up front
    return F.transform(a, lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    qid_col: str = "vec_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 4,
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (small) query set,
    scan the corpus once, window top-k per query.

    Cosine is rounded to `round_scale` decimals *before* ranking and
    ties broken by corpus id, making the ranking a total order that is
    engine-independent (floats only differ across engines below the
    rounding scale).
    """
    q = queries.select(
        F.col(qid_col).alias("qid"),
        _as_double(F.col(vec_col)).alias("qvec"),
        _norm(_as_double(F.col(vec_col))).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("nid"),
        _as_double(F.col(vec_col)).alias("cvec"),
        _norm(_as_double(F.col(vec_col))).alias("cnorm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(
                _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")),
                round_scale,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("nid").alias("neighbor_id"), "cos", "rank")
    )


def hyperplane_signature(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature (SimHash for embeddings).

    Plane p's normal has ±1 component on dimension d with sign from a
    deterministic modular hash ((p*2654435761 + d*40503) % 97) % 2 —
    plain integer math, so the bucketing replays identically in any
    SQL engine (the oracle). Signature bit p = [sum_d w_pd * v_d > 0].
    """
    sig = F.lit(0).cast("long")
    vec = _as_double(F.col(vec_col))
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.size(vec_col) - 1),
                    lambda d: F.when(
                        F.pmod(
                            F.pmod(d * F.lit(40503) + F.lit(p * 2654435761), F.lit(97)),
                            F.lit(2),
                        )
                        == 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)),
                ),
                lambda v, w: v * w,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(0)
    return df.select(F.col(id_col).alias("vec_id"), sig.alias("lsh_sig"))


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_planes: int = 8,
    round_scale: int = 4,
) -> DataFrame:
    """Approximate NN: exact cosine ranking restricted to the LSH
    bucket (equi-join on signature). At 100 TB this replaces the
    brute-force crossJoin with a shuffle join on a 64-bit key; recall
    is tuned via n_planes (fewer planes -> bigger buckets).
    """
    qs = hyperplane_signature(queries, n_planes).withColumnRenamed("vec_id", "qid")
    cs = hyperplane_signature(corpus, n_planes).withColumnRenamed("vec_id", "nid")
    q = queries.select(
        F.col("vec_id").alias("qid"), _as_double(F.col("embedding")).alias("qvec"),
        _norm(_as_double(F.col("embedding"))).alias("qnorm"),
    ).join(qs, "qid")
    c = corpus.select(
        F.col("vec_id").alias("nid"), _as_double(F.col("embedding")).alias("cvec"),
        _norm(_as_double(F.col("embedding"))).alias("cnorm"),
    ).join(cs, "nid")
    scored = (
        q.join(c, "lsh_sig")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(
                _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")),
                round_scale,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("nid").alias("neighbor_id"), "cos", "rank")
    )


def near_dup_pairs(
    corpus: DataFrame,
    n_planes: int = 8,
    threshold: float = 0.15,
    round_scale: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (vec_a < vec_b): candidate
    pairs from equal LSH hyperplane signatures, verified by exact
    cosine >= threshold. The self-join runs on the 64-bit signature key
    (shuffle equi-join), never on the raw vectors.
    """
    sigs = hyperplane_signature(corpus, n_planes)
    vecs = corpus.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("vec"),
        _norm(_as_double(F.col("embedding"))).alias("nrm"),
    ).join(sigs, "vec_id")
    a = vecs.select(
        F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), "lsh_sig",
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), "lsh_sig",
    )
    pairs = a.join(b, "lsh_sig").filter(F.col("vec_a") < F.col("vec_b"))
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                  round_scale)
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def ivf_assign(corpus: DataFrame, centroids: DataFrame, round_scale: int = 4) -> DataFrame:
    """(vec_id, cid): each vector's nearest centroid by cosine
    (broadcast centroids — the coarse quantizer is always tiny relative
    to the corpus). Ties break on centroid id for determinism."""
    c = F.broadcast(
        centroids.select(
            F.col("vec_id").alias("cid"),
            _as_double(F.col("embedding")).alias("cvec"),
            _norm(_as_double(F.col("embedding"))).alias("cnrm"),
        )
    )
    v = corpus.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("vec"),
        _norm(_as_double(F.col("embedding"))).alias("nrm"),
    )
    scored = v.crossJoin(c).select(
        "vec_id", "cid",
        F.round(_dot(F.col("vec"), F.col("cvec")) / (F.col("nrm") * F.col("cnrm")),
                round_scale).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 8,
    n_probe: int = 2,
    round_scale: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate NN: coarse-quantize the corpus into centroid
    buckets, probe each query's n_probe nearest buckets, rank exactly
    inside them. The 10^12-scale shape: the corpus is range-partitioned
    by cid (one shuffle at build time, amortized over all queries) and
    a query touches n_probe/n_centroids of it instead of everything.

    Centroids here are the deterministic first-N corpus vectors (a
    reproducible stand-in for an offline k-means "training" step — at
    real scale the centroid table is produced by a separate job and
    this function is unchanged).
    """
    if centroids is None:
        centroids = corpus.filter(F.col("vec_id") < n_centroids)
    assign = ivf_assign(corpus, centroids, round_scale)

    # query-side probes: top n_probe centroid buckets
    qprobe = ivf_assign(queries, centroids, round_scale)  # rank-1 only
    c = F.broadcast(
        centroids.select(
            F.col("vec_id").alias("cid"),
            _as_double(F.col("embedding")).alias("cvec"),
            _norm(_as_double(F.col("embedding"))).alias("cnrm"),
        )
    )
    q = queries.select(
        F.col("vec_id").alias("qid"),
        _as_double(F.col("embedding")).alias("qvec"),
        _norm(_as_double(F.col("embedding"))).alias("qnrm"),
    )
    probes = (
        q.select("qid", "qvec", "qnrm")
        .crossJoin(c)
        .select(
            "qid", "cid",
            F.round(_dot(F.col("qvec"), F.col("cvec"))
                    / (F.col("qnrm") * F.col("cnrm")), round_scale).alias("pcos"),
        )
    )
    wp = Window.partitionBy("qid").orderBy(F.desc("pcos"), F.asc("cid"))
    probes = (
        probes.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= n_probe)
        .select("qid", "cid")
    )

    cvecs = corpus.select(
        F.col("vec_id").alias("nid"),
        _as_double(F.col("embedding")).alias("nvec"),
        _norm(_as_double(F.col("embedding"))).alias("nnrm"),
    ).join(assign.withColumnRenamed("vec_id", "nid"), "nid")

    cand = probes.join(cvecs, "cid").join(q, "qid").filter(
        F.col("qid") != F.col("nid")
    )
    scored = cand.select(
        "qid", "nid",
        F.round(_dot(F.col("qvec"), F.col("nvec"))
                / (F.col("qnrm") * F.col("nnrm")), round_scale).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("nid").alias("neighbor_id"), "cos", "rank")
    )


def kmeans_centroids(
    corpus: DataFrame, k: int = 8, iters: int = 3, round_scale: int = 4
) -> DataFrame:
    """Distributed Lloyd k-means over the embedding column — the real
    "training" job behind ivf_topk's coarse quantizer.

    Deterministic end to end: init = the k lowest vec_ids, assignment
    ties break on centroid id, and a fixed iteration count (no
    convergence RNG). Each iteration is one broadcast-join assignment
    pass + one posexplode/groupBy mean — the canonical Spark k-means
    shape (centroid table always tiny, corpus never replicated).
    Iterations are localCheckpoint-severed so the plan stays shallow.
    """
    cent = corpus.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"),
        _as_double(F.col("embedding")).alias("cvec"),
    )
    dims = corpus.select(F.size("embedding").alias("d")).first().d
    for _ in range(iters):
        assign = ivf_assign(
            corpus,
            cent.select(F.col("cid").alias("vec_id"),
                        F.col("cvec").alias("embedding")),
            round_scale,
        )
        per_dim = (
            corpus.join(assign, "vec_id")
            .select("cid", F.posexplode(_as_double(F.col("embedding")))
                    .alias("dim", "v"))
            .groupBy("cid", "dim")
            .agg(F.avg("v").alias("m"))
        )
        cent = (
            per_dim.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s.m,
                ).alias("cvec")
            )
            .localCheckpoint(eager=True)
        )
        assert dims  # documented: all embeddings share one dimension
    return cent.select("cid", F.col("cvec").alias("embedding"))
