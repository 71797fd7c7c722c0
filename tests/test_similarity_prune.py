"""Partial top-k selection inside the bucket GEMM kernels: output rows
drop from O(nq*nc) to O(nq*k) while the downstream Catalyst ranking
(and therefore every oracle hash) is provably unchanged — the kernel
keeps the margin superset of the rounded-rank survivors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from inputosm_spark.operators import similarity


def _bucket(n: int, d: int = 16, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    iv = (rng.uniform(-1, 1, size=(n, d)) * similarity.FP_SCALE).astype(
        np.int64
    )
    return pd.DataFrame(
        {
            "qid": np.arange(n, dtype=np.int64),
            "iv": list(iv),
            "ns": np.einsum("ij,ij->i", iv.astype(np.float64),
                            iv.astype(np.float64)).astype(np.int64),
        }
    )


def test_topk_prunes_kernel_output_and_keeps_survivors():
    q = _bucket(20, seed=1)
    c = _bucket(400, seed=2).rename(columns={"qid": "nid"})
    k = 3
    full = similarity._gemm_pairs(q, c)
    pruned = similarity._gemm_pairs(q, c, topk=k)
    assert len(full) == 20 * 400
    # the whole point: emitted rows collapse towards nq*(k+1)
    assert len(pruned) <= 20 * (k + 1) * 3  # generous tie allowance
    assert len(pruned) < len(full) / 10

    # pruned must be a SUPERSET of the exact top-k by the final order
    def topk_set(pairs: pd.DataFrame) -> set:
        cos = pairs["dot"] / np.sqrt(
            pairs["qns"].astype(float) * pairs["cns"].astype(float)
        )
        dfx = pairs.assign(cos=np.round(cos, 4))
        dfx = dfx.sort_values(["qid", "cos", "nid"],
                              ascending=[True, False, True])
        return set(
            map(tuple, dfx.groupby("qid").head(k)[["qid", "nid"]].values)
        )

    assert topk_set(full) <= set(map(tuple, pruned[["qid", "nid"]].values))


def test_min_cos_prunes_and_keeps_threshold_survivors():
    b = _bucket(200, seed=3)
    c = b.rename(columns={"qid": "nid"})
    thr = 0.2
    full = similarity._gemm_pairs(b, c, upper_only=True)
    pruned = similarity._gemm_pairs(b, c, upper_only=True, min_cos=thr)
    assert len(pruned) < len(full)

    def survivors(pairs: pd.DataFrame) -> set:
        cos = np.round(
            pairs["dot"]
            / np.sqrt(pairs["qns"].astype(float) * pairs["cns"].astype(float)),
            4,
        )
        keep = pairs[cos >= thr]
        return set(map(tuple, keep[["qid", "nid"]].values))

    assert survivors(full) == survivors(pruned)


def test_spark_results_identical_with_and_without_pruning(spark):
    """End-to-end: ann_lsh_topk (kernel-pruned) equals the unpruned
    ranking of the full pair table."""
    import pandas as _pd

    rng = np.random.default_rng(11)
    n, d = 300, 8
    emb = rng.uniform(-1, 1, size=(n, d)).astype(float)
    df = spark.createDataFrame(
        _pd.DataFrame({"vec_id": np.arange(n), "embedding": list(emb)})
    )
    queries = df.filter("vec_id < 30")
    got = similarity.ann_lsh_topk(queries, df, k=4, n_planes=4)

    sig = similarity._make_sig_udf(4)
    q = similarity._prep(queries, "qid").withColumn("lsh_sig", sig("iv"))
    c = similarity._prep(df, "nid").withColumn("lsh_sig", sig("iv"))
    unpruned = similarity._rank_topk(
        similarity._bucket_pair_dots(q, c, "lsh_sig"), 4, 4
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, unpruned.collect()))
    assert a == b and len(a) > 0


def test_zero_norm_vectors_survive_topk_pruning():
    """Non-finite cosines must not be silently dropped under topk —
    downstream decides, exactly as in the unpruned plan."""
    q = _bucket(4, seed=5)
    c = _bucket(10, seed=6).rename(columns={"qid": "nid"})
    ivs = list(c["iv"])
    ivs[0] = np.zeros(16, dtype=np.int64)
    c["iv"] = ivs
    c.loc[0, "ns"] = 0
    pruned = similarity._gemm_pairs(q, c, topk=2)
    assert (pruned["cns"] == 0).sum() == 4  # kept for every query


def test_zero_norm_vectors_raise_loudly(spark):
    """Engine-wide zero-norm contract: a zero-norm vector reaching the
    Catalyst cosine division RAISES under ANSI — the kernels keep
    non-finite candidate rows precisely so the error SURFACES instead
    of pairs silently vanishing (round-3 ADVICE made pruning keep
    them; this pins what 'downstream decides' actually means)."""
    import pytest
    from pyspark.sql import functions as F

    from inputosm_spark.operators import similarity

    rows = [(i, [float(i + 1), 2.0, 1.0]) for i in range(8)]
    # TWO zero-norm vectors: they share the all-zero LSH signature, so
    # a NaN-cosine candidate PAIR actually forms inside one bucket
    rows += [(8, [0.0, 0.0, 0.0]), (9, [0.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        similarity.cosine_topk(emb.filter(F.col("vec_id") < 2), emb, k=3).collect()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        similarity.near_dup_pairs(emb, threshold=0.5).collect()


def test_finite_candidates_survive_with_many_zero_norm_candidates():
    """r4 ADVICE: with >= topk+1 zero-norm candidates in one bucket,
    np.partition's kth landed on NaN and `cos >= NaN` pruned EVERY
    finite candidate before the loud ANSI failure could surface. The
    kth is now computed over finite cosines only, so the margin
    superset of finite survivors holds regardless of NaN count."""
    k = 2
    q = _bucket(4, seed=11)
    c = _bucket(12, seed=12).rename(columns={"qid": "nid"})
    ivs = list(c["iv"])
    for i in range(k + 2):  # more zero-norm candidates than topk+1
        ivs[i] = np.zeros(16, dtype=np.int64)
        c.loc[i, "ns"] = 0
    c["iv"] = ivs
    pruned = similarity._gemm_pairs(q, c, topk=k)
    finite = pruned[pruned["cns"] > 0]
    # every query keeps at least its k best finite candidates
    assert (finite.groupby("qid").size() >= k).all()
    # and the non-finite rows are still there for downstream to raise on
    assert (pruned["cns"] == 0).sum() == 4 * (k + 2)
