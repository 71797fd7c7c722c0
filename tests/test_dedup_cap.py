"""LSH bucket-size cap: degenerate buckets must not emit O(b^2) pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from inputosm_spark.operators import dedup


def _sigs(spark):
    # 3 organic near-dup docs + 40 empty docs sharing one signature
    rows = [(i, f"alpha beta gamma delta {i % 2}") for i in range(3)]
    rows += [(100 + i, "") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    return dedup.minhash_signatures(dedup.word_shingles(docs, n=3), n_hashes=4)


def test_bucket_cap_bounds_pair_count(spark):
    sigs = _sigs(spark)
    uncapped = dedup.lsh_candidate_pairs(sigs, n_bands=2, rows_per_band=2)
    capped = dedup.lsh_candidate_pairs(
        sigs, n_bands=2, rows_per_band=2, max_bucket=10
    )
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un >= 40 * 39 // 2  # degenerate bucket exploded
    assert n_cap < 10 * 9 // 2 + 3  # bounded: no bucket beyond the cap
    # no degenerate doc survives into the capped candidate set
    assert capped.filter(F.col("doc_a").cast("long") >= 100).count() == 0
