"""simhash_sharded: the monster-document path (r4 verdict directive
#6 / TODO #5). Capacity contract: `simhash` raises loudly past 32766
distinct tokens/doc; `simhash_sharded` must (a) be bit-identical to
`simhash` on in-cap docs, and (b) process a >32766-distinct-token doc
end-to-end with the signature the brute-force formula predicts."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from inputosm_spark.operators import dedup


def _brute_sig(tokens: list[str], bits: int) -> int:
    """Independent reference: per-bit +-1 majority over md5 hex-digit
    bits, bit 63 as the int64 sign bit (same formula as the DuckDB
    oracle, in plain Python)."""
    counts = [0] * bits
    for t in tokens:
        hx = hashlib.md5(t.encode()).hexdigest()
        for j in range(bits):
            counts[j] += (int(hx[j // 4], 16) >> (j % 4)) & 1
    n = len(tokens)
    sig = 0
    for j in range(bits):
        if counts[j] * 2 > n:
            sig += (1 << j) if j < 63 else -(1 << 63)
    return sig


def test_sharded_matches_plain_on_in_cap_docs(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )
    plain = {r.doc_id: r.simhash
             for r in dedup.simhash(docs, bits=64).collect()}
    sharded = {r.doc_id: r.simhash
               for r in dedup.simhash_sharded(docs, bits=64,
                                              n_shards=8).collect()}
    assert plain == sharded


def test_over_cap_doc_roundtrips_through_sharded_path(spark):
    n_tok = 40_000  # > 32766: overflows the single-level packed lanes
    toks = [f"tok{i}" for i in range(n_tok)]
    doc = spark.createDataFrame(
        [("big", " ".join(toks)), ("small", "tok1 tok2 tok3")],
        "doc_id string, text string",
    )
    out = {r.doc_id: r.simhash
           for r in dedup.simhash_sharded(doc, bits=64,
                                          n_shards=8).collect()}
    assert out["big"] == _brute_sig(toks, 64)
    assert out["small"] == _brute_sig(["tok1", "tok2", "tok3"], 64)


def test_plain_simhash_raises_loudly_over_cap(spark):
    doc = spark.createDataFrame(
        [("big", " ".join(f"tok{i}" for i in range(40_000)))],
        "doc_id string, text string",
    )
    with pytest.raises(Exception, match="simhash_sharded"):
        dedup.simhash(doc, bits=64).collect()


def test_sharded_shard_guard_raises_past_its_own_cap(spark):
    """With n_shards=1 the sharded path degenerates to the plain cap:
    its per-shard guard must fire on the same 40k-token doc."""
    doc = spark.createDataFrame(
        [("big", " ".join(f"tok{i}" for i in range(40_000)))],
        "doc_id string, text string",
    )
    with pytest.raises(Exception, match="lane capacity"):
        dedup.simhash_sharded(doc, bits=64, n_shards=1).collect()
