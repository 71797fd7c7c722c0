"""Misra-Gries candidate-pruned exact heavy hitters: the sketch's
superset guarantee must hold on adversarial layouts (hot term spread
thin across partitions), and the final counts are exact."""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from inputosm_spark.operators import textstats


def _docs(spark, words_per_doc, n_parts):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(words_per_doc)]
    return spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(n_parts)


def test_heavy_hitters_exact_on_adversarial_spread(spark):
    """One hot term contributes 2 occurrences to every doc (spread
    across every partition — the case where a PER-PARTITION-threshold
    shortcut would miss it); filler terms are all distinct."""
    n_docs = 400
    docs = [["hot", "hot", f"filler{i}a", f"filler{i}b", f"filler{i}c"]
            for i in range(n_docs)]
    df = _docs(spark, docs, n_parts=16)
    got = {r.term: r.cnt for r in
           textstats.heavy_hitters(df, m=64).collect()}
    # truth: N = 5*400 = 2000; hot = 800 > 2000/64; fillers = 1 each
    assert got == {"hot": 2 * n_docs}


def test_heavy_hitters_matches_bruteforce(spark):
    """Random-ish zipf mix: result == brute-force groupBy + threshold."""
    import numpy as np

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    docs = [
        [vocab[int(rng.zipf(1.3)) % len(vocab)] for _ in range(30)]
        for _ in range(300)
    ]
    df = _docs(spark, docs, n_parts=8)
    m = 32
    got = {r.term: r.cnt for r in
           textstats.heavy_hitters(df, m=m).collect()}
    flat = Counter(w for d in docs for w in d)
    n = sum(flat.values())
    want = {t: c for t, c in flat.items() if c * m > n}
    assert got == want and len(want) > 0


def test_heavy_hitters_empty_and_no_hitters(spark):
    # uniform: no term exceeds N/m when m < vocab size -> empty result
    docs = [[f"u{i}"] for i in range(500)]
    df = _docs(spark, docs, n_parts=4)
    assert textstats.heavy_hitters(df, m=8).count() == 0


def test_presummaries_bound_driver_traffic(spark):
    """The Spark-side pre-reduce must bound the collectable summary to
    the candidate UNION (+1 sentinel), independent of partition count —
    without it, driver traffic is m x n_partitions (round-3 verdict
    watch-item)."""
    n_docs, n_parts, m = 256, 32, 16
    # every doc repeats the same 8 hot terms + adds 2 unique fillers
    docs = [
        [f"hot{j}" for j in range(8)] + [f"f{i}a", f"f{i}b"]
        for i in range(n_docs)
    ]
    df = _docs(spark, docs, n_parts=n_parts)
    toks = df.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term")
    )
    reduced = textstats.mg_reduced_summaries(toks, m).collect()
    n_distinct = 8 + 2 * n_docs
    assert len(reduced) <= n_distinct + 1
    # far below the un-reduced m x n_parts worst case is not guaranteed
    # (filler terms may survive their partition's truncation), but the
    # sentinel rows MUST have collapsed to exactly one
    assert sum(1 for r in reduced if r.term is None) == 1
    assert next(r.n for r in reduced if r.term is None) == 10 * n_docs
    # and the end result stays exact
    got = {r.term: r.cnt for r in textstats.heavy_hitters(df, m=m).collect()}
    assert got == {f"hot{j}": n_docs for j in range(8)}
