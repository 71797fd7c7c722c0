"""Deterministic sampling operators for training-data pipelines.

Train/val/test splits and per-stratum downsampling are the last mile
of every corpus pipeline. Both are expressed as pure modular integer
arithmetic on the row KEY — no RNG, no xxhash — so (a) assignments are
stable across runs/engines (the repo's engine-neutral determinism
rule: an oracle must replay them), (b) membership is a FUNCTION of the
key: re-running on a grown corpus never reshuffles old rows across
splits (the property `rand(seed)` does NOT have — Spark's rand is
partition-layout dependent), and (c) the predicate pushes down to the
scan: sampling at 100 TB is a filter, not a shuffle.

The hash is a double-mod affine scramble: pmod(pmod(key, P1) * A + B,
P2). P1 bounds the product (Java longs wrap silently on overflow while
SQL engines raise — keeping every intermediate < 2^53 sidesteps both),
A/B decorrelate the bucket from key order so range-correlated inputs
(auto-increment ids) still split uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P1 = 1_000_003
_A = 40_503
_B = 1_013
_P2 = 9_973


def hash_bucket(key, n: int = 100) -> F.Column:
    """Deterministic bucket in [0, n) from an integer key column."""
    key = F.col(key) if isinstance(key, str) else key
    scram = F.pmod(F.pmod(key.cast("long"), F.lit(_P1)) * F.lit(_A) + F.lit(_B),
                   F.lit(_P2))
    return F.pmod(scram, F.lit(n)).cast("int")


def hash_bucket_sql(key: str, n: int = 100) -> str:
    """The DuckDB/ANSI twin of hash_bucket (oracle fragment).

    Spark's F.pmod is non-negative; ANSI % follows the dividend's sign,
    so the first mod is wrapped pmod-style ((k % P + P) % P). After that
    every intermediate is non-negative and plain % matches pmod.
    """
    nn = f"((({key}) % {_P1} + {_P1}) % {_P1})"
    return f"CAST((({nn} * {_A} + {_B}) % {_P2}) % {n} AS INT)"


def train_val_test_split(
    df: DataFrame, key_col: str, train: int = 80, val: int = 10
) -> DataFrame:
    """Adds a `split` column: 'train' | 'val' | 'test' with the given
    percentage cut points (test gets the remainder). Key-functional:
    a document keeps its split forever, across reruns and corpus
    growth — the non-negotiable property for training-data hygiene
    (a val document leaking into train on a re-shard is contamination).
    """
    b = hash_bucket(key_col, 100)
    split = (
        F.when(b < train, "train")
        .when(b < train + val, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame, stratum_col: str, rates: dict[str, int], key_col: str
) -> DataFrame:
    """Keep pct[stratum] percent of each stratum, deterministically:
    row kept iff hash_bucket(key) < rates[stratum]. Unknown strata are
    dropped (rate 0). This is the corpus-mixing primitive (e.g. keep
    100% of high-quality docs, 10% of boilerplate): a scan-time FILTER,
    no shuffle, no sort, no sampling pass."""
    b = hash_bucket(key_col, 100)
    expr = None
    for name, pct in sorted(rates.items()):
        branch = (F.col(stratum_col) == name, F.lit(pct))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    rate_col = expr.otherwise(F.lit(0))
    return df.filter(b < rate_col)
