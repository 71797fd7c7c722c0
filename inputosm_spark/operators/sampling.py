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

from pyspark.sql import DataFrame, Window
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


def domain_topk(
    df: DataFrame,
    group_col: str,
    order_by: list,
    k: int,
) -> DataFrame:
    """Per-group quota (domain cap): keep the top-k rows of each group
    under the caller's TOTAL order (corpus curation: "at most k
    documents per source/domain, best first" — the standard guard
    against one crawler domain flooding the mix).

    Skew shape: a naive `row_number().over(partitionBy(group))` drags
    every row of a hot domain through ONE reducer. This runs the
    two-phase top-k: a pre-prune window over (group, input-partition)
    — the hot group's rows stay spread across its input partitions —
    keeps each partition's local top-k, a guaranteed superset of the
    global top-k under a total order; the global window then ranks
    <= k * n_partitions rows per group instead of the whole group.
    Final ranks are identical to the single-window plan (every row
    preceding a surviving global top-k row survives pruning too), so
    the oracle replays the plain one-window formulation.

    `order_by` must be a TOTAL order (tie-broken) or ranks are
    nondeterministic — same contract as every ranking oracle here.
    """
    pruned = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lr",
            F.row_number().over(
                Window.partitionBy(group_col, "__pid").orderBy(*order_by)
            ),
        )
        .filter(F.col("__lr") <= k)
        .drop("__pid", "__lr")
    )
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        pruned.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def token_shards(
    documents: DataFrame,
    budget: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket: int = 1024,
) -> DataFrame:
    """Deterministic TOKEN-BUDGET SHARDING: documents in id order are
    cut into contiguous shards of ~`budget` tokens each — the
    deterministic precursor to training-sequence packing (every engine
    and every rerun produces the same shard for the same doc).

    shard(doc) = (cumulative tokens BEFORE doc, in id order) // budget.

    A naive global cumsum is a single-reducer window; this runs a
    RECURSIVE two-pass carry with NO partition-less window at any
    level:

    * level 1 — a window per (id // bucket) range computes the cumsum
      within each bucket of <= `bucket` docs;
    * level 2 — the one-row-per-bucket summary gets the same
      treatment: a window per SUPER-bucket (bucket // bucket) computes
      each bucket's carry-in from its super-bucket peers;
    * terminal — the super-bucket totals (n_docs / bucket^2 rows)
      resolve their own carry-in via a triangular broadcast join
      (sum of all strictly-earlier super totals), which Spark plans as
      a BroadcastNestedLoopJoin partitioned by the outer side — no
      global window, no single-reducer stage anywhere in the plan.

    Sizing: level-1/2 window partitions hold <= `bucket` rows and the
    terminal join is O((n_docs / bucket^2)^2) broadcast-pair work, so
    bucket ~ n_docs^(1/3) keeps every stage sublinear (10^12 docs at
    bucket=2^17: 131k-row windows, 58k summary partitions, ~58-row
    terminal join). The default 1024 covers ~10^9 docs with a <=1024-
    row terminal broadcast.
    """
    from pyspark.sql import Window

    toks = F.size(
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda w: F.length(w) > 0,
        )
    ).cast("long")
    base = documents.select(
        F.col(id_col),
        toks.alias("n_tokens"),
        F.floor(F.col(id_col) / bucket).cast("long").alias("__bck"),
    )
    win = (
        Window.partitionBy("__bck")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("__cum", F.sum("n_tokens").over(win))
    # bucket summary: one narrow row per id-range bucket, cached — it
    # feeds three branches (within-super window, super totals x2) and
    # recomputing it re-tokenizes the corpus per branch. The cache is
    # deliberately NOT unpersisted: the sharing happens at EXECUTION
    # time (the returned plan is lazy), so releasing it here would
    # re-tokenize per branch. Spark's CacheManager dedups by logical
    # plan, so repeated invocations reuse ONE entry per (input, args)
    # shape — a bounded, documented cost of cross-branch sharing
    # (r4 ADVICE), sized n_docs/bucket narrow rows, not the corpus.
    summary = (
        base.groupBy("__bck")
        .agg(F.sum("n_tokens").alias("__bsum"))
        .withColumn("__sb", F.floor(F.col("__bck") / bucket).cast("long"))
        .cache()
    )
    w2 = (
        Window.partitionBy("__sb")
        .orderBy("__bck")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within_super = summary.select(
        F.col("__bck").alias("__sbck"),
        "__sb",
        F.coalesce(F.sum("__bsum").over(w2), F.lit(0)).alias("__woff"),
    )
    super_tot = summary.groupBy("__sb").agg(F.sum("__bsum").alias("__stot"))
    # terminal carry: each super-bucket's offset = sum of all earlier
    # super totals — triangular join with the tiny totals broadcast
    soff = (
        super_tot.select(F.col("__sb").alias("__sba"))
        .join(
            F.broadcast(
                super_tot.select(F.col("__sb").alias("__sbb"), "__stot")
            ),
            F.col("__sbb") < F.col("__sba"),
            "left",
        )
        .groupBy("__sba")
        .agg(F.coalesce(F.sum("__stot"), F.lit(0)).alias("__soff"))
    )
    offsets = within_super.join(soff, F.col("__sb") == F.col("__sba")).select(
        "__sbck",
        (F.col("__soff") + F.col("__woff")).alias("__off"),
    )
    return (
        within.join(offsets, F.col("__bck") == F.col("__sbck"))
        .select(
            id_col,
            "n_tokens",
            F.floor(
                (F.col("__off") + F.col("__cum") - F.col("n_tokens"))
                / budget
            ).cast("long").alias("shard"),
        )
    )


def doc_chunks(
    documents: DataFrame,
    size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Overlapping fixed-size token CHUNKING (training-sequence /
    retrieval-window prep): document tokens split into windows of
    `size` tokens advancing by `size - overlap`, the last window
    clamped at the end. Pure Catalyst column math — split, an exploded
    integer sequence of chunk starts, slice, array_join; no shuffle
    beyond the source scan, no UDF — so a 100 TB corpus chunks as a
    map-only pass. chunk_id and boundaries are deterministic functions
    of the token count, replayed exactly by the DuckDB oracle's list
    slicing."""
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    stride = size - overlap
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    n = F.size(words)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("long"), F.lit(1)
    )
    return (
        documents.select("doc_id", words.alias("__w"), n_chunks.alias("__nc"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias(
                "chunk_id"
            ),
            F.col("__w"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.array_join(
                F.slice(
                    F.col("__w"),
                    (F.col("chunk_id") * stride + 1).cast("int"),
                    size,
                ),
                " ",
            ).alias("chunk_text"),
            F.least(
                F.size(F.col("__w")) - F.col("chunk_id") * stride,
                F.lit(size),
            )
            .cast("long")
            .alias("n_tokens"),
        )
    )


def priority_sample(
    df: DataFrame,
    weight_col,
    key_col: str,
    k: int,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Deterministic WEIGHTED top-k sample (Efraimidis-Spirakis-style
    priority sampling with the engine's integer-determinism contract):
    priority(row) = (weight * scale) // (hash_bucket(key, 9973) + 1),
    keep the k highest by (priority, key). Higher-weight rows win more
    of the hash lottery; membership is a FUNCTION of (key, weight) —
    stable across runs, engines and corpus growth, like every sampler
    here.

    Exactness bound: the division runs as a double, exact (floor ==
    the oracle's integer //) only while weight * scale < 2^53 — i.e.
    weight <= 9007 at the default scale. An in-plan assert_true
    enforces it (the engine's loud-failure pattern): an over-bound
    weight RAISES instead of letting sample membership silently
    diverge from the oracle near quotient boundaries. For heavier
    weights pass a smaller `scale` (resolution trades off against the
    weight range).

    Plan shape: a global top-k is TakeOrderedAndProject (no full sort,
    no window) — each partition keeps k rows, the driver merges
    k * n_partitions. For k too large for one driver merge, fall back
    to domain_topk's two-phase window with a constant group.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # compare against the precomputed bound WITHOUT multiplying: the
    # product itself overflows int64 under ANSI for weight > ~9.2e6 at
    # the default scale, which would replace this diagnostic with a
    # generic ARITHMETIC_OVERFLOW (r5 ADVICE); the guard also leads
    # the addition so it evaluates before the product does
    w_cap = ((1 << 53) - 1) // scale
    guard = F.assert_true(
        w.cast("long") <= F.lit(w_cap),
        F.lit(f"priority_sample: weight > {w_cap} overflows the exact "
              "double-division range at this scale; lower `scale`"),
    )
    pr = (
        F.coalesce(guard.cast("long"), F.lit(0))
        + w.cast("long") * F.lit(scale)
    ) / (hash_bucket(key_col, 9973).cast("long") + 1)
    out = df.withColumn("priority", F.floor(pr).cast("long"))
    return out.orderBy(F.desc("priority"), F.col(key_col)).limit(k)
