"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash + LSH banding, SimHash, and n-gram
Jaccard verification — all as declarative DataFrame plans over
built-in JVM functions (md5 / xxhash64 / explode / groupBy), so the
hot path is whole-stage-codegen'd; no Python in any of them.

Design notes for 100 TB: every variant reduces to (1) a narrow
per-row signature projection, (2) an equi-join / groupBy on the
signature — the classic shuffle-minimal shape. Candidate pairs are
generated per LSH band bucket (bounded by bucket size), then verified
with an exact Jaccard join only on candidates.

MinHash here uses the "min of a keyed cryptographic hash" form:
sig_i(doc) = min over shingles s of md5(i || s). md5 is available in
both Spark and DuckDB, which makes every stage oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col) -> F.Column:
    """Canonical text form for exact dedup: lowercase, collapse
    whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dups(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5 of normalized text.

    Returns (fingerprint, n_dups, doc_ids) for groups with >1 member.
    The groupBy(md5) is a single shuffle of (16-byte key, id) — the
    cheapest possible exact dedup at scale (never shuffles the text).
    """
    fp = documents.select(
        F.col("doc_id"), F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_dups"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def word_shingles(documents: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) rows: DISTINCT word n-grams of normalized text.

    Column-only: split -> transform(sequence) -> array_distinct ->
    explode. Distinctness is per-doc, so it is established MAP-SIDE by
    array_distinct on the gram array — (doc_id, shingle) rows are
    distinct iff grams are distinct within their doc — instead of a
    corpus-wide .distinct() shuffle on the exploded stream (at 100 TB
    that shuffle moved every shingle once before any consumer ran).
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        ),
    ).otherwise(F.array(F.array_join(words, " ")))
    from inputosm_spark.operators import ensure_parallelism

    documents = ensure_parallelism(documents)
    return documents.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def minhash_signatures(
    shingled: DataFrame, n_hashes: int = 8
) -> DataFrame:
    """(doc_id, sig_0..sig_{n-1}): MinHash signature columns.

    One shuffle (groupBy doc_id). One md5 digest is 128 bits = four
    independent 32-bit sub-hashes, so hash family member i is the
    8-hex-char slice i%4 of digest md5((i//4) || shingle) — ONE md5
    per shingle per 4 families instead of one per family (the min of a
    hex slice is the min of its 32-bit value: hex compares bytewise).
    All JVM-side, engine-neutral (md5 + substr exist everywhere).
    """
    digests = {
        d: F.md5(F.concat(F.lit(str(d)), F.lit("|"), F.col("shingle")))
        for d in range((n_hashes + 3) // 4)
    }
    aggs = [
        F.min(digests[i // 4].substr(8 * (i % 4) + 1, 8)).alias(f"sig_{i}")
        for i in range(n_hashes)
    ]
    return shingled.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band.

    Band value = concat of its signature rows; docs bucketed per
    (band_idx, band_value); pairs emitted within buckets via a
    self-equi-join on the bucket key (never a cross join), distinct
    across bands. doc_a < doc_b canonical order.

    `max_bucket` caps bucket size: a degenerate band value (e.g. empty
    docs all sharing one signature) otherwise makes an O(b²) pair
    blow-up — buckets above the cap are dropped entirely (the standard
    LSH skew guard: a bucket that large is not a useful near-dup
    signal, and at 100 TB it is the task that never finishes). The
    rule is a plain count predicate, so the oracle replays it.

    Banding comes from `minhash_bands` (ONE source of truth for the
    band_val format — this is also what persisted bucketed-history
    tables store, so a format drift here would silently empty the
    incremental probe). The bucket table feeds both sides of the
    self-join (and the cap's count); Spark has no cross-branch subplan
    sharing, so cache it — one shingle+minhash pass instead of two.
    """
    bucketed = minhash_bands(signatures, n_bands, rows_per_band).cache()
    if max_bucket is not None:
        wb = Window.partitionBy("band", "band_val")
        bucketed = (
            bucketed.withColumn("__bn", F.count("*").over(wb))
            .filter(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    left = bucketed.alias("a")
    right = bucketed.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame, shingled: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only.

    |A∩B| via an equi-join on shingle restricted to candidate pairs;
    |A∪B| = |A|+|B|-|A∩B|. Returns pairs with jaccard >= threshold.
    Cost scales with candidate count, not corpus size squared.

    The shingle set feeds THREE plan branches (sizes + both join
    probes); Spark has no automatic subplan sharing across DataFrame
    branches, so cache it — one normalize+explode pass instead of three
    at any scale.
    """
    shingled = shingled.cache()
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = shingled.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shingled.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        candidates.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")
    )


_LANE = 16  # bit-counter lane width; distinct tokens/doc capped at 32766


def _packed_lane_lookup(digit: F.Column, n_lanes: int) -> F.Column:
    """hex-digit VALUE (0-15) -> its `n_lanes` bits spread into 16-bit
    lanes of one long (bit b of the digit at lane offset 16*b), via an
    O(1) literal-array index (a literal create_map would linear-scan
    16 string keys per lookup). Summing the packed longs over tokens
    counts all four bits of a digit in ONE aggregate buffer — lanes
    can't bleed while per-lane counts stay < 2^16."""
    vals = []
    for v in range(16):
        packed = 0
        for b in range(n_lanes):
            packed |= ((v >> b) & 1) << (_LANE * b)
        vals.append(F.lit(packed).cast("long"))
    return F.element_at(F.array(*vals), digit + 1)


def simhash(documents: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash fingerprint over unigram tokens, up to 64 bits wide
    (md5's 32 hex digits supply 128 independent bits; the int64
    signature caps the packed width at 64).

    Token hash bit j = bit (j%4) of the (j//4)-th md5 hex digit of the
    token — engine-neutral (md5 exists in Spark and DuckDB), unlike
    xxhash64. Signature bit j is 1 iff sum over distinct tokens of
    (+1 / -1 by hash bit) > 0. Bit 63 packs as long MIN_VALUE (two's
    complement); XOR/popcount downstream are sign-agnostic, and the
    running sum stays in-range under ANSI mode (bits 0..62 sum to at
    most 2^63-1 before the final negative term).

    Scale shape: ONE md5 per token and ONE groupBy(doc_id) carrying
    ceil(bits/4)+1 LANE-PACKED sum aggregates — each hex digit's four
    bit-counters ride 16-bit lanes of a single long (one map lookup +
    one sum buffer per DIGIT, not per bit; the round-4 rewrite of the
    per-bit form, 64 exprs+aggs -> 17, ~2x wall on the 64-bit config).
    The shuffle is (doc_id, ~17 longs) per distinct token, not the
    bits-x exploded (doc_id, bit) stream of the naive formulation.
    Sign test: sum of ±1 over n tokens = 2*bitcount - n > 0. Capacity
    contract: <= 32766 distinct tokens per document — the largest n
    where the packed per-token maximum (all four lanes set, top lane
    at 2^48) can never overflow the int64 sum — enforced by an
    assert_true in the plan, so past the cap the job RAISES (either
    the guard or ANSI overflow, both loud) instead of bleeding lane
    counters silently. No real-world document has 32k DISTINCT
    tokens; shard such a doc before hashing.
    """
    from inputosm_spark.operators import ensure_parallelism

    # distinct tokens per doc, map-side (array_distinct) — no shuffle
    tokens = ensure_parallelism(documents).select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
        ).alias("tok"),
    )
    if not 1 <= bits <= 64:
        raise ValueError(f"simhash bits must be in [1, 64], got {bits}")
    h = F.md5("tok")
    n_digits = (bits + 3) // 4
    packed = tokens.select(
        "doc_id",
        *[
            _packed_lane_lookup(
                F.conv(h.substr(d + 1, 1), 16, 10).cast("int"),
                min(4, bits - 4 * d),
            ).alias(f"p{d}")
            for d in range(n_digits)
        ],
    )
    summed = packed.groupBy("doc_id").agg(
        *[F.sum(f"p{d}").alias(f"s{d}") for d in range(n_digits)],
        F.count("*").alias("__n"),
    )
    n = F.col("__n")
    sig = None
    for j in range(bits):
        # bit-j count rides lane j%4 of digit j//4's packed sum;
        # sign sum over tokens = 2*count - n, positive iff 2*count > n
        bitcount = F.shiftright(F.col(f"s{j // 4}"), _LANE * (j % 4)).bitwiseAND(
            F.lit((1 << _LANE) - 1)
        )
        # bit 63 is the int64 sign bit: its place value is -(2^63)
        weight = (1 << j) if j < 63 else -(1 << 63)
        term = F.when(bitcount * 2 > n, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    # lane-overflow guard: assert_true is NULL when the predicate
    # holds, so the coalesce adds 0 on the happy path and the plan
    # RAISES instead of silently corrupting past the lane capacity
    # (32766 = largest n where even all-lanes-set tokens cannot
    # overflow the packed int64 sum, let alone bleed a 16-bit lane)
    guard = F.assert_true(
        n <= F.lit(32766),
        F.lit("simhash: >32766 distinct tokens in one document "
              "overflow the packed bit-count lanes; use "
              "simhash_sharded for corpora with such documents"),
    )
    return summed.select(
        "doc_id", (sig + F.coalesce(guard.cast("long"), F.lit(0))).alias("simhash")
    )


def simhash_sharded(
    documents: DataFrame,
    text_col: str = "text",
    bits: int = 16,
    n_shards: int = 64,
) -> DataFrame:
    """SimHash for corpora containing OVER-CAP documents (> 32766
    distinct tokens, `simhash`'s packed-lane capacity; r4 verdict
    directive #6 / TODO #5): tokens pre-shard by POSITION in the
    distinct-token array (`pos % n_shards` — perfectly balanced and
    content-independent, per the engine's position-not-content salting
    rule), level 1 computes the same lane-packed sums per (doc_id,
    shard) — each shard holds <= ceil(n/n_shards) tokens, guarded
    in-plan — and level 2 UNPACKS the lanes and sums plain longs per
    doc, where int64 absorbs any real corpus. Capacity: n_shards *
    32766 (~2.1M distinct tokens/doc at the default 64). The signature
    FUNCTION is identical to `simhash` (pytest-proven bit-equality on
    in-cap docs), so every simhash oracle replays unchanged.

    Scale shape: TWO narrow shuffles — (doc_id, shard) carrying the
    same ~bits/4+1 packed longs, then doc_id over <= n_shards rows per
    doc. Use when monster documents are actually expected; `simhash`'s
    single-shuffle plan is the default and RAISES loudly on over-cap
    docs rather than degrading.
    """
    from inputosm_spark.operators import ensure_parallelism

    if not 1 <= bits <= 64:
        raise ValueError(f"simhash bits must be in [1, 64], got {bits}")
    tokens = ensure_parallelism(documents).select(
        "doc_id",
        F.posexplode(
            F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
        ).alias("__pos", "tok"),
    )
    h = F.md5("tok")
    n_digits = (bits + 3) // 4
    packed = tokens.select(
        "doc_id",
        F.pmod("__pos", F.lit(n_shards)).alias("__shard"),
        *[
            _packed_lane_lookup(
                F.conv(h.substr(d + 1, 1), 16, 10).cast("int"),
                min(4, bits - 4 * d),
            ).alias(f"p{d}")
            for d in range(n_digits)
        ],
    )
    lvl1 = packed.groupBy("doc_id", "__shard").agg(
        *[F.sum(f"p{d}").alias(f"s{d}") for d in range(n_digits)],
        F.count("*").alias("__n"),
    )
    # per-shard lane guard: shards are balanced (positions round-robin),
    # so this bounds the doc's distinct tokens at n_shards * 32766
    guard = F.assert_true(
        F.col("__n") <= F.lit(32766),
        F.lit("simhash_sharded: shard over lane capacity — document "
              "has more than n_shards * 32766 distinct tokens"),
    )
    unpacked = lvl1.select(
        "doc_id",
        (F.col("__n") + F.coalesce(guard.cast("long"), F.lit(0))).alias("__n"),
        *[
            F.shiftright(F.col(f"s{j // 4}"), _LANE * (j % 4))
            .bitwiseAND(F.lit((1 << _LANE) - 1))
            .alias(f"b{j}")
            for j in range(bits)
        ],
    )
    lvl2 = unpacked.groupBy("doc_id").agg(
        F.sum("__n").alias("__n"),
        *[F.sum(f"b{j}").alias(f"b{j}") for j in range(bits)],
    )
    n = F.col("__n")
    sig = None
    for j in range(bits):
        # same sign test and bit weights as `simhash` (bit 63 packs as
        # the int64 sign bit)
        weight = (1 << j) if j < 63 else -(1 << 63)
        term = F.when(
            F.col(f"b{j}") * 2 > n, F.lit(weight).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return lvl2.select("doc_id", sig.alias("simhash"))


def simhash_band_candidates(
    documents: DataFrame,
    text_col: str = "text",
    max_hd: int = 3,
    bits: int = 64,
) -> DataFrame:
    """(doc_a, doc_b, hd) candidate pairs from the pigeonhole banded
    self-join — the UNFILTERED superset `simhash_near_dup_pairs`
    verifies. Rows are raw join emissions (a pair colliding in two
    bands appears twice): that is the banding quality metric — the
    volume the join actually pays for — which the width-scaling pytest
    measures directly.
    """
    n_bands = max_hd + 1
    band_bits = bits // n_bands
    if band_bits < 1:
        raise ValueError(f"bits={bits} too narrow for {n_bands} bands")
    mask = (1 << band_bits) - 1
    sigs = simhash(documents, text_col=text_col, bits=bits).select(
        F.col("doc_id").cast("long").alias("doc_id"), "simhash"
    )
    # the bands CARRY their signature, so the banded join verifies
    # in-place — no second and third join back to the signature table
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band"),
                    F.shiftright("simhash", j * band_bits)
                    .bitwiseAND(F.lit(mask)).alias("band_val"),
                )
                for j in range(n_bands)
            ])
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.band", "bv.band_val").cache()
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.expr("a.simhash ^ b.simhash")
            ).cast("long").alias("hd"),
        )
    )


def simhash_near_dup_pairs(
    documents: DataFrame,
    text_col: str = "text",
    max_hd: int = 3,
    bits: int = 64,
) -> DataFrame:
    """EXACT SimHash near-duplicates: all doc pairs with Hamming
    distance <= max_hd between their simhash signatures, found WITHOUT
    the O(n^2) all-pairs scan.

    Pigeonhole pruning: the signature splits into (max_hd + 1) bands;
    any pair within max_hd differing bits leaves >= 1 band UNTOUCHED,
    so a banded self-equi-join on (band, band_value) is a guaranteed
    SUPERSET of the answer — candidates then verify with the exact
    integer popcount bit_count(sig_a XOR sig_b). Result is exact, so
    the oracle can replay it as the brute-force all-pairs filter (fine
    at oracle scale; the banded plan is what runs at corpus scale).

    Default width is the Manku-style production config (64-bit
    signatures, max_hd=3 -> four 16-bit bands; "Detecting
    Near-Duplicates for Web Crawling", WWW'07): each band has 2^16
    values, so random-text bucket sizes are ~n/65536 per band and
    candidate volume grows ~linearly with corpus size. Narrow widths
    (e.g. bits=16 -> 4-bit bands, 16 values) degenerate the self-join
    toward O(n^2/16) — kept only as the brute-force-verifiable test
    twin, never as a corpus-scale config.

    The band rows CARRY their signature into the self-join, so the
    pair verdict is a pure column expression on the joined row — no
    second/third join back to the signature table. The band table
    feeds both join sides and is cached (no cross-branch subplan
    sharing), same as lsh_candidate_pairs' bucket table.
    """
    return (
        simhash_band_candidates(
            documents, text_col=text_col, max_hd=max_hd, bits=bits
        )
        .filter(F.col("hd") <= max_hd)
        .distinct()
    )


def contamination_overlap(
    documents: DataFrame,
    test_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark DECONTAMINATION: per training document, the number of
    distinct word n-grams it shares with a held-out test corpus
    (n_hits), plus the contaminated flag — the standard pre-training
    hygiene pass.

    100 TB shape: test corpora are tiny next to training corpora, so
    the DISTINCT test shingle set BROADCASTS and the training side
    streams through one shingle explode + broadcast hash join +
    map-side-combinable groupBy(doc_id) — the training corpus is never
    shuffled on the shingle key (word_shingles dedupes per doc with
    array_distinct BEFORE the explode, so its distinctness costs no
    shuffle either; only the tiny test side pays a cross-doc distinct).
    """
    train_sh = word_shingles(documents, text_col, n)
    test_sh = word_shingles(test_docs, text_col, n).select("shingle").distinct()
    hits = (
        train_sh.join(F.broadcast(test_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        documents.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.when(F.coalesce("n_hits", F.lit(0)) > 0, 1)
            .otherwise(0).cast("int").alias("contaminated"),
        )
    )


def minhash_bands(
    signatures: DataFrame, n_bands: int = 2, rows_per_band: int = 2
) -> DataFrame:
    """(doc_id, band, band_val) LSH band rows from a signature table —
    the banding shared by the self-join (`lsh_candidate_pairs`), the
    incremental probe (`incremental_dedup_pairs`), and the persisted
    bucketed-history path (write the HISTORY's bands with
    plans/layout.write_bucketed_table keyed on band||'|'||band_val and
    every future batch probes it with zero Exchange on the history
    side — plan-asserted in tests/test_round5_ops.py).

    Fan-out is ONE explode over a literal struct array, never a
    unionAll of n_bands selects: Spark has no cross-branch subplan
    sharing, so the union form re-ran the whole upstream
    shingle+minhash shuffle once per band (the repo's
    explode-vs-unionAll rule, CLAUDE.md; r5 ADVICE)."""
    structs = []
    for b in range(n_bands):
        cols = [
            F.col(f"sig_{b * rows_per_band + r}")
            for r in range(rows_per_band)
        ]
        structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("|", *cols).alias("band_val"),
            )
        )
    return signatures.select(
        "doc_id", F.explode(F.array(*structs)).alias("__bb")
    ).select("doc_id", "__bb.band", "__bb.band_val")


def incremental_dedup_pairs(
    history: DataFrame,
    new_batch: DataFrame,
    text_col: str = "text",
    n_hashes: int = 4,
    n_bands: int = 2,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    eager_check: bool = False,
) -> DataFrame:
    """INCREMENTAL near-dup detection: which NEW documents duplicate
    the HISTORY — the rolling-ingest curation shape. Re-running the
    corpus SELF-join per arriving batch would re-pay the whole
    history's pair volume every time; here each side is banded
    independently and the join is new-bands PROBING history-bands on
    (band, band_val) — cost scales with the batch and its collisions,
    never history². (At production scale the history band table is
    exactly what you persist with plans/layout.write_bucketed_table,
    making the probe a zero-Exchange bucketed join.)

    Same sliced-digest MinHash family and exact-Jaccard verify as the
    batch path (`minhash_signatures`/`jaccard_verify`), so the DuckDB
    oracle replays signatures, banding, candidates and verdicts
    identically. Returns (doc_a=new, doc_b=history, n_inter, n_a,
    n_b, jaccard >= threshold).

    PRECONDITION (checked loudly): history and new_batch doc_ids must
    be DISJOINT — a re-delivered id would double its shingle rows in
    the unioned verify frame and silently skew every Jaccard it
    touches. The check rides the probe join itself as an in-plan
    `assert_true` (the engine's loud-failure pattern) with ZERO extra
    driver barriers: a re-delivered id's unchanged/near-identical text
    hashes to the same signature, so its band rows collide on both
    sides and the doc_a == doc_b pair RAISES at execution (r5 verdict
    #6 — the previous eager semi-join `.count()` cost one driver job
    per invocation of the rolling-ingest hot path). Scope: an id
    re-delivered with entirely REWRITTEN text can band differently on
    the two sides and slip past the collision guard — pass
    `eager_check=True` for the exhaustive (one extra narrow-column
    job) id semi-join when ids may be recycled across unrelated
    content; re-ingest pipelines should drop/supersede the old
    version first (plans/snapshots is the engine's path for that).
    """
    if eager_check:
        overlap = (
            new_batch.select("doc_id")
            .join(history.select("doc_id"), "doc_id", "semi")
            .limit(1)
            .count()
        )
        if overlap:
            raise ValueError(
                "incremental_dedup_pairs: history and new_batch share "
                "doc_ids — supersede the old versions before probing"
            )

    # each side feeds two consumers (minhash + the unioned verify
    # frame), but caching here measured a wash in interleaved A/B and
    # slightly negative in tree-level bench pairs (r7): the extra
    # materialization pass cancels the recompute saved, and
    # jaccard_verify already caches the union it probes three times —
    # so the sides stay uncached
    sh_new = word_shingles(new_batch, text_col=text_col, n=3)
    sh_old = word_shingles(history, text_col=text_col, n=3)
    nb = minhash_bands(
        minhash_signatures(sh_new, n_hashes), n_bands, rows_per_band
    ).withColumnRenamed("doc_id", "doc_a")
    ob = minhash_bands(
        minhash_signatures(sh_old, n_hashes), n_bands, rows_per_band
    ).withColumnRenamed("doc_id", "doc_b")
    # assert_true is NULL when the predicate holds, so the rider
    # column is a constant 0 on the happy path (and part of the
    # distinct key, which keeps Catalyst from pruning it away)
    guard = F.assert_true(
        F.col("doc_a") != F.col("doc_b"),
        F.lit(
            "incremental_dedup_pairs: history and new_batch share "
            "doc_ids — supersede the old versions before probing"
        ),
    )
    cand = (
        nb.join(ob, ["band", "band_val"])
        .select(
            "doc_a",
            "doc_b",
            F.coalesce(guard.cast("long"), F.lit(0)).alias("__g"),
        )
        .distinct()
        .drop("__g")
    )
    return jaccard_verify(cand, sh_new.unionAll(sh_old), threshold)


def prefix_filter_pairs(
    documents: DataFrame,
    text_col: str = "text",
    threshold_e6: int = 500_000,
    n: int = 3,
) -> DataFrame:
    """EXACT all-pairs Jaccard similarity self-join via prefix
    filtering (Bayardo et al., "Scaling Up All Pairs Similarity
    Search", WWW'07; the PPJoin family) — the deterministic
    complement to MinHash/LSH: no probabilistic misses, every pair
    with token-set Jaccard >= threshold is returned, exactly.

    Prefix lemma: order every doc's distinct tokens by ONE global
    total order; if J(A,B) >= t then A and B must share a token inside
    their first |X| - ceil(t*|X|) + 1 tokens — so candidate pairs are
    prefix x prefix token collisions, and the (1-t) prefix fraction is
    the candidate-shrink knob. The global order used is (corpus
    frequency ASC, token ASC): correctness holds for ANY total order,
    but frequency-ascending puts RARE tokens in prefixes, so collision
    buckets stay small — that choice is what makes this an all-pairs
    algorithm that survives 100 TB (a frequent-token-first order
    degenerates toward the quadratic sharing-any-token join).

    Scale shape: token-frequency table = one vocab aggregation (the
    tf-idf shuffle); per-doc ranking windows partition on doc_id
    (bounded rows, never a global window — token_shards rule);
    candidate join collides only prefix tokens; the verify join costs
    O(|A|) per surviving candidate. Threshold arithmetic is integer
    cross-multiplication (inter * 1e6 >= t_e6 * union), so the oracle
    replays pair-for-pair; the reported jac_e6 uses the engine's
    floor-double==integer-// rule (dividends < 2^53).

    The token universe is the word n-gram SHINGLE set (n=3 default —
    unigram vocabularies of same-domain corpora overlap so heavily
    that a unigram Jaccard threshold stops discriminating; measured
    92k of 125k sf0.01 pairs above 0.5 on unigrams vs ~25 on
    3-shingles).

    Returns (doc_a, doc_b, inter, uni, jac_e6), doc_a < doc_b.
    """
    # the shingle stream feeds FOUR consumers (freq, ranked, and both
    # verify probes) — Spark has no cross-branch subplan sharing, so
    # cache it (the jaccard_verify/lsh_candidate_pairs rule): one
    # normalize+explode pass instead of four
    tok = word_shingles(documents, text_col=text_col, n=n).cache()
    freq = tok.groupBy("shingle").agg(F.count("*").alias("__f"))
    # rank tokens inside each doc by the global (freq, token) order;
    # |X| rides the SAME doc_id exchange as the ranking window (an
    # unordered count window) instead of a separate sizes aggregation
    # + join (guide §2.4: two operations keyed the same way share one
    # exchange)
    w = Window.partitionBy("doc_id").orderBy("__f", "shingle")
    ranked = (
        tok.join(freq, "shingle")
        .withColumn("n_tok", F.count("*").over(Window.partitionBy("doc_id")))
        .withColumn("__r", F.row_number().over(w))
    )
    # prefix length |X| - ceil(t*|X|) + 1, all integer
    ceil_t_n = F.floor(
        (F.col("n_tok") * F.lit(threshold_e6) + F.lit(999_999)) / F.lit(1_000_000)
    )
    prefix = ranked.filter(
        F.col("__r") <= F.col("n_tok") - ceil_t_n + F.lit(1)
    ).select("doc_id", "shingle", "n_tok", "__r")
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"),
        "shingle",
        F.col("n_tok").alias("na"),
        F.col("__r").alias("__ra"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"),
        "shingle",
        F.col("n_tok").alias("nb"),
        F.col("__r").alias("__rb"),
    )
    # POSITIONAL filter (the PPJoin refinement of the prefix filter;
    # Xiao et al., WWW'08): rides the same (doc_a, doc_b) exchange the
    # old `.distinct()` paid, as a groupBy keeping min collision
    # positions. Soundness: per-doc positions are the global order
    # restricted, so the MINIMAL collision token attains min(__ra) and
    # min(__rb) SIMULTANEOUSLY; for any pair with J >= t the prefix
    # lemma puts the globally minimal SHARED token inside both
    # prefixes (an in-prefix shared token dominates its positions),
    # every other shared token sits strictly after (ra*, rb*) in both
    # docs, hence overlap <= 1 + min(na - ra*, nb - rb*). Pairs whose
    # bound already fails o*(1e6 + t_e6) >= t_e6*(na + nb) (the J >= t
    # cross-multiplication solved for o) cannot reach the threshold
    # and skip the exact verify join; survivors are verified exactly
    # as before, so the result set is identical (measured: 409k -> 125k
    # candidates at sf0.1, -69 % of the verify join's probe volume).
    ubound = F.lit(1) + F.least(
        F.col("na") - F.col("__ra"), F.col("nb") - F.col("__rb")
    )
    cand = (
        pa.join(pb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.min("__ra").alias("__ra"), F.min("__rb").alias("__rb"))
        .filter(
            ubound * F.lit(1_000_000 + threshold_e6)
            >= F.lit(threshold_e6) * (F.col("na") + F.col("nb"))
        )
        .select("doc_a", "doc_b", "na", "nb")
    )
    # exact verify: |A ∩ B| via the candidate's own token lists
    ta = tok.select(F.col("doc_id").alias("doc_a"), "shingle")
    tb = tok.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    uni = F.col("na") + F.col("nb") - F.col("inter")
    return (
        inter.filter(
            F.col("inter") * F.lit(1_000_000) >= F.lit(threshold_e6) * uni
        )
        .select(
            "doc_a",
            "doc_b",
            "inter",
            uni.alias("uni"),
            F.floor(F.col("inter") * F.lit(1_000_000) / uni)
            .cast("long")
            .alias("jac_e6"),
        )
    )
