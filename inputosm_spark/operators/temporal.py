"""Temporal joins: as-of (nearest preceding state) and interval joins.

The reference has no temporal operators (its closest concept is the
ordered OSC replay); these are graft-surface ops every event pipeline
needs. Both are expressed in the shapes that survive 100x scale-up:

* AS-OF: the naive formulation is an inequality join (left.ts >=
  right.ts, keep max) — a cross-product blow-up per key that no
  optimizer saves. The scalable form used here is UNION + CARRY-
  FORWARD: tag both sides, union them, sort per key by event time in
  ONE window pass, and carry the last state value forward with
  `last(..., ignorenulls)`. Cost: one shuffle of (keys, ts) — linear,
  skew-safe, no join at all.

* INTERVAL: points joined to [start, end) intervals via bucketing both
  sides to a fixed time grain and equi-joining on (key, bucket) before
  the exact range filter — the 1-D twin of the PIP join's cell
  bucketing (operators/spatial.pip_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_s: int | None = None,
    direction: str = "backward",
    bucket_s: int | None = None,
) -> DataFrame:
    """As-of join: each left row gets the value columns of the matching
    right row for the same key, where "matching" depends on direction:

    * ``backward`` (default): LATEST right.ts <= left.ts (DuckDB
      `ASOF JOIN ... ON l.ts >= r.ts` semantics — a state at exactly
      the probe's timestamp is visible).
    * ``forward``: EARLIEST right.ts >= left.ts (the "next reading
      after the event"; equal-ts state visible symmetrically).
    * ``nearest``: whichever of the two is closer in |Δts|; exact ties
      resolve to the BACKWARD (earlier) state.

    All three are the same union + ONE-window-pass shape — never an
    inequality join: backward carries state forward
    (`last(..., ignorenulls)` over an unbounded-preceding frame),
    forward carries it backward (`first(...)` over an
    unbounded-following frame of the same ascending sort), nearest
    computes both and picks per row. Cost: one shuffle of (keys, ts).

    Right rows must be unique per (key, right_ts) — pre-aggregate
    otherwise (an as-of against a multi-valued instant is undefined).
    `tolerance_s` drops matches farther than the window (left keeps
    NULL).

    SKEW SAFETY (`bucket_s`): the default single window per key puts a
    hot key's entire timeline on ONE reducer. With `bucket_s` set, the
    timeline is cut into fixed time buckets and the carry runs in two
    passes — a window per (key, bucket), then a window over the tiny
    one-row-per-(key, bucket) summary to hand state across bucket
    boundaries — so a hot key parallelizes across its buckets. Results
    are IDENTICAL (equal timestamps always share a bucket, so tie rules
    are untouched; carry-in from earlier buckets is strictly older).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_state"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
          for c in value_cols],
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_state"),
        F.lit(None).cast(
            l_tag.schema["__left"].dataType
        ).alias("__left"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    union = l_tag.unionByName(r_tag)
    if bucket_s is not None:
        both = _bucketed_carry(union, value_cols, direction, bucket_s)
    else:
        state_ts = F.when(F.col("__is_state") == 1, F.col("__ts"))
        sel: list = [F.col("*")]
        if direction in ("backward", "nearest"):
            # state rows sort BEFORE probe rows at equal ts (desc on the
            # tag), so a probe at exactly the state's timestamp sees it
            wb = (
                Window.partitionBy("__k")
                .orderBy(F.col("__ts").asc(), F.col("__is_state").desc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            sel += [
                F.last(f"__v_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
                for c in value_cols
            ]
            sel.append(
                F.last(state_ts, ignorenulls=True).over(wb).alias("__b_ts")
            )
        if direction in ("forward", "nearest"):
            # equal-ts states sort AFTER the probe (asc on the tag), so
            # the current-row..following frame still sees them (>=)
            wf = (
                Window.partitionBy("__k")
                .orderBy(F.col("__ts").asc(), F.col("__is_state").asc())
                .rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
            sel += [
                F.first(f"__v_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
                for c in value_cols
            ]
            sel.append(
                F.first(state_ts, ignorenulls=True).over(wf).alias("__f_ts")
            )
        both = union.select(*sel)
    probes = both.filter(F.col("__is_state") == 0)

    def _d(c) -> F.Column:
        return F.col(c).cast("timestamp").cast("double")

    if direction == "backward":
        chosen = {c: F.col(f"__b_{c}") for c in value_cols}
        delta = _d("__ts") - _d("__b_ts")
    elif direction == "forward":
        chosen = {c: F.col(f"__f_{c}") for c in value_cols}
        delta = _d("__f_ts") - _d("__ts")
    else:
        db = _d("__ts") - _d("__b_ts")
        df_ = _d("__f_ts") - _d("__ts")
        use_b = F.col("__b_ts").isNotNull() & (
            F.col("__f_ts").isNull() | (db <= df_)
        )
        chosen = {
            c: F.when(use_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
            for c in value_cols
        }
        delta = F.when(use_b, db).otherwise(df_)
    if tolerance_s is not None:
        in_tol = delta <= F.lit(float(tolerance_s))
        out_vals = [
            F.when(in_tol, chosen[c]).alias(c) for c in value_cols
        ]
    else:
        out_vals = [chosen[c].alias(c) for c in value_cols]
    return probes.select(
        *[F.col("__left")[c].alias(c) for c in left.columns], *out_vals
    )


def _bucketed_carry(
    union: DataFrame,
    value_cols: list[str],
    direction: str,
    bucket_s: int,
) -> DataFrame:
    """Skew-safe twin of the single-window carry: produces the same
    `__b_*` / `__f_*` columns, but no window ever partitions on the key
    alone.

    Pass 1 — window per (key, time-bucket): within-bucket carry with
    the exact tie rules of the unbucketed path (equal timestamps always
    share a bucket, so ties never straddle a boundary).
    Pass 2 — boundary handoff: ONE summary row per (key, bucket) (a
    map-side-combinable groupBy over every bucket that has any row),
    the carry-in for each bucket computed by a window over that tiny
    summary, joined back on (key, bucket) and coalesced under the
    within-bucket value. A key with 10^9 rows costs many (key, bucket)
    tasks plus a summary window over its bucket COUNT — never one
    reducer holding the full timeline.

    Per-column semantics match the unbucketed `last(ignorenulls)`
    exactly: coalesce(within-bucket last non-null, last non-null of any
    earlier bucket) == global last non-null, because floor(ts/bucket) is
    monotone in ts.
    """
    ep = F.col("__ts").cast("timestamp").cast("double")
    df = union.withColumn("__bck", F.floor(ep / bucket_s).cast("long"))
    is_state = F.col("__is_state") == 1
    state_ts = F.when(is_state, F.col("__ts"))

    sel: list = [F.col("*")]
    aggs: list = []
    carry: list = [F.col("__k").alias("__sk"), F.col("__bck").alias("__sbck")]
    ws = Window.partitionBy("__k").orderBy("__bck")
    if direction in ("backward", "nearest"):
        wb = (
            Window.partitionBy("__k", "__bck")
            .orderBy(F.col("__ts").asc(), F.col("__is_state").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        sel += [
            F.last(f"__v_{c}", ignorenulls=True).over(wb).alias(f"__wb_{c}")
            for c in value_cols
        ]
        sel.append(F.last(state_ts, ignorenulls=True).over(wb).alias("__wb_ts"))
        # per bucket: last non-null value per column among its states
        # (max_by skips rows whose ordering expression is null)
        aggs += [
            F.max_by(
                F.col(f"__v_{c}"),
                F.when(is_state & F.col(f"__v_{c}").isNotNull(), F.col("__ts")),
            ).alias(f"__sb_{c}")
            for c in value_cols
        ]
        aggs.append(F.max(state_ts).alias("__sb_ts"))
        wprev = ws.rowsBetween(Window.unboundedPreceding, -1)
        carry += [
            F.last(f"__sb_{c}", ignorenulls=True).over(wprev).alias(f"__cb_{c}")
            for c in value_cols
        ]
        carry.append(
            F.last("__sb_ts", ignorenulls=True).over(wprev).alias("__cb_ts")
        )
    if direction in ("forward", "nearest"):
        wf = (
            Window.partitionBy("__k", "__bck")
            .orderBy(F.col("__ts").asc(), F.col("__is_state").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        sel += [
            F.first(f"__v_{c}", ignorenulls=True).over(wf).alias(f"__wf_{c}")
            for c in value_cols
        ]
        sel.append(
            F.first(state_ts, ignorenulls=True).over(wf).alias("__wf_ts")
        )
        aggs += [
            F.min_by(
                F.col(f"__v_{c}"),
                F.when(is_state & F.col(f"__v_{c}").isNotNull(), F.col("__ts")),
            ).alias(f"__sf_{c}")
            for c in value_cols
        ]
        aggs.append(F.min(state_ts).alias("__sf_ts"))
        wnext = ws.rowsBetween(1, Window.unboundedFollowing)
        carry += [
            F.first(f"__sf_{c}", ignorenulls=True).over(wnext).alias(f"__cf_{c}")
            for c in value_cols
        ]
        carry.append(
            F.first("__sf_ts", ignorenulls=True).over(wnext).alias("__cf_ts")
        )

    summary = df.groupBy("__k", "__bck").agg(*aggs).select(*carry)
    out_cols = [F.col(c) for c in union.columns]
    if direction in ("backward", "nearest"):
        out_cols += [
            F.coalesce(f"__wb_{c}", f"__cb_{c}").alias(f"__b_{c}")
            for c in value_cols
        ]
        out_cols.append(F.coalesce("__wb_ts", "__cb_ts").alias("__b_ts"))
    if direction in ("forward", "nearest"):
        out_cols += [
            F.coalesce(f"__wf_{c}", f"__cf_{c}").alias(f"__f_{c}")
            for c in value_cols
        ]
        out_cols.append(F.coalesce("__wf_ts", "__cf_ts").alias("__f_ts"))
    # null-safe on the key: a NULL key is a legal (and typically HOT)
    # group in the window path, so it must survive the handoff join too
    cond = F.col("__k").eqNullSafe(F.col("__sk")) & F.col(
        "__bck"
    ).eqNullSafe(F.col("__sbck"))
    return df.select(*sel).join(summary, cond).select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_s: int = 3600,
    n_salt: int = 1,
) -> DataFrame:
    """Point-in-interval join ([start, end) half-open): intervals are
    exploded onto a fixed time grid, points bucketed to the same grid,
    and the join runs as a (key, bucket) EQUI-join before the exact
    range filter — never an inequality join. Cost scales with
    interval-length/bucket_s replication of the (small) interval side,
    exactly like pip_join's polygon cell covering.

    SKEW (`n_salt` > 1): a hot (key, bucket) — every point of the day
    landing in one hour of one group — serializes that bucket's join
    on one task. Salting spreads it: points get a POSITION-derived
    salt (content-independent, so exact-duplicate hot rows still
    scatter), the already-replicated interval side fans out to every
    salt, and the join key becomes (key, bucket, salt). Each point
    still meets each interval exactly once — results are identical
    (the oracle-gated query runs salted)."""
    def _epoch(c) -> F.Column:
        # TIMESTAMP_NTZ has no direct numeric cast; hop through
        # TIMESTAMP (session TZ is pinned UTC, so values are identical)
        return F.col(c).cast("timestamp").cast("double")

    p = points.withColumn(
        "__b", F.floor(_epoch(point_ts) / bucket_s).cast("long")
    )
    # Half-open end: the last bucket an interval can reach is
    # (ceil(end_epoch) - 1) // bucket_s IN INTEGER SECONDS — a
    # boundary-aligned end (end % bucket == 0) must NOT replicate into
    # the end bucket. (A double-epsilon subtraction is a no-op at epoch
    # magnitudes: ulp(1.7e9) ~ 2.4e-7 » 1e-9.)
    last_b = F.floor(
        (F.ceil(_epoch(end_col)).cast("long") - F.lit(1)) / bucket_s
    ).cast("long")
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(_epoch(start_col) / bucket_s).cast("long"),
                last_b,
            )
        ),
    )
    join_keys = [key, "__b"]
    if n_salt > 1:
        p = p.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                   F.lit(n_salt)),
        )
        i = i.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
        join_keys.append("__salt")
    joined = p.join(i, join_keys).filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("__b", "__salt") if n_salt > 1 else joined.drop("__b")


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered FUNNEL analysis: per key, how far through the step
    sequence (step[0] -> step[1] -> ...) the event history progresses,
    plus the timestamp each stage was first reached.

    Semantics: stage i+1 is reached by the EARLIEST step[i+1] event at
    or after the stage-i timestamp (ties at the same timestamp count —
    equal-ts events process in step order). Equivalent to the chained
    "min ts >= previous" SQL formulation, which is the oracle twin.

    100 TB shape: ONE groupBy(key) shuffle — events collect into a
    sorted per-key array and a pure-Catalyst F.aggregate state machine
    walks it (no join per stage, no window, no Python). The naive
    twin is len(steps) aggregate+join rounds over the full event table.
    Per-key event history must fit a task (the same contract as
    sessionization); pre-filter to the funnel's event types keeps it
    small.
    """
    prio = F.lit(None)
    mapping = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    prio = mapping[F.col(type_col)]
    ev = events.filter(F.col(type_col).isin(steps)).select(
        F.col(key).alias("__k"),
        F.struct(
            F.col(ts_col).alias("ts"),
            prio.cast("int").alias("prio"),
        ).alias("__e"),
    )
    arr = F.array_sort(F.collect_list("__e"))
    n = len(steps)
    # state: (stage, t_0..t_{n-1}); an event advances the state iff its
    # prio equals the current stage
    zero = F.struct(
        F.lit(0).alias("stage"),
        *[F.lit(None).cast("timestamp").alias(f"t{i}") for i in range(n)],
    )

    def step_fn(acc, e):
        advance = e.prio == acc.stage
        return F.struct(
            F.when(advance, acc.stage + 1).otherwise(acc.stage).alias("stage"),
            *[
                F.when(advance & (F.lit(i) == acc.stage), e.ts)
                .otherwise(acc[f"t{i}"]).alias(f"t{i}")
                for i in range(n)
            ],
        )

    walked = ev.groupBy("__k").agg(
        F.aggregate(arr, zero, step_fn).alias("__f")
    )
    all_keys = events.select(F.col(key).alias("__k")).distinct()
    return (
        all_keys.join(walked, "__k", "left")
        .select(
            F.col("__k").alias(key),
            F.coalesce(F.col("__f.stage"), F.lit(0)).alias("stage"),
            *[
                F.date_format(f"__f.t{i}", "yyyy-MM-dd HH:mm:ss")
                .alias(f"t_{s}")
                for i, s in enumerate(steps)
            ],
        )
    )


def event_path_ngrams(events: DataFrame, n: int = 3) -> DataFrame:
    """Global counts of length-n event-type PATHS (consecutive steps
    in each user's time-ordered event sequence) — the funnel-mining /
    behavioral-motif primitive behind funnel_stages: instead of
    checking ONE ordered pattern, surface which patterns occur.

    One groupBy(user) shuffle builds each user's sorted type array
    (total order (ts, event_id) — the ranking-oracle contract), the
    n-gram structs come from element_at over an exploded start index
    (the struct-tuple form avoids the interpreted per-gram string
    build, CLAUDE.md), and one counting shuffle aggregates paths
    globally.

    Capacity contract: the per-user collect_list assumes BOUNDED
    per-user event counts (sessionized streams; the same assumption
    funnel_stages states). A power user with unbounded history should
    be pre-sharded by time window first — n-gram counts then differ
    only at the n-1 window seams, exactly simhash_sharded's
    position-shard trade.
    """
    arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    seqs = events.groupBy("user_id").agg(
        F.transform(arr, lambda s: s.event_type).alias("__types")
    )
    m = F.size(F.col("__types")) - (n - 1)
    grams = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.struct(
                *[
                    F.element_at(F.col("__types"), i + j).alias(f"t{j}")
                    for j in range(n)
                ]
            ),
        ),
    ).otherwise(
        F.expr(
            "CAST(array() AS array<struct<"
            + ",".join(f"t{j}:string" for j in range(n))
            + ">>)"
        )
    )
    exploded = seqs.select(F.explode(grams).alias("g")).select("g.*")
    return (
        exploded.groupBy(*[f"t{j}" for j in range(n)])
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.concat_ws(">", *[f"t{j}" for j in range(n)]).alias("path"),
            "n",
        )
    )
