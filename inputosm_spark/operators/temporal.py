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
) -> DataFrame:
    """Backward as-of join: each left row gets the value columns of the
    LATEST right row with right.ts <= left.ts for the same key (ties at
    equal ts: the state is visible to the probe — DuckDB `ASOF JOIN ...
    ON l.ts >= r.ts` semantics, which the oracle replays natively).

    Right rows must be unique per (key, right_ts) — pre-aggregate
    otherwise (an as-of against a multi-valued instant is undefined).
    `tolerance_s` drops matches older than the window (left keeps NULL).
    """
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
    # state rows sort BEFORE probe rows at equal ts (desc on the tag),
    # so a probe at exactly the state's timestamp sees it (>= semantics)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", F.desc("__is_state"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
        for c in value_cols
    ]
    state_ts = F.when(F.col("__is_state") == 1, F.col("__ts"))
    carried_ts = F.last(state_ts, ignorenulls=True).over(w).alias("__c_ts")
    both = l_tag.unionByName(r_tag).select("*", *carried, carried_ts)
    probes = both.filter(F.col("__is_state") == 0)
    if tolerance_s is not None:
        in_tol = (
            F.col("__ts").cast("timestamp").cast("double")
            - F.col("__c_ts").cast("timestamp").cast("double")
        ) <= F.lit(float(tolerance_s))
        probes = probes.select(
            "*",
            *[F.when(in_tol, F.col(f"__c_{c}")).alias(f"__t_{c}")
              for c in value_cols],
        )
        out_vals = [F.col(f"__t_{c}").alias(c) for c in value_cols]
    else:
        out_vals = [F.col(f"__c_{c}").alias(c) for c in value_cols]
    return probes.select(
        *[F.col("__left")[c].alias(c) for c in left.columns], *out_vals
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """Point-in-interval join ([start, end) half-open): intervals are
    exploded onto a fixed time grid, points bucketed to the same grid,
    and the join runs as a (key, bucket) EQUI-join before the exact
    range filter — never an inequality join. Cost scales with
    interval-length/bucket_s replication of the (small) interval side,
    exactly like pip_join's polygon cell covering."""
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
    joined = p.join(i, [key, "__b"]).filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("__b")
