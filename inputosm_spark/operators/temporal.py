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
        sel.append(F.last(state_ts, ignorenulls=True).over(wb).alias("__b_ts"))
    if direction in ("forward", "nearest"):
        # equal-ts states sort AFTER the probe (asc on the tag), so the
        # current-row..following frame still sees them (>= semantics)
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
    both = l_tag.unionByName(r_tag).select(*sel)
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
