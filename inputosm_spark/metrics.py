"""Engine metrics + log-callback surface.

The reference exposes a user-pluggable, thread-safe log callback
(`set_log_callback`, /root/reference/include/inputosm/inputosm.h:
122-130; impl src/inputosmlog.cpp:57-84; exercised by
test/integration/custom_log.cpp) and prints per-stage throughput from
worker threads. In Spark, executor code cannot call a driver-side
Python callback, so the split is:

* driver-side events (`log(level, msg)`) go through the registered
  callback exactly like the reference's — same level filter, same
  "return False on null callback" contract;
* per-stage DATA metrics (rows in/out, byte volume) ride Spark's
  `Observation` API — named aggregates attached to the plan, collected
  by the JVM during the job with no extra pass over the data — and are
  appended to the lineage metrics table for later inspection (the
  analog of the reference's throughput lines, but queryable).
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

LOG_LEVELS = {"trace": 0, "debug": 1, "info": 2, "warn": 3, "error": 4}

_log_callback: Callable[[str, str], None] | None = None
_log_level = "info"


def set_log_callback(cb: Callable[[str, str], None] | None) -> bool:
    """Register cb(level, message). Returns False (and keeps the old
    callback) when cb is falsy — the reference's exact contract
    (inputosmlog.cpp:57-65)."""
    global _log_callback
    if not cb:
        return False
    _log_callback = cb
    return True


def set_log_level(level: str) -> None:
    global _log_level
    if level not in LOG_LEVELS:
        raise ValueError(f"unknown log level {level!r}")
    _log_level = level


def log(level: str, message: str) -> None:
    """Driver-side engine log (inputosmlog.cpp:68-84): level-filtered,
    dropped silently when no callback is registered."""
    if _log_callback is None:
        return
    if LOG_LEVELS.get(level, 0) < LOG_LEVELS[_log_level]:
        return
    _log_callback(level, message)


METRICS_DDL = "run_id string, stage string, metric string, value double"


class StageMetrics:
    """Named per-stage observations over a query's DataFrames.

    Usage:
        sm = StageMetrics("run42")
        df = sm.observe(scan_df, "scan")
        out = sm.observe(agg_df, "agg")
        out.write...            # any action materializes the metrics
        sm.to_table(spark)      # -> (run_id, stage, metric, value) rows
        sm.append_to(store)     # -> lineage-adjacent metrics table

    Observations are computed inside the SAME job (JVM-side aggregates
    piggybacked on the plan) — zero extra scans, unlike a count()
    per stage, which at 100 TB would double the I/O.
    """

    def __init__(self, run_id: str):
        self.run_id = run_id
        self._obs: dict[str, Observation] = {}

    def observe(self, df: DataFrame, stage: str,
                bytes_col: str | None = None) -> DataFrame:
        if stage in self._obs:
            raise ValueError(f"stage {stage!r} already observed")
        obs = Observation(f"{self.run_id}/{stage}")
        exprs = [F.count(F.lit(1)).alias("rows")]
        if bytes_col is not None:
            exprs.append(
                F.sum(F.octet_length(F.col(bytes_col).cast("string")))
                .cast("double").alias("bytes")
            )
        self._obs[stage] = obs
        return df.observe(obs, *exprs)

    def collect(self) -> dict[str, dict[str, float]]:
        """Metrics per observed stage (blocks until each stage's job
        has run; call after the action)."""
        return {stage: dict(obs.get) for stage, obs in self._obs.items()}

    def to_table(self, spark: SparkSession) -> DataFrame:
        rows = [
            (self.run_id, stage, metric, float(value))
            for stage, vals in self.collect().items()
            for metric, value in vals.items()
            if value is not None
        ]
        return spark.createDataFrame(rows, METRICS_DDL)

    def append_to(self, spark: SparkSession, location: str) -> None:
        """Append to the metrics table next to the lineage store —
        the queryable analog of the reference's throughput log lines."""
        self.to_table(spark).write.mode("append").parquet(location)


# --- time utilities (reference src/timeutil.cpp) ------------------------------


def now_ms() -> int:
    """Epoch milliseconds (timeutil.cpp:19-23; F7)."""
    return time.time_ns() // 1_000_000


def now_us() -> int:
    """Epoch microseconds (timeutil.cpp:25-29; F7)."""
    return time.time_ns() // 1_000


def duration_to_str(nanos: int) -> str:
    """Human duration, unit-escalating exactly like the reference
    (timeutil.cpp:59-90; F6): ns -> μs -> ms -> s -> 'H hours M minutes
    S seconds'."""
    if nanos < 1_000:
        return f"{nanos} ns"
    if nanos < 1_000_000:
        return f"{nanos / 1_000.0:.3f} μs"
    if nanos < 1_000_000_000:
        return f"{nanos / 1_000_000.0:.3f} ms"
    if nanos < 60_000_000_000:
        return f"{nanos / 1_000_000_000.0:.3f} s"
    seconds = nanos // 1_000_000_000
    minutes, seconds = divmod(seconds, 60)
    hours, minutes = divmod(minutes, 60)
    if hours > 0:
        return f"{hours} hours {minutes} minutes {seconds} seconds"
    return f"{minutes} minutes {seconds} seconds"


def timed_stage(name: str) -> "_Timer":
    """Context manager that logs a duration line through the callback —
    the reference's `k_timer` pretty-print (timeutil.cpp) analog."""
    return _Timer(name)


class _Timer:
    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.monotonic()
        return self

    def __exit__(self, *exc):
        dt = time.monotonic() - self.t0
        log("info", f"{self.name}: {duration_to_str(int(dt * 1e9))}")
        return False
