"""SparkSession factory.

The reference's parallelism knobs `set_thread_count` / `thread_count`
(/root/reference/src/inputosmpbf.cpp:958-970) map to Spark's master
thread count and shuffle partitioning; its "zero shared state" worker
model is Spark's task model. AQE is enabled so skewed shuffles re-plan
at runtime (the dynamic work-stealing analog of the reference's shared
work queue, /root/reference/src/inputosmpbf.cpp:854-870).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Iceberg is the design-point table format (10^12-doc corpus). The
#: runtime jar is not bundled in this environment, so the catalog config
#: is applied only when the jar can be found; otherwise the engine falls
#: back to plain partitioned Parquet with identical layout semantics
#: (hash-bucketed doc_id + cell-prefix partition columns).
ICEBERG_JAR_ENV = "INPUTOSM_SPARK_ICEBERG_JAR"


def _iceberg_confs(builder: SparkSession.Builder) -> SparkSession.Builder:
    jar = os.environ.get(ICEBERG_JAR_ENV)
    if not jar or not os.path.exists(jar):
        return builder
    return (
        builder.config("spark.jars", jar)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config(
            "spark.sql.catalog.local.warehouse",
            os.environ.get("INPUTOSM_SPARK_WAREHOUSE", "/tmp/inputosm_warehouse"),
        )
    )


def get_spark(
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "inputosm_spark",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    cpus: thread count for local mode ("*" = all). Mirrors the
    reference's `set_thread_count` clamp-to-hardware behavior
    (/root/reference/src/inputosmpbf.cpp:958-966): non-positive or
    missing -> all cores.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if isinstance(cpus, int) and cpus <= 0:
        cpus = "*"
    n_shuffle = shuffle_partitions or int(os.environ.get("INPUTOSM_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # deterministic oracle comparison: duckdb timestamps are UTC-naive
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        # AQE: runtime coalescing + skew-join splitting — our answer to
        # the reference's dynamic work queue at the shuffle layer.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow everywhere: span-batch delivery (reference span_t,
        # /root/reference/include/inputosm/span.h:26-85) == Arrow batch.
        # 64k-row batches: each Python roundtrip has fixed serialization
        # cost, so bigger batches directly raise UDF throughput (the
        # reference's 16k-node spans are a decode bound, not a UDF one).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("INPUTOSM_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    builder = _iceberg_confs(builder)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def has_iceberg(spark: SparkSession) -> bool:
    """True when the Iceberg catalog `local` is usable in this session."""
    try:
        spark.sql("SHOW NAMESPACES IN local").collect()
        return True
    except Exception:
        return False
