"""SQL API surface: every engine table and derived view as a temp view,
so the whole engine is drivable from `spark.sql(...)` — the declarative
twin of the DataFrame operators (Catalyst sees one logical plan either
way; this module just does the naming).

Views registered:
* the ten base tables (registry.TPCH_TABLES) from a sf_dir,
* `documents_interleaved` — the span-interleaved corpus
  (datagen.interleave_documents), the engine's input_hint shape,
* `doc_cells` — documents with their deterministic point + res-5/7
  cell ids (the spatial-join staging view).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from inputosm_spark.sources import registry


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create temp views for all base + derived tables; returns names."""
    from pyspark.sql import functions as F

    from inputosm_spark.datagen import interleave_documents
    from inputosm_spark.functions import cells

    names = []
    for t, df in registry.load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
        names.append(t)

    docs = registry.load_table(spark, sf_dir, "documents")
    interleave_documents(docs).createOrReplaceTempView("documents_interleaved")
    names.append("documents_interleaved")

    lat, lon = cells.point_exprs("doc_id")
    docs.select(
        "doc_id", lat, lon,
        cells.cell_id_expr(lat, lon, 5).alias("cell5"),
        cells.cell_id_expr(lat, lon, 7).alias("cell7"),
        "n_chars",
    ).createOrReplaceTempView("doc_cells")
    names.append("doc_cells")
    return names


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run SQL against the engine views (registering them first when a
    sf_dir is given)."""
    if sf_dir is not None:
        register_tables(spark, sf_dir)
    return spark.sql(query)
