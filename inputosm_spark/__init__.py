"""inputosm_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the capabilities of stefankarschti/inputosm
(reference: /root/reference, Apache-2.0 C++20 OSM ingest/scan library) as an
idiomatic Spark DataFrame engine, generalized to:

* OSM-style entity tables (nodes / ways / relations / OSC change streams)
* interleaved text+media document corpora
  (doc_id, spans:array<struct<kind,text,media_ref,offset>>)
* hierarchical grid-cell indexing (H3/S2 stand-in; h3-py / s2 / shapely are
  not available in this environment, so the engine ships its own
  deterministic quadtree grid — see `inputosm_spark.geo`)
* cell-bucketed point-in-polygon joins, k-ring kNN joins,
  raster<->vector tiling, skew-aware two-level aggregation,
  per-partition lineage + idempotent resume
* training-data pipeline ops: dedup (exact / MinHash-LSH / SimHash),
  ANN similarity search, text quality / language-ID / fingerprinting.

Everything is DataFrame-first: logical plans are declared with
pyspark.sql, Catalyst/Tungsten pick the physical strategy; Python only
runs inside Arrow-vectorized pandas UDFs (never per-row).
"""

from inputosm_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
