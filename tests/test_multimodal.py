"""Multimodal plumbing: Arrow-batched decode pipeline with a stubbed
codec (the image/audio libs aren't in this container — the Spark-side
schema/batching/join contract is real and tested).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inputosm_spark import multimodal
from inputosm_spark.datagen import interleave_documents
from inputosm_spark.sources.registry import load_table


def test_decode_media_requires_explicit_stub(spark):
    media = multimodal.synth_media(spark, 4)
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_decode_media_stub_is_deterministic(spark):
    media = multimodal.synth_media(spark, 64)
    a = multimodal.decode_media(media, fake=True)
    b = multimodal.decode_media(media.repartition(7), fake=True)
    assert a.count() == 64
    row = a.filter(F.col("media_ref") == "media://5").first()
    assert row.ok and len(row.features) == multimodal.FEATURE_DIM
    # same payload -> same features, regardless of partitioning
    av = {r.media_ref: r.features for r in a.collect()}
    bv = {r.media_ref: r.features for r in b.collect()}
    assert av == bv


def test_decode_schema_shape(spark):
    media = multimodal.synth_media(spark, 8)
    out = multimodal.decode_media(media, fake=True)
    assert set(out.columns) == {
        "media_ref", "media_type", "ok", "width", "height", "features"
    }
    assert dict(out.dtypes)["features"] == "array<float>"


def test_media_spans_features_joins_only_referenced(spark, sf_dir):
    """The doc->media join decodes only media actually referenced by a
    span (left-semi prune — the handler-null decode elision analog)."""
    docs = interleave_documents(load_table(spark, sf_dir, "documents"))
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    # media dim = referenced refs (payload derived) + decoys
    media = refs.select(
        "media_ref",
        F.lit("image").alias("media_type"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
        F.unhex(F.md5("media_ref")).alias("payload"),
    )
    decoys = multimodal.synth_media(spark, 16)  # media://N, never referenced
    out = multimodal.media_spans_features(docs, media.unionByName(decoys), fake=True)
    n_refs = refs.count()
    assert out.count() == n_refs
    assert out.filter(~F.col("ok")).isEmpty()
