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


def test_resize_stub_shapes_and_determinism(spark):
    media = multimodal.synth_media(spark, 32)
    out = multimodal.resize_images(media, out_w=8, out_h=8, fake=True)
    rows = out.collect()
    assert len(rows) == 32
    assert all(len(r.thumb) == 64 and r.ok for r in rows)
    again = {r.media_ref: r.thumb for r in
             multimodal.resize_images(media.repartition(5), 8, 8, fake=True).collect()}
    assert {r.media_ref: r.thumb for r in rows} == again


def test_resize_requires_explicit_stub(spark):
    media = multimodal.synth_media(spark, 2)
    with pytest.raises(Exception):
        multimodal.resize_images(media, fake=False).collect()


def test_frame_sampling_fanout(spark):
    media = multimodal.synth_media(spark, 30)  # duration_ms = (id%30)*1000
    out = multimodal.sample_frames(media, every_ms=1000, max_frames=8, fake=True)
    per = {r.media_ref: r for r in
           out.groupBy("media_ref").count().withColumnRenamed("count", "n").collect()}
    # media://0 has duration 0 -> 1 frame; media://15 -> min(8, 15) = 8
    assert per["media://0"].n == 1
    assert per["media://15"].n == 8
    assert per["media://5"].n == 5
    # frame timestamps are the sample grid
    f5 = sorted((r.frame_idx, r.t_ms) for r in
                out.filter(F.col("media_ref") == "media://5").collect())
    assert f5 == [(i, i * 1000) for i in range(5)]
