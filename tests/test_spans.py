"""Span-sequence equality invariant (BASELINE.json input_hint) —
the Spark analog of the ordered node-ref assertions at
/root/reference/test/unit/read_osm_test.cpp:246-301.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inputosm_spark.datagen import interleave_documents
from inputosm_spark.operators import spans
from inputosm_spark.sources.registry import load_table


def _docs(spark, sf_dir):
    return interleave_documents(load_table(spark, sf_dir, "documents"))


def test_interleave_shape(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    row = docs.first()
    assert row.spans, "every doc must have at least one span"
    offs = [s.offset for s in row.spans]
    assert offs == sorted(offs), "offsets strictly increasing"
    kinds = {s.kind for r in docs.take(50) for s in r.spans}
    assert kinds <= {"text", "media"}
    # text spans carry text, media spans carry media_ref (FIXTURES.md §5)
    bad = docs.select(F.explode("spans").alias("s")).filter(
        ((F.col("s.kind") == "text") & (F.col("s.text").isNull()))
        | ((F.col("s.kind") == "media") & (F.col("s.media_ref").isNull()))
    )
    assert bad.isEmpty()


def test_explode_reassemble_identity(spark, sf_dir):
    """explode ∘ reassemble == identity on the span sequence."""
    docs = _docs(spark, sf_dir)
    round_trip = spans.reassemble_spans(spans.explode_spans(docs))
    assert spans.assert_span_invariant(docs, round_trip)


def test_invariant_detects_corruption(spark, sf_dir):
    """The invariant checker must actually fail on reordered spans."""
    docs = _docs(spark, sf_dir)
    corrupted = docs.select(
        "doc_id",
        F.transform(
            "spans",
            lambda s: F.struct(
                s.kind.alias("kind"),
                s.text.alias("text"),
                s.media_ref.alias("media_ref"),
                # reverse the offsets -> different sequence where len>1
                (F.size("spans") - 1 - s.offset).cast("int").alias("offset"),
            ),
        ).alias("spans"),
    ).filter(F.size("spans") > 1)
    assert not spans.assert_span_invariant(docs.filter(F.size("spans") > 1), corrupted)


def test_invariant_survives_repartition_and_filterless_ops(spark, sf_dir):
    """Engine stages (repartition, projection round-trips) must not
    disturb per-row span sequences."""
    docs = _docs(spark, sf_dir)
    staged = docs.repartition(16, "doc_id").select("doc_id", "spans")
    assert spans.assert_span_invariant(docs, staged)
