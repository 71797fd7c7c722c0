"""Interleaved-document span operators (BASELINE.json input_hint).

`spans:array<struct<kind,text,media_ref,offset>>` is the engine's
analog of the reference's ordered way node_refs / relation members
(/root/reference/include/inputosm/inputosm.h:43-74); the ordered
posexplode/reassemble pair proves the per-row span-sequence equality
invariant (the Spark analog of the ordered-ref assertions at
/root/reference/test/unit/read_osm_test.cpp:246-301).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents -> one row per span with its ordinal (J3 analog:
    export_csv.cpp:227-233 emits (relation, member, seq) edges).
    """
    return documents.select(
        "doc_id", F.posexplode("spans").alias("seq", "span")
    ).select(
        "doc_id",
        "seq",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def reassemble_spans(exploded: DataFrame) -> DataFrame:
    """Inverse of explode_spans: rebuild ordered spans per doc_id.

    array_sort on (offset) restores order deterministically — output
    is row-wise equal to the original documents table (tested as the
    explode∘reassemble == identity property).
    """
    return (
        exploded.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("offset", "kind", "text", "media_ref")
                    )
                ),
                lambda s: F.struct(
                    s.kind.alias("kind"),
                    s.text.alias("text"),
                    s.media_ref.alias("media_ref"),
                    s.offset.alias("offset"),
                ),
            ).alias("spans")
        )
    )


def span_sequence_signature(documents: DataFrame) -> DataFrame:
    """Per-doc canonical signature of the ordered span sequence
    (kind, text, media_ref, offset-order) — two tables with equal
    signatures satisfy the per-row span-sequence equality invariant.
    """
    return documents.select(
        "doc_id",
        F.xxhash64(
            F.to_json(
                F.array_sort(
                    F.col("spans"),
                    lambda a, b: F.when(a.offset < b.offset, -1)
                    .when(a.offset > b.offset, 1)
                    .otherwise(0),
                )
            )
        ).alias("span_sig"),
    )


def assert_span_invariant(before: DataFrame, after: DataFrame) -> bool:
    """True iff the span-sequence invariant holds for every doc_id."""
    a = span_sequence_signature(before).alias("a")
    b = span_sequence_signature(after).alias("b")
    bad = a.join(b, "doc_id", "full_outer").filter(
        (F.col("a.span_sig") != F.col("b.span_sig"))
        | F.col("a.span_sig").isNull()
        | F.col("b.span_sig").isNull()
    )
    return bad.isEmpty()
