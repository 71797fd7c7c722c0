"""Multimodal column plumbing: opaque binary media + typed metadata.

Media payloads ride as `binary` columns with typed metadata
(schemas.MEDIA); decode / feature-extract / resize / frame-sample are
Arrow-batched `mapInPandas` stages. The image/audio codec libraries
are NOT present in this container, so the codec kernel itself is
STUBBED: `decode_media` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder (seeded by
md5 of the payload) produces stable pseudo-features. Everything
Spark-side — schema, batch iteration, partitioning, UDF signatures,
output shapes — is real and tested; swapping the stub for PIL/ffmpeg
changes one inner function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "media_ref string, media_type string, ok boolean, "
    "width int, height int, features array<float>"
)


def _decode_kernel(payload: bytes, media_type: str, fake: bool) -> np.ndarray:
    """The codec boundary. Real implementation would be:
    image -> PIL.Image.open(BytesIO(payload)), audio -> soundfile, etc.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic stub"
        )
    digest = hashlib.md5(payload or b"").digest()
    seed = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    # deterministic pseudo-feature vector in [0,1)
    reps = int(np.ceil(FEATURE_DIM / len(seed)))
    return np.tile(seed, reps)[:FEATURE_DIM] / 256.0


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """media table -> per-item feature rows via Arrow batch iteration.

    mapInPandas: one pandas batch in, one out — the span-callback
    contract. Bad payloads yield ok=False rows instead of failing the
    task (error rows are data, not exceptions, at 10^12 scale).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, oks = [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                try:
                    feats.append(_decode_kernel(payload, mtype, fake).tolist())
                    oks.append(True)
                except NotImplementedError:
                    raise
                except Exception:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "ok": oks,
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def synth_media(spark, n: int) -> DataFrame:
    """Deterministic fake media table: payload = md5-derived bytes of
    the ref (column exprs only; binary via unhex of md5 hex)."""
    ref = F.concat(F.lit("media://"), F.col("id").cast("string"))
    return spark.range(n).select(
        ref.alias("media_ref"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod("id", F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        (F.pmod("id", F.lit(64)) * 16 + 16).cast("int").alias("width"),
        (F.pmod("id", F.lit(48)) * 16 + 16).cast("int").alias("height"),
        (F.pmod("id", F.lit(30)) * 1000).cast("int").alias("duration_ms"),
        F.unhex(F.md5(ref)).alias("payload"),
    )


def media_spans_features(documents: DataFrame, media: DataFrame, fake: bool = True):
    """Join interleaved docs' media spans to decoded features —
    the multimodal end of the span pipeline: explode media spans,
    equi-join on media_ref (broadcast when media dim is small)."""
    refs = (
        documents.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    decoded = decode_media(media.join(refs, "media_ref", "left_semi"), fake=fake)
    return decoded


RESIZED_SCHEMA = (
    "media_ref string, ok boolean, out_width int, out_height int, "
    "thumb binary"
)


def resize_images(media: DataFrame, out_w: int = 32, out_h: int = 32,
                  fake: bool = False) -> DataFrame:
    """Image resize stage as an Arrow mapInPandas pipeline.

    Real implementation: PIL `Image.open(payload).resize((w,h))`. The
    codec is STUBBED here (no image libs in this container): fake=True
    produces a deterministic pseudo-thumbnail (md5-stream of the
    payload, out_w*out_h bytes) so the Spark-side contract — schema,
    batch iteration, byte-budget of the output column — is real.
    """
    import hashlib

    from collections.abc import Iterator

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_bytes = out_w * out_h
        for pdf in it:
            thumbs, oks = [], []
            for payload in pdf["payload"]:
                if not fake:
                    raise NotImplementedError(
                        "image codecs unavailable; pass fake=True for the stub"
                    )
                buf = b""
                seed = bytes(payload or b"")
                while len(buf) < n_bytes:
                    seed = hashlib.md5(seed).digest()
                    buf += seed
                thumbs.append(buf[:n_bytes])
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "ok": oks,
                    "out_width": out_w,
                    "out_height": out_h,
                    "thumb": thumbs,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = "media_ref string, frame_idx int, t_ms int, frame binary"


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8, fake: bool = False) -> DataFrame:
    """Video frame sampling as an Arrow mapInPandas pipeline (1 input
    row -> N frame rows; output batches need not align with input rows,
    which is exactly why this is mapInPandas, not a scalar UDF).

    Real implementation: ffmpeg/pyav keyframe seek. Stub: one
    deterministic pseudo-frame per `every_ms` of duration_ms, capped.
    """
    import hashlib

    from collections.abc import Iterator

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs, idxs, ts, frames = [], [], [], []
            for ref, payload, dur in zip(
                pdf["media_ref"], pdf["payload"], pdf["duration_ms"]
            ):
                if not fake:
                    raise NotImplementedError(
                        "video codecs unavailable; pass fake=True for the stub"
                    )
                n = min(max_frames, max(int(dur) // every_ms, 1))
                for i in range(n):
                    refs.append(ref)
                    idxs.append(i)
                    ts.append(i * every_ms)
                    frames.append(
                        hashlib.md5(bytes(payload or b"") + str(i).encode()).digest()
                    )
            yield pd.DataFrame(
                {"media_ref": refs, "frame_idx": idxs, "t_ms": ts, "frame": frames}
            )

    return media.mapInPandas(batches, FRAMES_SCHEMA)
