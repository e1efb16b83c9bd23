"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas functions via mapInPandas.

Media columns are `binary` (image/audio/video bytes) alongside a typed
metadata struct. The decode/feature steps run as mapInPandas — per-partition
Arrow batches, the only sane shape for 100 TB of blobs:
- the binary column never passes through a Python row-at-a-time UDF;
- batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch,
  so executor memory is independent of total size;
- partitioning stays whatever the source had — no shuffle is introduced.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so
`decode_image` raises NotImplementedError behind `MEDIA_LIBS_AVAILABLE`,
and the default pipeline uses `fake_decode` — a deterministic stand-in that
derives pseudo-dimensions from the payload bytes. The Spark-side plumbing
(schemas, batching, mapInPandas signature) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    MEDIA_LIBS_AVAILABLE = True
except ImportError:
    MEDIA_LIBS_AVAILABLE = False


DECODED_SCHEMA = (
    "doc_id long, source string, byte_len long, width int, height int, n_frames int"
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real decode — requires PIL, absent here by design."""
    if not MEDIA_LIBS_AVAILABLE:
        raise NotImplementedError(
            "image codec libraries are not installed in this environment; "
            "use fake_decode for plumbing tests"
        )
    raise NotImplementedError("unreachable in this container")


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a media decoder: pseudo width/height/frames
    derived from payload length. Replaced by the real codec when available."""
    n = len(payload)
    return (n % 640, (n * 7) % 480, n % 30 + 1)


def with_media_column(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat each document's UTF-8 bytes as an opaque media
    payload (the testdata has no real blobs). Schema shape is what a real
    media table would carry: (doc_id, source, media binary)."""
    return docs.select("doc_id", "source", F.encode("text", "UTF-8").alias("media"))


def decode_media(media_df: DataFrame, decoder=fake_decode) -> DataFrame:
    """mapInPandas decode: binary payload -> typed features. Arrow-batched;
    the decoder is called once per payload within a vectorized batch loop."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decoder(p) for p in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "byte_len": [len(p) for p in pdf["media"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return media_df.mapInPandas(batches, schema=DECODED_SCHEMA)


def resize_media(decoded: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Resize step: scale (width, height) to fit the target box, preserving
    aspect ratio. Pure column arithmetic — the real pixel resample would run
    in the decode mapInPandas batch; the dimension bookkeeping (what the
    pipeline schedules around) is engine-side and exact."""
    scale = F.least(
        F.lit(float(max_w)) / F.greatest("width", F.lit(1)),
        F.lit(float(max_h)) / F.greatest("height", F.lit(1)),
        F.lit(1.0),
    )
    return decoded.select(
        "doc_id",
        "source",
        "byte_len",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("out_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("out_h"),
        "n_frames",
    )


def sample_frames(decoded: DataFrame, stride: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: one output row per kept frame
    (every `stride`-th frame starting at 0). explode(sequence(...)) keeps the
    fan-out JVM-side; the per-frame decode would be a second mapInPandas over
    (payload, frame_idx) batches. Returns (doc_id, source, frame_idx)."""
    idxs = F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(stride)
    )
    return decoded.select(
        "doc_id", "source", F.explode(idxs).alias("frame_idx")
    )


FEATURE_DIM = 8
FEATURES_SCHEMA = "doc_id long, source string, features array<float>"


def extract_features(media_df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction: binary payload -> fixed-dim float vector, as an
    Arrow-batched mapInPandas (numpy per batch, no per-row Python). The
    deterministic stand-in is an L1-normalized byte histogram folded to
    `dim` buckets — a real extractor (CLIP/wav2vec) drops into the same
    batch loop with GPU scoring per partition."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            feats = []
            for payload in pdf["media"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                total = hist.sum()
                feats.append((hist / total if total else hist).astype("float32"))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "source": pdf["source"], "features": feats}
            )

    return media_df.mapInPandas(batches, schema=FEATURES_SCHEMA)


def media_stats_by_source(docs: DataFrame) -> DataFrame:
    """End-to-end pipeline: attach media column -> mapInPandas decode ->
    per-source aggregate. Returns (source, n_items, sum_bytes, avg_width)."""
    decoded = decode_media(with_media_column(docs))
    return (
        decoded.groupBy("source")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("byte_len").alias("sum_bytes"),
            F.round(F.avg("width"), 4).cast("decimal(18,4)").cast("double").alias("avg_width"),
        )
        .orderBy("source")
    )
