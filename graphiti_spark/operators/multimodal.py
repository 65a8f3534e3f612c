"""Multimodal span handling: media columns as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing.

The input's media spans carry only a ``media_ref`` URI (BASELINE.json
input_hint). At 100 TB the actual bytes live in object storage next to
the parquet; this module provides the Spark-side plumbing — schema,
partitioning, UDF signatures, batch shapes — for the media stages of a
training-data pipeline:

- ``media_catalog``: one row per media span with deterministic typed
  metadata derived from the ref (the fetch step is I/O, not compute).
- ``decode_features``: ``mapInPandas`` stage producing fixed-width
  feature vectors per media item. The codec call itself is STUBBED —
  image/audio libraries are not in this container — behind
  ``FakeCodec`` (deterministic bytes→features) and ``RealCodec``
  (raises NotImplementedError with the integration contract).
- ``resize_media``: Arrow-batched resize (``FakeResizer`` stand-in,
  same signature a PIL/opencv implementation slots into).
- ``sample_frames``: per-media frame explosion (video frame sampling;
  pure column ops + explode, zero Python — the per-frame decode is the
  stubbed step).

Scale notes: media work is embarrassingly parallel keyed by media_ref
hash; the feature stage is one Arrow-batched pass with no shuffle; the
catalog join back to spans is on (doc_id, offset) — co-partitioned
with the episodes table's doc_id-hash layout.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURE_DIM = 16

MEDIA_CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("media_type", T.StringType(), False),   # img|audio|video
        T.StructField("content", T.BinaryType(), True),       # opaque payload
        T.StructField("content_len", T.IntegerType(), False),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
        # integer pre-normalization histogram: an exact (drift-free)
        # integrity channel for oracle checks; null for codecs that
        # don't expose one (RealCodec integrations).
        T.StructField("hist", T.ArrayType(T.LongType()), True),
    ]
)


def media_catalog(episodes: DataFrame) -> DataFrame:
    """Media spans → catalog rows. The payload here is a deterministic
    pseudo-content derived from the ref (sha256 stream) standing in for
    the object-store fetch; type comes from the URI scheme."""
    media = (
        episodes.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(
            F.col("s.media_ref").alias("media_ref"),
            "doc_id",
            F.col("s.offset").alias("offset"),
        )
    )
    media_type = F.when(F.col("media_ref").startswith("img://"), "img").when(
        F.col("media_ref").startswith("aud://"), "audio"
    ).otherwise("video")
    payload = F.to_binary(F.sha2(F.col("media_ref"), 256), F.lit("hex"))
    return media.select(
        "media_ref",
        "doc_id",
        "offset",
        media_type.alias("media_type"),
        payload.alias("content"),
        F.length(payload).cast("int").alias("content_len"),
    )


@dataclass
class FakeCodec:
    """Deterministic bytes→features stand-in: feature vector = scaled
    byte histogram of the payload folded to MEDIA_FEATURE_DIM."""

    dim: int = MEDIA_FEATURE_DIM

    def decode_batch(self, refs: pd.Series, payloads: pd.Series) -> pd.DataFrame:
        feats, hists = [], []
        for ref, b in zip(refs, payloads):
            data = bytes(b) if b is not None else hashlib.sha256(ref.encode()).digest()
            arr = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            folded = np.zeros(self.dim)
            for i, v in enumerate(arr):
                folded[i % self.dim] += v
            n = np.linalg.norm(folded)
            feats.append((folded / n if n else folded).astype(np.float32))
            hists.append(folded.astype(np.int64))
        return pd.DataFrame({"features": feats, "hist": hists})


class RealCodec:
    """Integration point for actual decoders (PIL/ffmpeg/torchaudio).

    Contract: ``decode_batch(refs, payloads)`` returns either a
    ``pd.Series`` of fixed-width float32 vectors or a ``pd.DataFrame``
    with columns ``features`` (float32 vectors) and optional ``hist``
    (int64 integrity vectors) — one row per input, no exceptions
    per-row (emit zeros + log to the metrics table on decode failure).
    """

    def decode_batch(self, refs: pd.Series, payloads: pd.Series) -> pd.Series:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this container; "
            "plug a decoder implementing decode_batch(refs, payloads)"
        )


def decode_features(catalog: DataFrame, codec=None) -> DataFrame:
    """Arrow-batched feature extraction over the media catalog."""
    codec = codec or FakeCodec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = codec.decode_batch(pdf["media_ref"], pdf["content"])
            if isinstance(out, pd.DataFrame):
                feats, hist = out["features"], out.get("hist")
            else:  # bare Series of feature vectors (RealCodec contract)
                feats, hist = out, None
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].values,
                    "media_type": pdf["media_type"].values,
                    "features": feats.map(lambda a: [float(x) for x in a]).values,
                    "hist": (
                        hist.map(lambda a: [int(x) for x in a]).values
                        if hist is not None
                        else [None] * len(pdf)
                    ),
                }
            )

    return catalog.mapInPandas(run, schema=FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# resize + frame sampling (the remaining media stages of a training-data
# pipeline; codecs stubbed like decode_features — the container has no
# image/video libraries — but the Spark plumbing is real and tested)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField("content_len", T.IntegerType(), False),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("content", T.BinaryType(), False),
    ]
)


@dataclass
class FakeResizer:
    """Deterministic stand-in for an image resizer (PIL/opencv):
    output bytes = sha256 stream keyed on (payload, w, h), length
    min(w*h, 64). A real implementation decodes `content`, resizes,
    re-encodes — same signature, same schema."""

    def resize_batch(
        self, refs: pd.Series, payloads: pd.Series, width: int, height: int
    ) -> pd.Series:
        out = []
        for ref, b in zip(refs, payloads):
            seed = (bytes(b) if b is not None else ref.encode()) + bytes(
                f"|{width}x{height}", "utf-8"
            )
            n = min(width * height, 64)
            stream = b""
            ctr = 0
            while len(stream) < n:
                stream += hashlib.sha256(seed + bytes([ctr])).digest()
                ctr += 1
            out.append(stream[:n])
        return pd.Series(out)


def resize_media(
    catalog: DataFrame, width: int, height: int, resizer=None
) -> DataFrame:
    """Arrow-batched resize over the media catalog: one mapInPandas
    pass, no shuffle — embarrassingly parallel keyed by media_ref."""
    resizer = resizer or FakeResizer()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = resizer.resize_batch(
                pdf["media_ref"], pdf["content"], width, height
            )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].values,
                    "media_type": pdf["media_type"].values,
                    "width": width,
                    "height": height,
                    "content": resized.values,
                    "content_len": resized.map(len).values,
                }
            )

    return catalog.mapInPandas(run, schema=RESIZED_SCHEMA)


def _frame_count_col(media_ref, media_type, max_frames: int, force: bool):
    """Deterministic per-media frame count: videos (or everything when
    ``force``) sample 1 + md5_u32(ref) % max_frames frames; stills are
    a single frame. md5-derived (docops._md5_u32, the one cross-engine
    hash convention) so the DuckDB oracle reproduces it exactly via
    md5_number_lower % 2^32."""
    from .docops import _md5_u32

    sampled = (F.lit(1) + F.pmod(_md5_u32(media_ref), F.lit(max_frames))).cast("int")
    if force:
        return sampled
    return F.when(media_type == "video", sampled).otherwise(F.lit(1))


def sample_frames(
    catalog: DataFrame,
    max_frames: int = 6,
    frame_interval_ms: int = 1000,
    force: bool = False,
) -> DataFrame:
    """Frame sampling: explode each media item into its sampled frames
    (JVM-side sequence explode — the per-frame DECODE is the stubbed
    step; frame content here is the deterministic sha256(ref|idx)
    placeholder a real ffmpeg-backed codec would replace).

    ``force=True`` samples stills too (the synthetic corpus is all
    img:// refs; forcing exercises the multi-frame path end-to-end).
    Scale shape: pure column ops + explode, no shuffle, no Python.
    """
    n = _frame_count_col(F.col("media_ref"), F.col("media_type"), max_frames, force)
    frames = catalog.select(
        "media_ref",
        F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
    )
    content = F.to_binary(
        F.sha2(
            F.concat_ws("|", F.col("media_ref"), F.col("frame_idx").cast("string")),
            256,
        ),
        F.lit("hex"),
    )
    return frames.select(
        "media_ref",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx").cast("long") * frame_interval_ms).alias("ts_ms"),
        content.alias("content"),
    )
