"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media payloads are opaque ``binary`` columns with a ``media_type`` tag;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` (the only
justified Python-worker hot path — real decoders are C libraries reached via
pandas). The image/audio libs are NOT in this container, so the actual
decoders are stubs (``NotImplementedError``) and a deterministic fake
extractor stands in; the Spark-side plumbing — schema, batching, partition
flow — is real and tested.

At 100 TB: payloads stay columnar in parquet/Iceberg, mapInPandas streams
Arrow batches (no row-at-a-time pickling), and feature extraction
parallelizes per input partition with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def decode_image(payload: bytes) -> dict:
    """Real image decode (PIL/OpenCV) — not available in this container."""
    raise NotImplementedError("image decoding requires PIL/OpenCV; use fake_features")


def decode_audio(payload: bytes) -> dict:
    raise NotImplementedError("audio decoding requires soundfile/ffmpeg; use fake_features")


def decode_video(payload: bytes) -> dict:
    raise NotImplementedError("video decoding requires ffmpeg; use fake_features")


def fake_features(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for decode: features from payload bytes only."""
    n = len(payload)
    return {
        "byte_len": n,
        "width": n % 640 + 16,
        "height": n % 480 + 16,
        "n_frames": 1 if media_type == "image" else n % 24 + 2,
    }


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a multimodal asset table: payload = utf-8 bytes of the text
    (stand-in for real media bytes), media_type cycles by doc_id."""
    media = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (asset_id, media_type, payload)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_features(payload, mt)
                for payload, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[[f.name for f in ASSET_SCHEMA.fields]]

    return assets.mapInPandas(run, ASSET_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("src_bytes", LongType()),
        StructField("dst_bytes", LongType()),
        StructField("dst_width", LongType()),
        StructField("dst_height", LongType()),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resize (PIL.Image.resize): output
    size scales with the target pixel count; bytes cycle from the source."""
    target = max(1, (width * height) // 64)
    reps = target // max(1, len(payload)) + 1
    return (payload * reps)[:target]


def resize_assets(assets: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Arrow-batched resize of image assets to (width, height).

    Real pipelines swap ``fake_resize`` for PIL/OpenCV inside the same
    mapInPandas body; the batch shape, schema and partition flow (narrow,
    zero-shuffle, one Python worker per input partition) stay identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [fake_resize(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "media_type": pdf["media_type"].values,
                    "src_bytes": [len(p) for p in pdf["payload"]],
                    "dst_bytes": [len(r) for r in resized],
                    "dst_width": width,
                    "dst_height": height,
                }
            )

    return assets.filter(F.col("media_type") == "image").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(assets: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for video assets: one output row per kept frame
    (every ``every_n``-th of the asset's ``n_frames``).

    A real decoder would yield actual frame payloads from ffmpeg here; the
    deterministic stand-in derives frame count and per-frame byte length
    from the payload, keeping the fan-out plumbing (one input row -> many
    output rows inside the Arrow batch, no shuffle) fully real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for asset_id, payload, mt in zip(pdf["asset_id"], pdf["payload"], pdf["media_type"]):
                n_frames = fake_features(payload, mt)["n_frames"]
                for i in range(0, n_frames, every_n):
                    ids.append(asset_id)
                    idxs.append(i)
                    sizes.append(max(1, len(payload) // n_frames))
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame_bytes": sizes})

    return assets.filter(F.col("media_type") == "video").mapInPandas(run, FRAME_SCHEMA)
