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


def chunk_fingerprints(assets: DataFrame, chunk_bytes: int = 64) -> DataFrame:
    """(asset_id, chunk_idx, chunk_md5): fixed-size chunk hashes of the raw
    payload — the storage-dedup signal (content-defined chunking simplified
    to fixed windows), computed WITHOUT decoding the media.

    Both engines chunk the hex encoding of the payload (2 chars/byte) because
    md5 over raw blobs isn't portable SQL; the hashes are identical either
    way since the hex string determines the bytes.
    """
    cc = chunk_bytes * 2
    return (
        assets.select(
            "asset_id",
            F.hex(F.col("payload")).alias("hx"),
            F.expr(f"CAST((length(hex(payload)) + {cc - 1}) DIV {cc} AS BIGINT)").alias("n"),
        )
        .filter(F.col("n") > 0)
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("chunk_idx"),
            "hx",
        )
        .select(
            "asset_id",
            "chunk_idx",
            F.md5(F.substring(F.col("hx"), F.col("chunk_idx") * cc + 1, cc)).alias("chunk_md5"),
        )
    )


def near_dup_assets(
    assets: DataFrame, chunk_bytes: int = 64, min_share_permille: int = 500
) -> DataFrame:
    """Media near-duplicate pairs by chunk-hash overlap: assets sharing at
    least ``min_share_permille``/1000 of the smaller asset's distinct chunk
    hashes. Candidate pairs come from an equi-join on the chunk hash — the
    shingle-join shape, never an all-pairs byte comparison; identical
    payloads score 1000.

    Returns (asset_a, asset_b, shared_chunks, overlap_permille).
    """
    fp = chunk_fingerprints(assets, chunk_bytes).select("asset_id", "chunk_md5").distinct()
    counts = fp.groupBy("asset_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    a = fp.select(F.col("asset_id").alias("asset_a"), "chunk_md5")
    b = fp.select(F.col("asset_id").alias("asset_b"), "chunk_md5")
    shared = (
        a.join(b, "chunk_md5")
        .filter(F.col("asset_a") < F.col("asset_b"))
        .groupBy("asset_a", "asset_b")
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
    )
    ca = counts.select(F.col("asset_id").alias("asset_a"), F.col("n_chunks").alias("n_a"))
    cb = counts.select(F.col("asset_id").alias("asset_b"), F.col("n_chunks").alias("n_b"))
    return (
        shared.join(ca, "asset_a")
        .join(cb, "asset_b")
        .withColumn(
            "overlap_permille",
            F.expr("CAST((shared_chunks * 1000) DIV least(n_a, n_b) AS BIGINT)"),
        )
        .filter(F.col("overlap_permille") >= min_share_permille)
        .select("asset_a", "asset_b", "shared_chunks", "overlap_permille")
    )


SEGMENT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("seg_idx", LongType()),
        StructField("start_frame", LongType()),
        StructField("end_frame", LongType()),
        StructField("seg_energy", LongType()),
    ]
)


def segment_assets(assets: DataFrame, frame_bytes: int = 16) -> DataFrame:
    """VAD-style activity segmentation over audio/video payloads: the
    payload is framed (``frame_bytes`` per frame), each frame's ENERGY is
    the integer sum of its byte values, and maximal runs of
    above-average frames (``energy * n_frames > total_energy`` — integer
    cross-multiplication, no division) become segments — one row per
    (asset, segment) with frame bounds and the segment's energy sum.

    A real voice-activity/shot-boundary detector replaces the byte-sum
    energy with a decoder + model inside the SAME Arrow kernel; framing,
    thresholding, run-merging, schema and the zero-shuffle narrow
    execution are the production plumbing and are what this tests.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in ("asset_id", "seg_idx", "start_frame", "end_frame", "seg_energy")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                if len(b) == 0:
                    continue
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                pad = np.zeros(n_frames * frame_bytes, dtype=np.int64)
                pad[: len(b)] = b
                energy = pad.reshape(n_frames, frame_bytes).sum(axis=1)
                active = energy * n_frames > energy.sum()
                seg = 0
                f = 0
                while f < n_frames:
                    if active[f]:
                        start = f
                        e = 0
                        while f < n_frames and active[f]:
                            e += int(energy[f])
                            f += 1
                        out["asset_id"].append(int(aid))
                        out["seg_idx"].append(seg)
                        out["start_frame"].append(start)
                        out["end_frame"].append(f - 1)
                        out["seg_energy"].append(e)
                        seg += 1
                    else:
                        f += 1
            yield pd.DataFrame(out)

    av = assets.filter(F.col("media_type") != "image")
    return av.select("asset_id", "payload").mapInPandas(run, SEGMENT_SCHEMA)
