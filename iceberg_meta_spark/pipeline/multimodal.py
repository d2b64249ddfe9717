"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media payloads are opaque ``binary`` columns with a ``media_type`` tag;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` (the only
justified Python-worker hot path — real decoders are C libraries reached via
pandas). Three REAL dependency-free decoders ship: PNM/BMP images, PCM WAV
audio, and YUV4MPEG2 video — pixel/sample/frame-level decodes, not header
sniffs. Compressed formats (PNG/JPEG/MP3/MP4) still raise
``NotImplementedError`` naming the library they need (PIL/ffmpeg are not in
this container); ``fake_features`` remains the deterministic stand-in for
payloads that are not media containers at all.

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


# ---------------------------------------------------------------------------
# Real, dependency-free codecs (no PIL/ffmpeg in this container):
#   image — binary PPM (P6) / PGM (P5), uncompressed BMP, and REAL PNG
#           (stdlib zlib inflate + all five scanline filters; 8-bit
#           gray/RGB/RGBA, non-interlaced — a genuine compressed
#           production format, encoder included)
#   audio — RIFF/WAVE PCM (stdlib struct parse)
#   video — YUV4MPEG2 (y4m: plain-text header + raw frames)
# Formats that genuinely need external libs (JPEG/MP3/MP4, palette or
# interlaced PNG…) still raise NotImplementedError with the library named
# — the honest boundary — but the decode path itself is real and
# exercised on real containers.
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2 "


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` whitespace-separated integer tokens after the PNM magic
    (comments starting with ``#`` skipped), plus the offset past the single
    whitespace byte that terminates the header."""
    vals: list[int] = []
    i = 2  # past "P6"/"P5"
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # one whitespace byte ends the header


def decode_image(payload: bytes) -> dict:
    """Decode a binary PNM (P6 RGB / P5 gray) or uncompressed BMP header.

    Returns {width, height, n_channels, pixels(np.uint8 HxWxC)} — a real
    pixel decode, not a header sniff. Compressed formats name the library
    they need.
    """
    import numpy as np

    magic = payload[:2]
    if magic in (b"P6", b"P5"):
        (w, h, maxval), off = _ppm_tokens(payload, 3)
        if maxval > 255:
            raise NotImplementedError("16-bit PNM not supported")
        ch = 3 if magic == b"P6" else 1
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=off)
        return {"width": w, "height": h, "n_channels": ch, "pixels": px.reshape(h, w, ch)}
    if magic == b"BM":
        import struct

        off_bits, hdr_size = struct.unpack_from("<II", payload, 10)
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if compression != 0 or bpp not in (8, 24, 32):
            raise NotImplementedError("only uncompressed 8/24/32-bpp BMP")
        ch = bpp // 8
        stride = (w * ch + 3) & ~3  # rows pad to 4 bytes
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * abs(h), offset=off_bits
        ).reshape(abs(h), stride)[:, : w * ch]
        if h > 0:  # positive height = bottom-up row order
            rows = rows[::-1]
        return {
            "width": w,
            "height": abs(h),
            "n_channels": ch,
            "pixels": rows.reshape(abs(h), w, ch),
        }
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    raise NotImplementedError("image decoding for this format requires PIL/OpenCV")


# --- PNG: a real compressed production format, decoded with nothing but ---
# --- stdlib zlib + numpy (critical chunks; 8-bit gray/RGB/RGBA;         ---
# --- all five scanline filters; non-interlaced).                        ---

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    import struct

    off = 8
    while off + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, off), payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + length]
        yield ctype, data
        off += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> dict:
    import struct
    import zlib

    import numpy as np

    ihdr = idat = None
    idat_parts = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat_parts.append(data)
    if ihdr is None or not idat_parts:
        raise NotImplementedError("malformed PNG (missing IHDR/IDAT)")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in (0, 2, 6):
        raise NotImplementedError(
            "only 8-bit non-interlaced gray/RGB/RGBA PNG supported; "
            "palette/16-bit/interlaced need PIL"
        )
    ch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat_parts))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise NotImplementedError("PNG scanline size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                up = prev[x]
                ul = prev[x - ch] if x >= ch else 0
                if ftype == 1:
                    rec[x] = (line[x] + left) & 0xFF
                elif ftype == 3:
                    rec[x] = (line[x] + ((left + up) >> 1)) & 0xFF
                else:
                    rec[x] = (line[x] + _paeth(int(left), int(up), int(ul))) & 0xFF
        else:
            raise NotImplementedError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return {
        "width": w,
        "height": h,
        "n_channels": ch,
        "pixels": out.reshape(h, w, ch),
    }


def encode_png(pixels) -> bytes:
    """Encode an HxWxC uint8 array (C in {1,3,4}) as a real zlib-compressed
    PNG (filter 0 per scanline) — stdlib only."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_audio(payload: bytes) -> dict:
    """Decode RIFF/WAVE PCM: {n_channels, sample_rate, n_samples,
    samples(np.int16 frames×channels)} — a real sample decode via stdlib
    struct; compressed codecs name the library they need."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("audio decoding for this format requires soundfile/ffmpeg")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError("malformed WAV (missing fmt/data chunk)")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError("only 16-bit PCM WAV; other codecs need soundfile/ffmpeg")
    samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    n_frames = len(samples) // n_ch
    return {
        "n_channels": n_ch,
        "sample_rate": rate,
        "n_samples": n_frames,
        "samples": samples[: n_frames * n_ch].reshape(n_frames, n_ch),
    }


def decode_video(payload: bytes) -> dict:
    """Decode YUV4MPEG2 (y4m): {width, height, n_frames, frames(list of raw
    YUV420 planes)} — a real frame split on the one video container that
    needs no codec. Anything else names ffmpeg."""
    import numpy as np

    if not payload.startswith(_Y4M_MAGIC):
        raise NotImplementedError("video decoding for this format requires ffmpeg")
    nl = payload.index(b"\n")
    w = h = None
    for tok in payload[len(_Y4M_MAGIC) : nl].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
    frame_len = w * h * 3 // 2  # C420 (the y4m default)
    frames = []
    pos = nl + 1
    while payload[pos : pos + 5] == b"FRAME":
        pos = payload.index(b"\n", pos) + 1
        frames.append(np.frombuffer(payload, dtype=np.uint8, count=frame_len, offset=pos))
        pos += frame_len
    return {"width": w, "height": h, "n_frames": len(frames), "frames": frames}


def encode_ppm(data: bytes, width: int = 32) -> bytes:
    """Wrap raw bytes into a real binary PPM (P6): 3 bytes/pixel, fixed
    width, height = however many rows the data fills (zero-padded)."""
    n_px = max(1, -(-len(data) // 3))
    height = -(-n_px // width)
    body = data + b"\x00" * (width * height * 3 - len(data))
    return b"P6\n%d %d\n255\n" % (width, height) + body


def encode_wav(data: bytes, sample_rate: int = 8000) -> bytes:
    """Wrap raw bytes into a real 16-bit PCM mono WAV (2 bytes/sample,
    zero-padded to an even length)."""
    import struct

    body = data + b"\x00" * (len(data) % 2)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(body))
    return hdr + body


def encode_y4m(data: bytes, width: int = 16, height: int = 16) -> bytes:
    """Wrap raw bytes into a real YUV4MPEG2 stream: C420 frames of
    width×height, as many frames as the data fills (≥1, zero-padded)."""
    frame_len = width * height * 3 // 2
    n_frames = max(1, -(-len(data) // frame_len))
    body = data + b"\x00" * (n_frames * frame_len - len(data))
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (width, height)]
    for i in range(n_frames):
        out.append(b"FRAME\n")
        out.append(body[i * frame_len : (i + 1) * frame_len])
    return b"".join(out)


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


def media_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Like :func:`assets_from_documents`, but every payload is a REAL media
    container (PPM image / PCM WAV / y4m video) carrying the doc's utf-8
    bytes — so the decode path downstream is the real one, end-to-end.
    Container synthesis is bytes-in-bytes-out per row: an Arrow-batched
    kernel, zero shuffle."""
    base = assets_from_documents(docs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = {"image": encode_ppm, "audio": encode_wav, "video": encode_y4m}
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "media_type": pdf["media_type"].values,
                    "payload": [
                        enc[mt](bytes(p))
                        for mt, p in zip(pdf["media_type"], pdf["payload"])
                    ],
                }
            )

    return base.mapInPandas(run, base.schema)


MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("container_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("sample_rate", LongType()),
    ]
)


def decode_media_features(assets: DataFrame) -> DataFrame:
    """REAL decode-based feature extraction: each payload is parsed by the
    matching dependency-free decoder (PNM/BMP, PCM WAV, y4m) — pixel buffers,
    sample arrays and frame splits are materialized, then summarized. Audio
    maps (n_channels, sample_rate, n_samples) onto (width, sample_rate,
    n_frames); height is 1. Arrow-batched, zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, mt, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                p = bytes(payload)
                if mt == "image":
                    d = decode_image(p)
                    w, h, nf, sr = d["width"], d["height"], 1, 0
                elif mt == "audio":
                    d = decode_audio(p)
                    w, h, nf, sr = d["n_channels"], 1, d["n_samples"], d["sample_rate"]
                else:
                    d = decode_video(p)
                    w, h, nf, sr = d["width"], d["height"], d["n_frames"], 0
                rows.append((int(aid), mt, len(p), w, h, nf, sr))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in MEDIA_SCHEMA.fields],
            )

    return assets.mapInPandas(run, MEDIA_SCHEMA)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of a decoded PNM/BMP image, re-encoded
    as binary PPM/PGM — pure numpy index mapping, no PIL."""
    import numpy as np

    d = decode_image(payload)
    px = d["pixels"]
    ys = (np.arange(height) * d["height"]) // height
    xs = (np.arange(width) * d["width"]) // width
    out = px[ys][:, xs]
    magic = b"P6" if d["n_channels"] == 3 else b"P5"
    return magic + b"\n%d %d\n255\n" % (width, height) + out.tobytes()


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


# --- perceptual (content-based) image near-dup over the REAL decode path ---


def ahash64(payload: bytes) -> int:
    """64-bit average hash of a decoded image (PNG/PPM/PGM/BMP — any format
    :func:`decode_image` handles): downsample the grayscale plane to 8×8 by
    block means, threshold at the mean.

    The classic perceptual fingerprint: invariant to uniform brightness /
    contrast scaling (thresholding at the mean removes affine offsets) and
    stable under mild re-encoding or resizing, unlike the byte-level
    chunk-hash in :func:`near_dup_assets` which only survives exact reuse.
    """
    import numpy as np

    d = decode_image(payload)
    px = np.asarray(d["pixels"], dtype=np.float64)
    if px.ndim == 3:  # RGB(A) -> luma (Rec.601 integer-friendly weights)
        px = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    h, w = px.shape
    # block-mean downsample to 8x8 via bincount on block ids (no scipy)
    ys = (np.arange(h) * 8) // max(h, 1)
    xs = (np.arange(w) * 8) // max(w, 1)
    block = (ys[:, None] * 8 + xs[None, :]).ravel()
    sums = np.bincount(block, weights=px.ravel(), minlength=64)
    cnts = np.bincount(block, minlength=64)
    means = sums / np.maximum(cnts, 1)
    bits = (means > means.mean()).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def _band_bounds(n_bands: int) -> list[tuple[int, int]]:
    """Split the 64 hash bits into ``n_bands`` contiguous (offset, width)
    chunks; the first ``64 % n_bands`` bands take the extra bit."""
    w, rem = divmod(64, n_bands)
    bounds, off = [], 0
    for i in range(n_bands):
        width = w + (1 if i < rem else 0)
        bounds.append((off, width))
        off += width
    return bounds


def perceptual_hashes(assets: DataFrame, n_bands: int = 4) -> DataFrame:
    """(asset_id, payload) -> (asset_id, ahash, band0..band{n-1}): the
    64-bit average hash split into ``n_bands`` contiguous bands for the
    hamming-LSH join. One Arrow-batched pass; undecodable payloads are
    dropped (their format names the missing library in decode_image's
    error)."""
    from pyspark.sql.types import LongType, StructField, StructType

    bounds = _band_bounds(n_bands)
    cols = ["asset_id", "ahash"] + [f"band{b}" for b in range(n_bands)]
    schema = StructType(
        [StructField("asset_id", LongType())]
        + [StructField(c, LongType()) for c in cols[1:]]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in cols}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    hsh = ahash64(bytes(payload))
                except NotImplementedError:
                    continue
                out["asset_id"].append(int(aid))
                out["ahash"].append(hsh - (1 << 64) if hsh >= 1 << 63 else hsh)
                for b, (off, width) in enumerate(bounds):
                    out[f"band{b}"].append((hsh >> off) & ((1 << width) - 1))
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, schema=schema)


def perceptual_near_dup(assets: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-dup pairs by average-hash hamming distance, banded LSH.

    Pigeonhole: two hashes within hamming distance d agree EXACTLY on at
    least one of d+1 disjoint bands, so banding into ``max_hamming + 1``
    bands makes the candidate join COMPLETE for the requested distance —
    never an all-pairs product; the exact 64-bit hamming distance then
    filters candidates to ``max_hamming``. The same band shape as
    MinHash-LSH, applied to pixels instead of shingles.

    The default (3 -> four 16-bit bands) is the 10⁹-asset shape; larger
    ``max_hamming`` narrows each band, so candidate selectivity degrades
    (an 8-bit band has only 256 buckets) — recall is still guaranteed,
    throughput is the price.

    Returns (asset_a, asset_b, hamming) for pairs with at least one equal
    band AND distance <= max_hamming.
    """
    if not 0 <= max_hamming <= 15:
        raise ValueError(
            f"max_hamming={max_hamming}: bands of <4 bits make the banded "
            "join quadratic; use embedding near-dup for looser matches"
        )
    n_bands = max_hamming + 1
    hs = perceptual_hashes(assets, n_bands)
    a = hs.select(*[F.col(c).alias(f"{c}_a") for c in hs.columns])
    b = hs.select(*[F.col(c).alias(f"{c}_b") for c in hs.columns])
    cand = None
    for i in range(n_bands):
        pairs = a.join(b, F.col(f"band{i}_a") == F.col(f"band{i}_b")).filter(
            F.col("asset_id_a") < F.col("asset_id_b")
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    dist = F.bit_count(F.col("ahash_a").bitwiseXOR(F.col("ahash_b")))
    return (
        cand.select(
            F.col("asset_id_a").alias("asset_a"),
            F.col("asset_id_b").alias("asset_b"),
            dist.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
