"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` (north-star scope).

The Spark-side plumbing — schema contracts, batch iteration, row-expanding
frame sampling, partition preservation — is real and tested. The actual
codec work (JPEG decode, audio resample, video frame extraction) requires
libraries absent from this container, so the default backend is a
clearly-marked DETERMINISTIC FAKE (seeded by content hash); swap
``decode_backend`` for a PIL/ffmpeg-backed callable in production. Backends
that are unavailable raise NotImplementedError at call time, not import
time.

Scale notes: mapInPandas is a narrow transformation — no shuffle, batches
stream through Arrow with ``spark.sql.execution.arrow.maxRecordsPerBatch``
controlling memory. Decode-heavy pipelines should repartition by size (not
count) first so executor batches are uniform.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-table schema: payload is opaque bytes; meta is typed.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("format", StringType()),
    ]
)

FEATURE_DIM = 16


def _content_seed(payload: bytes) -> int:
    return int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")


def fake_decode_image(payload: bytes) -> dict:
    """DETERMINISTIC FAKE decode — stands in for a PIL/turbojpeg backend.

    Produces stable pseudo-metadata and a pseudo-feature vector seeded by
    the content hash, so pipelines and tests behave identically across runs
    while exercising the exact schema/batch path a real decoder would.
    """
    seed = _content_seed(payload)
    feats = [((seed >> (i * 3)) & 0xFF) / 255.0 for i in range(FEATURE_DIM)]
    return {
        "dec_width": 16 + seed % 1024,
        "dec_height": 16 + (seed >> 10) % 1024,
        "n_channels": 3,
        "features": feats,
    }


def real_decode_image(payload: bytes) -> dict:  # pragma: no cover - env-gated
    """General-format decode backend — requires PIL, absent from this
    container. For real, dependency-free backends that exercise the same
    seam, see :func:`bmp_decode_image` (uncompressed BMP) and
    :func:`png_decode_image` (compressed PNG, zlib + filter recon)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/Pillow; use bmp_decode_image for "
            "uncompressed BMP or install a codec backend"
        ) from e
    raise NotImplementedError("wire PIL decode here when the library exists")


def bmp_decode_image(payload: bytes) -> dict:
    """REAL decode backend: uncompressed 24-bit BMP, pure stdlib.

    Proves the ``decode_backend`` seam with an actual byte-level codec (not
    a hash fake): parses the BITMAPFILEHEADER/BITMAPINFOHEADER, walks the
    bottom-up padded pixel rows, and emits a 16-bin luminance histogram as
    the feature vector. Same return contract as :func:`fake_decode_image`,
    so it drops into :func:`decode_images` unchanged.
    """
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    hist = [0] * FEATURE_DIM
    n_px = max(width * height, 1)
    for r in range(height):
        src_row = (height - 1 - r) if bottom_up else r
        base = data_offset + src_row * row_size
        row = payload[base : base + width * 3]
        for x in range(width):
            b, g, rd = row[x * 3], row[x * 3 + 1], row[x * 3 + 2]
            # integer Rec.601 luma; bucket into FEATURE_DIM bins
            luma = (77 * rd + 150 * g + 29 * b) >> 8
            hist[(luma * FEATURE_DIM) >> 8] += 1
    return {
        "dec_width": width,
        "dec_height": height,
        "n_channels": 3,
        "features": [h / n_px for h in hist],
    }


def png_decode_image(payload: bytes) -> dict:
    """REAL decode backend #2: 8-bit RGB PNG, pure stdlib (zlib inflate +
    full filter reconstruction, types 0-4) — a genuinely COMPRESSED
    format, one notch beyond the uncompressed BMP proof. Round-trips the
    engine's own chart renderer (sources/charts.py encodes filter-0 RGB
    PNGs). Same return contract as :func:`fake_decode_image`.
    """
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload (bad signature)")
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(payload):
        (length,), tag = struct.unpack_from(">I", payload, pos), payload[
            pos + 4 : pos + 8
        ]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + body + CRC
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunks")
    width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if bit_depth != 8 or color_type != 2 or interlace != 0:
        raise ValueError(
            "only 8-bit non-interlaced RGB PNG supported "
            f"(depth={bit_depth}, color_type={color_type})"
        )
    raw = zlib.decompress(idat)
    stride, bpp = width * 3, 3
    hist = [0] * FEATURE_DIM
    prev = bytearray(stride)
    n_px = max(width * height, 1)
    for r in range(height):
        base = r * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        for x in range(width):
            rd, g, b = line[x * 3], line[x * 3 + 1], line[x * 3 + 2]
            luma = (77 * rd + 150 * g + 29 * b) >> 8
            hist[(luma * FEATURE_DIM) >> 8] += 1
        prev = line
    return {
        "dec_width": width,
        "dec_height": height,
        "n_channels": 3,
        "features": [h / n_px for h in hist],
    }


def bmp_resize_image(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL resize backend: nearest-neighbor rescale of an uncompressed
    24-bit BMP, emitting a VALID 24-bit BMP (round-trips through
    :func:`bmp_decode_image`) — the preprocess-images-for-training step
    with an actual pixel transform, pure stdlib."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    out_row_size = (out_w * 3 + 3) & ~3
    out_rows = bytearray(out_row_size * out_h)
    for oy in range(out_h):
        sy = min(oy * height // out_h, height - 1)
        src_y = (height - 1 - sy) if bottom_up else sy
        # output stays bottom-up: output row oy (top-origin) stores at
        # physical row (out_h - 1 - oy)
        dst_base = (out_h - 1 - oy) * out_row_size
        src_base = data_offset + src_y * row_size
        for ox in range(out_w):
            sx = min(ox * width // out_w, width - 1)
            s = src_base + sx * 3
            d = dst_base + ox * 3
            out_rows[d : d + 3] = payload[s : s + 3]
    header = struct.pack("<2sIHHI", b"BM", 54 + len(out_rows), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, out_w, out_h, 1, 24, 0, len(out_rows), 2835, 2835, 0, 0
    )
    return header + dib + bytes(out_rows)


def wav_audio_features(payload: bytes, window_ms: int = 25) -> dict:
    """REAL audio backend: PCM WAV via the stdlib ``wave`` module.

    Parses the RIFF container, derives the window count from the *actual*
    frame count and sample rate (not metadata columns), and emits per-
    segment RMS energy over FEATURE_DIM equal slices of the signal as the
    feature vector. Same return contract as the fake path in
    :func:`extract_audio_features`.
    """
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_frames = w.getnframes()
        rate = w.getframerate()
        sampwidth = w.getsampwidth()
        n_ch = w.getnchannels()
        raw = w.readframes(n_frames)
    if sampwidth != 2:
        raise ValueError(f"only 16-bit PCM WAV supported (sampwidth={sampwidth})")
    samples = struct.unpack(f"<{n_frames * n_ch}h", raw)
    if n_ch > 1:  # average channels to mono
        samples = [
            sum(samples[i : i + n_ch]) / n_ch for i in range(0, len(samples), n_ch)
        ]
    n = max(len(samples), 1)
    seg = max(n // FEATURE_DIM, 1)
    feats = []
    for i in range(FEATURE_DIM):
        chunk = samples[i * seg : (i + 1) * seg] or (0,)
        feats.append((sum(s * s for s in chunk) / len(chunk)) ** 0.5 / 32768.0)
    duration_ms = int(n_frames * 1000 / rate) if rate else 0
    return {
        "n_windows": max(duration_ms // window_ms, 1),
        "mfcc_like": feats,
    }


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dec_width", IntegerType()),
        StructField("dec_height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_images(
    media: DataFrame,
    decode_backend: Callable[[bytes], dict] = fake_decode_image,
) -> DataFrame:
    """Decode + feature-extract image payloads via Arrow-batched mapInPandas.

    One output row per input image row; narrow (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_backend(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "dec_width": [d["dec_width"] for d in decoded],
                    "dec_height": [d["dec_height"] for d in decoded],
                    "n_channels": [d["n_channels"] for d in decoded],
                    "features": [d["features"] for d in decoded],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=DECODED_IMAGE_SCHEMA
    )


RESIZED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def resize_images(
    media: DataFrame,
    out_w: int,
    out_h: int,
    resize_backend: Callable[[bytes, int, int], bytes] = bmp_resize_image,
) -> DataFrame:
    """Binary-in/binary-out image rescale via Arrow-batched mapInPandas —
    the training-set preprocess step. One row per input image, narrow (no
    shuffle); output payloads round-trip through the matching decode
    backend. Swap ``resize_backend`` for a PIL-based one where codecs
    exist (same seam policy as :func:`decode_images`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "payload": [
                        resize_backend(bytes(p), out_w, out_h)
                        for p in pdf["payload"]
                    ],
                    "width": out_w,
                    "height": out_h,
                    "format": pdf["format"].values,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=RESIZED_IMAGE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_ts_ms", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_video_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
) -> DataFrame:
    """Row-expanding frame sampler: N output rows per video row.

    The FAKE frame payload is a content-hash slice (real backend: ffmpeg
    keyframe extraction); the row-expansion plumbing — the part Spark owns —
    is real: mapInPandas yielding more rows than it receives.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_index": [], "frame_ts_ms": [], "frame_payload": [],
            }
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = min(max_frames, max(int(dur or 0) // every_ms, 1))
                digest = hashlib.sha256(bytes(payload)).digest()
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_index"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame_payload"].append(digest + i.to_bytes(4, "big"))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_windows", IntegerType()),
        StructField("mfcc_like", ArrayType(FloatType())),
    ]
)


def extract_audio_features(
    media: DataFrame,
    window_ms: int = 25,
    feature_backend: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Windowed audio featurization via Arrow-batched mapInPandas.

    Default backend is the deterministic FAKE (hash-seeded features, window
    count from the metadata column); pass ``feature_backend=``
    :func:`wav_audio_features` to decode real PCM WAV payloads instead
    (stdlib-only — window count and RMS features from the actual signal).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "n_windows": [], "mfcc_like": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if feature_backend is not None:
                    d = feature_backend(bytes(payload))
                    rows["media_id"].append(mid)
                    rows["n_windows"].append(d["n_windows"])
                    rows["mfcc_like"].append(d["mfcc_like"])
                    continue
                seed = _content_seed(bytes(payload))
                rows["media_id"].append(mid)
                rows["n_windows"].append(max(int(dur or 0) // window_ms, 1))
                rows["mfcc_like"].append(
                    [((seed >> (i * 5)) & 0x3FF) / 1024.0 for i in range(FEATURE_DIM)]
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, schema=AUDIO_FEATURE_SCHEMA
    )


def synth_media(spark: SparkSession, n: int = 60) -> DataFrame:
    """Deterministic synthetic media corpus (payload = hash bytes of id);
    cycles image/audio/video. Test fodder in lieu of real binaries."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                16000 if kind == "audio" else None,
                (1000 + i * 37) % 8000 if kind != "image" else None,
                {"image": "jpeg", "audio": "wav", "video": "mp4"}[kind],
            )
        )
    # few partitions on purpose: mapInPandas forks one Python worker per
    # partition, and 32 workers for a few hundred local rows is pure
    # startup overhead (real media tables arrive partitioned from storage)
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)
