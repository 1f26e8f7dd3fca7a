"""Multimodal column plumbing (SURVEY.md §7.4).

Images/audio/video are opaque BinaryType payloads + typed metadata.
The Spark-side plumbing — schema, partition-parallel batch iteration,
Arrow transfer shape — is real and tested. Decode status by format:
24bpp uncompressed BMP decodes FOR REAL (`decode_bmp`, stdlib-only
byte parsing, hash-gated end to end by `bmp_decode_assets`);
PNG/JPEG/WAV/video sit behind import guards (`decode_media`) because
no media libraries ship in this container — swapping in PIL/ffmpeg
changes one function, not the pipeline. `extract_features` computes
deterministic byte-level features through the same mapInPandas path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

MODALITIES = ["image", "audio", "video"]
MIME_BY_MODALITY = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def decode_media(payload: bytes, mime_type: str):
    """Real media decode behind import guards: PIL for images and the
    stdlib ``wave`` module for WAV audio when available, so the stub
    self-upgrades outside this container (which ships neither PIL nor
    ffmpeg). Video decode stays NotImplementedError until an ffmpeg
    binding is present. Returns the METADATA_SCHEMA dict shape, like
    :func:`fake_decode`."""
    if mime_type.startswith("image/"):
        try:  # pragma: no cover - PIL absent in this container
            import io

            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "image decoding requires PIL, which is not installed"
            ) from exc
        img = Image.open(io.BytesIO(payload))
        return {
            "width": img.width,
            "height": img.height,
            "duration_ms": None,
            "n_frames": getattr(img, "n_frames", 1),
        }
    if mime_type == "audio/wav":
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            frames, rate = w.getnframes(), w.getframerate()
        return {
            "width": None,
            "height": None,
            "duration_ms": int(frames * 1000 / rate),
            "n_frames": frames,
        }
    raise NotImplementedError(
        f"no decoder available for {mime_type}; extract_features uses "
        "byte-level features instead"
    )


def attach_payloads(docs: DataFrame) -> DataFrame:
    """Build a multimodal table from the documents fixture: UTF-8 bytes
    as the opaque payload, modality assigned deterministically."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        modality.alias("modality"),
    ).withColumn(
        "mime_type",
        F.when(F.col("modality") == "image", MIME_BY_MODALITY["image"])
        .when(F.col("modality") == "audio", MIME_BY_MODALITY["audio"])
        .otherwise(MIME_BY_MODALITY["video"]),
    )


METADATA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def fake_decode(payload: bytes, mime_type: str) -> dict:
    """Deterministic stand-in for a real decoder: metadata derived from
    the payload bytes alone, so tests are reproducible and the
    mapInPandas plumbing (schema, batch shape, per-modality branching)
    is exactly what a PIL/ffmpeg-backed decoder would use."""
    n = len(payload)
    digest = sum(payload[:64]) if n else 0
    if mime_type.startswith("image/"):
        return {
            "width": 16 + digest % 240,
            "height": 16 + (digest * 7) % 240,
            "duration_ms": None,
            "n_frames": None,
        }
    if mime_type.startswith("audio/"):
        return {"width": None, "height": None, "duration_ms": n * 10, "n_frames": None}
    return {
        "width": 320,
        "height": 240,
        "duration_ms": n * 40,
        "n_frames": max(1, n // 25),
    }


def decode_metadata(assets: DataFrame) -> DataFrame:
    """Typed per-modality metadata through mapInPandas — the decode
    call is `fake_decode` here and PIL/ffmpeg in production; nothing
    else in the plan changes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [
                fake_decode(p, m)
                for p, m in zip(pdf["payload"], pdf["mime_type"])
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "modality", pdf["modality"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return assets.mapInPandas(batches, schema=METADATA_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Binary-in/binary-out resize plumbing over image rows. The fake
    transform is a deterministic byte slice/pad to width*height bytes;
    a real implementation decodes, resizes, re-encodes in place."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            resized = pdf["payload"].map(
                lambda b: bytes(b[:target]).ljust(target, b"\0")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                }
            )

    return assets.filter(F.col("modality") == "image").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling: one input video row fans out to one output row
    per sampled frame — the 1:N batch shape (output batches need not
    align with input rows) that a real ffmpeg frame extractor
    produces. Fake frames are deterministic 25-byte slices."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frame_bytes = 25
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, len(payload) // frame_bytes)
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(
                        bytes(payload[fi * frame_bytes : (fi + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_index": idxs, "frame": frames}
            )

    return assets.filter(F.col("modality") == "video").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-batch feature extraction over binary payloads via
    mapInPandas: Arrow-batched, partition-parallel, zero shuffle.
    Byte-length here; a real decoder returns image dims / audio
    duration through the identical signature."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "mime_type": pdf["mime_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL image codec, zero dependencies: 24-bit uncompressed BMP
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Serialize a solid-color 24bpp uncompressed BMP (BITMAPINFOHEADER,
    bottom-up, rows padded to 4 bytes) — a REAL wire format written
    with nothing but ``struct``, so multimodal gates can stage genuine
    image payloads in a container with no media libraries."""
    import struct

    r, g, b = rgb
    row = bytes([b, g, r]) * width
    pad = (-len(row)) % 4
    pixel_data = (row + b"\x00" * pad) * height
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0,
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 14 + 40
    )
    return header + info + pixel_data


def decode_bmp(payload: bytes) -> dict:
    """Parse a 24bpp uncompressed BMP for real: validates magic,
    header size, bit depth and compression, honors row padding and
    bottom-up order, and returns dimensions plus exact per-channel
    pixel means. This is the decode path the `decode_media` guard
    promises — actually exercised (not stubbed) for the one image
    format that needs no external library."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError("only 24bpp uncompressed BMP supported")
    n_rows = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    tot_r = tot_g = tot_b = 0
    for row in range(n_rows):
        base = data_offset + row * stride
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            tot_r += r
            tot_g += g
            tot_b += b
    n_px = width * n_rows
    return {
        "width": width,
        "height": n_rows,
        "mean_r": tot_r / n_px,
        "mean_g": tot_g / n_px,
        "mean_b": tot_b / n_px,
    }


BMP_DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", LongType()),
        StructField("mean_g", LongType()),
        StructField("mean_b", LongType()),
    ]
)


def decode_bmp_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched real-image decode over a (asset_id, payload)
    binary column: the exact mapInPandas shape `decode_metadata` runs,
    with `decode_bmp` doing genuine byte-level parsing per asset.
    Solid-color gate assets have integer channel means, so the means
    are emitted as exact longs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                m = decode_bmp(bytes(payload))
                rows.append(
                    (
                        int(aid),
                        m["width"],
                        m["height"],
                        int(m["mean_r"]),
                        int(m["mean_g"]),
                        int(m["mean_b"]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in BMP_DECODE_SCHEMA.fields]
            )

    return assets.mapInPandas(batches, BMP_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL audio codec, zero dependencies: 16-bit PCM WAV (stdlib wave)
# ---------------------------------------------------------------------------

def encode_wav(
    n_frames: int, rate: int, amplitude: int, period: int
) -> bytes:
    """Serialize a mono 16-bit PCM WAV carrying a deterministic square
    wave (±amplitude, switching every ``period`` frames) — stdlib
    ``wave`` + ``struct`` only."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        samples = [
            amplitude if (i // period) % 2 == 0 else -amplitude
            for i in range(n_frames)
        ]
        w.writeframes(struct.pack(f"<{n_frames}h", *samples))
    return buf.getvalue()


WAV_DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("rate", LongType()),
        StructField("duration_ms", LongType()),
        StructField("peak_amplitude", LongType()),
        StructField("mean_abs", LongType()),
    ]
)


def decode_wav_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode over (asset_id, payload): the
    stdlib ``wave`` parser reads each RIFF container (frame count,
    rate) and the raw 16-bit PCM samples yield peak and mean-absolute
    amplitude — genuine signal statistics, not byte noise. Square-wave
    gate assets have integer mean |amplitude|, so every column is an
    exact long."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as w:
                    n, rate = w.getnframes(), w.getframerate()
                    raw = w.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                rows.append(
                    (
                        int(aid),
                        n,
                        rate,
                        int(n * 1000 / rate),
                        max(abs(s) for s in samples),
                        int(sum(abs(s) for s in samples) / n),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_DECODE_SCHEMA.fields]
            )

    return assets.mapInPandas(batches, WAV_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL video codec, zero dependencies: raw-frame (DIB) AVI
# ---------------------------------------------------------------------------

def encode_avi(
    width: int, height: int, frames: list[tuple[int, int, int]], fps: int = 10
) -> bytes:
    """Serialize a minimal RIFF AVI whose '00db' chunks carry raw
    24bpp bottom-up DIB frames (one solid RGB color per frame) —
    the uncompressed video container a stdlib parser can read.
    Headers: avih + one video strl (strh/strf), then the movi LIST."""
    import struct

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    stride = (width * 3 + 3) // 4 * 4
    frame_bytes = []
    for r, g, b in frames:
        row = bytes([b, g, r]) * width + b"\x00" * (stride - width * 3)
        frame_bytes.append(row * height)
    n = len(frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps, 0, 0, 0x10, n, 0, 1, stride * height,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                        fps, n, stride * height, 0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, stride * height, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    riff_payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def decode_avi(payload: bytes) -> dict:
    """Parse the raw-frame AVI for real: RIFF walk (LIST recursion,
    chunk padding), avih dims/frame count, then every '00db' frame's
    mean channel values from the DIB pixels. Codec-compressed video
    (anything whose frames aren't raw DIBs) still requires ffmpeg —
    this closes the container/raw-frame half of the video gap."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    width = height = n_frames = None
    frames = []

    def walk(lo: int, hi: int) -> None:
        nonlocal width, height, n_frames
        pos = lo
        while pos + 8 <= hi:
            fourcc = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body = pos + 8
            if fourcc == b"LIST":
                walk(body + 4, body + size)
            elif fourcc == b"avih":
                vals = struct.unpack_from("<14I", payload, body)
                n_frames, width, height = vals[4], vals[8], vals[9]
            elif fourcc == b"00db":
                frames.append((body, size))
            pos = body + size + (size % 2)

    walk(12, len(payload))
    if not frames or width is None:
        raise ValueError("no raw frames found")
    stride = (width * 3 + 3) // 4 * 4
    stats = []
    for off, _size in frames:
        tot = [0, 0, 0]
        for row in range(height):
            base = off + row * stride
            for x in range(width):
                b, g, r = payload[base + 3 * x : base + 3 * x + 3]
                tot[0] += r
                tot[1] += g
                tot[2] += b
        n_px = width * height
        stats.append(tuple(t // n_px for t in tot))
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "frame_means": stats,
    }


AVI_DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", LongType()),
        StructField("mean_g", LongType()),
        StructField("mean_b", LongType()),
    ]
)


def sample_avi_frames(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling over raw-frame AVI payloads: decode each
    container, keep every ``every_n``-th frame, emit one row per
    sampled frame with its exact channel means — the frame-sample
    pipeline stage running on genuine video bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                m = decode_avi(bytes(payload))
                for fi, (r, g, b) in enumerate(m["frame_means"]):
                    if fi % every_n == 0:
                        rows.append(
                            (int(aid), fi, m["width"], m["height"], r, g, b)
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AVI_DECODE_SCHEMA.fields]
            )

    return assets.mapInPandas(batches, AVI_DECODE_SCHEMA)
