"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.11).

Media payloads are opaque `binary` columns with a typed metadata struct;
decode / feature-extract run as Arrow-batched `mapInPandas` stages.
UNCOMPRESSED containers (WAV PCM, BMP, PPM) decode for REAL — numpy alone
parses their headers and raw samples (`decode_media_uncompressed`,
oracle-checked end to end). Codec formats need image/audio libraries the
container lacks, so those paths are stubbed: `decode_media` computes
deterministic fake features from the bytes (marked clearly below), and
`decode_media_real` raises NotImplementedError at the exact point a codec
decoder (PIL / torchaudio / pyav) would be called. The Spark-side plumbing
— schema, partitioning, UDF signature, Arrow batch shape — is real and
tested everywhere.

Scale: payload rows are wide; `repartition(n, key)` before mapInPandas keeps
batches balanced, and metadata-only queries never touch the binary column
(parquet column pruning skips the payload bytes entirely).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, width int, height int, n_frames int, feature_norm double"


def attach_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from the documents table: the UTF-8 bytes stand in
    for an opaque payload (deterministic; no media libs in container)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.xxhash64(payload).alias("checksum"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    # STUB decoder: deterministic pseudo-features from byte content. A real
    # image decode (PIL.Image.open) would populate the same tuple.
    n = len(payload)
    s = sum(payload[:64])
    return (n % 640 + 1, (n // 7) % 480 + 1, n % 30 + 1, round((s % 1000) / 10.0, 2))


def decode_media(media: DataFrame, partitions: int = 0) -> DataFrame:
    """mapInPandas decode stage: (media_id, width, height, n_frames,
    feature_norm). Arrow-batched; batch shape = pandas DataFrame per batch."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                    "feature_norm": [f[3] for f in feats],
                }
            )

    src = media.repartition(partitions, "media_id") if partitions else media
    return src.select("media_id", "payload").mapInPandas(decode, FEATURE_SCHEMA)


def decode_media_real(media: DataFrame) -> DataFrame:
    """Real decoder entry point — requires PIL/torchaudio, absent here.
    (Uncompressed container formats — WAV/BMP/PPM — decode for REAL
    without those libraries: see :func:`decode_media_uncompressed`.)"""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "media decoding requires an image/audio library (e.g. PIL, "
            "torchaudio) which is not available in this container; "
            "see decode_media() for the stubbed deterministic pipeline"
        )
        yield  # pragma: no cover

    return media.select("media_id", "payload").mapInPandas(decode, FEATURE_SCHEMA)


# ------------------------------------------------ REAL uncompressed decode --
# WAV (RIFF PCM), BMP (BITMAPINFOHEADER, uncompressed), and PPM (P6) carry
# raw samples/pixels — no codec needed, numpy alone decodes them. These are
# REAL decoders, not stubs: headers are parsed per spec and features come
# from the actual samples. Codec formats (JPEG/MP3/H.264) still raise at the
# same integration point, naming the library they need.
UNCOMP_SCHEMA = (
    "media_id long, kind string, width int, height int, n_samples long, feature_mean double"
)


def _parse_wav(b: bytes) -> tuple:
    """RIFF/WAVE PCM: walk chunks for fmt + data; 8-bit unsigned or 16-bit
    signed samples. Returns (kind, channels, bits, n_samples, mean)."""
    import numpy as np
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos:pos + 4], struct.unpack("<I", b[pos + 4:pos + 8])[0]
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, _rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError("compressed WAV needs an audio codec library")
    if bits not in (8, 16):
        raise NotImplementedError(f"{bits}-bit PCM needs an audio library (8/16-bit supported)")
    samples = (
        np.frombuffer(data, dtype=np.uint8)
        if bits == 8
        else np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    )
    return ("audio", channels, bits, len(samples), float(samples.mean()) if len(samples) else 0.0)


def _parse_bmp(b: bytes) -> tuple:
    """BMP BITMAPINFOHEADER, uncompressed (BI_RGB) 8/24/32-bpp."""
    import numpy as np
    import struct

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack("<I", b[10:14])[0]
    width, height = struct.unpack("<ii", b[18:26])
    bpp, compression = struct.unpack("<H", b[28:30])[0], struct.unpack("<I", b[30:34])[0]
    if compression != 0:
        raise NotImplementedError("compressed BMP needs an image codec library")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bpp BMP needs an image library (8/24/32 supported)")
    row_bytes = (width * bpp // 8 + 3) // 4 * 4  # rows pad to 4 bytes
    h = abs(height)
    px = np.frombuffer(b, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    px = px.reshape(h, row_bytes)[:, : width * bpp // 8]
    return ("image", width, h, width * h, float(px.mean()) if px.size else 0.0)


def _parse_ppm(b: bytes) -> tuple:
    """PPM P6: ascii header (w, h, maxval) + raw RGB bytes."""
    import numpy as np

    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":  # comment line
            while b[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("2-byte-sample PPM needs an image library (maxval <= 255 supported)")
    px = np.frombuffer(b, dtype=np.uint8, count=width * height * 3, offset=pos)
    return ("image", width, height, width * height, float(px.mean()) if px.size else 0.0)


def decode_payload_uncompressed(b: bytes) -> tuple:
    """Dispatch on magic bytes. Raises NotImplementedError for codec
    formats — the same integration point decode_media_real marks."""
    if b[:4] == b"RIFF":
        return _parse_wav(b)
    if b[:2] == b"BM":
        return _parse_bmp(b)
    if b[:2] == b"P6":
        return _parse_ppm(b)
    raise NotImplementedError(
        "payload is not an uncompressed WAV/BMP/PPM container; codec formats "
        "(JPEG/MP3/H.264) require an image/audio library absent here"
    )


def decode_media_uncompressed(media: DataFrame, partitions: int = 0) -> DataFrame:
    """REAL decode for uncompressed media containers (WAV PCM, BMP, PPM) —
    header parse + numpy over the raw samples, Arrow-batched exactly like
    the stub path. (media_id, kind, width, height, n_samples, feature_mean):
    images report pixel dims + mean pixel value; audio reports
    channels/bits + mean sample value."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_payload_uncompressed(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [r[0] for r in rows],
                    "width": [r[1] for r in rows],
                    "height": [r[2] for r in rows],
                    "n_samples": [r[3] for r in rows],
                    "feature_mean": [r[4] for r in rows],  # raw mean; callers round
                }
            )

    src = media.repartition(partitions, "media_id") if partitions else media
    return src.select("media_id", "payload").mapInPandas(decode, UNCOMP_SCHEMA)


def wrap_pcm_wav(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Frame each row's UTF-8 bytes as a REAL 8-bit mono PCM WAV payload
    (RIFF header per spec) — deterministic audio test data whose decoded
    sample stream is exactly the text's byte values."""

    def wrap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def wav(data: bytes) -> bytes:
            hdr = (
                b"RIFF"
                + struct.pack("<I", 36 + len(data))
                + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
                + b"data"
                + struct.pack("<I", len(data))
            )
            return hdr + data

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": [wav(t.encode("utf-8")) for t in pdf[text_col]],
                }
            )

    return df.select(id_col, text_col).mapInPandas(wrap, "media_id long, payload binary")


def resize_media(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """mapInPandas resize stage → (media_id, payload, width, height).

    STUB transform: deterministic byte down-sampling to width*height bytes
    (a real implementation calls PIL Image.resize in the same loop — the
    Arrow batch shape, output schema, and payload-column handling are what
    this stage actually tests). Output payloads are bounded (w*h bytes), so
    downstream stages shuffle small rows even when inputs are huge."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                step = max(len(b) // target, 1)
                out.append(b[::step][:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": [width] * len(out),
                    "height": [height] * len(out),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        resize, "media_id long, payload binary, width int, height int"
    )


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame-sampling: one row per sampled frame → (media_id,
    frame_idx, frame). Frame count is the stub decoder's deterministic
    n_frames (len % 30 + 1); a real implementation decodes with pyav and
    yields every_n-th frame in the same explode shape. Row count is
    ceil(n_frames / every_n) per video — output-bounded, not payload-bounded."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                n_frames = len(b) % 30 + 1
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * 16 : i * 16 + 16])  # stub frame slice
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select("media_id", "payload").mapInPandas(
        sample, "media_id long, frame_idx int, frame binary"
    )


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — never reads the payload column (column
    pruning keeps the scan narrow)."""
    # avg as exact integer micro-bytes (floor-div), not ROUND-of-double: double
    # rounding is not bit-stable across engines, integer arithmetic is
    return media.groupBy("meta.modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        (F.sum("meta.n_bytes") * F.lit(1000000)).cast("long").alias("_tot_micro"),
    ).select(
        "modality",
        "n_items",
        "total_bytes",
        F.expr("_tot_micro DIV n_items").alias("avg_bytes_micro"),
    )
