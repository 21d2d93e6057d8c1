"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.11).

Media payloads are opaque `binary` columns with a typed metadata struct;
decode / feature-extract run as Arrow-batched `mapInPandas` stages. The
container has no image/audio libraries, so the actual decoders are STUBBED:
`decode_media` computes deterministic fake features from the bytes (marked
clearly below), and `decode_media_real` raises NotImplementedError at the
exact point a real decoder (PIL / torchaudio / pyav) would be called. The
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch shape
— is real and tested.

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
    """Real decoder entry point — requires PIL/torchaudio, absent here."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "media decoding requires an image/audio library (e.g. PIL, "
            "torchaudio) which is not available in this container; "
            "see decode_media() for the stubbed deterministic pipeline"
        )
        yield  # pragma: no cover

    return media.select("media_id", "payload").mapInPandas(decode, FEATURE_SCHEMA)


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
