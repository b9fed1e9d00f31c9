"""Multimodal column plumbing (SURVEY §7.5).

Pattern: media payloads are opaque ``binary`` columns (or pointers to
blob storage) carried next to typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the Python worker sees columnar batches, not
rows.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are stubs: ``decode_image_stub`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces
a deterministic fake feature vector from the payload bytes. Everything
around the kernel — schema, batch iteration, partitioning contract —
is real and tested.

Scale notes: payloads dominate bytes, so (a) never shuffle the binary
column — project it away before joins/aggs and re-attach by key;
(b) size partitions by bytes not rows (``maxPartitionBytes``); (c) at
100 TB payloads live in object storage and the column holds URIs; the
same mapInPandas stage fetches instead of decodes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), True),        # image|audio|video
    StructField("payload", BinaryType(), True),     # opaque bytes / URI
    StructField("meta_width", LongType(), True),
    StructField("meta_height", LongType(), True),
    StructField("meta_duration_ms", LongType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("features", ArrayType(FloatType()), True),
])


def attach_payload(df: DataFrame, id_col: str, text_col: str,
                   kind: str = "image") -> DataFrame:
    """Demo adapter: wrap any table into the media shape, payload =
    utf-8 bytes of a text column (stands in for real media bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(None).cast("long").alias("meta_width"),
        F.lit(None).cast("long").alias("meta_height"),
        F.lit(None).cast("long").alias("meta_duration_ms"),
    )


def decode_image_stub(payload: bytes, fake: bool = False) -> list[float]:
    """Decode kernel stub. Real implementation needs an image codec
    (PIL / libjpeg) which is not installed here."""
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library not present in this "
            "environment; pass fake=True for the deterministic stand-in")
    # deterministic fake: 8 byte-histogram buckets, normalized
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    total = max(len(payload), 1)
    return [round(c / total, 6) for c in buckets]


def extract_features(media: DataFrame, fake: bool = True,
                     batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction: binary payload → fixed-width
    float vector + byte count. Arrow moves whole columnar batches to
    the Python worker; the kernel loops a batch, not the dataset."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decode_image_stub(p, fake=fake) if p is not None else None
                     for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf["payload"]],
                "features": feats,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_index", LongType(), True),
    StructField("frame_bytes", BinaryType(), True),
])


def frame_sample(media: DataFrame, frame_size: int = 64,
                 every_n: int = 4) -> DataFrame:
    """Video frame sampling as a 1→N mapInPandas stage: each payload is
    chunked into ``frame_size``-byte pseudo-frames and every
    ``every_n``-th frame is emitted as its own row (a real codec would
    seek keyframes; the chunking stands in for decode+seek). The
    output is a row-exploding batch transform — the shape a real
    ffmpeg-backed sampler needs."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n = max((len(payload) + frame_size - 1) // frame_size, 0)
                for i in range(0, n, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(
                        payload[i * frame_size:(i + 1) * frame_size]))
            yield pd.DataFrame({"media_id": ids, "frame_index": idxs,
                                "frame_bytes": frames})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(payload: bytes, width: int, height: int,
                fake: bool = False) -> bytes:
    """Resize kernel stub — needs an image codec not present here."""
    if not fake:
        raise NotImplementedError(
            "image resize requires a codec library not present in this "
            "environment; pass fake=True for the deterministic stand-in")
    # deterministic fake: tile/truncate payload to width*height bytes
    target = max(width * height, 1)
    reps = (target + max(len(payload), 1) - 1) // max(len(payload), 1)
    return (payload * reps)[:target]
