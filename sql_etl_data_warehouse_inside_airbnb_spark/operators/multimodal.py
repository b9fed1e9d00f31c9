"""Multimodal column plumbing (SURVEY §7.5).

Pattern: media payloads are opaque ``binary`` columns (or pointers to
blob storage) carried next to typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the Python worker sees columnar batches, not
rows.

Header/container-level decode is REAL for all three modalities, in
pure Python (no codec library), each run as a mapInPandas stage:
``image_dimensions`` parses PNG IHDR / JPEG SOFn / GIF descriptors,
``wav_metadata`` walks RIFF/WAVE chunks (rate/channels/bits/duration),
``mp4_metadata`` walks the ISO box tree to moov/mvhd (timescale/
duration). Pixel/sample-level kernels (full decode / resize) need
codecs (PIL/ffmpeg/torchaudio) NOT in this container, so those remain
stubs: ``decode_image_stub`` / ``resize_stub`` raise
``NotImplementedError`` unless ``fake=True`` (deterministic
stand-in). Everything around the kernels — schema, batch iteration,
partitioning contract — is real and tested.

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


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def image_dimensions(payload: bytes | None):
    """REAL image decode (no codec library needed): parse the container
    header of a PNG / JPEG / GIF payload and return
    ``(format, width, height)``, or None when the payload is not a
    recognized image. Pure-Python byte parsing of the public file
    formats — PNG IHDR (big-endian, RFC 2083 §11.2.2), JPEG SOFn
    segment scan (ITU T.81 §B.2.2), GIF logical screen descriptor
    (little-endian, GIF89a spec §18)."""
    if payload is None or len(payload) < 10:
        return None
    if payload[:8] == PNG_SIG and len(payload) >= 24 \
            and payload[12:16] == b"IHDR":
        return ("png",
                int.from_bytes(payload[16:20], "big"),
                int.from_bytes(payload[20:24], "big"))
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return ("gif",
                int.from_bytes(payload[6:8], "little"),
                int.from_bytes(payload[8:10], "little"))
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:
                i += 1          # fill byte: next FF may start the marker
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2          # standalone markers carry no length
                continue
            if marker == 0xD9:  # EOI
                break
            seglen = int.from_bytes(payload[i + 2:i + 4], "big")
            if seglen < 2:
                break
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return ("jpeg",
                        int.from_bytes(payload[i + 7:i + 9], "big"),
                        int.from_bytes(payload[i + 5:i + 7], "big"))
            i += 2 + seglen
    return None


def png_bytes(width: int, height: int) -> bytes:
    """Minimal real PNG header: signature + IHDR chunk (8-bit RGB) with
    a correct CRC. 33 bytes; enough for any header-reading decoder."""
    import struct
    import zlib

    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    return (PNG_SIG + struct.pack(">I", 13) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))


def jpeg_bytes(width: int, height: int) -> bytes:
    """Minimal real JPEG: SOI + SOF0 (baseline, 3 components) + EOI.
    23 bytes."""
    import struct

    sof = (struct.pack(">BBHBHHB", 0xFF, 0xC0, 17, 8, height, width, 3)
           + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01")
    return b"\xff\xd8" + sof + b"\xff\xd9"


def gif_bytes(width: int, height: int) -> bytes:
    """Minimal real GIF89a logical screen descriptor. 13 bytes."""
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"


def wav_bytes(sample_rate: int, channels: int, bits: int,
              n_samples: int) -> bytes:
    """Minimal real RIFF/WAVE PCM header (44 bytes, canonical layout):
    fmt chunk with the given parameters and a data chunk size declared
    for ``n_samples`` frames (payload omitted — header-only, like the
    image builders)."""
    import struct

    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    return (b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                    sample_rate, byte_rate, block_align,
                                    bits)
            + b"data" + struct.pack("<I", data_size))


def wav_metadata(payload: bytes | None):
    """REAL audio decode (header-level): parse a RIFF/WAVE payload's
    fmt and data chunks and return (sample_rate, channels, bits,
    duration_ms), or None when not a WAV. Walks the chunk list per the
    RIFF spec (chunk id + little-endian size), so fmt/data need not be
    at fixed offsets; duration is exact integer arithmetic."""
    import struct

    if payload is None or len(payload) < 36 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data_size = None
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        size = struct.unpack("<I", payload[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 8 + 16 <= len(payload):
            _, channels, rate, byte_rate, _, bits = struct.unpack(
                "<HHIIHH", payload[i + 8:i + 24])
            fmt = (rate, channels, bits, byte_rate)
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)      # chunks are word-aligned
    if fmt is None or data_size is None or fmt[3] == 0:
        return None
    rate, channels, bits, byte_rate = fmt
    return (rate, channels, bits, data_size * 1000 // byte_rate)


def mp4_bytes(timescale: int, duration: int) -> bytes:
    """Minimal real MP4: ftyp box + moov box containing a version-0
    mvhd with the given timescale/duration (ISO 14496-12 layout)."""
    import struct

    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    mvhd_body = (b"\x00\x00\x00\x00"          # version 0 + flags
                 + struct.pack(">II", 0, 0)   # creation/modification
                 + struct.pack(">II", timescale, duration)
                 + b"\x00" * 80)              # rate..next_track_id
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


def mp4_metadata(payload: bytes | None):
    """REAL video decode (container-level): walk the top-level MP4 box
    list, find moov/mvhd, return (timescale, duration_ms). Handles
    mvhd version 0 (32-bit) and version 1 (64-bit) fields, plus the
    two ISO 14496-12 §4.2 size escapes: size==1 (64-bit largesize
    follows the type) and size==0 (box extends to end of enclosing
    container). None when the payload is not an MP4 container."""
    import struct

    if payload is None or len(payload) < 16 or payload[4:8] != b"ftyp":
        return None

    def walk(buf, start, end):
        i = start
        while i + 8 <= end:
            size = struct.unpack(">I", buf[i:i + 4])[0]
            btype = buf[i + 4:i + 8]
            hdr = 8
            if size == 1:               # 64-bit largesize escape
                if i + 16 > end:
                    return None
                size = struct.unpack(">Q", buf[i + 8:i + 16])[0]
                hdr = 16
            elif size == 0:             # box runs to end of container
                size = end - i
            if size < hdr:
                return None
            if btype == b"moov":
                return walk(buf, i + hdr, min(i + size, end))
            if btype == b"mvhd":
                body = i + hdr                # version+flags start here
                ver = buf[body]
                if ver == 0 and body + 20 <= end:
                    ts, dur = struct.unpack(">II", buf[body + 12:body + 20])
                    return (ts, dur)
                if ver == 1 and body + 32 <= end:
                    ts = struct.unpack(">I", buf[body + 20:body + 24])[0]
                    dur = struct.unpack(">Q", buf[body + 24:body + 32])[0]
                    return (ts, dur)
                return None
            i += size
        return None

    found = walk(payload, 0, len(payload))
    if not found or found[0] == 0:
        return None
    ts, dur = found
    return (ts, dur * 1000 // ts)


AUDIO_META_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("sample_rate", LongType(), True),
    StructField("channels", LongType(), True),
    StructField("bits", LongType(), True),
    StructField("duration_ms", LongType(), True),
])


def extract_audio_meta(media: DataFrame) -> DataFrame:
    """mapInPandas stage running the REAL WAV header decode
    (:func:`wav_metadata`) — the audio twin of extract_image_meta."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rates, chans, bits, durs = [], [], [], []
            for p in pdf["payload"]:
                meta = wav_metadata(p)
                rates.append(meta[0] if meta else None)
                chans.append(meta[1] if meta else None)
                bits.append(meta[2] if meta else None)
                durs.append(meta[3] if meta else None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "sample_rate": pd.array(rates, dtype="Int64"),
                "channels": pd.array(chans, dtype="Int64"),
                "bits": pd.array(bits, dtype="Int64"),
                "duration_ms": pd.array(durs, dtype="Int64"),
            })

    return media.mapInPandas(run, schema=AUDIO_META_SCHEMA)


IMAGE_META_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("format", StringType(), True),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("n_bytes", LongType(), True),
])


def extract_image_meta(media: DataFrame) -> DataFrame:
    """mapInPandas stage running the REAL header decode
    (:func:`image_dimensions`) over the binary payload column —
    substance for the multimodal column, not a stub. Unrecognized
    payloads yield NULL format/width/height (null-on-failure, the
    try_cast spine)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            fmts, ws, hs, sizes = [], [], [], []
            for p in pdf["payload"]:
                dims = image_dimensions(p)
                fmts.append(dims[0] if dims else None)
                ws.append(dims[1] if dims else None)
                hs.append(dims[2] if dims else None)
                sizes.append(len(p) if p is not None else 0)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "format": fmts,
                "width": pd.array(ws, dtype="Int64"),
                "height": pd.array(hs, dtype="Int64"),
                "n_bytes": pd.array(sizes, dtype="Int64"),
            })

    return media.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def build_image_payloads(df: DataFrame, id_col: str = "media_id",
                         width_col: str = "width",
                         height_col: str = "height") -> DataFrame:
    """Ingest-side twin of :func:`extract_image_meta`: synthesize a
    REAL image payload (PNG/JPEG/GIF header bytes, format chosen by
    id % 3) per row. Stands in for reading blobs from object storage;
    the bytes are valid container headers, so the decode side
    exercises the same parsing a full image would."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        builders = [png_bytes, jpeg_bytes, gif_bytes]
        for pdf in batches:
            payloads = [builders[int(i) % 3](int(w), int(h))
                        for i, w, h in zip(pdf[id_col], pdf[width_col],
                                           pdf[height_col])]
            yield pd.DataFrame({"media_id": pdf[id_col],
                                "payload": payloads})

    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
    ])
    return df.mapInPandas(run, schema=schema)


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


def build_wav_payloads(dims: DataFrame) -> DataFrame:
    """mapInPandas stage synthesizing one REAL RIFF/WAVE payload per
    row of ``dims`` (media_id, rate, channels, n_samples) — the audio
    twin of build_image_payloads, kept here so all payload builders
    live at one altitude and share unit tests."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [wav_bytes(int(r), int(c), 16, int(ns))
                        for r, c, ns in zip(pdf["rate"], pdf["channels"],
                                            pdf["n_samples"])]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "payload": payloads})

    schema = StructType([StructField("media_id", LongType(), False),
                         StructField("payload", BinaryType(), True)])
    return dims.mapInPandas(run, schema=schema)


def extract_video_meta(dims: DataFrame) -> DataFrame:
    """mapInPandas stage synthesizing a REAL MP4 container per row of
    ``dims`` (media_id, ts, dur) and decoding it back through
    :func:`mp4_metadata` — the video twin of extract_image_meta.
    Nullable Int64 arrays carry decode failures as NULLs (the
    null-on-failure spine)."""
    from pyspark.sql.types import LongType, StructField, StructType

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            tss, durs = [], []
            for ts, dur in zip(pdf["ts"], pdf["dur"]):
                meta = mp4_metadata(mp4_bytes(int(ts), int(dur)))
                tss.append(meta[0] if meta else None)
                durs.append(meta[1] if meta else None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "timescale": pd.array(tss, dtype="Int64"),
                "duration_ms": pd.array(durs, dtype="Int64"),
            })

    schema = StructType([StructField("media_id", LongType(), False),
                         StructField("timescale", LongType(), True),
                         StructField("duration_ms", LongType(), True)])
    return dims.mapInPandas(run, schema=schema)
