"""Multimodal (binary) column plumbing.

Treats image/audio/video payloads as opaque `binary` columns with typed
metadata, processed by Arrow-batched Pandas functions via mapInPandas —
the Spark-side pattern for decode / feature-extract / resize / frame-sample
stages in a training-data pipeline.

Image decode is REAL for real image bytes: PIL full decode when the
library is importable, else pure-stdlib header parsing (PNG IHDR / GIF
LSD / JPEG SOFn) — tested against PNG/GIF/JPEG files synthesized
in-process.  Non-image payloads (and this repo's synthetic text-bytes
blobs) fall back to a clearly-marked deterministic fake.  Real decode
paths, all pure-stdlib-or-PIL: image dimensions (PNG/GIF/JPEG),
animated-GIF frame demux (block walker → true per-frame byte ranges),
and RIFF/WAVE audio (channels / sample rate / PCM frame count).  Only
ffmpeg-class containers (mp4/mkv/mp3/...) keep the stub — the codecs
aren't in this container.  Everything around
the decode — binary schema, metadata struct, mapInPandas batch shape,
partitioning — is real and tested.

Scale notes: binary payloads ride the columnar scan like any other column;
mapInPandas processes whole Arrow batches (no per-row Python), and feature
extraction is embarrassingly parallel — no shuffle at all until a later
aggregate.  For 100 TB of media, set spark.sql.files.maxPartitionBytes so
one batch of blobs fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.registry import query
from emulating_hadoop_with_mpi_spark.sources.tables import load_table

FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes int, byte_sum long, "
    "width int, height int, n_frames int"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media-shaped table from `documents`: payload = utf-8 bytes of
    the text (a deterministic stand-in for image/audio blobs), plus a typed
    metadata struct — the schema a real ingest would carry."""
    docs = load_table(spark, sf_dir, "documents")
    kind = F.when(F.col("doc_id") % 3 == 0, "image/fake").when(
        F.col("doc_id") % 3 == 1, "audio/fake"
    ).otherwise("video/fake")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.length(F.encode("text", "utf-8")).cast("int").alias("n_bytes"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


def _make_decoder():
    """Build the per-payload decoder as a LOCAL function so cloudpickle
    serializes it by value — Python workers must not need this package on
    their import path (the driver may launch Spark from any cwd)."""

    def image_dims(payload: bytes):
        """REAL image decode for actual image bytes: (width, height) or
        None if the payload is not a recognizable image.

        Prefers a full PIL decode when the library is importable; falls
        back to pure-stdlib header parsing (PNG IHDR, GIF logical screen
        descriptor, JPEG SOFn scan) so real images get real dimensions
        even in containers without PIL.  GIF video demux and WAV audio
        have their own real parsers below; only ffmpeg-class containers
        stay stubbed — not installed here."""
        import struct as _struct

        try:  # full decode when available
            import io as _io

            from PIL import Image  # noqa: PLC0415

            try:
                with Image.open(_io.BytesIO(payload)) as im:
                    return int(im.width), int(im.height)
            except Exception:
                return None
        except ImportError:
            pass
        # PNG: 8-byte signature, IHDR payload starts at offset 16
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
            w, h = _struct.unpack(">II", payload[16:24])
            return int(w), int(h)
        # GIF87a/89a: logical screen descriptor at offset 6, little-endian
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w, h = _struct.unpack("<HH", payload[6:10])
            return int(w), int(h)
        # JPEG: walk the marker stream to the first SOFn frame header.
        # Spec details that desync a naive walker (ADVICE r6): 0xFF fill
        # bytes may pad between segments, and standalone markers (TEM
        # 0x01, RSTn 0xD0-0xD7, SOI 0xD8, EOI 0xD9) carry NO length field.
        if payload[:2] == b"\xff\xd8":
            i = 2
            while i + 1 < len(payload):
                if payload[i] != 0xFF:
                    break
                # skip 0xFF fill bytes before the marker code
                while i + 1 < len(payload) and payload[i + 1] == 0xFF:
                    i += 1
                if i + 1 >= len(payload):
                    break
                marker = payload[i + 1]
                if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                    i += 2  # standalone marker, no length field
                    continue
                if i + 9 >= len(payload):
                    break
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = _struct.unpack(">HH", payload[i + 5 : i + 9])
                    return int(w), int(h)
                seg_len = _struct.unpack(">H", payload[i + 2 : i + 4])[0]
                i += 2 + seg_len
            return None
        return None

    def gif_frame_ranges(payload: bytes):
        """REAL container demux for animated GIFs, pure stdlib: walk the
        block stream (extensions / image descriptors / trailer) and return
        one (start, end) byte range per frame — the actual per-frame data,
        not an arithmetic split.  None if the payload isn't a
        structurally-valid GIF."""
        if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
            return None
        n = len(payload)
        i = 6
        flags = payload[i + 4]
        i += 7  # logical screen descriptor
        if flags & 0x80:  # global color table
            i += 3 * (2 << (flags & 0x07))
        ranges = []
        try:
            while i < n:
                b0 = payload[i]
                if b0 == 0x3B:  # trailer
                    break
                if b0 == 0x21:  # extension: introducer, label, sub-blocks
                    i += 2
                    while i < n and payload[i] != 0:
                        i += 1 + payload[i]
                    i += 1
                elif b0 == 0x2C:  # image descriptor = one frame
                    start = i
                    lflags = payload[i + 9]
                    i += 10
                    if lflags & 0x80:  # local color table
                        i += 3 * (2 << (lflags & 0x07))
                    i += 1  # LZW min code size
                    while i < n and payload[i] != 0:
                        i += 1 + payload[i]
                    i += 1
                    ranges.append((start, min(i, n)))
                else:
                    return None  # not a valid block introducer
        except IndexError:
            return None
        return ranges or None

    def wav_info(payload: bytes):
        """REAL audio decode for RIFF/WAVE payloads, pure stdlib: walk the
        chunk list and return (n_channels, sample_rate, n_samples) from
        the fmt/data chunks, or None if the payload isn't a WAV."""
        import struct as _struct

        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        i, n = 12, len(payload)
        channels = rate = bits = data_len = None
        while i + 8 <= n:
            tag = payload[i : i + 4]
            size = _struct.unpack("<I", payload[i + 4 : i + 8])[0]
            if tag == b"fmt " and i + 24 <= n:
                channels, rate = _struct.unpack("<HI", payload[i + 10 : i + 16])
                bits = _struct.unpack("<H", payload[i + 22 : i + 24])[0]
            elif tag == b"data":
                data_len = min(size, n - i - 8)
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if not channels or not rate or not bits or data_len is None:
            return None
        frame = channels * (bits // 8)
        return int(channels), int(rate), int(data_len // frame) if frame else 0

    def decode_media(payload: bytes, kind: str) -> dict:
        """Decode one media payload into features.

        Image payloads that are REAL images (PNG/GIF/JPEG) get their true
        decoded dimensions via ``image_dims``.  Anything else — including
        this repo's synthetic text-bytes payloads — takes the clearly
        marked DETERMINISTIC FAKE: features derived arithmetically from
        the bytes, stable across runs/partitions, so the pipeline shape
        stays testable without media libraries (audio/video demux is not
        available in this container)."""
        import numpy as _np

        arr = _np.frombuffer(payload, dtype=_np.uint8)
        n = int(arr.size)
        byte_sum = int(arr.sum(dtype=_np.int64))
        dims = image_dims(payload) if kind.startswith("image/") else None
        if dims is not None:
            width, height = dims
        else:  # deterministic fake
            width = (byte_sum % 640) + 1
            height = (n % 480) + 1
        if kind.startswith("video/"):
            ranges = gif_frame_ranges(payload)  # real demux for animated GIFs
            n_frames = len(ranges) if ranges else (byte_sum % 24) + 1
        elif kind.startswith("audio/"):
            wav = wav_info(payload)  # real decode for RIFF/WAVE payloads
            n_frames = wav[2] if wav else 1  # PCM sample frames
        else:
            n_frames = 1
        return {
            "n_bytes": n,
            "byte_sum": byte_sum,
            "width": width,
            "height": height,
            "n_frames": n_frames,
        }

    decode_media.image_dims = image_dims  # expose for direct testing
    decode_media.gif_frame_ranges = gif_frame_ranges
    decode_media.wav_info = wav_info
    return decode_media


# Public alias for tests / direct use.
decode_media = _make_decoder()


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload, meta)."""
    decode = _make_decoder()  # local copy → pickled by value, import-free

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            feats = [decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            out = _pd.DataFrame(feats)
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[
                ["doc_id", "kind", "n_bytes", "byte_sum", "width", "height", "n_frames"]
            ]

    flat = df.select("doc_id", "payload", F.col("meta.kind").alias("kind"))
    return flat.mapInPandas(run, schema=FEATURE_SCHEMA)


@query(
    "q78_multimodal_features",
    # The decode stub's arithmetic is reproducible in SQL because the
    # synthetic payloads are ASCII (byte value == codepoint).  A real
    # image decode would be rows-only.
    oracle="""
    WITH feats AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/fake'
                    WHEN doc_id % 3 = 1 THEN 'audio/fake'
                    ELSE 'video/fake' END AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(list_filter(string_split(text, ''), c -> c != ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                   (a, b) -> a + b) AS byte_sum
        FROM documents
    )
    SELECT kind,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(byte_sum) AS BIGINT) AS total_byte_sum,
           CAST(MAX(byte_sum % 640 + 1) AS INT) AS max_width,
           CAST(MAX(n_bytes % 480 + 1) AS INT) AS max_height,
           CAST(MAX(CASE WHEN kind = 'video/fake' THEN byte_sum % 24 + 1 ELSE 1 END) AS INT)
               AS max_frames
    FROM feats
    GROUP BY kind
    ORDER BY kind
    """,
)
def q78_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: blob + typed metadata → Arrow-batched
    mapInPandas decode (stubbed deterministically) → per-kind feature
    aggregate."""
    feats = extract_features(media_table(spark, sf_dir))
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("byte_sum").alias("total_byte_sum"),
            F.max("width").alias("max_width"),
            F.max("height").alias("max_height"),
            F.max("n_frames").alias("max_frames"),
        )
        .orderBy("kind")
    )


RESIZED_SCHEMA = "doc_id long, kind string, payload binary, width int, height int"


def resize_media(df: DataFrame, width: int = 32, height: int = 24) -> DataFrame:
    """Resize stage: (doc_id, payload, meta) → fixed-size payloads.

    Real pixel decode is stubbed (no PIL in this container): the payload is
    treated as a 1-D uint8 sample vector and resampled to width*height
    bytes by deterministic nearest-neighbor indexing — the exact Spark
    plumbing (Arrow batches in, binary column out, fixed output schema) a
    real `Image.resize` stage would use, with the same batch shape.

    Scale: embarrassingly parallel mapInPandas, no shuffle; output size is
    bounded at width*height bytes per row regardless of input blob size —
    the property that makes downstream batches memory-safe at 100 TB.
    """
    target = int(width) * int(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out_payloads = []
            for p in pdf["payload"]:
                arr = _np.frombuffer(p, dtype=_np.uint8)
                if arr.size == 0:
                    out_payloads.append(bytes(target))
                    continue
                # nearest-neighbor resample to exactly `target` samples
                idx = (_np.arange(target) * arr.size) // target
                out_payloads.append(arr[idx].tobytes())
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": pdf["kind"].values,
                    "payload": out_payloads,
                    "width": width,
                    "height": height,
                }
            )

    flat = df.select("doc_id", "payload", F.col("meta.kind").alias("kind"))
    return flat.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, n_frames int, frame binary"


def sample_frames(df: DataFrame, every: int = 4) -> DataFrame:
    """Frame-sampling stage (video payloads): one row in → every `every`-th
    frame out (a one-to-many mapInPandas, the UDTF shape).

    Animated-GIF payloads get REAL container demuxing (the pure-stdlib
    block walker in ``gif_frame_ranges``): each emitted frame is that
    frame's actual image-descriptor byte range.  Other containers
    (mp4/mkv/...) still take the documented stub — the payload split into
    the n_frames equal chunks the decode stub reports (ffmpeg absent
    here).  Partitioning, explode shape, and binary frame payloads are
    real in both paths.
    """
    decode = _make_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            doc_ids, idxs, totals, frames = [], [], [], []
            for doc_id, payload, kind in zip(pdf["doc_id"], pdf["payload"], pdf["kind"]):
                if not kind.startswith("video/"):
                    continue
                ranges = decode.gif_frame_ranges(payload)
                if ranges:  # real demux
                    n_frames = len(ranges)
                    for f in range(0, n_frames, every):
                        s, e = ranges[f]
                        doc_ids.append(doc_id)
                        idxs.append(f)
                        totals.append(n_frames)
                        frames.append(bytes(payload[s:e]))
                    continue
                n_frames = decode(payload, kind)["n_frames"]
                arr = _np.frombuffer(payload, dtype=_np.uint8)
                bounds = [(arr.size * f) // n_frames for f in range(n_frames + 1)]
                for f in range(0, n_frames, every):
                    doc_ids.append(doc_id)
                    idxs.append(f)
                    totals.append(n_frames)
                    frames.append(arr[bounds[f] : bounds[f + 1]].tobytes())
            yield _pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": idxs, "n_frames": totals, "frame": frames}
            )

    flat = df.select("doc_id", "payload", F.col("meta.kind").alias("kind"))
    return flat.mapInPandas(run, schema=FRAMES_SCHEMA)
