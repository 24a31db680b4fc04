"""Real-image decode tests: PNG/GIF/JPEG files are synthesized IN-PROCESS
(pure stdlib — zlib + struct; no PIL required to build them) and must come
back from ``decode_media`` with their true pixel dimensions, both directly
and through the full Spark mapInPandas pipeline.  Non-image bytes keep the
deterministic fake."""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.functions.multimodal import (
    FEATURE_SCHEMA,
    decode_media,
    extract_features,
)


def make_png(width: int, height: int) -> bytes:
    """Minimal valid grayscale PNG, built from spec primitives."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    # each scanline: filter byte 0 + `width` gray pixels
    raw = b"".join(b"\x00" + bytes((x * 7 + y) % 256 for x in range(width)) for y in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """Minimal GIF89a: header + logical screen descriptor (no frames needed
    for dimension decode)."""
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + b"\x00\x00\x00"  # flags, bg color, aspect
        + b"\x3b"  # trailer
    )


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG marker stream through SOF0 (enough for header decode;
    not a renderable image, but dimension-wise spec-valid)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", height, width) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_png_dims_decoded():
    assert decode_media(make_png(17, 9), "image/png")[
        "width"
    ] == 17 and decode_media(make_png(17, 9), "image/png")["height"] == 9


def test_gif_dims_decoded():
    feats = decode_media(make_gif(33, 21), "image/gif")
    assert (feats["width"], feats["height"]) == (33, 21)


def test_jpeg_dims_decoded():
    feats = decode_media(make_jpeg(64, 48), "image/jpeg")
    assert (feats["width"], feats["height"]) == (64, 48)


def make_tricky_jpeg(width: int, height: int) -> bytes:
    """Spec-valid-but-awkward JPEG marker stream (ADVICE r6): a standalone
    TEM marker (0x01, no length field), a 0xFF fill byte padding the next
    marker, a DRI segment, and a standalone RST0 — all before SOF0.  A
    walker that assumes every marker carries a 2-byte length desyncs on
    this and falls back to fake dimensions."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 8)
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", height, width) + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + b"\xff\x01" + b"\xff" + app0 + dri + b"\xff\xd0" + sof0 + b"\xff\xd9"


def test_jpeg_standalone_markers_and_fill_bytes():
    feats = decode_media(make_tricky_jpeg(80, 25), "image/jpeg")
    assert (feats["width"], feats["height"]) == (80, 25)


def test_non_image_bytes_fall_back_to_fake():
    payload = b"just some text, not an image"
    feats = decode_media(payload, "image/fake")
    assert feats["width"] == (sum(payload) % 640) + 1
    assert feats["height"] == (len(payload) % 480) + 1


def test_audio_kind_never_image_decoded():
    # a PNG payload tagged audio must NOT take the image path
    payload = make_png(5, 5)
    feats = decode_media(payload, "audio/fake")
    assert feats["width"] == (sum(payload) % 640) + 1


def test_real_png_through_spark_pipeline(spark):
    """End-to-end: real PNG bytes ride the binary column through Arrow
    mapInPandas and come out with true dimensions."""
    rows = [
        (1, make_png(17, 9), ("image/png", 0, "test")),
        (2, make_gif(33, 21), ("image/gif", 0, "test")),
        (3, b"plain text payload", ("image/fake", 0, "test")),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, meta struct<kind:string,n_bytes:int,source:string>"
    )
    out = {r.doc_id: r for r in extract_features(df).collect()}
    assert (out[1].width, out[1].height) == (17, 9)
    assert (out[2].width, out[2].height) == (33, 21)
    fake = decode_media(b"plain text payload", "image/fake")
    assert (out[3].width, out[3].height) == (fake["width"], fake["height"])
    assert "width int" in FEATURE_SCHEMA


def make_multiframe_gif(width: int, height: int, n_frames: int) -> bytes:
    """Structurally-valid animated GIF89a: graphic-control extension +
    image descriptor + minimal LZW data sub-blocks per frame."""
    head = b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"
    body = b""
    for k in range(n_frames):
        gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        imgdesc = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        lzw = b"\x02" + bytes([3, 0x4C, 0x01, k % 256]) + b"\x00"
        body += gce + imgdesc + lzw
    return head + body + b"\x3b"


def test_gif_demux_frame_ranges():
    """The stdlib GIF walker finds the true per-frame byte ranges."""
    gif = make_multiframe_gif(11, 7, 5)
    ranges = decode_media.gif_frame_ranges(gif)
    assert len(ranges) == 5
    # every range starts at an image descriptor and ranges are disjoint
    for (s, e), (s2, _) in zip(ranges, ranges[1:] + [(len(gif), None)]):
        assert gif[s] == 0x2C and s < e <= s2
    assert decode_media(gif, "video/gif")["n_frames"] == 5


def test_gif_demux_through_sample_frames(spark):
    """End-to-end: a real animated GIF rides the binary column through
    mapInPandas and comes out as its actual per-frame byte slices."""
    from emulating_hadoop_with_mpi_spark.functions.multimodal import sample_frames

    gif = make_multiframe_gif(11, 7, 6)
    stub = b"not a gif, arithmetic split stands in"
    df = spark.createDataFrame(
        [(1, gif, ("video/gif", 0, "t")), (2, stub, ("video/fake", 0, "t"))],
        "doc_id long, payload binary, meta struct<kind:string,n_bytes:int,source:string>",
    )
    rows = sample_frames(df, every=2).collect()
    real = sorted((r.frame_idx, bytes(r.frame)) for r in rows if r.doc_id == 1)
    ranges = decode_media.gif_frame_ranges(gif)
    assert [i for i, _ in real] == [0, 2, 4]
    assert all(f == gif[ranges[i][0] : ranges[i][1]] for i, f in real)
    assert all(r.n_frames == 6 for r in rows if r.doc_id == 1)
    # the non-GIF payload still takes the documented arithmetic stub
    fake_n = decode_media(stub, "video/fake")["n_frames"]
    assert {r.frame_idx for r in rows if r.doc_id == 2} == set(range(0, fake_n, 2))


def make_wav(n_samples: int, rate: int = 8000, channels: int = 1) -> bytes:
    """Real RIFF/WAVE bytes via the stdlib wave module (16-bit PCM)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(struct.pack("<h", (i * 37) % 2000 - 1000) for i in range(n_samples * channels))
        )
    return buf.getvalue()


def test_wav_decoded_for_audio_payloads():
    wav = make_wav(123, rate=8000, channels=2)
    assert decode_media.wav_info(wav) == (2, 8000, 123)
    feats = decode_media(wav, "audio/wav")
    assert feats["n_frames"] == 123
    # non-WAV audio payloads keep the stub's n_frames == 1
    assert decode_media(b"not audio", "audio/fake")["n_frames"] == 1


def test_wav_through_spark_pipeline(spark):
    wav = make_wav(77)
    df = spark.createDataFrame(
        [(1, wav, ("audio/wav", 0, "t"))],
        "doc_id long, payload binary, meta struct<kind:string,n_bytes:int,source:string>",
    )
    out = extract_features(df).collect()[0]
    assert out.n_frames == 77


def test_gif_demux_agrees_with_pil_when_available():
    import pytest

    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL not installed")
    import io

    gif = make_multiframe_gif(11, 7, 4)
    assert getattr(Image.open(io.BytesIO(gif)), "n_frames", 1) == len(
        decode_media.gif_frame_ranges(gif)
    )


def test_decoders_never_raise_on_arbitrary_bytes():
    """Operational property for 100 TB ingest: a corrupt/truncated blob
    must yield the deterministic fake (or None from the parsers), never an
    exception that kills the executor task.  Fuzz with arbitrary bytes
    plus adversarial truncations of every valid container."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    valid = [
        make_png(9, 5),
        make_gif(7, 3),
        make_jpeg(16, 8),
        make_tricky_jpeg(10, 10),
        make_multiframe_gif(6, 4, 3),
        make_wav(40),
    ]

    @settings(max_examples=300, deadline=None)
    @given(st.binary(min_size=0, max_size=256), st.sampled_from(["image/x", "audio/x", "video/x"]))
    def fuzz(payload, kind):
        feats = decode_media(payload, kind)
        assert feats["n_bytes"] == len(payload)

    fuzz()

    for v in valid:
        for cut in (0, 1, 2, 5, 9, len(v) // 2, len(v) - 1):
            for kind in ("image/x", "audio/x", "video/x"):
                feats = decode_media(v[:cut], kind)
                assert feats["n_bytes"] == cut
    # flipped bytes inside otherwise-valid containers
    for v in valid:
        for pos in (3, 8, 12, min(20, len(v) - 1)):
            mutated = v[:pos] + bytes([v[pos] ^ 0xFF]) + v[pos + 1 :]
            for kind in ("image/x", "audio/x", "video/x"):
                decode_media(mutated, kind)  # must not raise


def test_pil_path_when_available():
    """When PIL is importable the full decode must agree with the header
    parse (skipped in containers without PIL)."""
    import pytest

    try:
        import PIL  # noqa: F401
    except ImportError:
        pytest.skip("PIL not installed")
    assert decode_media.image_dims(make_png(17, 9)) == (17, 9)
