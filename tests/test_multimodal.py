"""Multimodal-column plumbing: schema, Arrow batching, plan shape, stub seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from etl_earthquake_gcp_spark.multimodal import (
    attach_media,
    decode_media,
    frame_sample,
)
from etl_earthquake_gcp_spark.multimodal.media import _real_decode_image
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    return attach_media(load_table(spark, SF_DIR, "documents")).cache()


def test_media_schema(media):
    assert isinstance(media.schema["content"].dataType, BinaryType)
    meta = {f.name: f.dataType.simpleString() for f in media.schema["meta"].dataType}
    assert meta == {"format": "string", "n_bytes": "bigint"}
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_payload_matches_meta(media):
    bad = media.filter(F.octet_length("content") != F.col("meta.n_bytes")).count()
    assert bad == 0


def test_decode_roundtrip_exact(media, spark):
    """Fake decode over Arrow must reproduce JVM-computable byte math."""
    decoded = decode_media(media)
    jvm = media.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes_jvm"),
        F.aggregate(
            # byte values of the ASCII payload, summed JVM-side
            F.transform(F.split(F.decode("content", "UTF-8"), ""), F.ascii),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("checksum_jvm"),
    )
    diff = (
        decoded.join(jvm, "doc_id")
        .filter(
            (F.col("n_bytes") != F.col("n_bytes_jvm"))
            | (F.col("checksum") != F.col("checksum_jvm"))
        )
        .count()
    )
    assert diff == 0


def test_decode_image_geometry(media):
    rows = decode_media(media).filter(F.col("media_type") == "image").collect()
    assert rows
    for r in rows:
        assert r.width**2 <= r.n_bytes < (r.width + 1) ** 2
        assert r.width * r.height >= r.n_bytes > r.width * (r.height - 1)
        assert r.duration_ms is None and r.n_channels == 3


def test_decode_audio_video(media):
    rows = decode_media(media).filter(F.col("media_type") != "image").collect()
    assert rows
    for r in rows:
        assert r.width is None and r.height is None
        assert r.duration_ms == (1000 * r.n_bytes) // 16_000
        assert r.n_channels == (1 if r.media_type == "audio" else 3)


def test_decode_introduces_no_shuffle(media):
    plan = decode_media(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_frame_sample_generator_shape(media):
    frames = frame_sample(media, chunk_bytes=64, stride=4)
    pdf = frames.toPandas()
    assert (pdf["frame_idx"] % 4 == 0).all()
    assert (pdf["frame_len"] > 0).all() and (pdf["frame_len"] <= 64).all()
    # every video doc contributes ≥1 frame; non-video docs contribute none
    n_video = media.filter(F.col("media_type") == "video").count()
    assert pdf["doc_id"].nunique() == n_video


def test_frame_sample_filters_before_python(media):
    """media_type filter must sit below the Arrow eval in the physical plan."""
    plan = frame_sample(media)._jdf.queryExecution().executedPlan().toString()
    python_at = plan.find("ArrowEvalPython") if "ArrowEvalPython" in plan else plan.find("MapInPandas")
    filter_at = plan.find("video")
    assert filter_at > python_at >= 0, plan


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError, match="pillow"):
        _real_decode_image(b"\x89PNG")


# ---------------------------------------------------------------------------
# REAL PPM codec path
# ---------------------------------------------------------------------------


def _ppm_bytes(width, height, pixels, header=None):
    return (header or f"P6\n{width} {height}\n255\n").encode() + bytes(pixels)


def test_decode_ppm_parses_minimal_image():
    from etl_earthquake_gcp_spark.multimodal import decode_ppm

    # 2x1 image: pixels (10,20,30) and (40,50,60)
    out = decode_ppm(_ppm_bytes(2, 1, [10, 20, 30, 40, 50, 60]))
    assert (out["width"], out["height"], out["maxval"]) == (2, 1, 255)
    assert out["pixel_checksum"] == 210
    assert out["mean_r_milli"] == (1000 * (10 + 40)) // 2
    assert out["mean_g_milli"] == (1000 * (20 + 50)) // 2
    assert out["mean_b_milli"] == (1000 * (30 + 60)) // 2


def test_decode_ppm_handles_comments_and_whitespace():
    from etl_earthquake_gcp_spark.multimodal import decode_ppm

    raw = b"P6 # magic\n# a comment line\n 1\t1 # dims\n255\n\x01\x02\x03"
    out = decode_ppm(raw)
    assert (out["width"], out["height"]) == (1, 1)
    assert out["pixel_checksum"] == 6


@pytest.mark.parametrize(
    "payload",
    [
        b"P5\n1 1\n255\n\x00",  # wrong magic (greyscale PGM)
        b"P6\n1 1\n255\n\x00\x00",  # raster too short
        b"P6\n1 1\n255\n\x00\x00\x00\x00",  # raster too long
        b"P6\nx 1\n255\n\x00\x00\x00",  # non-integer width
        b"P6\n1 1\n70000\n\x00\x00\x00",  # maxval out of range
    ],
)
def test_decode_ppm_rejects_malformed(payload):
    from etl_earthquake_gcp_spark.multimodal import decode_ppm

    with pytest.raises(ValueError):
        decode_ppm(payload)


def test_ppm_roundtrip_spark(spark):
    """attach_ppm payloads are genuine PPM files; decode_ppm_media recovers
    dimensions and channel stats that match a pure-Python recompute."""
    from etl_earthquake_gcp_spark.multimodal import (
        attach_ppm,
        decode_ppm,
        decode_ppm_media,
    )

    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "x" * 100)], "doc_id long, text string"
    )
    media = attach_ppm(docs)
    # the payload really is a parseable PPM file
    for r in media.collect():
        parsed = decode_ppm(bytes(r.content))
        assert parsed["width"] == 16
    out = {r.doc_id: r for r in decode_ppm_media(media).collect()}
    # doc 1: 8 bytes -> 1 row of 48 (padded), checksum = sum of 'abcdefgh'
    assert out[1].height == 1
    assert out[1].pixel_checksum == sum(b"abcdefgh")
    # doc 2: 100 bytes -> ceil(100/48) = 3 rows
    assert out[2].height == 3
    assert out[2].pixel_checksum == 100 * ord("x")


def test_ppm_decode_introduces_no_shuffle(spark):
    from etl_earthquake_gcp_spark.multimodal import attach_ppm, decode_ppm_media

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = (
        decode_ppm_media(attach_ppm(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# REAL PNG codec path (r15 verdict #4: the codec seam closed with stdlib
# zlib — encoder + full five-filter decoder, no external library)
# ---------------------------------------------------------------------------


def test_decode_png_roundtrip_minimal():
    from etl_earthquake_gcp_spark.multimodal import decode_png, encode_png

    out = decode_png(encode_png(b"abcdefgh"))
    assert (out["width"], out["height"]) == (16, 1)
    assert (out["bit_depth"], out["color_type"], out["n_chunks"]) == (8, 2, 3)
    assert out["pixel_checksum"] == sum(b"abcdefgh")
    # padded raster: 16 pixels, channel sums over every 3rd byte
    padded = b"abcdefgh" + b"\x00" * 40
    for ch, key in enumerate(["mean_r_milli", "mean_g_milli", "mean_b_milli"]):
        assert out[key] == (1000 * sum(padded[ch::3])) // 16


def test_decode_png_empty_and_multirow():
    from etl_earthquake_gcp_spark.multimodal import decode_png, encode_png

    empty = decode_png(encode_png(b""))
    assert empty["height"] == 0 and empty["pixel_checksum"] == 0
    # 100 bytes -> 3 rows; rotating filters None/Sub/Up all exercised
    out = decode_png(encode_png(b"x" * 100))
    assert out["height"] == 3
    assert out["pixel_checksum"] == 100 * ord("x")


def test_decode_png_unfilters_all_five_types():
    """Hand-encode rows with every RFC 2083 filter type (including Average
    and Paeth, which attach_png's encoder never emits) and check the
    decoder recovers the exact raster statistics."""
    import struct
    import zlib

    import numpy as np

    from etl_earthquake_gcp_spark.multimodal import decode_png
    from etl_earthquake_gcp_spark.multimodal.media import _PNG_SIG, _png_chunk

    rng = np.random.default_rng(7)
    width, rb = 16, 48
    raster = rng.integers(0, 256, size=rb * 5, dtype=np.uint8)
    rows = raster.reshape(5, rb)
    lines = bytearray()
    prev = np.zeros(rb, dtype=np.uint8)
    for r in range(5):
        row, ft = rows[r], r  # filter types 0..4, one per row
        out = np.empty_like(row)
        for x in range(rb):
            a = int(row[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            c = int(prev[x - 3]) if x >= 3 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[x] = (int(row[x]) - pred) & 0xFF
        lines.append(ft)
        lines.extend(out.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, 5, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out["pixel_checksum"] == int(raster.sum(dtype=np.int64))


def _corrupt_crc(png: bytes) -> bytes:
    buf = bytearray(png)
    buf[20] ^= 0xFF  # a byte inside IHDR data
    return bytes(buf)


def test_decode_png_rejects_malformed():
    import struct
    import zlib

    import pytest as _pytest

    from etl_earthquake_gcp_spark.multimodal import decode_png, encode_png
    from etl_earthquake_gcp_spark.multimodal.media import _PNG_SIG, _png_chunk

    good = encode_png(b"hello world!" * 10)
    # 16-bit / paletted / interlaced IHDRs are out of profile
    bad_ihdr = struct.pack(">IIBBBBB", 16, 1, 16, 2, 0, 0, 0)
    unsupported = (
        _PNG_SIG
        + _png_chunk(b"IHDR", bad_ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b""))
        + _png_chunk(b"IEND", b"")
    )
    for payload in [
        b"",
        b"NOPE" + b"\x00" * 30,  # bad signature
        good[:-6],  # truncated (IEND cut)
        _corrupt_crc(good),  # CRC mismatch
        unsupported,  # out-of-profile IHDR
        _PNG_SIG + _png_chunk(b"IEND", b""),  # missing IHDR
    ]:
        with _pytest.raises(ValueError):
            decode_png(payload)


def test_png_roundtrip_spark(spark):
    from etl_earthquake_gcp_spark.multimodal import (
        attach_png,
        decode_png,
        decode_png_media,
    )

    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "x" * 100)], "doc_id long, text string"
    )
    media = attach_png(docs)
    for r in media.collect():  # the payload really is a parseable PNG file
        assert bytes(r.content)[:8] == b"\x89PNG\r\n\x1a\n"
        assert decode_png(bytes(r.content))["width"] == 16
    out = {r.doc_id: r for r in decode_png_media(media).collect()}
    assert out[1].height == 1
    assert out[1].pixel_checksum == sum(b"abcdefgh")
    assert out[2].height == 3
    assert out[2].pixel_checksum == 100 * ord("x")


def test_png_pipeline_introduces_no_shuffle(spark):
    from etl_earthquake_gcp_spark.multimodal import attach_png, decode_png_media

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = (
        decode_png_media(attach_png(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
