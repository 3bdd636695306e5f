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
