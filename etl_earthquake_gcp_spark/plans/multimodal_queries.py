"""Multimodal-column queries: binary payloads + Arrow-batched Python decode.

The decode math is deliberately engine-portable (integer floor-div, IEEE
``sqrt``, byte sums over a pure-ASCII corpus where byte == code point), so
even the ``mapInPandas`` stages are DuckDB-oracle-checked — the differential
test covers the Arrow exchange itself, not just JVM expressions.

Shared oracle scaffolding mirrors ``multimodal/media.py`` exactly:
media_type cycles by doc_id % 3; n_bytes = octet_length(utf-8 payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import attach_media, decode_media, frame_sample
from ..sources.tables import load_table
from .registry import register

# media-table CTE: the SQL twin of multimodal.attach_media (metadata only —
# the oracle never needs the binary payload itself, just its byte math)
_MEDIA_CTE = """
    media AS (
        SELECT doc_id,
               (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]
                   AS media_type,
               text,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    )
"""


@register(
    "multimodal_meta_stats",
    oracle=f"""
        WITH {_MEDIA_CTE}
        SELECT media_type,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               CAST(min(n_bytes) AS BIGINT) AS min_bytes,
               CAST(max(n_bytes) AS BIGINT) AS max_bytes
        FROM media
        GROUP BY media_type
    """,
    doc="metadata-only aggregate over the media table: the plan must read "
    "meta.n_bytes without deserializing payload bytes (column pruning on a "
    "struct beside a binary column — the IO shape that matters at 100 TB).",
)
def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(load_table(spark, sf_dir, "documents"))
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_docs"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.min("meta.n_bytes").alias("min_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
    )


@register(
    "multimodal_decode_features",
    oracle=f"""
        WITH {_MEDIA_CTE},
        chars AS (
            SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
        ), sums AS (
            SELECT doc_id, CAST(sum(ascii(c)) AS BIGINT) AS checksum
            FROM chars GROUP BY doc_id
        )
        SELECT m.doc_id, m.media_type, m.n_bytes,
               CASE WHEN m.media_type = 'image'
                    THEN CAST(floor(sqrt(CAST(m.n_bytes AS DOUBLE))) AS BIGINT)
                    ELSE 0 END AS width,
               CASE WHEN m.media_type = 'image'
                    THEN CAST(ceil(CAST(m.n_bytes AS DOUBLE)
                         / floor(sqrt(CAST(m.n_bytes AS DOUBLE)))) AS BIGINT)
                    ELSE 0 END AS height,
               CASE WHEN m.media_type = 'audio' THEN 1 ELSE 3 END AS n_channels,
               s.checksum,
               (1000 * s.checksum) // m.n_bytes AS mean_byte_milli,
               CASE WHEN m.media_type = 'image' THEN 0
                    ELSE (1000 * m.n_bytes) // 16000 END AS duration_ms
        FROM media m JOIN sums s USING (doc_id)
    """,
    doc="Arrow-batched fake decode via mapInPandas (1-to-1, no shuffle): "
    "per-payload width/height/channels/checksum/duration from numpy byte "
    "math. The oracle recomputes identical integers from the ASCII text, so "
    "a pass certifies the full Python worker roundtrip. Library-codec seam: "
    "multimodal/media.py::_real_decode_image (NotImplementedError stub); "
    "the dependency-free REAL decode twin is multimodal_real_decode (P6 "
    "PPM).",
    bench=True,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(load_table(spark, sf_dir, "documents"))
    decoded = decode_media(media)
    # compared frame must be NULL-free (nullable-int handling differs across
    # pandas bridges) — sentinel 0 on both sides
    return decoded.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.coalesce("width", F.lit(0)).alias("width"),
        F.coalesce("height", F.lit(0)).alias("height"),
        "n_channels",
        "checksum",
        "mean_byte_milli",
        F.coalesce("duration_ms", F.lit(0)).alias("duration_ms"),
    )


@register(
    "multimodal_frame_sample",
    oracle=f"""
        WITH {_MEDIA_CTE},
        video AS (
            SELECT doc_id, text, n_bytes FROM media WHERE media_type = 'video'
        ), frames AS (
            SELECT doc_id, s.i AS frame_idx,
                   least(64, n_bytes - s.i * 64) AS frame_len,
                   substr(text, CAST(s.i * 64 + 1 AS INT), 64) AS frame_text
            FROM video
            JOIN (SELECT unnest(range(0, 4096, 4)) AS i) s
              ON s.i * 64 < n_bytes
        ), chars AS (
            SELECT doc_id, frame_idx, frame_len,
                   unnest(string_split(frame_text, '')) AS c
            FROM frames
        )
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(frame_len AS BIGINT) AS frame_len,
               CAST(sum(ascii(c)) AS BIGINT) AS frame_checksum
        FROM chars GROUP BY 1, 2, 3
    """,
    doc="1-to-N frame sampling via mapInPandas (UDTF-class generator over "
    "bytes): every 4th 64-byte chunk of each video payload. The JVM-side "
    "media_type filter runs before the Arrow exchange — image/audio payloads "
    "never cross into Python.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(load_table(spark, sf_dir, "documents"))
    return frame_sample(media, chunk_bytes=64, stride=4)


@register(
    "multimodal_resize_nn",
    oracle=f"""
        WITH {_MEDIA_CTE},
        img AS (
            SELECT doc_id, text, n_bytes,
                   CAST(floor(sqrt(CAST(n_bytes AS DOUBLE))) AS BIGINT) AS w
            FROM media WHERE media_type = 'image' AND n_bytes > 0
        ), dims AS (
            SELECT doc_id, text, n_bytes, w,
                   (n_bytes + w - 1) // w AS h
            FROM img
        ), grid AS (
            SELECT doc_id, text, n_bytes, w, h, r.r, c.c,
                   least((r.r * h // 4) * w + (c.c * w // 4),
                         n_bytes - 1) AS idx
            FROM dims
            CROSS JOIN (SELECT unnest(range(0, 4)) AS r) r
            CROSS JOIN (SELECT unnest(range(0, 4)) AS c) c
        )
        SELECT doc_id, CAST(r AS INT) AS r, CAST(c AS INT) AS c,
               CAST(ascii(substr(text, CAST(idx + 1 AS INT), 1)) AS BIGINT)
                   AS pixel
        FROM grid
    """,
    doc="nearest-neighbor resize to a 4x4 thumbnail via mapInPandas — the "
    "downsample stage of an image pipeline (decode / feature-extract / "
    "RESIZE / frame-sample, completing the multimodal op set): sample "
    "index (r*H div 4)*W + (c*W div 4) over the fake W x H grayscale "
    "grid, clamped to the payload, all integer floor-div so the oracle "
    "replays it from the ASCII text byte-for-byte. JVM-side media_type "
    "filter keeps audio/video payloads out of the Arrow exchange; output "
    "is 16 long-form (r, c, pixel) rows per image.",
)
def multimodal_resize_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.media import resize_nn

    media = attach_media(load_table(spark, sf_dir, "documents"))
    return resize_nn(media, out_size=4)


@register(
    "multimodal_real_decode",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n,
                   CAST(ceil(octet_length(encode(text)) / 48.0) AS BIGINT)
                       AS h
            FROM documents
        ), chars AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ''), 1) AS i,
                   ascii(unnest(string_split(text, ''))) AS v
            FROM documents
        ), sums AS (
            SELECT doc_id,
                   CAST(sum(v) AS BIGINT) AS checksum,
                   CAST(coalesce(sum(v) FILTER (WHERE (i - 1) % 3 = 0), 0)
                        AS BIGINT) AS s_r,
                   CAST(coalesce(sum(v) FILTER (WHERE (i - 1) % 3 = 1), 0)
                        AS BIGINT) AS s_g,
                   CAST(coalesce(sum(v) FILTER (WHERE (i - 1) % 3 = 2), 0)
                        AS BIGINT) AS s_b
            FROM chars GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(16 AS BIGINT) AS width,
               d.h AS height,
               CAST(255 AS BIGINT) AS maxval,
               11 + length(CAST(d.h AS VARCHAR)) + d.h * 48 AS n_bytes,
               coalesce(s.checksum, 0) AS pixel_checksum,
               CASE WHEN d.h = 0 THEN 0
                    ELSE (1000 * coalesce(s.s_r, 0)) // (d.h * 16) END
                   AS mean_r_milli,
               CASE WHEN d.h = 0 THEN 0
                    ELSE (1000 * coalesce(s.s_g, 0)) // (d.h * 16) END
                   AS mean_g_milli,
               CASE WHEN d.h = 0 THEN 0
                    ELSE (1000 * coalesce(s.s_b, 0)) // (d.h * 16) END
                   AS mean_b_milli
        FROM dims d LEFT JOIN sums s USING (doc_id)
    """,
    doc="REAL codec decode, end to end (r3 verdict #6, closing the "
    "_real_decode_image stub): attach_ppm builds genuine binary P6 PPM "
    "files JVM-side (netpbm header + NUL-padded RGB raster — any PPM "
    "reader opens them), and decode_ppm_media parses them back in the "
    "Arrow batch path with a real dependency-free parser (magic/dims/"
    "maxval tokenizer with comment+whitespace handling, raster-length "
    "validation, ValueError on garbage). The oracle recomputes every "
    "decoded metric — header length, per-channel milli-means over the "
    "padded raster — from the ASCII text, so a pass certifies encoder, "
    "parser, and the Arrow roundtrip together. Same 1-to-1 no-shuffle "
    "mapInPandas shape as the fake-decode twin.",
)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import attach_ppm, decode_ppm_media

    media = attach_ppm(load_table(spark, sf_dir, "documents"))
    return decode_ppm_media(media)


@register(
    "multimodal_png_decode",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n,
                   CAST(ceil(octet_length(encode(text)) / 48.0) AS BIGINT)
                       AS h
            FROM documents
        ), chars AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ''), 1) AS i,
                   ascii(unnest(string_split(text, ''))) AS v
            FROM documents
        ), sums AS (
            SELECT doc_id,
                   CAST(sum(v) AS BIGINT) AS checksum,
                   CAST(coalesce(sum(v) FILTER (WHERE (i - 1) % 3 = 0), 0)
                        AS BIGINT) AS s_r,
                   CAST(coalesce(sum(v) FILTER (WHERE (i - 1) % 3 = 1), 0)
                        AS BIGINT) AS s_g,
                   CAST(coalesce(sum(v) FILTER (WHERE (i - 1) % 3 = 2), 0)
                        AS BIGINT) AS s_b
            FROM chars GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(16 AS BIGINT) AS width,
               d.h AS height,
               CAST(8 AS BIGINT) AS bit_depth,
               CAST(2 AS BIGINT) AS color_type,
               CAST(3 AS BIGINT) AS n_chunks,
               coalesce(s.checksum, 0) AS pixel_checksum,
               CASE WHEN d.h = 0 THEN 0
                    ELSE (1000 * coalesce(s.s_r, 0)) // (d.h * 16) END
                   AS mean_r_milli,
               CASE WHEN d.h = 0 THEN 0
                    ELSE (1000 * coalesce(s.s_g, 0)) // (d.h * 16) END
                   AS mean_g_milli,
               CASE WHEN d.h = 0 THEN 0
                    ELSE (1000 * coalesce(s.s_b, 0)) // (d.h * 16) END
                   AS mean_b_milli
        FROM dims d LEFT JOIN sums s USING (doc_id)
    """,
    doc="REAL PNG decode, end to end (r15 verdict #4, closing the codec "
    "seam the one way this container allows — zlib is stdlib): attach_png "
    "builds genuine non-interlaced 8-bit RGB PNG files in the Arrow batch "
    "path (signature, IHDR, zlib IDAT, IEND, CRC-32 per chunk; rows "
    "filtered with a rotating None/Sub/Up type so un-filtering is "
    "exercised on every payload), and decode_png_media parses them back "
    "with a real spec decoder — CRC-checked chunk walk, IHDR validation, "
    "inflate, all five RFC 2083 filter reversals, ValueError on garbage. "
    "The compressed size is deliberately NOT an output column (zlib "
    "output is not SQL-recomputable); everything emitted — dims, header "
    "fields, chunk count, per-channel milli-means over the NUL-padded "
    "raster — the oracle recomputes from the ASCII text, so a pass "
    "certifies encoder, parser, filter round-trip, and the Arrow "
    "exchange together. Same 1-to-1 no-shuffle mapInPandas shape as the "
    "PPM twin; unsupported-profile PNGs (16-bit, paletted, interlaced) "
    "still raise through _real_decode_image's documented pillow seam.",
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import attach_png, decode_png_media

    media = attach_png(load_table(spark, sf_dir, "documents"))
    return decode_png_media(media)
