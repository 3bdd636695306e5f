"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The large-scale training-data tier treats images/audio/video as what they are
to the engine: byte blobs with structured metadata, processed by Arrow-batched
Python (``mapInPandas``) only where JVM expressions can't express the work.
The reference has no media columns (its only binary-ish edge is the raw
GeoJSON blob, cloud_function/main.py:83-89); this module is the §7 tier-4
extension of that "opaque payload at the edge" capability class.

Design contract (the part that must be real even where codecs are stubbed):

- **schema** — ``content: binary`` plus a ``media_type`` discriminator and a
  ``meta: struct<format,n_bytes>`` column; metadata is queryable JVM-side
  without touching payload bytes (column pruning keeps blob IO out of
  metadata-only plans).
- **partitioning** — payload rows pass through ``mapInPandas`` unchanged in
  partitioning: no shuffle is introduced by decode/feature-extract; at 100 TB
  the blob column never moves except where the plan already moves it.
- **batch shape** — Arrow batches of whole rows; per-row numpy over
  ``np.frombuffer`` (vectorized within a payload, loop only across the rows
  of a batch). ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak
  batch memory = batch_rows × payload size.
- **decode stub** — library codecs (pillow / soundfile / av) are NOT in this
  container. ``_real_decode_image`` is the clearly-marked
  ``NotImplementedError`` seam for those; the default path is a
  *deterministic fake decode* (integer/IEEE-exact byte math) so the whole
  pipeline is testable and oracle-checkable end to end. One REAL codec runs
  dependency-free: binary P6 PPM (``attach_ppm`` builds genuine netpbm
  files, ``decode_ppm`` parses them back — header tokenizer, comment
  handling, raster validation).

All derived quantities use engine-portable math only (integer floor-div,
IEEE-754 ``sqrt``), so DuckDB reproduces them bit-exactly from the text
payload (the synthetic corpus is pure ASCII: byte value == code point).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")
_FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}
_SAMPLE_RATE = 16_000  # fake bytes-per-second for audio/video duration

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width long, height long, "
    "n_channels long, checksum long, mean_byte_milli long, duration_ms long"
)

FRAME_SCHEMA = "doc_id long, frame_idx long, frame_len long, frame_checksum long"


def attach_media(docs: DataFrame) -> DataFrame:
    """documents → media table: deterministic binary payload + typed metadata.

    ``content`` is the utf-8 encoding of ``text`` (the container ships no
    media files; any deterministic byte source exercises the same plumbing).
    ``media_type`` cycles image/audio/video by ``doc_id % 3`` so every later
    stage sees all three branches.
    """
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    fmt = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _FORMATS.items() for x in kv]
        ),
        media_type,
    )
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        media_type.alias("media_type"),
        content.alias("content"),
        F.struct(
            fmt.alias("format"),
            F.octet_length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _real_decode_image(payload: bytes) -> tuple[int, int, int]:
    """Real image decode seam — requires pillow, which this container lacks.

    Kept separate and loudly non-functional so swapping in a real codec is a
    one-function change; the Spark-side plumbing (schema, batching,
    partitioning) is identical either way.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - pillow absent by design
        raise NotImplementedError(
            "image decode requires pillow (not installed in this container); "
            "use decode_media(use_real=False) for the deterministic fake"
        ) from exc
    raise NotImplementedError("real decode path reserved for codec-enabled builds")


def _fake_decode_row(media_type: str, payload: bytes) -> dict[str, object]:
    """Deterministic fake decode: engine-portable byte math only.

    - image: a square-ish W×H×3 grid over the payload bytes
      (W = floor(sqrt(n)), H = ceil(n / W))
    - audio: mono, duration = n / 16000 bytes-per-second
    - video: 3-channel, same duration clock
    - all:   checksum = sum of byte values (exact int);
             mean_byte_milli = 1000·checksum // n (exact int floor-div —
             avoids round-half banker's-vs-away divergence across engines)
    """
    b = np.frombuffer(payload, dtype=np.uint8)
    n = int(b.size)
    checksum = int(b.sum(dtype=np.int64))
    row: dict[str, object] = {
        "n_bytes": n,
        "width": None,
        "height": None,
        "n_channels": 1 if media_type == "audio" else 3,
        "checksum": checksum,
        "mean_byte_milli": (1000 * checksum) // n if n else 0,
        "duration_ms": None,
    }
    if media_type == "image":
        width = int(np.floor(np.sqrt(np.float64(n)))) if n else 0
        row["width"] = width
        row["height"] = -(-n // width) if width else 0  # ceil-div
    else:
        row["duration_ms"] = (1000 * n) // _SAMPLE_RATE
    return row


def decode_media(media: DataFrame, use_real: bool = False) -> DataFrame:
    """Decode/feature-extract every payload via Arrow-batched ``mapInPandas``.

    1→1 row mapping, no shuffle: the physical plan is
    Scan → ArrowEvalPython → (downstream), payload partitioning untouched.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                if use_real and mtype == "image":
                    _real_decode_image(payload)  # raises NotImplementedError
                rows.append(
                    {"doc_id": doc_id, "media_type": mtype}
                    | _fake_decode_row(mtype, payload)
                )
            out = pd.DataFrame(rows)
            for col in ("width", "height", "duration_ms"):
                out[col] = out[col].astype("Int64")  # nullable long → Arrow
            yield out

    return media.select("doc_id", "media_type", "content").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


def frame_sample(
    media: DataFrame, chunk_bytes: int = 64, stride: int = 4
) -> DataFrame:
    """Sample every ``stride``-th fixed-size chunk of video payloads as
    "frames" — the 1→N generator shape of real frame extraction.

    ``mapInPandas`` emits a variable number of output rows per input row
    (UDTF-class, like ``explode`` but computed in Python over bytes). Only
    ``media_type == 'video'`` rows reach Python: the filter happens JVM-side
    *before* the Arrow exchange, so image/audio payload bytes are never
    serialized to the worker.
    """

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[int]] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_len": [],
                "frame_checksum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                for frame_idx in range(0, -(-b.size // chunk_bytes), stride):
                    frame = b[frame_idx * chunk_bytes : (frame_idx + 1) * chunk_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(frame_idx)
                    out["frame_len"].append(int(frame.size))
                    out["frame_checksum"].append(int(frame.sum(dtype=np.int64)))
            yield pd.DataFrame(out, dtype="int64")

    return (
        media.filter(F.col("media_type") == "video")
        .select("doc_id", "content")
        .mapInPandas(sample_batches, schema=FRAME_SCHEMA)
    )


RESIZED_SCHEMA = "doc_id long, r int, c int, pixel long"


def resize_nn(media: DataFrame, out_size: int = 4) -> DataFrame:
    """Nearest-neighbor resize of the fake W×H grayscale grid to
    ``out_size``×``out_size`` — the thumbnail/downsample stage of a real
    image pipeline, over the same engine-portable byte math as
    ``decode_media`` (W = floor(sqrt n), H = ceil-div).

    Sample index for output cell (r, c) is
    ``min((r·H // out)·W + (c·W // out), n-1)`` — all integer floor-div,
    clamped because the padded last grid row can exceed the payload. Only
    ``media_type == 'image'`` rows cross the Arrow exchange (JVM-side
    filter), emitting out² long-form rows per image.

    Oracle parity relies on the module-wide pure-ASCII corpus contract
    (byte == code point, see module docstring): this side indexes payload
    BYTES, the SQL twin indexes text CHARACTERS — identical only while
    every char is one byte, as for every other decode oracle here.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[int]] = {
                "doc_id": [],
                "r": [],
                "c": [],
                "pixel": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                n = int(b.size)
                if not n:
                    continue
                w = int(np.floor(np.sqrt(np.float64(n))))
                h = (n + w - 1) // w
                for r in range(out_size):
                    for c in range(out_size):
                        idx = min(
                            (r * h // out_size) * w + (c * w // out_size),
                            n - 1,
                        )
                        out["doc_id"].append(doc_id)
                        out["r"].append(r)
                        out["c"].append(c)
                        out["pixel"].append(int(b[idx]))
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "r": "int32", "c": "int32", "pixel": "int64"}
            )

    return (
        media.filter(F.col("media_type") == "image")
        .select("doc_id", "content")
        .mapInPandas(resize_batches, schema=RESIZED_SCHEMA)
    )


# --------------------------------------------------------------------------
# REAL codec path — binary P6 PPM (netpbm), dependency-free (r3 verdict #6)
# --------------------------------------------------------------------------

_PPM_WIDTH = 16  # pixels per row → 48 payload bytes per row

PPM_DECODED_SCHEMA = (
    "doc_id long, width long, height long, maxval long, n_bytes long, "
    "pixel_checksum long, mean_r_milli long, mean_g_milli long, "
    "mean_b_milli long"
)


def attach_ppm(docs: DataFrame) -> DataFrame:
    """documents → REAL binary P6 PPM payloads, built entirely JVM-side.

    Pixel raster = the utf-8 text bytes NUL-padded to a whole number of
    16-pixel RGB rows; header = ``P6\\n<W> <H>\\n255\\n`` per the netpbm
    spec. Unlike the fake-decode table this payload is a real
    image file — any PPM reader opens it — while staying deterministic
    from ``text`` so the oracle can recompute every decoded metric.
    """
    row_bytes = 3 * _PPM_WIDTH
    d = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("pix")
    ).withColumn(
        "h", F.ceil(F.octet_length("pix") / F.lit(row_bytes)).cast("long")
    )
    header = F.encode(
        F.concat(
            F.lit(f"P6\n{_PPM_WIDTH} "),
            F.col("h").cast("string"),
            F.lit("\n255\n"),
        ),
        "UTF-8",
    )
    raster = F.expr(f"rpad(pix, CAST(h * {row_bytes} AS INT), x'00')")
    return d.select(
        "doc_id", F.concat(header, raster).alias("content")
    )


def _ppm_token(b: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited header token, skipping ``#`` comment lines
    (netpbm spec §header)."""
    n = len(b)
    while pos < n:
        c = b[pos : pos + 1]
        if c in (b" ", b"\t", b"\r", b"\n"):
            pos += 1
        elif c == b"#":
            while pos < n and b[pos : pos + 1] != b"\n":
                pos += 1
        else:
            break
    start = pos
    while pos < n and b[pos : pos + 1] not in (b" ", b"\t", b"\r", b"\n"):
        pos += 1
    return b[start:pos], pos


def decode_ppm(payload: bytes) -> dict[str, int]:
    """REAL P6 PPM decode — an actual binary-format parser, no libraries.

    Parses magic / width / height / maxval with full netpbm whitespace +
    comment handling, locates the raster after the single post-maxval
    whitespace byte, validates its length, and derives per-channel means
    from the pixel array. Raises ``ValueError`` on malformed input — a
    decoder that cannot reject garbage is not a decoder.
    """
    magic, pos = _ppm_token(payload, 0)
    if magic != b"P6":
        raise ValueError(f"not a binary PPM (magic {magic!r}, want b'P6')")
    w_tok, pos = _ppm_token(payload, pos)
    h_tok, pos = _ppm_token(payload, pos)
    max_tok, pos = _ppm_token(payload, pos)
    try:
        width, height, maxval = int(w_tok), int(h_tok), int(max_tok)
    except ValueError as exc:
        raise ValueError(f"non-integer PPM header field: {exc}") from exc
    if not 0 < maxval < 65536:
        raise ValueError(f"PPM maxval {maxval} out of range")
    if maxval > 255:
        raise ValueError("2-byte-per-sample PPM not supported here")
    pos += 1  # exactly ONE whitespace byte separates maxval from raster
    pix = np.frombuffer(payload, dtype=np.uint8, offset=min(pos, len(payload)))
    if pix.size != width * height * 3:
        raise ValueError(
            f"raster length {pix.size} != {width}x{height}x3 "
            f"= {width * height * 3}"
        )
    n_px = width * height
    rgb = pix.reshape(n_px, 3) if n_px else pix.reshape(0, 3)
    csums = rgb.sum(axis=0, dtype=np.int64)
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "n_bytes": len(payload),
        "pixel_checksum": int(csums.sum()),
        "mean_r_milli": int(1000 * csums[0]) // n_px if n_px else 0,
        "mean_g_milli": int(1000 * csums[1]) // n_px if n_px else 0,
        "mean_b_milli": int(1000 * csums[2]) // n_px if n_px else 0,
    }


def decode_ppm_media(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode: same 1→1 no-shuffle mapInPandas shape as
    the fake path, but every payload goes through the actual binary
    parser."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"doc_id": doc_id} | decode_ppm(payload)
                for doc_id, payload in zip(pdf["doc_id"], pdf["content"])
            ]
            yield pd.DataFrame(rows, dtype="int64")

    return media.select("doc_id", "content").mapInPandas(
        decode_batches, schema=PPM_DECODED_SCHEMA
    )


# --- PNG: the second dependency-free REAL codec (r15 verdict #4) -----------
#
# zlib is stdlib, so a complete non-interlaced 8-bit RGB PNG round-trip
# needs no external library: the encoder below writes genuine PNG files
# (signature, IHDR, one zlib-compressed IDAT, IEND, CRC-32 per chunk) and
# the decoder is a real spec parser — chunk walker with CRC validation,
# IHDR field checks, inflate, and scanline UN-FILTERING for all five PNG
# filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6). This closes the
# _real_decode_image NotImplementedError seam for the one format the
# container can handle without pillow; the seam itself stays for
# JPEG-class codecs that genuinely need a library.

_PNG_WIDTH = 16  # pixels per scanline → 48 raster bytes + 1 filter byte
_PNG_SIG = b"\x89PNG\r\n\x1a\n"

PNG_DECODED_SCHEMA = (
    "doc_id long, width long, height long, bit_depth long, color_type long, "
    "n_chunks long, pixel_checksum long, mean_r_milli long, "
    "mean_g_milli long, mean_b_milli long"
)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(raster: bytes, width: int = _PNG_WIDTH) -> bytes:
    """Build a REAL non-interlaced 8-bit RGB PNG around ``raster``
    (NUL-padded to whole ``width``-pixel rows).

    Rows are deliberately filtered with a rotating filter type
    (row % 3 → None/Sub/Up) so the decoder's un-filtering path is
    exercised on every payload, not just the trivial filter-0 case;
    filtering is lossless, so decoded pixels still equal the padded
    input bytes and the SQL oracle can recompute every metric from text.
    """
    import struct
    import zlib

    row_bytes = 3 * width
    height = -(-len(raster) // row_bytes) if raster else 0
    padded = np.frombuffer(
        raster + b"\x00" * (height * row_bytes - len(raster)), dtype=np.uint8
    ).reshape(height, row_bytes)
    lines = bytearray()
    prev = np.zeros(row_bytes, dtype=np.uint8)
    for r in range(height):
        row = padded[r]
        ftype = r % 3
        if ftype == 0:  # None
            filt = row
        elif ftype == 1:  # Sub: raw[x] - raw[x - bpp], bpp=3
            shifted = np.zeros_like(row)
            shifted[3:] = row[:-3]
            filt = (row.astype(np.int16) - shifted).astype(np.uint8)
        else:  # Up: raw[x] - prior[x]
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        lines.append(ftype)
        lines.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(
    ftype: int, filt: np.ndarray, prev: np.ndarray, bpp: int = 3
) -> np.ndarray:
    """Reverse one scanline's PNG filter (RFC 2083 §6.6, all five types)."""
    if ftype == 0:  # None
        return filt.copy()
    if ftype == 2:  # Up
        return (filt.astype(np.int16) + prev).astype(np.uint8)
    out = np.empty_like(filt)
    if ftype == 1:  # Sub — sequential in x by definition
        for x in range(filt.size):
            left = out[x - bpp] if x >= bpp else 0
            out[x] = (int(filt[x]) + int(left)) & 0xFF
        return out
    if ftype == 3:  # Average
        for x in range(filt.size):
            left = int(out[x - bpp]) if x >= bpp else 0
            out[x] = (int(filt[x]) + (left + int(prev[x])) // 2) & 0xFF
        return out
    if ftype == 4:  # Paeth
        for x in range(filt.size):
            a = int(out[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[x] = (int(filt[x]) + pred) & 0xFF
        return out
    raise ValueError(f"PNG filter type {ftype} out of range 0-4")


def decode_png(payload: bytes) -> dict[str, int]:
    """REAL PNG decode — signature, CRC-checked chunk walk, IHDR
    validation, zlib inflate, and per-scanline un-filtering. Raises
    ``ValueError`` on malformed input (bad magic, CRC mismatch, truncated
    chunk, wrong raster length, unsupported IHDR) — a decoder that cannot
    reject garbage is not a decoder. Supports what the spec calls the
    simplest profile: 8-bit, color type 2 (RGB), non-interlaced.
    """
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError(f"not a PNG (signature {payload[:8]!r})")
    pos, n = 8, len(payload)
    ihdr = None
    idat = bytearray()
    n_chunks = 0
    ended = False
    while pos < n:
        if pos + 8 > n:
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > n:
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        n_chunks += 1
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    if not ended:
        raise ValueError("missing IEND")
    width, height, depth, ctype_v, comp, filt_m, interlace = ihdr
    if (depth, ctype_v, comp, filt_m, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"unsupported IHDR (depth={depth} color={ctype_v} comp={comp} "
            f"filter={filt_m} interlace={interlace}); this decoder handles "
            "8-bit non-interlaced RGB"
        )
    lines = zlib.decompress(bytes(idat))
    row_bytes = 3 * width
    if len(lines) != height * (1 + row_bytes):
        raise ValueError(
            f"raster length {len(lines)} != {height}x(1+{row_bytes})"
        )
    raw = np.frombuffer(lines, dtype=np.uint8).reshape(
        height, 1 + row_bytes
    ) if height else np.zeros((0, 1 + row_bytes), dtype=np.uint8)
    prev = np.zeros(row_bytes, dtype=np.uint8)
    csums = np.zeros(3, dtype=np.int64)
    for r in range(height):
        prev = _png_unfilter(int(raw[r, 0]), raw[r, 1:], prev)
        csums += prev.reshape(width, 3).sum(axis=0, dtype=np.int64)
    n_px = width * height
    return {
        "width": width,
        "height": height,
        "bit_depth": depth,
        "color_type": ctype_v,
        "n_chunks": n_chunks,
        "pixel_checksum": int(csums.sum()),
        "mean_r_milli": int(1000 * csums[0]) // n_px if n_px else 0,
        "mean_g_milli": int(1000 * csums[1]) // n_px if n_px else 0,
        "mean_b_milli": int(1000 * csums[2]) // n_px if n_px else 0,
    }


def attach_png(docs: DataFrame) -> DataFrame:
    """documents → REAL PNG payloads via Arrow-batched ``mapInPandas``.

    Unlike ``attach_ppm`` (whose header is plain text, so it builds
    JVM-side) a PNG needs zlib + CRC-32, so the ENCODER itself runs in the
    Arrow batch path — same 1→1 no-shuffle shape as the decoders: the
    payload is born in the same task that holds the text partition, and
    never shuffles. The raster is the utf-8 text NUL-padded to whole
    16-pixel RGB rows, so every decoded metric is SQL-recomputable.
    """

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "content": [
                        encode_png(t.encode("utf-8")) for t in pdf["text"]
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        encode_batches, schema="doc_id long, content binary"
    )


def decode_png_media(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL PNG decode: 1→1, no shuffle, same plan shape as
    ``decode_ppm_media`` — Scan → ArrowEvalPython → downstream."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"doc_id": doc_id} | decode_png(payload)
                for doc_id, payload in zip(pdf["doc_id"], pdf["content"])
            ]
            yield pd.DataFrame(rows, dtype="int64")

    return media.select("doc_id", "content").mapInPandas(
        decode_batches, schema=PNG_DECODED_SCHEMA
    )
