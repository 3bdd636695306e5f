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
- **decode stub** — real codecs (pillow / soundfile / av) are NOT in this
  container. ``_real_decode_image`` is the clearly-marked
  ``NotImplementedError`` seam; the default path is a *deterministic fake
  decode* (integer/IEEE-exact byte math) so the whole pipeline is testable
  and oracle-checkable end to end.

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
