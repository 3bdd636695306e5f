"""Pin the regeneration-rehearsal jitter-axis nested-null guard.

The jitter axis round-trips float/embedding columns through numpy,
which silently converts NULL -> NaN and drops list validity bitmaps;
NULL-vs-NaN aggregate semantics differ between Spark and DuckDB, so
the guard must fail LOUDLY on any null — including a NULL nested
inside the embedding list under ANY arrow list encoding. The r14
review wave found (and the r15 ADVICE confirmed still broken for
large_list / fixed_size_list) that `pa.types.is_list` alone misses
the non-default encodings a polars- or arrow-large_list-writing
producer would emit; these tests pin the fixed flattened-child probe
for all three.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.regeneration_rehearsal import build_variant  # noqa: E402


def _write_embeddings(tmp_path, arr):
    src = tmp_path / "src"
    src.mkdir()
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "embedding": arr})
    pq.write_table(tbl, str(src / "embeddings.parquet"))
    return str(src), str(tmp_path / "dst")


_F32 = pa.float32()


@pytest.mark.parametrize(
    "arr",
    [
        pa.array([[1.0, None], [0.5, 0.25]], pa.list_(_F32)),
        pa.array([[1.0, None], [0.5, 0.25]], pa.large_list(_F32)),
        pa.array([[1.0, None], [0.5, 0.25]], pa.list_(_F32, 2)),
    ],
    ids=["list", "large_list", "fixed_size_list"],
)
def test_jitter_guard_raises_on_nested_null_any_list_encoding(tmp_path, arr):
    src, dst = _write_embeddings(tmp_path, arr)
    with pytest.raises(NotImplementedError, match="nested nulls"):
        build_variant("jitter", src, dst, seed=29)


def test_jitter_guard_raises_on_toplevel_null(tmp_path):
    src, dst = _write_embeddings(
        tmp_path, pa.array([[1.0, 0.5], None], pa.list_(_F32))
    )
    with pytest.raises(NotImplementedError, match="top-level"):
        build_variant("jitter", src, dst, seed=29)


@pytest.mark.parametrize(
    "typ",
    [pa.list_(_F32), pa.large_list(_F32), pa.list_(_F32, 2)],
    ids=["list", "large_list", "fixed_size_list"],
)
def test_jitter_rebuild_preserves_clean_encoding(tmp_path, typ):
    """The r15 review-wave catch: the rebuild below the guard must
    handle every encoding the guard admits — a clean fixed_size_list
    crashed on .offsets and a clean large_list was silently
    re-encoded as plain list. The jittered output must carry the
    producer's encoding, the same shape, zero nulls, and actually
    perturbed values."""
    src, dst = _write_embeddings(
        tmp_path, pa.array([[1.0, 0.5], [0.5, 0.25]], typ)
    )
    build_variant("jitter", src, dst, seed=29)
    out = pq.read_table(f"{dst}/embeddings.parquet")
    col = out.column("embedding").combine_chunks()
    assert out.num_rows == 2
    assert col.type == typ
    assert col.null_count == 0 and col.flatten().null_count == 0
    flat = col.flatten().to_pylist()
    assert len(flat) == 4
    assert flat != [1.0, 0.5, 0.5, 0.25]  # jitter actually applied
    # U(0.9, 1.1) multiplicative bound
    for got, orig in zip(flat, [1.0, 0.5, 0.5, 0.25]):
        assert 0.89 * orig <= got <= 1.11 * orig
