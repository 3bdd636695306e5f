"""Testdata-regeneration rehearsal: re-run every registered oracle pair
against systematically perturbed copies of the test tables.

The external driver regenerates the parquet testdata between rounds —
new row order, new file layout, sometimes new physical types, new value
draws. Historically that regeneration is what kills stale greens:
combine-order effects, data-dependent rounding boundaries, and layout
assumptions only show up under a fresh draw. This tool rehearses those
axes locally so the hazards surface BEFORE a driver round:

  layout     row-shuffled, 4-file-per-table directory parquet
             (combine order, multi-file sources, dir staging)
  nanos      events.ts re-encoded as TIMESTAMP(NANOS) (the r1-r2
             physical type; sources/tables.py::fix_nanos_ts must absorb)
  values     float columns permuted WITHIN column + embeddings
             reassigned across rows (same marginals, new associations —
             fresh draw of rounding boundaries; caught the 6dp->4dp
             re-round divergence in round 5)
  subsample  ~10% of fact rows dropped (changes group counts and
             ratio denominators — the axis permutation can't reach)
  subdocs    subsample + documents rows dropped too (token/doc-count
             denominators; may legitimately move dedup-quality floors —
             a failure here can mean a seed-sensitive floor)
  jitter     float columns multiplied by per-row U(0.9, 1.1) and
             re-rounded to 2dp (embeddings jittered un-rounded) —
             FRESH value draws, not a permutation of the old multiset:
             new aggregate moments, new rounding-boundary landings,
             and de-integralized l_quantity (integral test columns
             mask CAST/round divergences — the r13 hunt lesson)

Usage:
    python tools/regeneration_rehearsal.py [axis ...] [--seed N]
        [--sf-dir /root/testdata/sf0.01] [--head N]

Runs every queries()/oracle_sql() pair via the same comparator as the
driver sim (tests/conftest.assert_frames_match) and exits nonzero on
any mismatch. Writes variants under /tmp/regen_rehearsal/.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
FACTS = {"events", "orders", "lineitem"}
# subdocs additionally drops documents rows — exercises token-count and
# doc-count ratio denominators (dedup-quality floors may legitimately
# shift; a failure here means a floor is seed-sensitive, also worth
# knowing). embeddings are never subsampled: ann_recall_audit floors
# are calibrated against the full corpus.
SUBDOC_FACTS = FACTS | {"documents"}

# the full axis vocabulary; both this tool's argparse and
# tools/perturbed_sweep.py validate against it, and build_variant
# rejects anything else — a typoed axis must never fall through to the
# identity write and report a perturbation as rehearsed
AXES = (
    "base", "values", "layout", "subsample", "subdocs", "nanos", "jitter"
)


def build_variant(axis: str, src: str, dst: str, seed: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if axis not in AXES:
        raise ValueError(f"unknown axis {axis!r}; expected one of {AXES}")
    rng = np.random.default_rng(seed)
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        name = f.split(".")[0]
        if axis == "base":
            # identity variant: tools/perturbed_sweep.py base == a full
            # repo-persistent driver sim over byte-identical testdata —
            # copy verbatim (a pyarrow re-write would re-encode file
            # layout/row groups and mask layout-sensitive bugs)
            srcp = f"{src}/{f}"
            if os.path.isdir(srcp):
                shutil.copytree(srcp, f"{dst}/{f}")
            else:
                shutil.copy2(srcp, f"{dst}/{f}")
            continue
        tbl = pq.read_table(f"{src}/{f}")
        if axis == "layout":
            tbl = tbl.take(rng.permutation(tbl.num_rows))
            d = f"{dst}/{f}"
            os.makedirs(d)
            step = -(-tbl.num_rows // 4)
            for i in range(4):
                sl = tbl.slice(i * step, step)
                if sl.num_rows:
                    pq.write_table(sl, f"{d}/part-{i}.parquet")
            continue
        if axis == "nanos" and name == "events":
            i = tbl.schema.get_field_index("ts")
            tbl = tbl.set_column(
                i, "ts", tbl.column("ts").cast(pa.timestamp("ns"))
            )
            pq.write_table(tbl, f"{dst}/{f}", version="2.6")
            continue
        if axis == "values":
            cols = []
            for i, field in enumerate(tbl.schema):
                col = tbl.column(i)
                if pa.types.is_floating(field.type) or (
                    name == "embeddings" and field.name == "embedding"
                ):
                    col = col.combine_chunks().take(
                        pa.array(rng.permutation(tbl.num_rows))
                    )
                cols.append(col)
            tbl = pa.table(dict(zip(tbl.schema.names, cols)))
        elif axis == "jitter":
            cols = []
            for i, field in enumerate(tbl.schema):
                col = tbl.column(i)
                if pa.types.is_floating(field.type) or (
                    name == "embeddings" and field.name == "embedding"
                ):
                    # the numpy round-trips below convert NULL -> NaN
                    # and drop list validity bitmaps; NULL vs NaN
                    # aggregate semantics DIFFER between Spark and
                    # DuckDB, so a silent conversion would manufacture
                    # confusing sweep failures. All current testdata
                    # float/list columns carry null_count 0 — fail
                    # loudly if regeneration ever changes that, and
                    # rebuild with a validity mask then (r13 ADVICE).
                    # list columns: nested NULL elements don't show in
                    # the top-level null_count — probe the flattened
                    # child for ANY list-like encoding (is_list is
                    # False for large_list / fixed_size_list, which
                    # e.g. polars-written parquet defaults to)
                    _t = field.type
                    nested = (
                        col.combine_chunks().flatten().null_count
                        if (
                            pa.types.is_list(_t)
                            or pa.types.is_large_list(_t)
                            or pa.types.is_fixed_size_list(_t)
                        )
                        else 0
                    )
                    if col.null_count or nested:
                        raise NotImplementedError(
                            f"jitter axis: {name}.{field.name} has "
                            f"{col.null_count} top-level / {nested} "
                            "nested nulls — preserve them with "
                            "mask=...is_null() before jittering"
                        )
                if pa.types.is_floating(field.type):
                    v = col.combine_chunks().to_numpy(zero_copy_only=False)
                    fac = 1.0 + (rng.random(len(v)) - 0.5) * 0.2
                    col = pa.array(
                        np.round(v * fac, 2), type=field.type
                    )
                elif name == "embeddings" and field.name == "embedding":
                    # rebuild per encoding, PRESERVING the producer's
                    # list type: the guard above admits all three
                    # null-free encodings, so the rebuild must handle
                    # all three too (r15 review-wave catch: a clean
                    # fixed_size_list crashed on .offsets and a clean
                    # large_list was silently re-encoded as list)
                    lst = col.combine_chunks()
                    flat = lst.flatten().to_numpy(zero_copy_only=False)
                    fac = 1.0 + (rng.random(len(flat)) - 0.5) * 0.2
                    vals = pa.array(
                        (flat * fac).astype("float32"),
                        type=lst.type.value_type,
                    )
                    if pa.types.is_fixed_size_list(lst.type):
                        col = pa.FixedSizeListArray.from_arrays(
                            vals, lst.type.list_size
                        )
                    else:
                        # REBASE offsets before pairing with flatten()'s
                        # values (r15 ADVICE): flatten() is rebased to 0,
                        # but a SLICED array's offsets buffer starts at
                        # offsets[0] != 0 — from_arrays would index past
                        # the values. combine_chunks() on parquet reads
                        # yields offset 0 today; the subtract is a no-op
                        # there and correctness elsewhere.
                        offsets = pc.subtract(
                            lst.offsets, lst.offsets[0]
                        ).cast(lst.offsets.type)
                        if pa.types.is_large_list(lst.type):
                            col = pa.LargeListArray.from_arrays(
                                offsets, vals
                            )
                        else:
                            col = pa.ListArray.from_arrays(offsets, vals)
                cols.append(col)
            tbl = pa.table(dict(zip(tbl.schema.names, cols)))
        elif axis == "subsample" and name in FACTS:
            tbl = tbl.filter(pa.array(rng.random(tbl.num_rows) > 0.1))
        elif axis == "subdocs" and name in SUBDOC_FACTS:
            tbl = tbl.filter(pa.array(rng.random(tbl.num_rows) > 0.1))
        pq.write_table(tbl, f"{dst}/{f}")


def run_oracles(sf_dir: str, head: int | None) -> list[str]:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("regen_rehearsal")
        .getOrCreate()
    )
    os.chdir(REPO)
    import __spark_entry__ as entrymod
    from tests.conftest import assert_frames_match

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = list(qs)[:head] if head else list(qs)
    fails: list[str] = []
    for name in names:
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"ROWS_ONLY {name}: {len(spdf)}", flush=True)
                continue
            opdf = con.execute(oracles[name]).df()
            assert_frames_match(spdf, opdf, name)
            print(f"MATCH {name}: {len(spdf)}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            msg = "".join(
                traceback.format_exception_only(type(e), e)
            )[:300]
            print(f"MISMATCH {name}: {msg}", flush=True)
    return fails


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "axes",
        nargs="*",
        # default=None, resolved by the `or` fallback below: argparse on
        # Python 3.11 validates a LIST default against choices and exits
        # 2 ("invalid choice: ['layout', 'values']") — bpo-9625
        default=None,
        choices=list(AXES),
    )
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--head", type=int, default=None)
    args = ap.parse_args()
    rc = 0
    for axis in args.axes or ["layout", "values"]:
        dst = f"/tmp/regen_rehearsal/{axis}"
        print(f"=== axis {axis} seed {args.seed} ===", flush=True)
        build_variant(axis, args.sf_dir, dst, args.seed)
        fails = run_oracles(dst, args.head)
        print(
            f"AXIS {axis}: {len(fails)} failures: {fails}", flush=True
        )
        if fails:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
