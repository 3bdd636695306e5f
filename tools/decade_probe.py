"""Repo-persistent decade-probe harness (the SCALING.md timing tool).

Times registered queries (plans.QUERIES) or preview-bank callables
(tests/test_round{N}_previews.py module functions) at two data scales
and prints the last-decade ratio — the number every SCALING.md probe
table records. Best-of-2, cold cache, same-process (the d06aff6
protocol's cheap form; for contested-box adjudication add in-process
warm controls and best-of-5 by re-running with --runs 5).

Usage:
    python tools/decade_probe.py [--variant V] [--runs N] name [name ...]

variants (what the two timed scales are):
    sf        sf0.01 -> sf0.1 (10x everything; the default)
    docs10x   base sf0.01 -> 10x-replicated documents+embeddings with
              shifted ids (other tables copied) under /tmp
    events10x sf0.1 -> 10x-replicated events (verbatim concat, the
              1M-event harness) under /tmp
    cust10x   sf0.01 -> 10x customers AND orders with shifted keys
              (o_custkey follows the customer shift; lineitem/others
              copied) under /tmp

Name resolution: plans.QUERIES first (registered queries), then a
module-level callable in tests/test_round{6..15}_previews.py (banked
previews), first match wins.

Built variants are cached per (variant, source-dir mtime) fingerprint
under /tmp/decade_probe_<variant>/ and rebuilt when testdata changes.
"""

from __future__ import annotations

import importlib
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# bump when a _build_* statement changes: the fingerprint must key on
# builder CODE as well as source data, or a fixed replication bug keeps
# serving its stale cached dirs (r9 ADVICE: the un-aliased `* EXCLUDE`
# leaked the unnest index as a stray `i` column)
_BUILDER_VERSION = 2


def _fingerprint(src: str) -> str:
    parts = [f"builder:{_BUILDER_VERSION}"]
    for t in TABLES:
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            st = os.stat(p)
            parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
    import hashlib

    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def _build_docs10x(src: str, dst: str) -> None:
    import duckdb

    con = duckdb.connect()
    # shifted-id replication keeps ids unique so dedup/novelty queries
    # see 10x distinct docs, not 10 exact copies of each
    con.execute(f"""
        COPY (
          SELECT doc_id + i.i * (SELECT max(doc_id) + 1
                   FROM read_parquet('{src}/documents.parquet')) AS doc_id,
                 d.* EXCLUDE (doc_id)
          FROM read_parquet('{src}/documents.parquet') d,
               (SELECT unnest(range(10)) AS i) i
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT vec_id + i.i * (SELECT max(vec_id) + 1
                   FROM read_parquet('{src}/embeddings.parquet')) AS vec_id,
                 e.* EXCLUDE (vec_id)
          FROM read_parquet('{src}/embeddings.parquet') e,
               (SELECT unnest(range(10)) AS i) i
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in TABLES:
        if t not in ("documents", "embeddings"):
            shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")


def _build_events10x(src: str, dst: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{src}/events.parquet")
    os.makedirs(f"{dst}/events.parquet")
    pq.write_table(pa.concat_tables([t] * 10), f"{dst}/events.parquet/part-0.parquet")
    for name in TABLES:
        if name != "events":
            shutil.copy(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")


def _build_cust10x(src: str, dst: str) -> None:
    import duckdb

    con = duckdb.connect()
    # customers and orders both replicate with shifted keys and the
    # o_custkey FK follows the customer shift, so per-customer aggs
    # (RFM, pareto) see 10x distinct customers with real order sets
    con.execute(f"""
        COPY (
          SELECT c_custkey + i.i * (SELECT max(c_custkey) + 1
                   FROM read_parquet('{src}/customer.parquet')) AS c_custkey,
                 c.* EXCLUDE (c_custkey)
          FROM read_parquet('{src}/customer.parquet') c,
               (SELECT unnest(range(10)) AS i) i
        ) TO '{dst}/customer.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT o_orderkey + i.i * (SELECT max(o_orderkey) + 1
                   FROM read_parquet('{src}/orders.parquet')) AS o_orderkey,
                 o_custkey + i.i * (SELECT max(c_custkey) + 1
                   FROM read_parquet('{src}/customer.parquet')) AS o_custkey,
                 o.* EXCLUDE (o_orderkey, o_custkey)
          FROM read_parquet('{src}/orders.parquet') o,
               (SELECT unnest(range(10)) AS i) i
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
    """)
    for t in TABLES:
        if t not in ("customer", "orders"):
            shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")


VARIANTS = {
    # variant -> (base sf_dir, builder or literal second dir)
    "sf": ("/root/testdata/sf0.01", "/root/testdata/sf0.1"),
    "docs10x": ("/root/testdata/sf0.01", _build_docs10x),
    "events10x": ("/root/testdata/sf0.1", _build_events10x),
    "cust10x": ("/root/testdata/sf0.01", _build_cust10x),
}


def resolve(name: str):
    from etl_earthquake_gcp_spark import plans

    if name in plans.QUERIES:
        return plans.QUERIES[name].spark_fn
    for n in range(6, 21):
        try:
            mod = importlib.import_module(f"tests.test_round{n}_previews")
        except ImportError:
            continue
        fn = getattr(mod, name, None)
        if callable(fn):
            return fn
    raise SystemExit(f"unknown query/preview name: {name}")


def main() -> int:
    args = sys.argv[1:]
    variant, runs = "sf", 2
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag not in ("--variant", "--runs"):
            raise SystemExit(f"unknown flag {flag}\n\n{__doc__}")
        if not args:
            raise SystemExit(f"{flag} requires a value\n\n{__doc__}")
        if flag == "--variant":
            variant = args.pop(0)
        else:
            try:
                runs = int(args.pop(0))
            except ValueError as e:
                raise SystemExit(f"--runs must be an integer: {e}")
            if runs < 1:
                raise SystemExit("--runs must be >= 1")
    if not args:
        raise SystemExit(__doc__)
    if variant not in VARIANTS:
        raise SystemExit(f"variant must be one of {sorted(VARIANTS)}")

    base, second = VARIANTS[variant]
    if callable(second):
        dst = f"/tmp/decade_probe_{variant}/{_fingerprint(base)}"
        if not os.path.isdir(dst):
            # build into a temp dir and rename into place so an
            # interrupted build can never leave a half-written variant
            # that later runs silently reuse
            shutil.rmtree(f"/tmp/decade_probe_{variant}", ignore_errors=True)
            tmp = f"{dst}.building"
            os.makedirs(tmp)
            print(f"BUILD {variant}: {base} -> {dst}", flush=True)
            second(base, tmp)
            os.rename(tmp, dst)
        second = dst

    os.chdir(REPO)
    from pyspark.sql import functions as F

    from etl_earthquake_gcp_spark.session import get_spark

    spark = get_spark(app_name=f"decade_probe_{variant}")

    def mat(df):
        # COLLECT: 1-row checksum materialization (probe harness)
        df.select(F.xxhash64(F.struct(*df.columns)).alias("h")).agg(
            F.expr("bit_xor(h)")
        ).collect()

    for name in args:
        fn = resolve(name)
        times = []
        for sf_dir in (base, second):
            best = float("inf")
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.time()
                mat(fn(spark, sf_dir))
                best = min(best, time.time() - t0)
            times.append(best)
        print(
            f"{name}: base={times[0]:.2f}s 10x={times[1]:.2f}s "
            f"ratio={times[1] / max(times[0], 1e-9):.1f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
