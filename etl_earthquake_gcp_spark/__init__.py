"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference pipeline (CarlosDiazData/etl-earthquake-gcp).

Architecture: DataFrame/SQL-first (Catalyst plans everything), explicit
StructType schemas at the raw edge, no Python UDFs on the hot path, Pandas
UDFs only where built-ins can't express the semantics (multimodal stubs).

Layout
------
- ``session``    : SparkSession factory (AQE, UTC, Arrow, local tuning)
- ``sources``    : parquet/json/geojson/rest readers + delta-or-parquet writer
- ``functions``  : scalar enrichment fns (SURVEY.md §2.7), date dims, text stats
- ``operators``  : dedup (exact/latest/MinHash-LSH/SimHash/Jaccard),
                   similarity search, window suites
- ``plans``      : named query registry — each entry is (PySpark impl,
                   DuckDB oracle SQL); the driver correctness contract
- ``pipeline``   : bronze→silver→gold medallion jobs (reference parity)
- ``ml``         : tsunami-classifier-equivalent MLlib pipeline
- ``streaming``  : Structured Streaming variants (watermark dedup, windows)
"""

__version__ = "0.1.0"
