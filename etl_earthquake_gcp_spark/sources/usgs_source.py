"""Custom Python DataSource for USGS-style GeoJSON feeds (SURVEY §2.1 S1).

The reference ingests by HTTP GET → GeoJSON dict → blob (cloud_function/
main.py:61-89), i.e. the *source protocol* is "a document of `features`
becomes rows". This DataSource implements that protocol natively in Spark's
Python DataSource API (Spark 4), in both batch and streaming form, so
ingestion is a real pluggable source — ``spark.read.format("usgs_geojson")``
— instead of a driver-side script.

Offline seam: `_fetch` reads a local GeoJSON file given by the ``path``
option. Swapping in ``urllib.request.urlopen(url)`` (the reference's
requests.get, main.py:75) changes nothing else — partition planning,
schema, and flattening are transport-independent.

Flattening matches process_bronze_to_silver.py:48-73: properties.* projected
by name, geometry.coordinates destructured to lon/lat/depth (P2/P3).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("magnitude", DoubleType()),
        StructField("place", StringType()),
        StructField("time_ms", LongType()),
        StructField("updated_ms", LongType()),
        StructField("tsunami_warning", BooleanType()),
        StructField("longitude", DoubleType()),
        StructField("latitude", DoubleType()),
        StructField("depth_km", DoubleType()),
    ]
)


def _fetch(path: str) -> list[dict]:
    """Transport seam: local file now; urllib GET in a connected deploy."""
    with open(path) as fh:
        doc = json.load(fh)
    return doc.get("features", [])


def _flatten(feature: dict) -> tuple:
    props = feature.get("properties", {})
    coords = (feature.get("geometry") or {}).get("coordinates", [None, None, None])
    mag = props.get("mag")
    return (
        feature.get("id"),
        float(mag) if mag is not None else None,
        props.get("place"),
        props.get("time"),
        props.get("updated"),
        props.get("tsunami") == 1,
        coords[0],
        coords[1],
        coords[2],
    )


class _FeatureSlice(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class _GeoJsonBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.n_partitions = int(options.get("numPartitions", "4"))
        # planning-time metadata fetch: only the feature COUNT is needed on
        # the driver; feature bodies are re-read inside each partition task
        self.n_features = len(_fetch(self.path))

    def partitions(self):
        step = max(1, -(-self.n_features // self.n_partitions))
        return [
            _FeatureSlice(self.path, i, min(i + step, self.n_features))
            for i in range(0, self.n_features, step)
        ] or [_FeatureSlice(self.path, 0, 0)]

    def read(self, partition: _FeatureSlice):
        for feature in _fetch(partition.path)[partition.start : partition.end]:
            yield _flatten(feature)


class _GeoJsonStreamReader(DataSourceStreamReader):
    """Micro-batch form: each poll exposes features appended since the last
    offset — the incremental version of the reference's daily re-fetch
    (§2.9 'late-data-tolerant upsert' feeds from exactly this shape)."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch_size = int(options.get("batchSize", "50"))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        n = len(_fetch(self.path))
        return {"index": n}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["index"], end["index"]
        return [
            _FeatureSlice(self.path, i, min(i + self.batch_size, hi))
            for i in range(lo, hi, self.batch_size)
        ] or [_FeatureSlice(self.path, lo, lo)]

    def read(self, partition: _FeatureSlice):
        for feature in _fetch(partition.path)[partition.start : partition.end]:
            yield _flatten(feature)

    def commit(self, end: dict) -> None:
        pass


def _unflatten(row) -> dict:
    """Inverse of :func:`_flatten`: an EVENT_SCHEMA row back to a GeoJSON
    feature (the blob layout cloud_function/main.py writes)."""
    return {
        "id": row.event_id,
        "properties": {
            "mag": row.magnitude,
            "place": row.place,
            "time": row.time_ms,
            "updated": row.updated_ms,
            "tsunami": 1 if row.tsunami_warning else 0,
        },
        "geometry": {
            "coordinates": [row.longitude, row.latitude, row.depth_km]
        },
    }


class _PartFile(WriterCommitMessage):
    def __init__(self, part_path: str):
        self.part_path = part_path


class _GeoJsonBatchWriter(DataSourceWriter):
    """The S2 WRITE protocol as a pluggable sink: every task writes its
    features to a part file next to the target (shared storage — the same
    assumption every file sink makes), and the driver-side ``commit``
    merges them into ONE FeatureCollection blob, matching the reference's
    single-object bronze layout (cloud_function/main.py:83-89). Commit is
    all-or-nothing: part files only become the blob after every task
    succeeded; ``abort`` removes the orphans."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator):
        import os
        import uuid

        part = f"{self.path}.part-{uuid.uuid4().hex}"
        parent = os.path.dirname(part)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(part, "w") as fh:
            json.dump([_unflatten(r) for r in iterator], fh)
        return _PartFile(part)

    def commit(self, messages):
        import os

        features: list[dict] = []
        for m in messages:
            with open(m.part_path) as fh:
                features.extend(json.load(fh))
            os.remove(m.part_path)
        doc = {"type": "FeatureCollection", "features": features}
        with open(self.path, "w") as fh:
            json.dump(doc, fh)

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.part_path)
            except OSError:
                pass


class UsgsGeoJsonDataSource(DataSource):
    """``spark.read.format("usgs_geojson").option("path", ...)`` source /
    ``df.write.format("usgs_geojson").option("path", ...)`` sink."""

    @classmethod
    def name(cls) -> str:
        return "usgs_geojson"

    def schema(self) -> StructType:
        return EVENT_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _GeoJsonBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _GeoJsonStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _GeoJsonBatchWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(UsgsGeoJsonDataSource)
