"""Custom Python DataSource (S1): batch read, partitioning, streaming replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.sources import usgs_source

from .fixture_data import FEATURES, write_geojson


def _path(tmp_path):
    return write_geojson(str(tmp_path / "usgs.json"))


def test_batch_read_flattens_features(spark, tmp_path):
    usgs_source.register(spark)
    df = (
        spark.read.format("usgs_geojson")
        .option("path", _path(tmp_path))
        .load()
    )
    rows = df.collect()
    assert len(rows) == len(FEATURES)
    by_id = {}
    for r in rows:
        by_id.setdefault(r.event_id, r)
    dup = [r for r in rows if r.event_id == "ev_dup"]
    assert len(dup) == 3  # source does NOT dedup — that's the silver job's op
    m80 = by_id["ev_m80"]
    assert m80.magnitude == 8.0 and m80.tsunami_warning is True
    assert m80.longitude == -70.5 and m80.latitude == -33.4 and m80.depth_km == 10.0


def test_batch_read_partitions(spark, tmp_path):
    usgs_source.register(spark)
    df = (
        spark.read.format("usgs_geojson")
        .option("path", _path(tmp_path))
        .option("numPartitions", "3")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == len(FEATURES)


def test_stream_read_delivers_all_features(spark, tmp_path):
    usgs_source.register(spark)
    stream = (
        spark.readStream.format("usgs_geojson")
        .option("path", _path(tmp_path))
        .option("batchSize", "10")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("usgs_stream_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("usgs_stream_test")
    assert got.count() == len(FEATURES)
    assert got.filter(F.col("event_id") == "ev_m80").count() == 1


def test_write_roundtrip_single_blob(spark, tmp_path):
    """S2 write side via the DataSource API: read → write → read parity,
    and the sink's output is ONE FeatureCollection blob (the reference's
    bronze layout), not a part-file directory."""
    import json

    usgs_source.register(spark)
    src = write_geojson(str(tmp_path / "in.json"))
    df = spark.read.format("usgs_geojson").option("path", src).load()

    out = str(tmp_path / "out" / "raw_earthquakes.json")
    df.write.format("usgs_geojson").option("path", out).mode("append").save()

    blob = json.loads(open(out).read())
    assert blob["type"] == "FeatureCollection"
    assert len(blob["features"]) == len(FEATURES)
    assert not [p for p in (tmp_path / "out").iterdir() if "part-" in p.name]

    back = spark.read.format("usgs_geojson").option("path", out).load()
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
