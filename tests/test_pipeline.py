"""Golden end-to-end pipeline tests (SURVEY.md §5.3-5.5): bronze GeoJSON
fixture → silver → gold → BI queries → ML, with exact expected values for
the semantic edge cases the reference defines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_earthquake_gcp_spark.pipeline.bronze_to_silver import bronze_to_silver
from etl_earthquake_gcp_spark.pipeline.runner import run_pipeline
from etl_earthquake_gcp_spark.pipeline.silver_to_gold import silver_to_gold
from etl_earthquake_gcp_spark.plans import bi
from etl_earthquake_gcp_spark.sources.geojson import read_geojson

from .fixture_data import EXPECTED_VALID_IDS, write_geojson, write_ndjson


@pytest.fixture(scope="module")
def bronze_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("bronze")
    return write_geojson(str(d / "raw_earthquakes.json"))


@pytest.fixture(scope="module")
def silver(spark, bronze_path):
    df = bronze_to_silver(read_geojson(spark, bronze_path)).persist()
    df.count()
    return df


def _row(silver, event_id):
    rows = silver.filter(F.col("event_id") == event_id).collect()
    assert len(rows) == 1, f"{event_id}: expected 1 row, got {len(rows)}"
    return rows[0]


class TestBronzeToSilver:
    def test_validation_and_dedup_row_set(self, silver):
        ids = sorted(r.event_id for r in silver.select("event_id").collect())
        assert ids == EXPECTED_VALID_IDS  # rejects dropped, dup collapsed

    def test_dedup_keeps_latest_update(self, silver):
        assert _row(silver, "ev_dup").magnitude == 5.6  # updated=+3d revision

    @pytest.mark.parametrize(
        "event_id,expected",
        [
            ("ev_m29", "Micro"),
            ("ev_m30", "Minor"),
            ("ev_m39", "Minor"),
            ("ev_m40", "Light"),
            ("ev_m50", "Moderate"),
            ("ev_m60", "Strong"),
            ("ev_m70", "Major"),
            ("ev_m80", "Great"),
            ("ev_mag_min", "Micro"),
            ("ev_mag_max", "Great"),
        ],
    )
    def test_magnitude_case_boundaries(self, silver, event_id, expected):
        assert _row(silver, event_id).magnitude_category == expected

    @pytest.mark.parametrize(
        "event_id,expected",
        [
            ("ev_d70", "Shallow"),
            ("ev_d701", "Intermediate"),
            ("ev_d300", "Intermediate"),
            ("ev_d301", "Deep"),
            ("ev_depth0", "Shallow"),
        ],
    )
    def test_depth_case_boundaries(self, silver, event_id, expected):
        assert _row(silver, event_id).depth_category == expected

    @pytest.mark.parametrize(
        "event_id,detail,country",
        [
            ("ev_nocomma", "", "Somewhere Remote"),
            ("ev_onecomma", "Bolivia", "Bolivia"),
            ("ev_twocomma", "Beta Region, Japan", "Beta Region, Japan"),
            ("ev_trailing", "Peru", "Peru"),
        ],
    )
    def test_region_extraction(self, silver, event_id, detail, country):
        r = _row(silver, event_id)
        assert r.extracted_region_detail == detail
        assert r.extracted_country == country

    @pytest.mark.parametrize(
        "event_id,ns,ew",
        [
            ("ev_ne", "Northern", "Eastern"),
            ("ev_nw", "Northern", "Western"),
            ("ev_se", "Southern", "Eastern"),
            ("ev_sw", "Southern", "Western"),
            ("ev_eq0", "Northern", "Eastern"),  # ≥ 0 is N/E (b2s.py:131-132)
        ],
    )
    def test_hemispheres(self, silver, event_id, ns, ew):
        r = _row(silver, event_id)
        assert (r.hemisphere_ns, r.hemisphere_ew) == (ns, ew)

    def test_tsunami_flag_and_types(self, silver):
        assert _row(silver, "ev_m70").tsunami_warning is True
        assert _row(silver, "ev_m29").tsunami_warning is False
        assert _row(silver, "ev_quarry").event_type == "quarry blast"

    def test_timestamp_cast_is_exact(self, silver):
        r = _row(silver, "ev_m29")
        # epoch 1700000000000 ms == 2023-11-14 22:13:20 UTC
        assert r.event_timestamp_utc.strftime("%Y-%m-%d %H:%M:%S") == "2023-11-14 22:13:20"

    def test_schema_is_32_columns(self, silver):
        assert len(silver.columns) == 32


class TestSilverToGold:
    @pytest.fixture(scope="class")
    def gold(self, silver):
        return {k: v.persist() for k, v in silver_to_gold(silver).items()}

    def test_fact_covers_all_events(self, silver, gold):
        fact = gold["fact_earthquake_events"]
        assert fact.count() == silver.count()
        assert fact.select("EventID").distinct().count() == silver.count()

    def test_fact_fk_integrity(self, gold):
        fact = gold["fact_earthquake_events"]
        for dim, key in [
            ("dim_location", "LocationKey"),
            ("dim_magnitude", "MagnitudeKey"),
            ("dim_event_type", "EventTypeKey"),
            ("dim_date", "DateKey"),
        ]:
            orphans = fact.join(gold[dim].select(key), key, "left_anti").count()
            assert orphans == 0, f"fact rows with no {dim} match"

    def test_dim_date_range_covers_min_to_max_plus_30(self, silver, gold):
        lo, hi = silver.agg(
            F.to_date(F.min("event_timestamp_utc")),
            F.to_date(F.max("event_timestamp_utc")),
        ).first()
        dates = gold["dim_date"]
        n_days = (hi - lo).days + 30 + 1
        assert dates.count() == n_days
        assert dates.agg(F.min("FullDate")).first()[0] == lo

    def test_dim_magnitude_is_static_8_rows(self, gold):
        rows = {r.MagnitudeCategory: r for r in gold["dim_magnitude"].collect()}
        assert len(rows) == 8
        assert rows["Unknown"].MinMagnitude is None
        assert rows["Great"].MaxMagnitude == 10.0

    def test_surrogate_keys_are_deterministic(self, silver, gold):
        loc1 = {
            (r.latitude, r.longitude, r.place): r.LocationKey
            for r in gold["dim_location"].collect()
        }
        # rebuild from scratch → identical key assignment (row_number over
        # natural key, not monotonically_increasing_id)
        loc2 = {
            (r.latitude, r.longitude, r.place): r.LocationKey
            for r in silver_to_gold(silver)["dim_location"].collect()
        }
        assert loc1 == loc2

    def test_bi_queries(self, silver, gold):
        n = silver.count()
        assert bi.total_events(gold).first()[0] == n
        assert bi.max_magnitude(gold).first()[0] == 10.0
        expected_tsunami = silver.filter("tsunami_warning").count()
        assert bi.tsunami_warnings_issued(gold).first()[0] == expected_tsunami
        by_country = {
            r.extracted_country: r.n_events for r in bi.events_by_country(gold).collect()
        }
        assert by_country["Chile"] == silver.filter(
            F.col("extracted_country") == "Chile"
        ).count()
        rollup_rows = bi.events_over_time(gold).collect()
        grand_total = [r for r in rollup_rows if r.Year is None]
        assert len(grand_total) == 1 and grand_total[0].n_events == n
        assert bi.geo_bubbles(gold).count() > 0
        assert bi.slicers(gold, tsunami=True).first().n_events == expected_tsunami


class TestEndToEndRunner:
    def test_full_pipeline(self, spark, bronze_path, tmp_path):
        result = run_pipeline(spark, bronze_path, str(tmp_path / "lake"))
        assert result.silver_rows == len(EXPECTED_VALID_IDS)
        assert result.gold_tables["fact_earthquake_events"] == result.silver_rows
        assert result.gold_tables["dim_magnitude"] == 8
        assert result.predictions_rows > 0
        assert 0.0 <= result.ml_metrics["auc_roc"] <= 1.0
        # quality metrics from the bronze→silver stage: every fixture
        # feature flattens to one row; the ev_bad/ev_null/ev_negdepth
        # rejects fail validation; the remainder includes the duplicate
        # revision collapsed later by dedup
        from .fixture_data import FEATURES

        n_rejects = sum(
            f["id"].startswith(("ev_bad", "ev_null", "ev_negdepth"))
            for f in FEATURES
        )
        assert result.observed["n_flattened"] == len(FEATURES)
        assert result.observed["n_valid"] == len(FEATURES) - n_rejects
        assert result.observed["n_valid"] > len(EXPECTED_VALID_IDS)  # dup revision

    def test_full_pipeline_from_ingest(self, spark, tmp_path):
        """Ingest→bronze→silver→gold from a transport-stubbed fetch: the
        runner's task-1 analog writes the raw dict as ONE blob (the S2
        write side, cloud_function/main.py:83-89) and the rest of the
        chain consumes it from storage."""
        import json

        from .fixture_data import feature_collection

        bronze = tmp_path / "lake" / "bronze" / "raw_earthquakes.json"
        result = run_pipeline(
            spark,
            str(bronze),
            str(tmp_path / "lake"),
            train_model=False,
            fetch=feature_collection,  # the transport seam, stubbed
        )
        # the blob is a single JSON document, exactly what fetch returned
        blob = json.loads(bronze.read_text())
        assert blob["type"] == "FeatureCollection"
        assert len(blob["features"]) == len(feature_collection()["features"])
        assert result.silver_rows == len(EXPECTED_VALID_IDS)
        assert result.gold_tables["fact_earthquake_events"] == result.silver_rows

    def test_ingest_is_idempotent_overwrite(self, tmp_path):
        from .fixture_data import feature_collection

        from etl_earthquake_gcp_spark.pipeline.ingest import ingest_to_bronze

        p = str(tmp_path / "bronze" / "raw.json")
        n1 = ingest_to_bronze(feature_collection, p)
        n2 = ingest_to_bronze(feature_collection, p)  # overwrite, same count
        assert n1 == n2 == len(feature_collection()["features"])

    def test_ndjson_variant(self, spark, tmp_path):
        path = write_ndjson(str(tmp_path / "bronze.ndjson"))
        df = bronze_to_silver(read_geojson(spark, path, multiline=False))
        ids = sorted(r.event_id for r in df.select("event_id").collect())
        assert ids == EXPECTED_VALID_IDS

    def test_empty_bronze_guard(self, spark, tmp_path):
        import json

        p = tmp_path / "empty.json"
        p.write_text(json.dumps({"type": "FeatureCollection", "features": []}))
        result = run_pipeline(spark, str(p), str(tmp_path / "lake2"))
        assert result.silver_rows == 0 and result.gold_tables == {}


class TestRetrySemantics:
    """Task-level retry policy, the DAG's retries=5 analog
    (dags/earthquake_etl_dag.py:106)."""

    def test_transient_failure_retried_to_success(self):
        from etl_earthquake_gcp_spark.pipeline.runner import run_stage_with_retries

        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("transient")
            return "ok"

        assert run_stage_with_retries(flaky, name="t", retries=5) == "ok"
        assert calls["n"] == 3

    def test_exhausted_retries_raise_last_error(self):
        import pytest

        from etl_earthquake_gcp_spark.pipeline.runner import run_stage_with_retries

        calls = {"n": 0}

        def always_fails():
            calls["n"] += 1
            raise ValueError(f"attempt {calls['n']}")

        with pytest.raises(ValueError, match="attempt 3"):
            run_stage_with_retries(always_fails, name="t", retries=2)
        assert calls["n"] == 3  # 1 + retries attempts

    def test_pipeline_ingest_retries_through_flaky_fetch(self, spark, tmp_path):
        from .fixture_data import feature_collection

        calls = {"n": 0}

        def flaky_fetch():
            calls["n"] += 1
            if calls["n"] == 1:
                raise ConnectionError("USGS 503")
            return feature_collection()

        result = run_pipeline(
            spark,
            str(tmp_path / "bronze" / "raw.json"),
            str(tmp_path / "lake"),
            train_model=False,
            fetch=flaky_fetch,
            retries=5,
        )
        assert calls["n"] == 2
        assert result.silver_rows == len(EXPECTED_VALID_IDS)
