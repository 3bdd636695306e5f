"""In-process pipeline runner — the Airflow DAG re-expressed
(dags/earthquake_etl_dag.py:80-131).

The reference chains 4 tasks (ingest → bronze_to_silver → silver_to_gold →
train), each on a fresh Spark cluster, with state crossing ONLY through
storage (SURVEY §3.1). Locally the same contract holds: every stage writes
its layer and the next stage reads it back — stages stay independently
re-runnable and idempotent-by-overwrite, and the runner is just the
dependency order.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..ml.tsunami import train_tsunami_model
from ..sources.geojson import read_geojson
from ..sources.writers import read_table, write_table
from .bronze_to_silver import (
    bronze_to_silver,
    clean_and_type,
    flatten_features,
    validity_condition,
)
from .ingest import ingest_to_bronze
from .silver_to_gold import silver_to_gold

logger = logging.getLogger(__name__)


@dataclass
class PipelineResult:
    silver_rows: int = 0
    gold_tables: dict[str, int] = field(default_factory=dict)
    ml_metrics: dict[str, float] = field(default_factory=dict)
    predictions_rows: int = 0
    # data-quality metrics from the bronze→silver stage: flattened feature
    # count + validity-pass count (drop rate = 1 - n_valid/n_flattened)
    observed: dict[str, int] = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    bronze_path: str,
    out_dir: str,
    multiline: bool = True,
    train_model: bool = True,
    fetch: Callable[[], dict] | None = None,
) -> PipelineResult:
    """[ingest →] bronze(GeoJSON) → silver → gold star schema [→ model].

    With ``fetch`` set (any zero-arg callable returning a GeoJSON dict —
    the transport seam), the runner first executes the task-1 analog:
    write the raw document as ONE blob at ``bronze_path``
    (pipeline/ingest.py, mirroring cloud_function/main.py:61-89), closing
    the ingest→bronze→silver→gold chain end-to-end.
    """
    result = PipelineResult()

    # -- task 1 analog: ingest → bronze blob --------------------------------
    if fetch is not None:
        ingest_to_bronze(fetch, bronze_path)

    # -- task 2 analog: bronze → silver -------------------------------------
    bronze = read_geojson(spark, bronze_path, multiline=multiline)
    # empty-input guard (S4) without the RDD hop; checked on the flattened
    # frame because a FeatureCollection with features=[] still reads as one
    # bronze row
    silver = bronze_to_silver(bronze)
    if silver.isEmpty():
        logger.warning("bronze layer empty; nothing to process")
        return result
    # data-quality metrics (flattened vs validity-passing counts) in one
    # edge-sized aggregate over the typed frame. Deliberately NOT
    # df.observe: Spark 4.1's Observation leaves the session's
    # ObservationManager in later RDD closures (MLlib evaluators die with
    # 'Task not serializable' after ANY observe in the session), so the
    # explicit aggregate is the robust form; bronze is one blob, the
    # second scan is edge-sized.
    typed = clean_and_type(flatten_features(bronze))
    qrow = typed.agg(
        F.count(F.lit(1)).alias("n_flattened"),
        F.count_if(validity_condition()).alias("n_valid"),
    ).collect()[0]
    result.observed = {
        "n_flattened": int(qrow.n_flattened),
        "n_valid": int(qrow.n_valid),
    }
    silver_path = f"{out_dir}/silver/earthquakes_cleaned"
    # partitioned by (year, month) for downstream partition pruning
    # (b2s.py:146); overwrite keeps the stage idempotent
    write_table(silver, silver_path, partition_by=("year", "month"))

    # -- task 3 analog: silver → gold (reads the stored layer, not the
    #    in-memory frame — the storage-mediated contract) -------------------
    silver_stored = read_table(spark, silver_path)
    result.silver_rows = silver_stored.count()
    gold = silver_to_gold(silver_stored)
    for name, df in gold.items():
        path = f"{out_dir}/gold/{name}"
        write_table(df, path)
        result.gold_tables[name] = read_table(spark, path).count()

    # -- task 4 analog: ML training on the stored silver layer --------------
    if train_model:
        model, metrics, predictions = train_tsunami_model(silver_stored)
        model.write().overwrite().save(f"{out_dir}/ml_models/tsunami_rf")
        pred_path = f"{out_dir}/gold/tsunami_predictions"
        write_table(predictions, pred_path)
        result.ml_metrics = metrics
        result.predictions_rows = read_table(spark, pred_path).count()

    return result
