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
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession
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

T = TypeVar("T")

# the DAG's default_args: retries=5, retry_delay (earthquake_etl_dag.py:106).
# Locally the delay defaults to 0 so tests stay fast; attempts = 1 + retries.
DEFAULT_RETRIES = 5


def run_stage_with_retries(
    stage: Callable[[], "T"],
    *,
    name: str,
    retries: int = DEFAULT_RETRIES,
    retry_delay_sec: float = 0.0,
) -> "T":
    """Task-level retry semantics, the Airflow ``retries=5`` analog.

    Each pipeline stage is idempotent-by-overwrite (state crosses stages
    only through storage), so a blind re-run after any exception is safe —
    exactly the property Airflow's task retries rely on. The last failure
    propagates after ``retries`` re-attempts.
    """
    import time as _time

    last: Exception | None = None
    for attempt in range(1 + retries):
        try:
            return stage()
        except Exception as exc:  # noqa: BLE001 — any task failure retries
            last = exc
            logger.warning(
                "stage %s failed (attempt %d/%d): %s",
                name, attempt + 1, 1 + retries, exc,
            )
            if attempt < retries and retry_delay_sec:
                _time.sleep(retry_delay_sec)
    assert last is not None
    raise last


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
    retries: int = 0,
    retry_delay_sec: float = 0.0,
) -> PipelineResult:
    """[ingest →] bronze(GeoJSON) → silver → gold star schema [→ model].

    With ``fetch`` set (any zero-arg callable returning a GeoJSON dict —
    the transport seam), the runner first executes the task-1 analog:
    write the raw document as ONE blob at ``bronze_path``
    (pipeline/ingest.py, mirroring cloud_function/main.py:61-89), closing
    the ingest→bronze→silver→gold chain end-to-end.

    ``retries`` applies the DAG's task-level retry policy
    (earthquake_etl_dag.py:106 ``retries=5``) to each stage; stages are
    idempotent-by-overwrite so re-running after a transient failure is
    safe. Local default is 0 (deterministic inputs); pass
    ``retries=DEFAULT_RETRIES`` for the reference's behavior.
    """
    result = PipelineResult()

    def _stage(name: str, fn: Callable[[], T]) -> T:
        if retries <= 0:
            return fn()
        return run_stage_with_retries(
            fn, name=name, retries=retries, retry_delay_sec=retry_delay_sec
        )

    # -- task 1 analog: ingest → bronze blob --------------------------------
    if fetch is not None:
        _stage("ingest", lambda: ingest_to_bronze(fetch, bronze_path))

    # -- task 2 analog: bronze → silver -------------------------------------
    silver_path = f"{out_dir}/silver/earthquakes_cleaned"

    def bronze_to_silver_stage() -> bool:
        bronze = read_geojson(spark, bronze_path, multiline=multiline)
        # empty-input guard (S4) without the RDD hop; checked on the
        # flattened frame because a FeatureCollection with features=[]
        # still reads as one bronze row
        silver = bronze_to_silver(bronze)
        if silver.isEmpty():
            return False
        # data-quality metrics (flattened vs validity-passing counts) in
        # one edge-sized aggregate over the typed frame. Deliberately NOT
        # df.observe: Spark 4.1's Observation leaves the session's
        # ObservationManager in later RDD closures (MLlib evaluators die
        # with 'Task not serializable' after ANY observe in the session),
        # so the explicit aggregate is the robust form; bronze is one
        # blob, the second scan is edge-sized.
        typed = clean_and_type(flatten_features(bronze))
        # COLLECT: 1-row quality aggregate
        qrow = typed.agg(
            F.count(F.lit(1)).alias("n_flattened"),
            F.count_if(validity_condition()).alias("n_valid"),
        ).collect()[0]
        result.observed = {
            "n_flattened": int(qrow.n_flattened),
            "n_valid": int(qrow.n_valid),
        }
        # partitioned by (year, month) for downstream partition pruning
        # (b2s.py:146); overwrite keeps the stage idempotent
        write_table(silver, silver_path, partition_by=("year", "month"))
        return True

    if not _stage("bronze_to_silver", bronze_to_silver_stage):
        logger.warning("bronze layer empty; nothing to process")
        return result

    # -- task 3 analog: silver → gold (reads the stored layer, not the
    #    in-memory frame — the storage-mediated contract) -------------------
    def silver_to_gold_stage() -> "DataFrame":
        silver_stored = read_table(spark, silver_path)
        result.silver_rows = silver_stored.count()
        gold = silver_to_gold(silver_stored)
        for name, df in gold.items():
            path = f"{out_dir}/gold/{name}"
            write_table(df, path)
            result.gold_tables[name] = read_table(spark, path).count()
        return silver_stored

    silver_stored = _stage("silver_to_gold", silver_to_gold_stage)

    # -- task 4 analog: ML training on the stored silver layer --------------
    if train_model:

        def train_stage() -> None:
            model, metrics, predictions = train_tsunami_model(silver_stored)
            model.write().overwrite().save(f"{out_dir}/ml_models/tsunami_rf")
            pred_path = f"{out_dir}/gold/tsunami_predictions"
            write_table(predictions, pred_path)
            result.ml_metrics = metrics
            result.predictions_rows = read_table(spark, pred_path).count()

        _stage("train_tsunami_model", train_stage)

    return result
