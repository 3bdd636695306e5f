"""Tsunami-classifier job — reference parity for train_tsunami_model.py,
operating on the silver layer produced by pipeline/bronze_to_silver.

Same features (magnitude, depth_km, latitude, longitude, significance),
same 'earthquake'-only filter, same downsample balancing, pipeline shape and
seeds (42) — composed from the generic pieces in ml/classifier.py.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .classifier import (
    SEED,
    balance_classes,
    build_pipeline,
    evaluate,
    predictions_table,
)

FEATURE_COLS = ["magnitude", "depth_km", "latitude", "longitude", "significance"]
LABEL_COL = "tsunami_warning"


def ml_source(silver: DataFrame) -> DataFrame:
    """'earthquake' events with complete features (train.py:51-55; P7/P8)."""
    return (
        silver.filter(F.col("event_type") == "earthquake")
        .select(*FEATURE_COLS, LABEL_COL, "event_id")
        .na.drop()
    )


def train_tsunami_model(
    silver: DataFrame,
) -> tuple[PipelineModel, dict[str, float], DataFrame]:
    """Train + evaluate + predict (train.py:57-113).

    Returns (model, {auc_roc, f1}, predictions over the full source).
    Features are cast to double for the assembler; label balancing
    downsamples the majority to the minority count (seed 42).
    """
    source = ml_source(silver)
    numeric = source.select(
        "event_id",
        LABEL_COL,
        *[F.col(c).cast("double").alias(c) for c in FEATURE_COLS],
    )
    labeled = numeric.withColumn("label", F.col(LABEL_COL).cast("double"))
    balanced = balance_classes(labeled, "label")
    train, test = balanced.randomSplit([0.8, 0.2], seed=SEED)
    model = build_pipeline(FEATURE_COLS, "label").fit(train)
    metrics = evaluate(model, test)
    predictions = predictions_table(
        model, labeled, id_col="event_id", label_col=LABEL_COL
    ).select(
        "event_id",
        F.col("actual").alias("actual_tsunami_warning"),
        F.col("predicted").alias("predicted_tsunami_warning"),
        F.col("probability").alias("tsunami_probability"),
    )
    return model, metrics, predictions
