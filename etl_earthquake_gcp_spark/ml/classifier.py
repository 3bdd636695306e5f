"""MLlib binary classifier pipeline — reference parity for
train_tsunami_model.py.

Pipeline shape matches the reference exactly (train_tsunami_model.py:74-77):
VectorAssembler → StandardScaler → RandomForestClassifier, class balancing by
majority downsample (:59-66), 80/20 split seed 42 (:80), AUC-ROC + F1
evaluation (:89-96), predictions projected with P(positive) via
``vector_to_array(probability)[1]`` (:111, F11).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42  # train_tsunami_model.py:64,76,80


def balance_classes(df: DataFrame, label_col: str) -> DataFrame:
    """Downsample the majority class to the minority count
    (train_tsunami_model.py:59-66: sample(fraction=minority/majority, seed=42)
    ∪ minority)."""
    # COLLECT: |distinct labels| rows (binary here) — a class census,
    # never data-scale
    counts = {
        r[label_col]: r["n"]
        for r in df.groupBy(label_col).agg(F.count("*").alias("n")).collect()
    }
    if len(counts) < 2:
        return df
    minority_label = min(counts, key=counts.get)
    majority_label = max(counts, key=counts.get)
    if minority_label == majority_label:
        return df
    fraction = counts[minority_label] / counts[majority_label]
    majority = df.filter(F.col(label_col) == majority_label).sample(
        withReplacement=False, fraction=fraction, seed=SEED
    )
    minority = df.filter(F.col(label_col) == minority_label)
    return majority.unionByName(minority)


def build_pipeline(feature_cols: list[str], label_col: str) -> Pipeline:
    """VectorAssembler → StandardScaler → RandomForest
    (train_tsunami_model.py:74-77)."""
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features_raw")
    scaler = StandardScaler(inputCol="features_raw", outputCol="features")
    rf = RandomForestClassifier(
        featuresCol="features", labelCol="label", seed=SEED
    )
    return Pipeline(stages=[assembler, scaler, rf])


def train_classifier(
    labeled: DataFrame, label_col: str
) -> tuple[PipelineModel, DataFrame]:
    """Balance → split 80/20 (seed 42) → fit. Returns (model, test split)."""
    feature_cols = [
        c for c, t in labeled.dtypes if c != label_col and t == "double"
    ]
    df = labeled.withColumn("label", F.col(label_col).cast("double"))
    # PERSIST: balanced training frame (<= 2x minority class), read by
    # the split, the fit and the eval; session-LRU lifetime
    balanced = balance_classes(df, "label").persist()
    train, test = balanced.randomSplit([0.8, 0.2], seed=SEED)
    model = build_pipeline(feature_cols, "label").fit(train)
    return model, test


def evaluate(model: PipelineModel, test: DataFrame) -> dict[str, float]:
    """AUC-ROC + F1, as logged by train_tsunami_model.py:89-96."""
    pred = model.transform(test)
    auc = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    ).evaluate(pred)
    f1 = MulticlassClassificationEvaluator(labelCol="label", metricName="f1").evaluate(
        pred
    )
    return {"auc_roc": auc, "f1": f1}


def predictions_table(
    model: PipelineModel, df: DataFrame, id_col: str, label_col: str
) -> DataFrame:
    """Predictions projection (train_tsunami_model.py:107-113): id, actual,
    predicted, P(positive). ``current_timestamp`` column intentionally
    omitted from compared output (SURVEY §5.1 determinism rule)."""
    pred = model.transform(df)
    return pred.select(
        F.col(id_col),
        F.col(label_col).alias("actual"),
        (F.col("prediction") == 1.0).alias("predicted"),
        F.round(vector_to_array("probability").getItem(1), 4).alias("probability"),
    )
