from .classifier import predictions_table, train_classifier

__all__ = ["train_classifier", "predictions_table"]
