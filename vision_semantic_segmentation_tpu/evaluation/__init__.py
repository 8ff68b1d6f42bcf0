from .map_eval import MapEvaluator, Test, convert_labels

__all__ = ["MapEvaluator", "Test", "convert_labels"]
