from graphvqa_tpu.eval.scorer import score_predictions, format_report

__all__ = ["score_predictions", "format_report"]
