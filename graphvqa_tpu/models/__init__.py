from graphvqa_tpu.models.pipeline import PipelineModel, ModelOutput

__all__ = ["PipelineModel", "ModelOutput"]
