from graphvqa_tpu.core.graph import GraphBatch, QABatch
from graphvqa_tpu.core.packing import GraphSample, pack_graphs, pick_bucket

__all__ = ["GraphBatch", "QABatch", "GraphSample", "pack_graphs", "pick_bucket"]
