from graphvqa_tpu.core.graph import GraphBatch, QABatch
from graphvqa_tpu.core.packing import (
    GraphSample, pack_graphs, pack_graphs_dense, pick_bucket, pick_dense_npg)

__all__ = ["GraphBatch", "QABatch", "GraphSample", "pack_graphs",
           "pack_graphs_dense", "pick_bucket", "pick_dense_npg"]
