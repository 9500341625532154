from graphvqa_tpu.data.tokenizer import tokenize
from graphvqa_tpu.data.vocab import Vocab, build_scene_graph_vocab, build_text_vocab
from graphvqa_tpu.data.scene_graph import convert_scene_graph, build_execution_bitmap
from graphvqa_tpu.data.dataset import GQADataset, collate_qa

__all__ = [
    "tokenize", "Vocab", "build_scene_graph_vocab", "build_text_vocab",
    "convert_scene_graph", "build_execution_bitmap", "GQADataset", "collate_qa",
]
