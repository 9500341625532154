from graphvqa_tpu.nn.transformer import (
    MultiheadAttention,
    TransformerEncoder,
    TransformerDecoder,
    PositionalEncoding,
    causal_mask,
)
from graphvqa_tpu.nn.embedding import PaddedEmbed

__all__ = [
    "MultiheadAttention",
    "TransformerEncoder",
    "TransformerDecoder",
    "PositionalEncoding",
    "causal_mask",
    "PaddedEmbed",
]
