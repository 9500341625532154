"""Pretrained (GloVe) embedding injection.

The reference copies GloVe-300d vectors into the shared text embedding at
construction (pipeline_model_gat.py:634 ``weight.data.copy_``); the scene-
graph embedding's copy is commented out in the released code
(pipeline_model_gat.py:563) so it trains from random init — both hooks are
provided here, applied to an initialized variables pytree.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def inject_pretrained_embeddings(
    variables: dict,
    text_matrix: Optional[np.ndarray] = None,
    sg_matrix: Optional[np.ndarray] = None,
) -> dict:
    params = dict(variables["params"])
    if text_matrix is not None:
        emb = dict(params["text_vocab_embedding"])
        assert emb["embedding"].shape == text_matrix.shape, (
            emb["embedding"].shape, text_matrix.shape)
        emb["embedding"] = jnp.asarray(text_matrix)
        params["text_vocab_embedding"] = emb
    if sg_matrix is not None:
        sge = dict(params["scene_graph_encoder"])
        emb = dict(sge["sg_vocab_embedding"])
        assert emb["embedding"].shape == sg_matrix.shape, (
            emb["embedding"].shape, sg_matrix.shape)
        emb["embedding"] = jnp.asarray(sg_matrix)
        sge["sg_vocab_embedding"] = emb
        params["scene_graph_encoder"] = sge
    out = dict(variables)
    out["params"] = params
    return out
