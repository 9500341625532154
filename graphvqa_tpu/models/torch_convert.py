"""PyTorch state_dict -> flax params conversion.

Maps the reference's torch module weights (reference: pipeline_model_gat.py —
``nn.TransformerEncoder/Decoder`` stacks, ``nn.Linear`` heads,
``nn.BatchNorm1d``, the custom ``gat`` layer of gat_skip.py:16-108) onto this
framework's parameter trees, so activations can be compared layer by layer
(BASELINE.md: "per-layer activation parity vs PyTorch: allclose") and torch
checkpoints can be brought over.

All functions take a plain ``{name: np.ndarray}`` state_dict (what
``torch.load(...)["model"]`` flattens to via ``{k: v.numpy()}``), so torch
itself is not required at conversion time.

Conventions converted:
  * torch ``nn.Linear.weight`` is [out, in] -> flax ``kernel`` [in, out] (T).
  * torch ``nn.MultiheadAttention`` packs q/k/v into ``in_proj_weight``
    [3D, D] / ``in_proj_bias`` [3D] -> split into thirds, in q, k, v order
    (torch source: F.multi_head_attention_forward), one TorchLinear each.
  * torch ``nn.LayerNorm``/``BatchNorm1d`` weight/bias -> scale/bias; BN
    running_mean/var -> the ``batch_stats`` collection.
  * the reference ``gat`` layer's ``lin_l.weight`` ([H*C, in], shared with
    lin_r, gat_skip.py:76-77) -> ``lin_lr`` [in, H*C]; ``att_l/att_r/att_e``
    [1, H, C] -> [H, C]; ``bias`` [C] unchanged.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

Params = Dict[str, object]


def convert_linear(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    """torch nn.Linear '<prefix>.weight/.bias' -> TorchLinear kernel/bias."""
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def convert_layernorm(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def convert_mha(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    """torch nn.MultiheadAttention -> MultiheadAttention (q/k/v/out proj).

    Splits the packed ``in_proj_weight`` [3D, D] into q/k/v thirds (that
    order), transposing each to flax layout.
    """
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd[f"{prefix}.in_proj_bias"]
    d = w.shape[1]
    assert w.shape[0] == 3 * d, (w.shape, "in_proj_weight must be [3D, D]")
    out: Params = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {
            "kernel": np.ascontiguousarray(w[i * d:(i + 1) * d].T),
            "bias": b[i * d:(i + 1) * d],
        }
    out["out_proj"] = convert_linear(sd, f"{prefix}.out_proj")
    return out


def convert_encoder_layer(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    """torch nn.TransformerEncoderLayer -> EncoderLayer params."""
    return {
        "self_attn": convert_mha(sd, f"{prefix}.self_attn"),
        "linear1": convert_linear(sd, f"{prefix}.linear1"),
        "linear2": convert_linear(sd, f"{prefix}.linear2"),
        "norm1": convert_layernorm(sd, f"{prefix}.norm1"),
        "norm2": convert_layernorm(sd, f"{prefix}.norm2"),
    }


def convert_decoder_layer(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    """torch nn.TransformerDecoderLayer -> DecoderLayer params.

    Torch names the cross attention ``multihead_attn``
    (pipeline_model_gat.py uses the stock layer).
    """
    return {
        "self_attn": convert_mha(sd, f"{prefix}.self_attn"),
        "cross_attn": convert_mha(sd, f"{prefix}.multihead_attn"),
        "linear1": convert_linear(sd, f"{prefix}.linear1"),
        "linear2": convert_linear(sd, f"{prefix}.linear2"),
        "norm1": convert_layernorm(sd, f"{prefix}.norm1"),
        "norm2": convert_layernorm(sd, f"{prefix}.norm2"),
        "norm3": convert_layernorm(sd, f"{prefix}.norm3"),
    }


def convert_transformer_stack(
    sd: Mapping[str, np.ndarray],
    prefix: str,
    num_layers: int,
    decoder: bool = False,
    norm_prefix: str = "",
) -> Params:
    """torch nn.TransformerEncoder/Decoder -> TransformerEncoder/Decoder.

    ``norm_prefix`` names the stack-final LayerNorm; torch stores it at
    ``<prefix>.norm`` when constructed with ``norm=...`` (the reference always
    does: pipeline_model_gat.py:645-649,341,459).
    """
    conv = convert_decoder_layer if decoder else convert_encoder_layer
    out: Params = {
        f"layer_{i}": conv(sd, f"{prefix}.layers.{i}")
        for i in range(num_layers)
    }
    out["final_norm"] = convert_layernorm(sd, norm_prefix or f"{prefix}.norm")
    return out


def convert_batchnorm1d(sd: Mapping[str, np.ndarray], prefix: str):
    """torch nn.BatchNorm1d -> (params, batch_stats) for MaskedBatchNorm."""
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def convert_gat_layer(sd: Mapping[str, np.ndarray], prefix: str = "") -> Params:
    """Reference ``gat`` layer (gat_skip.py:70-108) -> GATLayer params.

    ``lin_l`` and ``lin_r`` share one weight in the reference
    (gat_skip.py:76-77) — only ``lin_l.weight`` is read. The attention
    parameter tensors are stored [1, H, C].
    """
    p = (prefix + ".") if prefix else ""
    return {
        "lin_lr": np.ascontiguousarray(sd[f"{p}lin_l.weight"].T),
        "lin_e": np.ascontiguousarray(sd[f"{p}lin_e.weight"].T),
        "att_l": sd[f"{p}att_l"].reshape(sd[f"{p}att_l"].shape[-2:]),
        "att_r": sd[f"{p}att_r"].reshape(sd[f"{p}att_r"].shape[-2:]),
        "att_e": sd[f"{p}att_e"].reshape(sd[f"{p}att_e"].shape[-2:]),
        "bias": sd[f"{p}bias"],
    }


def _seq2(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    """torch ``Seq(Lin, ReLU, Lin)`` (indices 0 and 2) -> MLP2 lin1/lin2."""
    return {"lin1": convert_linear(sd, f"{prefix}.0"),
            "lin2": convert_linear(sd, f"{prefix}.2")}


def convert_gat_engine(sd: Mapping[str, np.ndarray], num_rounds: int):
    """``gat_seq`` (gat_skip.py:220-236) -> GATSeq params/batch_stats."""
    engine: Params = {}
    stats: Params = {}
    for i in range(num_rounds):
        engine[f"conv_{i}"] = convert_gat_layer(sd, f"gat_seq.convs.{i}")
    for i in range(num_rounds - 1):
        bn_p, bn_s = convert_batchnorm1d(sd, f"gat_seq.bns.{i}")
        engine[f"bn_{i}"] = bn_p
        stats[f"bn_{i}"] = bn_s
    return engine, stats


def convert_gcn_engine(sd: Mapping[str, np.ndarray], num_rounds: int):
    """``gcn_seq`` (pipeline_model_gcn.py:622-669) -> GCNSeq params.

    Handles both PyG parameter layouts: 1.x ``convs.i.weight`` ([in, out])
    — the era the reference pins — and >=2.0 ``convs.i.lin.weight``
    ([out, in], transposed here).
    """
    engine: Params = {}
    stats: Params = {}
    for i in range(num_rounds):
        base = f"gcn_seq.convs.{i}"
        if f"{base}.weight" in sd:
            kernel = np.ascontiguousarray(sd[f"{base}.weight"])
        else:
            kernel = np.ascontiguousarray(sd[f"{base}.lin.weight"].T)
        engine[f"conv_{i}_weight"] = {"kernel": kernel}
        engine[f"conv_{i}_bias"] = sd[f"{base}.bias"]
    for i in range(num_rounds - 1):
        bn_p, bn_s = convert_batchnorm1d(sd, f"gcn_seq.bns.{i}")
        engine[f"bn_{i}"] = bn_p
        stats[f"bn_{i}"] = bn_s
    return engine, stats


def convert_gine_engine(sd: Mapping[str, np.ndarray], num_rounds: int):
    """``gine_seq`` (pipeline_model_gine.py:622-674) -> GINESeq params.

    The GINEConv ``nn`` is ``Seq(Lin, ReLU, Lin)``; a trained (nonzero)
    ``eps`` has no counterpart here (GINESeq implements the reference's
    default eps=0) and raises rather than silently dropping it.
    """
    engine: Params = {}
    stats: Params = {}
    for i in range(num_rounds):
        base = f"gine_seq.convs.{i}"
        eps = sd.get(f"{base}.eps")
        if eps is not None and np.any(np.asarray(eps) != 0):
            raise ValueError(
                f"{base}.eps is nonzero ({eps}); GINESeq implements the "
                f"reference default train_eps=False/eps=0 only")
        engine[f"conv_{i}_mlp"] = {
            "lin1": convert_linear(sd, f"{base}.nn.0"),
            "lin2": convert_linear(sd, f"{base}.nn.2"),
        }
    for i in range(num_rounds - 1):
        bn_p, bn_s = convert_batchnorm1d(sd, f"gine_seq.bns.{i}")
        engine[f"bn_{i}"] = bn_p
        stats[f"bn_{i}"] = bn_s
    return engine, stats


def convert_lcgn_engine(sd: Mapping[str, np.ndarray], num_iters: int = 4):
    """``lcgn_seq`` + ``gat_lcgn`` (lcgn.py:17-244,251-323) -> LCGNSeq.

    The reference builds ``bns`` that its forward never uses
    (lcgn.py:284) — dead parameters, skipped by design. ``init_sg_emb_input``
    / ``proj_x_loc`` / ``proj_x_ctx`` are Sequential wrappers whose Linear
    sits at index 0 / 1 / 1 respectively.
    """
    eng: Params = {
        "init_sg_emb": convert_linear(sd, "lcgn_seq.init_sg_emb_input.0"),
        "q_input1": convert_linear(sd, "lcgn_seq.qInput1"),
        "cmd_inter2logits": convert_linear(sd, "lcgn_seq.cmd_inter2logits"),
        "proj_x_loc": convert_linear(sd, "lcgn_seq.proj_x_loc.1"),
        "proj_x_ctx": convert_linear(sd, "lcgn_seq.proj_x_ctx.1"),
        "output_layer": convert_linear(sd, "lcgn_seq.output_layer"),
        "fin_layer": convert_linear(sd, "lcgn_seq.fin_layer"),
    }
    for t in range(num_iters):
        eng[f"q_input2_{t}"] = convert_linear(sd, f"lcgn_seq.qInput2_{t}")
    cell: Params = {}
    for name in ("lin_l", "lin_r", "cal_x", "proj_cmd", "cal_cmd"):
        cell[name] = {"kernel": np.ascontiguousarray(
            sd[f"lcgn_seq.lcgn.{name}.weight"].T)}
    cell["bias"] = sd["lcgn_seq.lcgn.bias"]
    eng["cell"] = cell
    return eng, {}


_ENGINE_CONVERTERS = {
    "gat": convert_gat_engine,
    "gcn": convert_gcn_engine,
    "gine": convert_gine_engine,
    "onlysg": convert_gat_engine,   # the ablation is a gat-family model
}


def convert_pipeline(
    sd: Mapping[str, np.ndarray],
    kind: str = "gat",
    num_encoder_layers: int = 3,
    num_decoder_layers: int = 3,
    num_rounds: int = 5,
    lcgn_iters: int = 4,
):
    """Full reference checkpoint of ANY model family -> this framework's
    variables.

    Input: the flattened ``{name: np.ndarray}`` of the reference's
    ``torch.load(ckpt)["model"]`` (module trees: pipeline_model_gat.py:615-731
    and the three near-identical variants in baseline_and_test_models/).
    Returns ``{"params": ..., "batch_stats": ...}`` matching
    ``PipelineModel`` with the corresponding engine:

        variables = to_jax(convert_pipeline(sd, kind="gcn"))
        out = PipelineModel(cfg).apply(variables, batch, ...)

    The reference's full-answer decoder is converted when present
    (``use_full_answer``); its execution engine is commented out of the
    released models (pipeline_model_gat.py:668-671) and has no keys to map.
    """
    p: Params = {
        "text_vocab_embedding": {
            "embedding": sd["text_vocab_embedding.weight"]},
    }

    sge_base = "scene_graph_encoder.scene_graph_encoding_layer"
    p["scene_graph_encoder"] = {
        "sg_vocab_embedding": {
            "embedding": sd["scene_graph_encoder.sg_vocab_embedding.weight"]},
        "meta_layer": {
            "edge_mlp": _seq2(sd, f"{sge_base}.edge_model.edge_mlp"),
            "node_mlp_1": _seq2(sd, f"{sge_base}.node_model.node_mlp_1"),
            "node_mlp_2": _seq2(sd, f"{sge_base}.node_model.node_mlp_2"),
        },
        # 1-element affine tensors (my_graph_layernorm.py:40-41)
        "ln_weight": sd["scene_graph_encoder.graph_layer_norm.weight"],
        "ln_bias": sd["scene_graph_encoder.graph_layer_norm.bias"],
    }

    p["question_encoder"] = {
        "emb_proj": convert_linear(sd, "question_encoder.emb_proj"),
        "encoder": convert_transformer_stack(
            sd, "question_encoder.transformer_encoder", num_encoder_layers),
    }

    p["program_decoder"] = {
        "query_embed": sd["program_decoder.query_embed.weight"],
        "emb_proj": convert_linear(sd, "program_decoder.emb_proj"),
        "coarse_decoder": convert_transformer_stack(
            sd, "program_decoder.coarse_decoder", num_decoder_layers,
            decoder=True),
        # the reference names the AR stage 'transformer_decoder'
        # (pipeline_model_gat.py:341); here it is the fine decoder
        "fine_decoder": convert_transformer_stack(
            sd, "program_decoder.transformer_decoder", num_decoder_layers,
            decoder=True),
        "vocab_decoder": convert_linear(sd, "program_decoder.vocab_decoder"),
    }

    if "full_answer_decoder.emb_proj.weight" in sd:
        p["full_answer_decoder"] = {
            "emb_proj": convert_linear(sd, "full_answer_decoder.emb_proj"),
            "decoder": convert_transformer_stack(
                sd, "full_answer_decoder.transformer_decoder",
                num_decoder_layers, decoder=True),
            "vocab_decoder": convert_linear(
                sd, "full_answer_decoder.vocab_decoder"),
        }

    if kind == "lcgn":
        engine, engine_stats = convert_lcgn_engine(sd, num_iters=lcgn_iters)
    else:
        engine, engine_stats = _ENGINE_CONVERTERS[kind](sd, num_rounds)
    p["engine"] = engine

    pool_base = "graph_global_attention_pooling"
    p["pooling"] = {
        "gate_nn": _seq2(sd, f"{pool_base}.gate_nn"),
        "node_nn": _seq2(sd, f"{pool_base}.node_nn"),
        "ques_nn": _seq2(sd, f"{pool_base}.ques_nn"),
    }

    # Sequential(Dropout, Linear, ELU, Dropout, Linear) -> indices 1 and 4
    # (pipeline_model_gat.py:722-728)
    p["logit_fc_hidden"] = convert_linear(sd, "logit_fc.1")
    p["logit_fc_out"] = convert_linear(sd, "logit_fc.4")

    bs = {"engine": engine_stats} if engine_stats else {}
    return {"params": p, "batch_stats": bs}


def convert_pipeline_gat(
    sd: Mapping[str, np.ndarray],
    num_encoder_layers: int = 3,
    num_decoder_layers: int = 3,
    num_rounds: int = 5,
):
    """Back-compat wrapper: :func:`convert_pipeline` with kind='gat'."""
    return convert_pipeline(sd, "gat", num_encoder_layers,
                            num_decoder_layers, num_rounds)


def to_jax(tree):
    """np -> jnp leaves (applied last so conversion itself is torch/jax-free)."""
    import jax
    import jax.numpy as jnp
    return jax.tree.map(jnp.asarray, tree)
