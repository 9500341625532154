"""Full reference-checkpoint conversion (models/torch_convert.py).

Synthesizes a state_dict with EXACTLY the reference GraphVQA-GAT's parameter
names and shapes (module tree of pipeline_model_gat.py:615-731 at the tiny
test dims), converts it, and asserts the result is structurally identical
(same tree paths, same shapes) to ``PipelineModel.init`` — then runs a
forward pass with the converted weights. Torch is not required: the
converter consumes plain numpy arrays.
"""
import numpy as np
import jax
import jax.numpy as jnp

from graphvqa_tpu.models import PipelineModel
from graphvqa_tpu.models.torch_convert import convert_pipeline_gat, to_jax
from tests.helpers import random_qa_batch, tiny_model_config


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32) * 0.1


def _lin(sd, rng, prefix, i, o):
    sd[f"{prefix}.weight"] = _rand(rng, o, i)
    sd[f"{prefix}.bias"] = _rand(rng, o)


def _seq2(sd, rng, prefix, i, h, o):
    _lin(sd, rng, f"{prefix}.0", i, h)
    _lin(sd, rng, f"{prefix}.2", h, o)


def _mha(sd, rng, prefix, d):
    sd[f"{prefix}.in_proj_weight"] = _rand(rng, 3 * d, d)
    sd[f"{prefix}.in_proj_bias"] = _rand(rng, 3 * d)
    _lin(sd, rng, f"{prefix}.out_proj", d, d)


def _norm(sd, rng, prefix, d):
    sd[f"{prefix}.weight"] = _rand(rng, d)
    sd[f"{prefix}.bias"] = _rand(rng, d)


def _enc_stack(sd, rng, prefix, layers, d, ffn):
    for i in range(layers):
        lp = f"{prefix}.layers.{i}"
        _mha(sd, rng, f"{lp}.self_attn", d)
        _lin(sd, rng, f"{lp}.linear1", d, ffn)
        _lin(sd, rng, f"{lp}.linear2", ffn, d)
        _norm(sd, rng, f"{lp}.norm1", d)
        _norm(sd, rng, f"{lp}.norm2", d)
    _norm(sd, rng, f"{prefix}.norm", d)


def _dec_stack(sd, rng, prefix, layers, d, ffn):
    for i in range(layers):
        lp = f"{prefix}.layers.{i}"
        _mha(sd, rng, f"{lp}.self_attn", d)
        _mha(sd, rng, f"{lp}.multihead_attn", d)
        _lin(sd, rng, f"{lp}.linear1", d, ffn)
        _lin(sd, rng, f"{lp}.linear2", ffn, d)
        for n in ("norm1", "norm2", "norm3"):
            _norm(sd, rng, f"{lp}.{n}", d)
    _norm(sd, rng, f"{prefix}.norm", d)


def _reference_state_dict(cfg):
    """Reference-named state_dict at the tiny config's dims."""
    rng = np.random.default_rng(0)
    sd = {}
    Vt, Et = cfg.text.vocab_size, cfg.text.emb_dim
    Vs, Es = cfg.scene.vocab_size, cfg.scene.emb_dim
    D, FFN, L = (cfg.transformer.hidden_dim, cfg.transformer.ffn_dim,
                 cfg.transformer.num_layers)
    H, C, R = cfg.engine.heads, cfg.scene.emb_dim, cfg.engine.num_rounds
    M = cfg.max_execution_steps

    sd["text_vocab_embedding.weight"] = _rand(rng, Vt, Et)

    sge = "scene_graph_encoder"
    sd[f"{sge}.sg_vocab_embedding.weight"] = _rand(rng, Vs, Es)
    base = f"{sge}.scene_graph_encoding_layer"
    _seq2(sd, rng, f"{base}.edge_model.edge_mlp", 2 * Es + Es, Es, Es)
    _seq2(sd, rng, f"{base}.node_model.node_mlp_1", Es + Es, Es, Es)
    _seq2(sd, rng, f"{base}.node_model.node_mlp_2", 2 * Es, Es, Es)
    sd[f"{sge}.graph_layer_norm.weight"] = _rand(rng, 1)
    sd[f"{sge}.graph_layer_norm.bias"] = _rand(rng, 1)

    _lin(sd, rng, "question_encoder.emb_proj", Et, D)
    _enc_stack(sd, rng, "question_encoder.transformer_encoder", L, D, FFN)

    sd["program_decoder.query_embed.weight"] = _rand(rng, M, D)
    _lin(sd, rng, "program_decoder.emb_proj", Et, D)
    _dec_stack(sd, rng, "program_decoder.coarse_decoder", L, D, FFN)
    _dec_stack(sd, rng, "program_decoder.transformer_decoder", L, D, FFN)
    _lin(sd, rng, "program_decoder.vocab_decoder", D, Vt)

    _lin(sd, rng, "full_answer_decoder.emb_proj", Et, D)
    _dec_stack(sd, rng, "full_answer_decoder.transformer_decoder", L, D, FFN)
    _lin(sd, rng, "full_answer_decoder.vocab_decoder", D, Vt)

    for i in range(R):
        cp = f"gat_seq.convs.{i}"
        sd[f"{cp}.lin_l.weight"] = _rand(rng, H * C, C + D)
        sd[f"{cp}.lin_e.weight"] = _rand(rng, H * C, C + D)
        for a in ("att_l", "att_r", "att_e"):
            sd[f"{cp}.{a}"] = _rand(rng, 1, H, C)
        sd[f"{cp}.bias"] = _rand(rng, C)
    for i in range(R - 1):
        bp = f"gat_seq.bns.{i}"
        sd[f"{bp}.weight"] = _rand(rng, C)
        sd[f"{bp}.bias"] = _rand(rng, C)
        sd[f"{bp}.running_mean"] = _rand(rng, C)
        sd[f"{bp}.running_var"] = np.abs(_rand(rng, C)) + 0.5
        sd[f"{bp}.num_batches_tracked"] = np.asarray(7)

    pool = "graph_global_attention_pooling"
    _seq2(sd, rng, f"{pool}.gate_nn", D, D, 1)
    _seq2(sd, rng, f"{pool}.node_nn", C, D, D)
    _seq2(sd, rng, f"{pool}.ques_nn", D, D, D)

    _lin(sd, rng, "logit_fc.1", 3 * D, cfg.classifier_hidden)
    _lin(sd, rng, "logit_fc.4", cfg.classifier_hidden, cfg.num_answers)
    return sd


def _paths(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        out[key] = tuple(np.shape(leaf))
    return out


def test_reference_checkpoint_converts_to_init_structure():
    cfg = tiny_model_config("gat")
    sd = _reference_state_dict(cfg)
    converted = to_jax(convert_pipeline_gat(
        sd, num_encoder_layers=cfg.transformer.num_layers,
        num_decoder_layers=cfg.transformer.num_layers,
        num_rounds=cfg.engine.num_rounds))

    model = PipelineModel(cfg)
    batch = random_qa_batch(cfg=cfg, dense=True)
    model_in = batch.replace(programs=batch.programs[:, :-1],
                             full_answers=batch.full_answers[:, :-1])
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lcgn_ctx": jax.random.key(2)}
    init_vars = model.init(rngs, model_in)

    want = _paths({"params": init_vars["params"],
                   "batch_stats": init_vars["batch_stats"]})
    got = _paths(converted)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (missing, extra)
    mismatched = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatched, mismatched

    # converted weights actually drive the model
    out = model.apply(converted, model_in, sample=False, deterministic=True,
                      use_running_average=True)
    assert np.isfinite(np.asarray(out.short_answer_logits)).all()

    # spot-check a couple of value mappings (transpose + packed split)
    np.testing.assert_array_equal(
        np.asarray(converted["params"]["engine"]["conv_0"]["lin_lr"]),
        sd["gat_seq.convs.0.lin_l.weight"].T)
    q = np.asarray(converted["params"]["question_encoder"]["encoder"]
                   ["layer_0"]["self_attn"]["q_proj"]["kernel"])
    D = cfg.transformer.hidden_dim
    np.testing.assert_array_equal(
        q, sd["question_encoder.transformer_encoder.layers.0"
              ".self_attn.in_proj_weight"][:D].T)
