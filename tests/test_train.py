"""Training: loss decreases on the debug fixture; checkpoint roundtrip works."""
import dataclasses
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from graphvqa_tpu.config import BatchConfig, Config, TrainConfig
from graphvqa_tpu.data import GQADataset, build_scene_graph_vocab, build_text_vocab, tokenize
from graphvqa_tpu.models import PipelineModel
from graphvqa_tpu.train.loop import make_eval_step, make_train_step
from graphvqa_tpu.train.train_state import create_train_state, step_lr
from graphvqa_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from tests.helpers import tiny_model_config

DEBUG = pathlib.Path(__file__).resolve().parent.parent / "graphvqa_tpu" / "assets" / "debug"


def _setup(kind="gat", use_program_loss=True):
    sg_vocab = build_scene_graph_vocab()
    data = json.loads((DEBUG / "debug_programs.json").read_text())
    text_vocab = build_text_vocab(data, tokenize)
    ds = GQADataset(DEBUG / "debug_programs.json",
                    DEBUG / "debug_sceneGraphs.json", text_vocab, sg_vocab)
    base = tiny_model_config(kind)
    mcfg = dataclasses.replace(
        base,
        text=dataclasses.replace(base.text, vocab_size=len(text_vocab)),
        scene=dataclasses.replace(base.scene, vocab_size=len(sg_vocab)),
        max_execution_steps=5,
        program_decode_len=12,
        num_answers=1842,  # real label ids (e.g. 'white'=549) must be in range
    )
    bc = BatchConfig(num_graphs=4, nodes_pad=128, edges_pad=1024,
                     question_len=14, program_len=12, full_answer_len=12)
    cfg = Config(model=mcfg, batch=bc,
                 train=TrainConfig(lr=3e-3, use_program_loss=use_program_loss))
    model = PipelineModel(mcfg)
    _, batch = next(ds.iter_batches(bc))
    batch = jax.tree.map(jnp.asarray, batch)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lcgn_ctx": jax.random.key(2)}
    variables = model.init(rngs, batch.replace(
        programs=batch.programs[:, :-1],
        full_answers=batch.full_answers[:, :-1]))
    state = create_train_state(variables, lr=cfg.train.lr,
                               lr_drop=cfg.train.lr_drop)
    return cfg, model, state, batch, ds, text_vocab


def test_loss_decreases_overfit():
    cfg, model, state, batch, *_ = _setup()
    train_step = make_train_step(model, cfg)
    rng = jax.random.key(7)
    first = last = None
    for i in range(12):
        state, m = train_step(state, batch, rng)
        loss = float(m["total"])
        if first is None:
            first = loss
        last = loss
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)


def test_eval_step_runs_and_dumps(tmp_path):
    from graphvqa_tpu.data.vocab import load_answer_maps
    from graphvqa_tpu.train.loop import validate

    cfg, model, state, batch, ds, text_vocab = _setup()
    eval_step = make_eval_step(model, cfg)
    _, label2ans = load_answer_maps()
    dump = tmp_path / "dump_results.json"
    att_dump = tmp_path / "dump_attentions.json"
    res = validate(
        eval_step, state, ds.iter_batches(cfg.batch), jax.random.key(0),
        cfg, text_vocab=text_vocab, label2ans=label2ans, dump_path=str(dump),
        dump_attentions_path=str(att_dump), scenes=ds.sg_data)
    assert 0.0 <= res["short_answer_acc"] <= 100.0
    d = json.loads(dump.read_text())
    assert len(d) == 7
    item = d["07333408"]
    assert item["answer"] == "pipe"
    assert item["question"].startswith("What is on the white wall")
    assert isinstance(item["ground_truth_program_list"], list)
    assert item["ground_truth_program_list"][0] == "select ( wall )"

    # object-based attentions: one entry per real question, rows are
    # [x0, y0, x1, y1, att] with the per-graph softmax summing to 1
    atts = json.loads(att_dump.read_text())
    assert len(atts) == 7
    by_qid = {a["questionId"]: a["attention"] for a in atts}
    rows = by_qid["07333408"]
    assert all(len(r) == 5 for r in rows)
    total = sum(r[4] for r in rows)
    np.testing.assert_allclose(total, 1.0, atol=1e-3)
    for x0, y0, x1, y1, _ in rows:
        assert 0.0 <= x0 <= x1 and 0.0 <= y0 <= y1


def test_step_lr_schedule():
    np.testing.assert_allclose(float(step_lr(1e-4, 90, 0.1, jnp.asarray(0))),
                               1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(step_lr(1e-4, 90, 0.1, jnp.asarray(90))), 1e-5)
    np.testing.assert_allclose(float(step_lr(1e-4, 90, 0.1, jnp.asarray(180))), 1e-6, rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    cfg, model, state, batch, *_ = _setup()
    train_step = make_train_step(model, cfg)
    state, _ = train_step(state, batch, jax.random.key(0))
    state = state.replace(epoch=jnp.asarray(3, jnp.int32))
    save_checkpoint(tmp_path / "ckpt", state)

    fresh = state.replace(
        params=jax.tree.map(jnp.zeros_like, state.params),
        epoch=jnp.asarray(0, jnp.int32))
    restored, start_epoch = restore_checkpoint(tmp_path / "ckpt", fresh)
    assert start_epoch == 4
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_steps_per_dispatch_matches_sequential():
    """K steps inside one lax.scan dispatch == K single dispatches: same
    params, same reduced metrics (rng folds on state.step identically)."""
    cfg, model, state, batch, ds, _ = _setup()
    rng = jax.random.key(9)
    K = 3
    # K distinct batches: perturb labels so the steps genuinely differ
    batches = [batch.replace(short_answer_label=(
        batch.short_answer_label + i) % cfg.model.num_answers)
        for i in range(K)]

    single = make_train_step(model, cfg)
    s_seq = state
    losses = []
    counts = 0
    for b in batches:
        s_seq, m = single(s_seq, b, rng)
        losses.append(float(m["total"]))
        counts += int(m["short_answer_total"])

    multi = make_train_step(model, cfg, steps_per_dispatch=K)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *batches)
    s_multi, ms = multi(state, stacked, rng)

    assert int(s_multi.step) == int(s_seq.step)
    np.testing.assert_allclose(float(ms["total"]), np.mean(losses),
                               rtol=1e-5)
    assert int(ms["short_answer_total"]) == counts
    for a, b in zip(jax.tree.leaves(s_seq.params),
                    jax.tree.leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_clip_grad_bounds_update():
    """--clip-grad: with an extreme clip the update direction's norm is
    bounded; without, identical config takes a larger step."""
    cfg, model, state, batch, ds, _ = _setup()
    from graphvqa_tpu.train.train_state import create_train_state
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    s_clip = create_train_state(variables, lr=cfg.train.lr,
                                clip_grad=1e-6)
    s_free = create_train_state(variables, lr=cfg.train.lr)
    step = make_train_step(model, cfg)
    rng = jax.random.key(1)
    out_c, _ = step(s_clip, batch, rng)
    out_f, _ = step(s_free, batch, rng)

    def delta(a, b):
        return float(sum(
            np.square(np.asarray(x - y, np.float64)).sum()
            for x, y in zip(jax.tree.leaves(a.params),
                            jax.tree.leaves(b.params)))) ** 0.5
    d_clip = delta(out_c, s_clip)
    d_free = delta(out_f, s_free)
    assert d_clip < d_free  # clipping shrank the step
    assert d_clip > 0       # but did not zero it
