"""Decompose the production train step's 83 ms (tools/bench_full_model.py).

The fwd/grad chains in bench_train_attribution.py are confounded by XLA
dead-code elimination: with the GAT loss (short-answer CE only,
mainExplain_gat.py:542) the program/full-answer decoders contribute nothing
to the loss, so grad-only chains silently drop them. This tool pins each
component by choosing what the chain RETURNS:

  fwd-min    forward, return short_answer_logits only   (decoders DCE'd)
  fwd-all    forward, return logits + program logits    (decoders forced)
  grad+adam  value_and_grad + Adam, return params       (metrics DCE'd,
             program decoder STILL forced: its argmax feeds no output but
             out is not returned — decoders DCE'd here too)
  step       the production train_step                  (everything)

Run: python tools/bench_step_breakdown.py [--graphs 512]
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=512)
    ap.add_argument("--iters", type=int, nargs=2, default=(2, 8))
    args = ap.parse_args()

    import jax
    # shipping default (cli/train_cli.py --prng rbg); override via env
    import os
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("JAX_DEFAULT_PRNG_IMPL", "rbg"))
    import jax.numpy as jnp

    from bench import make_batch
    from graphvqa_tpu.config import BatchConfig, CONFIG_FACTORY, Config, \
        TrainConfig
    from graphvqa_tpu.core.graph import QABatch
    from graphvqa_tpu.models import PipelineModel
    from graphvqa_tpu.train.loop import _teacher_inputs, make_train_step
    from graphvqa_tpu.train.losses import total_loss
    from graphvqa_tpu.train.train_state import create_train_state

    print("devices:", jax.devices(), flush=True)
    cfg = CONFIG_FACTORY["gat"]()
    B = args.graphs
    bcfg = BatchConfig(num_graphs=B, layout="dense", nodes_per_graph=64,
                       edges_per_graph=256, question_len=32, program_len=16,
                       full_answer_len=20)
    graphs, real_edges = make_batch(num_graphs=B, dense=True)
    graphs = jax.tree.map(jnp.asarray, graphs)
    rng = np.random.default_rng(0)
    V = cfg.model.text.vocab_size
    M = cfg.model.max_execution_steps
    batch = QABatch(
        graphs=graphs,
        questions=jnp.asarray(rng.integers(4, V, (B, bcfg.question_len)),
                              jnp.int32),
        programs=jnp.asarray(rng.integers(4, V, (B * M, bcfg.program_len)),
                             jnp.int32),
        full_answers=jnp.asarray(
            rng.integers(4, V, (B, bcfg.full_answer_len)), jnp.int32),
        short_answer_label=jnp.asarray(
            rng.integers(0, cfg.model.num_answers, (B,)), jnp.int32),
    )
    model = PipelineModel(cfg.model)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lcgn_ctx": jax.random.key(2)}
    variables = model.init(rngs, _teacher_inputs(batch))
    state = create_train_state(variables)
    pad = cfg.model.text.pad_idx
    tc = TrainConfig()

    def timed(name, chain, *chain_args):
        def run(n):
            t0 = time.perf_counter()
            out = chain(*chain_args, n)
            _ = np.asarray(out)[()]
            return time.perf_counter() - t0
        lo, hi = args.iters
        run(lo); run(hi)
        t_lo = min(run(lo) for _ in range(2))
        t_hi = min(run(hi) for _ in range(2))
        per = (t_hi - t_lo) / (hi - lo)
        print(f"{name}: {per*1e3:.1f} ms/step", flush=True)
        return per

    def fwd(params, batch, want_all):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            _teacher_inputs(batch), sample=False, deterministic=False,
            use_running_average=False,
            rngs={"dropout": jax.random.key(1), "lcgn_ctx": jax.random.key(2)},
            mutable=["batch_stats"])
        if want_all:
            return (out.short_answer_logits.mean()
                    + out.program_logits.mean()
                    + out.full_answer_logits.mean())
        return out.short_answer_logits.mean()

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def fwd_chain(params, batch, want_all, n):
        def body(i, c):
            q = batch.replace(questions=batch.questions + (c == 1e9))
            return c + fwd(params, q, want_all) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("fwd-min (decoders DCE'd)", fwd_chain, state.params, batch, False)
    timed("fwd-all (decoders forced)", fwd_chain, state.params, batch, True)

    def loss_fn(params, batch):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            _teacher_inputs(batch), sample=False, deterministic=False,
            use_running_average=False,
            rngs={"dropout": jax.random.key(1), "lcgn_ctx": jax.random.key(2)},
            mutable=["batch_stats"])
        loss, _ = total_loss(
            out, batch.programs[:, 1:], batch.full_answers[:, 1:],
            batch.short_answer_label, pad,
            bitmap_true=batch.graphs.exec_bitmap,
            node_mask=batch.graphs.node_mask,
            use_program_loss=tc.use_program_loss,
            use_full_answer_loss=tc.use_full_answer_loss,
            use_bitmap_loss=tc.use_bitmap_loss)
        return loss, mutated

    @functools.partial(jax.jit, static_argnums=(2,))
    def grad_adam_chain(state0, batch, n):
        def body(i, st):
            grads, mutated = jax.grad(
                lambda p: loss_fn(p, batch), has_aux=True)(st.params)
            return st.apply_gradients(grads,
                                      new_batch_stats=mutated["batch_stats"])
        st = jax.lax.fori_loop(0, n, body, state0)
        return st.params["logit_fc_out"]["bias"][0]

    timed("grad+adam (metrics+decoders DCE'd)", grad_adam_chain, state, batch)

    train_step = make_train_step(model, Config(model=cfg.model, batch=bcfg,
                                               train=tc))

    @functools.partial(jax.jit, static_argnums=(2,))
    def step_chain(state0, batch, n):
        def body(i, st):
            st2, _ = train_step(st, batch, jax.random.key(0))
            return st2
        st = jax.lax.fori_loop(0, n, body, state0)
        return st.params["logit_fc_out"]["bias"][0]

    timed("step (production)", step_chain, state, batch)


if __name__ == "__main__":
    main()
