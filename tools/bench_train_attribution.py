"""Attribute the full training-step time (tools/bench_full_model.py) on TPU.

Times, in one chained-fori_loop harness each (relay-proof, see bench.py):
  fwd        — teacher-forced forward + loss only
  grad       — value_and_grad of the loss (no Adam, no metrics)
  grad-noemb — same, but with every embedding table wrapped in stop_gradient
               (kills the [tokens]-row scatter-adds that embedding backward
               lowers to on TPU — isolates their cost)
  step       — the production train_step (grad + Adam + in-graph metrics)

Run: python tools/bench_train_attribution.py [--graphs 512]
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

EMB_KEYS = ("text_vocab_embedding", "sg_vocab_embedding")


def freeze_embeddings(params, stop):
    import jax

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if k in EMB_KEYS:
                out[k] = jax.tree.map(stop, v)
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(params)


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
    from graphvqa_tpu.config import (BatchConfig, CONFIG_FACTORY, Config,
                                     TrainConfig)
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
    full_cfg = Config(model=cfg.model, batch=bcfg, train=TrainConfig())
    tc = full_cfg.train
    pad = cfg.model.text.pad_idx

    def loss_of(params, batch_stats, batch, d_rng):
        model_in = _teacher_inputs(batch)
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            model_in, sample=False, deterministic=False,
            use_running_average=False,
            rngs={"dropout": d_rng, "lcgn_ctx": d_rng},
            mutable=["batch_stats"])
        loss, _ = total_loss(
            out, batch.programs[:, 1:], batch.full_answers[:, 1:],
            batch.short_answer_label, pad,
            bitmap_true=batch.graphs.exec_bitmap,
            node_mask=batch.graphs.node_mask,
            use_program_loss=tc.use_program_loss,
            use_full_answer_loss=tc.use_full_answer_loss,
            use_bitmap_loss=tc.use_bitmap_loss)
        return loss

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

    @functools.partial(jax.jit, static_argnums=(2,))
    def fwd_chain(state, batch, n):
        def body(i, c):
            l = loss_of(state.params, state.batch_stats, batch,
                        jax.random.fold_in(jax.random.key(0), i + c * 0))
            return c + l * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def grad_chain(state, batch, freeze, n):
        def body(i, c):
            def f(params):
                if freeze:
                    params = freeze_embeddings(params, jax.lax.stop_gradient)
                return loss_of(params, state.batch_stats, batch,
                               jax.random.fold_in(jax.random.key(0), i))
            g = jax.grad(f)(state.params)
            return c + g["logit_fc_out"]["bias"][0] * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    train_step = make_train_step(model, full_cfg)

    @functools.partial(jax.jit, static_argnums=(2,))
    def step_chain(state, batch, n):
        def body(i, st):
            st2, _ = train_step(st, batch, jax.random.key(0))
            return st2
        st = jax.lax.fori_loop(0, n, body, state)
        return st.params["logit_fc_out"]["bias"][0]

    t_f = timed("fwd", fwd_chain, state, batch)
    t_g = timed("grad", grad_chain, state, batch, False)
    t_gn = timed("grad-noemb", grad_chain, state, batch, True)
    t_s = timed("step", step_chain, state, batch)
    print(f"backward={(t_g-t_f)*1e3:.1f} ms  "
          f"embedding-scatter share={(t_g-t_gn)*1e3:.1f} ms  "
          f"adam+metrics={(t_s-t_g)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
