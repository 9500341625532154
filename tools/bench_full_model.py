"""End-to-end throughput of the FULL pipeline (QA pairs/s) on TPU.

Times (a) the training step (teacher-forced forward + backward + Adam) and
(b) the greedy-decode eval step (KV-cached program sampling, the reference's
SAMPLE_FLAG path) at production dims on a GQA-shaped batch — the serving
metrics BASELINE.json calls "QA pairs/s" that the engine-only bench.py does
not cover.

Relay-proofing: the axon relay elides repeated identical dispatches, so each
step is chained inside one jitted fori_loop. The eval step has no natural
carry, so the loop perturbs the text embedding by carry*1e-30 — forcing a
true sequential dependence through the whole model without changing results.

Run: python tools/bench_full_model.py [--graphs 512]
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def measure(graphs: int = 512, iters=(2, 8)) -> dict:
    """Measure full-model train and greedy-decode eval step times at
    production dims; returns {"train_s_per_step", "train_qa_per_s",
    "eval_s_per_step", "eval_qa_per_s", "params", "real_edges"}. Used by
    main() below and by bench.py's system-level JSON (VERDICT r4 item 9)."""
    import jax
    # shipping default (cli/train_cli.py --prng rbg); override via env
    import os
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("JAX_DEFAULT_PRNG_IMPL", "rbg"))
    import jax.numpy as jnp

    from bench import make_batch
    from graphvqa_tpu.config import BatchConfig, CONFIG_FACTORY
    from graphvqa_tpu.core.graph import QABatch
    from graphvqa_tpu.models import PipelineModel
    from graphvqa_tpu.train.loop import _teacher_inputs
    from graphvqa_tpu.train.train_state import create_train_state

    print("devices:", jax.devices(), flush=True)
    cfg = CONFIG_FACTORY["gat"]()
    B = graphs
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
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"params: {n_params/1e6:.1f}M  batch: {B} questions, "
          f"{real_edges} real edges", flush=True)
    state = create_train_state(variables)

    def timed(name, chain, *chain_args):
        def run(n):
            t0 = time.perf_counter()
            out = chain(*chain_args, n)
            _ = np.asarray(out)[()]
            return time.perf_counter() - t0
        lo, hi = iters
        run(lo); run(hi)
        t_lo = min(run(lo) for _ in range(2))
        t_hi = min(run(hi) for _ in range(2))
        per = (t_hi - t_lo) / (hi - lo)
        print(f"{name}: {per*1e3:.1f} ms/step = {B/per:.0f} QA pairs/s "
              f"({real_edges/per:.3} engine edges/s/round-set)", flush=True)
        return per

    # --- training step (forward+backward+Adam), carried through TrainState
    from graphvqa_tpu.train.loop import make_train_step
    from graphvqa_tpu.config import Config, TrainConfig
    full_cfg = Config(model=cfg.model, batch=bcfg, train=TrainConfig())
    train_step = make_train_step(model, full_cfg)

    @functools.partial(jax.jit, static_argnums=(2,))
    def train_chain(state, batch, n):
        def body(i, st):
            st2, _ = train_step(st, batch, jax.random.key(0))
            return st2
        st = jax.lax.fori_loop(0, n, body, state)
        return st.params["logit_fc_out"]["bias"][0]
    train_per = timed("train step", train_chain, state, batch)

    # --- eval step (greedy decode); carry perturbs the text embedding
    @functools.partial(jax.jit, static_argnums=(2,))
    def eval_chain(state, batch, n):
        def body(i, c):
            params = dict(state.params)
            emb = dict(params["text_vocab_embedding"])
            emb["embedding"] = emb["embedding"] + c * 1e-30
            params["text_vocab_embedding"] = emb
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                _teacher_inputs(batch), sample=True, deterministic=True,
                use_running_average=True, rngs={"lcgn_ctx": jax.random.key(0)})
            return c + out.short_answer_logits[0, 0] * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    eval_per = timed("eval step (greedy decode)", eval_chain, state, batch)
    return {"train_s_per_step": train_per, "train_qa_per_s": B / train_per,
            "eval_s_per_step": eval_per, "eval_qa_per_s": B / eval_per,
            "params": n_params, "real_edges": real_edges}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=512)
    ap.add_argument("--iters", type=int, nargs=2, default=(2, 8))
    args = ap.parse_args()
    measure(graphs=args.graphs, iters=tuple(args.iters))


if __name__ == "__main__":
    main()
