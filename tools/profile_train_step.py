"""Capture a jax.profiler trace of the production train step on TPU and
print the top HLO ops by self time (xprof hlo_stats / op_profile parsing).

The chained-loop benches give totals; this pins WHICH ops eat the backward
(VERDICT r2 item 4: "attack the top attribution item").

Run: python tools/profile_train_step.py [--graphs 512] [--steps 3]
"""
import argparse
import glob
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/graphvqa_profile")
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
    train_step = make_train_step(model, Config(model=cfg.model, batch=bcfg,
                                               train=TrainConfig()))
    # compile + warm
    state, _ = train_step(state, batch, jax.random.key(0))
    jax.block_until_ready(state.params)

    with jax.profiler.trace(args.out):
        for i in range(args.steps):
            state, metrics = train_step(state, batch, jax.random.key(i))
        jax.block_until_ready(state.params)
    print("trace captured", flush=True)

    paths = sorted(glob.glob(args.out + "/**/*.xplane.pb", recursive=True))
    print("xplanes:", paths, flush=True)
    from xprof.convert import raw_to_tool_data as r2t
    names = r2t.xspace_to_tool_names(paths[-1:])
    print("tools:", names, flush=True)
    for tool in ("hlo_stats", "framework_op_stats"):
        if not any(tool in n for n in names):
            continue
        try:
            data, _ = r2t.xspace_to_tool_data(paths[-1:], tool, {})
        except Exception as e:
            print(tool, "failed:", e)
            continue
        out = args.out + f"/{tool}.out"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print("wrote", out, len(data), flush=True)


if __name__ == "__main__":
    main()
