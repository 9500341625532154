"""Benchmark harness: edges/s through the language-conditioned GAT engine.

Headline metric: per-round edge traversals per second through the flagship
5-round GAT message-passing engine (SDDMM + segment softmax + SpMM per round)
on a GQA-shaped synthetic batch — the hottest loop of the reference
(gat_skip.py:254-276, SURVEY.md §3.1) and the metric BASELINE.json names.
The reference publishes no throughput numbers, so ``vs_baseline`` compares the
dst-sorted packed engine against a naive unsorted-scatter formulation of the
same math measured in the same run (the torch_scatter-style layout a direct
port would use).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra detail lines go to stderr.
"""
import functools
import json
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(num_graphs=512, avg_nodes=17, avg_edges=90, seed=0,
               sort_by_dst=True, dense=False):
    from graphvqa_tpu.core.packing import (
        GraphSample, pack_graphs, pack_graphs_dense,
        pick_bucket, pick_dense_epg, pick_dense_npg)

    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(num_graphs):
        n = max(2, int(rng.normal(avg_nodes, 6)))
        e = n + max(n, int(rng.normal(avg_edges, 25)))  # incl self-loops
        samples.append(GraphSample(
            node_tokens=rng.integers(2, 2000, size=(n, 12)).astype(np.int32),
            edge_src=rng.integers(0, n, size=e).astype(np.int32),
            edge_dst=rng.integers(0, n, size=e).astype(np.int32),
            edge_tokens=rng.integers(2, 2000, size=(e, 1)).astype(np.int32),
            edge_sym=rng.random(e) > 0.7,
        ))
    total_nodes = sum(s.num_nodes for s in samples)
    total_edges = sum(s.num_edges for s in samples)
    n_pad, e_pad = pick_bucket(total_nodes, total_edges)
    if dense:
        npg = pick_dense_npg(max(s.num_nodes for s in samples))
        epg = pick_dense_epg(max(s.num_edges for s in samples))
        gb = pack_graphs_dense(samples, npg, epg)
        return gb, total_edges
    gb = pack_graphs(samples, n_pad, e_pad, sort_by_dst=sort_by_dst)
    return gb, total_edges


def bench_gat_engine(graph, real_edges, rounds=5, heads=4, channels=300,
                     ins_dim=512, iters=(8, 40), label="sorted",
                     dtype="float32"):
    """Time the engine with chained iterations inside one compiled loop.

    The axon relay elides repeated identical executions and resolves
    block_until_ready lazily, so the only reliable clock is: chain the engine
    output back into its input inside a jitted fori_loop, fetch a scalar of
    the result, and difference two loop counts to cancel the fixed tunnel
    overhead.
    """
    import jax
    import jax.numpy as jnp
    from graphvqa_tpu.nn.gnn import GATSeq

    # NOTE: everything the jitted fn touches must be an *argument* — closure-
    # captured device arrays are downloaded through the relay at trace time
    # (minutes for MBs), since jit embeds closures as constants.
    graph = jax.tree.map(jnp.asarray, graph)
    engine = GATSeq(out_channels=channels, num_rounds=rounds, heads=heads,
                    dropout=0.0, dtype=jnp.dtype(dtype))
    key = jax.random.key(0)
    x = jax.random.normal(key, (graph.nodes_pad, channels), jnp.float32)
    e = jax.random.normal(key, (graph.edges_pad, channels), jnp.float32)
    ins = jax.random.normal(key, (rounds, graph.num_graphs, ins_dim),
                            jnp.float32)
    variables = jax.jit(engine.init)({"params": key}, graph, x, e, ins)
    _log(f"[{label}] init done")

    @functools.partial(jax.jit, static_argnums=(5,))
    def chain(v, graph, x0, e, ins, n):
        def body(i, x):
            h = engine.apply(v, graph, x, e, ins, deterministic=True,
                             use_running_average=True)
            # renormalize so the chain stays finite
            return h * jax.lax.rsqrt(jnp.mean(h * h) + 1e-6)
        return jax.lax.fori_loop(0, n, body, x0)

    def run(n):
        t0 = time.perf_counter()
        out = chain(variables, graph, x, e, ins, n)
        _ = np.asarray(out[:1, :1])  # force real execution through the relay
        return time.perf_counter() - t0

    n_lo, n_hi = iters
    run(n_lo)  # compile+warm both loop counts
    run(n_hi)
    t_lo = min(run(n_lo) for _ in range(2))
    t_hi = min(run(n_hi) for _ in range(2))
    per_iter = max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)
    eps = rounds * real_edges / per_iter
    _log(f"[{label}] nodes_pad={graph.nodes_pad} edges_pad={graph.edges_pad} "
         f"real_edges={real_edges} rounds={rounds} "
         f"time/iter={per_iter*1e3:.2f}ms edges/s={eps:.3e}")
    return eps


def bench_other_engine(graph, real_edges, kind, channels=300, ins_dim=512,
                       rounds=5, iters=(8, 40), dtype="bfloat16"):
    """Time the GCN/GINE/LCGN dense engines (VERDICT r2 weak 5) with the
    same chained-fori_loop harness as the GAT path."""
    import jax
    import jax.numpy as jnp
    from graphvqa_tpu.nn.gnn import GCNSeq, GINESeq, LCGNSeq

    graph = jax.tree.map(jnp.asarray, graph)
    key = jax.random.key(0)
    N, E, B = graph.nodes_pad, graph.edges_pad, graph.num_graphs
    dt = jnp.dtype(dtype)
    if kind == "gcn":
        engine = GCNSeq(out_channels=channels, num_rounds=rounds,
                        dropout=0.0, dtype=dt)
    elif kind == "gine":
        engine = GINESeq(out_channels=channels, num_rounds=rounds,
                         dropout=0.0, dtype=dt)
    else:
        engine = LCGNSeq(out_channels=ins_dim, max_iters=4, dropout=0.0,
                         dtype=dt)
        rounds = 4
    x = jax.random.normal(key, (N, channels), jnp.float32)
    e = jax.random.normal(key, (E, channels), jnp.float32)
    ins = jax.random.normal(key, (rounds, B, ins_dim), jnp.float32)
    q = jax.random.normal(key, (B, ins_dim), jnp.float32)
    lstm = jax.random.normal(key, (B, 30, ins_dim), jnp.float32)

    rngs = {"params": key, "lcgn_ctx": jax.random.key(1)}

    def fwd(v, graph, x):
        if kind == "gcn":
            return engine.apply(v, graph, x, ins, deterministic=True,
                                use_running_average=True)
        if kind == "gine":
            return engine.apply(v, graph, x, e, ins, deterministic=True,
                                use_running_average=True)
        return engine.apply(v, graph, x, q, lstm, deterministic=True,
                            use_running_average=True,
                            rngs={"lcgn_ctx": jax.random.key(2)})

    variables = jax.jit(lambda g, xx: engine.init(rngs, g, xx, *(
        (ins,) if kind == "gcn" else (e, ins) if kind == "gine"
        else (q, lstm))))(graph, x)
    _log(f"[{kind}] init done")

    out_dim = ins_dim if kind == "lcgn" else channels

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain(v, graph, x0, n):
        def body(i, x):
            h = fwd(v, graph, x)
            h = h * jax.lax.rsqrt(jnp.mean(h * h) + 1e-6)
            if out_dim != x.shape[-1]:
                h = h[:, :x.shape[-1]]
            return h.astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x0)

    def run(n):
        t0 = time.perf_counter()
        out = chain(variables, graph, x, n)
        _ = np.asarray(out[:1, :1])
        return time.perf_counter() - t0

    n_lo, n_hi = iters
    run(n_lo); run(n_hi)
    t_lo = min(run(n_lo) for _ in range(2))
    t_hi = min(run(n_hi) for _ in range(2))
    per_iter = max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)
    eps = rounds * real_edges / per_iter
    _log(f"[{kind}] rounds={rounds} time/iter={per_iter*1e3:.2f}ms "
         f"edges/s={eps:.3e}")
    return eps


def main():
    import argparse
    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument("--all-engines", action="store_true",
                    help="also time the GCN/GINE/LCGN dense engines "
                         "(detail lines on stderr; JSON line unchanged)")
    ap.add_argument("--no-full-model", action="store_true",
                    help="skip the full-model train/eval QA/s measurement "
                         "(engine microbenchmark only)")
    ap.add_argument("--quick", action="store_true",
                    help="dense-bf16 engine only (for kernel A/Bs): skips "
                         "the f32/flat/naive runs and the full model; "
                         "vs_baseline uses the recorded 2.8 M/s naive "
                         "number instead of re-measuring it")
    args = ap.parse_args()
    _log("devices:", jax.devices())

    # production path: dense per-graph layout -> batched MXU matmuls at the
    # shipping bfloat16 default (ModelConfig.dtype); f32 kept as detail
    graph_dense, real_edges = make_batch(dense=True)
    eps_dense = bench_gat_engine(graph_dense, real_edges, label="dense-bf16",
                                 dtype="bfloat16")
    if args.quick:
        print(json.dumps({
            "metric": "gat_engine_edge_traversals_per_s",
            "value": round(eps_dense, 1),
            "unit": "edges/s",
            "vs_baseline": round(eps_dense / 2.8e6, 3),
        }), flush=True)
        return
    bench_gat_engine(graph_dense, real_edges, label="dense-f32")

    if args.all_engines:
        for kind in ("gcn", "gine", "lcgn"):
            bench_other_engine(graph_dense, real_edges, kind)

    graph_sorted, _ = make_batch(sort_by_dst=True)
    bench_gat_engine(graph_sorted, real_edges, label="flat-sorted")

    # naive baseline: identical math, unsorted flat edge list (what a direct
    # torch_scatter port would feed XLA)
    graph_unsorted, _ = make_batch(sort_by_dst=False)
    eps_unsorted = bench_gat_engine(graph_unsorted, real_edges,
                                    label="flat-unsorted-baseline")

    result = {
        "metric": "gat_engine_edge_traversals_per_s",
        "value": round(eps_dense, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps_dense / eps_unsorted, 3),
    }

    # system-level headline next to the engine microbenchmark (VERDICT r4
    # item 9): full-model train-step and greedy-decode eval-step QA pairs/s
    # at production dims — the numbers a round of host/dispatch/system work
    # actually moves
    if not args.no_full_model:
        import contextlib
        import io
        import pathlib
        sys.path.insert(0, str(pathlib.Path(__file__).parent / "tools"))
        from bench_full_model import measure
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fm = measure()
        _log(buf.getvalue())
        result["train_qa_per_s"] = round(fm["train_qa_per_s"], 1)
        result["eval_qa_per_s"] = round(fm["eval_qa_per_s"], 1)
        result["train_ms_per_step"] = round(fm["train_s_per_step"] * 1e3, 2)
        result["eval_ms_per_step"] = round(fm["eval_s_per_step"] * 1e3, 2)

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
