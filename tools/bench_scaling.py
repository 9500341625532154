"""Multi-chip scaling harness: DP x edge mesh sweep + ICI comm-volume model.

On a real pod slice this measures edges/s at every mesh shape; with only one
chip available it still (a) executes the FULL pipeline train step at each
mesh shape on the virtual CPU device mesh (so every sharding compiles and
runs), and (b) prints the analytic per-round ICI communication volume of the
edge partitioning, which is what determines scaling efficiency (BASELINE.md:
">=80% linear at 2+ hosts").

Comm model per GAT round per data shard (B graphs, npg node padding, H
heads, f32):
  pmax  [B, npg, H]        (softmax pass 1)
  psum  [B, npg, H]        (softmax pass 2)
  psum  [B, H, npg, npg]   (partial edge-weight matrices P)
Total bytes = 4 * B*npg*H * (2 + npg). Independent of per-shard edge count:
doubling edge shards halves local SpMM work at constant comm -> efficiency
approaches compute_fraction / (compute_fraction + comm_fraction) with the
collective overlapped by XLA's latency-hiding scheduler where possible.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python tools/bench_scaling.py
On a pod slice: python tools/bench_scaling.py  (real ICI, real timings)
"""
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np

    n = len(jax.devices())
    print(f"devices: {n} x {jax.devices()[0].platform}", flush=True)

    # analytic ICI volume for the production shapes (bench.py batch)
    B, npg, H, rounds = 512, 64, 4, 5
    vol = 4 * B * npg * H * (2 + npg) * rounds
    print(f"ICI comm volume, production shapes (B={B}, npg={npg}, H={H}, "
          f"{rounds} rounds): {vol/1e6:.1f} MB/step/data-shard "
          f"(independent of edge-shard count)", flush=True)
    # v5e ICI ~45 GB/s/link each way -> lower bound on exposed comm
    print(f"  at 45 GB/s ICI: >= {vol/45e9*1e3:.2f} ms/step if fully exposed,"
          " overlapped with local SpMM in practice", flush=True)

    meshes = []
    for d in (1, 2, 4, 8):
        for e in (1, 2, 4):
            if d * e <= n and (d * e == n or d * e in (1, 2, 4)):
                meshes.append((d, e))
    meshes = sorted(set(meshes))

    from __graft_entry__ import _build
    from graphvqa_tpu.config import (
        BatchConfig, Config, EngineConfig, ModelConfig, SceneGraphConfig,
        TextConfig, TrainConfig, TransformerConfig)
    from graphvqa_tpu.parallel import (
        make_dp_edge_train_step, make_mesh, prepare_dp_edge_batch)
    from graphvqa_tpu.train.train_state import create_train_state

    for d, e in meshes:
        mcfg = ModelConfig(
            text=TextConfig(vocab_size=64, emb_dim=16),
            scene=SceneGraphConfig(vocab_size=48, emb_dim=16),
            transformer=TransformerConfig(hidden_dim=32, num_heads=4,
                                          ffn_dim=64, num_layers=1),
            engine=EngineConfig(kind="gat", num_rounds=2, heads=2),
            num_answers=16, max_execution_steps=2,
            program_decode_len=8, full_answer_decode_len=8,
            classifier_hidden=32)
        bcfg = BatchConfig(num_graphs=2, nodes_per_graph=8,
                           edges_per_graph=8 * e, question_len=8,
                           program_len=6, full_answer_len=6)
        cfg = Config(model=mcfg, batch=bcfg, train=TrainConfig())
        mesh = make_mesh(data=d, edge=e, devices=jax.devices()[:d * e])
        model, variables, batch, _, _ = _build(mcfg, bcfg)
        state = create_train_state(variables)
        step = make_dp_edge_train_step(model, cfg, mesh)
        stacked = prepare_dp_edge_batch([batch] * d, mesh)
        t0 = time.perf_counter()
        new_state, metrics = step(state, stacked, jax.random.key(0))
        jax.block_until_ready(new_state.params)
        compile_s = time.perf_counter() - t0
        # steady-state timing (meaningful on real chips only)
        t0 = time.perf_counter()
        for _ in range(3):
            state, metrics = step(state, stacked, jax.random.key(1))
        jax.block_until_ready(state.params)
        step_ms = (time.perf_counter() - t0) / 3 * 1e3
        total_edges = int(np.asarray(metrics["edge_count"]))
        print(f"mesh data={d} x edge={e}: ok loss="
              f"{float(metrics['total']):.4f} edges/step={total_edges} "
              f"compile={compile_s:.1f}s step={step_ms:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
