"""Edge-partitioned execution of the FULL pipeline model.

Graph-domain context parallelism (SURVEY.md §5) integrated into the real
training step, composed with data parallelism on one mesh:

  * the batch is stacked over the ``data`` axis (DDP replacement, see
    data_parallel.py) and each data shard's **edge slots are striped over the
    ``edge`` axis** (:func:`shard_edges_dense`);
  * inside ``shard_map`` every device runs the whole model on its local edge
    slice with node arrays replicated across the edge axis; the dense ops
    (ops/dense.py) complete destination softmax/aggregation with pmax/psum
    over the edge axis — the two-pass cross-partition softmax of the
    ring-attention blueprint, applied to all engine rounds, the MetaLayer
    encoder, and the execution engine at once (via GraphBatch.edge_axis);
  * gradients come from ``jax.grad`` *through* ``shard_map`` — jax's varying
    manual-axes system (check_vma=True) transposes the collectives, so the
    parameter gradients are exact (asserted against the single-device step in
    tests/test_edge_sharded.py).

Comm volume per GAT round rides ICI: one [B, npg, H] pmax + one psum
(softmax passes) + one psum of [B, H, npg, npg] partial edge-weight matrices —
independent of per-shard edge count, and far smaller than psumming [N, H, C]
node messages.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphvqa_tpu.config import Config
from graphvqa_tpu.core.graph import GraphBatch, QABatch
from graphvqa_tpu.models import PipelineModel
from graphvqa_tpu.train.losses import total_loss
from graphvqa_tpu.train.metrics import (
    program_string_exact_match_acc, topk_accuracy)
from graphvqa_tpu.train.train_state import TrainState

# GraphBatch fields indexed by edge slot
EDGE_FIELDS = ("edge_src", "edge_dst", "edge_tokens", "edge_mask",
               "edge_sym_sign")


def shard_edges_dense(graphs: GraphBatch, k: int) -> GraphBatch:
    """Stripe every graph's dense edge slots across ``k`` edge shards.

    Edge arrays [B*epg, ...] become [k, B*(epg/k), ...]: shard j holds slots
    j, j+k, j+2k, ... of every graph (round-robin, so real edges balance
    across shards even though they sit at the front of each graph's slot
    range). Requires the fully-uniform dense layout.
    """
    B, epg = graphs.num_graphs, graphs.edges_per_graph
    assert graphs.has_dense_layout, "edge sharding needs the dense layout"
    assert epg % k == 0, (epg, k)
    epg_loc = epg // k

    def stripe(a):
        a2 = a.reshape(B, epg_loc, k, *a.shape[1:])
        a2 = jnp.moveaxis(jnp.asarray(a2), 2, 0)
        return a2.reshape(k, B * epg_loc, *a.shape[1:])

    return graphs.replace(
        **{f: stripe(getattr(graphs, f)) for f in EDGE_FIELDS})


def unshard_local_graph(graphs: GraphBatch, axis_name: str = "edge"
                        ) -> GraphBatch:
    """Inside shard_map: strip the leading (now size-1) shard axis from the
    edge fields and mark the batch as edge-partitioned over ``axis_name``."""
    B = graphs.num_graphs
    local = {f: getattr(graphs, f)[0] for f in EDGE_FIELDS}
    epg_loc = local["edge_src"].shape[0] // B
    return graphs.replace(edges_per_graph=epg_loc, edge_axis=axis_name,
                          **local)


def batch_specs(data_axis: str = "data", edge_axis: str = "edge"):
    """PartitionSpec pytree builder for a stacked + edge-sharded QABatch."""
    def spec_of(path, _leaf):
        names = [getattr(p, "name", None) for p in path]
        if names and names[-1] in EDGE_FIELDS:
            return P(data_axis, edge_axis)
        return P(data_axis)
    return spec_of


def stacked_batch_sharding(mesh: Mesh, stacked: QABatch) -> QABatch:
    """NamedShardings matching batch_specs, for jax.device_put."""
    spec_of = batch_specs()
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_of(path, leaf)), stacked)


def prepare_dp_edge_batch(batches, mesh: Mesh) -> QABatch:
    """Host-side: stack per-data-shard batches, stripe edges over the edge
    axis, and device_put with the right shardings."""
    from graphvqa_tpu.parallel.data_parallel import stack_shards
    k = mesh.shape["edge"]
    batches = [b.replace(graphs=shard_edges_dense(b.graphs, k))
               for b in batches]
    stacked = stack_shards([jax.tree.map(jnp.asarray, b) for b in batches])
    return jax.device_put(stacked, stacked_batch_sharding(mesh, stacked))


def _shard_map_vma(f, mesh, in_specs, out_specs):
    from jax import shard_map
    return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def make_dp_edge_train_step(model: PipelineModel, cfg: Config,
                            mesh: Mesh) -> Callable:
    """One jitted training step of the FULL pipeline on a data x edge mesh.

    Use :func:`prepare_dp_edge_batch` to build the stacked input. Gradients
    are exact: identical (up to fp reassociation) to the single-device
    train_step on the concatenated batch.
    """
    pad = cfg.model.text.pad_idx
    tc = cfg.train

    def per_shard_loss(params, batch_stats, step, stacked, rng):
        batch: QABatch = jax.tree.map(lambda x: x[0], stacked)
        graphs = unshard_local_graph(batch.graphs)
        # fold in the data shard only — edge shards MUST share node-path
        # dropout masks (they redundantly compute the same node values)
        shard_rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        d_rng, ctx_rng = jax.random.split(jax.random.fold_in(shard_rng, step))

        model_in = batch.replace(
            graphs=graphs,
            programs=batch.programs[:, :-1],
            full_answers=batch.full_answers[:, :-1])
        programs_target = batch.programs[:, 1:]
        full_answers_target = batch.full_answers[:, 1:]

        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            model_in, sample=False, deterministic=False,
            use_running_average=False,
            rngs={"dropout": d_rng, "lcgn_ctx": ctx_rng},
            mutable=["batch_stats"],
        )
        loss, parts = total_loss(
            out, programs_target, full_answers_target,
            batch.short_answer_label, pad,
            bitmap_true=graphs.exec_bitmap,
            node_mask=graphs.node_mask,
            use_program_loss=tc.use_program_loss,
            use_full_answer_loss=tc.use_full_answer_loss,
            use_bitmap_loss=tc.use_bitmap_loss,
        )
        loss = jax.lax.pmean(loss, "data")

        sa_c, sa_t = topk_accuracy(out.short_answer_logits,
                                   batch.short_answer_label)
        prog_pred = jnp.argmax(out.program_logits, axis=-1)
        (p_c, p_t), (g_c, g_t), (ne_c, ne_t) = program_string_exact_match_acc(
            prog_pred, programs_target, pad, cfg.model.max_execution_steps)
        metrics = {k: jax.lax.pmean(v, "data") for k, v in parts.items()}
        counts = dict(
            short_answer_correct=sa_c, short_answer_total=sa_t,
            program_correct=p_c, program_total=p_t,
            program_group_correct=g_c, program_group_total=g_t,
            program_nonempty_correct=ne_c, program_nonempty_total=ne_t)
        metrics.update(
            {k: jax.lax.psum(v, "data") for k, v in counts.items()})
        metrics["edge_count"] = jax.lax.psum(
            graphs.edge_mask.sum(), ("data", "edge"))
        new_bs = jax.lax.pmean(mutated["batch_stats"], "data")
        return loss, (metrics, new_bs)

    spec_of = batch_specs()

    def mapped_loss(params, batch_stats, step, stacked, rng):
        stacked_specs = jax.tree_util.tree_map_with_path(spec_of, stacked)
        fn = _shard_map_vma(
            per_shard_loss, mesh,
            in_specs=(P(), P(), P(), stacked_specs, P()),
            out_specs=(P(), (P(), P())),
        )
        return fn(params, batch_stats, step, stacked, rng)

    @jax.jit
    def dp_edge_train_step(state: TrainState, stacked: QABatch,
                           rng: jax.Array):
        grad_fn = jax.value_and_grad(
            lambda p: mapped_loss(p, state.batch_stats, state.step,
                                  stacked, rng), has_aux=True)
        (loss, (metrics, new_bs)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        metrics = dict(metrics)
        metrics.setdefault("total", loss)
        return new_state, metrics

    return dp_edge_train_step
