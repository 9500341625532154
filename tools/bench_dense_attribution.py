"""Cost attribution for the dense-layout GAT round on TPU.

Times each piece of the dense round (ops/dense.py) plus layout variants of
the two suspect ops — the [E, H] edge-weight scatter into the dense
per-graph matrix, and the batched aggregation einsum — with the relay-proof
chain harness (see bench.py). Guides the layout choice; results recorded in
ROOFLINE.md.

Run: python tools/bench_dense_attribution.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from bench import make_batch

    graph, real_edges = make_batch(dense=True)
    graph = jax.tree.map(jnp.asarray, graph)
    N, E = graph.nodes_pad, graph.edges_pad
    npg, B = graph.nodes_per_graph, graph.num_graphs
    H, C = 4, 300
    D = H * C
    print(f"N={N} E={E} npg={npg} B={B}", flush=True)
    key = jax.random.key(0)
    x = jax.random.normal(key, (N, C), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (C, D)) * 0.05
    attn = jax.nn.softmax(
        jax.random.normal(jax.random.fold_in(key, 2), (E, H)), axis=0)
    alpha_n = jax.random.normal(jax.random.fold_in(key, 3), (N, H)) * 0.1

    def fold(x, s):
        """Fold a scalar into the chain carry WITHOUT letting XLA dead-code
        eliminate the computation: multiply by a tiny non-zero constant
        (``* 0.0`` is constant-folded and the whole producer is DCE'd)."""
        return x + s.astype(x.dtype) * 1e-30

    def timed(name, fn, *args, reps=(4, 40)):
        @functools.partial(jax.jit, static_argnums=0)
        def chain(n, *a):
            def body(i, carry):
                out = fn(carry, *a[1:])
                return out * jax.lax.rsqrt(jnp.mean(out * out) + 1e-6)
            return jax.lax.fori_loop(0, n, body, a[0])

        def run(n):
            t0 = time.perf_counter()
            out = chain(n, *args)
            _ = np.asarray(out[:1, :1])
            return time.perf_counter() - t0

        lo, hi = reps
        run(lo); run(hi)
        t_lo = min(run(lo) for _ in range(2))
        t_hi = min(run(hi) for _ in range(2))
        per = (t_hi - t_lo) / (hi - lo)
        print(f"{name}: {per*1e3:.3f} ms", flush=True)
        return per

    g = graph
    eg, dl, sl = g.edge_dense_indices()

    # 1. projection matmul
    timed("xw matmul [N,300]@[300,1200] f32", lambda x, w: (x @ w)[:, :C], x, w)
    timed("xw matmul bf16",
          lambda x, w: (x.astype(jnp.bfloat16)
                        @ w.astype(jnp.bfloat16)).astype(jnp.float32)[:, :C],
          x, w)

    # 2. SDDMM logits: three gathers + leaky_relu on [E, H]
    def f_sddmm(x, alpha_n):
        al = jnp.take(alpha_n, g.edge_src, axis=0)
        ar = jnp.take(alpha_n, g.edge_dst, axis=0)
        lg = jax.nn.leaky_relu(al + ar, 0.2)
        return fold(x, lg.sum())  # fold into chain carry
    timed("SDDMM gathers+lrelu [E,4]", f_sddmm, x, alpha_n)

    # 3. segment softmax on [E, H]
    def f_softmax(x, alpha_n):
        from graphvqa_tpu.ops.segment import segment_softmax
        lg = (jnp.take(alpha_n, g.edge_src, axis=0)
              + jnp.take(alpha_n, g.edge_dst, axis=0))
        a = segment_softmax(lg, g.edge_dst, N, mask=g.edge_mask,
                            indices_are_sorted=True)
        return fold(x, a.sum())
    timed("SDDMM+segment_softmax [E,4]", f_softmax, x, alpha_n)

    # 4a. P scatter, H-last layout ([N*npg, H] segment_sum) — the slow path
    # the one-hot contraction replaced
    def f_scatter_hlast(x, attn):
        ew = jnp.where(g.edge_mask[:, None], attn, 0.0)
        idx = g.edge_dst * npg + sl
        a = jax.ops.segment_sum(ew, idx, num_segments=N * npg)
        return fold(x, a.sum())
    timed("P scatter H-last [N*npg,4] (old)", f_scatter_hlast, x, attn)

    # 4b. one-hot P build + aggregation (shipped dense_scatter_matmul)
    def f_onehot_spmm(x, w, attn):
        from graphvqa_tpu.ops.dense import dense_scatter_matmul
        xw = (x @ w).reshape(N, H, C)
        out = dense_scatter_matmul(g, attn, xw)
        return out.mean(axis=1)
    timed("one-hot SpMM (P build + agg)", f_onehot_spmm, x, w, attn)

    # 4c. scatter-free segment softmax
    def f_dense_softmax(x, attn):
        from graphvqa_tpu.ops.dense import dense_segment_softmax
        a = dense_segment_softmax(g, attn)
        return fold(x, a.sum())
    timed("dense_segment_softmax", f_dense_softmax, x, attn)

    # 4d. per-edge message aggregation via one-hot (MetaLayer/GINE path)
    def f_dense_aggregate(x, w):
        from graphvqa_tpu.ops.dense import dense_aggregate_edges
        msgs = jnp.take(x, g.edge_src, axis=0)  # [E, 300]
        out = dense_aggregate_edges(g, msgs, reduce="mean")
        return fold(out, w[0, 0])
    timed("dense_aggregate_edges [E,300] mean", f_dense_aggregate, x, w)

    # 5a. aggregation einsum, H-last P
    p_hlast = jax.random.normal(key, (B, npg, npg, H)) * 0.01
    xw4 = jax.random.normal(key, (B, npg, H, C)) * 0.1

    def f_einsum_hlast(x, p, v):
        out = jnp.einsum("bijh,bjhc->bihc", p, v,
                         preferred_element_type=jnp.float32)
        return fold(x, out.sum())
    timed("agg einsum bijh,bjhc f32", f_einsum_hlast, x, p_hlast, xw4)

    # 5b. aggregation einsum, [B,H,i,j] P
    p_bhij = jnp.transpose(p_hlast, (0, 3, 1, 2)).copy()
    xw_bhjc = jnp.transpose(xw4, (0, 2, 1, 3)).copy()

    def f_einsum_bhij(x, p, v):
        out = jnp.einsum("bhij,bhjc->bhic", p, v,
                         preferred_element_type=jnp.float32)
        return fold(x, out.sum())
    timed("agg einsum bhij,bhjc f32", f_einsum_bhij, x, p_bhij, xw_bhjc)

    def f_einsum_bf16(x, p, v):
        out = jnp.einsum("bhij,bhjc->bhic", p.astype(jnp.bfloat16),
                         v.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return fold(x, out.sum())
    timed("agg einsum bhij bf16", f_einsum_bf16, x, p_bhij, xw_bhjc)

    # 5c. P-build/agg variants: per-head loop vs fused-heads contraction,
    # f32 and bf16 (decides dense_scatter_matmul's internal formulation)
    from graphvqa_tpu.ops.dense import onehot_dst, onehot_src

    def p_build_perhead(x, attn, dtv=jnp.float32):
        ohd = onehot_dst(g, dtv)
        ohs = onehot_src(g, dtv)
        w = jnp.where(g.edge_mask[:, None], attn, 0.0)
        w = w.reshape(B, -1, H).astype(dtv)
        acc = 0.0
        for h in range(H):
            p = jnp.einsum("bei,bej->bij", ohd * w[:, :, h:h + 1], ohs,
                           preferred_element_type=jnp.float32)
            acc = acc + p.sum()
        return fold(x, acc)
    timed("P build per-head f32", p_build_perhead, x, attn)

    def p_build_fused(x, attn, dtv=jnp.float32):
        from graphvqa_tpu.ops.dense import _dense_edge_weight_matrix
        p = _dense_edge_weight_matrix(g, attn, dtv)
        return fold(x, p.sum())
    timed("P build fused-heads f32", p_build_fused, x, attn)
    timed("P build per-head bf16",
          lambda x, a: p_build_perhead(x, a, jnp.bfloat16), x, attn)
    timed("P build fused-heads bf16",
          lambda x, a: p_build_fused(x, a, jnp.bfloat16), x, attn)

    def spmm_perhead(x, w, attn):
        ohd = onehot_dst(g, jnp.float32)
        ohs = onehot_src(g, jnp.float32)
        xw = (x @ w).reshape(N, H, C)
        ew = jnp.where(g.edge_mask[:, None], attn, 0.0).reshape(B, -1, H)
        v = xw.reshape(B, npg, H, C)
        outs = []
        for h in range(H):
            p = jnp.einsum("bei,bej->bij", ohd * ew[:, :, h:h + 1], ohs,
                           preferred_element_type=jnp.float32)
            outs.append(jnp.einsum("bij,bjc->bic", p, v[:, :, h, :],
                                   preferred_element_type=jnp.float32))
        return jnp.stack(outs, axis=2).reshape(N, H, C).mean(axis=1)
    timed("one-hot SpMM per-head (old)", spmm_perhead, x, w, attn)

    # 6. full dense_gat_aggregate as shipped (returns head-averaged [N, C])
    def f_full(x, w, alpha_n, attn):
        from graphvqa_tpu.ops.dense import dense_gat_aggregate
        xw = (x @ w).reshape(N, H, C)
        out, _ = dense_gat_aggregate(g, xw, alpha_n, alpha_n, attn)
        return out
    timed("full dense round (shipped)", f_full, x, w, alpha_n, attn)

    # 7. GATLayer full round via flax for reference
    def f_batchnorm(x, w):
        from graphvqa_tpu.nn.norm import MaskedBatchNorm
        bn = MaskedBatchNorm(C)
        v = bn.init(jax.random.key(0), x, mask=g.node_mask,
                    use_running_average=False)

        def apply(x):
            y, _ = bn.apply(v, x, mask=g.node_mask,
                            use_running_average=False,
                            mutable=["batch_stats"])
            return y
        return fold(apply(x), w[0, 0])
    timed("masked batchnorm [N,300]", f_batchnorm, x, w)


if __name__ == "__main__":
    main()
