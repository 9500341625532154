"""Cost attribution for the GAT engine round on TPU.

Times progressively larger slices of the per-round computation with the
relay-proof chain harness (see bench.py): each variant is a fori_loop-chained
jitted fn over bench shapes, all inputs passed as arguments.

Run: python tools/bench_attribution.py
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

    graph, real_edges = make_batch(blocked=True)
    graph = jax.tree.map(jnp.asarray, graph)
    N, E = graph.nodes_pad, graph.edges_pad
    H, C, D = 4, 300, 1200
    key = jax.random.key(0)
    x = jax.random.normal(key, (N, C), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (C, D)) * 0.05
    attn = jax.random.normal(jax.random.fold_in(key, 2), (E, H), jnp.float32)

    def timed(name, fn, *args, reps=(4, 20)):
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
        print(f"{name}: {per*1e3:.2f} ms", flush=True)
        return per

    g = graph

    # 1. projection matmul only
    timed("matmul xw", lambda x, w: (x @ w)[:, :C], x, w)

    # 2. + gather at edge_src
    def f_gather(x, w):
        xw = x @ w
        m = jnp.take(xw, g.edge_src, axis=0)
        return m[:N, :C]
    timed("matmul+gather[E,1200]", f_gather, x, w)

    # 3. + multiply by alpha + flat segment_sum
    def f_flat_agg(x, w, attn):
        xw = (x @ w).reshape(N, H, C)
        m = jnp.take(xw, g.edge_src, axis=0) * attn[..., None]
        out = jax.ops.segment_sum(m.reshape(E, D), g.edge_dst,
                                  num_segments=N, indices_are_sorted=True)
        return out[:, :C]
    timed("matmul+gather+mult+segsum", f_flat_agg, x, w, attn)

    # 4. + multiply + blocked one-hot contraction
    def f_blk_agg(x, w, attn):
        from graphvqa_tpu.ops.blocked import blocked_segment_sum
        xw = (x @ w)
        nb, BE = g.blk_src.shape
        ablk = jnp.take(attn, g.blk_edge_perm.reshape(-1),
                        axis=0).reshape(nb, BE, H)
        m = (jnp.take(xw.reshape(N, H, C), g.blk_src.reshape(-1), axis=0)
             .reshape(nb, BE, H, C) * ablk[..., None]).reshape(nb, BE, D)
        out = blocked_segment_sum(g, m)
        return out[:, :C]
    timed("matmul+gather+mult+blockedsum", f_blk_agg, x, w, attn)

    # 5. softmax segment ops only (max+sum over [E,H])
    def f_softmax(x, w, attn):
        from graphvqa_tpu.ops.segment import segment_softmax
        a = segment_softmax(attn + x[0, 0], g.edge_dst, N,
                            mask=g.edge_mask, indices_are_sorted=True)
        return jnp.broadcast_to(a.sum(axis=1, keepdims=True), (E, 1))[:N, :1] + x[:, :1]
    timed("flat segment_softmax [E,4]", f_softmax, x, w, attn)


if __name__ == "__main__":
    main()
