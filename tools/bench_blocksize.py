"""Sweep blocked-layout block sizes for the one-hot contraction."""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from bench import make_batch
    from graphvqa_tpu.core.packing import build_blocked_edges

    flat, real_edges = make_batch(blocked=False)
    N, E = flat.nodes_pad, flat.edges_pad
    H, C, D = 4, 300, 1200
    # device-side data: host->device uploads through the relay are slow
    key = jax.random.key(0)
    x = jax.random.normal(key, (N, D), jnp.float32)
    attn = jax.random.normal(jax.random.fold_in(key, 1), (E, H), jnp.float32)

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
        print(f"{name}: {(t_hi-t_lo)/(hi-lo)*1e3:.2f} ms", flush=True)

    # sweep (block_nodes, slots_per_node); 16x16 was the r1 shipping default
    for BN, spn in ((8, 16), (16, 16), (32, 12), (64, 12), (128, 12)):
        g = jax.tree.map(jnp.asarray,
                         build_blocked_edges(flat, BN, spn))
        nb, BE = g.blk_src.shape
        spill = int(np.asarray(g.spill_mask).sum())
        print(f"BN={BN} BE={BE} nb={nb} spill={spill}", flush=True)

        for dt, dname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            def f_blk(x, attn, g=g, nb=nb, BE=BE, dt=dt, BN=BN):
                xw = x
                ablk = jnp.take(attn, g.blk_edge_perm.reshape(-1),
                                axis=0).reshape(nb, BE, H)
                m = (jnp.take(xw.reshape(N, H, C), g.blk_src.reshape(-1),
                              axis=0).reshape(nb, BE, H, C)
                     * ablk[..., None]).reshape(nb, BE, D)
                onehot = (
                    g.blk_dst_local[:, None, :]
                    == jax.lax.broadcasted_iota(jnp.int32, (1, BN, 1), 1))
                onehot = (onehot & g.blk_mask[:, None, :]).astype(dt)
                out = jnp.einsum("nbe,ned->nbd", onehot, m.astype(dt),
                                 preferred_element_type=jnp.float32)
                return out.reshape(N, D).astype(jnp.float32)[:, :C]
            pad = jnp.zeros((N, D - C), jnp.float32)
            f = lambda x, attn, f_blk=f_blk, pad=pad: jnp.concatenate(
                [f_blk(x, attn), pad], axis=1)
            timed(f"  einsum BN={BN} {dname}", f, x, attn)

    # also try the Pallas kernel on BN=128
    from graphvqa_tpu.ops.pallas import pallas_blocked_aggregate
    g = jax.tree.map(jnp.asarray, build_blocked_edges(flat, 128, 12))
    nb, BE = g.blk_src.shape
    def f_pallas(x, attn, g=g, nb=nb, BE=BE):
        ablk = jnp.take(attn, g.blk_edge_perm.reshape(-1),
                        axis=0).reshape(nb, BE, H)
        feats = jnp.take(x, g.blk_src.reshape(-1), axis=0).reshape(nb, BE, D)
        out = pallas_blocked_aggregate(g.blk_dst_local, ablk, feats, 128)
        return out
    timed("  pallas BN=128 H=4", f_pallas, x, attn)

    def f_pallas1(x, attn, g=g, nb=nb, BE=BE):
        a1 = jnp.take(attn[:, :1], g.blk_edge_perm.reshape(-1),
                      axis=0).reshape(nb, BE)
        feats = jnp.take(x, g.blk_src.reshape(-1), axis=0).reshape(nb, BE, D)
        return pallas_blocked_aggregate(g.blk_dst_local, a1, feats, 128)
    timed("  pallas BN=128 H=1", f_pallas1, x, attn)


if __name__ == "__main__":
    main()
