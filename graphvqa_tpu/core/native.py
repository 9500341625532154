"""ctypes bindings for the native C++ batch packer (native/packing.cc).

The per-step collate (ragged -> padded + dst-sort / dense layout) is the
host-side hot loop at training scale (~5k batches/epoch over 943k questions).
This module loads ``libgraphpack.so`` — building it on first use when a
toolchain is available — and exposes drop-in replacements for
:func:`graphvqa_tpu.core.packing.pack_graphs` /
:func:`...pack_graphs_dense`. Falls back to the pure-numpy path when the
library cannot be built.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional, Sequence

import numpy as np

from graphvqa_tpu.core.graph import GraphBatch
from graphvqa_tpu.core.packing import GraphSample

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_f32p = ctypes.POINTER(ctypes.c_float)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = _NATIVE_DIR / "libgraphpack.so"
    # `make` is a fast no-op when the .so is newer than the source, and
    # rebuilds stale checkouts (e.g. a committed .so older than packing.cc)
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        pass
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    if not hasattr(lib, "gp_pack_dense"):
        return None  # stale binary without the dense entry point
    lib.gp_pack.restype = ctypes.c_int
    lib.gp_pack_dense.restype = ctypes.c_int
    if hasattr(lib, "gp_shard_by_dst"):
        lib.gp_shard_by_dst.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ty):
    return a.ctypes.data_as(ty)


def pack_graphs_native(
    samples: Sequence[GraphSample],
    nodes_pad: int,
    edges_pad: int,
    max_steps: int = 5,
) -> GraphBatch:
    """Native equivalent of packing.pack_graphs (always dst-sorted)."""
    lib = _load()
    if lib is None:
        from graphvqa_tpu.core.packing import pack_graphs
        return pack_graphs(samples, nodes_pad, edges_pad, max_steps)

    num_graphs = len(samples)
    tok_w = samples[0].node_tokens.shape[1] if samples else 12
    etok_w = samples[0].edge_tokens.shape[1] if samples else 1

    node_off = np.zeros(num_graphs + 1, np.int32)
    edge_off = np.zeros(num_graphs + 1, np.int32)
    for g, s in enumerate(samples):
        node_off[g + 1] = node_off[g] + s.num_nodes
        edge_off[g + 1] = edge_off[g] + s.num_edges
    total_nodes, total_edges = int(node_off[-1]), int(edge_off[-1])
    if total_nodes > nodes_pad or total_edges > edges_pad:
        raise ValueError(
            f"batch ({total_nodes}n/{total_edges}e) overflows bucket "
            f"({nodes_pad}/{edges_pad})")

    nt = np.ascontiguousarray(
        np.concatenate([s.node_tokens for s in samples]), np.int32)
    es = np.ascontiguousarray(
        np.concatenate([s.edge_src for s in samples]), np.int32)
    ed = np.ascontiguousarray(
        np.concatenate([s.edge_dst for s in samples]), np.int32)
    et = np.ascontiguousarray(
        np.concatenate([s.edge_tokens for s in samples]), np.int32)
    sym = np.ascontiguousarray(
        np.concatenate([s.edge_sym for s in samples]), np.uint8)
    have_bitmap = all(s.exec_bitmap is not None for s in samples)
    if have_bitmap:
        def _pad_steps(b):
            k = min(max_steps, b.shape[1])
            out = np.zeros((b.shape[0], max_steps), np.float32)
            out[:, :k] = b[:, :k]
            return out
        bm = np.ascontiguousarray(
            np.concatenate([_pad_steps(s.exec_bitmap) for s in samples]),
            np.float32)
    else:
        bm = None

    node_tokens = np.empty((nodes_pad, tok_w), np.int32)
    node_graph = np.empty((nodes_pad,), np.int32)
    node_mask = np.empty((nodes_pad,), np.uint8)
    edge_src = np.empty((edges_pad,), np.int32)
    edge_dst = np.empty((edges_pad,), np.int32)
    edge_tokens = np.empty((edges_pad, etok_w), np.int32)
    edge_mask = np.empty((edges_pad,), np.uint8)
    edge_sym_sign = np.empty((edges_pad,), np.float32)
    bitmap_out = np.empty((nodes_pad, max_steps), np.float32)

    ret = lib.gp_pack(
        num_graphs, tok_w, etok_w, max_steps,
        _ptr(node_off, _i32p), _ptr(edge_off, _i32p),
        _ptr(nt, _i32p), _ptr(es, _i32p), _ptr(ed, _i32p), _ptr(et, _i32p),
        _ptr(sym, _u8p),
        _ptr(bm, _f32p) if bm is not None else None,
        nodes_pad, edges_pad,
        _ptr(node_tokens, _i32p), _ptr(node_graph, _i32p),
        _ptr(node_mask, _u8p), _ptr(edge_src, _i32p), _ptr(edge_dst, _i32p),
        _ptr(edge_tokens, _i32p), _ptr(edge_mask, _u8p),
        _ptr(edge_sym_sign, _f32p), _ptr(bitmap_out, _f32p))
    if ret != 0:
        raise ValueError("gp_pack overflow")

    return GraphBatch(
        node_tokens=node_tokens, node_graph=node_graph,
        node_mask=node_mask.astype(bool),
        edge_src=edge_src, edge_dst=edge_dst, edge_tokens=edge_tokens,
        edge_mask=edge_mask.astype(bool), edge_sym_sign=edge_sym_sign,
        exec_bitmap=bitmap_out, num_graphs=num_graphs)


def pack_graphs_dense_native(
    samples: Sequence[GraphSample],
    nodes_per_graph: int,
    edges_per_graph: int,
    max_steps: int = 5,
    num_graphs: Optional[int] = None,
) -> GraphBatch:
    """Native equivalent of packing.pack_graphs_dense (fully-uniform layout)."""
    lib = _load()
    if lib is None:
        from graphvqa_tpu.core.packing import pack_graphs_dense
        return pack_graphs_dense(samples, nodes_per_graph, edges_per_graph,
                                 max_steps, num_graphs)

    B = num_graphs if num_graphs is not None else len(samples)
    if len(samples) > B:
        raise ValueError(f"{len(samples)} samples > num_graphs={B}")
    npg, epg = nodes_per_graph, edges_per_graph
    nodes_pad, edges_pad = B * npg, B * epg
    tok_w = samples[0].node_tokens.shape[1] if samples else 12
    etok_w = samples[0].edge_tokens.shape[1] if samples else 1

    n = len(samples)
    node_off = np.zeros(n + 1, np.int32)
    edge_off = np.zeros(n + 1, np.int32)
    for g, s in enumerate(samples):
        node_off[g + 1] = node_off[g] + s.num_nodes
        edge_off[g + 1] = edge_off[g] + s.num_edges

    nt = np.ascontiguousarray(
        np.concatenate([s.node_tokens for s in samples]), np.int32)
    es = np.ascontiguousarray(
        np.concatenate([s.edge_src for s in samples]), np.int32)
    ed = np.ascontiguousarray(
        np.concatenate([s.edge_dst for s in samples]), np.int32)
    et = np.ascontiguousarray(
        np.concatenate([s.edge_tokens for s in samples]), np.int32)
    sym = np.ascontiguousarray(
        np.concatenate([s.edge_sym for s in samples]), np.uint8)
    have_bitmap = all(s.exec_bitmap is not None for s in samples)
    if have_bitmap:
        def _pad_steps(b):
            k = min(max_steps, b.shape[1])
            out = np.zeros((b.shape[0], max_steps), np.float32)
            out[:, :k] = b[:, :k]
            return out
        bm = np.ascontiguousarray(
            np.concatenate([_pad_steps(s.exec_bitmap) for s in samples]),
            np.float32)
    else:
        bm = None

    node_tokens = np.empty((nodes_pad, tok_w), np.int32)
    node_graph = np.empty((nodes_pad,), np.int32)
    node_mask = np.empty((nodes_pad,), np.uint8)
    edge_src = np.empty((edges_pad,), np.int32)
    edge_dst = np.empty((edges_pad,), np.int32)
    edge_tokens = np.empty((edges_pad, etok_w), np.int32)
    edge_mask = np.empty((edges_pad,), np.uint8)
    edge_sym_sign = np.empty((edges_pad,), np.float32)
    bitmap_out = np.empty((nodes_pad, max_steps), np.float32)

    ret = lib.gp_pack_dense(
        n, B, tok_w, etok_w, max_steps,
        _ptr(node_off, _i32p), _ptr(edge_off, _i32p),
        _ptr(nt, _i32p), _ptr(es, _i32p), _ptr(ed, _i32p), _ptr(et, _i32p),
        _ptr(sym, _u8p),
        _ptr(bm, _f32p) if bm is not None else None,
        npg, epg,
        _ptr(node_tokens, _i32p), _ptr(node_graph, _i32p),
        _ptr(node_mask, _u8p), _ptr(edge_src, _i32p), _ptr(edge_dst, _i32p),
        _ptr(edge_tokens, _i32p), _ptr(edge_mask, _u8p),
        _ptr(edge_sym_sign, _f32p), _ptr(bitmap_out, _f32p))
    if ret != 0:
        raise ValueError("gp_pack_dense per-graph overflow")

    return GraphBatch(
        node_tokens=node_tokens, node_graph=node_graph,
        node_mask=node_mask.astype(bool),
        edge_src=edge_src, edge_dst=edge_dst, edge_tokens=edge_tokens,
        edge_mask=edge_mask.astype(bool), edge_sym_sign=edge_sym_sign,
        exec_bitmap=bitmap_out, num_graphs=B,
        nodes_per_graph=npg, edges_per_graph=epg)


def shard_edges_by_dst_native(graphs: GraphBatch, k: int,
                              edges_per_shard=None) -> GraphBatch:
    """Native destination-ownership edge partitioner (mirror of
    parallel/edge_sharded.py:shard_edges_by_dst; parity in
    tests/test_native_packing.py). Falls back to the numpy path when the
    library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gp_shard_by_dst"):
        from graphvqa_tpu.parallel.edge_sharded import shard_edges_by_dst
        return shard_edges_by_dst(graphs, k, edges_per_shard=edges_per_shard)

    B, npg, epg = (graphs.num_graphs, graphs.nodes_per_graph,
                   graphs.edges_per_graph)
    assert graphs.has_dense_layout and npg % k == 0, (npg, k)
    src = np.ascontiguousarray(np.asarray(graphs.edge_src), np.int32)
    dst = np.ascontiguousarray(np.asarray(graphs.edge_dst), np.int32)
    mask = np.ascontiguousarray(np.asarray(graphs.edge_mask), np.uint8)
    etok = np.ascontiguousarray(
        np.asarray(graphs.edge_tokens).reshape(B * epg, -1), np.int32)
    esym = np.ascontiguousarray(
        np.asarray(graphs.edge_sym_sign), np.float32)
    etok_w = etok.shape[1]

    epg_loc = edges_per_shard if edges_per_shard else max(epg // k, 1)
    while True:
        o_src = np.empty((k, B, epg_loc), np.int32)
        o_dst = np.empty((k, B, epg_loc), np.int32)
        o_tok = np.empty((k, B, epg_loc, etok_w), np.int32)
        o_mask = np.empty((k, B, epg_loc), np.uint8)
        o_sym = np.empty((k, B, epg_loc), np.float32)
        ret = lib.gp_shard_by_dst(
            B, npg, epg, k, epg_loc, etok_w,
            _ptr(src, _i32p), _ptr(dst, _i32p), _ptr(mask, _u8p),
            _ptr(etok, _i32p), _ptr(esym, _f32p),
            _ptr(o_src, _i32p), _ptr(o_dst, _i32p), _ptr(o_tok, _i32p),
            _ptr(o_mask, _u8p), _ptr(o_sym, _f32p))
        if ret == 0:
            break
        if edges_per_shard is not None:
            raise ValueError(
                f"edge shard bucket overflow: a (graph, shard) needs {-ret} "
                f"slots > edges_per_shard={epg_loc}")
        while epg_loc < -ret:
            epg_loc = min(epg_loc * 2, epg)

    return graphs.replace(
        edge_src=o_src.reshape(k, B * epg_loc),
        edge_dst=o_dst.reshape(k, B * epg_loc),
        edge_tokens=o_tok.reshape(k, B * epg_loc, etok_w),
        edge_mask=o_mask.reshape(k, B * epg_loc).astype(bool),
        edge_sym_sign=o_sym.reshape(k, B * epg_loc),
    )
