// Native batch packer: ragged scene graphs -> static padded layouts.
//
// C++ core of the host-side collate hot path (the Python reference path is
// graphvqa_tpu/core/packing.py; semantics are identical and cross-checked by
// tests/test_native_packing.py). Replaces the per-batch work the reference
// delegated to PyG's C++ Batch.from_data_list + torch_scatter
// (gqa_dataset_entry.py:654): global renumbering, destination counting-sort,
// padded scatter, and the fully-uniform dense per-graph layout — all O(E).
//
// Build: make -C native   (produces libgraphpack.so, loaded via ctypes)
//
// Exported C ABI (all arrays caller-allocated, int32/float32/uint8):
//   gp_pack(...)          flat padded batch from concatenated ragged inputs
//   gp_pack_dense(...)    fully-uniform per-graph dense layout
//   gp_shard_by_dst(...)  destination-ownership edge partitioning for the
//                         --edge-parallel axis (parallel/edge_sharded.py)
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Pack concatenated ragged graphs into the padded flat layout.
//
// Inputs (concatenated over graphs, graph g owns [node_off[g], node_off[g+1])
// nodes and [edge_off[g], edge_off[g+1]) edges; edge indices graph-local):
//   num_graphs, tok_w, etok_w, max_steps : sizes
//   node_off   [num_graphs+1]
//   edge_off   [num_graphs+1]
//   node_tokens_in [total_nodes * tok_w]
//   edge_src_in / edge_dst_in [total_edges]
//   edge_tokens_in [total_edges * etok_w]
//   edge_sym_in [total_edges] (uint8)
//   bitmap_in  [total_nodes * max_steps] (float32; may be null)
//   nodes_pad, edges_pad : static bucket
// Outputs (pre-allocated, padded):
//   node_tokens_out [nodes_pad * tok_w]      (pad token 1)
//   node_graph_out  [nodes_pad]              (pad -> num_graphs)
//   node_mask_out   [nodes_pad] (uint8)
//   edge_src_out / edge_dst_out [edges_pad]  (pad -> nodes_pad-1, dst-sorted)
//   edge_tokens_out [edges_pad * etok_w]
//   edge_mask_out   [edges_pad] (uint8)
//   edge_sym_sign_out [edges_pad] (float32)
//   bitmap_out      [nodes_pad * max_steps]
// Returns 0 on success, negative on overflow.
int gp_pack(
    int32_t num_graphs, int32_t tok_w, int32_t etok_w, int32_t max_steps,
    const int32_t* node_off, const int32_t* edge_off,
    const int32_t* node_tokens_in,
    const int32_t* edge_src_in, const int32_t* edge_dst_in,
    const int32_t* edge_tokens_in, const uint8_t* edge_sym_in,
    const float* bitmap_in,
    int32_t nodes_pad, int32_t edges_pad,
    int32_t* node_tokens_out, int32_t* node_graph_out, uint8_t* node_mask_out,
    int32_t* edge_src_out, int32_t* edge_dst_out, int32_t* edge_tokens_out,
    uint8_t* edge_mask_out, float* edge_sym_sign_out, float* bitmap_out) {
  const int32_t total_nodes = node_off[num_graphs];
  const int32_t total_edges = edge_off[num_graphs];
  if (total_nodes > nodes_pad || total_edges > edges_pad) return -1;

  // ---- node side: straight copy with padding defaults ----
  for (int32_t i = 0; i < nodes_pad * tok_w; ++i) node_tokens_out[i] = 1;
  std::memcpy(node_tokens_out, node_tokens_in,
              sizeof(int32_t) * total_nodes * tok_w);
  for (int32_t i = 0; i < nodes_pad; ++i) {
    node_graph_out[i] = num_graphs;
    node_mask_out[i] = 0;
  }
  for (int32_t g = 0; g < num_graphs; ++g)
    for (int32_t i = node_off[g]; i < node_off[g + 1]; ++i) {
      node_graph_out[i] = g;
      node_mask_out[i] = 1;
    }
  std::memset(bitmap_out, 0, sizeof(float) * nodes_pad * max_steps);
  if (bitmap_in)
    std::memcpy(bitmap_out, bitmap_in,
                sizeof(float) * total_nodes * max_steps);

  // ---- edge side: globalize indices, stable counting-sort by dst ----
  std::vector<int32_t> gsrc(total_edges), gdst(total_edges);
  for (int32_t g = 0; g < num_graphs; ++g) {
    const int32_t no = node_off[g];
    for (int32_t e = edge_off[g]; e < edge_off[g + 1]; ++e) {
      gsrc[e] = edge_src_in[e] + no;
      gdst[e] = edge_dst_in[e] + no;
    }
  }
  std::vector<int32_t> count(nodes_pad + 1, 0);
  for (int32_t e = 0; e < total_edges; ++e) count[gdst[e] + 1]++;
  for (int32_t i = 0; i < nodes_pad; ++i) count[i + 1] += count[i];

  for (int32_t i = 0; i < edges_pad; ++i) {
    edge_src_out[i] = nodes_pad - 1;
    edge_dst_out[i] = nodes_pad - 1;
    edge_mask_out[i] = 0;
    edge_sym_sign_out[i] = 1.0f;
  }
  for (int32_t i = 0; i < edges_pad * etok_w; ++i) edge_tokens_out[i] = 1;

  std::vector<int32_t> cursor(count.begin(), count.end() - 1);
  for (int32_t e = 0; e < total_edges; ++e) {
    const int32_t slot = cursor[gdst[e]]++;
    edge_src_out[slot] = gsrc[e];
    edge_dst_out[slot] = gdst[e];
    edge_mask_out[slot] = 1;
    edge_sym_sign_out[slot] = edge_sym_in[e] ? -1.0f : 1.0f;
    for (int32_t t = 0; t < etok_w; ++t)
      edge_tokens_out[slot * etok_w + t] = edge_tokens_in[e * etok_w + t];
  }
  return 0;
}

// Pack concatenated ragged graphs into the FULLY-UNIFORM dense layout
// (mirror of core/packing.py:pack_graphs_dense): graph g owns node rows
// [g*npg, (g+1)*npg) and edge rows [g*epg, (g+1)*epg); edges dst-sorted
// within each graph (counting sort); padded edges point at their own
// graph's last node row (keeps global dst-sortedness).
//
// num_graphs_out >= number of ragged graphs supplied appends fully-masked
// dummy graphs. Returns 0 on success, negative on per-graph overflow.
int gp_pack_dense(
    int32_t num_graphs, int32_t num_graphs_out,
    int32_t tok_w, int32_t etok_w, int32_t max_steps,
    const int32_t* node_off, const int32_t* edge_off,
    const int32_t* node_tokens_in,
    const int32_t* edge_src_in, const int32_t* edge_dst_in,
    const int32_t* edge_tokens_in, const uint8_t* edge_sym_in,
    const float* bitmap_in,
    int32_t npg, int32_t epg,
    int32_t* node_tokens_out, int32_t* node_graph_out, uint8_t* node_mask_out,
    int32_t* edge_src_out, int32_t* edge_dst_out, int32_t* edge_tokens_out,
    uint8_t* edge_mask_out, float* edge_sym_sign_out, float* bitmap_out) {
  const int64_t nodes_pad = (int64_t)num_graphs_out * npg;
  const int64_t edges_pad = (int64_t)num_graphs_out * epg;

  // defaults
  for (int64_t i = 0; i < nodes_pad * tok_w; ++i) node_tokens_out[i] = 1;
  for (int64_t i = 0; i < nodes_pad; ++i) {
    node_graph_out[i] = num_graphs_out;
    node_mask_out[i] = 0;
  }
  std::memset(bitmap_out, 0, sizeof(float) * nodes_pad * max_steps);
  for (int64_t i = 0; i < edges_pad; ++i) {
    const int32_t pad_node = (int32_t)(i / epg) * npg + (npg - 1);
    edge_src_out[i] = pad_node;
    edge_dst_out[i] = pad_node;
    edge_mask_out[i] = 0;
    edge_sym_sign_out[i] = 1.0f;
  }
  for (int64_t i = 0; i < edges_pad * etok_w; ++i) edge_tokens_out[i] = 1;

  std::vector<int32_t> count, cursor;
  for (int32_t g = 0; g < num_graphs; ++g) {
    const int32_t n = node_off[g + 1] - node_off[g];
    const int32_t e = edge_off[g + 1] - edge_off[g];
    if (n > npg || e > epg) return -1;
    const int64_t noff = (int64_t)g * npg;
    const int64_t eoff = (int64_t)g * epg;

    std::memcpy(node_tokens_out + noff * tok_w,
                node_tokens_in + (int64_t)node_off[g] * tok_w,
                sizeof(int32_t) * n * tok_w);
    for (int32_t i = 0; i < n; ++i) {
      node_graph_out[noff + i] = g;
      node_mask_out[noff + i] = 1;
    }
    if (bitmap_in)
      std::memcpy(bitmap_out + noff * max_steps,
                  bitmap_in + (int64_t)node_off[g] * max_steps,
                  sizeof(float) * n * max_steps);

    // per-graph stable counting sort of edges by local dst
    count.assign(npg + 1, 0);
    for (int32_t e2 = edge_off[g]; e2 < edge_off[g + 1]; ++e2)
      count[edge_dst_in[e2] + 1]++;
    for (int32_t i = 0; i < npg; ++i) count[i + 1] += count[i];
    cursor.assign(count.begin(), count.end() - 1);
    for (int32_t e2 = edge_off[g]; e2 < edge_off[g + 1]; ++e2) {
      const int64_t slot = eoff + cursor[edge_dst_in[e2]]++;
      edge_src_out[slot] = edge_src_in[e2] + (int32_t)noff;
      edge_dst_out[slot] = edge_dst_in[e2] + (int32_t)noff;
      edge_mask_out[slot] = 1;
      edge_sym_sign_out[slot] = edge_sym_in[e2] ? -1.0f : 1.0f;
      for (int32_t t = 0; t < etok_w; ++t)
        edge_tokens_out[slot * etok_w + t] =
            edge_tokens_in[(int64_t)e2 * etok_w + t];
    }
  }
  return 0;
}

// Destination-ownership edge partitioning (mirror of
// parallel/edge_sharded.py:shard_edges_by_dst): shard s of k receives the
// edges whose local destination index i has i % k == s, keeping each
// graph's dst-sorted order. Outputs are [k, B, epg_loc] row-major. Returns
// 0 on success, or -(required epg_loc) when some (graph, shard) bucket
// overflows — the caller widens the bucket and retries.
int gp_shard_by_dst(
    int32_t num_graphs, int32_t npg, int32_t epg, int32_t k,
    int32_t epg_loc, int32_t etok_w,
    const int32_t* src, const int32_t* dst, const uint8_t* mask,
    const int32_t* etok, const float* esym,
    int32_t* o_src, int32_t* o_dst, int32_t* o_tok,
    uint8_t* o_mask, float* o_sym) {
  const int64_t B = num_graphs;
  // prefill: pad slots point at their own graph's last node row
  for (int64_t s = 0; s < k; ++s) {
    for (int64_t g = 0; g < B; ++g) {
      const int32_t pad_node = (int32_t)(g * npg + npg - 1);
      const int64_t base = (s * B + g) * epg_loc;
      for (int64_t c = 0; c < epg_loc; ++c) {
        o_src[base + c] = pad_node;
        o_dst[base + c] = pad_node;
        o_mask[base + c] = 0;
        o_sym[base + c] = 1.0f;
        for (int32_t t = 0; t < etok_w; ++t)
          o_tok[(base + c) * etok_w + t] = 1;  // pad token id
      }
    }
  }
  std::vector<int32_t> fill((size_t)(B * k), 0);
  int32_t need = 0;
  for (int64_t e = 0; e < B * epg; ++e) {
    if (!mask[e]) continue;
    const int64_t g = e / epg;
    const int32_t owner = (dst[e] % npg) % k;
    const int32_t c = fill[(size_t)(g * k + owner)]++;
    if (c >= epg_loc) {           // keep counting for the retry hint
      if (c + 1 > need) need = c + 1;
      continue;
    }
    const int64_t slot = ((int64_t)owner * B + g) * epg_loc + c;
    o_src[slot] = src[e];
    o_dst[slot] = dst[e];
    o_mask[slot] = 1;
    o_sym[slot] = esym[e];
    for (int32_t t = 0; t < etok_w; ++t)
      o_tok[slot * etok_w + t] = etok[e * etok_w + t];
  }
  return need > 0 ? -need : 0;
}

}  // extern "C"
