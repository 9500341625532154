"""graphvqa_tpu — a TPU-native (JAX/XLA/Pallas/pjit) graph-VQA framework.

A from-scratch re-design of the capabilities of codexxxl/GraphVQA
(NAACL 2021 MAI workshop): answering natural-language questions over GQA
ground-truth scene graphs with language-conditioned graph message passing.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

  data/      offline preprocessing, vocab artifacts, scene-graph -> dense arrays
  core/      static-shape graph containers + ragged->padded packing
  ops/       segment primitives: segment softmax / SpMM / SDDMM / graph LayerNorm
             (XLA-native oracle + Pallas TPU kernels)
  nn/        GAT / GCN / GINE / LCGN message passing, transformers, pooling, heads
  models/    PipelineModel assemblies (gat | gcn | gine | lcgn | onlysg)
  parallel/  device mesh, pjit shardings, edge-partitioned shard_map engine
  train/     train/eval loops, losses, metric kernels, checkpointing, logging
  eval/      result dump + official GQA scorer
"""

__version__ = "0.1.0"
