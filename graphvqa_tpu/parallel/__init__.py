from graphvqa_tpu.parallel.mesh import make_mesh
from graphvqa_tpu.parallel.collectives import all_gather_host, psum_scalars
from graphvqa_tpu.parallel.data_parallel import (
    align_dense_group, make_dp_train_step, multi_step_batch_sharding,
    stack_dispatch_groups, stack_shards, shard_batch_sharding)
from graphvqa_tpu.parallel.edge_sharded import (
    make_dp_edge_train_step, prepare_dp_edge_batch, shard_edges_by_dst)

__all__ = [
    "make_mesh", "all_gather_host", "psum_scalars",
    "align_dense_group", "make_dp_train_step", "multi_step_batch_sharding",
    "stack_dispatch_groups", "stack_shards", "shard_batch_sharding",
    "make_dp_edge_train_step", "prepare_dp_edge_batch", "shard_edges_by_dst",
]
