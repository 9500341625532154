"""Collective helpers.

The explicit ``collectives`` component planned in SURVEY.md §2.3: thin wrappers
over XLA collectives (compiled onto ICI/DCN) plus the host-side
variable-object all-gather the reference built on pickled NCCL broadcasts
(util/misc.py:88-128) — here ``multihost_utils.process_allgather`` /
plain passthrough on a single process.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp


def psum_scalars(metrics: Dict[str, jax.Array], axis_name: str) -> Dict[str, jax.Array]:
    """Sum count-style metrics across a mesh axis (replaces reduce_dict,
    util/misc.py:131-155). Call inside shard_map/pjit."""
    return {k: jax.lax.psum(v, axis_name) for k, v in metrics.items()}


def all_gather_host(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every *process* (the
    util/misc.py:88-128 equivalent: pickle -> byte tensor -> size exchange ->
    padded all-gather -> unpickle). Single-process -> [obj]."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([data.size], np.int64))         # [P, 1]
    max_n = int(sizes.max())
    padded = np.zeros((max_n,), np.uint8)
    padded[: data.size] = data
    gathered = multihost_utils.process_allgather(padded)   # [P, max_n]
    return [pickle.loads(gathered[p, : int(sizes[p, 0])].tobytes())
            for p in range(gathered.shape[0])]


def replicate(x):
    """Host value -> replicated device array."""
    return jax.tree.map(jnp.asarray, x)
