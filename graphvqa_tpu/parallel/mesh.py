"""Device-mesh construction.

Replaces the reference's NCCL/process-group bring-up
(util/misc.py:370-392 ``init_distributed_mode``): on TPU the runtime already
knows the topology; we only lay a logical (data, edge) mesh over it.

  * ``data`` — batch sharding, the DDP replacement (gradients psum over it)
  * ``edge`` — graph-domain context parallelism: the batched edge list is
    partitioned across this axis (SURVEY.md §5's "sequence-parallel" analog)

For multi-host pods call ``jax.distributed.initialize()`` before building the
mesh (the CLI does when env vars are present).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def maybe_init_distributed() -> None:
    """Multi-host process-group rendezvous via env vars (the SLURM/env://
    discovery of util/misc.py:370-381, TPU-style)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(
    data: Optional[int] = None,
    edge: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = ("data", "edge"),
) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None:
        assert n % edge == 0, (n, edge)
        data = n // edge
    assert data * edge == n, f"mesh {data}x{edge} != {n} devices"
    arr = np.asarray(devs).reshape(data, edge)
    return Mesh(arr, axis_names)
