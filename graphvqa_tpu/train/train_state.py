"""Train state: params + batch stats + Adam with StepLR.

Mirror of the reference optimizer recipe (mainExplain_gat.py:274-287):
Adam(lr=1e-4) with StepLR(step_size=lr_drop, gamma=0.1) stepped per *epoch*.
The learning rate is computed from the epoch index carried in the state, so
checkpoint resume restores the exact schedule position.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


def step_lr(base_lr: float, lr_drop: int, gamma: float, epoch) -> jax.Array:
    """lr = base * gamma^floor(epoch / lr_drop) — torch StepLR semantics."""
    return base_lr * jnp.power(gamma, jnp.floor_divide(epoch, lr_drop))


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    epoch: jax.Array
    base_lr: float = struct.field(pytree_node=False, default=1e-4)
    lr_drop: int = struct.field(pytree_node=False, default=90)
    lr_gamma: float = struct.field(pytree_node=False, default=0.1)
    weight_decay: float = struct.field(pytree_node=False, default=0.0)
    clip_grad: float = struct.field(pytree_node=False, default=0.0)

    def tx(self) -> optax.GradientTransformation:
        return _make_tx(self.weight_decay, self.clip_grad)

    def current_lr(self) -> jax.Array:
        return step_lr(self.base_lr, self.lr_drop, self.lr_gamma, self.epoch)

    def apply_gradients(self, grads, new_batch_stats=None) -> "TrainState":
        direction, new_opt_state = self.tx().update(
            grads, self.opt_state, self.params)
        lr = self.current_lr()
        updates = jax.tree.map(lambda d: -lr * d, direction)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            step=self.step + 1,
        )

    def next_epoch(self) -> "TrainState":
        return self.replace(epoch=self.epoch + 1)


def _make_tx(weight_decay: float,
             clip_grad: float = 0.0) -> optax.GradientTransformation:
    # optional global-norm clipping BEFORE Adam (the reference has none;
    # off by default — observed loss spikes on synthetic at-scale runs
    # motivate the knob)
    steps = []
    if clip_grad:
        steps.append(optax.clip_by_global_norm(clip_grad))
    steps.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    return optax.chain(*steps)


def create_train_state(
    variables: dict,
    lr: float = 1e-4,
    lr_drop: int = 90,
    lr_gamma: float = 0.1,
    weight_decay: float = 0.0,
    clip_grad: float = 0.0,
) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=_make_tx(weight_decay, clip_grad).init(params),
        step=jnp.asarray(0, jnp.int32),
        epoch=jnp.asarray(0, jnp.int32),
        base_lr=lr,
        lr_drop=lr_drop,
        lr_gamma=lr_gamma,
        weight_decay=weight_decay,
        clip_grad=clip_grad,
    )
