"""Functional EMA with ema_pytorch-compatible semantics.

The reference tracks an EMA of the whole diffusion model with
``ema_pytorch.EMA(beta=0.995, update_every=10)`` (reference
src/DADiff.py:1606-1608, train.py:140).  That implementation:

- counts every ``update()`` call (== every trainer step);
- only blends on steps where ``step % update_every == 0``;
- copies (decay 0) until ``update_after_step`` (default 100) is reached;
- ramps the decay as ``1 - (1 + epoch/inv_gamma)^-power`` clamped to
  ``[min_value, beta]`` (defaults inv_gamma=1, power=2/3, min_value=0).

Here the same schedule is a branchless pytree update (``decay=1`` encodes
"no update"), so it lives inside the jitted train step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EmaState:
    params: Any
    step: jnp.ndarray  # int32 scalar

    @classmethod
    def create(cls, params):
        # copy (not alias) so TrainState donation never sees shared buffers
        return cls(params=jax.tree_util.tree_map(jnp.copy, params),
                   step=jnp.zeros((), jnp.int32))


def ema_decay_schedule(
    step,
    beta: float = 0.995,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
):
    """Effective decay at call counter ``step`` (pre-increment, matching
    ema_pytorch's use of the counter before incrementing)."""
    epoch = jnp.clip(step.astype(jnp.float32) - update_after_step - 1, 0.0, None)
    value = 1.0 - (1.0 + epoch / inv_gamma) ** -power
    decay = jnp.clip(value, min_value, beta)
    return jnp.where(step <= update_after_step, 0.0, decay)


def ema_update(
    ema: EmaState,
    params,
    beta: float = 0.995,
    update_every: int = 10,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> EmaState:
    step = ema.step
    should = (step % update_every) == 0
    decay = ema_decay_schedule(
        step, beta, update_after_step, inv_gamma, power, min_value
    )
    # decay==1 -> keep ema unchanged (no update this step)
    decay = jnp.where(should, decay, 1.0)
    new_params = jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema.params,
        params,
    )
    return EmaState(params=new_params, step=step + 1)
