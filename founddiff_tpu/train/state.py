"""Train state pytree and optimizer construction."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from founddiff_tpu.train.ema import EmaState


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    params: Any
    opt_state: Any
    ema: EmaState

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema=EmaState.create(params),
        )


def make_optimizer(
    num_unet: int = 1,
    lr: float = 2e-4,
    adam_betas=(0.9, 0.99),
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    """Global-norm clip then Adam/RAdam.

    The reference clips all params jointly to norm 1.0 then steps Adam(2e-4,
    betas=(0.9, 0.99)) for one unet, or two per-unet RAdams for two
    (src/DADiff.py:1593-1602,1707).  Adam-family updates are per-leaf, so two
    RAdams over disjoint subtrees equal one RAdam over the union.
    """
    if num_unet == 1:
        opt = optax.adam(lr, b1=adam_betas[0], b2=adam_betas[1])
    else:
        opt = optax.radam(lr)
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)
