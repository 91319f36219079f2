"""PyTorch-compatible parameter initializers.

The reference relies on torch's default ``kaiming_uniform(a=sqrt(5))`` for
``nn.Linear``/``nn.Conv2d``.  Matching the init *distribution* keeps training
dynamics comparable.  For a layer with fan_in F:

- kernel ~ U(-sqrt(1/F), sqrt(1/F))
  (equals ``variance_scaling(1/3, fan_in, uniform)``)
- bias   ~ U(-1/sqrt(F), 1/sqrt(F))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax.linen import initializers as flax_init

# torch nn.Linear / nn.Conv2d default kernel init
torch_kernel_init = flax_init.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        return torch_bias_init(key, shape, dtype, fan_in)

    return init
