"""Param-holder module: declare parameters under a named child scope without
an op, so fused Pallas kernels can consume raw weights while the variable
tree stays identical to the unfused flax-module layout (and hence to the
torch checkpoint mapping)."""

from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn


class ParamHolder(nn.Module):
    """specs: name -> (shape, init_fn). Returns {name: array} (fp32)."""

    specs: Sequence[Tuple[str, Tuple[int, ...], Callable]]

    @nn.compact
    def __call__(self) -> Dict[str, jnp.ndarray]:
        return {name: self.param(name, init, shape, jnp.float32)
                for name, shape, init in self.specs}


class MlpParams(nn.Module):
    """fc1/fc2 kernel+bias under a parent scope (timm Mlp layout)."""

    in_dim: int
    hidden: int
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        zeros = nn.initializers.zeros_init()
        fc1 = ParamHolder([("kernel", (self.in_dim, self.hidden), self.kernel_init),
                           ("bias", (self.hidden,), zeros)], name="fc1")()
        fc2 = ParamHolder([("kernel", (self.hidden, self.in_dim), self.kernel_init),
                           ("bias", (self.in_dim,), zeros)], name="fc2")()
        return fc1, fc2
