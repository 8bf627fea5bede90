"""Mixed-precision policy for TPU.

TPU-first design: convolutions/matmuls run in bfloat16 on the MXU, parameters
and optimizer state stay float32, losses/reductions accumulate in float32.
The reference trains in float32 throughout (MXNet default); bf16 compute is a
TPU-native improvement that leaves parameter values (and therefore
fixed-weight parity) untouched because casting happens on activations and a
bf16 *copy* of the weights at apply time.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """What dtype each class of tensor uses."""

    param_dtype: jnp.dtype = jnp.float32  # stored parameters
    compute_dtype: jnp.dtype = jnp.bfloat16  # conv/matmul activations
    output_dtype: jnp.dtype = jnp.float32  # heads / losses / box decode

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


DEFAULT_POLICY = Policy()
FLOAT32_POLICY = Policy(compute_dtype=jnp.float32)
