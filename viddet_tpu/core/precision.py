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
    """What dtype each class of tensor uses.

    ``quant`` opts conv cells into post-training quantization at inference:
    ``"int8"`` runs every ConvBNLeaky as a BN-folded int8xint8->int32 MXU
    conv with per-output-channel weight scales and a per-tensor activation
    scale calibrated offline (``viddet_tpu.quant``).  v5e int8 MXU peak is
    2x bf16 — this is a speed/accuracy trade, NOT bit-for-bit with the
    float path, and is off everywhere by default.
    """

    param_dtype: jnp.dtype = jnp.float32  # stored parameters
    compute_dtype: jnp.dtype = jnp.bfloat16  # conv/matmul activations
    output_dtype: jnp.dtype = jnp.float32  # heads / losses / box decode
    quant: str | None = None  # None | "int8" (PTQ inference)

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


DEFAULT_POLICY = Policy()
FLOAT32_POLICY = Policy(compute_dtype=jnp.float32)
INT8_POLICY = Policy(quant="int8")
