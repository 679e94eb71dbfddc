"""Mixed-precision policy: bf16 compute, f32 parameters/state.

The reference uses CUDA AMP with a gradient loss-scaler
(``trainers/dcgan_amp.py:127-131``).  TPU bf16 has the same exponent range
as f32, so no loss scaling is needed: parameters, optimizer state, EMA and
regularizer statistics stay f32, while convolutions/matmuls run in bf16.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through models and the train step."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype used for numerically sensitive reductions (losses, penalties)
    reduce_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_reduce(self, x):
        return jnp.asarray(x, self.reduce_dtype)


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)


def policy_from_cfg(enable_amp: bool) -> Policy:
    """Map the reference's ``enable_amp`` flag (configs/config.yaml:5) to a
    TPU dtype policy: amp on -> bf16 compute, off -> full f32."""
    return DEFAULT_POLICY if enable_amp else FP32_POLICY
