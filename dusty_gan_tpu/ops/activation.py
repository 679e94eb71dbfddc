"""Bias + LeakyReLU + gain, fused.

Matches ``FusedLeakyReLU`` (``models/ops/common.py:91-109``):
``leaky_relu(x + bias, 0.2) * sqrt(2)``.  Written as one jnp expression so
XLA fuses it into the producing convolution's epilogue — no Pallas needed
for a pure elementwise tail.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2, gain: float = SQRT2):
    if bias is not None:
        # bias broadcasts over the trailing channel axis (NHWC / NC)
        x = x + bias.astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(gain, x.dtype)
