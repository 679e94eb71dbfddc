"""Separable [1,2,1] antialias blurs (NR-GAN style).

Equivalent to the reference ``Blur``/``BlurVH`` (``models/ops/common.py:26-88``)
with ``filter_type=[1,2,1]``: a vertical 3-tap blur (reflect-padded) and a
horizontal 3-tap blur (circular-padded), concatenated on channels.

Implemented as shifts+adds on the VPU rather than a grouped conv: a 3-tap
depthwise conv wastes the MXU, while three fused adds are pure bandwidth.
"""

from __future__ import annotations

import jax.numpy as jnp

from dusty_gan_tpu.ops.padding import pad_ring


def blur_v(x, ring: bool = True):
    """[1,2,1]/4 along H with reflect padding (common.py:74-81). NHWC."""
    del ring  # vertical padding is reflect regardless
    p = pad_ring(x, (0, 0, 1, 1), vertical="reflect")
    return (p[:, :-2] + 2.0 * p[:, 1:-1] + p[:, 2:]) * jnp.asarray(0.25, x.dtype)


def blur_h(x, ring: bool = True):
    """[1,2,1]/4 along W with circular (ring) padding (common.py:82-83)."""
    p = pad_ring(x, (1, 1, 0, 0), horizontal="circular" if ring else "reflect")
    return (p[:, :, :-2] + 2.0 * p[:, :, 1:-1] + p[:, :, 2:]) * jnp.asarray(0.25, x.dtype)


def blur_vh(x, ring: bool = True):
    """concat(vertical blur, horizontal blur) on channels (common.py:85-88)."""
    return jnp.concatenate([blur_v(x, ring), blur_h(x, ring)], axis=-1)
