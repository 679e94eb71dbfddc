"""Ring padding: circular along azimuth (W), reflect/constant along rings (H).

A LiDAR range image wraps around 360 deg horizontally, so convolutions pad
the W axis circularly and the H axis by reflection.  Equivalent behavior to
the reference's mixed-mode ``Pad`` (``models/ops/common.py:9-23``) on NHWC
tensors.  Pure jnp — XLA fuses the concats into the consuming convolution's
input layout, so no custom kernel is warranted here.
"""

from __future__ import annotations

import jax.numpy as jnp


def _pad_axis(x, axis: int, lo: int, hi: int, mode: str):
    if lo == 0 and hi == 0:
        return x
    if mode == "circular":
        parts = []
        if lo:
            parts.append(jnp.take(x, jnp.arange(x.shape[axis] - lo, x.shape[axis]), axis=axis))
        parts.append(x)
        if hi:
            parts.append(jnp.take(x, jnp.arange(hi), axis=axis))
        return jnp.concatenate(parts, axis=axis)
    cfg = [(0, 0, 0)] * x.ndim
    cfg[axis] = (lo, hi, 0)
    if mode == "constant":
        return jnp.pad(x, [(c[0], c[1]) for c in cfg], mode="constant")
    if mode == "reflect":
        # PyTorch 'reflect' == numpy/jnp 'reflect' (border excluded).
        return jnp.pad(x, [(c[0], c[1]) for c in cfg], mode="reflect")
    if mode == "replicate":
        return jnp.pad(x, [(c[0], c[1]) for c in cfg], mode="edge")
    raise ValueError(f"unknown pad mode: {mode}")


def pad_ring(
    x,
    padding,
    horizontal: str = "circular",
    vertical: str = "reflect",
):
    """Pad an NHWC tensor: W with `horizontal` mode first, then H with
    `vertical` mode (matching the reference order, common.py:17-20, so the
    vertical reflection also covers the horizontal pad columns).

    `padding` is an int (all sides) or (left, right, top, bottom).
    """
    if isinstance(padding, int):
        left = right = top = bottom = padding
    else:
        left, right, top, bottom = padding
    x = _pad_axis(x, 2, left, right, horizontal)
    x = _pad_axis(x, 1, top, bottom, vertical)
    return x
