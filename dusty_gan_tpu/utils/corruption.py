"""Scan corruptions for the inversion demo (demo.py:71-137).

All functions operate on NHWC tensors; randomness via explicit keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout_noise(key, mask, rate: float = 0.5):
    keep = (jax.random.uniform(key, mask.shape) < rate).astype(mask.dtype)
    return mask * keep


def sparse_hlines(mask, rate: float = 0.5):
    skip = int(1.0 / rate)
    sparse = jnp.zeros_like(mask).at[:, ::skip].set(1.0)
    return mask * sparse


def sparse_vlines(mask, rate: float = 0.5):
    skip = int(1.0 / rate)
    sparse = jnp.zeros_like(mask).at[:, :, ::skip].set(1.0)
    return mask * sparse


def random_lines(key, mask, rate: float = 0.5):
    h = mask.shape[1]
    perm = jax.random.permutation(key, h)[: int(h * (1 - rate))]
    return mask.at[:, perm].set(0.0)


def corrupt_half(mask):
    w = mask.shape[2]
    return mask.at[:, :, w // 2 :].set(0.0)


def corrupt_quarter(mask):
    w = mask.shape[2]
    m = mask.at[:, :, : w // 4].set(0.0)
    return m.at[:, :, w // 2 : w * 3 // 4].set(0.0)


def additive_noise(key, depth, strength: float = 0.01):
    return depth + jax.random.normal(key, depth.shape) * strength


def _median3x3(x):
    """3x3 median filter (replaces kornia.filters.median_blur)."""
    pads = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    stack = jnp.stack(
        [pads[:, i : i + x.shape[1], j : j + x.shape[2]] for i in range(3) for j in range(3)],
        axis=0,
    )
    return jnp.median(stack, axis=0)


def closing(inv, max_iters: int = 64):
    """Morphological hole filling (demo.py:115-122): median blur then
    iteratively replace invalid pixels with the 3x3 max until none remain
    (bounded loop for jit-ability)."""
    inv = _median3x3(inv)

    def cond(state):
        i, x = state
        return jnp.logical_and(i < max_iters, jnp.any(x <= 1e-8))

    def body(state):
        i, x = state
        valid = (x > 1e-8).astype(x.dtype)
        p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="constant")
        filled = jax.lax.reduce_window(
            p, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
        )
        return i + 1, valid * x + (1 - valid) * filled

    _, inv = jax.lax.while_loop(cond, body, (0, inv))
    return inv


def apply_corruption(key, dep_ref, mask_ref, corruption: str):
    """(demo.py:125-137) + the extra mask corruptions exposed in the demo UI."""
    if corruption in (None, "", "none"):
        return dep_ref, mask_ref
    if corruption == "additive noise":
        return additive_noise(key, dep_ref, 0.01), mask_ref
    if corruption == "low resolution":
        return dep_ref, sparse_hlines(mask_ref, 1 / 8)
    if corruption == "dropout":
        return dep_ref, dropout_noise(key, mask_ref, rate=0.1)
    if corruption == "closing":
        return closing(dep_ref), jnp.ones_like(mask_ref)
    if corruption == "half":
        return dep_ref, corrupt_half(mask_ref)
    if corruption == "quarter":
        return dep_ref, corrupt_quarter(mask_ref)
    if corruption == "vlines":
        return dep_ref, sparse_vlines(mask_ref, 1 / 8)
    if corruption == "hlines":
        # sparse_hlines at its default rate (demo.py:77-81); the reference's
        # "low resolution" preset is the same op pinned to rate=1/8
        return dep_ref, sparse_hlines(mask_ref)
    if corruption in ("random lines", "random_lines"):
        return dep_ref, random_lines(key, mask_ref)
    raise NotImplementedError(corruption)
