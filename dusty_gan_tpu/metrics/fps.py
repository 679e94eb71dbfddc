"""Furthest point sampling + gather.

TPU-native equivalent of the reference CUDA extension
(``utils/sampling/fps/furthest_point_sampling.cu:99-207``): a
``lax.fori_loop`` of k dependent steps over a running min-distance vector
(O(k*N) work, fully batched on the VPU).  Semantics preserved exactly:

* the first selected index is always 0 (cu:116-117), even if that point
  is a dropped origin point;
* points with squared magnitude <= 1e-3 are skipped — they never update
  the running distances and are never selected (cu:131-134).  This is
  load-bearing: dropped range-image pixels back-project to (0,0,0)
  (utils/lidar.py:61-68) and must not be sampled;
* running distances start at 1e10 (furthest_point_sampling.py:30-37).

Non-differentiable (integer indices), like the reference
(furthest_point_sampling.py:39).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def furthest_point_sampling(xyz, k: int):
    """(B,N,3) -> (B,k) int32 indices."""
    b, n, _ = xyz.shape
    xyz = jax.lax.stop_gradient(xyz.astype(jnp.float32))
    mag = jnp.sum(xyz * xyz, axis=-1)  # (B,N)
    valid = mag > 1e-3

    idxs0 = jnp.zeros((b, k), jnp.int32)
    temp0 = jnp.full((b, n), 1e10, jnp.float32)
    old0 = jnp.zeros((b,), jnp.int32)

    batch = jnp.arange(b)

    def body(j, carry):
        temp, idxs, old = carry
        last = xyz[batch, old]  # (B,3)
        d = jnp.sum((xyz - last[:, None, :]) ** 2, axis=-1)
        temp = jnp.where(valid, jnp.minimum(temp, d), temp)
        cand = jnp.where(valid, temp, -1.0)  # invalid never win (best=-1 init)
        old = jnp.argmax(cand, axis=-1).astype(jnp.int32)
        idxs = idxs.at[:, j].set(old)
        return temp, idxs, old

    _, idxs, _ = jax.lax.fori_loop(1, k, body, (temp0, idxs0, old0))
    return idxs


def gather_points(xyz, idx):
    """(B,N,C), (B,k) -> (B,k,C) (cu:38-87's gather, pure XLA here)."""
    return jnp.take_along_axis(xyz, idx[..., None], axis=1)


def downsample_point_clouds(xyz, k: int):
    """(B,N,3) -> (B,k,3) FPS subset (furthest_point_sampling.py:84-93)."""
    assert xyz.ndim == 3 and xyz.shape[2] == 3, xyz.shape
    idx = furthest_point_sampling(xyz, k)
    return gather_points(xyz, idx)
