"""Masked depth error/accuracy metrics (reconstruction evaluation).

Parity with ``utils/metrics/depth.py``: abs_rel / sq_rel / rmse / rmse_log
and the delta < 1.25^k accuracies, per sample over masked pixels.
Tensors NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_mean(x, mask):
    axes = tuple(range(1, x.ndim))
    return jnp.sum(x * mask, axis=axes) / jnp.sum(mask, axis=axes)


def compute_depth_error(depth_ref, depth_gen, mask=None):
    """(depth.py:4-24)"""
    if mask is None:
        mask = jnp.ones_like(depth_ref)
    abs_rel = _masked_mean(jnp.abs(depth_ref - depth_gen) / depth_ref, mask)
    sq_rel = _masked_mean((depth_ref - depth_gen) ** 2 / depth_ref, mask)
    rmse = jnp.sqrt(_masked_mean((depth_ref - depth_gen) ** 2, mask))
    rmse_log = jnp.sqrt(
        _masked_mean((jnp.log(depth_ref) - jnp.log(depth_gen)) ** 2, mask)
    )
    return {"abs_rel": abs_rel, "sq_rel": sq_rel, "rmse": rmse, "rmse_log": rmse_log}


def compute_depth_accuracy(depth_ref, depth_gen, mask=None):
    """(depth.py:27-42)"""
    if mask is None:
        mask = jnp.ones_like(depth_ref)
    delta = jnp.maximum(depth_ref / depth_gen, depth_gen / depth_ref)
    out = {}
    for k in (1, 2, 3):
        out[f"accuracy_{k}"] = _masked_mean((delta < 1.25**k).astype(depth_ref.dtype), mask)
    return out
