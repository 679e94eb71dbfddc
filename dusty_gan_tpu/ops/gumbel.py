"""Binary Gumbel-softmax (Gumbel-sigmoid) relaxation with straight-through.

Matches ``GumbelSigmoid`` (``models/dusty.py:6-62``):

* logistic noise ``l = -log(log(U1+eps)/log(U2+eps) + eps)`` with eps=1e-10,
  shared across channels — shape (B,1,H,W)-equivalent for pixelwise,
  (B,1,1,1) for imagewise (here NHWC: (B,H,W,1) / (B,1,1,1));
* temperature sigmoid, optionally with a learnable inverse temperature
  ``softplus(w) + 1/tau_max`` when tau is None (dusty.py:38-43);
* hard straight-through estimator ``hard - sg(soft) + soft`` (dusty.py:54-57).

Unlike the reference's implicit CUDA RNG, noise comes from an explicit JAX
key, so fixed-noise evaluation (``utils/__init__.py:141-149``) is just
passing the same noise tensor back in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logistic_noise(key, batch, hw, pixelwise: bool = True, eps: float = 1e-10, dtype=jnp.float32):
    """Sample the reference's logistic noise field, NHWC with C=1."""
    shape = (batch, hw[0], hw[1], 1) if pixelwise else (batch, 1, 1, 1)
    u1 = jax.random.uniform(key, shape, dtype)
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), shape, dtype)
    return -jnp.log(jnp.log(u1 + eps) / jnp.log(u2 + eps) + eps)


def gumbel_sigmoid(
    logits,
    noise,
    tau=1.0,
    inverse_tau=None,
    hard: bool = True,
    threshold: float = 0.5,
):
    """Relaxed binary sample from ``logits`` (NHWC) given a noise field.

    ``noise=None`` disables noise injection (deterministic eval thresholding).
    Provide ``inverse_tau`` (a traced scalar) for the learnable-temperature
    variant; otherwise the static ``tau`` divisor is used.
    """
    if noise is not None:
        logits = logits + noise.astype(logits.dtype)
    if inverse_tau is not None:
        soft = jax.nn.sigmoid(logits * inverse_tau)
    else:
        soft = jax.nn.sigmoid(logits / tau)
    if not hard:
        return soft
    hard_mask = (soft > threshold).astype(soft.dtype)
    return hard_mask - jax.lax.stop_gradient(soft) + soft
