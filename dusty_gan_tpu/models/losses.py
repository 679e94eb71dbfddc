"""GAN objectives and regularizers as pure functions.

Parity with ``models/loss.py``: seven adversarial objectives
(nsgan/wgan/lsgan/hinge/ragan/rahinge/ralsgan, loss.py:21-88), the R1/zero-
and one-centered gradient penalties (loss.py:91-118; the trainer's inlined
R1 is ``trainers/dcgan_amp.py:216-232``), and StyleGAN2 path-length
regularization with EMA baseline (loss.py:121-151,
``trainers/dcgan_amp.py:269-306``).

In JAX the double-backward gymnastics of the reference (scaled grads +
DDP graph-retention hacks) disappear: R1 is an inner ``jax.vjp`` w.r.t.
the augmented real inputs nested inside the outer parameter grad, and the
whole thing compiles to one fused XLA computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GAN_MODES = ("nsgan", "wgan", "lsgan", "hinge", "ragan", "rahinge", "ralsgan")


def _avg_diff(a, b):
    return a - jnp.mean(b, axis=0, keepdims=True)


def gan_loss_d(metric: str, pred_real, pred_fake, smoothing: float = 1.0):
    """Discriminator objective (loss.py:37-64)."""
    pr = pred_real.astype(jnp.float32)
    pf = pred_fake.astype(jnp.float32)
    if metric == "nsgan":
        return jnp.mean(jax.nn.softplus(-pr)) + jnp.mean(jax.nn.softplus(pf))
    if metric == "wgan":
        return -jnp.mean(pr) + jnp.mean(pf)
    if metric == "lsgan":
        return jnp.mean((pr - smoothing) ** 2) + jnp.mean(pf**2)
    if metric == "hinge":
        return jnp.mean(jax.nn.relu(1.0 - pr)) + jnp.mean(jax.nn.relu(1.0 + pf))
    if metric == "ragan":
        return jnp.mean(jax.nn.softplus(-_avg_diff(pr, pf))) + jnp.mean(
            jax.nn.softplus(_avg_diff(pf, pr))
        )
    if metric == "rahinge":
        return jnp.mean(jax.nn.relu(1.0 - _avg_diff(pr, pf))) + jnp.mean(
            jax.nn.relu(1.0 + _avg_diff(pf, pr))
        )
    if metric == "ralsgan":
        return jnp.mean((_avg_diff(pr, pf) - 1.0) ** 2) + jnp.mean(
            (_avg_diff(pf, pr) + 1.0) ** 2
        )
    raise NotImplementedError(metric)


def gan_loss_g(metric: str, pred_real, pred_fake):
    """Generator objective (loss.py:66-88). nsgan/wgan/lsgan/hinge ignore
    pred_real (pass None)."""
    pf = pred_fake.astype(jnp.float32)
    if metric == "nsgan":
        return jnp.mean(jax.nn.softplus(-pf))
    if metric == "wgan":
        return -jnp.mean(pf)
    if metric == "lsgan":
        return jnp.mean((pf - 1.0) ** 2)
    if metric == "hinge":
        return -jnp.mean(pf)
    pr = pred_real.astype(jnp.float32)
    if metric == "ragan":
        return jnp.mean(jax.nn.softplus(_avg_diff(pr, pf))) + jnp.mean(
            jax.nn.softplus(-_avg_diff(pf, pr))
        )
    if metric == "rahinge":
        return jnp.mean(jax.nn.relu(1.0 + _avg_diff(pr, pf))) + jnp.mean(
            jax.nn.relu(1.0 - _avg_diff(pf, pr))
        )
    if metric == "ralsgan":
        return jnp.mean((_avg_diff(pr, pf) + 1.0) ** 2) + jnp.mean(
            (_avg_diff(pf, pr) - 1.0) ** 2
        )
    raise NotImplementedError(metric)


def r1_penalty(d_apply, x_real):
    """Zero-centered gradient penalty on reals (trainers/dcgan_amp.py:216-231):
    ``sum_i ||d D(x_i) / d x_i||^2`` averaged over the batch.

    ``d_apply`` maps images -> logits and must be differentiable w.r.t. its
    parameters *through this function* (grad-of-grad); returns
    (penalty, logits) so the forward pass is shared with the GAN loss.
    """
    x_real = x_real.astype(jnp.float32)
    logits, vjp_fn = jax.vjp(d_apply, x_real)
    (grads,) = vjp_fn(jnp.ones_like(logits))
    grads = grads.astype(jnp.float32)
    penalty = jnp.mean(jnp.sum(grads**2, axis=(1, 2, 3)))
    return penalty, logits


def gradient_penalty_one_centered(d_apply, x):
    """One-centered GP (WGAN-GP flavor; loss.py:110-116)."""
    x = x.astype(jnp.float32)
    logits, vjp_fn = jax.vjp(d_apply, x)
    (grads,) = vjp_fn(jnp.ones_like(logits))
    norms = jnp.sqrt(jnp.sum(grads.astype(jnp.float32) ** 2, axis=(1, 2, 3)) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2), logits


def path_length_penalty(g_depth_apply, z, noise_key, pl_ema, decay: float = 0.01):
    """StyleGAN2 path-length regularization (trainers/dcgan_amp.py:269-306).

    ``g_depth_apply``: latent -> depth image (NHWC).  Returns
    (penalty, new_pl_ema).  ``decay`` matches the reference's
    ``pl_ema.lerp(mean, 0.01)``.
    """
    x, vjp_fn = jax.vjp(g_depth_apply, z.astype(jnp.float32))
    noise = jax.random.normal(noise_key, x.shape, jnp.float32)
    noise = noise / jnp.sqrt(jnp.asarray(x.shape[1] * x.shape[2] * x.shape[3], jnp.float32))
    (grads,) = vjp_fn(noise.astype(x.dtype))
    pl_lengths = jnp.sqrt(jnp.sum(grads.astype(jnp.float32) ** 2, axis=-1))
    new_ema = pl_ema + (jnp.mean(pl_lengths) - pl_ema) * decay
    new_ema = jax.lax.stop_gradient(new_ema)
    penalty = jnp.mean((pl_lengths - new_ema) ** 2)
    return penalty, new_ema


def masked_loss(img_ref, img_gen, mask, distance: str = "l1"):
    """Per-sample masked reconstruction loss (utils/__init__.py:237-246)."""
    if distance == "l1":
        err = jnp.abs(img_ref - img_gen)
    elif distance == "l2":
        err = (img_ref - img_gen) ** 2
    else:
        raise NotImplementedError(distance)
    axes = tuple(range(1, img_ref.ndim))
    return jnp.sum(err * mask, axis=axes) / jnp.sum(mask, axis=axes)
