"""DUSty maskers: noise-aware measurability masking over a GAN backbone.

Parity with ``models/dusty.py``:

* ``GumbelSigmoid`` — binary Gumbel-softmax with optional learnable
  temperature (dusty.py:6-62); noise comes from an explicit JAX RNG stream
  (collection "gumbel") or a caller-provided fixed noise tensor (the eval
  fixed-noise hook, ``utils/__init__.py:141-149``).
* ``DUSty1`` — per-pixel mask from a 1-channel confidence map (dusty.py:65-91).
* ``DUSty2`` — per-pixel x per-image masks from a 2-channel confidence map;
  at eval time the image-level mask thresholds the raw logit at 0 instead of
  sampling (dusty.py:94-127).

Composite: ``depth = mask * depth + (1 - mask) * drop_const``.
Tensors NHWC; output dict keys {depth, depth_orig, mask, confidence}.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dusty_gan_tpu.ops.gumbel import gumbel_sigmoid, logistic_noise


class GumbelSigmoid(nn.Module):
    tau: Optional[float] = 1.0  # None -> learnable inverse temperature
    tau_max: float = 1.0
    hard: bool = True
    eps: float = 1e-10
    pixelwise: bool = True

    @nn.compact
    def __call__(self, logits, threshold: float = 0.5, noise: Any = "sample"):
        """noise: "sample" (draw from the 'gumbel' RNG stream), None
        (no noise), or an explicit array (fixed-noise eval)."""
        if isinstance(noise, str) and noise == "sample":
            b, h, w = logits.shape[0], logits.shape[1], logits.shape[2]
            noise = logistic_noise(
                self.make_rng("gumbel"), b, (h, w), self.pixelwise, self.eps
            )
        inverse_tau = None
        tau = self.tau
        if self.tau is None:
            wparam = self.param("weight", nn.initializers.zeros, ())
            inverse_tau = jax.nn.softplus(wparam) + 1.0 / self.tau_max
            tau = None
        return gumbel_sigmoid(
            logits.astype(jnp.float32),
            noise,
            tau=tau,
            inverse_tau=inverse_tau,
            hard=self.hard,
            threshold=threshold,
        )


class DUSty1(nn.Module):
    """Per-pixel measurability masking (dusty.py:65-91)."""

    backbone: nn.Module
    tau: Optional[float] = 1.0
    drop_const: float = -1.0

    @nn.compact
    def __call__(
        self,
        latent,
        compute_dtype=None,
        train: bool = True,
        threshold: float = 0.5,
        fixed_noise: Any = None,
        compose_layer=None,
        compose_alpha=None,
    ):
        out = dict(self.backbone(latent, compute_dtype, compose_layer, compose_alpha))
        depth = out["depth"]
        noise = fixed_noise if fixed_noise is not None else "sample"
        mask = GumbelSigmoid(tau=self.tau, hard=True, pixelwise=True, name="gumbel")(
            out["confidence"].astype(jnp.float32), threshold, noise
        )
        out["depth_orig"] = depth
        out["mask"] = mask
        out["depth"] = mask * depth + (1.0 - mask) * self.drop_const
        return out


class DUSty2(nn.Module):
    """Per-pixel x per-image masking (dusty.py:94-127)."""

    backbone: nn.Module
    tau: Optional[float] = 1.0
    drop_const: float = -1.0

    @nn.compact
    def __call__(
        self,
        latent,
        compute_dtype=None,
        train: bool = True,
        threshold: float = 0.5,
        fixed_noise: Any = None,
        compose_layer=None,
        compose_alpha=None,
    ):
        out = dict(self.backbone(latent, compute_dtype, compose_layer, compose_alpha))
        depth = out["depth"]
        logits = out["confidence"].astype(jnp.float32)  # (B,H,W,2)
        noise_pix = noise_img = "sample"
        if fixed_noise is not None:
            noise_pix = fixed_noise.get("pixel")
            noise_img = fixed_noise.get("image")
        mask_pixel = GumbelSigmoid(
            tau=self.tau, hard=True, pixelwise=True, name="gumbel_pixel"
        )(logits[..., :1], threshold, noise_pix)
        if train:
            mask_image = GumbelSigmoid(
                tau=self.tau, hard=True, pixelwise=False, name="gumbel_image"
            )(logits[..., 1:], threshold, noise_img)
        else:
            # eval: threshold the image-level logit at 0 (dusty.py:118-120)
            mask_image = (logits[..., 1:] > 0.0).astype(jnp.float32)
        mask = mask_pixel * mask_image
        out["depth_orig"] = depth
        out["mask"] = jnp.concatenate([mask_pixel, mask_image], axis=-1)
        out["depth"] = mask * depth + (1.0 - mask) * self.drop_const
        return out
