"""Differentiable GAN augmentations (DiffAugment), key-driven and jittable.

Distribution-equivalent to the reference's modified DiffAugment
(``utils/diff_augment.py``): brightness / saturation / contrast /
translation / cutout, where translation wraps the azimuth axis circularly
modulo W-1 and zero-fills vertically through 1-row border padding
(``utils/diff_augment.py:53-79``), and cutout zeroes an edge-clamped
(H/2, W/2) window (``:82-102``).

Everything is expressed with broadcasted iota + gather/where (no dynamic
shapes), so the whole augmentation stack fuses into the surrounding train
step under jit.  Tensors are NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_POLICY = ("brightness", "saturation", "contrast", "translation", "cutout")


# The reference writes ``factor.bernoulli_(p) * factor.uniform_(-1, 1)``
# (utils/diff_augment.py:28, 37, 47).  Both operands alias the SAME tensor,
# so the bernoulli fill is overwritten and the product evaluates to u*u with
# u ~ U(-1,1) — i.e. factor = u^2 in [0,1] and the probability gate is dead.
# The published checkpoints were trained under that distribution, so it is
# the default here; set aliased=False for the intended bernoulli*U(-1,1).
ALIASED_FACTOR = True


def _per_image_factor(key, b, p, band, offset=0.0, dtype=jnp.float32):
    """Per-image color factor, shaped (B,1,1,1). See ALIASED_FACTOR."""
    ku, kb = jax.random.split(key)
    u = jax.random.uniform(ku, (b, 1, 1, 1), dtype, -1.0, 1.0)
    if ALIASED_FACTOR:
        return u * u * band + offset
    keep = jax.random.bernoulli(kb, p, (b, 1, 1, 1)).astype(dtype)
    return keep * u * band + offset


def rand_brightness(key, x, band=0.5, p=1.0):
    return x + _per_image_factor(key, x.shape[0], p, band, dtype=x.dtype)


def rand_saturation(key, x, band=1.0, p=1.0):
    factor = _per_image_factor(key, x.shape[0], p, band, offset=1.0, dtype=x.dtype)
    x_mean = x.mean(axis=-1, keepdims=True)
    return x_mean + (x - x_mean) * factor


def rand_contrast(key, x, band=0.5, p=1.0):
    factor = _per_image_factor(key, x.shape[0], p, band, offset=1.0, dtype=x.dtype)
    x_mean = x.mean(axis=(1, 2, 3), keepdims=True)
    return x_mean + (x - x_mean) * factor


def rand_translation(key, x, ratio=(1.0 / 8.0, 1.0 / 8.0), p=1.0):
    """Per-image integer shift: vertical zero-fill, horizontal circular
    modulo W-1 (the reference quirk, utils/diff_augment.py:66-69).

    Implemented as one-hot permutation matmuls rather than gathers: batched
    (H,H)/(W,W) selection matrices run on the MXU and differentiate as
    transposed matmuls, where gather/scatter lowering is ~40x slower on TPU
    for this shape."""
    b, h, w, _ = x.shape
    kh, kw, kp = jax.random.split(key, 3)
    shift_h = int(h * ratio[0] / 2 + 0.5)
    shift_w = int(w * ratio[1] / 2 + 0.5)
    th = jax.random.randint(kh, (b, 1), -shift_h, shift_h + 1)
    tw = jax.random.randint(kw, (b, 1), -shift_w, shift_w + 1)

    # vertical: out[i] = x[i + th] if 0 <= i+th < h else 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)[None]  # out index i
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)[None]  # src index k
    hi = jax.lax.Precision.HIGHEST  # one-hot selection must be exact
    pv = (cols == rows + th[:, :, None]).astype(x.dtype)  # (b,h,h)
    y = jnp.einsum("bik,bkwc->biwc", pv, x, precision=hi)

    # horizontal: out[j] = y[(j + tw) mod (w-1)]
    out_j = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)[None]
    src_k = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)[None]
    ph = (src_k == (out_j + tw[:, :, None]) % (w - 1)).astype(x.dtype)  # (b,w,w)
    y = jnp.einsum("bjk,bhkc->bhjc", ph, y, precision=hi)

    keep = jax.random.bernoulli(kp, p, (b, 1, 1, 1))
    return jnp.where(keep, y, x)


def rand_cutout(key, x, ratio=0.5, p=1.0):
    b, h, w, _ = x.shape
    kx, ky, kp = jax.random.split(key, 3)
    cut_h, cut_w = int(h * ratio + 0.5), int(w * ratio + 0.5)
    off_x = jax.random.randint(kx, (b, 1, 1), 0, h + (1 - cut_h % 2))
    off_y = jax.random.randint(ky, (b, 1, 1), 0, w + (1 - cut_w % 2))
    # reference scatters onto clamped indices -> the zeroed region is the
    # intersection of [off-cut/2, off-cut/2+cut-1] with the image.
    gh = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    gw = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    lo_h, hi_h = off_x - cut_h // 2, off_x - cut_h // 2 + cut_h - 1
    lo_w, hi_w = off_y - cut_w // 2, off_y - cut_w // 2 + cut_w - 1
    inside = (gh >= lo_h) & (gh <= hi_h) & (gw >= lo_w) & (gw <= hi_w)
    y = x * (1.0 - inside[..., None].astype(x.dtype))
    keep = jax.random.bernoulli(kp, p, (b, 1, 1, 1))
    return jnp.where(keep, y, x)


AUGMENT_FNS = {
    "brightness": rand_brightness,
    "saturation": rand_saturation,
    "contrast": rand_contrast,
    "translation": rand_translation,
    "cutout": rand_cutout,
}


def diff_augment(key, x, policy=DEFAULT_POLICY, p: float = 1.0):
    """Apply the augmentation pipeline; one fresh key per op."""
    for i, name in enumerate(policy):
        x = AUGMENT_FNS[name](jax.random.fold_in(key, i), x, p=p)
    return x
