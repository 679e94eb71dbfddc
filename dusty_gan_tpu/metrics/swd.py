"""Sliced Wasserstein distance over Laplacian-pyramid patch descriptors.

Parity with ``utils/metrics/swd.py`` (the ProGAN metric): [1,4,6,4,1]
Gaussian pyramid (reflect-padded), 7x7 patches (128 random per image per
level), per-level descriptor standardization, 4 repeats of 128 random
projections, sorted-L1 sliced Wasserstein, plus the reference's
``swd-{16<<level}`` result naming and mean.

Randomness is key-driven; images are NHWC.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_GAUSS = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0], np.float32)
_K5 = np.outer(_GAUSS, _GAUSS)
_K5 = _K5 / _K5.sum()


def _depthwise5x5(x, kernel, stride: int):
    """5x5 depthwise conv, input already padded. NHWC."""
    c = x.shape[-1]
    k = jnp.asarray(kernel, x.dtype)[..., None, None]  # (5,5,1,1)
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def pyramid_down(x):
    """(swd.py:22-29)"""
    p = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    return _depthwise5x5(p, _K5, 2)


def pyramid_up(x):
    """(swd.py:32-41): zero-dilate by 2 (the reference's center-one ConvT
    places samples at ODD output positions), crop last row/col,
    reflect-pad 2, then 5x5 gaussian * 4."""
    b, h, w, c = x.shape
    up = jnp.zeros((b, 2 * h + 1, 2 * w + 1, c), x.dtype)
    up = up.at[:, 1::2, 1::2].set(x)
    up = up[:, :-1, :-1]
    p = jnp.pad(up, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    return _depthwise5x5(p, _K5 * 4.0, 1)


def laplacian_pyramid(images, num_levels: int):
    """(swd.py:43-48)"""
    pyramid = [images]
    for _ in range(1, num_levels):
        pyramid.append(pyramid_down(pyramid[-1]))
        pyramid[-2] = pyramid[-2] - pyramid_up(pyramid[-1])
    return pyramid


def extract_patches(key, minibatch, patch_size: int, num_patches: int):
    """All 7x7 patches (stride 1) -> random subset shared across the batch
    (swd.py:51-62). Returns (B, num_patches, C, pH, pW) like the torch
    unfold layout."""
    b, h, w, c = minibatch.shape
    ph = pw = patch_size
    nh, nw = h - ph + 1, w - pw + 1
    inds = jax.random.permutation(key, nh * nw)[:num_patches]
    ih, iw = inds // nw, inds % nw
    # vectorized patch gather: index grids (num_patches, ph, pw)
    gh = ih[:, None, None] + jnp.arange(ph)[None, :, None]
    gw = iw[:, None, None] + jnp.arange(pw)[None, None, :]
    patches = minibatch[:, gh, gw]  # (B, num_patches, ph, pw, C)
    return jnp.transpose(patches, (0, 1, 4, 2, 3))  # (B,P,C,ph,pw)


def finalize_descriptors(desc):
    """standardize over (batch, patch, h, w) per channel (swd.py:71-78)."""
    mean = jnp.mean(desc, axis=(0, 1, 3, 4), keepdims=True)
    # torch.std uses Bessel correction (unbiased); replicate
    n = desc.shape[0] * desc.shape[1] * desc.shape[3] * desc.shape[4]
    var = jnp.sum((desc - mean) ** 2, axis=(0, 1, 3, 4), keepdims=True) / max(n - 1, 1)
    desc = (desc - mean) / (jnp.sqrt(var) + 1e-8)
    return desc.reshape(-1, desc.shape[2] * desc.shape[3] * desc.shape[4])


def sliced_wasserstein_distance(key, desc1, desc2, dir_repeats: int, dirs_per_repeat: int):
    """(swd.py:81-95)"""
    dim = desc1.shape[1]

    def one_repeat(k):
        dirs = jax.random.normal(k, (dim, dirs_per_repeat), desc1.dtype)
        dirs = dirs / jnp.std(dirs, axis=0, keepdims=True, ddof=1)
        p1 = jnp.sort(desc1 @ dirs, axis=0)
        p2 = jnp.sort(desc2 @ dirs, axis=0)
        return jnp.mean(jnp.abs(p1 - p2))

    keys = jax.random.split(key, dir_repeats)
    return jnp.mean(jnp.stack([one_repeat(k) for k in keys]))


def compute_swd(
    image1,
    image2,
    key=None,
    num_levels=None,
    patch_size: int = 7,
    num_patches: int = 128,
    dir_repeats: int = 4,
    dirs_per_repeat: int = 128,
    batch_size: int = 128,
) -> Dict[str, float]:
    """(swd.py:98-144). images NHWC, identical shapes."""
    assert image1.ndim == image2.ndim == 4
    assert image1.shape == image2.shape
    b, h, w, c = image1.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    if num_levels is None:
        num_levels = int(np.log2(min(h, w) // 16) + 1)

    desc1 = {i: [] for i in range(num_levels)}
    desc2 = {i: [] for i in range(num_levels)}
    for start in range(0, b, batch_size):
        kb = jax.random.fold_in(key, start)
        b1 = image1[start : start + batch_size]
        b2 = image2[start : start + batch_size]
        p1 = laplacian_pyramid(b1, num_levels)
        p2 = laplacian_pyramid(b2, num_levels)
        for lvl in range(num_levels):
            kl = jax.random.fold_in(kb, lvl)
            desc1[lvl].append(extract_patches(kl, p1[lvl], patch_size, num_patches))
            desc2[lvl].append(extract_patches(kl, p2[lvl], patch_size, num_patches))

    result = {}
    for lvl in range(num_levels):
        d1 = finalize_descriptors(jnp.concatenate(desc1[lvl], axis=0))
        d2 = finalize_descriptors(jnp.concatenate(desc2[lvl], axis=0))
        result["swd-" + str(16 << lvl)] = float(
            sliced_wasserstein_distance(
                jax.random.fold_in(key, 1000 + lvl), d1, d2, dir_repeats, dirs_per_repeat
            )
        )
    result["swd-mean"] = float(sum(result.values()) / len(result))
    return result
