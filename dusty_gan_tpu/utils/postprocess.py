"""Output-dict post-processing and visualization helpers.

Parity with ``utils/__init__.py:163-210``: map generator outputs from the
[-1,1] tanh domain to [0,1], sigmoid the confidence, back-project to
points, estimate normals; ``colorize`` applies a turbo colormap for image
logging.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dusty_gan_tpu.geometry.lidar import tanh_to_sigmoid
from dusty_gan_tpu.geometry.normals import xyz_to_normal


def postprocess(synth: dict, lidar, tol: float = 1e-8, normal_mode: str = "closest") -> dict:
    """(utils/__init__.py:163-179); all images NHWC."""
    out = {}
    for key, value in synth.items():
        if key in ("depth", "depth_orig"):
            out[key] = jnp.clip(tanh_to_sigmoid(value), 0.0, 1.0)
        elif key == "confidence":
            out[key] = jnp.asarray(1.0, jnp.float32) / (1.0 + jnp.exp(-value.astype(jnp.float32)))
        else:
            out[key] = value
    out["points"] = lidar.inv_to_xyz(out["depth"], tol)
    out["normals"] = xyz_to_normal(out["points"], mode=normal_mode)
    return out


_TURBO = None


def _turbo_map():
    global _TURBO
    if _TURBO is None:
        import matplotlib.cm as cm

        _TURBO = np.asarray(cm.turbo(np.linspace(0, 1, 256))[:, :3], np.float32)
    return _TURBO


def cmap_table(name: str = "turbo"):
    """256-entry RGB lookup table for ``colorize`` from any matplotlib
    colormap name (the reference app's color-map selector,
    demo.py:227)."""
    import matplotlib

    cmap = matplotlib.colormaps[name]
    return np.asarray(cmap(np.linspace(0, 1, 256))[:, :3], np.float32)


def colorize(img, cmap_vals=None):
    """(B,H,W,1) or (B,H,W) in [0,1] -> (B,H,W,3) turbo-colorized
    (utils/__init__.py:194-210)."""
    x = np.asarray(img)
    if x.ndim == 4:
        assert x.shape[-1] == 1, f"expected single channel, got {x.shape}"
        x = x[..., 0]
    table = cmap_vals if cmap_vals is not None else _turbo_map()
    idx = np.round(np.clip(x, 0.0, 1.0) * 255.0).astype(np.int32)
    return table[idx]
