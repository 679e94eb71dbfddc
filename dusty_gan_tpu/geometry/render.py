"""Differentiable point-cloud rendering: soft z-buffer + bilinear splatting.

Re-design of ``utils/render.py``: ``bilinear_rasterizer`` scatters each
point's value into its four neighboring pixels with bilinear weights
(render.py:67-127); ``render_point_clouds`` produces the bird's-eye-view
images used for logging/demo (render.py:18-64) — pinhole projection
implemented directly (the reference used kornia.geometry.project_points).

Scatter-adds lower to XLA scatter on TPU; values/coords stay (B, N, C) so
the op is embarrassingly batch-parallel under pjit.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_rasterizer(coords, values, out_shape):
    """coords: (B,N,2) float (h,w) pixel positions; values: (B,N,C);
    returns (B,H,W,C).  Exact weight/clamping semantics of render.py:67-127
    (including the >=1e-3 weight stability threshold)."""
    b, n, c = values.shape
    h_dim, w_dim = out_shape
    hh = coords[..., 0]
    ww = coords[..., 1]

    h_t = jnp.floor(hh)
    h_b = h_t + 1.0
    w_l = jnp.floor(ww)
    w_r = w_l + 1.0

    h_t_safe = jnp.clip(h_t, 0.0, h_dim - 1)
    h_b_safe = jnp.clip(h_b, 0.0, h_dim - 1)
    w_l_safe = jnp.clip(w_l, 0.0, w_dim - 1)
    w_r_safe = jnp.clip(w_r, 0.0, w_dim - 1)

    wt_h_t = (h_b - hh) * (h_t == h_t_safe)
    wt_h_b = (hh - h_t) * (h_b == h_b_safe)
    wt_w_l = (w_r - ww) * (w_l == w_l_safe)
    wt_w_r = (ww - w_l) * (w_r == w_r_safe)

    out = jnp.zeros((b, h_dim * w_dim, c), values.dtype)
    for wt_h, h_safe in ((wt_h_t, h_t_safe), (wt_h_b, h_b_safe)):
        for wt_w, w_safe in ((wt_w_l, w_l_safe), (wt_w_r, w_r_safe)):
            wt = wt_h * wt_w
            wt = wt * (wt >= 1e-3)  # stability threshold (render.py:104-107)
            idx = (w_safe + w_dim * h_safe).astype(jnp.int32)  # (B,N)
            out = out.at[
                jnp.arange(b)[:, None], idx
            ].add(values * wt[..., None])
    return out.reshape(b, h_dim, w_dim, c)


def render_point_clouds(
    xyz,
    colors,
    L: int = 512,
    R=None,
    t=None,
    focal_length: float = 1.0,
):
    """Soft z-buffered BEV render (render.py:18-64).

    xyz: (B,N,3) in [-1,1] unit space; colors: (B,N,C) (normals in the
    reference call sites).  Returns (B,L,L,C).
    """
    xyz = xyz * jnp.asarray([1.0, 1.0, -1.0], xyz.dtype)  # flip z
    if R is not None:
        xyz = xyz @ R
    if t is not None:
        xyz = xyz + t

    # pinhole: u = fx * x/z + cx (kornia project_points equivalent)
    zc = xyz[..., 2:3]
    uv = xyz[..., :2] / (zc + 1e-12) * focal_length + 0.5
    uv = uv * L
    inside = (uv > 0.0) & (uv < L - 1)
    mask = inside[..., 0:1] & inside[..., 1:2]
    colors = colors * mask

    uv = L - uv
    depth = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    weight = jnp.exp(-3.0 * depth)
    weight = weight * (depth > 1e-8)
    bev = bilinear_rasterizer(uv, weight * colors, (L, L))
    bev = bev / (bilinear_rasterizer(uv, weight, (L, L)) + 1e-8)
    return bev
