"""Surface-normal estimation on the range-image grid.

Re-design of ``utils/geometry.py:38-126``: for each pixel, form the 8
neighbor offsets at distance ``d`` (circular-padded horizontally, +inf
vertically), take cross products of consecutive neighbor-pair difference
vectors, and either pick the closest pair ("closest") or average all 8
("mean").

Instead of the reference's giant gather tables, neighbors are produced by
jnp.roll on the padded tensor — pure VPU shifts that XLA fuses; everything
is NHWC (B, H, W, 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from dusty_gan_tpu.ops.padding import pad_ring

# 8 adjacent offsets, same order as utils/geometry.py:63-76
_OFFSETS = (
    (-1, 0),  # 0
    (-1, 1),  # 1
    (0, 1),   # 2
    (1, 1),   # 3
    (1, 0),   # 4
    (1, -1),  # 5
    (0, -1),  # 6
    (-1, -1), # 7
)


def estimate_surface_normal(points, d: int = 2, mode: str = "closest"):
    """points: (B,H,W,3) -> unit normals (B,H,W,3).

    Invalid-neighbor handling matches the reference: vertical out-of-range
    neighbors are +inf (constant pad), horizontal wraps circularly.
    """
    b, h, w, c = points.shape
    assert c == 3, "points must be (B,H,W,3)"
    p = pad_ring(points, (d, d, 0, 0), horizontal="circular")
    p = jnp.pad(p, ((0, 0), (d, d), (0, 0), (0, 0)), constant_values=jnp.inf)

    def neighbor(dh, dw):
        return p[:, d + dh * d : d + dh * d + h, d + dw * d : d + dw * d + w]

    anchors = p[:, d : d + h, d : d + w]  # == points
    n1 = jnp.stack([neighbor(dh, dw) for dh, dw in _OFFSETS], axis=1)  # (B,8,H,W,3)
    n2 = jnp.stack(
        [neighbor(*_OFFSETS[(k + 2) % 8]) for k in range(8)], axis=1
    )

    v1 = n1 - anchors[:, None]
    v2 = n2 - anchors[:, None]
    if mode == "closest":
        diff = jnp.linalg.norm(v1, axis=-1) + jnp.linalg.norm(v2, axis=-1)  # (B,8,H,W)
        i = jnp.argmin(diff, axis=1)  # (B,H,W)
        sel = jnp.take_along_axis
        v1 = sel(v1, i[:, None, ..., None], axis=1)[:, 0]
        v2 = sel(v2, i[:, None, ..., None], axis=1)[:, 0]
        normals = jnp.cross(v1, v2)
    elif mode == "mean":
        normals = jnp.cross(v1, v2).mean(axis=1)
    else:
        raise NotImplementedError(mode)

    normals = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-8)
    return normals


def xyz_to_normal(xyz, mode: str = "closest"):
    """Colorized normal map in [0,1] (utils/__init__.py:217-221):
    negate, NaN->0, map [-1,1]->[0,1]."""
    normals = -estimate_surface_normal(xyz, mode=mode)
    normals = jnp.nan_to_num(normals, nan=0.0, posinf=0.0, neginf=0.0)
    return jnp.clip((normals + 1.0) / 2.0, 0.0, 1.0)


def euler_angles_to_rotation_matrix(theta):
    """R = Rz(theta[2]) @ Ry(theta[1]) @ Rx(theta[0]) — the demo camera's
    rotation convention (reference utils/geometry.py:5-35; driven by the
    BEV view sliders, demo.py:188-229)."""
    theta = jnp.asarray(theta, jnp.float32)
    cx, sx = jnp.cos(theta[0]), jnp.sin(theta[0])
    cy, sy = jnp.cos(theta[1]), jnp.sin(theta[1])
    cz, sz = jnp.cos(theta[2]), jnp.sin(theta[2])
    r_x = jnp.asarray([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], jnp.float32)
    r_y = jnp.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], jnp.float32)
    r_z = jnp.asarray([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], jnp.float32)
    return r_z @ r_y @ r_x
