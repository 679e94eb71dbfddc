"""LiDAR coordinate model: depth normalization and polar <-> Cartesian maps.

A registered-pytree re-design of the reference ``Coordinate``/``LiDAR``
modules (``utils/lidar.py:11-130``): an immutable bundle of calibration
constants + the per-pixel (elevation, azimuth) angle grid, with pure-
function methods, so the whole thing can be closed over by jit or passed
as an argument without retracing.

Conventions (NHWC): range images are (B, H, W, 1); the angle grid is
(H, W, 2) with channel 0 = elevation (pitch), 1 = azimuth (yaw); point
sets are (B, N, 3).

Value conventions preserved exactly (SURVEY.md §2.5):
* ``invert_depth``: [0,1] depth -> [0,1] normalized inverse depth
  (utils/lidar.py:31-36)
* ``revert_depth``: inverse (utils/lidar.py:38-47)
* ``inv_to_xyz(inv, tol)``: valid = |inv - drop_const| > tol; depth
  rescaled to meters then divided by max_depth (unit space); invalid
  pixels collapse to the origin (utils/lidar.py:61-68)
* ``points_to_depth``: differentiable point -> range-image re-projection
  via nearest-angle search + bilinear splatting (utils/lidar.py:70-107)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dusty_gan_tpu.geometry.render import bilinear_rasterizer


def normalize_minmax(x, vmin, vmax):
    return (x - vmin) / (vmax - vmin)


def denormalize_minmax(x, vmin, vmax):
    return x * (vmax - vmin) + vmin


def sigmoid_to_tanh(x):
    """[0,1] -> [-1,1] (utils/__init__.py:70-73)."""
    return x * 2.0 - 1.0


def tanh_to_sigmoid(x):
    """[-1,1] -> [0,1] (utils/__init__.py:76-79)."""
    return (x + 1.0) / 2.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Lidar:
    """Immutable LiDAR calibration pytree.

    ``angle``: (H, W, 2) mean per-pixel (pitch, yaw) grid — the reference
    loads this from ``angles.pt`` and bilinearly resizes to the model
    shape (utils/lidar.py:127-130); use ``Lidar.from_angle_file``.
    """

    angle: jax.Array
    min_depth: float = dataclasses.field(metadata=dict(static=True))
    max_depth: float = dataclasses.field(metadata=dict(static=True))
    drop_const: float = dataclasses.field(default=0.0, metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        return self.angle.shape[0], self.angle.shape[1]

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------
    @staticmethod
    def from_angle_array(
        angle_2hw: np.ndarray, shape, min_depth: float, max_depth: float
    ) -> "Lidar":
        """Build from a (2, H0, W0) angle grid, bilinearly resized to
        ``shape`` with half-pixel centers (== torch F.interpolate
        align_corners=False, utils/lidar.py:127-130)."""
        a = jnp.asarray(angle_2hw, jnp.float32)
        h, w = shape
        if a.shape[1:] != (h, w):
            a = jax.image.resize(a, (2, h, w), method="bilinear")
        return Lidar(angle=jnp.transpose(a, (1, 2, 0)), min_depth=float(min_depth), max_depth=float(max_depth))

    @staticmethod
    def from_angle_file(path: str, shape, min_depth: float, max_depth: float) -> "Lidar":
        """Load ``angles.pt`` (torch) or ``angles.npy``."""
        if str(path).endswith(".npy"):
            arr = np.load(path)
        else:
            import torch

            arr = torch.load(path, map_location="cpu").numpy()
        return Lidar.from_angle_array(np.asarray(arr, np.float32), shape, min_depth, max_depth)

    # ------------------------------------------------------------------
    # depth domain maps
    # ------------------------------------------------------------------
    def invert_depth(self, norm_depth):
        depth = denormalize_minmax(norm_depth, self.min_depth, self.max_depth)
        disp = 1.0 / depth
        return normalize_minmax(disp, 1.0 / self.max_depth, 1.0 / self.min_depth)

    def revert_depth(self, norm_disp, norm: bool = True):
        disp = denormalize_minmax(norm_disp, 1.0 / self.max_depth, 1.0 / self.min_depth)
        depth = 1.0 / disp
        if norm:
            return normalize_minmax(depth, self.min_depth, self.max_depth)
        return depth

    # ------------------------------------------------------------------
    # projections
    # ------------------------------------------------------------------
    def pol_to_xyz(self, polar):
        """(B,H,W,1) range -> (B,H,W,3) xyz via the angle grid
        (utils/lidar.py:49-56)."""
        pitch = self.angle[..., 0]
        yaw = self.angle[..., 1]
        x = polar[..., 0] * jnp.cos(pitch) * jnp.cos(yaw)
        y = polar[..., 0] * jnp.cos(pitch) * jnp.sin(yaw)
        z = polar[..., 0] * jnp.sin(pitch)
        return jnp.stack([x, y, z], axis=-1)

    def xyz_to_pol(self, xyz):
        return jnp.linalg.norm(xyz, axis=-1, keepdims=True)

    def inv_to_xyz(self, inv_depth, tol: float = 1e-8):
        """(B,H,W,1) normalized inverse depth in [0,1] -> (B,H,W,3) unit-
        space xyz; dropped pixels -> origin (utils/lidar.py:61-68)."""
        valid = jnp.abs(inv_depth - self.drop_const) > tol
        depth = self.revert_depth(inv_depth)  # [0,1]
        depth = depth * (self.max_depth - self.min_depth) + self.min_depth
        depth = depth / self.max_depth
        depth = depth * valid
        return self.pol_to_xyz(depth)

    def points_to_depth(
        self,
        xyz,
        drop_value: float = 1.0,
        tol: float = 1e-8,
        tau: float = 2.0,
        chunk: int = 8192,
    ):
        """Differentiable (B,N,3) unit-space points -> (B,H,W,1) normalized
        depth image + validity mask (utils/lidar.py:70-107).

        Nearest-angle assignment scans the H*W reference grid in ``chunk``-
        sized slabs with a running (min, argmin) carry — peak memory is
        O(B*N*chunk) instead of O(B*N*H*W), so the full-resolution 64x2048
        grid (N~16k points -> 8.6 GB if materialized) stays well under HBM.
        Ties resolve to the first (lowest-index) angle, matching
        ``torch.min``'s first-occurrence argmin in the reference.
        """
        h, w = self.shape
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        r = jnp.sqrt(x**2 + y**2 + 1e-24)
        depth_1d = jnp.linalg.norm(xyz, axis=-1)[..., None]  # (B,N,1)
        weight = jnp.exp(-tau * depth_1d)
        depth_m = depth_1d * self.max_depth
        weight = weight * jax.lax.stop_gradient(
            ((depth_m > self.min_depth) & (depth_m < self.max_depth)).astype(weight.dtype)
        )
        pitch = jnp.arctan2(z, r)  # (B,N)
        yaw = jnp.arctan2(y, x)
        # nearest reference angle: argmin_{hw} (pitch-p_hw)^2 + (yaw-y_hw)^2
        ref = self.angle.reshape(-1, 2)  # (HW,2)
        hw = ref.shape[0]
        chunk = min(int(chunk), hw)
        pad = (-hw) % chunk
        if pad:
            # sentinel angles at huge distance: never the argmin
            ref = jnp.concatenate([ref, jnp.full((pad, 2), 1e9, ref.dtype)], axis=0)
        ref_chunks = ref.reshape(-1, chunk, 2)
        offsets = jnp.arange(ref_chunks.shape[0], dtype=jnp.int32) * chunk

        def body(carry, rc_off):
            rc, off = rc_off  # (chunk,2), scalar
            best, best_idx = carry
            d2 = (
                (pitch[..., None] - rc[None, None, :, 0]) ** 2
                + (yaw[..., None] - rc[None, None, :, 1]) ** 2
            )  # (B,N,chunk)
            cmin = jnp.min(d2, axis=-1)
            cidx = jnp.argmin(d2, axis=-1).astype(jnp.int32) + off
            take = cmin < best  # strict: earlier chunk wins ties
            return (jnp.where(take, cmin, best), jnp.where(take, cidx, best_idx)), None

        init = (
            jnp.full(pitch.shape, jnp.inf, pitch.dtype),
            jnp.zeros(pitch.shape, jnp.int32),
        )
        (_, ids), _ = jax.lax.scan(body, init, (ref_chunks, offsets))  # (B,N)
        uv = jnp.stack([ids // w, ids % w], axis=-1).astype(jnp.float32)  # (B,N,2) (h,w)
        num = bilinear_rasterizer(uv, weight * depth_m, (h, w))
        den = bilinear_rasterizer(uv, weight, (h, w))
        depth_2d = num / (den + 1e-8)
        valid = depth_2d != 0
        depth_2d = normalize_minmax(depth_2d, self.min_depth, self.max_depth)
        depth_2d = jnp.where(valid, depth_2d, drop_value)
        return depth_2d, valid
