"""Geometry layer tests: LiDAR maps, normals (vs reference oracle), rasterizer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import load_reference_module
from dusty_gan_tpu.geometry.lidar import Lidar, sigmoid_to_tanh, tanh_to_sigmoid
from dusty_gan_tpu.geometry.normals import estimate_surface_normal
from dusty_gan_tpu.geometry.render import bilinear_rasterizer, render_point_clouds


def make_lidar(h=16, w=64, min_depth=0.9, max_depth=120.0):
    pitch = np.linspace(0.3, -0.4, h)[:, None] * np.ones((1, w))
    yaw = np.linspace(np.pi, -np.pi, w, endpoint=False)[None, :] * np.ones((h, 1))
    angle = np.stack([pitch, yaw], 0).astype(np.float32)
    return Lidar.from_angle_array(angle, (h, w), min_depth, max_depth)


class TestDepthMaps:
    def test_invert_revert_roundtrip(self):
        lidar = make_lidar()
        d = jnp.linspace(0.01, 1.0, 50)
        inv = lidar.invert_depth(d)
        back = lidar.revert_depth(inv)
        np.testing.assert_allclose(np.asarray(back), np.asarray(d), rtol=1e-5)
        # endpoints: depth 0 -> min_depth -> inv 1 ; depth 1 -> max -> inv 0
        np.testing.assert_allclose(float(lidar.invert_depth(jnp.asarray(0.0))), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(lidar.invert_depth(jnp.asarray(1.0))), 0.0, atol=1e-6)

    def test_sigmoid_tanh(self):
        x = jnp.asarray([0.0, 0.5, 1.0])
        np.testing.assert_allclose(np.asarray(sigmoid_to_tanh(x)), [-1, 0, 1])
        np.testing.assert_allclose(np.asarray(tanh_to_sigmoid(sigmoid_to_tanh(x))), np.asarray(x))

    def test_pol_to_xyz_norm_preserved(self):
        lidar = make_lidar()
        r = jnp.full((2, 16, 64, 1), 0.5)
        xyz = lidar.pol_to_xyz(r)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(xyz), axis=-1), 0.5, rtol=1e-5)

    def test_inv_to_xyz_drops_to_origin(self):
        lidar = make_lidar()
        inv = jnp.ones((1, 16, 64, 1)) * 0.5
        inv = inv.at[0, 0, 0, 0].set(0.0)  # drop_const = 0
        xyz = lidar.inv_to_xyz(inv, tol=1e-3)
        assert float(jnp.linalg.norm(xyz[0, 0, 0])) == 0.0
        assert float(jnp.linalg.norm(xyz[0, 5, 5])) > 0.0

    def test_points_to_depth_roundtrip(self):
        """project range image -> points -> back; valid pixels should agree."""
        lidar = make_lidar()
        rng = np.random.RandomState(0)
        inv = jnp.asarray(rng.uniform(0.3, 0.9, (1, 16, 64, 1)).astype(np.float32))
        xyz = lidar.inv_to_xyz(inv, tol=1e-8)
        pts = xyz.reshape(1, -1, 3)
        depth2d, valid = lidar.points_to_depth(pts)
        # compare normalized depth where re-projection marked valid.  The
        # azimuth wrap column is excluded: nearest-angle search operates in
        # raw (pitch, yaw) space, so yaw ~ +/-pi points can alias across the
        # seam (inherent to the algorithm, utils/lidar.py:84-88).
        depth_ref = lidar.revert_depth(inv)
        interior = np.zeros(np.asarray(valid).shape, bool)
        interior[:, :, 1:-1, :] = True
        sel = np.asarray(valid) & interior
        got = np.asarray(depth2d)[sel]
        want = np.asarray(depth_ref)[sel]
        assert np.asarray(valid).mean() > 0.9
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestNormals:
    @pytest.mark.parametrize("mode", ["closest", "mean"])
    def test_matches_reference(self, torch, mode):
        ref_geo = load_reference_module("utils/geometry.py", "ref_geometry")
        rng = np.random.RandomState(1)
        # smooth-ish surface: base plane + noise
        pts = np.stack(
            np.meshgrid(np.linspace(-1, 1, 12), np.linspace(-1, 1, 24), indexing="ij"),
            axis=-1,
        )
        z = 0.1 * rng.randn(12, 24, 1).astype(np.float32)
        pts = np.concatenate([pts, z], axis=-1).astype(np.float32)[None]  # (1,12,24,3)
        ref = ref_geo.estimate_surface_normal(
            torch.from_numpy(np.transpose(pts, (0, 3, 1, 2))), d=2, mode=mode
        )
        ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
        got = np.asarray(estimate_surface_normal(jnp.asarray(pts), d=2, mode=mode))
        # NaN patterns must agree; values must agree where finite
        ref_nan = ~np.isfinite(ref)
        got_nan = ~np.isfinite(got)
        np.testing.assert_array_equal(ref_nan, got_nan)
        np.testing.assert_allclose(got[~got_nan], ref[~ref_nan], rtol=1e-3, atol=1e-4)


class TestRasterizer:
    def test_single_point_bilinear_weights(self):
        coords = jnp.asarray([[[1.25, 2.75]]])  # (1,1,2)
        vals = jnp.asarray([[[1.0]]])
        out = np.asarray(bilinear_rasterizer(coords, vals, (4, 5)))[0, ..., 0]
        np.testing.assert_allclose(out[1, 2], 0.75 * 0.25, rtol=1e-6)
        np.testing.assert_allclose(out[1, 3], 0.75 * 0.75, rtol=1e-6)
        np.testing.assert_allclose(out[2, 2], 0.25 * 0.25, rtol=1e-6)
        np.testing.assert_allclose(out[2, 3], 0.25 * 0.75, rtol=1e-6)
        assert out.sum() == pytest.approx(1.0, rel=1e-6)

    def test_tiny_weights_thresholded(self):
        coords = jnp.asarray([[[1.0005, 2.0]]])  # w for next row ~5e-4 < 1e-3
        vals = jnp.asarray([[[1.0]]])
        out = np.asarray(bilinear_rasterizer(coords, vals, (4, 4)))[0, ..., 0]
        assert out[2, 2] == 0.0  # thresholded out

    def test_render_shapes(self):
        rng = np.random.RandomState(2)
        xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 100, 3)).astype(np.float32))
        colors = jnp.ones((2, 100, 3))
        bev = render_point_clouds(xyz, colors, L=64, t=jnp.asarray([0.0, 0.0, 0.5]))
        assert bev.shape == (2, 64, 64, 3)
        assert np.isfinite(np.asarray(bev)).all()
