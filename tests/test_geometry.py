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


def _load_ref_lidar(torch):
    """Load reference utils/lidar.py with its relative `from . import render`
    satisfied; kornia/numba (used only by render_point_clouds, not by the
    rasterizer the oracle needs) are stubbed when absent."""
    import importlib.util
    import sys
    import types

    from tests.conftest import REFERENCE

    path = REFERENCE / "utils/lidar.py"
    if not path.exists():
        pytest.skip(f"reference file not available: {path}")
    for optional in ("kornia", "numba"):
        if optional not in sys.modules:
            try:
                __import__(optional)
            except ImportError:
                sys.modules[optional] = types.ModuleType(optional)
    pkg = types.ModuleType("ref_utils_pkg")
    pkg.__path__ = [str(REFERENCE / "utils")]
    sys.modules["ref_utils_pkg"] = pkg
    for sub in ("render", "lidar"):
        spec = importlib.util.spec_from_file_location(
            f"ref_utils_pkg.{sub}", REFERENCE / f"utils/{sub}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_utils_pkg.lidar"]


class TestPointsToDepthOracle:
    """Value-level parity of points_to_depth vs reference utils/lidar.py:70-107
    (VERDICT: previously only roundtrip-tested)."""

    H, W = 16, 64
    MIN_D, MAX_D = 0.9, 120.0

    def _ref_coord(self, torch, ref_mod):
        pitch = np.linspace(0.3, -0.4, self.H)[:, None] * np.ones((1, self.W))
        yaw = np.linspace(np.pi, -np.pi, self.W, endpoint=False)[None, :] * np.ones((self.H, 1))
        angle = np.stack([pitch, yaw], 0).astype(np.float32)[None]  # (1,2,H,W)

        class FixedCoord(ref_mod.Coordinate):
            # the reference's points_to_depth calls self.minmax_norm
            # (utils/lidar.py:104) which exists NOWHERE in the reference —
            # latent AttributeError, clearly meant normalize_minmax (:24).
            # Alias it so the oracle is runnable; ours implements the intent.
            minmax_norm = staticmethod(ref_mod.Coordinate.normalize_minmax)

            def init_coordmap(self, H, W):
                return torch.from_numpy(angle)

        return FixedCoord(self.MIN_D, self.MAX_D, (self.H, self.W))

    def _points(self, lidar):
        rng = np.random.RandomState(3)
        inv = rng.uniform(0.3, 0.9, (2, self.H, self.W, 1)).astype(np.float32)
        return np.asarray(lidar.inv_to_xyz(jnp.asarray(inv), tol=1e-8)).reshape(2, -1, 3)

    def test_matches_reference(self, torch):
        ref_mod = _load_ref_lidar(torch)
        coord = self._ref_coord(torch, ref_mod)
        lidar = make_lidar(self.H, self.W, self.MIN_D, self.MAX_D)
        pts = self._points(lidar)

        with torch.no_grad():
            ref_d, ref_v = coord.points_to_depth(torch.from_numpy(pts))
        ref_d = np.transpose(ref_d.numpy(), (0, 2, 3, 1))
        ref_v = np.transpose(ref_v.numpy(), (0, 2, 3, 1))

        got_d, got_v = lidar.points_to_depth(jnp.asarray(pts))
        got_d, got_v = np.asarray(got_d), np.asarray(got_v)

        # nearest-angle argmin ties are measure-zero with these continuous
        # angles; masks and values must agree everywhere
        np.testing.assert_array_equal(got_v, ref_v)
        np.testing.assert_allclose(got_d, ref_d, atol=1e-4)

    def test_chunked_scan_consistent(self):
        """chunk < H*W (incl. a non-dividing chunk that exercises the sentinel
        pad) must equal the single-slab result."""
        lidar = make_lidar(self.H, self.W, self.MIN_D, self.MAX_D)
        pts = jnp.asarray(self._points(lidar))
        d_full, v_full = lidar.points_to_depth(pts, chunk=self.H * self.W)
        for chunk in (7, 256):
            d_c, v_c = lidar.points_to_depth(pts, chunk=chunk)
            np.testing.assert_array_equal(np.asarray(v_c), np.asarray(v_full))
            np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_full), atol=1e-6)

    def test_full_resolution_grid(self):
        """64x2048 grid (the reference's full KITTI resolution) runs without
        materializing the (B,N,H*W) tensor (VERDICT weak #6)."""
        h, w = 64, 2048
        pitch = np.linspace(0.3, -0.4, h)[:, None] * np.ones((1, w))
        yaw = np.linspace(np.pi, -np.pi, w, endpoint=False)[None, :] * np.ones((h, 1))
        lidar = Lidar.from_angle_array(
            np.stack([pitch, yaw], 0).astype(np.float32), (h, w), self.MIN_D, self.MAX_D
        )
        rng = np.random.RandomState(4)
        pts = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 2048, 3)).astype(np.float32))
        d, v = jax.jit(lambda p: lidar.points_to_depth(p))(pts)
        assert d.shape == (1, h, w, 1)
        assert np.isfinite(np.asarray(d)).all()

    def test_differentiable(self):
        lidar = make_lidar(self.H, self.W, self.MIN_D, self.MAX_D)
        pts = jnp.asarray(self._points(lidar))
        g = jax.grad(lambda p: jnp.sum(lidar.points_to_depth(p, chunk=256)[0]))(pts)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0.0


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


class TestEulerRotation:
    def test_matches_reference(self, torch):
        from tests.conftest import load_reference_module
        from dusty_gan_tpu.geometry.normals import euler_angles_to_rotation_matrix

        ref_geo = load_reference_module("utils/geometry.py", "ref_geometry")
        rng = np.random.RandomState(0)
        for _ in range(5):
            theta = rng.uniform(-np.pi, np.pi, 3).astype(np.float32)
            ref = ref_geo.euler_angles_to_rotation_matrix(torch.from_numpy(theta)).numpy()
            got = np.asarray(euler_angles_to_rotation_matrix(theta))
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_demo_camera_defaults(self):
        from dusty_gan_tpu.cli.demo import _camera

        R, t = _camera(None, None, None)  # legacy fixed view
        assert R is None
        np.testing.assert_allclose(t, [0.0, 0.0, 0.5])
        R, t = _camera(120.0, None, None)  # partial spec fills slider defaults
        assert R.shape == (3, 3)
        np.testing.assert_allclose(t, [0.1, 0.0, 1.0], rtol=1e-6)
        # rotation matrices are orthonormal
        np.testing.assert_allclose(np.asarray(R) @ np.asarray(R).T, np.eye(3),
                                   atol=1e-5)
