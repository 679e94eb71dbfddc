"""Native C++ data-plane library: equivalence vs the NumPy reference path."""

import os

import numpy as np
import pytest

from dusty_gan_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def _pure_python_project(points, h, w):
    os.environ["DUSTY_GAN_TPU_NO_NATIVE"] = "1"
    try:
        import importlib

        from dusty_gan_tpu.data import preprocess

        importlib.reload(preprocess)
        return preprocess.project_scan(points, h, w)
    finally:
        del os.environ["DUSTY_GAN_TPU_NO_NATIVE"]


class TestProjectScan:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        # synthetic velodyne-like stream: 8 revolutions ordered ccw
        theta = np.linspace(0.01, 2 * np.pi - 0.01, 900)
        scans = []
        for rev in range(8):
            r = rng.uniform(2, 60, len(theta))
            z = -0.05 * (rev + 1) * r
            scans.append(
                np.stack([r * np.cos(theta), r * np.sin(theta), z,
                          rng.uniform(size=len(theta))], -1)
            )
        pts = np.concatenate(scans).astype(np.float32)
        got = native.project_scan(pts, 16, 128)
        want = _pure_python_project(pts, 16, 128)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_empty(self):
        out = native.project_scan(np.zeros((0, 4), np.float32), 4, 8)
        assert out.shape == (4, 8, 4)
        assert (out == 0).all()


class TestPreprocessItem:
    @pytest.mark.parametrize("flip", [False, True])
    def test_matches_python_pipeline(self, flip):
        from dusty_gan_tpu.data.datasets import KITTIOdometry

        rng = np.random.RandomState(1)
        scan = rng.uniform(-40, 40, (64, 512, 4)).astype(np.float32)

        got = native.preprocess_item(scan, 0.9, 120.0, flip, (64, 256))

        ds = KITTIOdometry.__new__(KITTIOdometry)
        ds.min_depth, ds.max_depth = 0.9, 120.0
        ds.shape = (64, 256)
        ds.modality = ("depth", "python-path")  # force the NumPy branch
        want = ds._process(scan, flip)

        for k in ("depth", "mask", "xyz"):
            np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6, err_msg=k)

    def test_speed_advantage(self):
        """informational: the native path should not be slower."""
        import time

        rng = np.random.RandomState(2)
        scan = rng.uniform(-40, 40, (64, 2048, 4)).astype(np.float32)
        t0 = time.perf_counter()
        for _ in range(20):
            native.preprocess_item(scan, 0.9, 120.0, False, (64, 256))
        t_native = time.perf_counter() - t0

        ds_args = dict(min_depth=0.9, max_depth=120.0)
        from dusty_gan_tpu.data.datasets import KITTIOdometry

        ds = KITTIOdometry.__new__(KITTIOdometry)
        ds.min_depth, ds.max_depth = 0.9, 120.0
        ds.shape = (64, 256)
        ds.modality = ("depth", "python-path")
        t0 = time.perf_counter()
        for _ in range(20):
            ds._process(scan, False)
        t_py = time.perf_counter() - t0
        print(f"native {t_native*50:.2f} ms/item vs numpy {t_py*50:.2f} ms/item")
        assert t_native < t_py * 2  # generous: never pathologically slower
