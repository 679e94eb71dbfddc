"""Pallas chamfer kernel (interpret mode on CPU) vs f64 brute force,
plus the symmetric pairwise-matrix optimization."""

import numpy as np
import jax
import jax.numpy as jnp

from dusty_gan_tpu.metrics.chamfer_pallas import cd_block_pallas, nn_pallas
from dusty_gan_tpu.metrics.cov_mmd_1nna import _pairwise_distance


class TestPallasNN:
    def test_matches_f64_bruteforce(self):
        rng = np.random.RandomState(0)
        x = rng.uniform(-1, 1, (3, 256, 3)).astype(np.float32)
        y = rng.uniform(-1, 1, (3, 384, 3)).astype(np.float32)
        full = ((x[:, :, None].astype(np.float64) - y[:, None].astype(np.float64)) ** 2).sum(-1)
        d, i = nn_pallas(jnp.asarray(x), jnp.asarray(y), interpret=True)
        np.testing.assert_allclose(np.asarray(d), full.min(2), rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(i), full.argmin(2))

    def test_unaligned_sizes_padded(self):
        rng = np.random.RandomState(1)
        x = rng.uniform(-1, 1, (2, 100, 3)).astype(np.float32)  # N not /256
        y = rng.uniform(-1, 1, (2, 77, 3)).astype(np.float32)   # M not /128
        full = ((x[:, :, None].astype(np.float64) - y[:, None].astype(np.float64)) ** 2).sum(-1)
        d, i = nn_pallas(jnp.asarray(x), jnp.asarray(y), interpret=True)
        assert d.shape == (2, 100) and i.shape == (2, 100)
        np.testing.assert_allclose(np.asarray(d), full.min(2), rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(i), full.argmin(2))


    def test_large_m_chunked_across_kernel_calls(self):
        """reference clouds above _M_CHUNK split across kernel calls with a
        running (min, argmin) — the 16k-point full-scan case that used to
        blow scoped VMEM and silently fall back to XLA."""
        rng = np.random.RandomState(5)
        x = rng.uniform(-1, 1, (1, 64, 3)).astype(np.float32)
        y = rng.uniform(-1, 1, (1, 9000, 3)).astype(np.float32)
        full = ((x[:, :, None].astype(np.float64) - y[:, None].astype(np.float64)) ** 2).sum(-1)
        d, i = nn_pallas(jnp.asarray(x), jnp.asarray(y), interpret=True)
        np.testing.assert_allclose(np.asarray(d), full.min(2), rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(i), full.argmin(2))
        d2, none = nn_pallas(jnp.asarray(x), jnp.asarray(y), interpret=True,
                             need_idx=False)
        assert none is None
        np.testing.assert_allclose(np.asarray(d2), full.min(2), rtol=1e-5, atol=1e-7)

    def test_dist_only_kernel_matches(self):
        """need_idx=False (the eval-matrix fast path) must produce the same
        distances as the argmin kernel, with idx=None."""
        rng = np.random.RandomState(3)
        x = rng.uniform(-1, 1, (2, 300, 3)).astype(np.float32)
        y = rng.uniform(-1, 1, (2, 200, 3)).astype(np.float32)
        d_full, i = nn_pallas(jnp.asarray(x), jnp.asarray(y), interpret=True)
        d_only, none = nn_pallas(jnp.asarray(x), jnp.asarray(y), interpret=True,
                                 need_idx=False)
        assert none is None
        np.testing.assert_allclose(np.asarray(d_only), np.asarray(d_full),
                                   rtol=0, atol=0)


class TestCdBlockKernel:
    @staticmethod
    def _oracle(a, b):
        """f64 brute-force (R, C) symmetric-CD block."""
        r, c = a.shape[0], b.shape[0]
        out = np.zeros((r, c))
        for i in range(r):
            for j in range(c):
                d = ((a[i][:, None].astype(np.float64)
                      - b[j][None].astype(np.float64)) ** 2).sum(-1)
                out[i, j] = d.min(1).mean() + d.min(0).mean()
        return out

    def test_block_matches_f64_bruteforce(self):
        rng = np.random.RandomState(7)
        a = rng.uniform(-1, 1, (5, 256, 3)).astype(np.float32)
        b = rng.uniform(-1, 1, (3, 128, 3)).astype(np.float32)
        got = cd_block_pallas(jnp.asarray(a), jnp.asarray(b), interpret=True)
        np.testing.assert_allclose(np.asarray(got), self._oracle(a, b),
                                   rtol=1e-5, atol=1e-6)

    def test_unaligned_point_counts_masked(self):
        """non-lane-multiple point counts: query-side sentinel rows must be
        masked out of the means, target-side sentinels never selected."""
        rng = np.random.RandomState(8)
        a = rng.uniform(-1, 1, (4, 100, 3)).astype(np.float32)
        b = rng.uniform(-1, 1, (2, 77, 3)).astype(np.float32)
        got = cd_block_pallas(jnp.asarray(a), jnp.asarray(b), interpret=True)
        np.testing.assert_allclose(np.asarray(got), self._oracle(a, b),
                                   rtol=1e-5, atol=1e-6)

    def test_block_matches_compute_cd_rows(self):
        """block result == the per-row compute_cd loop it replaces."""
        from dusty_gan_tpu.metrics.chamfer import compute_cd

        rng = np.random.RandomState(9)
        a = jnp.asarray(rng.uniform(-1, 1, (6, 64, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, (4, 64, 3)).astype(np.float32))
        got = cd_block_pallas(a, b, interpret=True)
        rows = np.stack([
            np.asarray(compute_cd(jnp.broadcast_to(a[i], b.shape), b))
            for i in range(a.shape[0])
        ])
        np.testing.assert_allclose(np.asarray(got), rows, rtol=1e-5, atol=1e-6)


class TestSymmetricPairwise:
    def test_self_matrix_matches_full_computation(self):
        rng = np.random.RandomState(2)
        pcs = jnp.asarray(rng.uniform(-0.5, 0.5, (9, 64, 3)).astype(np.float32))
        sym = _pairwise_distance(pcs, pcs, batch_size=4, metrics=("cd",))["cd"]
        # force the non-symmetric path with a distinct (equal-valued) array
        pcs2 = jnp.array(pcs)
        full = _pairwise_distance(pcs, pcs2, batch_size=4, metrics=("cd",))["cd"]
        np.testing.assert_allclose(sym, full, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(sym, sym.T, rtol=1e-5, atol=1e-6)
