"""Pallas chamfer kernel (interpret mode on CPU) vs f64 brute force,
plus the symmetric pairwise-matrix optimization."""

import numpy as np
import jax
import jax.numpy as jnp

from dusty_gan_tpu.metrics.chamfer_pallas import nn_pallas
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
