"""Streaming-auction EMD kernel (interpret mode on CPU) vs the dense XLA
implementation it replaces at eval scale (round-2 verdict, weak #4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dusty_gan_tpu.metrics.emd import earth_mover_distance
from dusty_gan_tpu.metrics.emd_pallas import (
    block_shapes_supported,
    emd_block_pallas,
)


class TestEmdBlockKernel:
    def test_matches_dense_path(self):
        """match-matrix-free streaming formulation == dense approx_match +
        match_cost, bit-faithfully to f32 accumulation order."""
        rng = np.random.RandomState(0)
        a = rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)
        b = rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)
        blk = np.asarray(emd_block_pallas(jnp.asarray(a), jnp.asarray(b),
                                          interpret=True))
        oracle = np.zeros((2, 2), np.float32)
        for i in range(2):
            oracle[i] = np.asarray(earth_mover_distance(
                jnp.broadcast_to(jnp.asarray(a[i]), b.shape), jnp.asarray(b)))
        np.testing.assert_allclose(blk, oracle, rtol=5e-4)

    def test_uneven_mass(self):
        """n != m engages the multiL/multiR integer mass split (cu:38-45)."""
        rng = np.random.RandomState(1)
        a = rng.uniform(-1, 1, (1, 256, 3)).astype(np.float32)
        b = rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32)
        blk = np.asarray(emd_block_pallas(jnp.asarray(a), jnp.asarray(b),
                                          interpret=True))
        oracle = np.asarray(earth_mover_distance(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(blk[0, 0], oracle[0], rtol=5e-4)

    def test_shape_guard(self):
        assert block_shapes_supported(2048, 2048)
        assert block_shapes_supported(512, 512)
        assert not block_shapes_supported(100, 128)   # not lane-aligned
        assert not block_shapes_supported(2048, 4096)  # multi-m-tile

    def test_unsupported_shapes_assert(self):
        a = jnp.zeros((1, 100, 3))
        with pytest.raises(AssertionError):
            emd_block_pallas(a, a, interpret=True)


class TestPairwiseEmdDispatch:
    def test_rowwise_path_off_tpu(self):
        """CPU tests exercise the dense fallback; result matches the
        brute-force row loop by construction and stays symmetric."""
        from dusty_gan_tpu.metrics.cov_mmd_1nna import _pairwise_distance

        rng = np.random.RandomState(2)
        pcs = jnp.asarray(rng.uniform(-1, 1, (5, 64, 3)).astype(np.float32))
        m = _pairwise_distance(pcs, pcs, 4, ("emd",))["emd"]
        assert m.shape == (5, 5)
        np.testing.assert_allclose(m, m.T, rtol=1e-5, atol=1e-6)
        assert (np.diag(m) < 5e-3).all()


class TestDifferentiableEmdKernel:
    def test_residues_match_dense_match_matrix(self):
        """R/C/V/U emitted by the pair kernel == the corresponding
        contractions of the dense approx_match matrix."""
        from dusty_gan_tpu.metrics.emd import approx_match
        from dusty_gan_tpu.metrics.emd_pallas import emd_pair_pallas

        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32))
        cost, r, c, v, u = emd_pair_pallas(x, y, interpret=True)
        match = np.asarray(approx_match(x, y))
        np.testing.assert_allclose(np.asarray(r), match.sum(2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), match.sum(1), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(v), np.einsum("bnm,bmc->bnc", match, np.asarray(y)),
            atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(u), np.einsum("bnm,bnc->bmc", match, np.asarray(x)),
            atol=1e-4)

    def test_gradients_match_dense_path(self):
        """custom_vjp gradients from the kernel residues == autodiff of
        the dense stop_gradient(match) cost (both equal the CUDA
        matchcostgrad semantics)."""
        import jax

        from dusty_gan_tpu.metrics import emd as emd_mod
        from dusty_gan_tpu.metrics.emd_pallas import emd_pair_pallas

        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32))

        gx_dense, gy_dense = jax.grad(
            lambda a, b: jnp.sum(emd_mod.match_cost(
                a, b, jax.lax.stop_gradient(emd_mod.approx_match(a, b)))),
            argnums=(0, 1),
        )(x, y)

        # kernel-residue analytic gradients (what _emd_pallas_diff's bwd does)
        cost, r, c, v, u = emd_pair_pallas(x, y, interpret=True)
        gx_k = 2.0 * (np.asarray(r)[..., None] * np.asarray(x) - np.asarray(v))
        gy_k = 2.0 * (np.asarray(c)[..., None] * np.asarray(y) - np.asarray(u))
        np.testing.assert_allclose(gx_k, np.asarray(gx_dense), atol=2e-4)
        np.testing.assert_allclose(gy_k, np.asarray(gy_dense), atol=2e-4)


class TestFallbacks:
    def test_emd_dispatch_falls_back_on_kernel_failure(self, monkeypatch, capsys):
        """A Pallas compile failure on an eager call degrades to the dense
        path with a warning instead of crashing (review finding r3)."""
        import dusty_gan_tpu.metrics.emd as emd_mod

        monkeypatch.setattr(emd_mod, "_use_pallas_emd", lambda n, m: True)

        def boom(x, y):
            raise RuntimeError("mosaic says no")

        monkeypatch.setattr(emd_mod, "_emd_pallas_diff", boom)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32))
        out = np.asarray(emd_mod.earth_mover_distance(x, y))
        dense = np.asarray(emd_mod.earth_mover_distance_dense(x, y))
        np.testing.assert_allclose(out, dense, rtol=0, atol=0)
        assert "falling back to the dense XLA path" in capsys.readouterr().err

    def test_pairwise_emd_block_failure_uses_dense_rowwise(self, monkeypatch, capsys):
        """The pairwise block path's failure fallback must not re-enter
        the failing kernel (review finding r2)."""
        import dusty_gan_tpu.metrics.cov_mmd_1nna as cm
        import dusty_gan_tpu.metrics.emd_pallas as ep

        monkeypatch.setattr(cm._chamfer, "_use_pallas", lambda: True)

        def boom(rows, cols, interpret=False):
            raise RuntimeError("mosaic says no")

        monkeypatch.setattr(ep, "emd_block_pallas", boom)
        rng = np.random.RandomState(1)
        pcs = jnp.asarray(rng.uniform(-1, 1, (4, 128, 3)).astype(np.float32))
        m = cm._pairwise_emd(pcs, pcs, 4)
        assert "falling back to the dense XLA row loop" in capsys.readouterr().err
        oracle = cm._pairwise_emd_rowwise(pcs, pcs, 4, False)
        np.testing.assert_allclose(m, oracle, rtol=0, atol=0)


class TestCdBlockFallback:
    def test_cd_block_failure_uses_xla_blocks(self, monkeypatch, capsys):
        import dusty_gan_tpu.metrics.chamfer_pallas as cp
        import dusty_gan_tpu.metrics.cov_mmd_1nna as cm

        # True only for the dispatch decision; the XLA fallback's inner
        # compute_cd must see False (we're on the CPU backend)
        first = iter([True])
        monkeypatch.setattr(cm._chamfer, "_use_pallas",
                            lambda: next(first, False))

        def boom(rows, cols, interpret=False):
            raise RuntimeError("mosaic says no")

        monkeypatch.setattr(cp, "cd_block_pallas", boom)
        rng = np.random.RandomState(2)
        a = jnp.asarray(rng.uniform(-1, 1, (5, 64, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, (3, 64, 3)).astype(np.float32))
        m = cm._pairwise_cd_blocked(a, b, 4)
        assert "falling back to the XLA block path" in capsys.readouterr().err
        assert cm._chamfer.LAST_DISPATCH == "xla"
        from dusty_gan_tpu.metrics.chamfer import compute_cd
        row0 = np.asarray(compute_cd(jnp.broadcast_to(a[0], b.shape), b))
        np.testing.assert_allclose(m[0], row0, rtol=1e-6, atol=1e-7)
