"""GAN loss parity (all 7 modes) + regularizer behavior tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import load_reference_module
from dusty_gan_tpu.models import losses

MODES = ["nsgan", "wgan", "lsgan", "hinge", "ragan", "rahinge", "ralsgan"]


@pytest.fixture(scope="module")
def ref_loss(torch):
    return load_reference_module("models/loss.py", "ref_loss")


class TestGANLossParity:
    @pytest.mark.parametrize("mode", MODES)
    def test_d_loss(self, torch, ref_loss, mode):
        rng = np.random.RandomState(0)
        pr = rng.randn(16).astype(np.float32)
        pf = rng.randn(16).astype(np.float32)
        crit = ref_loss.GANLoss(mode)
        want = crit(torch.from_numpy(pr), torch.from_numpy(pf), "D").item()
        got = float(losses.gan_loss_d(mode, jnp.asarray(pr), jnp.asarray(pf)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)

    @pytest.mark.parametrize("mode", MODES)
    def test_g_loss(self, torch, ref_loss, mode):
        rng = np.random.RandomState(1)
        pr = rng.randn(16).astype(np.float32)
        pf = rng.randn(16).astype(np.float32)
        crit = ref_loss.GANLoss(mode)
        want = crit(torch.from_numpy(pr), torch.from_numpy(pf), "G").item()
        got = float(losses.gan_loss_g(mode, jnp.asarray(pr), jnp.asarray(pf)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)

    def test_lsgan_smoothing(self, torch, ref_loss):
        rng = np.random.RandomState(2)
        pr = rng.randn(16).astype(np.float32)
        pf = rng.randn(16).astype(np.float32)
        crit = ref_loss.GANLoss("lsgan", smoothing=0.9)
        want = crit(torch.from_numpy(pr), torch.from_numpy(pf), "D").item()
        got = float(losses.gan_loss_d("lsgan", jnp.asarray(pr), jnp.asarray(pf), 0.9))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestR1Penalty:
    def test_matches_manual_double_grad(self):
        """r1 == mean over batch of ||d sum(f) / d x||^2 for a quadratic f."""
        w = jnp.asarray(np.random.RandomState(3).randn(4, 4).astype(np.float32))

        def f(x):  # (B,2,2,1) -> (B,)
            flat = x.reshape(x.shape[0], -1)
            return jnp.sum((flat @ w) ** 2, axis=1)

        x = jnp.asarray(np.random.RandomState(4).randn(3, 2, 2, 1).astype(np.float32))
        pen, logits = losses.r1_penalty(f, x)
        # analytic: grad_i = 2 * (x w) w^T -> row-wise
        grads = jax.vmap(jax.grad(lambda xx: f(xx[None])[0]))(x)
        want = jnp.mean(jnp.sum(grads**2, axis=(1, 2, 3)))
        np.testing.assert_allclose(float(pen), float(want), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(f(x)), rtol=1e-6)

    def test_differentiable_wrt_params(self):
        """grad-of-grad: the R1 term must contribute to parameter grads."""
        def d_apply(w, x):
            return jnp.tanh(x.reshape(x.shape[0], -1) @ w).sum(axis=1)

        w = jnp.asarray(np.random.RandomState(5).randn(4, 2).astype(np.float32))
        x = jnp.asarray(np.random.RandomState(6).randn(3, 2, 2, 1).astype(np.float32))

        def loss(w):
            pen, _ = losses.r1_penalty(lambda xx: d_apply(w, xx), x)
            return pen

        g = jax.grad(loss)(w)
        assert float(jnp.abs(g).sum()) > 0


class TestPathLength:
    def test_penalty_and_ema(self):
        def g_depth(z):
            return jnp.tile(z[:, :1, None, None], (1, 4, 8, 1))

        z = jnp.asarray(np.random.RandomState(7).randn(4, 8).astype(np.float32))
        pen, ema = losses.path_length_penalty(
            g_depth, z, jax.random.PRNGKey(0), jnp.zeros(()), decay=0.01
        )
        assert np.isfinite(float(pen)) and float(ema) > 0


class TestMaskedLoss:
    def test_masked_l1(self):
        a = jnp.ones((2, 2, 2, 1))
        b = jnp.zeros((2, 2, 2, 1))
        m = jnp.asarray([[[[1.0]], [[0.0]]], [[[1.0]], [[1.0]]]]).reshape(2, 2, 1, 1)
        m = jnp.broadcast_to(m, (2, 2, 2, 1))
        out = losses.masked_loss(a, b, m)
        np.testing.assert_allclose(np.asarray(out), [1.0, 1.0])
