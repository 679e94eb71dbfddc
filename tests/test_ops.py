"""Unit + parity tests for the ops layer.

Golden values come from torch.nn.functional (the standard library the
reference builds on), never from hand-copied reference code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dusty_gan_tpu.ops.padding import pad_ring
from dusty_gan_tpu.ops.activation import fused_leaky_relu
from dusty_gan_tpu.ops.blur import blur_v, blur_h, blur_vh
from dusty_gan_tpu.ops import linear as L


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def _nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


class TestPadRing:
    def test_circular_h_reflect_v_matches_torch(self, torch):
        import torch.nn.functional as F

        x = np.random.RandomState(0).randn(2, 5, 7, 3).astype(np.float32)
        got = pad_ring(jnp.asarray(x), 2)
        t = torch.from_numpy(_nchw(x))
        t = F.pad(t, (2, 2, 0, 0), mode="circular")
        t = F.pad(t, (0, 0, 2, 2), mode="reflect")
        np.testing.assert_allclose(np.asarray(got), _nhwc(t.numpy()), rtol=1e-6)

    def test_asymmetric(self, torch):
        import torch.nn.functional as F

        x = np.random.RandomState(1).randn(1, 6, 8, 2).astype(np.float32)
        got = pad_ring(jnp.asarray(x), (1, 0, 0, 1))
        t = torch.from_numpy(_nchw(x))
        t = F.pad(t, (1, 0, 0, 0), mode="circular")
        t = F.pad(t, (0, 0, 0, 1), mode="reflect")
        np.testing.assert_allclose(np.asarray(got), _nhwc(t.numpy()), rtol=1e-6)


class TestFusedLeakyReLU:
    def test_matches_torch(self, torch):
        import torch.nn.functional as F
        import math

        x = np.random.RandomState(2).randn(2, 4, 4, 8).astype(np.float32)
        b = np.random.RandomState(3).randn(8).astype(np.float32)
        got = fused_leaky_relu(jnp.asarray(x), jnp.asarray(b))
        t = F.leaky_relu(
            torch.from_numpy(_nchw(x)) + torch.from_numpy(b).view(1, 8, 1, 1), 0.2
        ) * math.sqrt(2)
        np.testing.assert_allclose(np.asarray(got), _nhwc(t.numpy()), rtol=1e-5)


class TestBlur:
    def test_blur_vh_matches_reference(self, torch):
        # oracle: the reference BlurVH module itself (torch CPU)
        from tests.conftest import load_reference_module

        common = load_reference_module("models/ops/common.py", "ref_common")
        x = np.random.RandomState(4).randn(2, 9, 12, 3).astype(np.float32)
        ref = common.BlurVH(ring=True)(torch.from_numpy(_nchw(x)))
        got = blur_vh(jnp.asarray(x), ring=True)
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref.detach().numpy()), rtol=1e-5, atol=1e-6)

    def test_blur_v_shape(self):
        x = jnp.ones((1, 8, 16, 2))
        assert blur_v(x).shape == x.shape
        assert blur_h(x).shape == x.shape
        assert blur_vh(x).shape == (1, 8, 16, 4)


class TestEqualLRConv:
    def test_matches_torch_conv2d(self, torch):
        """ring-pad + EqualLR conv k4 s2 == reference Down-block conv."""
        import torch.nn.functional as F

        rng = np.random.RandomState(5)
        x = rng.randn(2, 8, 16, 3).astype(np.float32)
        w_oihw = rng.randn(10, 3, 4, 4).astype(np.float32)
        scale = 1.0 / np.sqrt(3 * 4 * 4)

        model = L.EqualLRConv(features=10, kernel=(4, 4), stride=(2, 2))
        params = {"params": {"kernel": jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))}}
        xin = pad_ring(jnp.asarray(x), 1)
        got = model.apply(params, xin)

        t = torch.from_numpy(_nchw(x))
        t = F.pad(t, (1, 1, 0, 0), mode="circular")
        t = F.pad(t, (0, 0, 1, 1), mode="reflect")
        ref = F.conv2d(t * scale, torch.from_numpy(w_oihw), stride=2)
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref.numpy()), rtol=2e-4, atol=1e-5)

    def test_final_logit_conv(self, torch):
        import torch.nn.functional as F

        rng = np.random.RandomState(6)
        x = rng.randn(2, 4, 16, 12).astype(np.float32)
        w = rng.randn(1, 12, 4, 16).astype(np.float32)
        b = rng.randn(1).astype(np.float32)
        scale = 1.0 / np.sqrt(12 * 4 * 16)
        model = L.EqualLRConv(features=1, kernel=(4, 16), stride=(1, 1), use_bias=True)
        params = {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "bias": jnp.asarray(b)}}
        got = model.apply(params, jnp.asarray(x))
        ref = F.conv2d(torch.from_numpy(_nchw(x)) * scale, torch.from_numpy(w), torch.from_numpy(b))
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref.numpy()), rtol=2e-4, atol=1e-5)


class TestEqualLRConvTranspose:
    def test_matches_torch_convtranspose(self, torch):
        """ring-pad 1 + ConvT(k4,s2,p3) == reference Up-block conv, incl.
        the ConvT fan-in quirk (scale by out_ch*kh*kw)."""
        import torch.nn.functional as F

        rng = np.random.RandomState(7)
        x = rng.randn(2, 4, 16, 6).astype(np.float32)
        w_iohw = rng.randn(6, 5, 4, 4).astype(np.float32)  # torch ConvT layout
        scale = 1.0 / np.sqrt(5 * 4 * 4)

        model = L.EqualLRConvTranspose(features=5, kernel=(4, 4), stride=(2, 2), padding=(3, 3))
        params = {"params": {"kernel": jnp.asarray(np.transpose(w_iohw, (2, 3, 0, 1)))}}
        xin = pad_ring(jnp.asarray(x), 1)
        got = model.apply(params, xin)
        assert got.shape == (2, 8, 32, 5)

        t = torch.from_numpy(_nchw(x))
        t = F.pad(t, (1, 1, 0, 0), mode="circular")
        t = F.pad(t, (0, 0, 1, 1), mode="reflect")
        ref = F.conv_transpose2d(t * scale, torch.from_numpy(w_iohw), stride=2, padding=3)
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref.numpy()), rtol=2e-4, atol=1e-5)

    def test_with_bias(self, torch):
        import torch.nn.functional as F

        rng = np.random.RandomState(8)
        x = rng.randn(1, 4, 8, 6).astype(np.float32)
        w = rng.randn(6, 2, 4, 4).astype(np.float32)
        b = rng.randn(2).astype(np.float32)
        scale = 1.0 / np.sqrt(2 * 4 * 4)
        model = L.EqualLRConvTranspose(features=2, use_bias=True)
        params = {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 0, 1))), "bias": jnp.asarray(b)}}
        got = model.apply(params, pad_ring(jnp.asarray(x), 1))
        t = torch.from_numpy(_nchw(x))
        t = F.pad(t, (1, 1, 0, 0), mode="circular")
        t = F.pad(t, (0, 0, 1, 1), mode="reflect")
        ref = F.conv_transpose2d(t * scale, torch.from_numpy(w), torch.from_numpy(b), stride=2, padding=3)
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref.numpy()), rtol=2e-4, atol=1e-5)


class TestEqualLRProj:
    def test_matches_torch_convtranspose_1x1(self, torch):
        import torch.nn.functional as F

        rng = np.random.RandomState(9)
        z = rng.randn(3, 12).astype(np.float32)
        w = rng.randn(12, 7, 4, 16).astype(np.float32)
        scale = 1.0 / np.sqrt(7 * 4 * 16)
        model = L.EqualLRProj(features=7, shape=(4, 16))
        params = {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 0, 1)))}}
        got = model.apply(params, jnp.asarray(z))
        ref = F.conv_transpose2d(
            torch.from_numpy(z[..., None, None]) * scale, torch.from_numpy(w), stride=1
        )
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref.numpy()), rtol=2e-4, atol=1e-5)
