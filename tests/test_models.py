"""End-to-end forward parity of G/D against the reference torch models.

The reference modules are loaded from /root/reference as numerical oracles;
weights are converted with utils.torch_import and outputs compared.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import load_reference_module
from dusty_gan_tpu.models.dcgan_eqlr import Discriminator, Generator
from dusty_gan_tpu.models.dusty import DUSty1, DUSty2
from dusty_gan_tpu.models.factory import define_D, define_G
from dusty_gan_tpu.utils import torch_import as ti


def _nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


@pytest.fixture(scope="module")
def ref_models(torch):
    return load_reference_module("models/gans/dcgan_eqlr.py", "ref_dcgan_eqlr")


@pytest.fixture(scope="module")
def ref_dusty(torch, ref_models):
    return load_reference_module("models/dusty.py", "ref_dusty")


class TestGeneratorParity:
    @pytest.mark.parametrize("shape", [(64, 256), (32, 256)])
    def test_forward_matches_reference(self, torch, ref_models, shape):
        ref_g = ref_models.Generator(
            in_ch=512, out_ch={"depth": 1, "confidence": 2}, shape=shape
        ).eval()
        z = np.random.RandomState(0).randn(3, 512).astype(np.float32)
        with torch.no_grad():
            ref_out = ref_g(torch.from_numpy(z))

        mine = Generator(in_ch=512, out_ch={"depth": 1, "confidence": 2}, shape=shape)
        params = {"params": ti.backbone_params_from_torch(ref_g.state_dict())}
        got = mine.apply(params, jnp.asarray(z))

        assert set(got) == {"depth", "confidence"}
        for k in got:
            np.testing.assert_allclose(
                np.asarray(got[k]), _nhwc(ref_out[k].numpy()), rtol=1e-3, atol=2e-4
            )

    def test_init_shapes(self):
        g = Generator(out_ch={"depth": 1})
        params = g.init(jax.random.PRNGKey(0), jnp.zeros((2, 512)))
        out = g.apply(params, jnp.zeros((2, 512)))
        assert out["depth"].shape == (2, 64, 256, 1)
        assert np.all(np.abs(np.asarray(out["depth"])) <= 1.0)


class TestDiscriminatorParity:
    def test_forward_matches_reference(self, torch, ref_models):
        ref_d = ref_models.Discriminator(in_ch=1).eval()
        x = np.random.RandomState(1).randn(4, 1, 64, 256).astype(np.float32)
        with torch.no_grad():
            ref_y = ref_d(torch.from_numpy(x))

        mine = Discriminator(in_ch=1)
        params = ti.discriminator_params_from_torch(ref_d.state_dict())
        got = mine.apply(params, jnp.asarray(_nhwc(x)))
        assert got.shape == (4, 1, 1, 1)
        np.testing.assert_allclose(
            np.asarray(got).ravel(), ref_y.numpy().ravel(), rtol=1e-3, atol=2e-3
        )

    def test_far_field_survives_amp_boundary(self):
        """Round-5 regression: with the interior in bf16, D must still
        distinguish a 94 m return (tanh inverse depth -0.9958) from a
        dropped pixel (-1.0) — a bf16 cast of the IMAGE cannot (both values
        round onto the 2-level tail of the bf16 grid once the difference
        falls under the 0.0039 ulp, erasing the far field the reference's
        fp16 AMP preserves; see Discriminator.input_f32)."""
        H, W = 64, 256
        mine = Discriminator(in_ch=1, shape=(H, W))
        x0 = np.full((1, H, W, 1), -1.0, np.float32)
        x1 = x0.copy()
        x1[0, 10:20, 50:200, 0] = -0.9985  # ~110 m: inside bf16's half-ulp of -1
        params = mine.init(jax.random.PRNGKey(0), jnp.asarray(x0))

        y0 = mine.apply(params, jnp.asarray(x0), compute_dtype=jnp.bfloat16)
        y1 = mine.apply(params, jnp.asarray(x1), compute_dtype=jnp.bfloat16)
        assert float(jnp.abs(y1 - y0).max()) > 0.0, (
            "f32 input boundary lost the far-field signal"
        )

        # the failure mode this guards against: pre-cast images are blind
        yq0 = mine.apply(params, jnp.asarray(x0).astype(jnp.bfloat16),
                         compute_dtype=jnp.bfloat16)
        yq1 = mine.apply(params, jnp.asarray(x1).astype(jnp.bfloat16),
                         compute_dtype=jnp.bfloat16)
        assert float(jnp.abs(yq1 - yq0).max()) == 0.0

    def test_split_residual_lowered_as_reduce_precision_on_tpu(self):
        """The hi part of D's hi/lo input split must lower to
        stablehlo.reduce_precision: an astype(bf16).astype(f32) round-trip
        is elided by XLA's excess-precision folding ON TPU ONLY, compiling
        the residual to x - x = 0 (chip-observed; the CPU backend does not
        fold, so the numerical test above stays green either way).  AOT
        lowering for the tpu platform needs no TPU."""
        H, W = 64, 256
        mine = Discriminator(in_ch=1, shape=(H, W))
        x = jnp.zeros((1, H, W, 1), jnp.float32)
        params = mine.init(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda p, x: mine.apply(p, x, compute_dtype=jnp.bfloat16))
        txt = f.trace(params, x).lower(lowering_platforms=("tpu",)).as_text()
        assert "reduce_precision" in txt


class TestDUStyParity:
    def test_dusty1_fixed_noise_matches_reference(self, torch, ref_models, ref_dusty):
        H, W = 64, 256
        ref_bb = ref_models.Generator(in_ch=512, out_ch={"depth": 1, "confidence": 1})
        ref_g = ref_dusty.DUSty1(backbone=ref_bb, tau=1.0).eval()
        noise = np.random.RandomState(2).randn(1, 1, H, W).astype(np.float32) * 0.5
        ref_g.gumbel.fixed_noise = torch.from_numpy(noise)
        z = np.random.RandomState(3).randn(2, 512).astype(np.float32)
        with torch.no_grad():
            ref_out = ref_g(torch.from_numpy(z))

        mine = DUSty1(
            backbone=Generator(in_ch=512, out_ch={"depth": 1, "confidence": 1}), tau=1.0
        )
        params = ti.generator_params_from_torch(ref_g.state_dict(), "dusty1")
        got = mine.apply(
            params, jnp.asarray(z), fixed_noise=jnp.asarray(_nhwc(noise))
        )
        for k in ("depth", "depth_orig", "mask", "confidence"):
            np.testing.assert_allclose(
                np.asarray(got[k]), _nhwc(ref_out[k].numpy()), rtol=1e-3, atol=3e-4,
                err_msg=k,
            )
        # mask must be exactly binary
        m = np.asarray(got["mask"])
        assert set(np.unique(m)).issubset({0.0, 1.0})

    def test_dusty2_eval_matches_reference(self, torch, ref_models, ref_dusty):
        H, W = 64, 256
        ref_bb = ref_models.Generator(in_ch=512, out_ch={"depth": 1, "confidence": 2})
        ref_g = ref_dusty.DUSty2(backbone=ref_bb, tau=1.0).eval()
        noise = np.random.RandomState(4).randn(1, 1, H, W).astype(np.float32) * 0.5
        ref_g.gumbel_pixel.fixed_noise = torch.from_numpy(noise)
        z = np.random.RandomState(5).randn(2, 512).astype(np.float32)
        with torch.no_grad():
            ref_out = ref_g(torch.from_numpy(z))  # eval: image mask thresholded

        mine = DUSty2(
            backbone=Generator(in_ch=512, out_ch={"depth": 1, "confidence": 2}), tau=1.0
        )
        params = ti.generator_params_from_torch(ref_g.state_dict(), "dusty2")
        got = mine.apply(
            params,
            jnp.asarray(z),
            train=False,
            fixed_noise={"pixel": jnp.asarray(_nhwc(noise)), "image": None},
        )
        for k in ("depth", "depth_orig", "mask"):
            np.testing.assert_allclose(
                np.asarray(got[k]), _nhwc(ref_out[k].numpy()), rtol=1e-3, atol=3e-4,
                err_msg=k,
            )

    def test_dusty2_train_sampling_runs(self):
        mine = DUSty2(
            backbone=Generator(in_ch=64, out_ch={"depth": 1, "confidence": 2}), tau=1.0
        )
        k = jax.random.PRNGKey(0)
        params = mine.init({"params": k, "gumbel": k}, jnp.zeros((2, 64)))
        out = mine.apply(params, jnp.zeros((2, 64)), train=True, rngs={"gumbel": k})
        assert out["mask"].shape == (2, 64, 256, 2)


class TestFactory:
    def test_define_g_d(self):
        cfg = {
            "model": {
                "gen": {
                    "arch": "dusty1/dcgan_eqlr",
                    "in_ch": 512,
                    "out_ch": {"depth": 1, "confidence": 1},
                    "ch_base": 64,
                    "ch_max": 512,
                    "drop_const": -1,
                    "shape": (64, 256),
                    "tau": 1,
                },
                "dis": {
                    "arch": "dcgan_eqlr",
                    "in_ch": 1,
                    "ch_base": 64,
                    "ch_max": 512,
                    "shape": (64, 256),
                },
                "ring": True,
            }
        }
        g = define_G(cfg)
        d = define_D(cfg)
        assert isinstance(g, DUSty1)
        assert isinstance(d, Discriminator)
