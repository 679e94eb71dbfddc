"""Reverse checkpoint export (.ckpt -> reference .pth): the exact inverse
of utils/torch_import.  Verified three ways: (1) export -> import is the
identity on the full TrainState (weights, EMA, both Adam moment sets,
step); (2) the reference's own torch modules load the exported state
dicts with strict=True and reproduce our forward pass (oracle:
/root/reference models loaded by file path); (3) torch.optim.Adam
accepts the exported optimizer state and steps."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tests.conftest import load_reference_module
from dusty_gan_tpu.config import compose
from dusty_gan_tpu.models.dcgan_eqlr import Discriminator, Generator
from dusty_gan_tpu.models.dusty import DUSty2
from dusty_gan_tpu.train.state import create_train_state, make_optimizer
from dusty_gan_tpu.utils import torch_export as te
from dusty_gan_tpu.utils import torch_import as ti

CONFIG_DIR = osp.join(osp.dirname(__file__), "../configs")
H, W, IN_CH, CH_BASE, CH_MAX = 32, 64, 16, 4, 8
ARCH = "dusty2/dcgan_eqlr"


def _jax_models():
    G = DUSty2(
        backbone=Generator(in_ch=IN_CH, out_ch={"depth": 1, "confidence": 2},
                           ch_base=CH_BASE, ch_max=CH_MAX, shape=(H, W)),
        tau=None,
    )
    D = Discriminator(in_ch=1, ch_base=CH_BASE, ch_max=CH_MAX, shape=(H, W))
    return G, D


@pytest.fixture(scope="module")
def cfg():
    c = compose(CONFIG_DIR, [
        "model=dusty2_dcgan_eqlr",
        f"dataset.shape=[{H},{W}]",
        f"model.gen.in_ch={IN_CH}",
        f"model.gen.ch_base={CH_BASE}",
        f"model.gen.ch_max={CH_MAX}",
        "model.gen.tau=null",
        f"model.dis.ch_base={CH_BASE}",
        f"model.dis.ch_max={CH_MAX}",
    ])
    c.model.gen.shape = [H, W]
    c.model.dis.shape = [H, W]
    return c


@pytest.fixture(scope="module")
def opts():
    return (make_optimizer(2e-3, 0.0, 0.99), make_optimizer(2e-3, 0.0, 0.99))


@pytest.fixture(scope="module")
def native_state(opts):
    """TrainState with NON-trivial Adam moments (real optax updates)."""
    G, D = _jax_models()
    opt_g, opt_d = opts
    state = create_train_state(
        jax.random.PRNGKey(3), G, D, in_ch=IN_CH, image_shape=(H, W),
        optimizer_g=opt_g, optimizer_d=opt_d, needs_gumbel=True,
    )
    key = jax.random.PRNGKey(9)
    pg, og = state.params_G, state.opt_G
    pd, od = state.params_D, state.opt_D
    for i in range(3):
        gg = jax.tree.map(
            lambda p: jax.random.normal(jax.random.fold_in(key, hash(p.shape) % 1000 + i),
                                        p.shape, p.dtype) * 0.01, pg)
        up, og = opt_g.update(gg, og, pg)
        pg = optax.apply_updates(pg, up)
        gd = jax.tree.map(
            lambda p: jax.random.normal(jax.random.fold_in(key, hash(p.shape) % 997 + i),
                                        p.shape, p.dtype) * 0.01, pd)
        ud, od = opt_d.update(gd, od, pd)
        pd = optax.apply_updates(pd, ud)
    ema = jax.tree.map(lambda a, b: 0.97 * a + 0.03 * b, state.params_G_ema, pg)
    return state.replace(
        step=jnp.asarray(96, state.step.dtype),
        params_G=pg, params_D=pd, params_G_ema=ema, opt_G=og, opt_D=od,
    )


@pytest.fixture(scope="module")
def pth_path(torch, native_state, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("texp") / "checkpoint_0000000096.pth")
    te.save_reference_checkpoint(path, native_state, cfg)
    return path


class TestRoundtrip:
    def test_export_import_is_identity(self, torch, pth_path, native_state, opts):
        G, D = _jax_models()
        opt_g, opt_d = opts
        template = create_train_state(
            jax.random.PRNGKey(0), G, D, in_ch=IN_CH, image_shape=(H, W),
            optimizer_g=opt_g, optimizer_d=opt_d, needs_gumbel=True,
        )
        back = ti.train_state_from_torch(pth_path, ARCH, template, opt_g, opt_d)
        assert int(back.step) == int(native_state.step)
        for name in ("params_G", "params_D", "params_G_ema", "opt_G", "opt_D"):
            want = jax.tree.leaves(getattr(native_state, name))
            got = jax.tree.leaves(getattr(back, name))
            assert len(want) == len(got), name
            for w, g in zip(want, got):
                np.testing.assert_allclose(
                    np.asarray(g, np.float32), np.asarray(w, np.float32),
                    rtol=1e-6, atol=1e-7, err_msg=name,
                )


class TestReferenceOracle:
    def test_strict_load_and_forward_parity(self, torch, pth_path, native_state):
        """The reference's own modules accept the export with strict=True
        and reproduce our noise-independent outputs."""
        dusty = load_reference_module("models/dusty.py", "ref_dusty_te")
        gans = load_reference_module("models/gans/dcgan_eqlr.py", "ref_gans_te")
        refG = dusty.DUSty2(
            gans.Generator(IN_CH, {"depth": 1, "confidence": 2},
                           CH_BASE, CH_MAX, (H, W)),
            tau=None,
        )
        refD = gans.Discriminator(1, CH_BASE, CH_MAX, (H, W))
        ckpt = torch.load(pth_path)
        refG.load_state_dict(ckpt["G_ema"], strict=True)
        refD.load_state_dict(ckpt["D"], strict=True)

        G, _ = _jax_models()
        z = np.random.RandomState(4).randn(3, IN_CH).astype(np.float32)
        out = G.apply(
            native_state.params_G_ema, jnp.asarray(z),
            compute_dtype=jnp.float32, train=False,
            rngs={"gumbel": jax.random.PRNGKey(0)},
        )
        refG.eval()
        with torch.no_grad():
            ref_out = refG(torch.from_numpy(z))
        for k in ("depth_orig", "confidence"):  # noise-independent oracles
            np.testing.assert_allclose(
                np.asarray(out[k]),
                np.transpose(ref_out[k].numpy(), (0, 2, 3, 1)),
                rtol=1e-3, atol=2e-4,
            )

    def test_torch_adam_accepts_exported_state(self, torch, pth_path):
        dusty = load_reference_module("models/dusty.py", "ref_dusty_te2")
        gans = load_reference_module("models/gans/dcgan_eqlr.py", "ref_gans_te2")
        refG = dusty.DUSty2(
            gans.Generator(IN_CH, {"depth": 1, "confidence": 2},
                           CH_BASE, CH_MAX, (H, W)),
            tau=None,
        )
        ckpt = torch.load(pth_path)
        refG.load_state_dict(ckpt["G"], strict=True)
        optim = torch.optim.Adam(refG.parameters(), lr=2e-3, betas=(0.0, 0.99))
        optim.load_state_dict(ckpt["optim_G"])
        out = refG(torch.randn(2, IN_CH))
        (out["depth"].square().mean()).backward()
        optim.step()  # must not throw: moments match parameter shapes


class TestStableHLOExportFromPth:
    def test_serving_export_accepts_reference_checkpoint(
        self, torch, pth_path, cfg, tmp_path
    ):
        """docs/SERVING.md: reference .pth files feed the StableHLO
        exporter through the same torch-import path the eval CLIs use."""
        from dusty_gan_tpu.cli.export import main as export_main
        from dusty_gan_tpu.data.synthetic import build_synthetic_kitti
        from dusty_gan_tpu.utils.export import load_exported

        root = build_synthetic_kitti(str(tmp_path / "data"),
                                     n_scans_per_seq=4, w0=256)
        cfg.dataset.root = str(root)
        cfg_path = str(tmp_path / "config.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.to_yaml())
        out_dir = str(tmp_path / "export")
        export_main(["--model-path", pth_path, "--config-path", cfg_path,
                     "--output-dir", out_dir, "--dtype", "f32",
                     "--platforms", "cpu"])
        call, manifest = load_exported(out_dir)
        assert manifest["source_checkpoint"].endswith(".pth")
        out = call(np.zeros((2, IN_CH), np.float32))
        assert out["depth"].shape == (2, H, W, 1)


class TestExportPthCLI:
    def test_cli_end_to_end(self, torch, native_state, cfg, tmp_path):
        from dusty_gan_tpu.cli.export_pth import main as export_main
        from dusty_gan_tpu.train.checkpoint import save_checkpoint

        ckpt = str(tmp_path / "checkpoint_0000000096.ckpt")
        save_checkpoint(ckpt, native_state)
        cfg_path = str(tmp_path / "config.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.to_yaml())
        out = str(tmp_path / "out" / "checkpoint_0000000096.pth")
        export_main(["--model-path", ckpt, "--config-path", cfg_path,
                     "--output", out])
        loaded = torch.load(out)
        assert loaded["step"] == 96
        assert set(loaded) == {"step", "G", "D", "G_ema", "optim_G",
                               "optim_D", "pl_ema"}
        assert loaded["G_ema"]["drop_const"].item() == -1.0
