"""End-to-end reference .pth checkpoint import.

Builds a REAL reference-format checkpoint file (torch.save of live
reference modules plus genuine torch.optim.Adam states after actual
optimization steps, exactly the dict ``trainers/dcgan_amp.py:395-409``
saves) and drives it through:

* ``utils.setup`` -> ``make_eval_generator`` (the published-checkpoint
  eval path), with forward parity vs the torch G_ema;
* ``torch_import.train_state_from_torch`` (full training-state import),
  with a one-step Adam-update equivalence check against torch — this
  verifies the moment tensors, layouts and step counts, not just shapes;
* the train CLI with ``resume=<ref.pth>`` (continue a published run).
"""

import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import load_reference_module
from dusty_gan_tpu.data.synthetic import build_synthetic_kitti
from dusty_gan_tpu.models.dcgan_eqlr import Discriminator, Generator
from dusty_gan_tpu.models.dusty import DUSty2
from dusty_gan_tpu.train.state import create_train_state, make_optimizer
from dusty_gan_tpu.utils import torch_import as ti

CONFIG_DIR = osp.join(osp.dirname(__file__), "../configs")

# smallest shape the reference Generator supports (h/16 >= 2: its reflect
# pad needs height >= 2 after the projection stage)
H, W, IN_CH, CH_BASE, CH_MAX = 32, 64, 16, 4, 8
ARCH = "dusty2/dcgan_eqlr"
BATCH = 8
STEP_IMAGES = 16  # 2 iterations at batch 8


def _build_ref_models(torch):
    dusty = load_reference_module("models/dusty.py", "ref_dusty_ti")
    gans = load_reference_module("models/gans/dcgan_eqlr.py", "ref_gans_ti")
    torch.manual_seed(0)
    G = dusty.DUSty2(
        gans.Generator(IN_CH, {"depth": 1, "confidence": 2}, CH_BASE, CH_MAX, (H, W)),
        tau=None,  # learnable temperature -> gumbel weights in the optimizer
    )
    D = gans.Discriminator(1, CH_BASE, CH_MAX, (H, W))
    return G, D


@pytest.fixture(scope="module")
def ref_ckpt(torch, tmp_path_factory):
    """A complete reference-format .pth with real Adam states."""
    G, D = _build_ref_models(torch)
    G_ema = _build_ref_models(torch)[0]
    G_ema.load_state_dict(G.state_dict())
    optim_G = torch.optim.Adam(G.parameters(), lr=2e-3, betas=(0.0, 0.99))
    optim_D = torch.optim.Adam(D.parameters(), lr=2e-3, betas=(0.0, 0.99))
    torch.manual_seed(7)
    for _ in range(3):  # genuine steps -> non-trivial exp_avg/exp_avg_sq
        out = G(torch.randn(4, IN_CH))
        (out["depth"].square().mean() + out["confidence"].mean()).backward()
        optim_G.step()
        optim_G.zero_grad()
        D(torch.randn(4, 1, H, W)).mean().backward()
        optim_D.step()
        optim_D.zero_grad()
    with torch.no_grad():
        for e, p in zip(G_ema.parameters(), G.parameters()):
            e.copy_(0.99 * e + 0.01 * p)

    path = str(tmp_path_factory.mktemp("refck") / "checkpoint_0000000016.pth")
    ckpt = {
        "step": STEP_IMAGES,
        "G": G.state_dict(),
        "D": D.state_dict(),
        "G_ema": G_ema.state_dict(),
        "optim_G": optim_G.state_dict(),
        "optim_D": optim_D.state_dict(),
        "pl_ema": torch.tensor(0.123),
    }
    torch.save(ckpt, path)
    return {"path": path, "G": G, "D": D, "G_ema": G_ema,
            "optim_G": optim_G, "optim_D": optim_D}


@pytest.fixture(scope="module")
def run_cfg(tmp_path_factory):
    """Synthetic dataset + a resolved config yaml matching the .pth arch."""
    from dusty_gan_tpu.config import compose

    root = build_synthetic_kitti(
        str(tmp_path_factory.mktemp("kitti_ti")), n_scans_per_seq=10, w0=256
    )
    cfg = compose(CONFIG_DIR, [
        "model=dusty2_dcgan_eqlr",
        f"dataset.root={root}",
        f"dataset.shape=[{H},{W}]",
        f"model.gen.in_ch={IN_CH}",
        f"model.gen.ch_base={CH_BASE}",
        f"model.gen.ch_max={CH_MAX}",
        "model.gen.tau=null",
        f"model.dis.ch_base={CH_BASE}",
        f"model.dis.ch_max={CH_MAX}",
        f"solver.batch_size={BATCH}",
    ])
    cfg_path = str(tmp_path_factory.mktemp("cfg_ti") / "config.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_yaml())
    return {"root": root, "cfg_path": cfg_path, "cfg": cfg}


def _jax_models():
    G = DUSty2(
        backbone=Generator(in_ch=IN_CH, out_ch={"depth": 1, "confidence": 2},
                           ch_base=CH_BASE, ch_max=CH_MAX, shape=(H, W)),
        tau=None,
    )
    D = Discriminator(in_ch=1, ch_base=CH_BASE, ch_max=CH_MAX, shape=(H, W))
    return G, D


class TestSetupFromPth:
    def test_setup_and_forward_parity(self, torch, ref_ckpt, run_cfg):
        """utils.setup() on an actual .pth file (the published-checkpoint
        path, utils/__init__.py:117-160) + G_ema forward parity."""
        from dusty_gan_tpu.utils.setup import make_eval_generator, setup

        cfg, G, params, lidar, fixed_noise = setup(
            ref_ckpt["path"], run_cfg["cfg_path"], ema=True, fix_noise=True
        )
        assert lidar.shape == (H, W)
        gen = make_eval_generator(G, params, fixed_noise, compute_dtype=jnp.float32)

        z = np.random.RandomState(1).randn(3, IN_CH).astype(np.float32)
        out = gen(jnp.asarray(z))
        ref = ref_ckpt["G_ema"].eval()
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(z))
        # depth_orig and confidence are noise-independent -> exact oracles
        for k in ("depth_orig", "confidence"):
            np.testing.assert_allclose(
                np.asarray(out[k]),
                np.transpose(ref_out[k].numpy(), (0, 2, 3, 1)),
                rtol=1e-3, atol=2e-4,
            )
        # mask present and binary (noise differs by design)
        assert set(np.unique(np.asarray(out["mask"]))) <= {0.0, 1.0}


class TestTrainStateFromPth:
    def test_full_state_import_and_adam_step_equivalence(self, torch, ref_ckpt):
        """Import {G,D,G_ema,optim_G,optim_D,pl_ema,step}; then feed the
        SAME gradients to torch.optim.Adam and the imported optax state —
        the updated generator params must match. This pins the moment
        layouts (exp_avg/exp_avg_sq vs mu/nu), the step count used for
        bias correction, and the NHWC transposes of the moments."""
        G, D = _jax_models()
        opt_g = make_optimizer(2e-3, 0.0, 0.99)
        opt_d = make_optimizer(2e-3, 0.0, 0.99)
        template = create_train_state(
            jax.random.PRNGKey(0), G, D, in_ch=IN_CH, image_shape=(H, W),
            optimizer_g=opt_g, optimizer_d=opt_d, needs_gumbel=True,
        )
        state = ti.train_state_from_torch(
            ref_ckpt["path"], ARCH, template, opt_g, opt_d
        )
        assert int(state.step) == STEP_IMAGES
        np.testing.assert_allclose(float(state.pl_ema), 0.123, rtol=1e-6)

        # params parity
        want_G = ti.generator_params_from_torch(ref_ckpt["G"].state_dict(), ARCH)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6),
            state.params_G, want_G,
        )

        # same synthetic grads on both sides
        ref_G = ref_ckpt["G"]
        grng = np.random.RandomState(3)
        grads_by_name = {
            n: grng.standard_normal(tuple(p.shape)).astype(np.float32)
            for n, p in ref_G.named_parameters()
        }
        for n, p in ref_G.named_parameters():
            p.grad = torch.from_numpy(grads_by_name[n].copy())
        ref_ckpt["optim_G"].step()
        want_after = ti.generator_params_from_torch(ref_G.state_dict(), ARCH)

        import optax

        grads = ti.generator_params_from_torch(grads_by_name, ARCH)
        grads = jax.tree.map(lambda t, g: jnp.asarray(g, t.dtype),
                             state.params_G, grads)
        updates, _ = opt_g.update(grads, state.opt_G, state.params_G)
        got_after = optax.apply_updates(state.params_G, updates)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), b, rtol=2e-5, atol=1e-7),
            got_after, want_after,
        )

    def test_discriminator_moments_roundtrip(self, torch, ref_ckpt):
        """D-side Adam state import: one-step equivalence as above."""
        G, D = _jax_models()
        opt = make_optimizer(2e-3, 0.0, 0.99)
        template = create_train_state(
            jax.random.PRNGKey(0), G, D, in_ch=IN_CH, image_shape=(H, W),
            optimizer_g=opt, optimizer_d=opt, needs_gumbel=True,
        )
        state = ti.train_state_from_torch(ref_ckpt["path"], ARCH, template, opt, opt)

        ref_D = ref_ckpt["D"]
        grng = np.random.RandomState(4)
        grads_by_name = {
            n: grng.standard_normal(tuple(p.shape)).astype(np.float32)
            for n, p in ref_D.named_parameters()
        }
        for n, p in ref_D.named_parameters():
            p.grad = torch.from_numpy(grads_by_name[n].copy())
        ref_ckpt["optim_D"].step()
        want_after = ti.discriminator_params_from_torch(ref_D.state_dict())

        import optax

        grads = ti.discriminator_params_from_torch(grads_by_name)
        grads = jax.tree.map(lambda t, g: jnp.asarray(g, t.dtype),
                             state.params_D, grads)
        updates, _ = opt.update(grads, state.opt_D, state.params_D)
        got_after = optax.apply_updates(state.params_D, updates)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), b, rtol=2e-5, atol=1e-7),
            got_after, want_after,
        )


class TestResumeTrainingFromPth:
    def test_train_cli_resumes_reference_run(self, torch, ref_ckpt, run_cfg,
                                             tmp_path):
        """``resume=<reference .pth>`` continues training end-to-end
        (trainers/dcgan_amp.py:134-144 semantics: start_iteration =
        step // batch_size)."""
        from dusty_gan_tpu.cli.train import main as train_main

        run_dir = str(tmp_path / "resume_pth_run")
        train_main([
            "model=dusty2_dcgan_eqlr",
            f"dataset.root={run_cfg['root']}",
            f"dataset.shape=[{H},{W}]",
            f"model.gen.in_ch={IN_CH}",
            f"model.gen.ch_base={CH_BASE}",
            f"model.gen.ch_max={CH_MAX}",
            "model.gen.tau=null",
            f"model.dis.ch_base={CH_BASE}",
            f"model.dis.ch_max={CH_MAX}",
            f"solver.batch_size={BATCH}",
            "solver.checkpoint.save_stats=1",
            "solver.checkpoint.save_image=100",
            "solver.checkpoint.test=100",
            "solver.checkpoint.save_model=4",
            f"resume={ref_ckpt['path']}",
            f"run_dir={run_dir}",
            "total_iterations=4",
        ])
        from glob import glob

        ckpts = glob(osp.join(run_dir, "models", "checkpoint_*.ckpt"))
        assert len(ckpts) >= 1
        # resumed at iteration 2 (16 images / batch 8): the first logged
        # step is iteration 3 = 24 images, not 8
        import json

        with open(osp.join(run_dir, "scalars.jsonl")) as f:
            steps = [json.loads(l)["step"] for l in f]
        assert steps and min(steps) >= 24 and max(steps) == 32
