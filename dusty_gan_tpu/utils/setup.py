"""Checkpoint + config -> (cfg, G, params, lidar) for evaluation scripts.

Equivalent of ``utils.setup`` (``utils/__init__.py:117-160``): loads either
a native checkpoint (.ckpt msgpack from train.checkpoint) or a reference
PyTorch ``.pth`` (converted via utils.torch_import — the parity-oracle
path), picks G_ema or G, builds the LiDAR from the dataset config, and
prepares the fixed Gumbel noise used for deterministic evaluation
(utils/__init__.py:141-149).
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dusty_gan_tpu.config import Config, load_config
from dusty_gan_tpu.geometry.lidar import Lidar
from dusty_gan_tpu.models.dusty import DUSty1, DUSty2
from dusty_gan_tpu.models.factory import define_G
from dusty_gan_tpu.ops.gumbel import logistic_noise
from dusty_gan_tpu.train.step import make_g_apply


def make_fixed_noise(G, shape, key=None) -> Optional[Any]:
    """One frozen logistic-noise field per Gumbel module
    (utils/__init__.py:141-149): shared across all evaluated samples."""
    key = jax.random.PRNGKey(0x501) if key is None else key
    h, w = shape
    if isinstance(G, DUSty1):
        return logistic_noise(key, 1, (h, w), pixelwise=True)
    if isinstance(G, DUSty2):
        return {
            "pixel": logistic_noise(key, 1, (h, w), pixelwise=True),
            "image": logistic_noise(jax.random.fold_in(key, 1), 1, (h, w), pixelwise=False),
        }
    return None


def setup(
    model_path: str,
    config_path: str,
    ema: bool = True,
    fix_noise: bool = True,
) -> Tuple[Config, Any, Dict, Any, Optional[Any]]:
    """Returns (cfg, G, params, lidar, fixed_noise)."""
    if not osp.exists(model_path):
        raise FileNotFoundError(f"model checkpoint not found: {model_path}")
    if not osp.exists(config_path):
        raise FileNotFoundError(f"config not found: {config_path}")
    cfg = load_config(config_path)
    cfg.model.gen.shape = list(cfg.dataset.shape)
    cfg.model.dis.shape = list(cfg.dataset.shape)

    G = define_G(cfg)
    arch = str(cfg.model.gen.arch)

    if model_path.endswith(".pth"):
        from dusty_gan_tpu.utils import torch_import as ti

        sd, step = ti.load_reference_checkpoint(model_path, "G_ema" if ema else "G")
        params = ti.generator_params_from_torch(sd, arch)
        print(f"#images: {step} (reference .pth)")
    else:
        from dusty_gan_tpu.train.checkpoint import restore_checkpoint
        from dusty_gan_tpu.train.state import create_train_state, make_optimizer
        from dusty_gan_tpu.models.factory import define_D

        D = define_D(cfg)
        opt = make_optimizer(1e-3, 0.0, 0.99)
        template = create_train_state(
            jax.random.PRNGKey(0), G, D,
            in_ch=int(cfg.model.gen.in_ch), image_shape=tuple(cfg.dataset.shape),
            optimizer_g=opt, optimizer_d=opt,
            needs_gumbel=isinstance(G, (DUSty1, DUSty2)),
        )
        state, _ = restore_checkpoint(model_path, template)
        params = state.params_G_ema if ema else state.params_G
        print(f"#images: {int(state.step)}")

    angle_file = None
    for cand in ("angles.npy", "angles.pt"):
        p = osp.join(str(cfg.dataset.root), cand)
        if osp.exists(p):
            angle_file = p
            break
    assert angle_file is not None, f"angles file missing under {cfg.dataset.root}"
    lidar = Lidar.from_angle_file(
        angle_file, tuple(cfg.dataset.shape), cfg.dataset.min_depth, cfg.dataset.max_depth
    )

    fixed_noise = make_fixed_noise(G, tuple(cfg.dataset.shape)) if fix_noise else None
    return cfg, G, params, lidar, fixed_noise


def make_eval_generator(G, params, fixed_noise, compute_dtype=jnp.bfloat16):
    """latent -> output dict, deterministic (fixed noise, eval thresholds).

    ``threshold`` is the Gumbel-sigmoid keep threshold (reference default
    0.5, dusty.py:54-57).  It may be a traced scalar, which makes it an
    eval-time calibration knob: see ``utils.calibration`` for matching the
    generated drop-rate marginal to the real one post hoc.
    """
    apply_g, masked = make_g_apply(G)
    dummy = jax.random.PRNGKey(0)

    def gen(z, train: bool = False, threshold=0.5):
        if masked:
            return G.apply(
                {"params": params["params"]} if "params" in params else params,
                z, compute_dtype=compute_dtype, train=train,
                threshold=threshold,
                fixed_noise=fixed_noise,
                rngs={"gumbel": dummy},
            )
        return G.apply(params, z, compute_dtype=compute_dtype)

    return gen
