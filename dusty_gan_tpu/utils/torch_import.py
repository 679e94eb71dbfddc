"""Import reference PyTorch checkpoints (.pth) into flax param trees.

The reference saves ``{step, G, D, G_ema, optim_G, optim_D, pl_ema}``
(``trainers/dcgan_amp.py:395-409``).  This module converts the ``G``/
``G_ema``/``D`` state dicts into this framework's NHWC parameter layout so
pretrained reference weights serve as forward-parity oracles
(BASELINE.md targets).

Name maps (reference nn.Sequential indices -> flax module names):

Generator (models/gans/dcgan_eqlr.py:49-72):
  0.0.module.weight  (I,O,h0,w0) -> proj/kernel         (h0,w0,I,O)
  0.1.bias                       -> proj_act/bias
  {1,2,3}.1.module.weight (I,O,4,4) -> up{0,1,2}/EqualLRConvTranspose_0/kernel (4,4,I,O)
  {1,2,3}.2.bias                 -> up{0,1,2}/FusedLeakyReLU_0/bias
  4.heads.<k>.1.module.weight    -> head/head_<k>/kernel
  4.heads.<k>.1.module.bias      -> head/head_<k>/bias

DUSty1/2 prefix every backbone key with ``backbone.`` (models/dusty.py);
the learnable-tau Gumbel weight maps to gumbel*/weight.

Discriminator (dcgan_eqlr.py:85-96):
  {1..4}.1.module.weight (O,I,4,4) -> down{0..3}/EqualLRConv_0/kernel (4,4,I,O)
  {1..4}.2.bias                    -> down{0..3}/FusedLeakyReLU_0/bias
  5.module.weight / 5.module.bias  -> final/kernel, final/bias
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _convt(w):  # torch (I,O,kh,kw) -> (kh,kw,I,O)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _conv(w):  # torch (O,I,kh,kw) -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _np(sd, key):
    v = sd[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def backbone_params_from_torch(sd: Dict, prefix: str = "") -> dict:
    p = prefix
    params = {
        "proj": {"kernel": _convt(_np(sd, f"{p}0.0.module.weight"))},
        "proj_act": {"bias": _np(sd, f"{p}0.1.bias")},
    }
    for i, seq in enumerate((1, 2, 3)):
        params[f"up{i}"] = {
            "EqualLRConvTranspose_0": {"kernel": _convt(_np(sd, f"{p}{seq}.1.module.weight"))},
            "FusedLeakyReLU_0": {"bias": _np(sd, f"{p}{seq}.2.bias")},
        }
    heads = {}
    for key in sd:
        if key.startswith(f"{p}4.heads.") and key.endswith(".1.module.weight"):
            name = key[len(f"{p}4.heads.") : -len(".1.module.weight")]
            heads[f"head_{name}"] = {
                "kernel": _convt(_np(sd, f"{p}4.heads.{name}.1.module.weight")),
                "bias": _np(sd, f"{p}4.heads.{name}.1.module.bias"),
            }
    params["head"] = heads
    return params


def generator_params_from_torch(sd: Dict, arch: str = "none") -> dict:
    """arch: masker type — none / dusty1 / dusty2."""
    masker = arch.split("/")[0]
    if masker == "none":
        return {"params": backbone_params_from_torch(sd)}
    params = {"backbone": backbone_params_from_torch(sd, prefix="backbone.")}
    if masker == "dusty1" and "gumbel.weight" in sd:
        params["gumbel"] = {"weight": _np(sd, "gumbel.weight")}
    if masker == "dusty2":
        if "gumbel_pixel.weight" in sd:
            params["gumbel_pixel"] = {"weight": _np(sd, "gumbel_pixel.weight")}
        if "gumbel_image.weight" in sd:
            params["gumbel_image"] = {"weight": _np(sd, "gumbel_image.weight")}
    return {"params": params}


def discriminator_params_from_torch(sd: Dict) -> dict:
    params = {}
    for i, seq in enumerate((1, 2, 3, 4)):
        params[f"down{i}"] = {
            "EqualLRConv_0": {"kernel": _conv(_np(sd, f"{seq}.1.module.weight"))},
            "FusedLeakyReLU_0": {"bias": _np(sd, f"{seq}.2.bias")},
        }
    params["final"] = {
        "kernel": _conv(_np(sd, "5.module.weight")),
        "bias": _np(sd, "5.module.bias"),
    }
    return {"params": params}


def load_reference_checkpoint(path: str, which: str = "G_ema"):
    """Load a reference .pth checkpoint (requires torch; host-side only)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    return ckpt[which], int(ckpt.get("step", 0))
