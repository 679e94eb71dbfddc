"""Export native checkpoints as reference-format PyTorch ``.pth`` files.

The exact inverse of ``utils.torch_import``: a full TrainState — G / D /
G_ema weights, both Adam moment sets, pl_ema and the image-step counter —
becomes the dict the reference trainer itself saves
(``trainers/dcgan_amp.py:395-409``), with the reference's state-dict key
names, torch parameter layouts (OIHW / IOHW), registration order, and
buffer entries (``drop_const``, the discriminator's BlurVH ``kernel``
pair).  ``torch.load`` + ``load_state_dict(strict=True)`` into the
reference's own modules round-trips, so models trained here can be used
with the reference's demo/eval tooling — migration works in BOTH
directions (import: ``utils/torch_import.py``).

Layout inversions mirror torch_import: the (2,3,0,1) ConvT permutation is
an involution (it swaps axis pairs), so the same transpose converts both
ways; plain convs go HWIO -> OIHW.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from dusty_gan_tpu.utils.torch_import import _ordered_param_names


def _convt(w):  # (kh,kw,I,O) <-> (I,O,kh,kw): involution, same as import
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32), (2, 3, 0, 1)))


def _conv_inv(w):  # HWIO -> torch OIHW
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1)))


def _f32(x):
    return np.asarray(x, np.float32)


def backbone_state_dict(params: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """flax backbone params -> reference Generator state-dict entries, in
    the reference's registration order (matters for Adam param indices)."""
    p = prefix
    sd = {
        f"{p}0.0.module.weight": _convt(params["proj"]["kernel"]),
        f"{p}0.1.bias": _f32(params["proj_act"]["bias"]),
    }
    for i in range(3):
        up = params[f"up{i}"]
        sd[f"{p}{i + 1}.1.module.weight"] = _convt(up["EqualLRConvTranspose_0"]["kernel"])
        sd[f"{p}{i + 1}.2.bias"] = _f32(up["FusedLeakyReLU_0"]["bias"])
    # reference head order is the out_ch dict order — depth first, then
    # confidence (models/gans/dcgan_eqlr.py heads ModuleDict); any other
    # names follow deterministically
    known = [n for n in ("depth", "confidence") if f"head_{n}" in params["head"]]
    extra = sorted(k[len("head_"):] for k in params["head"]
                   if k[len("head_"):] not in known)
    for name in known + extra:
        head = params["head"][f"head_{name}"]
        sd[f"{p}4.heads.{name}.1.module.weight"] = _convt(head["kernel"])
        sd[f"{p}4.heads.{name}.1.module.bias"] = _f32(head["bias"])
    return sd


def generator_state_dict(params: Dict, arch: str,
                         drop_const: float = -1.0) -> Dict[str, np.ndarray]:
    """Inverse of ``torch_import.generator_params_from_torch``; includes
    the ``drop_const`` buffer DUSty registers (models/dusty.py:70,100)."""
    masker = arch.split("/")[0]
    p = params["params"] if "params" in params else params
    if masker == "none":
        return backbone_state_dict(p)
    sd = {"drop_const": _f32(drop_const).reshape(())}
    sd.update(backbone_state_dict(p["backbone"], prefix="backbone."))
    if masker == "dusty1" and "gumbel" in p:
        sd["gumbel.weight"] = _f32(p["gumbel"]["weight"]).reshape(())
    if masker == "dusty2":
        for mod in ("gumbel_pixel", "gumbel_image"):
            if mod in p:
                sd[f"{mod}.weight"] = _f32(p[mod]["weight"]).reshape(())
    return sd


def discriminator_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse of ``torch_import.discriminator_params_from_torch``;
    includes the BlurVH buffer kernels ([1,2,1]/4, ops/common.py:49-61)."""
    p = params["params"] if "params" in params else params
    k = np.asarray([1.0, 2.0, 1.0], np.float32) / 4.0
    sd = {
        "0.blur_v.kernel": k.reshape(1, 1, 3, 1),
        "0.blur_h.kernel": k.reshape(1, 1, 1, 3),
    }
    for i in range(4):
        down = p[f"down{i}"]
        sd[f"{i + 1}.1.module.weight"] = _conv_inv(down["EqualLRConv_0"]["kernel"])
        sd[f"{i + 1}.2.bias"] = _f32(down["FusedLeakyReLU_0"]["bias"])
    sd["5.module.weight"] = _conv_inv(p["final"]["kernel"])
    sd["5.module.bias"] = _f32(p["final"]["bias"])
    return sd


def adam_state_dict(opt_state, model_sd: Dict, moments_to_sd, *,
                    lr: float, beta1: float, beta2: float,
                    eps: float = 1e-8) -> Dict:
    """optax.adam state -> torch.optim.Adam state dict.

    ``moments_to_sd`` converts a param-shaped pytree (mu or nu) into a
    reference state dict with the same builder used for the weights;
    param indices follow the reference's named_parameters() order
    (recovered from ``model_sd`` like torch_import._ordered_param_names).
    """
    import optax

    adam = None
    for el in opt_state:
        if isinstance(el, optax.ScaleByAdamState):
            adam = el
    assert adam is not None, "optimizer has no ScaleByAdamState (not optax.adam?)"
    mu_sd = moments_to_sd(adam.mu)
    nu_sd = moments_to_sd(adam.nu)
    names = _ordered_param_names(model_sd)
    count = int(adam.count)
    state = {
        i: {"step": count,
            "exp_avg": _f32(mu_sd[name]),
            "exp_avg_sq": _f32(nu_sd[name])}
        for i, name in enumerate(names)
    }
    group = {
        "lr": float(lr), "betas": (float(beta1), float(beta2)),
        "eps": float(eps), "weight_decay": 0.0, "amsgrad": False,
        "maximize": False, "foreach": None, "capturable": False,
        "differentiable": False, "fused": None,
        "params": list(range(len(names))),
    }
    return {"state": state, "param_groups": [group]}


def reference_checkpoint_dict(state, cfg) -> Dict:
    """Full TrainState + config -> the exact dict the reference trainer
    saves (trainers/dcgan_amp.py:395-409), as numpy (tensorized on save)."""
    arch = str(cfg.model.gen.arch)
    drop_const = float(cfg.model.gen.drop_const)
    g_sd = generator_state_dict(state.params_G, arch, drop_const)
    gen_moments = lambda tree: generator_state_dict(tree, arch, drop_const)
    d_sd = discriminator_state_dict(state.params_D)
    lr = cfg.solver.lr
    pl_weight = float(cfg.solver.loss.pl) if "loss" in cfg.solver else 0.0
    return {
        "step": int(state.step),
        "G": g_sd,
        "D": d_sd,
        "G_ema": generator_state_dict(state.params_G_ema, arch, drop_const),
        "optim_G": adam_state_dict(
            state.opt_G, g_sd, gen_moments,
            lr=float(lr.alpha.gen), beta1=float(lr.beta1), beta2=float(lr.beta2),
        ),
        "optim_D": adam_state_dict(
            state.opt_D, d_sd, discriminator_state_dict,
            lr=float(lr.alpha.dis), beta1=float(lr.beta1), beta2=float(lr.beta2),
        ),
        "pl_ema": _f32(state.pl_ema).reshape(()) if pl_weight else None,
    }


def save_reference_checkpoint(path: str, state, cfg) -> str:
    """torch.save a reference-format .pth (requires torch; host-side)."""
    import torch

    def tensorize(obj):
        if isinstance(obj, dict):
            return {k: tensorize(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(tensorize(v) for v in obj)
        if isinstance(obj, np.ndarray):
            # np.array(copy=True) stays contiguous AND keeps 0-d shapes —
            # np.ascontiguousarray would promote scalars (gumbel weights,
            # drop_const) to (1,), which torch.optim.Adam rejects at step()
            return torch.from_numpy(np.array(obj, copy=True))
        return obj

    ckpt = reference_checkpoint_dict(state, cfg)
    # keep ints (step, param indices, per-param Adam steps) and group
    # hyperparams as plain Python; tensors only where the reference
    # stores tensors
    out = {k: tensorize(v) if k != "step" else v for k, v in ckpt.items()}
    torch.save(out, path)
    return path
