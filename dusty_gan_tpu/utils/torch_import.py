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


# ---------------------------------------------------------------------------
# full training-state import: continue training a reference run
# ---------------------------------------------------------------------------

# model state_dict entries that are torch BUFFERS, not parameters — they
# appear in the state dict but not in Adam's parameter ordering:
# DUSty1/2 register `drop_const` (models/dusty.py:70,100) and the
# discriminator's BlurVH registers two `kernel`s (models/ops/common.py:61).
_BUFFER_SUFFIXES = ("drop_const", "kernel")


def _ordered_param_names(model_sd: Dict) -> list:
    """named_parameters() order recovered from a saved state dict.

    torch state_dicts preserve registration order (parameters before
    buffers per module), so the optimizer's param index i corresponds to
    the i-th non-buffer state-dict entry (torch.optim.Adam is constructed
    from ``model.parameters()``, trainers/dcgan_amp.py:116-125).
    """
    return [k for k in model_sd if not k.endswith(_BUFFER_SUFFIXES)]


def adam_state_from_torch(optim_sd: Dict, model_sd: Dict, convert, optimizer,
                          template_params):
    """torch.optim.Adam state dict -> optax.adam state.

    torch's per-param {step, exp_avg, exp_avg_sq} maps 1:1 onto optax's
    ScaleByAdamState {count, mu, nu} (identical update rule incl. bias
    correction and sqrt-then-eps denominator). The moment tensors live in
    parameter layout, so `convert` is the SAME name-map converter used for
    the weights (generator_params_from_torch / discriminator_...): we key
    the moments by parameter name and convert them like a state dict.
    """
    import jax
    import jax.numpy as jnp
    import optax

    names = _ordered_param_names(model_sd)
    idxs = [i for g in optim_sd["param_groups"] for i in g["params"]]
    assert len(idxs) == len(names), (len(idxs), names)
    mu_sd, nu_sd, count = {}, {}, 0
    for idx, name in zip(idxs, names):
        s = optim_sd["state"][idx]
        mu_sd[name] = s["exp_avg"]
        nu_sd[name] = s["exp_avg_sq"]
        count = int(s["step"])
    mu = convert(mu_sd)
    nu = convert(nu_sd)

    cast = lambda tmpl, tree: jax.tree.map(
        lambda t, v: jnp.asarray(v, t.dtype), tmpl, tree
    )
    opt_state = optimizer.init(template_params)
    out = []
    replaced = False
    for el in opt_state:
        if isinstance(el, optax.ScaleByAdamState):
            el = el._replace(
                count=jnp.asarray(count, el.count.dtype),
                mu=cast(el.mu, mu),
                nu=cast(el.nu, nu),
            )
            replaced = True
        elif "count" in getattr(el, "_fields", ()):  # e.g. ScaleByScheduleState under lr decay
            el = el._replace(count=jnp.asarray(count, el.count.dtype))
        out.append(el)
    assert replaced, "optimizer has no ScaleByAdamState (not optax.adam?)"
    return type(opt_state)(out)


def train_state_from_torch(path: str, arch: str, template, optimizer_g,
                           optimizer_d):
    """Reference .pth checkpoint -> full TrainState, so ``resume=<ref.pth>``
    continues training a published run: G/D/G_ema weights, both Adam
    states, pl_ema and the image-step counter (everything the reference
    itself restores, trainers/dcgan_amp.py:134-144).

    ``template`` is a freshly created TrainState (provides tree structure
    and dtypes); ``arch`` is the ``gen.arch`` string.
    """
    import jax
    import jax.numpy as jnp
    import torch

    ckpt = torch.load(path, map_location="cpu")
    cast = lambda tmpl, tree: jax.tree.map(
        lambda t, v: jnp.asarray(v, t.dtype), tmpl, tree
    )
    gen_convert = lambda sd: generator_params_from_torch(sd, arch)
    params_G = cast(template.params_G, gen_convert(ckpt["G"]))
    params_G_ema = cast(template.params_G_ema, gen_convert(ckpt["G_ema"]))
    params_D = cast(template.params_D, discriminator_params_from_torch(ckpt["D"]))
    opt_G = adam_state_from_torch(ckpt["optim_G"], ckpt["G"], gen_convert,
                                  optimizer_g, params_G)
    opt_D = adam_state_from_torch(ckpt["optim_D"], ckpt["D"],
                                  discriminator_params_from_torch,
                                  optimizer_d, params_D)
    pl = ckpt.get("pl_ema", None)
    pl_ema = float(pl) if pl is not None else 0.0
    return template.replace(
        step=jnp.asarray(int(ckpt["step"]), template.step.dtype),
        params_G=params_G,
        params_D=params_D,
        params_G_ema=params_G_ema,
        opt_G=opt_G,
        opt_D=opt_D,
        pl_ema=jnp.asarray(pl_ema, jnp.float32),
    )
