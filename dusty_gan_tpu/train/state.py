"""Training state: all mutable quantities of a run in one pytree.

Mirrors the reference checkpoint contents ``{step, G, D, G_ema, optim_G,
optim_D, pl_ema}`` (``trainers/dcgan_amp.py:395-409``) as a flax struct, so
checkpoint/resume is a single Orbax save/restore and the whole state moves
through the jitted train step functionally.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array  # images seen, like the reference's `step` counter
    params_G: Any
    params_D: Any
    params_G_ema: Any
    opt_G: Any
    opt_D: Any
    pl_ema: jax.Array


def make_optimizer(
    lr: float,
    beta1: float,
    beta2: float,
    eps: float = 1e-8,
    decay_gamma: float = 1.0,
    decay_step_size: int = 1,
    batch_size: int = 1,
):
    """torch.optim.Adam equivalent (trainers/dcgan_amp.py:116-125):
    optax.adam applies the same bias correction as torch.

    ``decay_gamma``/``decay_step_size`` mirror the solver config's
    ``lr.alpha.decay`` StepLR schedule (configs/solver/nsgan_eqlr.yaml:24-27;
    gamma=1 in the reference config, i.e. constant)."""
    if decay_gamma == 1.0:
        return optax.adam(lr, b1=beta1, b2=beta2, eps=eps)
    # optimizer step count == training iterations; schedule on iterations
    sched = optax.exponential_decay(
        lr, transition_steps=int(decay_step_size), decay_rate=float(decay_gamma),
        staircase=True,
    )
    return optax.adam(sched, b1=beta1, b2=beta2, eps=eps)


def create_train_state(
    key,
    G,
    D,
    *,
    in_ch: int,
    image_shape,
    optimizer_g,
    optimizer_d,
    needs_gumbel: bool,
) -> TrainState:
    kg, kd, kn = jax.random.split(key, 3)
    z = jnp.zeros((1, in_ch), jnp.float32)
    x = jnp.zeros((1, *image_shape, 1), jnp.float32)
    if needs_gumbel:
        params_G = G.init({"params": kg, "gumbel": kn}, z)
    else:
        params_G = G.init(kg, z)
    params_D = D.init(kd, x)
    return TrainState(
        step=jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
        params_G=params_G,
        params_D=params_D,
        params_G_ema=jax.tree.map(jnp.copy, params_G),  # ema starts as a copy
        opt_G=optimizer_g.init(params_G),
        opt_D=optimizer_d.init(params_D),
        pl_ema=jnp.zeros((), jnp.float32),
    )


def ema_update(ema_params, new_params, decay):
    """ema <- decay*ema + (1-decay)*new (trainers/dcgan_amp.py:31-35)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, new_params
    )
