"""The jitted GAN train step: D phase + G phase + EMA in one XLA program.

Faithful re-design of ``Trainer.step`` (``trainers/dcgan_amp.py:162-325``)
with the reference's semantics preserved:

* per accumulation round, a fresh real microbatch and latent batch; the
  SAME z and Gumbel noise are reused between the D and G phases (the
  reference reuses the cached ``xs_fake`` graph, dcgan_amp.py:166-189,255);
* DiffAugment draws fresh randomness per phase and per branch
  (dcgan_amp.py:199-200, 255-256);
* R1 penalty on augmented reals with weight gp/2 (dcgan_amp.py:216-232)
  — computed here as a clean nested vjp, no loss-scaler dance;
* optional StyleGAN2 path-length regularization on a half batch
  (dcgan_amp.py:269-306), pl_ema carried in TrainState;
* EMA of G after both updates (dcgan_amp.py:316);
* logged scalars are global means — under pjit the mean over the sharded
  batch IS the cross-device all-reduce (dcgan_amp.py:319-323).

Gradient accumulation is a ``lax.scan`` over microbatches (replacing the
``DDP.no_sync`` dance, utils/context_manager.py:21-35): one parameter
update and one implicit gradient all-reduce per step regardless of A.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from dusty_gan_tpu.core.dtypes import Policy, DEFAULT_POLICY
from dusty_gan_tpu.geometry.lidar import sigmoid_to_tanh
from dusty_gan_tpu.models import losses
from dusty_gan_tpu.models.dusty import DUSty1, DUSty2
from dusty_gan_tpu.ops.diff_augment import diff_augment
from dusty_gan_tpu.train.state import TrainState, ema_update


def fetch_reals(batch: Dict[str, jax.Array], lidar, drop_const: float):
    """depth [0,1] + mask -> normalized inverse depth in [-1,1] with dropped
    pixels at drop_const (trainers/dcgan_amp.py:154-160). NHWC.

    ``mask`` may be omitted: the dataset pipeline gates valid returns with
    STRICT min/max inequalities and zeroes everything else, so normalized
    valid depths are strictly positive and ``mask == (depth > 0)`` bit-
    exactly (tests/test_data.py::TestMaskInvariant). Deriving it on-device
    halves the per-step host->device transfer.

    ``depth`` may arrive in a narrow wire dtype (``transfer_dtype:
    float16`` halves transfer bytes again, opt-in) and is upcast to f32
    here — the mask is derived AFTER the upcast, so only depths that
    round-to-nearest to f16 zero (< 2^-25 normalized, i.e. within
    ~3.6 µm of min_depth at KITTI scale) could flip it."""
    depth = batch["depth"]
    if depth.dtype != jnp.float32:
        depth = depth.astype(jnp.float32)
    if "mask" in batch:
        mask = batch["mask"].astype(depth.dtype)
    else:
        mask = (depth > 0).astype(depth.dtype)
    inv = sigmoid_to_tanh(lidar.invert_depth(depth))
    return mask * inv + (1.0 - mask) * drop_const, mask


def make_g_apply(G):
    """Uniform calling convention across none/dusty1/dusty2 generators."""
    masked = isinstance(G, (DUSty1, DUSty2))

    def apply_g(params, z, gumbel_key, compute_dtype, train=True):
        if masked:
            return G.apply(
                params, z, compute_dtype=compute_dtype, train=train,
                rngs={"gumbel": gumbel_key},
            )
        return G.apply(params, z, compute_dtype=compute_dtype)

    return apply_g, masked


def make_train_step(
    G,
    D,
    lidar,
    *,
    optimizer_g,
    optimizer_d,
    gan_mode: str = "nsgan",
    label_smoothing: float = 1.0,
    loss_weight: Optional[Dict[str, float]] = None,
    augment_policy=("brightness", "saturation", "contrast", "translation", "cutout"),
    augment_p: float = 1.0,
    drop_const: float = -1.0,
    num_accumulation: int = 1,
    ema_decay: float = 0.5 ** (32 / 10000.0),
    batch_size: int = 32,
    policy: Policy = DEFAULT_POLICY,
    pl_decay: float = 0.01,
    pl_batch_shrink: int = 2,
):
    """Build the train step. Call via jit with batch leading dim =
    batch_size (the GLOBAL per-iteration batch, reference semantics:
    accumulation SPLITS it into batch_size/A microbatches,
    train.py:54-57); shard it over the data mesh axis."""
    lw = dict(loss_weight or {"gan": 1.0, "gp": 1.0, "pl": 0.0})
    w_gan = float(lw.get("gan", 1.0))
    w_gp = float(lw.get("gp", 0.0))
    w_pl = float(lw.get("pl", 0.0))
    use_gp = w_gp > 0.0
    use_pl = w_pl > 0.0
    A = int(num_accumulation)
    cdt = policy.compute_dtype
    in_ch = G.backbone.in_ch if isinstance(G, (DUSty1, DUSty2)) else G.in_ch
    apply_g, _ = make_g_apply(G)

    aug = functools.partial(diff_augment, policy=tuple(augment_policy), p=augment_p)

    def apply_d(params, x):
        # images reach D in f32: casting the tanh inverse-depth domain to
        # bf16 quantizes LiDAR range to ~110 levels and erases returns
        # beyond ~106 m (JSD 0.038 from the cast alone — round-5 diagnosis);
        # the Discriminator keeps its interior in ``cdt`` and holds only
        # the input boundary at f32 (Discriminator.input_f32)
        return D.apply(params, x, compute_dtype=cdt).reshape(-1)

    # ------------------------------------------------------------------
    # D phase
    # ------------------------------------------------------------------
    def d_round_loss(params_D, x_real, x_fake, key):
        kr, kf = jax.random.split(key)
        x_real_aug = aug(kr, x_real)
        x_fake_aug = jax.lax.stop_gradient(aug(kf, x_fake))
        # NOTE: fusing real+fake into one concatenated D pass was tried and
        # reverted — R1's input-vjp then back-propagates the doubled batch
        # (the zero cotangent on the fake half isn't free), a net loss.
        d_fn = lambda x: apply_d(params_D, x)
        if use_gp:
            r1, y_real = losses.r1_penalty(d_fn, x_real_aug)
        else:
            y_real = d_fn(x_real_aug)
            r1 = jnp.zeros((), jnp.float32)
        y_fake = d_fn(x_fake_aug)
        adv = losses.gan_loss_d(gan_mode, y_real, y_fake, smoothing=label_smoothing)
        loss = w_gan * adv + (w_gp / 2.0) * r1
        scalars = {
            "loss/D/output/real": jnp.mean(y_real),
            "loss/D/output/fake": jnp.mean(y_fake),
            "loss/D/adversarial": adv,
        }
        if use_gp:
            scalars["loss/D/gradient_penalty"] = r1
        return loss, scalars

    def d_phase(params_D, xs_real, xs_fake, keys):
        def loss_fn(p):
            if A == 1:  # fast path: no scan machinery for the common config
                loss, scalars = d_round_loss(p, xs_real[0], xs_fake[0], keys[0])
                return loss, scalars

            def body(carry, xs):
                x_real, x_fake, key = xs
                loss, scalars = d_round_loss(p, x_real, x_fake, key)
                return carry + loss / A, scalars

            total, scalars = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), (xs_real, xs_fake, keys)
            )
            return total, jax.tree.map(jnp.mean, scalars)

        (loss, scalars), grads = jax.value_and_grad(loss_fn, has_aux=True)(params_D)
        return grads, scalars

    # ------------------------------------------------------------------
    # G phase
    # ------------------------------------------------------------------
    def g_round_loss(p, params_D, pl_ema, x_real, z, gk, key, pl_key):
        kr, kf = jax.random.split(key)
        synth = apply_g(p, z, gk, cdt, train=True)
        x_fake_aug = aug(kf, synth["depth"])
        y_fake = apply_d(params_D, x_fake_aug)
        if gan_mode in ("ragan", "rahinge", "ralsgan"):
            y_real = apply_d(params_D, aug(kr, x_real))
        else:
            y_real = None
        adv = losses.gan_loss_g(gan_mode, y_real, y_fake)
        loss = w_gan * adv
        scalars = {"loss/G/adversarial": adv}
        if use_pl:
            b_pl = z.shape[0] // pl_batch_shrink
            z_pl = jax.random.normal(jax.random.fold_in(pl_key, 0), (b_pl, in_ch))
            g_depth = lambda zz: apply_g(p, zz, gk, cdt, train=True)["depth"]
            pl_pen, pl_ema = losses.path_length_penalty(
                g_depth, z_pl, jax.random.fold_in(pl_key, 1), pl_ema, pl_decay
            )
            loss = loss + w_pl * pl_pen
            scalars["loss/G/path_length"] = pl_pen
            scalars["loss/G/path_length/baseline"] = pl_ema
        return loss, scalars, pl_ema

    def g_phase(params_G, params_D, xs_real, zs, gumbel_keys, keys, pl_keys, pl_ema):
        params_D = jax.lax.stop_gradient(params_D)

        def loss_fn(p):
            if A == 1:  # fast path: no scan machinery for the common config
                loss, scalars, pl_ema_new = g_round_loss(
                    p, params_D, pl_ema, xs_real[0], zs[0], gumbel_keys[0],
                    keys[0], pl_keys[0],
                )
                return loss, (scalars, pl_ema_new)

            def body(pl_ema, xs):
                x_real, z, gk, key, pl_key = xs
                loss, scalars, pl_ema = g_round_loss(
                    p, params_D, pl_ema, x_real, z, gk, key, pl_key
                )
                return pl_ema, (loss / A, scalars)

            pl_ema_new, (round_losses, scalars) = jax.lax.scan(
                body, pl_ema, (xs_real, zs, gumbel_keys, keys, pl_keys)
            )
            return jnp.sum(round_losses), (jax.tree.map(jnp.mean, scalars), pl_ema_new)

        (loss, (scalars, pl_ema_new)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params_G
        )
        return grads, scalars, pl_ema_new

    # ------------------------------------------------------------------
    # full step
    # ------------------------------------------------------------------
    def train_step(state: TrainState, batch: Dict[str, jax.Array], key: jax.Array):
        """batch: {"depth": (A*B,H,W,1) in [0,1]} (+ optional "mask";
        absent -> derived on-device as depth > 0, see fetch_reals).

        Optional "stop" key: per-host preemption flags laid out over the
        data axis; their global max comes back in scalars["stop/agreed"].
        Folding the vote into this step means it rides the step's own
        XLA collectives — a separate host-level collective program would
        race the step's communicator-id assignment across ranks and
        deadlock (see cli/train.py stop_agreed)."""
        batch = dict(batch)
        stop_flags = batch.pop("stop", None)
        x_real_flat, _ = fetch_reals(batch, lidar, drop_const)
        n = x_real_flat.shape[0]
        b = n // A
        xs_real = x_real_flat.reshape(A, b, *x_real_flat.shape[1:])

        k_z, k_gum, k_augd, k_augg, k_pl = jax.random.split(key, 5)
        zs = jax.random.normal(k_z, (A, b, in_ch), jnp.float32)
        gumbel_keys = jax.random.split(k_gum, A)
        keys_d = jax.random.split(k_augd, A)
        keys_g = jax.random.split(k_augg, A)
        pl_keys = jax.random.split(k_pl, A)

        # fakes for the D phase (same z + gumbel noise reused in G phase)
        def synth_round(z, gk):
            return apply_g(state.params_G, z, gk, cdt, train=True)["depth"]

        if A == 1:
            xs_fake = synth_round(zs[0], gumbel_keys[0])[None]
        else:
            xs_fake = jax.vmap(synth_round)(zs, gumbel_keys)
        xs_fake = jax.lax.stop_gradient(xs_fake)

        # --- D update
        grads_D, scalars_d = d_phase(state.params_D, xs_real, xs_fake, keys_d)
        updates_D, opt_D = optimizer_d.update(grads_D, state.opt_D, state.params_D)
        params_D = optax.apply_updates(state.params_D, updates_D)

        # --- G update (against the freshly updated D, as in the reference:
        # optim_D.step() happens before the G phase)
        grads_G, scalars_g, pl_ema = g_phase(
            state.params_G, params_D, xs_real, zs, gumbel_keys, keys_g, pl_keys,
            state.pl_ema,
        )
        updates_G, opt_G = optimizer_g.update(grads_G, state.opt_G, state.params_G)
        params_G = optax.apply_updates(state.params_G, updates_G)

        # --- EMA
        params_G_ema = ema_update(state.params_G_ema, params_G, ema_decay)

        new_state = state.replace(
            step=state.step + batch_size,
            params_G=params_G,
            params_D=params_D,
            params_G_ema=params_G_ema,
            opt_G=opt_G,
            opt_D=opt_D,
            pl_ema=pl_ema,
        )
        scalars = {**scalars_d, **scalars_g}
        if stop_flags is not None:
            scalars["stop/agreed"] = jnp.max(stop_flags)
        return new_state, scalars

    return train_step
