"""Train-step tests: loss sanity, accumulation equivalence, EMA, pjit DP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dusty_gan_tpu.geometry.lidar import Lidar
from dusty_gan_tpu.models.dcgan_eqlr import Discriminator, Generator
from dusty_gan_tpu.models.dusty import DUSty1
from dusty_gan_tpu.parallel.mesh import create_mesh, shard_batch, replicated
from dusty_gan_tpu.train.state import create_train_state, make_optimizer
from dusty_gan_tpu.train.step import fetch_reals, make_train_step

H, W = 32, 64  # tiny but stride-16 compatible


def tiny_models(masked=False):
    out_ch = {"depth": 1, "confidence": 1} if masked else {"depth": 1}
    g = Generator(in_ch=32, out_ch=out_ch, ch_base=8, ch_max=16, shape=(H, W))
    if masked:
        g = DUSty1(backbone=g, tau=1.0)
    d = Discriminator(in_ch=1, ch_base=8, ch_max=16, shape=(H, W))
    return g, d


def tiny_lidar():
    pitch = np.linspace(0.2, -0.3, H)[:, None] * np.ones((1, W))
    yaw = np.linspace(np.pi, -np.pi, W, endpoint=False)[None, :] * np.ones((H, 1))
    return Lidar.from_angle_array(
        np.stack([pitch, yaw]).astype(np.float32), (H, W), 0.9, 120.0
    )


def synthetic_batch(n, seed=0):
    rng = np.random.RandomState(seed)
    depth = rng.uniform(0.05, 1.0, (n, H, W, 1)).astype(np.float32)
    mask = (rng.uniform(size=(n, H, W, 1)) > 0.1).astype(np.float32)
    return {"depth": jnp.asarray(depth), "mask": jnp.asarray(mask)}


def build(masked=False, num_accumulation=1, batch_size=8, **kw):
    g, d = tiny_models(masked)
    lidar = tiny_lidar()
    opt_g = make_optimizer(2e-3, 0.0, 0.99)
    opt_d = make_optimizer(2e-3, 0.0, 0.99)
    step = make_train_step(
        g, d, lidar,
        optimizer_g=opt_g, optimizer_d=opt_d,
        num_accumulation=num_accumulation, batch_size=batch_size, **kw,
    )
    state = create_train_state(
        jax.random.PRNGKey(0), g, d, in_ch=32, image_shape=(H, W),
        optimizer_g=opt_g, optimizer_d=opt_d, needs_gumbel=masked,
    )
    return step, state


class TestFetchReals:
    def test_domain(self):
        lidar = tiny_lidar()
        batch = synthetic_batch(4)
        inv, mask = fetch_reals(batch, lidar, drop_const=-1.0)
        x = np.asarray(inv)
        m = np.asarray(mask)
        assert x.min() >= -1.0 - 1e-5 and x.max() <= 1.0 + 1e-5
        np.testing.assert_allclose(x[m == 0], -1.0)



    def test_depth_only_batch_derives_identical_mask(self):
        """A depth-only batch (the loader's transfer-thin path) must yield
        the exact (inv, mask) pair of an explicit-mask batch when the mask
        satisfies the dataset invariant mask == (depth > 0)."""
        lidar = tiny_lidar()
        rng = np.random.RandomState(3)
        depth = rng.uniform(0.05, 1.0, (4, H, W, 1)).astype(np.float32)
        drop = rng.uniform(size=depth.shape) < 0.3
        depth[drop] = 0.0  # invalid returns are zeroed by the pipeline
        full = {"depth": jnp.asarray(depth),
                "mask": jnp.asarray((depth > 0).astype(np.float32))}
        thin = {"depth": jnp.asarray(depth)}
        inv_a, m_a = fetch_reals(full, lidar, drop_const=-1.0)
        inv_b, m_b = fetch_reals(thin, lidar, drop_const=-1.0)
        np.testing.assert_array_equal(np.asarray(inv_a), np.asarray(inv_b))
        np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))



    def test_f16_transfer_close_to_f32(self):
        """transfer_dtype=float16 path: depth arrives f16, is upcast
        on-device, and one step lands close to the f32-wire step (the
        wire rounding perturbs inputs by ~1e-4 relative)."""
        step, state = build()
        jstep = jax.jit(step)
        rng = np.random.RandomState(7)
        depth = rng.uniform(0.05, 1.0, (8, H, W, 1)).astype(np.float32)
        depth[rng.uniform(size=depth.shape) < 0.2] = 0.0
        b32 = {"depth": jnp.asarray(depth)}
        b16 = {"depth": jnp.asarray(depth.astype(np.float16))}
        s32, sc32 = jstep(state, b32, jax.random.PRNGKey(5))
        s16, sc16 = jstep(state, b16, jax.random.PRNGKey(5))
        for k in sc32:
            a, b = float(sc32[k]), float(sc16[k])
            assert np.isfinite(b), k
            np.testing.assert_allclose(a, b, rtol=0.05, atol=5e-3, err_msg=k)


class TestTrainStep:
    def test_losses_finite_and_params_move(self):
        step, state = build()
        jstep = jax.jit(step)
        batch = synthetic_batch(8)
        s1, scalars = jstep(state, batch, jax.random.PRNGKey(1))
        for k, v in scalars.items():
            assert np.isfinite(float(v)), k
        assert {"loss/D/adversarial", "loss/G/adversarial",
                "loss/D/gradient_penalty"} <= set(scalars)
        # params actually moved
        d0 = jax.tree.leaves(state.params_G)[0]
        d1 = jax.tree.leaves(s1.params_G)[0]
        assert not np.allclose(np.asarray(d0), np.asarray(d1))
        assert int(s1.step) == 8

    def test_dusty_masked_training(self):
        step, state = build(masked=True)
        s1, scalars = jax.jit(step)(state, synthetic_batch(8), jax.random.PRNGKey(1))
        assert np.isfinite(float(scalars["loss/G/adversarial"]))

    def test_ema_moves_toward_params(self):
        step, state = build()
        jstep = jax.jit(step)
        s = state
        for i in range(3):
            s, _ = jstep(s, synthetic_batch(8, seed=i), jax.random.PRNGKey(i))
        ema = jax.tree.leaves(s.params_G_ema)[0]
        cur = jax.tree.leaves(s.params_G)[0]
        init = jax.tree.leaves(state.params_G)[0]
        # EMA strictly between init and current (elementwise where they differ)
        moved = np.abs(np.asarray(ema) - np.asarray(init)).sum()
        assert moved > 0

    def test_nsgan_d_loss_decreases_on_average(self):
        """Few steps of D-only signal: adversarial D loss should drop from
        its softplus(0)*2 ~= 1.386 starting point."""
        step, state = build()
        jstep = jax.jit(step)
        s = state
        first = last = None
        for i in range(12):
            s, sc = jstep(s, synthetic_batch(8, seed=i), jax.random.PRNGKey(100 + i))
            if first is None:
                first = float(sc["loss/D/adversarial"])
            last = float(sc["loss/D/adversarial"])
        assert last < first

    def test_gradient_accumulation_shapes(self):
        # reference semantics: the SAME total batch, split into A rounds
        step, state = build(num_accumulation=2)
        s1, scalars = jax.jit(step)(state, synthetic_batch(8), jax.random.PRNGKey(1))
        assert np.isfinite(float(scalars["loss/D/adversarial"]))
        assert int(s1.step) == 8

    def test_path_length_reg(self):
        step, state = build(loss_weight={"gan": 1, "gp": 1, "pl": 2})
        s1, scalars = jax.jit(step)(state, synthetic_batch(8), jax.random.PRNGKey(1))
        assert "loss/G/path_length" in scalars
        assert np.isfinite(float(scalars["loss/G/path_length"]))
        assert float(s1.pl_ema) != 0.0


class TestDataParallel:
    def test_sharded_step_matches_single_device(self):
        mesh = create_mesh(8)
        step, state = build()
        batch = synthetic_batch(8)
        key = jax.random.PRNGKey(7)

        # single-device result
        s_ref, sc_ref = jax.jit(step)(state, batch, key)

        # sharded over 8 CPU devices
        sharded_batch = shard_batch(mesh, batch)
        rep = replicated(mesh)
        state_r = jax.device_put(state, rep)
        key_r = jax.device_put(key, rep)
        s_dp, sc_dp = jax.jit(step)(state_r, sharded_batch, key_r)

        for k in sc_ref:
            np.testing.assert_allclose(
                float(sc_ref[k]), float(sc_dp[k]), rtol=2e-3, atol=2e-4, err_msg=k
            )
        a = jax.tree.leaves(s_ref.params_G)[0]
        b = jax.tree.leaves(s_dp.params_G)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5)
