"""Eval-time drop-rate calibration (utils/calibration.py).

The Gumbel keep threshold (reference default 0.5, models/dusty.py:54-57) is
a monotone post-hoc knob over the generated drop-rate marginal; calibration
bisects it to match a target rate.  Reference behavior (threshold 0.5) must
be bit-identical when the knob is untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dusty_gan_tpu.models.dcgan_eqlr import Generator
from dusty_gan_tpu.models.dusty import DUSty1, DUSty2
from dusty_gan_tpu.utils.calibration import (
    calibrate_mask_threshold,
    drop_rate_2d,
    real_drop_rate,
)
from dusty_gan_tpu.utils.setup import make_eval_generator, make_fixed_noise

DROP = -1.0


def _make_gen(cls, out_ch, seed=0):
    G = cls(
        backbone=Generator(in_ch=64, out_ch={"depth": 1, "confidence": out_ch}),
        tau=1.0,
        drop_const=DROP,
    )
    k = jax.random.PRNGKey(seed)
    params = G.init({"params": k, "gumbel": k}, jnp.zeros((2, 64)))
    noise = make_fixed_noise(G, (64, 256), key=jax.random.fold_in(k, 7))
    return make_eval_generator(G, params, noise, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def gen2():
    return _make_gen(DUSty2, 2)


class TestThresholdKnob:
    def test_default_matches_legacy(self, gen2):
        """threshold=0.5 (the default) is the reference path, bitwise."""
        z = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        a = gen2(z)["depth"]
        b = gen2(z, threshold=0.5)["depth"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_drop_rate_monotone_in_threshold(self, gen2):
        z = jax.random.normal(jax.random.PRNGKey(2), (8, 64))
        rates = [
            float(drop_rate_2d(gen2(z, threshold=t)["depth"], DROP))
            for t in (0.05, 0.25, 0.5, 0.75, 0.95)
        ]
        assert all(b >= a for a, b in zip(rates, rates[1:])), rates
        assert rates[-1] > rates[0]  # the knob actually moves the marginal

    def test_dusty1_also_calibratable(self):
        gen1 = _make_gen(DUSty1, 1, seed=3)
        z = jax.random.normal(jax.random.PRNGKey(3), (4, 64))
        lo = float(drop_rate_2d(gen1(z, threshold=0.1)["depth"], DROP))
        hi = float(drop_rate_2d(gen1(z, threshold=0.9)["depth"], DROP))
        assert hi > lo


class TestCalibration:
    def test_hits_reachable_target(self, gen2):
        z = jax.random.normal(jax.random.PRNGKey(4), (8, 64))
        # a target we know is achievable: the rate at threshold 0.3
        target = float(drop_rate_2d(gen2(z, threshold=0.3)["depth"], DROP))
        thr, achieved = calibrate_mask_threshold(gen2, z, target, DROP, iters=18)
        assert 0.0 < thr < 1.0
        # the rate is a step function over a finite pixel grid; the bisection
        # must land within one quantization step of the target
        assert abs(achieved - target) < 5e-3, (thr, achieved, target)

    def test_clamps_at_bounds(self, gen2):
        z = jax.random.normal(jax.random.PRNGKey(5), (4, 64))
        thr_lo, r_lo = calibrate_mask_threshold(gen2, z, -1.0, DROP, iters=4)
        thr_hi, r_hi = calibrate_mask_threshold(gen2, z, 2.0, DROP, iters=4)
        assert thr_lo == pytest.approx(1e-3)
        assert thr_hi == pytest.approx(1.0 - 1e-3)
        assert r_hi >= r_lo

    def test_batched_equals_single_shot(self, gen2):
        z = jax.random.normal(jax.random.PRNGKey(6), (8, 64))
        target = float(drop_rate_2d(gen2(z, threshold=0.4)["depth"], DROP))
        t_all, r_all = calibrate_mask_threshold(gen2, z, target, DROP, iters=12)
        t_chk, r_chk = calibrate_mask_threshold(
            gen2, z, target, DROP, iters=12, batch=4
        )
        assert t_all == pytest.approx(t_chk)
        assert r_all == pytest.approx(r_chk)

    def test_real_drop_rate_measures_fill(self):
        x = np.full((3, 4, 8, 1), 0.25, np.float32)
        x[:, :2] = DROP  # half the rows dropped
        assert real_drop_rate(x, DROP) == pytest.approx(0.5)
