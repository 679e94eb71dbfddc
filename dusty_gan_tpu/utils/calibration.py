"""Eval-time drop-rate calibration for the DUSty Gumbel maskers.

Motivation (BASELINE.md, round-5b): the trained masker overshoots the real
per-pixel drop rate by 3-6 pp uniformly across the training schedule, and
JSD tracks that mask-marginal mismatch.  The Gumbel-sigmoid keep threshold
(reference default 0.5, ``models/dusty.py:54-57``) is a monotone eval-time
knob over the drop rate: the hard mask is ``sigmoid((logit+noise)/tau) >
threshold``, so raising the threshold keeps fewer pixels.  This module
bisects the threshold until the generated drop-rate marginal matches a
target (normally the real train-set rate), in the same post-hoc spirit as
the reference's projection-tolerance tuning (``tune_tolerance.py``) — no
retraining, model weights untouched.

The reference has no analogue (it never measures the marginal); the knob
defaults to the reference's 0.5 everywhere, so behavior is opt-in.

Drop-rate measurement matches the trainer's validation scalars
(``train/trainer.py`` ``drop_rate/*``): the fraction of pixels sitting at
``drop_const`` in the tanh inverse-depth domain, with a 1e-3 guard band.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["drop_rate_2d", "calibrate_mask_threshold", "real_drop_rate"]


def drop_rate_2d(inv_depth, drop_const: float) -> jnp.ndarray:
    """Mean fraction of dropped pixels in a batch of tanh inverse-depth
    images (any layout; dropped pixels sit exactly at ``drop_const`` for
    both real fetches and the DUSty hard mask)."""
    return jnp.mean(inv_depth < drop_const + 1e-3)


def calibrate_mask_threshold(
    gen: Callable,
    latents,
    target_rate: float,
    drop_const: float,
    *,
    lo: float = 1e-3,
    hi: float = 1.0 - 1e-3,
    iters: int = 24,
    batch: int = 0,
) -> Tuple[float, float]:
    """Bisect the Gumbel keep threshold so the generated drop rate matches
    ``target_rate``.

    ``gen(z, threshold=t)`` must be a deterministic eval generator
    (``utils.setup.make_eval_generator``) returning a dict with ``depth``;
    ``threshold`` is traced, so the whole search compiles ONCE.  ``latents``
    is the calibration batch (draw it from a key disjoint from the eval
    latents).  ``batch`` > 0 chunks generation to bound device memory.

    Returns ``(threshold, achieved_rate)``.  The rate is monotone
    non-decreasing in the threshold; with a finite pixel grid it is a step
    function, so the bisection converges to the step containing the target
    (or the nearest achievable rate at the interval ends).
    """
    latents = jnp.asarray(latents)
    n = latents.shape[0]
    step = n if batch <= 0 else int(batch)

    @jax.jit
    def rate_of(z, thr):
        return drop_rate_2d(gen(z, threshold=thr)["depth"], drop_const)

    def rate(thr: float) -> float:
        acc = 0.0
        for i in range(0, n, step):
            z = latents[i : i + step]
            acc += float(rate_of(z, jnp.float32(thr))) * z.shape[0]
        return acc / n

    lo_f, hi_f = float(lo), float(hi)
    r_lo, r_hi = rate(lo_f), rate(hi_f)
    if target_rate <= r_lo:
        return lo_f, r_lo
    if target_rate >= r_hi:
        return hi_f, r_hi
    for _ in range(int(iters)):
        mid = 0.5 * (lo_f + hi_f)
        r = rate(mid)
        if r > target_rate:
            hi_f = mid
        else:
            lo_f = mid
    # of the two bracket ends, return the one closer to the target
    r_lo, r_hi = rate(lo_f), rate(hi_f)
    if abs(r_lo - target_rate) <= abs(r_hi - target_rate):
        return lo_f, r_lo
    return hi_f, r_hi


def real_drop_rate(real_2d, drop_const: float) -> float:
    """Target rate from cached real tanh inverse-depth tensors (the
    ``evaluate_synthesis`` real-cache layout)."""
    return float(np.mean(np.asarray(real_2d) < drop_const + 1e-3))
