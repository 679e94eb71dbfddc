"""Explicit PRNG-key discipline.

Every source of randomness in the reference (latent sampling, Gumbel noise
``models/dusty.py:30-36``, DiffAugment draws, dataset shuffling) becomes a
named, step-folded JAX key here, making runs bit-reproducible and
shard-consistent under pjit.
"""

from __future__ import annotations

import jax


def fold_step(key: jax.Array, step) -> jax.Array:
    """Derive the per-step key from a run-level root key."""
    return jax.random.fold_in(key, step)


def key_iter(key: jax.Array):
    """Infinite iterator of fresh keys (host-side convenience, not for jit)."""
    while True:
        key, sub = jax.random.split(key)
        yield sub


def split_dict(key: jax.Array, names) -> dict:
    """Split one key into a {name: key} dict (stable order by given names)."""
    names = tuple(names)
    keys = jax.random.split(key, len(names))
    return {name: k for name, k in zip(names, keys)}
