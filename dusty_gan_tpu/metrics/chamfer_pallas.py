"""Pallas TPU kernel: brute-force nearest-neighbor (chamfer forward).

The TPU-native successor of the reference CUDA kernel
(``chamfer_distance.cu:9-122``): where the CUDA version tiles xyz2 into
shared memory, this kernel keeps both clouds and the running minima in
VMEM and streams (TN, M) distance tiles entirely on-chip — the XLA
fallback in metrics/chamfer.py materializes its (B, N, chunk) tiles
through HBM, which dominates the 5000x5000 pairwise-CD evaluation.

Distances are evaluated as explicit squared differences on the VPU: with
K=3 the MXU runs at ~2% utilization, so elementwise broadcasting is the
right unit, and it avoids the x^2+y^2-2xy cancellation.

Grid: one program per batch element; point counts padded to lane multiples
in the wrapper with +inf-distance sentinels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 1024  # distance-tile rows resident in VMEM
_TM = 2048  # distance-tile cols; (TN, TM) f32 = 8 MB in VMEM


def _nn_kernel(x_ref, y_ref, dist_ref, idx_ref):
    """x: (1, N, 3), y: (1, M, 3) -> dist (1, N, 1), idx (1, N, 1).
    Tiled over both point axes with a running (min, argmin) so arbitrary
    cloud sizes fit in VMEM (e.g. the demo's 16k-point full range images)."""
    n = x_ref.shape[1]
    m = y_ref.shape[1]
    tm = min(_TM, m)
    col = jax.lax.broadcasted_iota(jnp.int32, (_TN, tm), 1)

    def n_tile(tn, _):
        row = pl.ds(tn * _TN, _TN)
        xt = x_ref[0, row, :]  # (TN, 3)
        x0 = xt[:, 0][:, None]
        x1 = xt[:, 1][:, None]
        x2 = xt[:, 2][:, None]

        def m_tile(tj, carry):
            best, bidx = carry
            sl = pl.ds(tj * tm, tm)
            d = (x0 - y_ref[0, sl, 0][None, :]) ** 2
            d += (x1 - y_ref[0, sl, 1][None, :]) ** 2
            d += (x2 - y_ref[0, sl, 2][None, :]) ** 2  # (TN, tm)
            tile_min = jnp.min(d, axis=1)
            # argmin within tile via masked iota (first occurrence)
            hit = jnp.where(d == tile_min[:, None], col, tm)
            tile_idx = jnp.min(hit, axis=1) + tj * tm
            take = tile_min < best
            return jnp.where(take, tile_min, best), jnp.where(take, tile_idx, bidx)

        best = jnp.full((_TN,), jnp.inf, jnp.float32)
        bidx = jnp.zeros((_TN,), jnp.int32)
        best, bidx = jax.lax.fori_loop(0, m // tm, m_tile, (best, bidx))
        dist_ref[0, row, 0] = best
        idx_ref[0, row, 0] = bidx
        return 0

    jax.lax.fori_loop(0, n // _TN, n_tile, 0)


def _nn_kernel_dist_only(x_ref, y_ref, dist_ref):
    """Min-distance without argmin: the pairwise-CD evaluation matrices
    (cov_mmd_1nna) take no gradients, and the masked-iota argmin pass is
    ~1/3 of the VPU work per tile."""
    n = x_ref.shape[1]
    m = y_ref.shape[1]
    tm = min(_TM, m)

    def n_tile(tn, _):
        row = pl.ds(tn * _TN, _TN)
        xt = x_ref[0, row, :]  # (TN, 3)
        x0 = xt[:, 0][:, None]
        x1 = xt[:, 1][:, None]
        x2 = xt[:, 2][:, None]

        def m_tile(tj, best):
            sl = pl.ds(tj * tm, tm)
            d = (x0 - y_ref[0, sl, 0][None, :]) ** 2
            d += (x1 - y_ref[0, sl, 1][None, :]) ** 2
            d += (x2 - y_ref[0, sl, 2][None, :]) ** 2  # (TN, tm)
            return jnp.minimum(jnp.min(d, axis=1), best)

        best = jnp.full((_TN,), jnp.inf, jnp.float32)
        best = jax.lax.fori_loop(0, m // tm, m_tile, best)
        dist_ref[0, row, 0] = best
        return 0

    jax.lax.fori_loop(0, n // _TN, n_tile, 0)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def nn_pallas(x, y, interpret: bool = False, max_batch: int = 16,
              need_idx: bool = True):
    """(B,N,3), (B,M,3) -> (min sq dist (B,N) f32, argmin (B,N) i32 or
    None when ``need_idx=False``).  Large batches run as grid chunks of
    ``max_batch`` programs (very large grids with big per-program point
    counts upset some TPU compilers)."""
    b = x.shape[0]
    if b > max_batch and x.shape[1] * y.shape[1] > 2**22:
        parts = [
            _nn_pallas_jit(x[i : i + max_batch], y[i : i + max_batch], interpret,
                           need_idx)
            for i in range(0, b, max_batch)
        ]
        import jax.numpy as _jnp

        dist = _jnp.concatenate([p[0] for p in parts])
        idx = _jnp.concatenate([p[1] for p in parts]) if need_idx else None
        return dist, idx
    return _nn_pallas_jit(x, y, interpret, need_idx)


@functools.partial(jax.jit, static_argnames=("interpret", "need_idx"))
def _nn_pallas_jit(x, y, interpret: bool = False, need_idx: bool = True):
    b, n, _ = x.shape
    m = y.shape[1]
    n_pad = _round_up(n, _TN)
    # M must tile evenly: lane multiple when it fits in one tile, else _TM
    m_pad = _round_up(m, 128) if m <= _TM else _round_up(m, _TM)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros((b, n_pad - n, 3), jnp.float32)], axis=1)
    if m_pad != m:
        # sentinel points infinitely far away — never the argmin
        y = jnp.concatenate([y, jnp.full((b, m_pad - m, 3), 1e18, jnp.float32)], axis=1)

    in_specs = [
        pl.BlockSpec((1, n_pad, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m_pad, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    dist_spec = pl.BlockSpec((1, n_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dist_shape = jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32)
    if need_idx:
        dist, idx = pl.pallas_call(
            _nn_kernel,
            grid=(b,),
            in_specs=in_specs,
            out_specs=[dist_spec, dist_spec],
            out_shape=[dist_shape, jax.ShapeDtypeStruct((b, n_pad, 1), jnp.int32)],
            interpret=interpret,
        )(x, y)
        return jnp.maximum(dist[:, :n, 0], 0.0), idx[:, :n, 0]
    dist = pl.pallas_call(
        _nn_kernel_dist_only,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[dist_spec],
        out_shape=[dist_shape],
        interpret=interpret,
    )(x, y)[0]
    return jnp.maximum(dist[:, :n, 0], 0.0), None
