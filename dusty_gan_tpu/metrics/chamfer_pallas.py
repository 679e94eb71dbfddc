"""Pallas TPU kernel: brute-force nearest-neighbor (chamfer forward).

The TPU-native successor of the reference CUDA kernel
(``chamfer_distance.cu:9-122``): where the CUDA version tiles xyz2 into
shared memory, this kernel keeps both clouds and the running minima in
VMEM and streams (TN, TM) distance tiles entirely on-chip — the XLA
fallback in metrics/chamfer.py materializes its (B, N, chunk) tiles
through HBM, which dominates the 5000x5000 pairwise-CD evaluation.

Distances are evaluated as explicit squared differences on the VPU: with
K=3 the MXU runs at ~2% utilization, so elementwise broadcasting is the
right unit, and it avoids the x^2+y^2-2xy cancellation.

Layout: clouds enter TRANSPOSED as (1, 3, N) so each coordinate row is
lane-contiguous. With the natural (N, 3) layout, every per-coordinate
slice ``y[sl, c]`` is a 3-of-128-lane gather that Mosaic materializes as
per-tile relayout buffers — at 16k-point clouds (reconstruction eval /
full-res demo) those buffers alone blew the 16 MB scoped-VMEM limit and
silently forced the slow XLA fallback.

Grid: one program per batch element; point counts padded to lane multiples
in the wrapper with +inf-distance sentinels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 2048  # distance-tile cols cap


def _tn_for(m_pad: int) -> int:
    """Distance-tile rows. Mosaic vectorizes the m-tile loop into one
    (TN, m) stack buffer (measured: scoped-VMEM use == TN*m*4 bytes
    regardless of the inner tile split), and the scoped limit is 16 MB —
    budget 8 MB for the distance block and derive TN from m.  m=2048
    (the eval matrices) gets the fast TN=1024; 16k-point full-scan
    clouds get TN=128."""
    if m_pad <= _TM:
        return 1024  # single m-tile: scoped ~= TN*m*4 = 8 MB, fits
    # multi-tile: Mosaic multi-buffers the vectorized (TN, m) block (3-4x
    # TN*m*4 observed at grid 16), so keep the block at 2 MB; TN below 128
    # breaks lane-width vector loads, which is why the wrapper chunks M at
    # _M_CHUNK before reaching here
    return 128


# largest M one kernel call may see: the (128, 4096) f32 block is 2 MB,
# x4 multi-buffering = 8 MB scoped, comfortably under the 16 MB limit
_M_CHUNK = 4096


def _nn_kernel(x_ref, y_ref, dist_ref, idx_ref):
    """x: (1, 3, N), y: (1, 3, M) -> dist (1, 1, N), idx (1, 1, N).
    Tiled over both point axes with a running (min, argmin)."""
    n = x_ref.shape[2]
    m = y_ref.shape[2]
    tm = min(_TM, m)
    TN = _tn_for(m)
    col = jax.lax.broadcasted_iota(jnp.int32, (TN, tm), 1)

    def n_tile(tn, _):
        row = pl.ds(tn * TN, TN)
        x0 = x_ref[0, 0, row][:, None]  # (TN, 1)
        x1 = x_ref[0, 1, row][:, None]
        x2 = x_ref[0, 2, row][:, None]

        def m_tile(tj, carry):
            best, bidx = carry
            sl = pl.ds(tj * tm, tm)
            d = (x0 - y_ref[0, 0, sl][None, :]) ** 2
            d += (x1 - y_ref[0, 1, sl][None, :]) ** 2
            d += (x2 - y_ref[0, 2, sl][None, :]) ** 2  # (TN, tm)
            tile_min = jnp.min(d, axis=1)
            # argmin within tile via masked iota (first occurrence)
            hit = jnp.where(d == tile_min[:, None], col, tm)
            tile_idx = jnp.min(hit, axis=1) + tj * tm
            take = tile_min < best
            return jnp.where(take, tile_min, best), jnp.where(take, tile_idx, bidx)

        best = jnp.full((TN,), jnp.inf, jnp.float32)
        bidx = jnp.zeros((TN,), jnp.int32)
        best, bidx = jax.lax.fori_loop(0, m // tm, m_tile, (best, bidx))
        dist_ref[0, 0, row] = best
        idx_ref[0, 0, row] = bidx
        return 0

    jax.lax.fori_loop(0, n // TN, n_tile, 0)


def _nn_kernel_dist_only(x_ref, y_ref, dist_ref):
    """Min-distance without argmin: the pairwise-CD evaluation matrices
    (cov_mmd_1nna) take no gradients, and the masked-iota argmin pass is
    ~1/3 of the VPU work per tile."""
    n = x_ref.shape[2]
    m = y_ref.shape[2]
    tm = min(_TM, m)
    TN = _tn_for(m)

    def n_tile(tn, _):
        row = pl.ds(tn * TN, TN)
        x0 = x_ref[0, 0, row][:, None]
        x1 = x_ref[0, 1, row][:, None]
        x2 = x_ref[0, 2, row][:, None]

        def m_tile(tj, best):
            sl = pl.ds(tj * tm, tm)
            d = (x0 - y_ref[0, 0, sl][None, :]) ** 2
            d += (x1 - y_ref[0, 1, sl][None, :]) ** 2
            d += (x2 - y_ref[0, 2, sl][None, :]) ** 2  # (TN, tm)
            return jnp.minimum(jnp.min(d, axis=1), best)

        best = jnp.full((TN,), jnp.inf, jnp.float32)
        best = jax.lax.fori_loop(0, m // tm, m_tile, best)
        dist_ref[0, 0, row] = best
        return 0

    jax.lax.fori_loop(0, n // TN, n_tile, 0)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _cd_block_kernel(x_ref, y_ref, out_ref, *, n_true: int, m_true: int):
    """One (row, col) pair of the pairwise-CD matrix per program.

    x: (1, 3, Np), y: (1, 3, Mp) -> out (1, 1) = mean_n min_m d + mean_m
    min_n d.  Fusing the bidirectional mean into the kernel means one
    scalar leaves VMEM per PAIR (the per-pair path writes (B, N) + (B, M)
    minima through HBM), and one dispatch covers a whole (R, C) block of
    the evaluation matrix (cov_mmd_1nna.py:24-51 dispatches per row-chunk
    — ~50k host round-trips for the 5000^2 protocol)."""

    def dir_sum(a_ref, b_ref, a_true):
        a_pad = a_ref.shape[2]
        b_pad = b_ref.shape[2]
        tm = min(_TM, b_pad)
        tn = min(_tn_for(b_pad), a_pad)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, 1), 0)

        def n_tile(i, acc):
            row = pl.ds(i * tn, tn)
            a0 = a_ref[0, 0, row][:, None]
            a1 = a_ref[0, 1, row][:, None]
            a2 = a_ref[0, 2, row][:, None]

            def m_tile(j, best):
                sl = pl.ds(j * tm, tm)
                d = (a0 - b_ref[0, 0, sl][None, :]) ** 2
                d += (a1 - b_ref[0, 1, sl][None, :]) ** 2
                d += (a2 - b_ref[0, 2, sl][None, :]) ** 2  # (tn, tm)
                return jnp.minimum(jnp.min(d, axis=1, keepdims=True), best)

            best = jnp.full((tn, 1), jnp.inf, jnp.float32)
            best = jax.lax.fori_loop(0, b_pad // tm, m_tile, best)
            # query-side padding rows carry sentinel coords; mask them out
            valid = (i * tn + row_ids) < a_true
            return acc + jnp.sum(jnp.where(valid, jnp.maximum(best, 0.0), 0.0))

        return jax.lax.fori_loop(0, a_pad // tn, n_tile, jnp.float32(0.0))

    def bidir(a_ref, b_ref, a_true, b_true):
        """Single-m-tile fast path: one pass over the (n, m) distance
        tiles feeds BOTH direction minima (row-min per tile + a running
        column-min vector) — half the distance evaluations of the
        two-pass path.  The per-pair kernel's bidirectional variant lost
        to scoped-VMEM pressure at (1024, 2048) tiles (see
        chamfer.chamfer_distance_eval NOTE); here the tile is (512, m)
        and the (1, m) running vector is 8 KB."""
        a_pad = a_ref.shape[2]
        b_pad = b_ref.shape[2]
        # largest tile that still divides a_pad (the fori grid must cover
        # every row): a (2048, 2048) f32 tile measured ~5% faster than
        # (1024, 2048) on v5e (107.6k vs 101.8k pairs/s), both >3x the
        # round-2 per-pair path
        tn = 2048 if a_pad % 2048 == 0 else min(1024, a_pad)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, 1), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, b_pad), 1)

        def n_tile(i, carry):
            acc, col_best = carry
            row = pl.ds(i * tn, tn)
            a0 = a_ref[0, 0, row][:, None]
            a1 = a_ref[0, 1, row][:, None]
            a2 = a_ref[0, 2, row][:, None]
            d = (a0 - b_ref[0, 0, :][None, :]) ** 2
            d += (a1 - b_ref[0, 1, :][None, :]) ** 2
            d += (a2 - b_ref[0, 2, :][None, :]) ** 2  # (tn, b_pad)
            row_best = jnp.min(d, axis=1, keepdims=True)  # (tn, 1)
            valid = (i * tn + row_ids) < a_true
            acc = acc + jnp.sum(jnp.where(valid, jnp.maximum(row_best, 0.0), 0.0))
            # sentinel a-rows are far from every real b point, so they
            # never win the column minima; the (pad-row, pad-col) zeros
            # are excluded by the b_true mask below
            col_best = jnp.minimum(col_best, jnp.min(d, axis=0, keepdims=True))
            return acc, col_best

        acc, col_best = jax.lax.fori_loop(
            0, a_pad // tn, n_tile,
            (jnp.float32(0.0), jnp.full((1, b_pad), jnp.inf, jnp.float32)),
        )
        s2 = jnp.sum(jnp.where(col_ids < b_true, jnp.maximum(col_best, 0.0), 0.0))
        return acc, s2

    if y_ref.shape[2] <= _TM:
        s1, s2 = bidir(x_ref, y_ref, n_true, m_true)
    else:
        s1 = dir_sum(x_ref, y_ref, n_true)
        s2 = dir_sum(y_ref, x_ref, m_true)
    val = s1 / n_true + s2 / m_true
    # the whole (R, C) result block stays VMEM-resident across the grid
    # (constant index_map; a (1,1) block would violate the (8,128) tiling
    # rule); each program deposits its scalar via a masked merge
    i = pl.program_id(0)
    j = pl.program_id(1)
    r, c = out_ref.shape
    hit = (jax.lax.broadcasted_iota(jnp.int32, (r, c), 0) == i) & (
        jax.lax.broadcasted_iota(jnp.int32, (r, c), 1) == j
    )
    out_ref[...] = jnp.where(hit, val, out_ref[...])


def _pad_points(p, target: int):
    """Pad a (B, N, 3) cloud stack to N=target with far-away sentinels
    (never the nearest neighbor; query-side rows are masked in-kernel)."""
    b, n, _ = p.shape
    if target == n:
        return p
    return jnp.concatenate(
        [p, jnp.full((b, target - n, 3), 1e18, jnp.float32)], axis=1
    )


def _block_pad(n: int) -> int:
    """Point-count padding for the block kernel: lane multiple, and a
    multiple of the n-tile (so the fori grid covers every row) and of the
    m-tile when chunked."""
    p = _round_up(n, 128)
    if p > _TM:
        p = _round_up(p, _TM)
    elif p > 1024:
        p = _round_up(p, 1024)  # tn = 1024: tile loop must cover all rows
    return p


@functools.partial(jax.jit, static_argnames=("interpret",))
def cd_block_pallas(rows, cols, interpret: bool = False):
    """(R, N, 3), (C, M, 3) -> (R, C) block of symmetric Chamfer scores
    ``mean(d1) + mean(d2)`` (compute_cd semantics).  Grid is (R, C); the
    row cloud's VMEM block depends only on the first grid axis, so Mosaic
    fetches each row once and streams the C column clouds past it."""
    r, n, _ = rows.shape
    c, m, _ = cols.shape
    n_pad = _block_pad(n)
    m_pad = _block_pad(m)
    xt = jnp.transpose(_pad_points(rows.astype(jnp.float32), n_pad), (0, 2, 1))
    yt = jnp.transpose(_pad_points(cols.astype(jnp.float32), m_pad), (0, 2, 1))

    out = pl.pallas_call(
        functools.partial(_cd_block_kernel, n_true=n, m_true=m),
        grid=(r, c),
        in_specs=[
            pl.BlockSpec((1, 3, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m_pad), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, c), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), jnp.float32),
        interpret=interpret,
    )(xt, yt)
    return out


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
    m = y.shape[1]
    if m > _M_CHUNK:
        # split the reference cloud across kernel calls; combine with a
        # running (min, argmin) in XLA. Keeps each call's scoped-VMEM
        # block bounded (see _tn_for).
        best_d = best_i = None
        for off in range(0, m, _M_CHUNK):
            d, i = _nn_pallas_jit(x, y[:, off : off + _M_CHUNK], interpret, need_idx)
            if best_d is None:
                best_d, best_i = d, (i + off if i is not None else None)
            else:
                take = d < best_d
                if need_idx:
                    best_i = jnp.where(take, i + off, best_i)
                best_d = jnp.where(take, d, best_d)
        return best_d, best_i
    b, n, _ = x.shape
    # M must tile evenly: lane multiple when it fits in one tile, else _TM
    m_pad = _round_up(m, 128) if m <= _TM else _round_up(m, _TM)
    n_pad = _round_up(n, _tn_for(m_pad))
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros((b, n_pad - n, 3), jnp.float32)], axis=1)
    if m_pad != m:
        # sentinel points infinitely far away — never the argmin
        y = jnp.concatenate([y, jnp.full((b, m_pad - m, 3), 1e18, jnp.float32)], axis=1)
    # coordinate-major so each coordinate is one lane-contiguous row
    xt = jnp.transpose(x, (0, 2, 1))  # (B, 3, N)
    yt = jnp.transpose(y, (0, 2, 1))  # (B, 3, M)

    in_specs = [
        pl.BlockSpec((1, 3, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    # outputs are lane-major (1, 1, n): an (n, 1) block would pad its
    # single-lane minor dim to 128 lanes — an 8 MB VMEM buffer at 16k
    # points that blew the scoped limit once double-buffered
    dist_spec = pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dist_shape = jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32)
    if need_idx:
        dist, idx = pl.pallas_call(
            _nn_kernel,
            grid=(b,),
            in_specs=in_specs,
            out_specs=[dist_spec, dist_spec],
            out_shape=[dist_shape, jax.ShapeDtypeStruct((b, 1, n_pad), jnp.int32)],
            interpret=interpret,
        )(xt, yt)
        return jnp.maximum(dist[:, 0, :n], 0.0), idx[:, 0, :n]
    dist = pl.pallas_call(
        _nn_kernel_dist_only,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[dist_spec],
        out_shape=[dist_shape],
        interpret=interpret,
    )(xt, yt)[0]
    return jnp.maximum(dist[:, 0, :n], 0.0), None
