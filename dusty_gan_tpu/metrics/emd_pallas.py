"""Pallas TPU kernel: annealed-auction EMD without the match matrix.

TPU-native successor of the reference CUDA matcher
(``utils/metrics/distance/emd/earth_mover_distance.cu:26-265``).  The
dense XLA path (metrics/emd.py) re-streams three (N, M) tensors through
HBM on every one of the 10 annealing rounds (~80 MB/pair/round at 2048
pts -> ~758 pairs/s, HBM-bound).  This kernel never materializes the
match at all:

  cost = sum_nm d[n,m] * match[n,m]
       = sum_n |x_n|^2 R[n] + sum_m |y_m|^2 C[m] - 2 sum_nc x[n,c] V[n,c]

where R[n] = sum_m match, C[m] = sum_n match and V[n,c] =
sum_m match[n,m] y[m,c] are O(N) accumulators updated per round from the
same quantities the auction already computes.  Distance tiles are
recomputed from the two coordinate-major clouds resident in VMEM (the
arithmetic is ~40x cheaper than streaming the (N, M) state), so HBM
traffic per pair is O(N + M).

Per round the auction needs three full sweeps over the (N, M) tile space
(each barriers on a reduction of the previous one):

  A: suml[n]     = sum_m w * remain_r[m],  ratio_l = remain_l / suml
  B: sumr_raw[m] = sum_n w * ratio_l[n]    -> ratio_r / remain_r update
  C: t[n] = sum_m w*ratio_r, vy[n,c] = sum_m w*ratio_r*y[m,c]
     -> R, V, remain_l updates;  C[m] += ratio_r * sumr_raw

with w = exp(level * d) recomputed in f32 each sweep (bit-faithful to
the dense path; a bf16 w-cache was rejected: exp(level*d) at level
-16384 amplifies bf16 rounding of d arbitrarily).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tn_for_emd(n: int) -> int:
    for tn in (512, 256, 128):
        if n % tn == 0:
            return tn
    raise ValueError(f"point count {n} not a multiple of 128")


def block_shapes_supported(n: int, m: int) -> bool:
    """The streaming kernel wants lane-aligned clouds, a single m-tile,
    and n small enough that the six (n, 1) scratch columns (lane-padded
    to (8, 128) tiles: n/2 KB each) plus the (tn, m) distance tile fit
    the 16 MB scoped-VMEM budget — n <= 2048 keeps scratch at 6 MB.  The
    eval protocol's 512/2048-point clouds qualify; anything else takes
    the dense XLA path."""
    return n % 128 == 0 and m % 128 == 0 and n <= 2048 and m <= 2048


def _run_auction(x_ref, y_ref, rl_col, ratio_l_col, r_col, v0, v1, v2,
                 n: int, m: int, tn: int, collect_u: bool):
    """The annealed auction over one (x, y) pair; x: (1, 3, N), y:
    (1, 3, M); scratch: six (N, 1) f32 column buffers (layouts:
    n-in-sublane tiles against lane-major y rows, exactly like the
    chamfer kernels).

    Sweep structure (10 tile sweeps total, vs 30 for the naive
    pass-per-barrier schedule):
    - A and B have no barrier between them (ratio_l[n] needs only row
      n's own reduction), so they always share one w evaluation;
    - C of round i-1 fuses into the A+B sweep of round i, sharing the
      distance tile (two exps, one d);
    - round 9 has level = 0 -> w = 1, collapsing its A+B and its C to
      O(N + M) vector math with no tile sweep at all.

    Leaves R[n] (match row mass) in ``r_col`` and V[n,c] = sum_m match *
    y[m,c] in ``v0..v2``; returns (cost, c_row = match col mass, and —
    when ``collect_u`` — U[m,c] = sum_n match * x[n,c], the residue the
    analytic backward needs for grads w.r.t. y (cu:309-388))."""
    if n >= m:
        multi_l, multi_r = 1.0, float(n // m)
    else:
        multi_l, multi_r = float(m // n), 1.0

    y0 = y_ref[0, 0, :][None, :]  # (1, M)
    y1 = y_ref[0, 1, :][None, :]
    y2 = y_ref[0, 2, :][None, :]
    n_tiles = n // tn

    def x_chunk(row):
        return (
            x_ref[0, 0, row][:, None],
            x_ref[0, 1, row][:, None],
            x_ref[0, 2, row][:, None],
        )

    def d_tile(row):
        x0, x1, x2 = x_chunk(row)
        d = (x0 - y0) ** 2
        d += (x1 - y1) ** 2
        d += (x2 - y2) ** 2  # (tn, M)
        return d

    def level_of(i):
        # level = -4^j for j = 7..-1, then 0 (emd.py round_body /
        # cu:55-59); 4^j as exp2(2j): Mosaic has no powf legalization
        return jnp.where(
            i == 9, 0.0,
            -jnp.exp2(2.0 * (jnp.float32(7) - i.astype(jnp.float32))),
        )

    def zeros_row():
        z = jnp.zeros((1, m), jnp.float32)
        return (z, z, z, z) if collect_u else (z,)

    def ab_tile(row, d, level, remain_r):
        """Passes A+B for one tile: write ratio_l, return the sumr_raw
        part (plus, when collecting U, the x-weighted column reductions
        sum_n w*ratio_l*x_c this round's U update needs)."""
        w = jnp.exp(level * d)
        suml = 1e-9 + jnp.sum(w * remain_r, axis=1, keepdims=True)
        rl_chunk = rl_col[row, :] / suml
        ratio_l_col[row, :] = rl_chunk
        wl = w * rl_chunk
        parts = (jnp.sum(wl, axis=0, keepdims=True),)
        if collect_u:
            x0, x1, x2 = x_chunk(row)
            parts += (
                jnp.sum(wl * x0, axis=0, keepdims=True),
                jnp.sum(wl * x1, axis=0, keepdims=True),
                jnp.sum(wl * x2, axis=0, keepdims=True),
            )
        return parts

    def c_tile(row, d, level_prev, ratio_r_prev):
        """Pass C of the previous round for one tile: accumulate match
        row-mass R, match-weighted coords V, deplete remain_l."""
        wr = jnp.exp(level_prev * d) * ratio_r_prev  # (tn, M)
        tvec = jnp.sum(wr, axis=1, keepdims=True)  # (tn, 1)
        rl = ratio_l_col[row, :]
        r_col[row, :] += rl * tvec
        rl_col[row, :] = jnp.maximum(0.0, rl_col[row, :] - rl * tvec)
        v0[row, :] += rl * jnp.sum(wr * y0, axis=1, keepdims=True)
        v1[row, :] += rl * jnp.sum(wr * y1, axis=1, keepdims=True)
        v2[row, :] += rl * jnp.sum(wr * y2, axis=1, keepdims=True)

    def post_ab(sumr_raw, remain_r):
        """Vector epilogue after a full A+B sweep (cu:99-137)."""
        sumr = sumr_raw * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        new_remain_r = jnp.maximum(0.0, remain_r - sumr)
        return ratio_r, new_remain_r, ratio_r * sumr_raw  # last: c_row incr

    # per-pair init (scratch persists across grid programs)
    rl_col[...] = jnp.full((n, 1), multi_l, jnp.float32)
    r_col[...] = jnp.zeros((n, 1), jnp.float32)
    v0[...] = jnp.zeros((n, 1), jnp.float32)
    v1[...] = jnp.zeros((n, 1), jnp.float32)
    v2[...] = jnp.zeros((n, 1), jnp.float32)
    remain_r0 = jnp.full((1, m), multi_r, jnp.float32)
    u_zero = jnp.zeros((1, m), jnp.float32)
    u_acc0 = (u_zero, u_zero, u_zero)

    def add_parts(acc, parts):
        return tuple(a + p for a, p in zip(acc, parts))

    def u_update(u_acc, ratio_r, sx):
        if not collect_u:
            return u_acc
        return tuple(u + ratio_r * s for u, s in zip(u_acc, sx))

    # round 0: A+B only
    lvl0 = level_of(jnp.int32(0))

    def sweep0(t, acc):
        row = pl.ds(t * tn, tn)
        return add_parts(acc, ab_tile(row, d_tile(row), lvl0, remain_r0))

    parts = jax.lax.fori_loop(0, n_tiles, sweep0, zeros_row())
    ratio_r, remain_r, c_incr = post_ab(parts[0], remain_r0)
    c_row = c_incr
    u_acc = u_update(u_acc0, ratio_r, parts[1:])

    # rounds 1..8: C(i-1) + A+B(i) fused, one d per tile
    def round_body(i, carry):
        remain_r, c_row, ratio_r_prev, u_acc = carry
        level_prev = level_of(i - 1)
        level = level_of(i)

        def sweep(t, acc):
            row = pl.ds(t * tn, tn)
            d = d_tile(row)
            c_tile(row, d, level_prev, ratio_r_prev)
            return add_parts(acc, ab_tile(row, d, level, remain_r))

        parts = jax.lax.fori_loop(0, n_tiles, sweep, zeros_row())
        ratio_r, new_remain_r, c_incr = post_ab(parts[0], remain_r)
        u_acc = u_update(u_acc, ratio_r, parts[1:])
        return new_remain_r, c_row + c_incr, ratio_r, u_acc

    remain_r, c_row, ratio_r, u_acc = jax.lax.fori_loop(
        1, 9, round_body, (remain_r, c_row, ratio_r, u_acc)
    )

    # standalone C sweep for round 8
    lvl8 = level_of(jnp.int32(8))

    def sweep_c8(t, _):
        row = pl.ds(t * tn, tn)
        c_tile(row, d_tile(row), lvl8, ratio_r)
        return 0

    jax.lax.fori_loop(0, n_tiles, sweep_c8, 0)

    # round 9: level = 0 -> w = 1 everywhere; A+B and C are vector math
    suml9 = 1e-9 + jnp.sum(remain_r)  # scalar: sum_m 1 * remain_r[m]
    ratio_l9 = rl_col[...] / suml9  # (N, 1)
    sumr_raw9 = jnp.sum(ratio_l9) * jnp.ones((1, m), jnp.float32)
    ratio_r9, _, c_incr9 = post_ab(sumr_raw9, remain_r)
    c_row = c_row + c_incr9
    t9 = jnp.sum(ratio_r9)  # scalar: per-row match mass this round
    r_col[...] += ratio_l9 * t9
    v0[...] += ratio_l9 * jnp.sum(ratio_r9 * y0)
    v1[...] += ratio_l9 * jnp.sum(ratio_r9 * y1)
    v2[...] += ratio_l9 * jnp.sum(ratio_r9 * y2)
    if collect_u:
        # sum_n ratio_l9[n] * x[n,c]: one cheap pass over the x columns
        def rl9_x(t, acc):
            row = pl.ds(t * tn, tn)
            x0, x1, x2 = x_chunk(row)
            rl = rl_col[row, :] / suml9  # == ratio_l9 chunk (rl_col untouched in round 9)
            return (acc[0] + jnp.sum(rl * x0), acc[1] + jnp.sum(rl * x1),
                    acc[2] + jnp.sum(rl * x2))

        sx9 = jax.lax.fori_loop(
            0, n_tiles, rl9_x,
            (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)),
        )
        u_acc = tuple(u + ratio_r9 * s for u, s in zip(u_acc, sx9))

    # cost = sum x^2 R + sum y^2 C - 2 sum_c x_c . V_c   (== match_cost)
    def cost_tile(t, acc):
        row = pl.ds(t * tn, tn)
        x0, x1, x2 = x_chunk(row)
        x_sq = x0 * x0 + x1 * x1 + x2 * x2
        acc += jnp.sum(x_sq * r_col[row, :])
        acc += -2.0 * jnp.sum(x0 * v0[row, :] + x1 * v1[row, :] + x2 * v2[row, :])
        return acc

    cost = jax.lax.fori_loop(0, n_tiles, cost_tile, jnp.float32(0.0))
    cost += jnp.sum((y0 * y0 + y1 * y1 + y2 * y2) * c_row)
    return cost, c_row, (u_acc if collect_u else None)


def _emd_block_kernel(x_ref, y_ref, out_ref,
                      rl_col, ratio_l_col, r_col, v0, v1, v2,
                      *, n: int, m: int, tn: int):
    """Eval-only block variant: (R, C) resident output, masked merge (see
    _run_auction for the algorithm)."""
    cost, _, _ = _run_auction(
        x_ref, y_ref, rl_col, ratio_l_col, r_col, v0, v1, v2, n, m, tn,
        collect_u=False,
    )
    i = pl.program_id(0)
    j = pl.program_id(1)
    r, c = out_ref.shape
    hit = (jax.lax.broadcasted_iota(jnp.int32, (r, c), 0) == i) & (
        jax.lax.broadcasted_iota(jnp.int32, (r, c), 1) == j
    )
    out_ref[...] = jnp.where(hit, cost, out_ref[...])


def _emd_pair_kernel(x_ref, y_ref,
                     r_ref, c_ref, v0_ref, v1_ref, v2_ref,
                     u0_ref, u1_ref, u2_ref,
                     rl_col, ratio_l_col, r_col, v0, v1, v2,
                     *, n: int, m: int, tn: int):
    """Differentiable 1:1 batched variant (grid (B,)): emits the O(N)
    auction residues — R, C, V, U — from which the cost AND both analytic
    gradients are pure elementwise XLA (matchcostgrad1/2, cu:309-388)."""
    _, c_row, u_acc = _run_auction(
        x_ref, y_ref, rl_col, ratio_l_col, r_col, v0, v1, v2, n, m, tn,
        collect_u=True,
    )
    r_ref[0] = r_col[...]
    v0_ref[0] = v0[...]
    v1_ref[0] = v1[...]
    v2_ref[0] = v2[...]
    c_ref[0] = c_row
    u0_ref[0], u1_ref[0], u2_ref[0] = u_acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def emd_block_pallas(rows, cols, interpret: bool = False):
    """(R, N, 3), (C, M, 3) -> (R, C) block of approx-EMD *costs* (divide
    by N for the per-point compute_emd normalization).  Same grid scheme
    as ``cd_block_pallas``: rows fetched once, cols streamed."""
    r, n, _ = rows.shape
    c, m, _ = cols.shape
    assert block_shapes_supported(n, m), (n, m)
    tn = _tn_for_emd(n)
    xt = jnp.transpose(rows.astype(jnp.float32), (0, 2, 1))  # (R, 3, N)
    yt = jnp.transpose(cols.astype(jnp.float32), (0, 2, 1))  # (C, 3, M)

    col_f32 = lambda: pltpu.VMEM((n, 1), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_emd_block_kernel, n=n, m=m, tn=tn),
        grid=(r, c),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, c), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), jnp.float32),
        scratch_shapes=[col_f32() for _ in range(6)],
        interpret=interpret,
    )(xt, yt)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def emd_pair_pallas(x, y, interpret: bool = False):
    """Differentiable-path forward: (B, N, 3), (B, M, 3) 1:1 pairs ->
    (cost (B,), R (B,N), C (B,M), V (B,N,3), U (B,M,3)).  The cost and
    both analytic gradients (2(R x - V), 2(C y - U)) are elementwise in
    the emitted residues, so the O(N*M) auction state never leaves the
    kernel."""
    b, n, _ = x.shape
    m = y.shape[1]
    assert block_shapes_supported(n, m), (n, m)
    # smaller tiles than the eval kernel: the U accumulators + residue
    # outputs add live buffers, and (512, 2048) tiles overflow the 16 MB
    # scoped-VMEM limit by ~0.5 MB with them
    tn = min(_tn_for_emd(n), 256)
    xt = jnp.transpose(x.astype(jnp.float32), (0, 2, 1))
    yt = jnp.transpose(y.astype(jnp.float32), (0, 2, 1))

    n_col = lambda: jax.ShapeDtypeStruct((b, n, 1), jnp.float32)
    m_row = lambda: jax.ShapeDtypeStruct((b, 1, m), jnp.float32)
    n_spec = pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_emd_pair_kernel, n=n, m=m, tn=tn),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[n_spec, m_spec, n_spec, n_spec, n_spec,
                   m_spec, m_spec, m_spec],
        out_shape=[n_col(), m_row(), n_col(), n_col(), n_col(),
                   m_row(), m_row(), m_row()],
        scratch_shapes=[pltpu.VMEM((n, 1), jnp.float32) for _ in range(6)],
        interpret=interpret,
    )(xt, yt)
    r = outs[0][..., 0]
    c = outs[1][:, 0, :]
    v = jnp.stack([o[..., 0] for o in outs[2:5]], axis=-1)
    u = jnp.stack([o[:, 0, :] for o in outs[5:8]], axis=-1)
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    # HIGHEST: metric matmul math must not run at the TPU's bf16-grade
    # default precision (CLAUDE.md; dense match_cost pins it too)
    hi = jax.lax.Precision.HIGHEST
    cost = (
        jnp.einsum("bn,bn->b", jnp.sum(xf * xf, -1), r, precision=hi)
        + jnp.einsum("bm,bm->b", jnp.sum(yf * yf, -1), c, precision=hi)
        - 2.0 * jnp.einsum("bnc,bnc->b", xf, v, precision=hi)
    )
    return cost, r, c, v, u
