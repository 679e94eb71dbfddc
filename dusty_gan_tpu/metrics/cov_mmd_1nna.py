"""COV / MMD / 1-NNA distributional metrics over pairwise CD/EMD matrices.

Parity with ``utils/metrics/cov_mmd_1nna.py`` (PointFlow metrics).  The
reference fills the (B1, B2) matrix one row at a time with an inner batch
loop (cov_mmd_1nna.py:24-51) — ~50k kernel launches for the 5000^2
protocol.  Here the CD matrix is filled in (row_block x col_chunk)
BLOCKS: one dispatch covers the whole block (a 2-D Pallas grid on TPU, a
vmapped broadcast elsewhere), and when a ``mesh`` is passed the row axis
of each block is sharded over the data mesh with ``shard_map`` so every
chip fills its own slice of the matrix concurrently.
"""

from __future__ import annotations

import sys
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from dusty_gan_tpu.metrics import chamfer as _chamfer
from dusty_gan_tpu.metrics.chamfer import compute_cd
from dusty_gan_tpu.parallel.mesh import DATA_AXIS

# rows per device per dispatch: 16 rows x 512 cols = 8192 pairs/dispatch
# amortizes host dispatch (the pre-block path paid it per 512 pairs)
_ROW_BLOCK = 16

# max matrix blocks in flight before the oldest is fetched (0 = fetch
# synchronously after every dispatch); bounds queued input slices (each
# ~C*M*12 bytes) to ~window * 13 MB at protocol scale
DISPATCH_WINDOW = 16


def _cd_block_xla(rows, cols):
    """(R,N,3),(C,M,3) -> (R,C) CD block without Pallas (CPU tests, or
    kernel-compile fallback).  Sequential over rows (lax.map, not vmap):
    each row already materializes an O(C * N * chunk) distance tile
    through _nn_chunked; vmapping rows multiplies that by R."""

    def one(row):
        return compute_cd(jnp.broadcast_to(row, cols.shape), cols)

    return jax.lax.map(one, rows)


def _make_block_impl(fn, mesh):
    """jit a (rows, cols) -> (R, C) block fn, sharding the row axis over
    the data mesh when one is given."""
    if mesh is not None and mesh.devices.size > 1:
        return jax.jit(
            jax.shard_map(
                fn, mesh=mesh, in_specs=(P(DATA_AXIS), P()),
                out_specs=P(DATA_AXIS), check_vma=False,
            )
        )
    return jax.jit(fn)


def _make_cd_block_impl(use_pallas: bool, mesh):
    if use_pallas:
        from dusty_gan_tpu.metrics.chamfer_pallas import cd_block_pallas

        return _make_block_impl(cd_block_pallas, mesh)
    return _make_block_impl(_cd_block_xla, mesh)


def _pad_rows(p, target: int):
    b = p.shape[0]
    if b == target:
        return jnp.asarray(p)
    pad = jnp.zeros((target - b,) + tuple(p.shape[1:]), jnp.float32)
    return jnp.concatenate([jnp.asarray(p, jnp.float32), pad], axis=0)


def _combine_process_partials(partial: np.ndarray) -> np.ndarray:
    """Sum the disjoint per-process partial matrices (eval pod mode).

    This is the ONE cross-host collective of a process-sharded pairwise
    matrix; it runs in lockstep (every rank calls it exactly once per
    matrix, in the same order), so it cannot hit the communicator-id
    ordering race that forbids host-level collectives next to the async
    train loop (see cli/train.py stop_agreed)."""
    from dusty_gan_tpu.parallel.mesh import pod_allgather

    return pod_allgather(jnp.asarray(partial)).sum(axis=0)


def _blocked_matrix(pcs_1, pcs_2, R: int, C: int, impl, symmetric: bool,
                    verbose: bool, label: str,
                    process_shard: bool = False) -> np.ndarray:
    """Fill the (B1, B2) matrix in (R, C) blocks through ``impl(rows,
    cols) -> (R, C)``.  Symmetric inputs compute only blocks touching the
    upper triangle and mirror the rest.

    ``process_shard``: stripe block-rows round-robin across
    ``jax.process_count()`` processes (each computing on its own local
    mesh) and sum the disjoint partials at the end — near-linear pod
    speedup of the dominant eval cost.  The reference's analog is
    single-GPU (evaluate_synthesis.py:168-187)."""
    b1, b2 = pcs_1.shape[0], pcs_2.shape[0]
    b1p, b2p = -(-b1 // R) * R, -(-b2 // C) * C
    rows_all = _pad_rows(pcs_1, b1p)
    cols_all = _pad_rows(pcs_2, b2p)
    pid = jax.process_index() if process_shard else 0
    n_proc = jax.process_count() if process_shard else 1

    # pipelined dispatch: keep a window of blocks in flight and fetch the
    # oldest as new ones enqueue — the device computes block k+1 while
    # the host fetches block k (through a remote-TPU tunnel the
    # synchronous version serializes a round-trip per block).
    out = np.zeros((b1p, b2p), np.float32)
    pending = []
    window = DISPATCH_WINDOW

    def drain(n_keep: int):
        while len(pending) > n_keep:
            i0, j0, blk = pending.pop(0)
            out[i0 : i0 + R, j0 : j0 + C] = np.asarray(blk)

    for bi, i in enumerate(range(0, b1p, R)):
        if bi % n_proc != pid:
            continue  # another process fills this block-row
        rows = jax.lax.slice_in_dim(rows_all, i, i + R)
        for j in range(0, b2p, C):
            if symmetric and j + C <= i:
                continue  # entirely below the diagonal: mirrored later
            cols = jax.lax.slice_in_dim(cols_all, j, j + C)
            pending.append((i, j, impl(rows, cols)))
            drain(window)
        if verbose:
            print(f"pairwise {label}: dispatched {min(i + R, b1)}/{b1}")
    drain(0)
    if n_proc > 1:
        out = _combine_process_partials(out)
    out = out[:b1, :b2]
    if symmetric:
        lower = np.tril_indices(b1, -1)
        out[lower] = out.T[lower]
    return out


def _block_dims(b1: int, b2: int, col_chunk: int, n_dev: int):
    """(rows, cols) per dispatch: up to _ROW_BLOCK rows per device and
    ``col_chunk`` columns, clamped to the matrix so small inputs (e.g.
    the 8-sample training-validation suite) don't pad up to protocol
    scale — the XLA fallback materializes O(R * C * N * chunk) distance
    tiles and unclamped padding OOMed a 64 GB host on an 8x8 matrix."""
    rows = n_dev * max(1, min(_ROW_BLOCK, -(-b1 // n_dev)))
    cols = max(1, min(int(col_chunk), b2))
    return rows, cols


def _pairwise_cd_blocked(pcs_1, pcs_2, col_chunk: int, mesh=None,
                         verbose: bool = False,
                         process_shard: bool = False) -> np.ndarray:
    """Block-dispatched (B1,B2) symmetric-CD matrix; rows sharded over the
    mesh when given (pass a LOCAL mesh with process_shard=True)."""
    n_dev = mesh.devices.size if mesh is not None else 1
    R, C = _block_dims(pcs_1.shape[0], pcs_2.shape[0], col_chunk, n_dev)
    symmetric = pcs_1 is pcs_2

    use_pallas = _chamfer._use_pallas()
    _chamfer.LAST_DISPATCH = "pallas" if use_pallas else "xla"
    if use_pallas:
        try:
            return _blocked_matrix(
                pcs_1, pcs_2, R, C, _make_cd_block_impl(True, mesh),
                symmetric, verbose, "cd", process_shard,
            )
        except Exception as e:
            print(
                f"WARNING: pallas pairwise-CD block kernel failed "
                f"({type(e).__name__}: {e}); falling back to the XLA block "
                f"path", file=sys.stderr, flush=True,
            )
            _chamfer.LAST_DISPATCH = "xla"
    return _blocked_matrix(
        pcs_1, pcs_2, R, C, _make_cd_block_impl(False, mesh),
        symmetric, verbose, "cd", process_shard,
    )


def _pairwise_emd_rowwise(pcs_1, pcs_2, batch_size: int,
                          verbose: bool,
                          process_shard: bool = False) -> np.ndarray:
    """Dense-XLA fallback: one row of the matrix per dispatch (the (B, N,
    M) match state of the dense path bounds the batch).  Pins the DENSE
    implementation explicitly — this loop runs precisely when the Pallas
    kernel is unavailable or failed, so it must not re-enter the
    dispatching compute_emd."""
    from dusty_gan_tpu.metrics.emd import earth_mover_distance_dense

    b1, b2 = pcs_1.shape[0], pcs_2.shape[0]
    n_pts = float(pcs_1.shape[1])

    @jax.jit
    def row_emd(one, chunk):
        return earth_mover_distance_dense(
            jnp.broadcast_to(one, chunk.shape), chunk
        ) / n_pts  # compute_emd normalization

    m = np.zeros((b1, b2), np.float32)
    symmetric = pcs_1 is pcs_2
    pid = jax.process_index() if process_shard else 0
    n_proc = jax.process_count() if process_shard else 1
    for i in range(b1):
        if i % n_proc != pid:
            continue  # another process fills this row (eval pod mode)
        one = pcs_1[i]
        j_start = (i // batch_size) * batch_size if symmetric else 0
        for j in range(j_start, b2, batch_size):
            chunk = pcs_2[j : j + batch_size]
            m[i, j : j + batch_size] = np.asarray(row_emd(one, chunk))
        if verbose and (i + 1) % 100 == 0:
            print(f"pairwise emd: {i + 1}/{b1}")
    if n_proc > 1:
        m = _combine_process_partials(m)
    if symmetric:
        lower = np.tril_indices(b1, -1)
        m[lower] = m.T[lower]
    return m


def _pairwise_emd(pcs_1, pcs_2, batch_size: int, mesh=None,
                  verbose: bool = False,
                  process_shard: bool = False) -> np.ndarray:
    """Pallas streaming-auction blocks on TPU (metrics/emd_pallas.py, rows
    mesh-sharded); dense-XLA row loop elsewhere."""
    from dusty_gan_tpu.metrics.emd_pallas import (
        block_shapes_supported, emd_block_pallas,
    )

    n, m = pcs_1.shape[1], pcs_2.shape[1]
    # reference compute_emd asserts N_1 == N_2 (cov_mmd_1nna.py:11-16); the
    # /n normalization below is only the reference semantics for n == m
    assert n == m, f"pairwise EMD needs equal point counts, got {n} != {m}"
    if _chamfer._use_pallas() and block_shapes_supported(n, m):
        n_dev = mesh.devices.size if mesh is not None else 1
        R, C = _block_dims(pcs_1.shape[0], pcs_2.shape[0], batch_size, n_dev)

        def block(rows, cols):
            return emd_block_pallas(rows, cols) / float(n)  # compute_emd norm

        impl = _make_block_impl(block, mesh)
        try:
            return _blocked_matrix(
                pcs_1, pcs_2, R, C, impl, pcs_1 is pcs_2, verbose, "emd",
                process_shard,
            )
        except Exception as e:
            print(
                f"WARNING: pallas EMD block kernel failed "
                f"({type(e).__name__}: {e}); falling back to the dense XLA "
                f"row loop", file=sys.stderr, flush=True,
            )
    return _pairwise_emd_rowwise(pcs_1, pcs_2, batch_size, verbose,
                                 process_shard)


def _pairwise_distance(pcs_1, pcs_2, batch_size: int, metrics: Tuple[str, ...],
                       verbose: bool = False, mesh=None,
                       process_shard: bool = False):
    """(B1,N,3),(B2,N,3) -> {metric: (B1,B2) np.ndarray}."""
    out = {}
    if "cd" in metrics:
        out["cd"] = _pairwise_cd_blocked(pcs_1, pcs_2, batch_size, mesh,
                                         verbose, process_shard)
    if "emd" in metrics:
        out["emd"] = _pairwise_emd(pcs_1, pcs_2, batch_size, mesh, verbose,
                                   process_shard)
    assert set(out) == set(metrics), (set(out), metrics)
    return out


def _compute_cov_mmd(m_rg: np.ndarray) -> Dict[str, float]:
    """(cov_mmd_1nna.py:54-66): rows = reference, cols = generated."""
    mmd_gen = m_rg.min(axis=0)
    min_idx_gen = m_rg.argmin(axis=0)
    mmd_ref = m_rg.min(axis=1)
    return {
        "mmd": float(mmd_ref.mean()),
        "mmd-sample": float(mmd_gen.mean()),
        "cov": float(len(np.unique(min_idx_gen))) / float(m_rg.shape[0]),
    }


def _compute_nna(m_rr, m_rg, m_gg, k: int = 1, sqrt: bool = False) -> Dict[str, float]:
    """Leave-one-out 1-NN two-sample classification (cov_mmd_1nna.py:68-106)."""
    n_ref, n_gen = m_rg.shape
    label = np.concatenate([np.ones(n_ref), np.zeros(n_gen)])
    m = np.concatenate(
        [
            np.concatenate([m_rr, m_rg], axis=1),
            np.concatenate([m_rg.T, m_gg], axis=1),
        ],
        axis=0,
    )
    if sqrt:
        m = np.sqrt(np.abs(m))
    np.fill_diagonal(m, np.inf)
    idx = np.argsort(m, axis=0)[:k]  # k smallest per column
    count = label[idx].sum(axis=0)
    pred = (count / k >= 0.5).astype(np.float64)

    s = {
        "tp": float((pred * label).sum()),
        "fp": float((pred * (1 - label)).sum()),
        "fn": float(((1 - pred) * label).sum()),
        "tn": float(((1 - pred) * (1 - label)).sum()),
    }
    s.update(
        {
            "precision": s["tp"] / (s["tp"] + s["fp"] + 1e-10),
            "recall": s["tp"] / (s["tp"] + s["fn"] + 1e-10),
            "accuracy_t": s["tp"] / (s["tp"] + s["fn"] + 1e-10),
            "accuracy_f": s["tn"] / (s["tn"] + s["fp"] + 1e-10),
            "accuracy": float((pred == label).mean()),
        }
    )
    return s


def compute_cov_mmd_1nna(
    pcs_gen, pcs_ref, batch_size: int, metrics: Tuple[str, ...] = ("cd",),
    verbose: bool = False, mesh=None, process_shard: bool = False,
) -> Dict[str, float]:
    """(cov_mmd_1nna.py:109-139).  ``mesh``: shard the pairwise-matrix row
    axis over the data mesh (the reference runs this stage on one GPU).
    ``process_shard``: additionally stripe block-rows across
    ``jax.process_count()`` processes — pass a host-LOCAL mesh then, and
    call from ALL processes in lockstep (eval pod mode)."""
    assert isinstance(metrics, tuple)
    m_rr = _pairwise_distance(pcs_ref, pcs_ref, batch_size, metrics, verbose,
                              mesh, process_shard)
    m_rg = _pairwise_distance(pcs_ref, pcs_gen, batch_size, metrics, verbose,
                              mesh, process_shard)
    m_gg = _pairwise_distance(pcs_gen, pcs_gen, batch_size, metrics, verbose,
                              mesh, process_shard)

    results: Dict[str, float] = {}
    for metric in metrics:
        for k, v in _compute_cov_mmd(m_rg[metric]).items():
            results[f"{k}-{metric}"] = v
        for k, v in _compute_nna(m_rr[metric], m_rg[metric], m_gg[metric]).items():
            results[f"1-nn-{k}-{metric}"] = v
    return results
