"""COV / MMD / 1-NNA distributional metrics over pairwise CD/EMD matrices.

Parity with ``utils/metrics/cov_mmd_1nna.py`` (PointFlow metrics).  The
reference fills the (B1, B2) matrix one row at a time with an inner
batch loop (cov_mmd_1nna.py:24-51); here each row-block is a single jitted
call that broadcasts one cloud against a chunk — the CD inner loop is
MXU matmuls via metrics.chamfer, and rows are processed in blocks to
bound memory.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dusty_gan_tpu.metrics.chamfer import compute_cd
from dusty_gan_tpu.metrics.emd import compute_emd


def _pairwise_distance(pcs_1, pcs_2, batch_size: int, metrics: Tuple[str, ...],
                       verbose: bool = False):
    """(B1,N,3),(B2,N,3) -> {metric: (B1,B2) np.ndarray}."""
    b1, b2 = pcs_1.shape[0], pcs_2.shape[0]

    @jax.jit
    def row_cd(one, chunk):
        return compute_cd(jnp.broadcast_to(one, chunk.shape), chunk)

    @jax.jit
    def row_emd(one, chunk):
        return compute_emd(jnp.broadcast_to(one, chunk.shape), chunk)

    fns = {"cd": row_cd, "emd": row_emd}
    out = {m: np.zeros((b1, b2), np.float32) for m in metrics}
    symmetric = pcs_1 is pcs_2  # rr/gg matrices: compute the upper
    # triangle only and mirror (CD/EMD are symmetric; the reference
    # recomputes both halves, cov_mmd_1nna.py:33-51)
    for i in range(b1):
        one = pcs_1[i]
        j_start = (i // batch_size) * batch_size if symmetric else 0
        for j in range(j_start, b2, batch_size):
            chunk = pcs_2[j : j + batch_size]
            for m in metrics:
                row = np.asarray(fns[m](one, chunk))
                out[m][i, j : j + batch_size] = row
        if verbose and (i + 1) % 100 == 0:
            print(f"pairwise {metrics}: {i + 1}/{b1}")
    if symmetric:
        for m in metrics:
            lower = np.tril_indices(b1, -1)
            out[m][lower] = out[m].T[lower]
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
    verbose: bool = False,
) -> Dict[str, float]:
    """(cov_mmd_1nna.py:109-139)."""
    assert isinstance(metrics, tuple)
    m_rr = _pairwise_distance(pcs_ref, pcs_ref, batch_size, metrics, verbose)
    m_rg = _pairwise_distance(pcs_ref, pcs_gen, batch_size, metrics, verbose)
    m_gg = _pairwise_distance(pcs_gen, pcs_gen, batch_size, metrics, verbose)

    results: Dict[str, float] = {}
    for metric in metrics:
        for k, v in _compute_cov_mmd(m_rg[metric]).items():
            results[f"{k}-{metric}"] = v
        for k, v in _compute_nna(m_rr[metric], m_rg[metric], m_gg[metric]).items():
            results[f"1-nn-{k}-{metric}"] = v
    return results
