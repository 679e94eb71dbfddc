"""Device-mesh data parallelism.

The reference's entire distributed stack — one process per GPU via
``mp.spawn`` (train.py:186), NCCL process groups (train.py:44-50), DDP
gradient buckets with ``no_sync`` accumulation (trainers/dcgan_amp.py:68-69,
utils/context_manager.py:21-35), ``DistributedSampler`` input sharding and
explicit ``dist.all_reduce`` of logging scalars (dcgan_amp.py:319-323) —
collapses on TPU to: a 1-D ``Mesh('data')``, batch inputs sharded over it,
parameters replicated, and XLA inserting ICI all-reduces inside the single
compiled train step.  Multi-host runs only add
``jax.distributed.initialize()`` plus per-host batch slicing
(``local_batch_slice``); multi-slice runs get DCN collectives from XLA with
no code change.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def create_local_mesh(axis: str = DATA_AXIS) -> Mesh:
    """Mesh over THIS process's devices only.  Computations on it issue no
    cross-host collectives, so a single rank can run them alone — the mesh
    for rank-local work (in-training validation) in multi-process runs,
    the analog of the reference validating on rank 0's own GPU
    (train.py:153-157)."""
    return Mesh(np.asarray(jax.local_devices()), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host batch pytree on the mesh, sharded on the leading axis.

    Single-process: ``device_put`` of the full batch onto the sharding.
    Multi-process (pods): each host holds only its ``local_batch_slice``
    of the global batch (the Loader yields per-host batches), so the
    global array is assembled from process-local shards — the JAX analog
    of DistributedSampler + DDP input scatter (trainers/dcgan_amp.py:87).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), tree
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(tree, multiple: int):
    """Edge-pad every leaf's leading (batch) axis up to a multiple, so an
    uneven final eval batch can still shard evenly over the mesh; returns
    (padded_tree, original_batch) — trim outputs back to original_batch.

    Replaces what the reference gets implicitly from nn.DataParallel's
    uneven scatter (evaluate_reconstruction.py:11,40).
    """
    sizes = {x.shape[0] for x in jax.tree.leaves(tree)}
    assert len(sizes) == 1, f"ragged leading axes: {sizes}"
    n = sizes.pop()
    r = (-n) % multiple
    if r == 0:
        return tree, n
    pad = lambda x: np.pad(np.asarray(x), [(0, r)] + [(0, 0)] * (x.ndim - 1),
                           mode="edge")
    return jax.tree.map(pad, tree), n


def shard_eval_inputs(mesh: Mesh, batch_tree, replicated_tree=None):
    """Eval-CLI fan-out: pad + shard a batch over the mesh, optionally
    replicating a params/noise pytree. Returns (sharded_batch, orig_n)
    or ((sharded_batch, orig_n), replicated) when replicated_tree given."""
    padded, n = pad_to_multiple(batch_tree, mesh.devices.size)
    sharded = shard_batch(mesh, padded)
    if replicated_tree is None:
        return sharded, n
    rep = jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), replicated_tree)
    return (sharded, n), rep


def init_distributed():
    """``jax.distributed.initialize`` with the environment conventions
    shared by the train and eval CLIs: on TPU pods the cluster is
    auto-detected; elsewhere (incl. the CPU multi-process test rig) pass
    the rendezvous explicitly via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.  Replaces the reference's
    mp.spawn + NCCL file-store rendezvous (train.py:37-50)."""
    import os

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # CPU backend needs an explicit cross-process collectives impl
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kw = {}
    trio = ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
    if any(os.environ.get(k) for k in trio):
        missing = [k for k in trio if not os.environ.get(k)]
        if missing:
            raise SystemExit(
                "multihost with an explicit rendezvous needs all three of "
                f"{', '.join(trio)}; missing: {', '.join(missing)}"
            )
        kw = dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kw)
    if jax.process_count() > 1:
        # establish the tiny barrier communicator NOW, while every rank is
        # at the same program point: context creation has a 30s rendezvous
        # timeout (gloo CPU rig), and later per-rank work (compiles, uneven
        # batch stripes) can skew ranks far past it
        from jax.experimental import multihost_utils

        multihost_utils.process_allgather(np.zeros((1,), np.float32))


def pod_allgather(x) -> np.ndarray:
    """``process_allgather`` for pod-eval merges, preceded by a fixed-shape
    barrier allgather: the barrier rides the communicator established in
    ``init_distributed`` (same shape/dtype -> cached executable), so ranks
    enter the data allgather's new-context rendezvous synchronized instead
    of arbitrarily skewed (the 30s gloo GetKeyValue timeout otherwise
    fires when one rank is still compiling its last work item)."""
    from jax.experimental import multihost_utils

    multihost_utils.process_allgather(np.zeros((1,), np.float32))
    return np.asarray(multihost_utils.process_allgather(x))


def local_batch_slice(global_batch: int, process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> slice:
    """This host's slice of the global batch (replaces DistributedSampler,
    trainers/dcgan_amp.py:87)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    assert global_batch % pc == 0, (global_batch, pc)
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)
