"""Device-resident dataset cache: ship indices, not batches.

TPU-first redesign of the training input path. The reference (and the
default ``Loader`` path here) ships every batch host->device each step —
`trainers/dcgan_amp.py:81-97` hides the copy behind pinned-memory
DataLoader workers, but the bytes still cross the wire: at 64x256/f32 a
batch-32 depth tensor is 2 MB/step, which bounds end-to-end training at
host->device bandwidth, not device speed (through the dev tunnel that is
~780 scans/s vs the 4,486 scans/s compiled step; on production hosts it
still burns PCIe/DMA bandwidth and host CPU).

A resized range-image dataset is small: KITTI's 20k scans at 64x256/f32
depth are ~1.3 GB (5k scans: 327 MB) — it fits in one v5e's 16 GB HBM
outright. So: upload the WHOLE resized dataset once (replicated over the
data mesh), and per step transfer only the 32 int32 batch indices; the
batch materializes on-device as a gather, sharded over the mesh like the
host path's output. HBM cost doubles with ``dataset.flip`` (both
variants are stored; a flipped draw is just an index offset of +N).

Bit-exactness: indices come from ``Loader.index_stream`` (the same
permutations/epoch cycling/resume fast-forward ``iter_from`` uses) and
flip bits from ``Loader.flip_bits`` (a replay of the per-item RNG
streams), and the cached tensors are the same resized arrays ``get``
serves — so the batch stream equals the host path bit for bit, and a run
can resume across a switch of ``cache_device`` in either direction
(tests/test_device_cache.py).

Multi-host: every process uploads the full dataset to its local devices
(the global array is replicated), and contributes its local index slice;
the gather itself needs no collectives.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dusty_gan_tpu.parallel.mesh import batch_sharding, replicated, shard_batch


def _put_replicated(mesh, x: np.ndarray) -> jax.Array:
    sh = replicated(mesh)
    if jax.process_count() > 1:
        # fully-replicated: each process's addressable shard IS the full
        # array, which every process holds identically
        return jax.make_array_from_process_local_data(sh, x)
    return jax.device_put(x, sh)


class DeviceDatasetCache:
    """Upload a dataset's per-key tensors to the mesh once; serve sharded
    batches by index gather."""

    def __init__(self, loader, mesh, keys: Sequence[str] = ("depth",),
                 verbose: bool = False):
        self.loader = loader
        self.mesh = mesh
        self.keys = tuple(keys)
        ds = loader.dataset
        self.n = len(ds)
        self.flip = bool(getattr(ds, "flip", False))

        # host staging: (N, ...) per key, plus the flipped variants as a
        # second block [N:2N) when the dataset flips — one np.empty per
        # key, filled row-wise (memmap-friendly, no transient stacking)
        first = ds.item(0, flip=False, keys=self.keys)
        n_rows = self.n * (2 if self.flip else 1)
        data = {}
        for k in self.keys:
            data[k] = np.empty((n_rows,) + first[k].shape, dtype=np.float32)
        for i in range(self.n):
            item = ds.item(i, flip=False, keys=self.keys)
            for k in self.keys:
                data[k][i] = item[k]
        if self.flip:
            for i in range(self.n):
                item = ds.item(i, flip=True, keys=self.keys)
                for k in self.keys:
                    data[k][self.n + i] = item[k]

        self.nbytes = sum(v.nbytes for v in data.values())
        self._data = {k: _put_replicated(mesh, v) for k, v in data.items()}
        del data

        out_sh = {k: batch_sharding(mesh) for k in self.keys}
        self._gather = jax.jit(
            lambda d, idx: {k: d[k][idx] for k in self.keys},
            out_shardings=out_sh,
        )
        if verbose and jax.process_index() == 0:
            print(
                f"device cache: {self.n} items x {self.keys} "
                f"({self.nbytes / 1e6:.0f} MB replicated on "
                f"{mesh.devices.size} device(s)"
                + (", both flip variants)" if self.flip else ")")
            )

    def global_indices(self, epoch: int, idx_local: np.ndarray) -> np.ndarray:
        """LOCAL batch indices -> row indices into the device arrays
        (flipped draws resolve to the second block, [N, 2N))."""
        gidx = np.asarray(idx_local, dtype=np.int32)
        if self.flip:
            bits = self.loader.flip_bits(epoch, idx_local)
            gidx = gidx + np.int32(self.n) * bits.astype(np.int32)
        return gidx

    def global_batch(self, epoch: int, idx_local: np.ndarray) -> Dict[str, jax.Array]:
        """LOCAL batch indices (this process's slice, from
        ``Loader.index_stream``) -> global sharded device batch."""
        gidx = self.global_indices(epoch, idx_local)
        idx = shard_batch(self.mesh, {"i": gidx})["i"]
        return self._gather(self._data, idx)
