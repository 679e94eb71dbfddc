"""Datasets: KITTI Odometry and Sparse MPO range-image collections.

Parity with ``datasets/kitti.py`` / ``datasets/mpo.py``: pre-projected
(H0, W0, 4) .npy scans -> {depth [0,1], mask, xyz (unit space)} at the
model resolution via NEAREST subsampling, with the same split maps and the
same value pipeline (depth = ||xyz||, [min,max] gate, invalid zeroed,
optional horizontal flip at full resolution before resize).

TPU-first difference: an optional one-time resized cache — the reference
re-resizes 64x2048 -> 64x256 on EVERY epoch in its DataLoader workers
(datasets/kitti.py:70-77); here the resized arrays (plus deterministic
flipped variants) are read-only memmaps from a directory of per-key .npy
files, so per-step host work is a slice + collate and resident memory is
only the pages a run touches (important with few host cores feeding a
fast chip, and at 43k+-scan dataset scale).
"""

from __future__ import annotations

import hashlib
import os
import os.path as osp
from glob import glob
from typing import Dict, Optional, Sequence

import numpy as np

KITTI_SPLIT = {
    "train": [0, 1, 2, 3, 4, 5, 6, 7, 9, 10],
    "val": [8],
    "test": [11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21],
    "custom": [16],
}

MPO_SPLIT = {
    "train": [0, 1, 2, 3, 4, 5, 6],
    "val": [7],
    "test": [8, 9, 10],
}


def nearest_resize_indices(in_size: int, out_size: int) -> np.ndarray:
    """torch F.interpolate(mode="nearest") index map: src = floor(dst*in/out)
    — the tensor path taken by the reference's TF.resize(..., NEAREST) on
    to_tensor outputs (datasets/kitti.py:70-77)."""
    return np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)


class RangeImageDataset:
    """Base: list of .npy scan paths + value pipeline."""

    def __init__(
        self,
        root: str,
        split: str,
        shape=(64, 256),
        min_depth: float = 0.9,
        max_depth: float = 120.0,
        flip: bool = False,
        modality: Sequence[str] = ("depth",),
        cache_dir: Optional[str] = None,
        seed: int = 0,
    ):
        self.root = root
        self.split = split
        self.seed = int(seed)
        self.shape = tuple(shape)
        self.min_depth = float(min_depth)
        self.max_depth = float(max_depth)
        self.flip = flip
        assert "depth" in modality, '"depth" is required'
        self.modality = tuple(modality)
        self.datalist = self._load_datalist()
        self._cache = None
        self._flip_cache = None
        if cache_dir is not None and len(self.datalist) > 0:
            self._build_cache(cache_dir)

    # subclasses provide the file list
    def _load_datalist(self):
        raise NotImplementedError

    def __len__(self):
        return len(self.datalist)

    # ------------------------------------------------------------------
    def _load_raw(self, index: int) -> np.ndarray:
        return np.load(self.datalist[index]).astype(np.float32)

    def _process(self, points: np.ndarray, flip: bool) -> Dict[str, np.ndarray]:
        """Full-res value pipeline + flip + NEAREST subsample. NHWC-style
        (H, W, C) / (H, W) arrays."""
        if self.modality == ("depth",):
            # native C++ fast path (bit-equivalent; tests/test_native.py)
            from dusty_gan_tpu.data import native

            item = native.preprocess_item(
                points, self.min_depth, self.max_depth, flip, self.shape
            )
            if item is not None:
                return item
        out = {"xyz": points[..., :3]}
        if "reflectance" in self.modality:
            out["reflectance"] = points[..., 3:4]
        depth = np.linalg.norm(out["xyz"], ord=2, axis=2)
        mask = (depth > 0.0) & (depth > self.min_depth) & (depth < self.max_depth)
        depth = (depth - self.min_depth) / (self.max_depth - self.min_depth)
        out["depth"] = depth
        out["mask"] = mask.astype(np.float32)
        out["xyz"] = out["xyz"] / self.max_depth
        for key in out:
            out[key] = np.where(
                mask[..., None] if out[key].ndim == 3 else mask, out[key], 0
            ).astype(np.float32)

        h0, w0 = out["depth"].shape
        if flip:
            out = {k: np.ascontiguousarray(v[:, ::-1]) for k, v in out.items()}
        hi = nearest_resize_indices(h0, self.shape[0])
        wi = nearest_resize_indices(w0, self.shape[1])
        out = {k: v[hi][:, wi] for k, v in out.items()}
        # single-channel images get a trailing channel axis
        for k in ("depth", "mask"):
            out[k] = out[k][..., None]
        return out

    def get(self, index: int,
            rng: Optional[np.random.Generator] = None,
            keys: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
        """Fetch one item; ``rng`` drives the h-flip draw (same Bernoulli(.5)
        as datasets/kitti.py:70-77, but from an explicit stream — no global
        np.random anywhere in the data path, so batch streams are
        bit-reproducible across resume). When None, a per-(seed, index)
        stream is derived (deterministic standalone access).

        ``keys`` restricts the returned dict; restricting to keys the flip
        cache covers lets flipped draws stay on the zero-copy cache path
        (flips at FULL resolution before the nearest subsample cannot be
        derived from the cached unflipped image, so without a flip cache
        they reprocess the raw scan — ~6 ms/item vs ~1 µs)."""
        if rng is None:
            rng = np.random.default_rng([self.seed, index])
        do_flip = self.flip and rng.random() > 0.5
        return self.item(index, flip=do_flip, keys=keys)

    def item(self, index: int, flip: bool = False,
             keys: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
        """Fetch one item with an EXPLICIT flip bit (``get`` draws the bit
        from an RNG stream; the device-resident cache replays that stream
        on the host and indexes variants directly — data/device_cache.py)."""
        if self._cache is not None:
            if not flip:
                src = self._cache
                return {k: src[k][index]
                        for k in (src if keys is None else keys)}
            fc = self._flip_cache
            if fc is not None and keys is not None and set(keys) <= set(fc):
                return {k: fc[k][index] for k in keys}
        item = self._process(self._load_raw(index), flip)
        return item if keys is None else {k: item[k] for k in keys}

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return self.get(index)

    # ------------------------------------------------------------------
    def _cache_key(self) -> str:
        sig = "|".join(
            [
                self.__class__.__name__,
                self.split,
                str(self.shape),
                str(self.min_depth),
                str(self.max_depth),
                ",".join(self.modality),
                str(len(self.datalist)),
            ]
            + (["flip"] if self.flip else [])
        )
        return hashlib.sha1(sig.encode()).hexdigest()[:16]

    # flip-cache keys: what the training step consumes (depth+mask; the
    # trainer derives points on-device from depth, so xyz is never needed
    # for flipped draws — eval phases construct datasets with flip=False)
    FLIP_CACHE_KEYS = ("depth", "mask")

    def _build_cache(self, cache_dir: str):
        """Resized cache as a DIRECTORY of memmapped .npy files (one per
        key): the build writes each processed scan straight into a
        preallocated memmap (O(1) host memory at any dataset size) and
        loading memmaps read-only, so resident memory is only the pages
        the run actually touches — a 43k-scan KITTI cache is ~14 GB fully
        materialized but a depth-only training run touches ~2.7 GB."""
        os.makedirs(cache_dir, exist_ok=True)
        path = osp.join(cache_dir, f"resized_{self._cache_key()}")
        keys = ["depth", "mask", "xyz"] + (
            ["reflectance"] if "reflectance" in self.modality else []
        )
        flip_keys = list(self.FLIP_CACHE_KEYS) if self.flip else []
        if not osp.isdir(path):
            # pre-round-3 caches were single resized_<key>.npz files with a
            # differently-composed key; they are orphaned by the directory
            # format and only waste disk — say so rather than silently
            # rebuilding next to them
            legacy = glob(osp.join(cache_dir, "resized_*.npz"))
            if legacy:
                print(
                    f"note: {len(legacy)} legacy resized_*.npz cache file(s) "
                    f"under {cache_dir} are superseded by the directory cache "
                    "format and can be deleted"
                )
            self._write_cache_dir(path, keys, flip_keys)
        self._cache = {
            k: np.load(osp.join(path, k + ".npy"), mmap_mode="r")
            for k in keys
        }
        flip_loaded = {
            k: np.load(osp.join(path, "flip_" + k + ".npy"), mmap_mode="r")
            for k in flip_keys
            if osp.exists(osp.join(path, "flip_" + k + ".npy"))
        }
        self._flip_cache = flip_loaded or None

    def _write_cache_dir(self, path: str, keys, flip_keys):
        import shutil
        import uuid
        from concurrent.futures import ThreadPoolExecutor
        from numpy.lib.format import open_memmap

        n = len(self.datalist)
        # per-BUILDER tmp dir + atomic rename: concurrent builders (e.g.
        # multi-host ranks sharing a dataset root) each build their own
        # uniquely-named tree and the first rename wins; content is
        # deterministic, so losers just discard theirs.  The name carries
        # a uuid, not just the pid — ranks on different hosts (separate
        # pid namespaces) can share a network-FS cache dir, and a pid
        # collision there would interleave two builders into one tree
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        os.makedirs(tmp, exist_ok=False)
        try:
            first = self._process(self._load_raw(0), flip=False)
            mm = {
                k: open_memmap(osp.join(tmp, k + ".npy"), mode="w+",
                               dtype=first[k].dtype,
                               shape=(n,) + first[k].shape)
                for k in keys
            }
            for k in flip_keys:
                mm["flip_" + k] = open_memmap(
                    osp.join(tmp, "flip_" + k + ".npy"), mode="w+",
                    dtype=first[k].dtype, shape=(n,) + first[k].shape,
                )

            def work(i: int):
                raw = self._load_raw(i)
                item = self._process(raw, flip=False)
                for k in keys:
                    mm[k][i] = item[k]
                if flip_keys:
                    f = self._process(raw, flip=True)
                    for k in flip_keys:
                        mm["flip_" + k][i] = f[k]

            # np.load and the ctypes/numpy pipeline release the GIL, so a
            # thread pool scales the one-time build with host cores (rows
            # are disjoint, so concurrent memmap writes don't race)
            with ThreadPoolExecutor(
                max_workers=min(os.cpu_count() or 1, 16)
            ) as ex:
                list(ex.map(work, range(n)))
            for v in mm.values():
                v.flush()
            del mm
            try:
                os.rename(tmp, path)
            except OSError:
                if not osp.isdir(path):
                    raise  # rename failed for a real reason, not a race
        finally:
            if osp.isdir(tmp):
                shutil.rmtree(tmp)  # build failed or another builder won

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(n={len(self)}, root={self.root}, "
            f"split={self.split}, shape={self.shape})"
        )


class KITTIOdometry(RangeImageDataset):
    """datasets/kitti.py:20-98; sequences 00-10 train (minus 08=val),
    11-21 test."""

    def _load_datalist(self):
        datalist = []
        for subset in KITTI_SPLIT[self.split]:
            subset_dir = osp.join(self.root, "sequences", str(subset).zfill(2))
            datalist += sorted(glob(osp.join(subset_dir, "velodyne/*")))
        return datalist


class SparseMPO(RangeImageDataset):
    """datasets/mpo.py:19-98; file glob ``*_set{NNN}_*.npy``."""

    def _load_datalist(self):
        datalist = []
        for subset in MPO_SPLIT[self.split]:
            pattern = "*_set{}_*.npy".format(str(subset).zfill(3))
            datalist += sorted(glob(osp.join(self.root, "Data", pattern)))
        return datalist


def define_dataset(cfg, phase: str = "train", modality=("depth",), cache_dir=None):
    """datasets/__init__.py:4-27 dispatch; accepts dict or attr configs."""
    get = (lambda k: cfg[k]) if isinstance(cfg, dict) else (lambda k: getattr(cfg, k))
    name = get("name")
    cls = {"kitti_odometry": KITTIOdometry, "sparse_mpo": SparseMPO}.get(name)
    if cls is None:
        raise NotImplementedError(name)
    return cls(
        root=get("root"),
        split=phase,
        shape=tuple(get("shape")),
        min_depth=get("min_depth"),
        max_depth=get("max_depth"),
        flip=bool(get("flip")) and phase == "train",
        modality=modality,
        cache_dir=cache_dir,
    )
