"""Offline KITTI preprocessing: raw .bin scans -> (64, 2048, 4) range images
plus the dataset-mean angle grid.

Port of ``process_kitti.py`` with the same algorithm, vectorized NumPy
instead of numba/joblib (no JIT warmup, no process pool needed):

* scan-line segmentation by quadrant-transition detection
  (process_kitti.py:88-106): the velodyne packet stream is ordered
  counterclockwise per revolution, so a jump from the 4th quadrant back to
  the 1st marks a new laser ring;
* yaw binning to W columns (process_kitti.py:109-112);
* painter's-order scatter: points sorted far-to-near so the nearest point
  wins each pixel (process_kitti.py:60-73,86);
* dataset-mean per-pixel (pitch, yaw) angle grid with NaN infill from
  row/column means (process_kitti.py:143-183).
"""

from __future__ import annotations

import os
import os.path as osp
from glob import glob

import numpy as np


def project_scan(points: np.ndarray, H: int = 64, W: int = 2048) -> np.ndarray:
    """(N, C>=3) xyz[+extras] -> (H, W, C) range image. Nearest point wins."""
    from dusty_gan_tpu.data import native

    if not os.environ.get("DUSTY_GAN_TPU_NO_NATIVE"):
        out = native.project_scan(points.astype(np.float32), H, W)
        if out is not None:
            return out
    xyz = points[:, :3]
    x, y = xyz[:, 0], xyz[:, 1]
    depth = np.linalg.norm(xyz, ord=2, axis=1)
    order = np.argsort(-depth)  # far first

    quads = np.zeros_like(x, dtype=np.int32)
    quads[(x < 0) & (y >= 0)] = 1
    quads[(x < 0) & (y < 0)] = 2
    quads[(x >= 0) & (y < 0)] = 3

    diff = np.roll(quads, 1) - quads
    (start_inds,) = np.where(diff == 3)  # 4th -> 1st quadrant transition
    n_lines = len(start_inds)

    # segment id for each point; points before the first start stay row 0
    seg = np.searchsorted(start_inds, np.arange(len(quads)), side="right") - 1
    grid_h = np.where(seg < 0, 0, (H - n_lines) + seg)
    grid_h = np.clip(grid_h, 0, H - 1)

    yaw = -np.arctan2(y, x)
    grid_w = np.floor(((yaw / np.pi + 1.0) / 2.0 % 1.0) * W).astype(np.int64)
    grid_w = np.clip(grid_w, 0, W - 1)

    proj = np.zeros((H, W, points.shape[1]), dtype=points.dtype)
    # duplicate fancy-index assignment: LAST write wins == nearest point
    proj[grid_h[order], grid_w[order]] = points[order]
    return proj


# SemanticKITTI raw-label -> train-id map (process_kitti.py:19-52)
SEMANTIC_KITTI_LABELMAP = {
    0: 0, 1: 0, 10: 1, 11: 2, 13: 5, 15: 3, 16: 5, 18: 4, 20: 5, 30: 6,
    31: 7, 32: 8, 40: 9, 44: 10, 48: 11, 49: 12, 50: 13, 51: 14, 52: 0,
    60: 9, 70: 15, 71: 16, 72: 17, 80: 18, 81: 19, 99: 0, 252: 1, 253: 7,
    254: 6, 255: 8, 256: 5, 257: 5, 258: 4, 259: 5,
}


def _label_palette():
    import matplotlib.cm as cm

    n = max(SEMANTIC_KITTI_LABELMAP.values()) + 1
    colors = cm.turbo(np.arange(n) / (n - 1))[:, :3] * 255
    return list(np.uint8(colors).flatten())


def _project_grid(points: np.ndarray, H: int, W: int):
    """grid/order for label projection (shares the scan-line logic)."""
    xyz = points[:, :3]
    x, y = xyz[:, 0], xyz[:, 1]
    depth = np.linalg.norm(xyz, ord=2, axis=1)
    order = np.argsort(-depth)
    quads = np.zeros_like(x, dtype=np.int32)
    quads[(x < 0) & (y >= 0)] = 1
    quads[(x < 0) & (y < 0)] = 2
    quads[(x >= 0) & (y < 0)] = 3
    diff = np.roll(quads, 1) - quads
    (start_inds,) = np.where(diff == 3)
    seg = np.searchsorted(start_inds, np.arange(len(quads)), side="right") - 1
    grid_h = np.clip(np.where(seg < 0, 0, (H - len(start_inds)) + seg), 0, H - 1)
    yaw = -np.arctan2(y, x)
    grid_w = np.clip(
        np.floor(((yaw / np.pi + 1.0) / 2.0 % 1.0) * W).astype(np.int64), 0, W - 1
    )
    return grid_h, grid_w, order


def process_bin_file(point_path: str, save_path: str, H: int = 64, W: int = 2048,
                     label_path: str = None, label_save_path: str = None):
    points = np.fromfile(point_path, dtype=np.float32).reshape(-1, 4)
    proj = project_scan(points, H, W)
    os.makedirs(osp.dirname(save_path), exist_ok=True)
    np.save(save_path, proj)

    # optional SemanticKITTI labels -> paletted PNG (process_kitti.py:114-131)
    if label_path and osp.exists(label_path) and label_save_path:
        from PIL import Image

        labels = np.fromfile(label_path, dtype=np.int32) & 0xFFFF
        labels = np.vectorize(SEMANTIC_KITTI_LABELMAP.__getitem__)(labels)
        gh, gw, order = _project_grid(points, H, W)
        lab_img = np.zeros((H, W), labels.dtype)
        lab_img[gh[order], gw[order]] = labels[order]
        os.makedirs(osp.dirname(label_save_path), exist_ok=True)
        img = Image.fromarray(np.uint8(lab_img), mode="P")
        img.putpalette(_label_palette())
        img.save(label_save_path)
    return proj


def _nan_mean(arr: np.ndarray, axis: int) -> np.ndarray:
    valid = np.isfinite(arr)
    s = np.where(valid, arr, 0.0).sum(axis=axis, keepdims=True)
    c = valid.sum(axis=axis, keepdims=True)
    return s / np.maximum(c, 1)


def _angle_partials(scan_iter, min_depth: float, max_depth: float):
    """Streaming partial sums for the mean angle grid: (valid-count,
    pitch-sum, yaw-sum) — associative, so shards combine by addition."""
    total_valid = sum_pitch = sum_yaw = None
    for xyz in scan_iter:
        xyz = np.asarray(xyz, np.float64)
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        depth = np.sqrt(x**2 + y**2 + z**2)
        valid = ((depth > min_depth) & (depth < max_depth)).astype(np.float64)
        r = np.sqrt(x**2 + y**2)
        pitch = np.arctan2(z, r)
        yaw = np.arctan2(y, x)
        if total_valid is None:
            total_valid = np.zeros_like(valid)
            sum_pitch = np.zeros_like(valid)
            sum_yaw = np.zeros_like(valid)
        total_valid += valid
        sum_pitch += pitch * valid
        sum_yaw += yaw * valid
    return total_valid, sum_pitch, sum_yaw


def _angle_partials_for_paths(paths, min_depth: float, max_depth: float):
    """Process-pool worker: partial angle sums over a shard of .npy scans."""
    return _angle_partials(
        (np.load(p)[..., :3] for p in paths), min_depth, max_depth
    )


def compute_avg_angles(scan_iter, min_depth: float = 0.9, max_depth: float = 120.0):
    """Mean per-pixel (pitch, yaw) over a dataset of (H, W, >=3) xyz range
    images in METERS (process_kitti.py:143-183). Returns (2, H, W).

    The reference feeds pre-masked dataset tensors (invalid pixels zeroed
    by the [min_depth, max_depth] gate, datasets/kitti.py:56-67), so the
    same gate is applied here."""
    total_valid, sum_pitch, sum_yaw = _angle_partials(
        scan_iter, min_depth, max_depth
    )
    return _finalize_angles(total_valid, sum_pitch, sum_yaw)


def _finalize_angles(total_valid, sum_pitch, sum_yaw):
    with np.errstate(invalid="ignore", divide="ignore"):
        pitch = sum_pitch / total_valid
        yaw = sum_yaw / total_valid
    angles = np.stack([pitch, yaw], axis=0)

    mean_pitch = np.broadcast_to(_nan_mean(pitch, axis=1), pitch.shape)
    mean_yaw = np.broadcast_to(_nan_mean(yaw, axis=0), yaw.shape)
    mean_angles = np.stack([mean_pitch, mean_yaw], axis=0)

    valid_pix = (total_valid > 0).astype(np.float64)[None]
    angles = np.nan_to_num(angles, nan=0.0)
    angles = valid_pix * angles + (1.0 - valid_pix) * mean_angles
    assert np.isfinite(angles).all()
    return angles.astype(np.float32)


def _process_one(task):
    """Process-pool worker: one .bin -> .npy projection (+labels)."""
    point_path, save_path, H, W, label_path, label_save = task
    process_bin_file(point_path, save_path, H, W, label_path, label_save)
    return save_path


def _shards(items, n: int):
    return [items[i::n] for i in range(n) if items[i::n]]


def process_kitti_root(root_dir: str, H: int = 64, W: int = 2048,
                       verbose: bool = True, n_jobs: int = None):
    """Full offline build (process_kitti.py:186-222): project every
    sequence's .bin files into ``<root>/dusty-gan/sequences`` and write
    ``angles.npy`` (+ ``angles.pt`` when torch is available).

    Scans fan out over a process pool (``n_jobs``, default all cores) like
    the reference's ``joblib.Parallel`` (process_kitti.py:26,186-222), and
    the train-split angle accumulation is sharded over the same pool.
    Per-scan projections are bit-identical to a sequential build; the
    angle grid combines f64 partial sums per shard, so it matches the
    sequential order to f64 reassociation rounding (far below the f32
    output precision in practice, but not guaranteed bit-equal);
    ``n_jobs=1`` runs inline."""
    n_jobs = os.cpu_count() if n_jobs is None else max(1, int(n_jobs))

    tasks = []
    split_dirs = sorted(glob(osp.join(root_dir, "dataset/sequences", "*")))
    for split_dir in split_dirs:
        for point_path in sorted(glob(osp.join(split_dir, "velodyne", "*.bin"))):
            save_path = point_path.replace("dataset/sequences", "dusty-gan/sequences")
            save_path = save_path.replace(".bin", ".npy")
            label_path = point_path.replace("/velodyne", "/labels").replace(".bin", ".label")
            label_save = (
                label_path.replace("dataset/sequences", "dusty-gan/sequences")
                .replace(".label", ".png")
            )
            tasks.append((point_path, save_path, H, W, label_path, label_save))

    # spawn, not fork: callers are often multi-threaded by the time this
    # runs (JAX init spins up dispatch threads) and fork-from-threads can
    # deadlock the children (Python 3.12 warns on it)
    import multiprocessing

    mp_ctx = multiprocessing.get_context("spawn")

    if n_jobs > 1 and len(tasks) > 1:
        from concurrent.futures import ProcessPoolExecutor

        from dusty_gan_tpu.data import native

        native.available()  # build librangeproj.so once before the pool
        done = 0
        with ProcessPoolExecutor(max_workers=n_jobs, mp_context=mp_ctx) as pool:
            for _ in pool.map(_process_one, tasks, chunksize=8):
                done += 1
                if verbose and done % 1000 == 0:
                    print(f"projected: {done}/{len(tasks)}")
    else:
        for task in tasks:
            _process_one(task)
    if verbose:
        print(f"projected: {len(tasks)} scans ({n_jobs} workers)")

    # mean angles over the train split at full resolution
    train_seqs = [0, 1, 2, 3, 4, 5, 6, 7, 9, 10]
    paths = []
    for seq in train_seqs:
        seq_dir = osp.join(root_dir, "dusty-gan/sequences", str(seq).zfill(2))
        paths.extend(sorted(glob(osp.join(seq_dir, "velodyne/*.npy"))))

    if n_jobs > 1 and len(paths) > n_jobs:
        from concurrent.futures import ProcessPoolExecutor
        from functools import partial

        with ProcessPoolExecutor(max_workers=n_jobs, mp_context=mp_ctx) as pool:
            parts = list(pool.map(
                partial(_angle_partials_for_paths, min_depth=0.9, max_depth=120.0),
                _shards(paths, n_jobs),
            ))
        total_valid = sum(p[0] for p in parts)
        sum_pitch = sum(p[1] for p in parts)
        sum_yaw = sum(p[2] for p in parts)
        angles = _finalize_angles(total_valid, sum_pitch, sum_yaw)
    else:
        angles = compute_avg_angles(np.load(p)[..., :3] for p in paths)
    np.save(osp.join(root_dir, "angles.npy"), angles)
    try:
        import torch

        torch.save(torch.from_numpy(angles), osp.join(root_dir, "angles.pt"))
    except ImportError:
        pass
    return angles
