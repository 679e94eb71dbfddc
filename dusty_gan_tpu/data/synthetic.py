"""Synthetic dataset builder for tests and integration runs without KITTI.

Generates raw-format scan files (KITTI layout: ``sequences/NN/velodyne/
*.npy`` of (H0, W0, 4)) with a plausible ground-plane + random-obstacle
geometry, plus the matching ``angles.npy`` — so the full
preprocess -> dataset -> loader -> trainer path runs end-to-end with no
download (the reference has no equivalent; its tests require real data).
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np


def synthetic_scene_depth(rng, h0: int, w0: int, max_depth: float = 120.0):
    """Plausible depth in meters for each (pitch, yaw) ray + dropout mask."""
    pitch = np.radians(np.linspace(2.0, -24.8, h0))[:, None] * np.ones((1, w0))
    yaw = np.linspace(np.pi, -np.pi, w0, endpoint=False)[None, :] * np.ones((h0, 1))

    # ground plane at sensor height 1.7m for downward rays
    with np.errstate(divide="ignore"):
        ground = np.where(pitch < -1e-3, 1.7 / np.sin(-pitch), np.inf)
    # random "walls" at random azimuths
    depth = np.minimum(ground, max_depth * 0.8)
    for _ in range(rng.randint(4, 10)):
        c = rng.uniform(-np.pi, np.pi)
        width = rng.uniform(0.05, 0.5)
        dist = rng.uniform(3.0, 60.0)
        sel = np.abs(np.angle(np.exp(1j * (yaw - c)))) < width
        depth = np.where(sel, np.minimum(depth, dist), depth)
    depth = depth * rng.uniform(0.97, 1.03, depth.shape)  # sensor noise
    drop = rng.uniform(size=depth.shape) < 0.12
    depth = np.where(drop, 0.0, depth)
    return depth.astype(np.float32), pitch, yaw


def build_synthetic_kitti(root: str, n_scans_per_seq: int = 12, h0: int = 64,
                          w0: int = 512, seed: int = 0,
                          sequences=(0, 8, 11)) -> str:
    """Create a mini dataset tree under ``root`` (train seq 00, val seq 08,
    test seq 11 by default). Returns root."""
    rng = np.random.RandomState(seed)
    for seq in sequences:
        d = osp.join(root, "sequences", str(seq).zfill(2), "velodyne")
        os.makedirs(d, exist_ok=True)
        for i in range(n_scans_per_seq):
            depth, pitch, yaw = synthetic_scene_depth(rng, h0, w0)
            x = depth * np.cos(pitch) * np.cos(yaw)
            y = depth * np.cos(pitch) * np.sin(yaw)
            z = depth * np.sin(pitch)
            refl = rng.uniform(size=depth.shape).astype(np.float32)
            scan = np.stack([x, y, z, refl], axis=-1).astype(np.float32)
            np.save(osp.join(d, f"{i:06d}.npy"), scan)

    pitch = np.radians(np.linspace(2.0, -24.8, h0))[:, None] * np.ones((1, w0))
    yaw = np.linspace(np.pi, -np.pi, w0, endpoint=False)[None, :] * np.ones((h0, 1))
    angles = np.stack([pitch, yaw], axis=0).astype(np.float32)
    np.save(osp.join(root, "angles.npy"), angles)
    return root
