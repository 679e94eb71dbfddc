"""SparseMPO dataset: file-glob layout, 32x256 shape, flip path."""

import os
import os.path as osp

import numpy as np
import pytest

from dusty_gan_tpu.data.datasets import SparseMPO, define_dataset
from dusty_gan_tpu.data.synthetic import synthetic_scene_depth


@pytest.fixture(scope="module")
def mpo_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mpo")
    d = osp.join(root, "Data")
    os.makedirs(d)
    rng = np.random.RandomState(0)
    h0, w0 = 32, 512
    for set_id in (0, 7, 8):  # train/val/test representatives
        for i in range(4):
            depth, pitch, yaw = synthetic_scene_depth(rng, h0, w0)
            x = depth * np.cos(pitch) * np.cos(yaw)
            y = depth * np.cos(pitch) * np.sin(yaw)
            z = depth * np.sin(pitch)
            scan = np.stack([x, y, z, rng.uniform(size=depth.shape)], -1)
            np.save(osp.join(d, f"class0_set{set_id:03d}_scan{i:05d}.npy"),
                    scan.astype(np.float32))
    return str(root)


class TestSparseMPO:
    def test_splits_and_shapes(self, mpo_root):
        for split, n in (("train", 4), ("val", 4), ("test", 4)):
            ds = SparseMPO(root=mpo_root, split=split, shape=(32, 256))
            assert len(ds) == n, split
            item = ds[0]
            assert item["depth"].shape == (32, 256, 1)
            assert item["xyz"].shape == (32, 256, 3)
            assert 0.0 <= item["depth"].min() and item["depth"].max() <= 1.0

    def test_flip_is_mirror(self, mpo_root):
        ds = SparseMPO(root=mpo_root, split="train", shape=(32, 256), flip=True)
        plain = ds._process(ds._load_raw(0), flip=False)
        flipped = ds._process(ds._load_raw(0), flip=True)
        # full-res flip then subsample: column c maps to w0-1-floor(c*w0/w)
        assert not np.allclose(plain["depth"], flipped["depth"])
        np.testing.assert_allclose(
            flipped["mask"].mean(), plain["mask"].mean(), atol=0.05
        )

    def test_factory_dispatch(self, mpo_root):
        cfg = {"name": "sparse_mpo", "root": mpo_root, "shape": (32, 256),
               "min_depth": 0.9, "max_depth": 120.0, "flip": True}
        ds = define_dataset(cfg, phase="train")
        assert isinstance(ds, SparseMPO) and ds.flip
        ds_val = define_dataset(cfg, phase="val")
        assert not ds_val.flip  # flip only in train phase
