"""Rebuild the /tmp campaign state after a host wipe (round-5 handoff).

Round 4 ended with the axon tunnel down and /tmp (datasets, the 1.6M-image
flagship checkpoints) was wiped between rounds, so the flagship run must
restart from scratch.  This script reconstructs everything the campaign
orchestrator (scripts/round5_campaign.sh) expects on disk:

- /tmp/proto5k/data — the train + protocol-scale eval set (build5k.py
                      layout): 5,000 train / 200 val / 5,005 test scans
                      at raw 64x2048
- /tmp/proto5k/cfg/config.yaml — resolved eval config pointing at it

Idempotent: skips any split whose scan count already matches.
"""
import os
import os.path as osp
import sys
import time
from glob import glob

sys.path.insert(0, "/root/repo")
from dusty_gan_tpu.config import compose  # noqa: E402
from dusty_gan_tpu.data.synthetic import build_synthetic_kitti  # noqa: E402


def have(root, seqs, per_seq):
    return all(
        len(glob(osp.join(root, "sequences", f"{s:02d}", "velodyne", "*.npy")))
        >= per_seq
        for s in seqs
    )


def build(root, per_seq, seed, seqs, tag):
    t0 = time.time()
    if have(root, seqs, per_seq):
        print(f"{tag}: already present, skipped", flush=True)
        return
    build_synthetic_kitti(root, n_scans_per_seq=per_seq, h0=64, w0=2048,
                          seed=seed, sequences=seqs)
    print(f"{tag}: built in {time.time() - t0:.0f}s", flush=True)


TRAIN = (0, 1, 2, 3, 4, 5, 6, 7, 9, 10)
TEST = (11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21)

# ---- proto5k: train + protocol eval set ------------------------------
# The round-5 flagship trains directly on this set, scaled to the REAL
# KITTI odometry train-split size (19,130 scans, 1,913/seq): the judge
# diagnosed the quality gap as data-bound, the device-resident cache
# makes the full 25M-image reference schedule affordable, and sharing
# one dataset makes the 5,000-sample protocol exact (the eval stride-
# subsamples the train side to --num-test).
build("/tmp/proto5k/data", 1913, 101, TRAIN, "proto5k train (19130)")
build("/tmp/proto5k/data", 200, 202, (8,), "proto5k val (200)")
build("/tmp/proto5k/data", 455, 303, TEST, "proto5k test (5005)")

# ---- proto5k eval config ---------------------------------------------
cfg = compose("/root/repo/configs", [
    "dataset=kitti_odometry",
    "model=dusty2_dcgan_eqlr",
    "dataset.root=/tmp/proto5k/data",
    "solver.batch_size=32",
])
os.makedirs("/tmp/proto5k/cfg", exist_ok=True)
with open("/tmp/proto5k/cfg/config.yaml", "w") as f:
    f.write(cfg.to_yaml())
print("proto5k config written", flush=True)
