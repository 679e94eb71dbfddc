"""Build the protocol-scale synthetic dataset: >=5000 train and >=5000
test scans at raw KITTI resolution (64x2048), for the full 5,000-sample
eval protocol (VERDICT round-3, missing #1/#2)."""
import sys
import time

sys.path.insert(0, "/root/repo")
from dusty_gan_tpu.data.synthetic import build_synthetic_kitti

ROOT = "/tmp/proto5k/data"
t0 = time.time()
# train: sequences 00-10 minus 08 -> 10 seqs x 500 = 5000 scans
build_synthetic_kitti(ROOT, n_scans_per_seq=500, h0=64, w0=2048, seed=101,
                      sequences=(0, 1, 2, 3, 4, 5, 6, 7, 9, 10))
print(f"train done {time.time()-t0:.0f}s", flush=True)
# val: sequence 08 -> 200 scans
build_synthetic_kitti(ROOT, n_scans_per_seq=200, h0=64, w0=2048, seed=202,
                      sequences=(8,))
print(f"val done {time.time()-t0:.0f}s", flush=True)
# test: sequences 11-21 -> 11 seqs x 455 = 5005 scans
build_synthetic_kitti(ROOT, n_scans_per_seq=455, h0=64, w0=2048, seed=303,
                      sequences=(11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21))
print(f"test done {time.time()-t0:.0f}s", flush=True)
