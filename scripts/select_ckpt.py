"""Select the best-validation checkpoint of a run by the reference
tolerance-tuner objective (tune_tolerance.py:52-57):
    score = 1*1NNA-CD + 100*MMD-CD - 1*COV-CD + 10*JSD
over the validation entries in scalars.jsonl, restricted to steps that
have a saved checkpoint."""
import json
import sys
from glob import glob
import os.path as osp

run_dir = sys.argv[1]
rows = [json.loads(l) for l in open(osp.join(run_dir, "scalars.jsonl"))]
by_step = {}
for r in rows:
    by_step.setdefault(r["step"], {}).update(r)

ckpts = {int(osp.basename(p).split("_")[1].split(".")[0]): p
         for p in glob(osp.join(run_dir, "models", "checkpoint_*.ckpt"))}

print(f"{'step':>10} {'1nna':>7} {'mmd':>8} {'cov':>6} {'jsd':>7} "
      f"{'swd':>7} {'score':>8} ckpt")
best = None
for step in sorted(by_step):
    r = by_step[step]
    need = ("score/1-nn-accuracy-cd", "score/mmd-cd", "score/cov-cd", "score/jsd")
    if not all(k in r for k in need):
        continue
    score = (r["score/1-nn-accuracy-cd"] + 100 * r["score/mmd-cd"]
             - r["score/cov-cd"] + 10 * r["score/jsd"])
    has = "yes" if step in ckpts else ""
    print(f"{step:>10} {r['score/1-nn-accuracy-cd']:7.3f} {r['score/mmd-cd']:8.5f} "
          f"{r['score/cov-cd']:6.3f} {r['score/jsd']:7.4f} "
          f"{r.get('score/swd-mean', float('nan')):7.4f} {score:8.4f} {has}")
    if step in ckpts and (best is None or score < best[0]):
        best = (score, step, ckpts[step])
if best:
    print(f"\nBEST: step={best[1]} score={best[0]:.4f} {best[2]}")
