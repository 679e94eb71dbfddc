"""Render the round-5 chip campaign artifacts as markdown tables.

Reads the flagship run's scalars.jsonl (validation trajectory), the
campaign output JSONs (tuned/untuned/GT-floor/EMD evals, tuner result)
and walls.txt, and prints BASELINE.md / PERF.md-ready markdown.  Keeping
this a script makes the writeup reproducible from raw artifacts.

Usage: python scripts/report_campaign.py [run_dir] [campaign_out_dir]
"""
import json
import os.path as osp
import sys
from glob import glob

RUN = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship/run"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/round5"

METRICS = [
    ("score/swd-mean", "swd-mean", "{:.3f}"),
    ("score/jsd", "jsd", "{:.3f}"),
    ("score/mmd-cd", "mmd-cd", "{:.4f}"),
    ("score/cov-cd", "cov-cd", "{:.3f}"),
    ("score/1-nn-accuracy-cd", "1-nna-cd", "{:.3f}"),
]


def fmt_images(n):
    return f"{n / 1e6:.2f}M" if n >= 1e6 else f"{n // 1000}k"


def trajectory():
    path = osp.join(RUN, "scalars.jsonl")
    if not osp.exists(path):
        return
    by_step = {}
    for line in open(path):
        r = json.loads(line)
        by_step.setdefault(r["step"], {}).update(r)
    rows = [(s, r) for s, r in sorted(by_step.items())
            if all(k in r for k, _, _ in METRICS)]
    if not rows:
        return
    # subsample to <=12 rows, always keeping the last
    stride = max(1, len(rows) // 11)
    keep = rows[::stride]
    if keep[-1][0] != rows[-1][0]:
        keep.append(rows[-1])
    print("| images | " + " | ".join(n for _, n, _ in METRICS) + " |")
    print("|---" * (len(METRICS) + 1) + "|")
    for step, r in keep:
        cells = [f.format(r[k]) for k, _, f in METRICS]
        print(f"| {fmt_images(step)} | " + " | ".join(cells) + " |")
    print()


def latest_json(pattern):
    fs = sorted(glob(pattern))
    return json.load(open(fs[-1])) if fs else None


def final_table():
    evals = {
        "tol=0": latest_json(osp.join(OUT, "eval_tol0", "*.json")),
        "tuned": latest_json(osp.join(OUT, "eval_tuned", "*.json")),
        "GT floor": latest_json(
            "outputs/logs/dataset=*/gt/evaluation/tol=0/*.json"),
    }
    tune = latest_json(osp.join(OUT, "tune_*.json"))
    if tune:
        print(f"Tuned tol = {tune['best']['tol']:.6g} "
              f"(objective {tune['best'].get('score', float('nan')):.4f}, "
              f"{len(tune.get('trials', []))} TPE trials)\n")
    keys = [("swd-mean", "{:.3f}"), ("jsd", "{:.4f}"), ("mmd-cd", "{:.5f}"),
            ("cov-cd", "{:.3f}"), ("1-nn-accuracy-cd", "{:.3f}")]
    cols = [c for c, v in evals.items() if v]
    if not cols:
        return
    print("| metric | " + " | ".join(cols) + " |")
    print("|---" * (len(cols) + 1) + "|")
    for k, f in keys:
        cells = [f.format(evals[c][k]) if k in evals[c] else "—" for c in cols]
        print(f"| {k} | " + " | ".join(cells) + " |")
    print()
    emd = latest_json(osp.join(OUT, "eval_emd1000", "*.json"))
    if emd:
        em = {k: v for k, v in emd.items() if "emd" in k or "cd" in k}
        print("EMD 1000^2 anchor:",
              json.dumps(em, sort_keys=True, default=float))
        print()


def walls():
    path = osp.join(OUT, "walls.txt")
    if not osp.exists(path):
        return
    print("| stage | wall | rc |")
    print("|---|---|---|")
    for line in open(path):
        # WALL <sec>s rc=<rc> <name>
        parts = line.split()
        if len(parts) >= 4 and parts[0] == "WALL":
            sec = int(parts[1].rstrip("s"))
            print(f"| {parts[3]} | {sec // 60}m{sec % 60:02d}s | "
                  f"{parts[2].split('=')[1]} |")
    print()


print("## Validation trajectory (128-sample, val split)\n")
trajectory()
print("## Eval protocol (5,000 samples, 2048-pt FPS, test split)\n")
final_table()
print("## Measured stage walls\n")
walls()
