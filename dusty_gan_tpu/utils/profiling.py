"""Trace summarization: turn a ``jax.profiler`` trace into a per-op table.

The reference has no profiling at all (SURVEY.md §5.1); this framework's
train CLI can capture a device trace (``profile_dir=…``), and this module
renders it human-readable without TensorBoard: total device time, time by
HLO category, and the top fused ops — the exact view used to drive the
round-2 step optimizations (docs/PERF.md).

Works on the Perfetto-format ``*.trace.json.gz`` files the profiler
writes, for both TPU traces (thread "XLA Ops" with ``hlo_category``
annotations) and CPU-backend traces (falls back to any complete events
carrying HLO metadata, then to all complete events).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os.path as osp
from typing import Dict, List, Optional


def _load_latest_trace(trace_dir: str) -> Optional[dict]:
    files = sorted(glob.glob(osp.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        return None
    with gzip.open(files[-1]) as f:
        return json.load(f)


def summarize_trace(trace_dir: str, top: int = 20, steps: int = 1) -> Optional[Dict]:
    """Aggregate device-op durations from the newest trace in ``trace_dir``.

    ``steps``: number of identical steps captured — durations are reported
    per step.  Returns None when no trace file exists.
    """
    tr = _load_latest_trace(trace_dir)
    if tr is None:
        return None
    events = tr.get("traceEvents", [])

    threads = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")

    complete = [e for e in events if e.get("ph") == "X"]
    ops = [e for e in complete if threads.get((e.get("pid"), e.get("tid"))) == "XLA Ops"]
    if not ops:  # CPU-backend traces have no "XLA Ops" device thread
        ops = [e for e in complete if e.get("args", {}).get("hlo_category")]
    if not ops:
        ops = complete
    if not ops:
        return None

    by_cat = collections.Counter()
    cat_n = collections.Counter()
    by_op = collections.defaultdict(float)
    op_n = collections.Counter()
    for e in ops:
        dur = float(e.get("dur", 0.0))
        cat = e.get("args", {}).get("hlo_category", "(uncategorized)")
        by_cat[cat] += dur
        cat_n[cat] += 1
        by_op[e.get("name", "?")] += dur
        op_n[e.get("name", "?")] += 1

    total_us = sum(by_cat.values()) / steps
    return {
        "total_ms_per_step": total_us / 1e3,
        "num_op_events": len(ops),
        "by_category": [
            {"category": c, "us_per_step": round(d / steps, 1), "count": cat_n[c] // steps}
            for c, d in by_cat.most_common()
        ],
        "top_ops": [
            {"op": n, "us_per_step": round(d / steps, 1), "count": op_n[n] // steps}
            for n, d in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]
        ],
    }


def format_summary(summary: Dict, top: int = 12) -> str:
    lines: List[str] = [
        f"device total: {summary['total_ms_per_step']:.3f} ms/step "
        f"({summary['num_op_events']} op events)",
        "-- by HLO category --",
    ]
    for row in summary["by_category"][:10]:
        lines.append(
            f"{row['us_per_step']:10.1f} us/step  x{row['count']:5d}  {row['category']}"
        )
    lines.append("-- top ops --")
    for row in summary["top_ops"][:top]:
        lines.append(f"{row['us_per_step']:10.1f} us/step  x{row['count']:3d}  {row['op'][:90]}")
    return "\n".join(lines)
