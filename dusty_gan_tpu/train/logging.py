"""Scalar/image logging: TensorBoard events with a JSONL fallback.

Replaces the reference's SummaryWriter + optional wandb mirroring
(train.py:18-34,75-97).  Uses torch.utils.tensorboard when available
(host-side only — no torch in the compute path); always writes a
``scalars.jsonl`` so runs are inspectable with zero deps.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Optional

import numpy as np


def make_grid(images: np.ndarray, nrow: int = 4, pad: int = 2) -> np.ndarray:
    """(B,H,W,C) -> single (H',W',C) tiled image (torchvision-free)."""
    b, h, w, c = images.shape
    ncol = nrow
    nrows = (b + ncol - 1) // ncol
    grid = np.zeros((nrows * (h + pad) + pad, ncol * (w + pad) + pad, c), images.dtype)
    for i in range(b):
        r, col = divmod(i, ncol)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y : y + h, x : x + w] = images[i]
    return grid


class RunLogger:
    def __init__(self, run_dir: str, use_tensorboard: bool = True, use_wandb: bool = False,
                 wandb_config: Optional[dict] = None):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._jsonl = open(osp.join(run_dir, "scalars.jsonl"), "a")
        # wandb first: tensorboard patching must precede SummaryWriter
        # creation to mirror TB events (reference train.py:77-82)
        self._wandb = None
        self._wandb_mirrors_tb = False
        if use_wandb:
            try:
                import wandb

                wandb.init(project="dusty-gan-tpu", config=wandb_config or {})
                if use_tensorboard:
                    try:
                        wandb.tensorboard.patch(save=False)
                        self._wandb_mirrors_tb = True
                    except Exception:
                        pass
                self._wandb = wandb
            except Exception:
                self._wandb = None
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=run_dir)
            except Exception:
                self._tb = None
        # patched TB already forwards to wandb; only log directly when TB
        # is unavailable or unpatched
        if self._wandb_mirrors_tb and self._tb is not None:
            self._wandb_direct = None
        else:
            self._wandb_direct = self._wandb

    def scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(json.dumps({"t": time.time(), "step": step, tag: float(value)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        if self._wandb_direct is not None:
            self._wandb_direct.log({tag: float(value)}, step=step)

    def scalars(self, mapping: dict, step: int):
        for k, v in mapping.items():
            self.scalar(k, v, step)
        self._jsonl.flush()

    def image(self, tag: str, img_hwc: np.ndarray, step: int):
        """img in [0,1], (H,W,C)."""
        img = np.clip(np.asarray(img_hwc, np.float32), 0, 1)
        if self._tb is not None:
            self._tb.add_image(tag, np.transpose(img, (2, 0, 1)), step)
        if self._wandb_direct is not None:
            self._wandb_direct.log({tag: self._wandb_direct.Image(img)}, step=step)

    def image_grid(self, tag: str, batch_nhwc: np.ndarray, step: int, nrow: int = 4):
        self.image(tag, make_grid(np.asarray(batch_nhwc), nrow), step)

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
