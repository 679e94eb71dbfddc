"""Checkpoint save/restore: single-file msgpack of the full TrainState.

Mirrors the reference checkpoint contents (``trainers/dcgan_amp.py:395-409``,
``checkpoint_{imgs:010d}.pth``) with two upgrades flagged in SURVEY.md §5.4:
atomic writes (tmp + rename) and inclusion of the RNG key so resume is
bit-reproducible (the reference loses RNG/scaler/loader position).  The
loader position itself needs no extra state: it is derived from
``state.step`` (``Loader.iter_from``), so a resumed run continues the
exact batch stream of the uninterrupted run.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state, key: Optional[jax.Array] = None):
    payload = {
        "state": serialization.to_state_dict(jax.device_get(state)),
        "key": np.asarray(jax.device_get(key)) if key is not None else None,
    }
    data = serialization.msgpack_serialize(payload)
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic
    return path


def restore_checkpoint(path: str, state_template) -> Tuple[object, Optional[np.ndarray]]:
    """Restore into the structure of ``state_template``."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(state_template, payload["state"])
    key = payload.get("key")
    return state, key


def checkpoint_name(images_seen: int) -> str:
    """Reference naming: checkpoint_0025000000 (README.md:71)."""
    return f"checkpoint_{images_seen:010d}.ckpt"
