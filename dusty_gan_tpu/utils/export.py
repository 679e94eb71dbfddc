"""AOT export of the eval-mode generator for serving (StableHLO).

TPU-native serving path with no counterpart in the reference (its closest
analog is re-running the full torch stack per request, ``demo.py``): the
jitted deterministic generator — EMA params, frozen Gumbel noise, eval
thresholds, exactly the semantics every eval CLI uses via
``utils.setup.make_eval_generator`` — is lowered once through
``jax.export`` into a portable StableHLO artifact with a *symbolic batch
dimension*, serialized next to a JSON manifest.  A server deserializes
the artifact and calls it at any batch size on any exported platform
(tpu/cpu) with no Python model code, no flax, and no checkpoint parsing
at load time; XLA AOT-compiles per (platform, batch) on first call.

Artifact contract (all constants — params, Gumbel noise field, LiDAR
angle table — are baked into the program):

    z: f32[b, in_ch]  ->  {
        "depth":  f32[b, H, W, 1]   inverse depth in [0, 1], dropped
                                    pixels at 0 (reference inv-depth
                                    domain, kitti_odometry.yaml:5-6)
        "mask":   f32[b, H, W, 1]   effective binary drop mask (DUSty2:
                                    pixel*image product; baseline: ones)
        "points": f32[b, H*W, 3]    Cartesian point cloud at the given
                                    projection tolerance (optional)
    }
"""

from __future__ import annotations

import hashlib
import json
import os
import os.path as osp
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dusty_gan_tpu.geometry.lidar import Lidar, tanh_to_sigmoid
from dusty_gan_tpu.utils.setup import make_eval_generator

ARTIFACT_NAME = "generator.stablehlo"
MANIFEST_NAME = "manifest.json"

_DTYPES = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
           "f32": jnp.float32, "float32": jnp.float32}


def make_serving_fn(
    G, params, fixed_noise, lidar: Lidar, *,
    compute_dtype=jnp.bfloat16, tol: float = 0.0, with_points: bool = True,
    mask_threshold: float = 0.5,
) -> Callable[[jax.Array], Dict[str, jax.Array]]:
    """latent (B, in_ch) -> serving output dict (see module docstring).

    ``mask_threshold`` is the Gumbel keep threshold baked into the
    artifact (reference default 0.5); pass a calibrated value from
    ``utils.calibration`` to serve the drop-rate-matched generator.
    """
    gen = make_eval_generator(G, params, fixed_noise, compute_dtype)

    def fn(z):
        out = gen(z, threshold=mask_threshold)
        inv01 = jnp.clip(tanh_to_sigmoid(out["depth"]), 0.0, 1.0)
        inv01 = inv01.astype(jnp.float32)
        mask = out.get("mask")
        if mask is None:  # baseline generator has no masker head
            mask = jnp.ones_like(inv01)
        else:  # DUSty2 concatenates pixel/image masks along channels
            mask = jnp.prod(mask.astype(jnp.float32), axis=-1, keepdims=True)
        res = {"depth": inv01, "mask": mask}
        if with_points:
            xyz = lidar.inv_to_xyz(inv01, tol)
            res["points"] = xyz.reshape(xyz.shape[0], -1, 3)
        return res

    return fn


def export_generator(
    G, params, fixed_noise, lidar: Lidar, *,
    in_ch: int, compute_dtype=jnp.bfloat16, tol: float = 0.0,
    with_points: bool = True, batch_size: Optional[int] = None,
    platforms: Tuple[str, ...] = ("tpu", "cpu"),
    mask_threshold: float = 0.5,
):
    """Lower the serving fn to a ``jax.export.Exported``.

    ``batch_size=None`` exports a symbolic batch dimension — one artifact
    serves every batch size (XLA compiles per concrete size on demand).
    """
    fn = make_serving_fn(
        G, params, fixed_noise, lidar,
        compute_dtype=compute_dtype, tol=tol, with_points=with_points,
        mask_threshold=mask_threshold,
    )
    if batch_size is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(batch_size)
    spec = jax.ShapeDtypeStruct((b, in_ch), jnp.float32)
    return jax.export.export(jax.jit(fn), platforms=tuple(platforms))(spec)


def save_exported(exported, out_dir: str, manifest: Dict[str, Any]) -> str:
    """Serialize artifact + manifest (artifact sha256 recorded) to
    ``out_dir``; returns the artifact path."""
    os.makedirs(out_dir, exist_ok=True)
    blob = exported.serialize()
    path = osp.join(out_dir, ARTIFACT_NAME)
    with open(path, "wb") as f:
        f.write(blob)
    manifest = dict(manifest)
    manifest["artifact"] = ARTIFACT_NAME
    manifest["artifact_sha256"] = hashlib.sha256(blob).hexdigest()
    manifest["artifact_bytes"] = len(blob)
    manifest["jax_version"] = jax.__version__
    with open(osp.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return path


def load_exported(export_dir: str) -> Tuple[Callable, Dict[str, Any]]:
    """(callable, manifest) from an export directory.  The callable maps
    ``z: f32[b, in_ch] -> output dict``; the artifact hash is verified
    against the manifest before deserialization."""
    with open(osp.join(export_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    with open(osp.join(export_dir, manifest["artifact"]), "rb") as f:
        blob = f.read()
    got = hashlib.sha256(blob).hexdigest()
    if got != manifest["artifact_sha256"]:
        raise ValueError(
            f"artifact hash mismatch under {export_dir}: "
            f"{got} != manifest {manifest['artifact_sha256']}"
        )
    exported = jax.export.deserialize(bytearray(blob))
    return exported.call, manifest


def resolve_dtype(name: str):
    try:
        return _DTYPES[name]
    except KeyError:
        raise SystemExit(
            f"unknown dtype {name!r}; choose from {sorted(_DTYPES)}"
        ) from None
