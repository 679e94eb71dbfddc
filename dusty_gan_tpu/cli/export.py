"""Export a trained generator as a portable StableHLO serving artifact.

Usage:
    python -m dusty_gan_tpu.cli.export \
        --model-path runs/.../checkpoint_0025000000.ckpt \
        --config-path runs/.../config.yaml \
        --output-dir exports/dusty2_kitti

Produces ``generator.stablehlo`` + ``manifest.json`` (see
utils/export.py for the artifact contract).  Accepts native ``.ckpt``
checkpoints and reference ``.pth`` files (the torch-import parity path),
like every other eval CLI.  The reference has no export/serving
capability; this is the deployment story for the rebuilt framework.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp


def main(argv=None):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--config-path", type=str, required=True)
    parser.add_argument("--output-dir", type=str, required=True)
    parser.add_argument("--tol", type=float, default=0.0,
                        help="projection tolerance baked into the points "
                             "output (tune_tolerance result; 0 keeps all)")
    parser.add_argument("--mask-threshold", type=float, default=0.5,
                        help="Gumbel keep threshold baked into the artifact "
                             "(reference: 0.5; pass a calibrated value from "
                             "evaluate_synthesis --calibrate-drop-rate to "
                             "serve the drop-rate-matched generator)")
    parser.add_argument("--batch-size", type=int, default=0,
                        help="fixed batch size; 0 (default) exports a "
                             "symbolic batch dimension")
    parser.add_argument("--dtype", type=str, default="bf16",
                        help="compute dtype inside the artifact (bf16|f32)")
    parser.add_argument("--platforms", type=str, default="tpu,cpu",
                        help="comma list of lowering platforms")
    parser.add_argument("--no-points", action="store_true",
                        help="omit the Cartesian point-cloud output")
    parser.add_argument("--no-verify", action="store_true",
                        help="skip the reload + numerical parity self-test")
    args = parser.parse_args(argv)

    import numpy as np
    import jax

    from dusty_gan_tpu.utils.export import (
        export_generator, load_exported, resolve_dtype, save_exported,
    )
    from dusty_gan_tpu.utils.setup import make_eval_generator, setup

    cfg, G, params, lidar, fixed_noise = setup(
        args.model_path, args.config_path, ema=True, fix_noise=True
    )
    in_ch = int(cfg.model.gen.in_ch)
    dtype = resolve_dtype(args.dtype)
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())

    exported = export_generator(
        G, params, fixed_noise, lidar, in_ch=in_ch, compute_dtype=dtype,
        tol=args.tol, with_points=not args.no_points,
        batch_size=args.batch_size or None, platforms=platforms,
        mask_threshold=args.mask_threshold,
    )
    manifest = {
        "arch": str(cfg.model.gen.arch),
        "dataset": str(cfg.dataset.name),
        "in_ch": in_ch,
        "image_shape": list(cfg.dataset.shape),
        "min_depth": float(cfg.dataset.min_depth),
        "max_depth": float(cfg.dataset.max_depth),
        "compute_dtype": args.dtype,
        "tol": args.tol,
        "mask_threshold": args.mask_threshold,
        "batch": args.batch_size or "dynamic",
        "platforms": list(platforms),
        "with_points": not args.no_points,
        "source_checkpoint": osp.abspath(args.model_path),
    }
    path = save_exported(exported, args.output_dir, manifest)
    print(f"exported: {path} ({osp.getsize(path) / 1e6:.1f} MB, "
          f"platforms={','.join(platforms)}, batch={manifest['batch']})")

    if not args.no_verify:
        # Reload the serialized artifact and check it reproduces the live
        # generator.  The two are INDEPENDENTLY COMPILED executables of the
        # same math: on TPU, fusion differences give bf16-grade numeric
        # noise, and the DUSty drop mask is a hard threshold (measure *
        # (logit > 0)), so near-threshold cells legitimately flip between
        # the two.  Compare mask-aware: high mask agreement + tight depth
        # agreement on the cells both executables kept.  (On CPU both
        # compile identically and this is exact.)
        call, _ = load_exported(args.output_dir)
        b = args.batch_size or 2
        z = np.asarray(
            jax.random.normal(jax.random.PRNGKey(0), (b, in_ch)), np.float32
        )
        got = np.asarray(call(z)["depth"], np.float32)
        gen = make_eval_generator(G, params, fixed_noise, dtype)
        want = np.clip(
            (np.asarray(gen(z, threshold=args.mask_threshold)["depth"],
                        np.float32) + 1.0) / 2.0, 0.0, 1.0
        )
        mask_got, mask_want = got > 0, want > 0
        agree = float(np.mean(mask_got == mask_want))
        both = mask_got & mask_want
        diff = np.abs(got - want)[both]
        max_diff = float(diff.max()) if diff.size else 0.0
        mean_diff = float(diff.mean()) if diff.size else 0.0
        assert agree >= 0.98, f"mask agreement {agree:.4f} < 0.98"
        assert max_diff <= 0.05, f"max depth diff {max_diff:.4g} > 0.05"
        assert mean_diff <= 0.005, f"mean depth diff {mean_diff:.4g} > 0.005"
        print(f"verified: artifact ~= live generator on batch {b} "
              f"(mask agreement {agree:.4f}, depth max|mean diff "
              f"{max_diff:.2g}|{mean_diff:.2g})")
    return args.output_dir


if __name__ == "__main__":
    main()
