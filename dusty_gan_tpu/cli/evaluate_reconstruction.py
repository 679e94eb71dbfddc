"""Reconstruction (GAN inversion) evaluation CLI — mirrors the reference
``evaluate_reconstruction.py``:

    python -m dusty_gan_tpu.cli.evaluate_reconstruction \
        --model-path <ckpt|.pth> --config-path <cfg> [--tol 0]
        [--batch-size 512] [--distance l1]

Protocol parity (evaluate_reconstruction.py:18-165): per test batch,
optimize a spherical latent (Adam lr 0.1, StyleGAN2 cosine-ramp schedule,
decaying latent noise, 1000 steps) against the masked L1/L2 on
``depth_orig`` (DUSty) or ``depth`` (baseline); then CD + depth errors/
accuracies + drop-rate statistics -> CSV.

The reference parallelizes via nn.DataParallel (evaluate_reconstruction.py:
11,40); here the whole 1000-step loop is one jitted ``fori_loop`` with the
batch sharded over the full data mesh (the inversion is embarrassingly
parallel over samples) and params/fixed-noise replicated — every local chip
works. Compiled once per batch *shape*: references are passed as arguments,
not closed over, so identical-shape batches hit the jit cache.

Pod mode (``--multihost`` under jax.distributed): test batches stripe
round-robin across processes, each inverting on its LOCAL mesh; per-sample
results merge with one lockstep allgather at the end and rank 0 writes the
CSV — near-linear multi-host speedup of a stage the reference bounds to
one machine.
"""

from __future__ import annotations

import argparse
import datetime
import os
import os.path as osp
from collections import defaultdict

import numpy as np

# fixed column order: every rank must build identically-shaped rows for
# the lockstep merge, even ranks that processed zero batches
RESULT_KEYS = ("cd", "accuracy_1", "accuracy_2", "accuracy_3", "rmse",
               "rmse_log", "abs_rel", "sq_rel", "tol", "drop_gen",
               "drop_ref", "index")


def _merge_process_results(results):
    """Merge per-sample result rows from all processes (pod mode): pad
    each rank's rows to the global max count, allgather once (lockstep —
    safe, see metrics/cov_mmd_1nna._combine_process_partials), strip the
    padding via per-rank counts, and re-sort by global sample index.
    Returns a dict without the index column (CSV format parity)."""
    import jax.numpy as jnp

    from dusty_gan_tpu.parallel.mesh import pod_allgather

    vals = np.asarray([results[k] for k in RESULT_KEYS], np.float32).T
    vals = vals.reshape(-1, len(RESULT_KEYS))  # (0, K) stays 2-D when empty
    counts = pod_allgather(jnp.asarray([vals.shape[0]], jnp.int32))[:, 0]
    m = int(counts.max())
    pad = np.zeros((m - vals.shape[0], len(RESULT_KEYS)), np.float32)
    gathered = pod_allgather(jnp.asarray(np.concatenate([vals, pad], axis=0)))
    rows = np.concatenate([gathered[p, : counts[p]] for p in range(len(counts))])
    rows = rows[np.argsort(rows[:, RESULT_KEYS.index("index")], kind="stable")]
    return {k: rows[:, i].tolist() for i, k in enumerate(RESULT_KEYS)
            if k != "index"}


def main(argv=None):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--config-path", type=str, required=True)
    parser.add_argument("--save-dir-path", type=str, default=".")
    parser.add_argument("--tol", type=float, default=0)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--distance", default="l1", choices=["l1", "l2"])
    parser.add_argument("--num-step", type=int, default=1000)
    parser.add_argument("--max-batches", type=int, default=-1)
    parser.add_argument("--multihost", action="store_true",
                        help="pod mode: call jax.distributed.initialize and "
                             "stripe test batches across processes (launch "
                             "the same command on every host)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.multihost:
        from dusty_gan_tpu.parallel.mesh import init_distributed

        init_distributed()
    pod = jax.process_count() > 1
    if pod and not args.multihost:
        raise SystemExit(
            "evaluate_reconstruction under jax.distributed needs an explicit "
            "--multihost (pod mode stripes batches across processes); a "
            "plain multi-process launch would duplicate all work"
        )
    is_main = jax.process_index() == 0

    from dusty_gan_tpu.data.datasets import define_dataset
    from dusty_gan_tpu.data.loader import Loader
    from dusty_gan_tpu.geometry.lidar import tanh_to_sigmoid
    from dusty_gan_tpu.metrics.chamfer import compute_cd
    from dusty_gan_tpu.metrics.depth import compute_depth_accuracy, compute_depth_error
    from dusty_gan_tpu.models import losses
    from dusty_gan_tpu.utils.inversion import make_inversion_loop
    from dusty_gan_tpu.utils.postprocess import postprocess
    from dusty_gan_tpu.utils.setup import make_eval_generator, setup

    from dusty_gan_tpu.parallel.mesh import (
        batch_sharding, create_local_mesh, create_mesh, replicated,
        shard_eval_inputs,
    )

    cfg, G, params, lidar, fixed_noise = setup(
        args.model_path, args.config_path, ema=True, fix_noise=True
    )
    mesh = create_local_mesh() if pod else create_mesh()
    rep = replicated(mesh)
    params = jax.device_put(params, rep)
    if fixed_noise is not None:
        fixed_noise = jax.device_put(fixed_noise, rep)
    gen = make_eval_generator(G, params, fixed_noise)
    is_dusty = "dusty" in str(cfg.model.gen.arch)
    in_ch = int(cfg.model.gen.in_ch)

    dataset = define_dataset(cfg.dataset, phase="test")
    loader = Loader(dataset, batch_size=args.batch_size, shuffle=False, drop_last=False)

    @jax.jit
    def invert(z0, key, inv_ref, mask_ref):
        def loss_fn(latent):
            out = gen(latent)
            inv_gen = tanh_to_sigmoid(out["depth_orig"] if is_dusty else out["depth"])
            return losses.masked_loss(inv_ref, inv_gen, mask_ref, args.distance)

        return make_inversion_loop(loss_fn, num_steps=args.num_step, lr=0.1)(z0, key)

    results = defaultdict(list)
    pid = jax.process_index() if pod else 0
    n_proc = jax.process_count() if pod else 1
    for bi, batch in enumerate(loader.epoch(0)):
        if args.max_batches >= 0 and bi >= args.max_batches:
            break
        if bi % n_proc != pid:
            continue  # another process inverts this batch (pod mode)
        depth = np.asarray(batch["depth"])
        mask = np.asarray(batch["mask"])
        sharded, b = shard_eval_inputs(
            mesh, {"depth": depth, "mask": mask, "xyz": np.asarray(batch["xyz"])}
        )
        mask_ref = sharded["mask"]
        # [0,1], dropped -> 0 (:66-70)
        inv_ref = lidar.invert_depth(sharded["depth"]) * mask_ref
        xyz_ref = sharded["xyz"]
        bp = inv_ref.shape[0]  # padded batch (multiple of mesh size)

        # draw z0 for the TRUE rows then edge-pad: results are invariant
        # to the mesh-size padding (and therefore to device/process count)
        z0_host = np.asarray(jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(1), bi), (b, in_ch)))
        z0 = jax.device_put(
            np.pad(z0_host, [(0, bp - b), (0, 0)], mode="edge"),
            batch_sharding(mesh),
        )
        z_star, _ = invert(z0, jax.random.fold_in(jax.random.PRNGKey(2), bi),
                           inv_ref, mask_ref)

        raw = gen(z_star)
        out = postprocess(raw, lidar, tol=args.tol)
        inv_gen = tanh_to_sigmoid(raw["depth_orig" if is_dusty else "depth"])
        points_gen = out["points"].reshape(bp, -1, 3)
        points_ref = xyz_ref.reshape(bp, -1, 3)
        depth_gen = lidar.revert_depth(inv_gen, norm=False)
        depth_ref = lidar.revert_depth(jnp.asarray(inv_ref), norm=False)

        # per-sample metrics, trimmed back from the padded mesh batch
        results["cd"] += np.asarray(compute_cd(points_ref, points_gen))[:b].tolist()
        acc = compute_depth_accuracy(depth_ref, depth_gen, mask_ref)
        for k in ("accuracy_1", "accuracy_2", "accuracy_3"):
            results[k] += np.asarray(acc[k])[:b].tolist()
        err = compute_depth_error(depth_ref, depth_gen, mask_ref)
        for k in ("rmse", "rmse_log", "abs_rel", "sq_rel"):
            results[k] += np.asarray(err[k])[:b].tolist()
        results["tol"] += [args.tol] * b

        h, w = out["depth"].shape[1:3]
        if is_dusty:
            drop = (1 - out["mask"]).sum(axis=(1, 2, 3)) / (h * w)
        else:
            m = (jnp.abs(out["depth"] - 0.0) > args.tol).astype(jnp.float32)
            drop = (1 - m).sum(axis=(1, 2, 3)) / (h * w)
        results["drop_gen"] += np.asarray(drop)[:b].tolist()
        results["drop_ref"] += np.asarray(
            (1 - mask_ref).sum(axis=(1, 2, 3)) / (h * w)
        )[:b].tolist()
        results["index"] += list(range(bi * args.batch_size,
                                       bi * args.batch_size + b))
        print(f"batch {bi}: cd={np.mean(results['cd']):.5f}")

    if pod:
        results = _merge_process_results(results)
    else:
        results.pop("index", None)
    if not is_main:
        return results
    os.makedirs(args.save_dir_path, exist_ok=True)
    timestamp = datetime.datetime.now().isoformat()
    save_path = osp.join(args.save_dir_path, f"{timestamp}.csv")
    import csv

    keys = list(results.keys())
    with open(save_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow([""] + keys)
        for i in range(len(results["cd"])):
            writer.writerow([i] + [results[k][i] for k in keys])
    print(f"Saved: {save_path}")
    return results


if __name__ == "__main__":
    main()
