"""Export a native checkpoint as a reference-format PyTorch ``.pth``.

Inverse of ``resume=<reference .pth>`` / the eval CLIs' ``.pth`` support:
models trained in this framework become checkpoints the reference's own
tooling (demo, evaluators, trainer resume) loads with
``load_state_dict(strict=True)`` — migration round-trips in both
directions (see utils/torch_export.py for the layout inversions).

    python -m dusty_gan_tpu.cli.export_pth \
        --model-path <run>/models/checkpoint_0025000000.ckpt \
        --config-path <run>/.hydra/config.yaml \
        --output checkpoint_0025000000.pth
"""

from __future__ import annotations

import argparse
import os
import os.path as osp


def main(argv=None):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, required=True,
                        help="native .ckpt checkpoint")
    parser.add_argument("--config-path", type=str, required=True)
    parser.add_argument("--output", type=str, required=True,
                        help=".pth path to write")
    args = parser.parse_args(argv)

    import jax

    from dusty_gan_tpu.config import load_config
    from dusty_gan_tpu.models.dusty import DUSty1, DUSty2
    from dusty_gan_tpu.models.factory import define_D, define_G
    from dusty_gan_tpu.train.checkpoint import restore_checkpoint
    from dusty_gan_tpu.train.state import create_train_state, make_optimizer
    from dusty_gan_tpu.utils.torch_export import save_reference_checkpoint

    if not args.model_path.endswith(".ckpt"):
        raise SystemExit("--model-path must be a native .ckpt checkpoint "
                         "(a .pth is already reference-format)")
    cfg = load_config(args.config_path)
    cfg.model.gen.shape = list(cfg.dataset.shape)
    cfg.model.dis.shape = list(cfg.dataset.shape)
    G, D = define_G(cfg), define_D(cfg)

    # template with the training-time optimizer trees so both Adam moment
    # sets restore (same construction as train/trainer.py:108-116)
    lr = cfg.solver.lr
    decay = lr.alpha.get("decay", {}) if hasattr(lr.alpha, "get") else {}
    dk = dict(decay_gamma=float(decay.get("gamma", 1.0)),
              decay_step_size=int(decay.get("step_size", 1)))
    opt_g = make_optimizer(float(lr.alpha.gen), float(lr.beta1), float(lr.beta2), **dk)
    opt_d = make_optimizer(float(lr.alpha.dis), float(lr.beta1), float(lr.beta2), **dk)
    template = create_train_state(
        jax.random.PRNGKey(0), G, D,
        in_ch=int(cfg.model.gen.in_ch), image_shape=tuple(cfg.dataset.shape),
        optimizer_g=opt_g, optimizer_d=opt_d,
        needs_gumbel=isinstance(G, (DUSty1, DUSty2)),
    )
    state, _ = restore_checkpoint(args.model_path, template)

    os.makedirs(osp.dirname(osp.abspath(args.output)), exist_ok=True)
    save_reference_checkpoint(args.output, state, cfg)
    print(f"exported reference-format checkpoint: {args.output} "
          f"(#images {int(state.step)})")
    return args.output


if __name__ == "__main__":
    main()
