"""Demo CLI — the reference ``demo.py`` is a Streamlit app (synthesis with
latent interpolation + inversion with corruptions and multi-code
mGANprior).  Streamlit isn't in this image, so the same capabilities ship
as a headless CLI that writes PNG panels; when streamlit IS importable the
same functions can back an interactive app.

    python -m dusty_gan_tpu.cli.demo synthesis \
        --model-path … --config-path … [--latent-type random|lerp|slerp]
        [--num-samples 8] [--out demo_out]

    python -m dusty_gan_tpu.cli.demo inversion \
        --model-path … --config-path … [--corruption dropout|closing|…]
        [--distance l1|l2|chamfer] [--num-code 1] [--num-step 1000]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np


def _save_png(path, img):
    from PIL import Image

    img = np.asarray(np.clip(img, 0, 1) * 255, np.uint8)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, -1)
    Image.fromarray(img).save(path)


COLOR_SCALE = 1 / 0.4  # demo.py's color_scale for inverse depth


def _camera(zoom, yaw, pitch):
    """BEV camera from the reference's view sliders (demo.py:188-229):
    zoom in meters -> t = [0.1*z, 0, z]/120; yaw/pitch in degrees ->
    R = Rz@Ry@Rx over [0, pitch, -yaw].  Returns (R, t) for
    ``render_point_clouds``; (None, [0,0,0.5]) when no view requested."""
    if zoom is None and yaw is None and pitch is None:
        return None, np.asarray([0.0, 0.0, 0.5], np.float32)
    from dusty_gan_tpu.geometry.normals import euler_angles_to_rotation_matrix

    zoom = 60.0 if zoom is None else float(zoom)      # slider defaults
    yaw = -45.0 if yaw is None else float(yaw)
    pitch = 60.0 if pitch is None else float(pitch)
    t_z = zoom / 120.0
    t = np.asarray([0.1 * t_z, 0.0, t_z], np.float32)
    angles = np.asarray([0.0, pitch / 180.0 * np.pi, -yaw / 180.0 * np.pi])
    return euler_angles_to_rotation_matrix(angles), t


def synthesis(args):
    import jax
    import jax.numpy as jnp

    from dusty_gan_tpu.geometry.render import render_point_clouds
    from dusty_gan_tpu.utils.inversion import lerp, slerp
    from dusty_gan_tpu.utils.postprocess import cmap_table, colorize, postprocess
    from dusty_gan_tpu.utils.setup import make_eval_generator, setup

    cfg, G, params, lidar, fixed_noise = setup(args.model_path, args.config_path)
    gen = make_eval_generator(G, params, fixed_noise)
    key = jax.random.PRNGKey(args.seed)
    n = args.num_samples
    cmap = cmap_table(args.cmap)

    if args.latent_type == "random":
        latent = jax.random.normal(key, (n, int(cfg.model.gen.in_ch)))
    else:
        ends = jax.random.normal(key, (2, int(cfg.model.gen.in_ch)))
        f = lerp if args.latent_type == "lerp" else slerp
        latent = jnp.concatenate(
            [f(w, ends[:1], ends[1:]) for w in np.linspace(0, 1, n)], axis=0
        )

    out = postprocess(gen(latent), lidar)
    os.makedirs(args.out, exist_ok=True)
    panels = []
    if "depth_orig" in out:
        panels.append(("inverse_depth", colorize(np.asarray(out["depth_orig"]) * COLOR_SCALE, cmap)))
    if "confidence" in out:
        conf = np.asarray(out["confidence"])
        if conf.shape[-1] == 2:
            panels.append(("measurability_pix", colorize(conf[..., :1], cmap)))
            panels.append(("measurability_img", colorize(conf[..., 1:], cmap)))
        else:
            panels.append(("measurability", colorize(conf, cmap)))
    if "mask" in out:
        mask = np.asarray(out["mask"])
        panels.append(("mask", np.repeat(mask.prod(-1, keepdims=True), 3, -1)))
    panels.append(("inverse_depth_with_drops", colorize(np.asarray(out["depth"]) * COLOR_SCALE, cmap)))
    panels.append(("point_normal", np.asarray(out["normals"])))
    pts = np.asarray(out["points"]).reshape(n, -1, 3)
    nrm = np.asarray(out["normals"]).reshape(n, -1, 3)
    R, t = _camera(args.view_zoom, args.view_yaw, args.view_pitch)
    bev = np.asarray(render_point_clouds(pts, nrm, L=512, R=R, t=t))
    panels.append(("point_clouds_bev", bev))

    for i in range(n):
        for name, tensor in panels:
            _save_png(osp.join(args.out, f"{i:02d}_{name}.png"), tensor[i])
    print(f"wrote {n * len(panels)} panels to {args.out}")

    if args.video:
        # one frame per sample: 2x-upscaled colorized inverse depth stacked
        # over the BEV render (reference save_videos, utils/__init__.py:182-191)
        from dusty_gan_tpu.utils.video import save_video

        depth_rgb = colorize(np.asarray(out["depth"]) * COLOR_SCALE, cmap)  # (n,H,W,3)
        frames = []
        for i in range(n):
            top = np.repeat(np.repeat(depth_rgb[i], 2, 0), 2, 1)
            pad = bev.shape[2] - top.shape[1]
            if pad > 0:
                top = np.pad(top, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)))
            elif pad < 0:
                # full-resolution models (e.g. 64x2048): the 2x depth panel
                # is wider than the BEV render — center-crop it to match
                off = -pad // 2
                top = top[:, off : off + bev.shape[2]]
            frames.append(np.concatenate([top, bev[i]], axis=0))
        path = save_video(frames, osp.join(args.out, f"{args.latent_type}"), fps=args.video_fps)
        print("wrote", path)


def inversion(args):
    import jax
    import jax.numpy as jnp

    from dusty_gan_tpu.data.datasets import define_dataset
    from dusty_gan_tpu.geometry.lidar import tanh_to_sigmoid
    from dusty_gan_tpu.metrics.chamfer import chamfer_distance
    from dusty_gan_tpu.models import losses
    from dusty_gan_tpu.utils.corruption import apply_corruption
    from dusty_gan_tpu.utils.inversion import (
        make_inversion_loop, make_multicode_loop, project_sphere,
    )
    from dusty_gan_tpu.utils.postprocess import cmap_table, colorize, postprocess
    from dusty_gan_tpu.utils.setup import make_eval_generator, setup

    cfg, G, params, lidar, fixed_noise = setup(args.model_path, args.config_path)
    gen = make_eval_generator(G, params, fixed_noise)
    is_dusty = "dusty" in str(cfg.model.gen.arch)
    key = jax.random.PRNGKey(args.seed)

    ds = define_dataset(cfg.dataset, phase="test")
    item = ds[args.index]
    dep_ref = jnp.asarray(item["depth"])[None]  # [0,1] depth, NHWC
    mask_ref = jnp.asarray(item["mask"])[None]

    inv_ref = lidar.invert_depth(dep_ref) * mask_ref
    dep_c, mask_c = apply_corruption(key, inv_ref, mask_ref, args.corruption)
    inv_c, mask_c = dep_c * mask_c, mask_c
    pts_ref = lidar.inv_to_xyz(inv_c, 1e-8).reshape(1, -1, 3)

    distances = args.distance.split(",")

    def apply_composed(z, alpha):
        kwargs = dict(compute_dtype=jnp.float32, compose_layer=args.compose_layer,
                      compose_alpha=alpha)
        if is_dusty:
            kwargs.update(train=False, fixed_noise=fixed_noise)
            return G.apply(params, z, rngs={"gumbel": jax.random.PRNGKey(0)}, **kwargs)
        return G.apply(params, z, **kwargs)

    def loss_fn(latent):
        if args.num_code > 1:
            out = apply_composed(latent["z"], latent["alpha"])
        else:
            out = gen(latent)
        inv_gen = tanh_to_sigmoid(out["depth_orig"] if is_dusty else out["depth"])
        loss = 0.0
        if "chamfer" in distances:
            pts_gen = lidar.inv_to_xyz(inv_gen, 1e-8).reshape(1, -1, 3)
            dl, dr = chamfer_distance(pts_ref, pts_gen)
            loss = loss + dl.mean(1) + dr.mean(1)
        if "l1" in distances:
            loss = loss + losses.masked_loss(inv_c, inv_gen, mask_c, "l1")
        if "l2" in distances:
            loss = loss + losses.masked_loss(inv_c, inv_gen, mask_c, "l2")
        return loss

    if args.num_code > 1:
        # multi-code optimization: latent is a pytree {z, alpha}
        # stage widths: proj emits ch(3), up{k} emits ch(2-k) (dcgan_eqlr.py
        # Generator.__call__) — derive from the backbone so non-default
        # ch_base/ch_max configs compose correctly
        backbone = getattr(G, "backbone", G)
        feature_ch = backbone.ch(3 - args.compose_layer)
        z0 = {
            "z": project_sphere(jax.random.normal(key, (args.num_code, int(cfg.model.gen.in_ch)))),
            "alpha": jnp.full((args.num_code, 1, 1, feature_ch), 1.0 / args.num_code),
        }
        # whole optimization = ONE compiled fori_loop program (the
        # single-code path below compiles the same way)
        run = jax.jit(make_multicode_loop(loss_fn, num_steps=args.num_step))
        lat = run(z0)
        out = apply_composed(lat["z"], lat["alpha"])
    else:
        run = jax.jit(make_inversion_loop(loss_fn, num_steps=args.num_step, lr=0.1))
        z0 = jax.random.normal(key, (1, int(cfg.model.gen.in_ch)))
        z_star, final_loss = run(z0, jax.random.fold_in(key, 1))
        print("final loss:", np.asarray(final_loss))
        out = gen(z_star)

    out = postprocess(out, lidar)
    os.makedirs(args.out, exist_ok=True)
    cmap = cmap_table(args.cmap)
    _save_png(osp.join(args.out, "ref_inv.png"),
              colorize(np.asarray(inv_ref) * COLOR_SCALE, cmap)[0])
    _save_png(osp.join(args.out, "ref_inv_corrupted.png"),
              colorize(np.asarray(inv_c * mask_c) * COLOR_SCALE, cmap)[0])
    _save_png(osp.join(args.out, "gen_inv.png"),
              colorize(np.asarray(out["depth"]) * COLOR_SCALE, cmap)[0])
    if "depth_orig" in out:
        _save_png(osp.join(args.out, "gen_inv_orig.png"),
                  colorize(np.asarray(out["depth_orig"]) * COLOR_SCALE, cmap)[0])
    _save_png(osp.join(args.out, "gen_normals.png"), np.asarray(out["normals"])[0])

    # BEV renders of the (corrupted) reference and reconstructed clouds
    # (reference inversion page, demo.py:400,542)
    from dusty_gan_tpu.geometry.normals import xyz_to_normal
    from dusty_gan_tpu.geometry.render import render_point_clouds

    R, t = _camera(args.view_zoom, args.view_yaw, args.view_pitch)
    xyz_ref = lidar.inv_to_xyz(inv_c * mask_c, 1e-8)
    nrm_ref = np.asarray(xyz_to_normal(xyz_ref)).reshape(1, -1, 3)
    bev_ref = np.asarray(render_point_clouds(
        np.asarray(pts_ref), nrm_ref, L=512, R=R, t=t))
    _save_png(osp.join(args.out, "ref_bev.png"), bev_ref[0])
    pts_gen = np.asarray(out["points"]).reshape(1, -1, 3)
    nrm_gen = np.asarray(out["normals"]).reshape(1, -1, 3)
    bev_gen = np.asarray(render_point_clouds(pts_gen, nrm_gen, L=512, R=R, t=t))
    _save_png(osp.join(args.out, "gen_bev.png"), bev_gen[0])
    print("wrote inversion panels to", args.out)


def main(argv=None):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="mode", required=True)

    ps = sub.add_parser("synthesis")
    ps.add_argument("--model-path", required=True)
    ps.add_argument("--config-path", required=True)
    ps.add_argument("--num-samples", type=int, default=8)
    ps.add_argument("--latent-type", choices=["random", "lerp", "slerp"], default="random")
    ps.add_argument("--seed", type=int, default=0)
    ps.add_argument("--out", default="demo_out/synthesis")
    ps.add_argument("--video", action="store_true",
                    help="also write an interpolation video (mp4 if cv2 is "
                         "importable, else GIF)")
    ps.add_argument("--video-fps", type=float, default=10.0)
    ps.add_argument("--view-zoom", type=float, default=None,
                    help="BEV camera distance in meters (1-120; reference "
                         "slider default 60). Omitting all three view flags "
                         "keeps the legacy fixed top-down view")
    ps.add_argument("--view-yaw", type=float, default=None,
                    help="BEV camera yaw in degrees (-180..180, default -45)")
    ps.add_argument("--view-pitch", type=float, default=None,
                    help="BEV camera pitch in degrees (0..90, default 60)")
    ps.add_argument("--cmap", default="turbo",
                    help="matplotlib colormap for depth/confidence panels "
                         "(reference app's color-map selector)")
    ps.set_defaults(fn=synthesis)

    pi = sub.add_parser("inversion")
    pi.add_argument("--model-path", required=True)
    pi.add_argument("--config-path", required=True)
    pi.add_argument("--index", type=int, default=0)
    pi.add_argument("--corruption", default="none",
                    choices=["none", "additive noise", "low resolution", "dropout",
                             "closing", "half", "quarter", "vlines", "hlines",
                             "random lines"])
    pi.add_argument("--distance", default="l1")  # comma-separated: l1,l2,chamfer
    pi.add_argument("--num-code", type=int, default=1)
    pi.add_argument("--compose-layer", type=int, default=1)
    pi.add_argument("--num-step", type=int, default=1000)
    pi.add_argument("--seed", type=int, default=0)
    pi.add_argument("--out", default="demo_out/inversion")
    pi.add_argument("--view-zoom", type=float, default=None)
    pi.add_argument("--view-yaw", type=float, default=None)
    pi.add_argument("--view-pitch", type=float, default=None)
    pi.add_argument("--cmap", default="turbo")
    pi.set_defaults(fn=inversion)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
