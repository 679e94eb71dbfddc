"""StableHLO export/serving tests: the serialized artifact must reproduce
the live eval-mode generator exactly, support symbolic batch dimensions,
and round-trip through the CLI + manifest verification.  The reference
has no export capability (nearest analog: demo.py reloads the torch
stack per run); this is the framework's deployment path."""

import json
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dusty_gan_tpu.config import compose
from dusty_gan_tpu.models.factory import define_G
from dusty_gan_tpu.utils.export import (
    export_generator,
    load_exported,
    make_serving_fn,
    save_exported,
)
from dusty_gan_tpu.utils.setup import make_fixed_noise

CONFIG_DIR = osp.join(osp.dirname(__file__), "../configs")
TINY = ["model.gen.ch_base=8", "model.gen.ch_max=16",
        "model.dis.ch_base=8", "model.dis.ch_max=16"]


def _tiny_setup(model: str):
    cfg = compose(CONFIG_DIR, [f"model={model}"] + TINY)
    cfg.model.gen.shape = list(cfg.dataset.shape)
    cfg.model.dis.shape = list(cfg.dataset.shape)
    G = define_G(cfg)
    shape = tuple(cfg.dataset.shape)
    in_ch = int(cfg.model.gen.in_ch)
    needs_gumbel = model != "dcgan_eqlr"
    z0 = jnp.zeros((1, in_ch), jnp.float32)
    if needs_gumbel:
        params = G.init({"params": jax.random.PRNGKey(0),
                         "gumbel": jax.random.PRNGKey(1)}, z0)
    else:
        params = G.init(jax.random.PRNGKey(0), z0)
    fixed_noise = make_fixed_noise(G, shape)
    from dusty_gan_tpu.geometry.lidar import Lidar

    rng = np.random.RandomState(0)
    angles = np.stack([
        np.tile(np.linspace(0.1, -0.3, shape[0])[:, None], (1, shape[1])),
        np.tile(np.linspace(-np.pi, np.pi, shape[1])[None, :], (shape[0], 1)),
    ]).astype(np.float32)
    lidar = Lidar.from_angle_array(angles, shape, 0.9, 120.0)
    return cfg, G, params, fixed_noise, lidar, in_ch


class TestExportRoundtrip:
    def test_dusty2_symbolic_batch(self, tmp_path):
        cfg, G, params, noise, lidar, in_ch = _tiny_setup("dusty2_dcgan_eqlr")
        exported = export_generator(
            G, params, noise, lidar, in_ch=in_ch,
            compute_dtype=jnp.float32, tol=0.0,
            batch_size=None, platforms=("cpu", "tpu"),
        )
        path = save_exported(exported, str(tmp_path), {"arch": "dusty2"})
        assert osp.exists(path)
        call, manifest = load_exported(str(tmp_path))
        assert manifest["arch"] == "dusty2"

        fn = make_serving_fn(G, params, noise, lidar,
                             compute_dtype=jnp.float32, tol=0.0)
        for b in (4, 7):  # same artifact, two batch sizes
            z = np.asarray(jax.random.normal(jax.random.PRNGKey(b), (b, in_ch)),
                           np.float32)
            got = call(z)
            want = fn(jnp.asarray(z))
            np.testing.assert_allclose(
                np.asarray(got["depth"]), np.asarray(want["depth"]), atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(got["points"]), np.asarray(want["points"]), atol=1e-5
            )
            h, w = cfg.dataset.shape
            assert got["depth"].shape == (b, h, w, 1)
            assert got["points"].shape == (b, h * w, 3)
            m = np.asarray(got["mask"])
            assert m.shape == (b, h, w, 1)
            assert set(np.unique(m)) <= {0.0, 1.0}
            d = np.asarray(got["depth"])
            assert d.min() >= 0.0 and d.max() <= 1.0
            # masked-out pixels sit at inverse depth 0 (drop_const=-1)
            assert np.all(d[m == 0.0] == 0.0)

    def test_calibrated_threshold_baked_in(self, tmp_path):
        """A calibrated Gumbel keep threshold (utils/calibration.py) rides
        into the artifact: the served mask marginal moves monotonically
        with it, and the artifact matches the live generator at the SAME
        threshold."""
        _, G, params, noise, lidar, in_ch = _tiny_setup("dusty2_dcgan_eqlr")
        z = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (4, in_ch)),
                       np.float32)
        kept = {}
        for thr in (0.2, 0.8):
            d = str(tmp_path / f"thr{thr}")
            exported = export_generator(
                G, params, noise, lidar, in_ch=in_ch,
                compute_dtype=jnp.float32, batch_size=4, platforms=("cpu",),
                with_points=False, mask_threshold=thr,
            )
            save_exported(exported, d, {"mask_threshold": thr})
            call, manifest = load_exported(d)
            assert manifest["mask_threshold"] == thr
            got = call(z)
            kept[thr] = float(np.mean(np.asarray(got["mask"])))
            fn = make_serving_fn(G, params, noise, lidar,
                                 compute_dtype=jnp.float32,
                                 with_points=False, mask_threshold=thr)
            np.testing.assert_allclose(
                np.asarray(got["depth"]),
                np.asarray(fn(jnp.asarray(z))["depth"]), atol=1e-6,
            )
        # raising the keep threshold keeps fewer pixels
        assert kept[0.8] < kept[0.2]

    def test_baseline_has_ones_mask(self, tmp_path):
        _, G, params, noise, lidar, in_ch = _tiny_setup("dcgan_eqlr")
        exported = export_generator(
            G, params, noise, lidar, in_ch=in_ch,
            compute_dtype=jnp.float32, batch_size=3, platforms=("cpu",),
        )
        save_exported(exported, str(tmp_path), {})
        call, _ = load_exported(str(tmp_path))
        z = np.zeros((3, in_ch), np.float32)
        out = call(z)
        assert np.all(np.asarray(out["mask"]) == 1.0)

    def test_fixed_batch_rejects_other_sizes(self, tmp_path):
        _, G, params, noise, lidar, in_ch = _tiny_setup("dusty2_dcgan_eqlr")
        exported = export_generator(
            G, params, noise, lidar, in_ch=in_ch,
            compute_dtype=jnp.float32, batch_size=2, platforms=("cpu",),
            with_points=False,
        )
        save_exported(exported, str(tmp_path), {})
        call, _ = load_exported(str(tmp_path))
        assert "points" not in call(np.zeros((2, in_ch), np.float32))
        with pytest.raises(Exception):
            call(np.zeros((5, in_ch), np.float32))

    def test_manifest_hash_guard(self, tmp_path):
        _, G, params, noise, lidar, in_ch = _tiny_setup("dcgan_eqlr")
        exported = export_generator(
            G, params, noise, lidar, in_ch=in_ch,
            compute_dtype=jnp.float32, batch_size=1, platforms=("cpu",),
            with_points=False,
        )
        path = save_exported(exported, str(tmp_path), {})
        with open(path, "ab") as f:
            f.write(b"corrupt")
        with pytest.raises(ValueError, match="hash mismatch"):
            load_exported(str(tmp_path))


class TestServe:
    @pytest.fixture(scope="class")
    def export_dir(self, tmp_path_factory):
        _, G, params, noise, lidar, in_ch = _tiny_setup("dusty2_dcgan_eqlr")
        d = str(tmp_path_factory.mktemp("serve_export"))
        exported = export_generator(
            G, params, noise, lidar, in_ch=in_ch,
            compute_dtype=jnp.float32, batch_size=None, platforms=("cpu",),
        )
        save_exported(exported, d, {"arch": "dusty2", "in_ch": in_ch,
                                    "batch": "dynamic"})
        return d

    @pytest.fixture(scope="class")
    def server(self, export_dir):
        import threading

        from dusty_gan_tpu.cli.serve import make_server

        server, service = make_server(export_dir, port=0)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{server.server_address[1]}", service
        server.shutdown()
        server.server_close()

    def test_healthz(self, server):
        import urllib.request

        url, _ = server
        with urllib.request.urlopen(url + "/healthz") as r:
            body = json.loads(r.read())
        assert body["ok"] and body["manifest"]["arch"] == "dusty2"

    def test_generate_npz_roundtrip(self, server):
        import io
        import urllib.request

        url, service = server
        req = urllib.request.Request(
            url + "/generate",
            data=json.dumps({"batch": 3, "seed": 7}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            z = np.load(io.BytesIO(r.read()))
        assert set(z.files) == {"depth", "mask", "points"}
        assert z["depth"].shape[0] == 3
        # server latents are seed-stable and batch-prefix-stable
        want = service.generate(service.latents({"batch": 3, "seed": 7}))
        np.testing.assert_array_equal(z["depth"], want["depth"])
        more = service.latents({"batch": 5, "seed": 7})
        np.testing.assert_array_equal(
            service.latents({"batch": 3, "seed": 7}), more[:3]
        )

    def test_generate_client_latents_json(self, server):
        import urllib.request

        url, service = server
        z = np.zeros((2, service.in_ch), np.float32).tolist()
        req = urllib.request.Request(
            url + "/generate?format=json",
            data=json.dumps({"latents": z}).encode(),
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        want = service.generate(np.zeros((2, service.in_ch), np.float32))
        np.testing.assert_allclose(
            np.asarray(out["depth"], np.float32), want["depth"], atol=1e-6
        )

    def test_bad_requests_are_400(self, server):
        import urllib.error
        import urllib.request

        url, service = server
        for body in ({"latents": [[0.0, 1.0]]}, {"batch": 0}):
            req = urllib.request.Request(
                url + "/generate", data=json.dumps(body).encode()
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400


class TestExportCLI:
    def test_cli_end_to_end(self, tmp_path):
        """checkpoint on disk -> cli.export -> artifact verifies + reloads."""
        from dusty_gan_tpu.data.synthetic import build_synthetic_kitti
        from dusty_gan_tpu.models.factory import define_D
        from dusty_gan_tpu.train.checkpoint import save_checkpoint
        from dusty_gan_tpu.train.state import create_train_state, make_optimizer

        root = build_synthetic_kitti(str(tmp_path / "data"),
                                     n_scans_per_seq=4, w0=512)
        cfg = compose(CONFIG_DIR, [
            "model=dusty2_dcgan_eqlr", f"dataset.root={root}",
        ] + TINY)
        cfg.model.gen.shape = list(cfg.dataset.shape)
        cfg.model.dis.shape = list(cfg.dataset.shape)
        G, D = define_G(cfg), define_D(cfg)
        opt = make_optimizer(1e-3, 0.0, 0.99)
        state = create_train_state(
            jax.random.PRNGKey(0), G, D,
            in_ch=int(cfg.model.gen.in_ch),
            image_shape=tuple(cfg.dataset.shape),
            optimizer_g=opt, optimizer_d=opt, needs_gumbel=True,
        )
        ckpt = str(tmp_path / "checkpoint_0000000032.ckpt")
        save_checkpoint(ckpt, state)
        cfg_path = str(tmp_path / "config.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.to_yaml())

        from dusty_gan_tpu.cli.export import main as export_main

        out_dir = str(tmp_path / "export")
        export_main([
            "--model-path", ckpt, "--config-path", cfg_path,
            "--output-dir", out_dir, "--dtype", "f32",
            "--platforms", "cpu", "--tol", "0.004",
        ])  # --no-verify omitted: the CLI self-test must pass too
        call, manifest = load_exported(out_dir)
        assert manifest["tol"] == 0.004
        assert manifest["batch"] == "dynamic"
        assert manifest["image_shape"] == list(cfg.dataset.shape)
        out = call(np.zeros((2, int(cfg.model.gen.in_ch)), np.float32))
        assert out["depth"].shape[0] == 2
        with open(osp.join(out_dir, "manifest.json")) as f:
            assert json.load(f)["arch"] == "dusty2/dcgan_eqlr"
