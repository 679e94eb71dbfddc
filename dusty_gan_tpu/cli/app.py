"""Interactive demo app (optional streamlit UI over the headless demo CLI).

Mirrors the reference Streamlit app (demo.py:585-599): a sidebar picks the
mode (synthesis / inversion) and its options; the heavy lifting is the
exact same code paths as ``python -m dusty_gan_tpu.cli.demo`` — the app
builds the CLI namespace and renders the panels the CLI writes, so the two
surfaces cannot drift apart.

Run (requires streamlit, which is optional):

    streamlit run dusty_gan_tpu/cli/app.py -- \
        --model-path <ckpt> --config-path <config.yaml>
"""

from __future__ import annotations

import argparse
import glob
import os.path as osp
import tempfile

try:
    import streamlit as st
except ImportError as e:  # pragma: no cover - exercised only with streamlit
    raise SystemExit(
        "streamlit is not installed; use the headless CLI instead:\n"
        "  python -m dusty_gan_tpu.cli.demo {synthesis,inversion} ..."
    ) from e

from dusty_gan_tpu.cli import demo as demo_cli


def _cli_paths():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--config-path", required=True)
    args, _ = parser.parse_known_args()
    return args.model_path, args.config_path


@st.cache_resource
def _workdir() -> str:
    return tempfile.mkdtemp(prefix="dusty_gan_app_")


@st.cache_resource
def _colormaps():
    import matplotlib.pyplot as plt

    return sorted(plt.colormaps())


def _view_options():
    """BEV camera + colormap controls shared by both pages (mirrors the
    reference's set_view_options, demo.py:186-229)."""
    with st.sidebar.expander("view options", expanded=False):
        zoom = st.slider("zoom", min_value=1, max_value=120, value=60, step=1,
                         format="%dm")
        yaw = st.slider("yaw", min_value=-180, max_value=180, value=-45,
                        step=1, format="%d°")
        pitch = st.slider("pitch", min_value=0, max_value=90, value=60,
                          step=1, format="%d°")
        cmap = st.selectbox("color map", _colormaps(),
                            index=_colormaps().index("turbo"))
    return ["--view-zoom", str(zoom), "--view-yaw", str(yaw),
            "--view-pitch", str(pitch), "--cmap", cmap]


def _show_pngs(out_dir: str, caption: str):
    paths = sorted(glob.glob(osp.join(out_dir, "*.png")))
    if not paths:
        st.warning("no panels produced")
        return
    st.caption(caption)
    for p in paths:
        st.image(p, caption=osp.basename(p), use_column_width=True)


def synthesis_ui(model_path: str, config_path: str):
    with st.sidebar.expander("run options", expanded=True):
        num_samples = int(st.number_input("#samples", value=8, min_value=1, max_value=64))
        latent_type = st.selectbox("latent type", ["random", "lerp", "slerp"])
        seed = int(st.number_input("seed", value=0))
        video = st.checkbox("write interpolation video", value=False)
    view = _view_options()
    if st.button("run"):
        out = osp.join(_workdir(), "synthesis")
        with st.spinner("generating…"):
            demo_cli.main(
                ["synthesis", "--model-path", model_path, "--config-path", config_path,
                 "--num-samples", str(num_samples), "--latent-type", latent_type,
                 "--seed", str(seed), "--out", out] + view
                + (["--video"] if video else [])
            )
        _show_pngs(out, f"{latent_type} synthesis, {num_samples} samples")
        if video:
            for v in glob.glob(osp.join(out, "*.gif")) + glob.glob(osp.join(out, "*.mp4")):
                st.video(v) if v.endswith(".mp4") else st.image(v)


def inversion_ui(model_path: str, config_path: str):
    with st.sidebar.expander("run options", expanded=True):
        index = int(st.number_input("test-set index", value=0, min_value=0))
        corruption = st.selectbox(
            "corruption",
            ["none", "additive noise", "low resolution", "dropout",
             "closing", "half", "quarter", "vlines"],
        )
        distance = st.multiselect("loss", ["l1", "l2", "chamfer"], default=["l1"])
        num_step = int(st.number_input("#iterations", value=1000, min_value=1))
        num_code = int(st.number_input("#codes (mGANprior)", value=1, min_value=1))
        compose_layer = int(st.number_input("compose layer", value=1, min_value=0, max_value=3))
        seed = int(st.number_input("seed", value=0))
    view = _view_options()
    if st.button("run"):
        out = osp.join(_workdir(), "inversion")
        with st.spinner(f"optimizing latent for {num_step} steps…"):
            demo_cli.main(
                ["inversion", "--model-path", model_path, "--config-path", config_path,
                 "--index", str(index), "--corruption", corruption,
                 "--distance", ",".join(distance) or "l1",
                 "--num-step", str(num_step), "--num-code", str(num_code),
                 "--compose-layer", str(compose_layer),
                 "--seed", str(seed), "--out", out] + view
            )
        st.balloons()
        _show_pngs(out, f"inversion of test[{index}] under '{corruption}'")


def main():
    st.set_page_config(layout="wide")
    st.title("dusty-gan-tpu demo")
    st.text('"Learning to Drop Points for LiDAR Scan Synthesis" — TPU-native rebuild')

    model_path, config_path = _cli_paths()
    st.sidebar.title("settings")
    mode = st.sidebar.selectbox("mode", ["synthesis", "inversion"])
    if mode == "synthesis":
        synthesis_ui(model_path, config_path)
    else:
        inversion_ui(model_path, config_path)


if __name__ == "__main__":
    main()
