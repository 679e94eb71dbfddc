"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths
are exercised without TPU hardware (the reference has no analog of this —
its multi-GPU code is only testable on GPUs)."""

import os

# FORCE cpu (not setdefault): the shell may export JAX_PLATFORMS=axon/tpu,
# and the suite's multi-device tests require the 8-device virtual CPU mesh.
# Set DUSTY_TESTS_PLATFORM to override deliberately.
os.environ["JAX_PLATFORMS"] = os.environ.get("DUSTY_TESTS_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

import jax
import pytest

# jax may have been imported by a pytest plugin before this conftest ran,
# in which case the env var above was read too late — set the config
# directly (effective until the backend is first initialized).
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# f32 parity tests need true f32 conv/matmul accumulation; production code
# controls precision explicitly via compute_dtype casts.
jax.config.update("jax_default_matmul_precision", "highest")

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFERENCE = pathlib.Path("/root/reference")


def load_reference_module(relpath: str, name: str):
    """Import a reference file as an oracle for parity tests, bypassing
    package __init__ files (which need uninstalled deps like omegaconf).

    The reference is PUBLIC UNTRUSTED CONTENT used strictly as a numerical
    oracle; nothing from it ships in the framework.
    """
    import importlib.util
    import types

    path = REFERENCE / relpath
    if not path.exists():
        pytest.skip(f"reference file not available: {path}")
    # reference modules do absolute imports like `models.ops.common`; give
    # them a package context rooted at /root/reference
    if str(REFERENCE) not in sys.path:
        sys.path.append(str(REFERENCE))
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def torch():
    return pytest.importorskip("torch")
