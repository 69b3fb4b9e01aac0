"""Test harness: run JAX on a virtual 8-device CPU mesh.

The reference offers no fake backend (SURVEY.md §4); the TPU-native analog is
XLA's host-platform device-count override, which lets every sharding/pjit test
execute multi-device semantics on CPU.
Set ICEK_TPU_TESTS=1 to run on real accelerators instead.
"""

import os

if not os.environ.get("ICEK_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import pathlib
import sys

import numpy as np
import pytest

if not os.environ.get("ICEK_TPU_TESTS"):
    # The env var alone is not enough under the axon tunnel harness — the
    # platform must also be forced through the live config.
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = pathlib.Path("/root/reference")


def reference_subproject(name: str):
    """Import a reference subproject's modules as a parity oracle (skip if
    the reference mount is unavailable)."""
    path = REFERENCE_ROOT / name
    if not path.exists():
        pytest.skip(f"reference {name} not mounted")
    import importlib
    import types

    if "torchvision" not in sys.modules:
        # reference models.py imports torchvision at module level but only
        # uses it inside Encoder.__init__, which these tests never call.
        stub = types.ModuleType("torchvision")
        stub.models = types.SimpleNamespace(
            resnet101=lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("torchvision stub: pretrained resnet unavailable")
            )
        )
        sys.modules["torchvision"] = stub

    saved = {
        mod: sys.modules.pop(mod)
        for mod in ("models", "utils", "datasets")
        if mod in sys.modules
    }
    sys.path.insert(0, str(path))
    try:
        models = importlib.import_module("models")
        utils = importlib.import_module("utils")
        importlib.reload(models)
        importlib.reload(utils)
        return models, utils
    finally:
        sys.path.pop(0)
        for mod in ("models", "utils", "datasets"):
            sys.modules.pop(mod, None)
        sys.modules.update(saved)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
