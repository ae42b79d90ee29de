"""Test config: run on CPU with an 8-device virtual mesh (multi-chip sharding
tests run on virtual devices; bench runs on the real TPU separately)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin force-overrides jax_platforms at import; pin tests to CPU
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402,F401
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cbox_scene():
    from vision_tpu.scene.scene import Scene
    from tests.fixtures import CBOX_JSON
    return Scene(CBOX_JSON, scene_dir=os.path.dirname(__file__))
