"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4: distributed tests without a real cluster via
``--xla_force_host_platform_device_count=8``. Must run before jax imports.
"""

import os

# Force CPU regardless of ambient platform wiring (the machine exposes a
# single real TPU chip via an experimental PJRT plugin whose site hook
# overrides jax_platforms at interpreter start; tests want the virtual
# 8-device CPU mesh). Set CXR_TEST_TPU=1 to run on real hardware instead.
_FORCE_CPU = os.environ.get("CXR_TEST_TPU") != "1"
if _FORCE_CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU tests deterministic and quiet.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
# etils epath picks its gs:// backend ONCE at import: force the
# fsspec/gcsfs backend (honors STORAGE_EMULATOR_HOST) before anything —
# orbax, another test — imports etils, or the GCS-emulator checkpoint
# tests get the tf-gfile backend whose endpoint is unoverridable.
os.environ.setdefault("EPATH_USE_TF", "0")

import jax  # noqa: E402

if _FORCE_CPU:
    # The PJRT site hook calls jax.config.update("jax_platforms", "axon,cpu")
    # at interpreter start, which takes precedence over the env var — undo it
    # before any backend initializes.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
