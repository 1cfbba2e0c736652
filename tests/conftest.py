"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding (pjit over a Mesh) is
exercised without TPU hardware — the TPU-world equivalent of multi-node testing
(SURVEY.md §4). Env vars must be set before jax import.
"""

import importlib.util
import os
import sys

# Force CPU for tests even when the session env points JAX at the TPU tunnel
# (JAX_PLATFORMS=axon): tests exercise sharding on 8 virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("KERAS_BACKEND", "tensorflow")
# Quieter TF on the 1-core CI host; disable oneDNN fast-math so the Keras oracle
# computes in true fp32 (oneDNN's reduced precision is ~1% off on matmuls).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ["TF_ENABLE_ONEDNN_OPTS"] = "0"
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

# A pytest plugin imports jax before this conftest runs, so the env-var defaults are
# already latched into jax.config — override the config directly (the backend itself
# initializes lazily, so this still takes effect).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def load_reference_module(name: str):
    """Import a single module file from the read-only reference repo as a test oracle.

    Loads e.g. ``scheduler`` or ``long_prompt_weighting`` standalone (they only need
    numpy), avoiding the package ``__init__`` which drags in the full Keras stack.
    """
    path = os.path.join(REFERENCE_ROOT, "stable_diffusion", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def reference_package():
    """Import the full reference package (Keras models) for parity oracles."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import stable_diffusion as ref  # noqa: F401

    return ref
