"""Test configuration: force an 8-device virtual CPU mesh for all tests.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count) since only one real TPU chip is
available in CI; see SURVEY.md §4 (test strategy).

Note: the environment's sitecustomize pre-imports jax and registers the
'axon' TPU backend, so JAX_PLATFORMS env vars are ineffective — we must
switch platforms via jax.config.update after import. XLA_FLAGS still works
as long as it is set before the CPU client is first instantiated.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("SDFLABEL_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"
REFERENCE_SDFRENDERER = os.path.join(REFERENCE_ROOT, "sdfrenderer")


def add_reference_paths():
    """Make the PyTorch reference importable for golden-parity tests."""
    for p in (REFERENCE_SDFRENDERER, REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.append(p)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_available():
    add_reference_paths()
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False
