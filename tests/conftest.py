"""Test configuration.

Force JAX onto a virtual 8-device CPU platform *before* jax imports so
sharding/mesh tests run anywhere; the real-TPU benchmark path is exercised
by bench.py, not the test suite.
"""

import os
import sys

# force-override: the environment pins JAX_PLATFORMS=axon (tunneled TPU),
# and the axon plugin re-asserts itself over the env var, so the platform
# must be pinned at the config level before any backend use.
# HUTOKEN_TPU_TESTS_ON_TPU=1 skips the pin so the accelerator-gated tests
# (e.g. test_pallas_merge.py compiled-kernel parity) run on the real chip.
_ON_TPU = os.environ.get("HUTOKEN_TPU_TESTS_ON_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_global_tokenizer():
    """Each test starts with an uninitialized global tokenizer."""
    import hutoken_tpu

    hutoken_tpu._reset()
    yield
    hutoken_tpu._reset()
