"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding paths are validated on a host-platform device mesh
(SURVEY.md §4): set the env BEFORE jax initialises.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize/env pair may pin JAX_PLATFORMS to a TPU plugin before
# conftest runs; the config update wins over the captured env value.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite recompiles identical TINY
# programs every run — caching cuts repeat runs by minutes on this
# single-core host.  The dir is fingerprinted by the host CPU: XLA:CPU
# AOT artifacts are machine-specific, and loading a cache produced on
# a different box returns CORRUPTED results (observed: garbage masks)
# (model name + flags: VM hosts expose the same model string with
# differing feature sets, which still corrupts AOT artifacts)
from blackbox_tpu.utils.compilecache import (  # noqa: E402
    enable_persistent_cache as _epc, host_fingerprint as _hfp)
_fp = _hfp()
if not os.environ.get("BBT_NO_CACHE"):
    # via enable_persistent_cache so its known-answer canary runs: a
    # stale/incompatible cache is wiped instead of feeding the suite
    # silently corrupted executables (observed: garbage masks)
    _epc(f"/tmp/jax_cache_blackbox_tpu_tests_{_fp}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from blackbox_tpu.core.geometry import TINY  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked @pytest.mark.slow")


def pytest_collection_modifyitems(config, items):
    # default-fast suite: slow marks deselect unless --runslow is given
    # (the full suite takes >9 min on a 1-core host)
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: enable with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def geom():
    return TINY


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
