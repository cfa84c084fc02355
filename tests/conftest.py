"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding is validated on
XLA's host-platform virtual devices (the same mechanism the driver's
dryrun uses). Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The sandbox's site customization (axon TPU tunnel) can override
# JAX_PLATFORMS; the config update always wins.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles hundreds of program
# shapes; warm runs skip nearly all of it (host-keyed — see config helper).
import sys as _sys

_sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from myscaledb_tpu.config import enable_compile_cache

enable_compile_cache(os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)


@pytest.fixture()
def db():
    import myscaledb_tpu as ms

    d = ms.connect()
    yield d
    d.close()
