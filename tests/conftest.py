"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the standard trick for faking a
multi-device TPU topology on CPU, cf. reference jax/lmc_jax.py:17-18) and with
float64 enabled so that golden-trajectory comparisons against NumPy reference
update rules are meaningful.
"""
import os
import sys

# Force CPU: the terminal presets JAX_PLATFORMS=axon (remote TPU); unit tests
# must run on the virtual 8-device CPU topology. LMC_TEST_TPU=1 keeps the
# real TPU backend instead (runs the @skipif(not ON_TPU) statistical tests;
# x64 stays off — no f64 on TPU).
ON_TPU = os.environ.get("LMC_TEST_TPU", "") == "1"
if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not ON_TPU:
    # The axon sitecustomize overrides JAX_PLATFORMS; force CPU post-import
    # too (must happen before any backend is initialized).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
