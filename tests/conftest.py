"""Test configuration: run JAX on a virtual 8-device CPU mesh so the
sharded (multi-chip) code paths are exercised without TPU hardware.

Note: the environment may pre-register a TPU backend via sitecustomize
and export JAX_PLATFORMS pointing at it; `jax.config.update` after
import is the override that actually sticks (env vars alone do not).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Separate compilation cache from TPU runs: entries AOT-compiled via the
# remote TPU-era toolchain can carry CPU features this host lacks.
os.environ.setdefault(
    "SHASTA_TPU_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "shasta_tpu_jax_cpu"),
)

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow integration tests")
