"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise a real Mesh without TPU hardware (SURVEY.md §4.7), and enable
x64 so physics checks can validate the f32 path against f64.

Note: the environment pre-sets JAX_PLATFORMS to the TPU plugin and the
plugin overrides the env var, so the platform must be forced through
jax.config after import."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the interpret-mode kernel graphs dominate
# suite runtime (~80 s XLA:CPU compiles); repeat runs hit the cache
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BFLBM_JAX_CACHE",
                                 "/tmp/bflbm_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running physics test")
    config.addinivalue_line(
        "markers", "physics: statistical physics validation test")
