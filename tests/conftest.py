"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not required to test sharding: XLA's CPU backend
exposes N virtual devices (SURVEY.md section 4's recommendation, a capability
the reference lacks — its tests pin ``--devices 0``, reference:
tests/test_sup.py:44).

The environment presets ``JAX_PLATFORMS=axon`` (a tunneled TPU) and pytest's
import graph latches jax's config before conftest runs, so plain env-var
overrides are too late — we update the live jax config instead.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def pytest_addoption(parser):
    parser.addoption("--work_dir", action="store", type=str, default="")


def pytest_generate_tests(metafunc):
    work_dir_value = metafunc.config.option.work_dir
    if "work_dir" in metafunc.fixturenames:
        metafunc.parametrize("work_dir", [work_dir_value])
