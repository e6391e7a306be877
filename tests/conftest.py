"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not required to test sharding: XLA's CPU backend
exposes N virtual devices via ``--xla_force_host_platform_device_count``
(SURVEY.md section 4's recommendation, a capability the reference lacks —
its tests pin ``--devices 0``, reference: tests/test_sup.py:44).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def pytest_addoption(parser):
    parser.addoption("--work_dir", action="store", type=str, default="")


def pytest_generate_tests(metafunc):
    work_dir_value = metafunc.config.option.work_dir
    if "work_dir" in metafunc.fixturenames:
        metafunc.parametrize("work_dir", [work_dir_value])
