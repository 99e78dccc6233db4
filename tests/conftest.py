import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding layouts
# execute without a TPU pod. bench.py (run by the driver) uses the real chip.
#
# NOTE: the axon TPU plugin on this machine ignores JAX_PLATFORMS=cpu, so
# the default device must be forced explicitly after import (the fixture
# below); the XLA flag still creates the 8 virtual CPU devices.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()


def pytest_configure(config):
    try:
        import jax
    except ImportError:
        return
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
