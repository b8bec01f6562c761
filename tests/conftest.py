"""Test configuration: force an 8-virtual-device CPU platform.

Must run before the first `import jax` anywhere in the test session so that
sharding tests exercise a real multi-device mesh without TPU hardware
(SURVEY.md §4: multi-host is tested with mesh-shape parametrization on a
virtual device mesh).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS at import
# time; updating the config after import wins and keeps the whole test
# session on the 8-virtual-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
