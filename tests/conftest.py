"""Test env: force an 8-device virtual CPU mesh before any jax import
(SURVEY.md §4 rebuild test plan). Real-TPU checks live behind the
`tpu` marker and the bench script, not the default test run."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
