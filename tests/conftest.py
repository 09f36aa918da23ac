"""Test env: force an 8-device virtual CPU mesh (SURVEY.md §4 rebuild
test plan). The default suite must NEVER touch real TPU hardware.

Two traps handled here:
- the environment presets JAX_PLATFORMS (e.g. 'axon' for the tunneled
  chip), so we hard-override the env var for child processes; and
- the autoloaded jaxtyping pytest plugin imports jax BEFORE this
  conftest, freezing the env-derived config default — so we must also
  update the live jax config, not just the env var.

Real-TPU checks live in the bench script, not the test run."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup on purpose)

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"
