import os

# enable the expensive engine invariant checks in tests
os.environ.setdefault("GENFER_CHECK", "1")

# Force CPU with a virtual 8-device mesh so multi-chip sharding logic is
# exercised in CI without TPU hardware (the driver dry-runs the real thing).
# Note: the env var JAX_PLATFORMS is overridden by the axon plugin in this
# environment, so we must use jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
