import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharding/kernel code paths are
# exercised without TPU hardware (the bench runs on the real chip).
# The axon sitecustomize force-sets JAX_PLATFORMS=axon, so override it
# unconditionally before jax initializes a backend.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize also does jax.config.update("jax_platforms", ...),
# which outranks the env var — override it back to cpu before any backend
# initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

