"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/pjit paths are
validated on the JAX CPU backend with 8 virtual devices
(SURVEY.md section 4 implication (3)).
"""
import os

# Force-override: the environment pins JAX_PLATFORMS=axon (the TPU tunnel)
# and a sitecustomize re-applies it; tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
