"""Test configuration: CPU-only JAX with 8 virtual devices + float64.

Tests exercise the multi-device sharding paths on a virtual CPU mesh
(real multi-chip TPU hardware is not assumed) and use float64 for
bit-parity checks against the reference's long-double math.
"""

import os

# force CPU: the session environment may point JAX at a (slow, tunneled)
# experimental TPU platform; unit tests must run locally. A sitecustomize
# hook may call jax.config.update("jax_platforms", ...) at interpreter
# start, which overrides the env var — so re-update the config after
# importing jax as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
