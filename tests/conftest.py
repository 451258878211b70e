"""Test configuration: simulate an 8-device mesh on CPU.

Multi-device logic is tested without TPU hardware the same way the reference's
multi-rank logic would be tested without a cluster: by forcing the host
platform to expose 8 virtual devices (SURVEY.md §4).

Note: in this environment the TPU ('axon') plugin ignores the JAX_PLATFORMS
env var, so the platform must also be forced via jax.config before any
backend initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
