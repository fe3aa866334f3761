"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of "test multi-node without a cluster"
(SURVEY.md §4b): XLA exposes 8 host devices so sharding/collective code paths
are exercised for real, without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# The host image pins JAX_PLATFORMS=axon via sitecustomize; a config update
# after import is the only reliable override.
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("PNTPU_TEST_PLATFORM", "cpu"))
