"""Test env: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware.

Note: this image's axon sitecustomize force-registers the tunneled TPU and
rewrites jax_platforms, so setting JAX_PLATFORMS env alone is not enough —
we also reset the config after importing jax.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
