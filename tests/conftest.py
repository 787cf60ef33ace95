"""Test configuration: force a virtual 8-device CPU mesh.

The environment's sitecustomize registers the 'axon' TPU platform and sets
jax_platforms='axon,cpu' unconditionally, so the JAX_PLATFORMS env var alone
is not enough — we must re-override the config after jax imports (but before
any backend initializes). XLA device-count flags must be set before that.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
