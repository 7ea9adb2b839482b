"""Test configuration: force an 8-virtual-device CPU platform before JAX
initializes, and enable x64 so kernels can be validated against the
reference's double-precision semantics. The production TPU path runs the same
kernels in float32."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU-tunnel backend and
# forces jax_platforms="axon,cpu"; initializing axon costs ~2 minutes of
# tunnel handshake. Override back to cpu BEFORE any backend is touched.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
