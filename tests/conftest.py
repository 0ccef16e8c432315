"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip hardware is unavailable in CI; sharding tests run on
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4's test strategy for
the rebuild). Must run before the first ``import jax`` in any test module.
"""

import os

# The environment pins JAX_PLATFORMS=axon (tunneled TPU); tests must run on
# the virtual CPU mesh, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize re-registers the TPU backend at interpreter start;
# jax.config wins over the env var at backend-selection time.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
