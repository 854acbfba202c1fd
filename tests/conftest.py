"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (SURVEY.md §4): hermetic unit tests that
never need real accelerator hardware. Multi-chip sharding tests use the
8 virtual CPU devices; Pallas kernels run in interpret mode on CPU.
"""

import os

# Must be set before jax is imported anywhere. Force (not setdefault): the
# driver environment pins JAX_PLATFORMS to the real TPU tunnel, which would
# make every unit test pay remote-compile latency.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects the remote-TPU platform regardless of
# the env var; override it again at the config level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
