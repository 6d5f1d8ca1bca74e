"""Test configuration: force an 8-device virtual CPU mesh.

Per SURVEY.md §4, distributed behavior is tested without a TPU cluster by
simulating 8 host devices (``--xla_force_host_platform_device_count=8``).
The axon sitecustomize registers the TPU plugin and programmatically sets
``jax_platforms``; we must both set XLA_FLAGS before backend init and
override the platform config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
