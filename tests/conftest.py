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

# Persistent compilation cache: repeated pytest runs skip XLA recompiles
# of the train-step graphs (the round-1 suite spent most of its wall time
# recompiling identical tiny-config HLO — VERDICT.md 'What's weak' #3).
# Scoped per machine so XLA:CPU AOT entries written on another host can't
# poison this one (round-2 weak #6).
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from imagegenerator_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache(os.path.join(os.path.dirname(__file__), ".jax_cache"))
