"""Test env: force the JAX CPU backend with 8 virtual devices.

This is the TPU-world replacement for "multi-node tests without a cluster"
(SURVEY.md §4): pjit/sharding tests run against a fake 8-device mesh.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# NOTE: do NOT enable the persistent compilation cache here — with this
# environment's remote-compile backend it slows every compile ~4x and never
# lands entries on disk.

# The CPU backend's default matmul precision truncates to bf16; golden-value
# parity tests against torch need full f32 accumulation.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
