"""Test env: force the JAX CPU backend with 8 virtual devices.

This is the TPU-world replacement for "multi-node tests without a cluster"
(SURVEY.md §4): pjit/sharding tests run against a fake 8-device mesh.
Must run before jax is imported anywhere.
"""

import os

# The outer environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests
# must run on the local CPU backend with virtual devices, so FORCE it.
os.environ["JAX_PLATFORMS"] = "cpu"
# NOTE: forcing 8 virtual devices here makes every remote compile in this
# environment ~10x slower, so the bulk of the suite runs single-device;
# mesh/sharding tests (test_parallel_and_train.py) run their checks in one
# subprocess with --xla_force_host_platform_device_count=8.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1").strip()

# NOTE: do NOT enable the persistent compilation cache here — with this
# environment's remote-compile backend it slows every compile ~4x and never
# lands entries on disk.

# NOTE: parity-sensitive tests set matmul precision locally via
# `jax.default_matmul_precision("highest")` — forcing it globally makes the
# CPU backend's conv compiles explode through this environment's remote
# compile service.

# sitecustomize imports jax at interpreter startup with JAX_PLATFORMS=axon
# already in the env, so the env assignment above may be too late — force
# the config programmatically and verify.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
