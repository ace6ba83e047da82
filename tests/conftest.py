"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding is validated on
virtual CPU devices (the driver separately dry-run-compiles the multi-chip
path via __graft_entry__.dryrun_multichip).

Note: in the TPU terminal environment a sitecustomize hook registers the
'axon' TPU plugin and forces ``jax_platforms`` via jax.config at interpreter
start, so setting the JAX_PLATFORMS env var is not enough — the config must
be updated after importing jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
