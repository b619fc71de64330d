"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md §4.4). Must run before
jax is imported anywhere in the test process."""
import os

# keep the CPU-backend test tier fast: the TPU-tuned default TILE=512
# doubles every interpret-mode / jnp-tracer array; the code paths under
# test are identical at 256 (the kernels are parametric in TILE)
os.environ.setdefault("PBRT_TPU_TILE", "256")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
