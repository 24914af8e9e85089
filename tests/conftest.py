"""Test configuration: force genuine CPU with 8 virtual devices so
multi-chip sharding (cross-replica BN, data-parallel train steps) is
exercised without TPU hardware.

Note: this environment's sitecustomize registers a TPU PJRT plugin and
calls ``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter
startup, which overrides JAX_PLATFORMS/XLA_FLAGS env vars — so we must
override the *config* after import, before any backend initializes.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# fp32 parity with torch: keep matmuls/convs at full fp32 precision in tests
jax.config.update("jax_default_matmul_precision", "highest")
