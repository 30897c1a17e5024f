"""Test configuration: run the suite on CPU with fp64 and 8 virtual devices.

Correctness tests need fp64 (the 1e-8 stabilized-G gate, SURVEY.md §7) and
a multi-device mesh for the parallel-tempering/sharding tests (SURVEY.md §5
implication (f)). The driver benches separately on the real TPU chip.

NOTE: this container's sitecustomize pre-imports jax and registers the axon
TPU plugin, so env vars set here would be too late — jax.config.update is
the reliable path and works as long as no backend has been initialized yet.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
