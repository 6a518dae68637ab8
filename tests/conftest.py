"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The container's sitecustomize pre-registers the TPU (axon) PJRT backend and
pins JAX_PLATFORMS=axon for every interpreter, so env vars are ignored by
the time pytest runs; switch platforms through jax.config instead. The
real-TPU path is exercised by bench.py and __graft_entry__.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
# Some math tests need f64 to verify against closed forms at 1e-9; x64 is
# process-global in JAX, so enable it for the whole suite and require the
# library to be dtype-stable (f32 arrays stay f32 under x64).
jax.config.update("jax_enable_x64", True)
