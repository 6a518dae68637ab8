"""vieo_slam_tpu — TPU-native visual-inertial-encoder SLAM in JAX/XLA/Pallas.

A from-scratch re-design of the capabilities of leavesnight/VIEO_SLAM
(C++/ORB-SLAM2-lineage) for TPU hardware:

  - batched, fixed-shape frontend (ORB pyramid / FAST / rBRIEF / Hamming
    matching) built from XLA-fusable array ops and Pallas kernels;
  - on-manifold IMU + wheel-encoder preintegration as `lax.scan` programs;
  - factor-graph bundle adjustment (motion-only / local-window / global /
    Sim3 pose graph) as dense-Schur Levenberg-Marquardt replacing g2o;
  - map state as struct-of-arrays pytrees with version counters replacing
    the reference's mutexed pointer graph;
  - multi-chip scale-out via jax.sharding meshes + shard_map collectives.

Public entry point: `vieo_slam_tpu.system.System` (equivalent of the
reference's include/System.h facade).
"""

__version__ = "0.2.0"

import jax as _jax

# Geometry/BA math must run in true f32: the TPU MXU's default bf16 matmul
# precision accumulates ~1e-1 rotation error over a few hundred chained 3x3
# products (measured on v5e). Hot kernels that want bf16 throughput request
# it explicitly (preferred_element_type / Pallas), so the global default is
# precision, not speed.
_jax.config.update("jax_default_matmul_precision", "highest")

# Lazy top-level API (importing the submodules eagerly would pull the
# whole frontend/backend at `import vieo_slam_tpu`).
_API = {
    "System": "system", "SystemConfig": "system", "SensorMode": "system",
    "VioFrontend": "vio.frontend", "VioConfig": "vio.frontend",
    "LoopCloser": "backend.loop_closing",
    "LoopClosingConfig": "backend.loop_closing",
}


def __getattr__(name):
    if name in _API:
        import importlib
        mod = importlib.import_module(f".{_API[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
