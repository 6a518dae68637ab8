"""Instrumented VIEO debug: per-frame direct position error + init params
for (backend on, backend off) x (enc, imu-only).  CPU."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np  # noqa: E402

import test_vieo_system as tv  # noqa: E402
import vieo_slam_tpu.vio.frontend as vf  # noqa: E402

real_cfg = vf.VioConfig


def run(use_encoder, backend):
    def patched(**kw):
        if not backend:
            kw["init_final_span"] = 1e9
        return real_cfg(**kw)

    tv.VioConfig = patched
    sys_, vio, states, res, bridge = tv._run(use_encoder)
    tv.VioConfig = real_cfg
    ts = np.arange(tv.N_FRAMES) * 0.1
    Rwc, twc, _, _ = tv.circle_trajectory(ts, radius=1.0, omega=0.4,
                                          look_outward=True)
    traj = sys_.tracker.trajectory
    p_est = np.asarray([-(x[1].T @ x[2]) for x in traj])
    p_world = p_est @ Rwc[0].T + twc[0]       # est world = cam0 frame
    err = np.linalg.norm(p_world - twc, axis=1)
    tag = f"enc={int(use_encoder)} be={int(backend)}"
    print(f"== {tag}: rmse={res['rmse']:.3f} bridge={bridge:.3f} "
          f"gw={np.round(vio.gw, 3)} bg={np.round(vio.bg, 4)} "
          f"ba={np.round(vio.ba, 3)}")
    for i in range(0, tv.N_FRAMES, 5):
        print(f"  f{i:3d} err={err[i]:.3f} st={states[i].name}")
    sys.stdout.flush()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "enc_nobe"):
        run(True, False)
    if which in ("all", "enc_be"):
        run(True, True)
    if which in ("all", "imu_be"):
        run(False, True)
