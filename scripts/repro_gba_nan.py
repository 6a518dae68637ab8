"""Re-test the guarded Global-BA NaN on the 200-frame loop scenario
(TODO.md backlog) after the SO(3) normalization fix.

Replicates tests/test_loop_closing.loop_run, then runs run_global_ba and
reports whether the solve stays finite and whether apply_ba_result accepts.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np

from vieo_slam_tpu.backend.loop_closing import LoopCloser, LoopClosingConfig
from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import make_frame_from_features
from vieo_slam_tpu.io.evaluate import ate
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, circle_trajectory, trajectory_to_tcw,
)
from vieo_slam_tpu.system import System, SystemConfig


def main():
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=5000, seed=4,
                                       extent=(6.0, 4.5, 3.0)))
    n_frames = 200
    ts = np.arange(n_frames) * 0.1
    Rwc, twc, _, _ = circle_trajectory(ts, radius=1.0, omega=0.35,
                                       look_outward=True)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)
    sys_ = System(cam, bf, SystemConfig())
    sys_.loop_closer = LoopCloser(cam, bf, sys_.map,
                                  LoopClosingConfig(min_kf_gap=8))
    rng = np.random.RandomState(21)
    for i in range(n_frames):
        obs = world.observe(Rcw[i], tcw[i], cam, bf=bf, n_kp=500,
                            pixel_noise=0.25, bit_flips=4, clutter=40,
                            rng=rng, max_depth=10.0)
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], ur=obs["ur"], depth=obs["depth"],
            timestamp=ts[i])
        sys_.track_frame(frame)
        if i % 50 == 0:
            print(f"frame {i} kfs={len(sys_.map.keyframe_ids())}",
                  flush=True)
    m = sys_.map
    print("loops closed:", sys_.loop_closer.n_loops_closed)
    kfs = m.keyframe_ids()
    p_kf = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
    res0 = ate(m.kf_timestamp[kfs], p_kf, ts, twc)
    print(f"pre-GBA  KF ATE rmse={res0['rmse']:.4f}")

    ver = m.version
    sys_.mapper.run_global_ba(stage_iters=(8, 12), distributed=False)
    accepted = m.version != ver
    print("GBA accepted:", accepted)
    print("poses finite:", np.isfinite(m.kf_Rcw[kfs]).all()
          and np.isfinite(m.kf_tcw[kfs]).all())
    lm = np.nonzero(m.lm_valid)[0]
    print("landmarks finite:", np.isfinite(m.lm_pw[lm]).all())
    p_kf = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
    res1 = ate(m.kf_timestamp[kfs], p_kf, ts, twc)
    print(f"post-GBA KF ATE rmse={res1['rmse']:.4f}")


if __name__ == "__main__":
    main()
