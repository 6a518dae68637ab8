"""Diagnose the stereo_async accuracy gap (VERDICT r3 weak #3: async
1.5x worse rmse than sync on the same image-level scenario).

Hypothesis: the r3 keyframe queue depth of 4 let tracking run several
keyframes ahead of the mapping worker, creating KFs (and their
landmarks) on an un-BA'd drifting chain before corrections landed; the
reference's SetAcceptKeyFrames(false) bounds that lag at ~1.

A/B: stereo_async at queue depth 1 vs 4 vs sync, same seeds.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/debug_async_gap.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import evaluate_ntimes as ev  # noqa: E402
import vieo_slam_tpu.system as vsys  # noqa: E402

N = int(os.environ.get("DBG_N", "2"))
FRAMES = int(os.environ.get("DBG_FRAMES", "60"))

RealCfg = vsys.SystemConfig
_orig_track = vsys.System.track_frame


def run(scenario, depth, lockstep=False):
    def cfg_with_depth(*a, **kw):
        c = RealCfg(*a, **kw)
        c.kf_queue_depth = depth
        return c

    def lockstep_track(self, frame):
        st = _orig_track(self, frame)
        if self._kf_queue is not None:
            self._kf_queue.join()   # drain the worker every frame
        return st

    vsys.SystemConfig = cfg_with_depth
    vsys.System.track_frame = lockstep_track if lockstep else _orig_track
    try:
        rows = []
        for run_i in range(N):
            r = ev.run_once(scenario, seed=11 + run_i * 7,
                            n_frames=FRAMES)
            rows.append(r)
            jax.clear_caches()
    finally:
        vsys.SystemConfig = RealCfg
        vsys.System.track_frame = _orig_track
    avg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    print(f"{scenario:>13} depth={depth} lockstep={lockstep}: "
          + " ".join(f"{k}={v:.4f}" for k, v in avg.items()), flush=True)
    return avg


def main():
    import os as _os
    which = _os.environ.get("DBG_WHICH", "lockstep")
    if which == "depth":
        run("stereo", 1)
        run("stereo_async", 1)
        run("stereo_async", 4)
    else:
        run("stereo_async", 1, lockstep=True)
        run("stereo_async", 1, lockstep=False)


if __name__ == "__main__":
    main()
