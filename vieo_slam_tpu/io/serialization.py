"""Map checkpoint/resume and trajectory output formats.

Equivalent of the reference's binary map save/load (System.cc:272-420 save,
:69-270 load, via common/serialize helpers) and the trajectory writers
SaveTrajectoryTUM / SaveTrajectoryKITTI / SaveTrajectoryNavState
(System.cc:780-1042).

The map serializes to a single compressed .npz of the struct-of-arrays —
the natural checkpoint format for an array-based map (and loadable into a
sharded restore later); a small JSON sidecar carries scalar state.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..map.map_state import MapConfig, MapState

_ARRAY_FIELDS = [
    "kf_valid", "kf_Rcw", "kf_tcw", "kf_timestamp", "kf_frame_id",
    "kf_Rwb", "kf_pwb", "kf_vwb", "kf_bg", "kf_ba",
    "kf_uv", "kf_level", "kf_desc", "kf_ur", "kf_depth",
    "kf_kp_valid", "kf_lm_idx", "kf_prev", "kf_next",
    "lm_valid", "lm_pw", "lm_desc", "lm_normal", "lm_min_dist",
    "lm_max_dist", "lm_n_obs", "lm_visible", "lm_found",
    "lm_first_kf", "lm_ref_kf",
]


def save_map(m: MapState, path: str):
    """System::SaveMap equivalent (atomic write)."""
    arrays = {f: getattr(m, f) for f in _ARRAY_FIELDS}
    meta = dict(
        version=m.version, big_change_idx=m.big_change_idx,
        next_kf=m._next_kf, next_lm=m._next_lm,
        cfg=dict(max_keyframes=m.cfg.max_keyframes,
                 max_landmarks=m.cfg.max_landmarks,
                 max_kp=m.cfg.max_kp, max_obs=m.cfg.max_obs,
                 n_levels=m.cfg.n_levels,
                 scale_factor=m.cfg.scale_factor),
    )
    tmp = path + ".tmp"
    np.savez_compressed(tmp, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_map(path: str) -> MapState:
    """System::LoadMap equivalent."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    m = MapState(MapConfig(**meta["cfg"]))
    for f in _ARRAY_FIELDS:
        setattr(m, f, z[f].copy())
    m.version = meta["version"]
    m.big_change_idx = meta["big_change_idx"]
    m._next_kf = meta["next_kf"]
    m._next_lm = meta["next_lm"]
    return m


# ---------------------------------------------------------------------------
# Trajectory formats
# ---------------------------------------------------------------------------


def _quat_wxyz(R: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    from ..math import lie

    return np.asarray(lie.quat_from_rotmat(jnp.asarray(R)))


def write_trajectory_tum(path: str, trajectory):
    """TUM: `t x y z qx qy qz qw` of Twc (SaveTrajectoryTUM)."""
    with open(path, "w") as f:
        for t, Rcw, tcw, _state in trajectory:
            Rwc = Rcw.T
            twc = -Rwc @ tcw
            q = _quat_wxyz(Rwc)
            f.write(f"{t:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n")


def write_trajectory_kitti(path: str, trajectory):
    """KITTI: 12 floats of the 3x4 Twc matrix (SaveTrajectoryKITTI)."""
    with open(path, "w") as f:
        for _t, Rcw, tcw, _state in trajectory:
            Rwc = Rcw.T
            twc = -Rwc @ tcw
            T = np.concatenate([Rwc, twc[:, None]], axis=1).reshape(-1)
            f.write(" ".join(f"{x:.9e}" for x in T) + "\n")


def write_trajectory_navstate(path: str, m: MapState):
    """NavState format: `t p q v bg ba` per keyframe
    (SaveTrajectoryNavState, System.cc:860)."""
    with open(path, "w") as f:
        for k in m.keyframe_ids():
            q = _quat_wxyz(m.kf_Rwb[k])
            p = m.kf_pwb[k]
            v = m.kf_vwb[k]
            bg = m.kf_bg[k]
            ba = m.kf_ba[k]
            vals = [m.kf_timestamp[k], *p, q[1], q[2], q[3], q[0],
                    *v, *bg, *ba]
            f.write(" ".join(f"{x:.7f}" for x in vals) + "\n")
