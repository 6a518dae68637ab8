"""Map lifecycle at sequence scale (VERDICT weak #10 / missing #5):
capacity growth instead of crashes, landmark slot reuse, keyframe
culling with the VIO timespan rule."""

import numpy as np

from vieo_slam_tpu.map.map_state import MapConfig, MapState


def _add_kf(m, k, t=0.0, lm_idx=None, n=16):
    lm = np.full(n, -1, np.int64) if lm_idx is None else lm_idx
    return m.add_keyframe(
        Rcw=np.eye(3, dtype=np.float32), tcw=np.zeros(3, np.float32),
        timestamp=t, frame_id=k,
        uv=np.random.rand(n, 2).astype(np.float32),
        level=np.zeros(n, np.int32),
        desc=np.zeros((n, 8), np.uint32),
        ur=np.full(n, -1.0, np.float32),
        depth=np.full(n, -1.0, np.float32),
        kp_valid=np.ones(n, bool), lm_idx=lm,
    )


def test_keyframe_capacity_growth():
    m = MapState(MapConfig(max_keyframes=8, max_landmarks=64, max_kp=16))
    for i in range(20):
        _add_kf(m, i, t=i * 0.1)
    assert m.n_keyframes() == 20
    assert m.cfg.max_keyframes >= 20
    # temporal chain survives growth
    ids = m.keyframe_ids()
    assert m.kf_prev[ids[-1]] == ids[-2]


def test_landmark_growth_and_slot_reuse():
    m = MapState(MapConfig(max_keyframes=8, max_landmarks=16, max_kp=16))
    ids1 = m.add_landmarks(np.zeros((10, 3), np.float32),
                           np.zeros((10, 8), np.uint32), first_kf=0)
    m.lm_found[ids1] = 5
    m.erase_landmarks(ids1[:4])
    ids2 = m.add_landmarks(np.ones((4, 3), np.float32),
                           np.zeros((4, 8), np.uint32), first_kf=1)
    # freed slots reused, counters reset
    assert set(ids2) == set(ids1[:4].tolist())
    assert (m.lm_found[ids2] == 0).all()
    assert (m.lm_first_kf[ids2] == 1).all()
    # growth beyond capacity
    big = m.add_landmarks(np.zeros((30, 3), np.float32),
                          np.zeros((30, 8), np.uint32), first_kf=2)
    assert m.cfg.max_landmarks >= 40
    assert m.lm_valid[big].all()


def test_keyframe_culling_redundancy_and_timespan():
    from vieo_slam_tpu.backend.local_mapping import (LocalMapper,
                                                     LocalMappingConfig)
    from vieo_slam_tpu.cameras import models as cm

    cull_cfg = LocalMappingConfig(kf_cull_min_map=0, kf_cull_min_age=1,
                                  kf_cull_max_per_pass=10)
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    m = MapState(MapConfig(max_keyframes=32, max_landmarks=256, max_kp=16))
    lm_ids = m.add_landmarks(np.random.rand(16, 3).astype(np.float32),
                             np.zeros((16, 8), np.uint32), first_kf=0)
    # 6 KFs all observing the same 16 landmarks -> massively redundant
    for i in range(6):
        _add_kf(m, i, t=i * 0.1, lm_idx=lm_ids.astype(np.int64))
        np.add.at(m.lm_n_obs, lm_ids, 1)
    mapper = LocalMapper(cam, 80.0, m, cull_cfg)
    k = int(m.keyframe_ids()[-1])
    mapper.cull_keyframes(k)
    assert m.n_keyframes() < 6          # some mid KFs culled

    # VIO timespan rule: widely spaced KFs must NOT be culled
    m2 = MapState(MapConfig(max_keyframes=32, max_landmarks=256, max_kp=16))
    lm2 = m2.add_landmarks(np.random.rand(16, 3).astype(np.float32),
                           np.zeros((16, 8), np.uint32), first_kf=0)
    for i in range(6):
        _add_kf(m2, i, t=i * 0.4, lm_idx=lm2.astype(np.int64))
        np.add.at(m2.lm_n_obs, lm2, 1)
    mapper2 = LocalMapper(cam, 80.0, m2, cull_cfg)
    mapper2.vio_active = True           # 0.8 s gaps > 0.5 s cap
    mapper2.cull_keyframes(int(m2.keyframe_ids()[-1]))
    assert m2.n_keyframes() == 6


def test_landmark_geometry_and_predict_scale():
    """MapPoint maintenance: distinctive descriptor = min-median-Hamming
    member, normal = mean viewing ray, PredictScale inverts the
    scale-invariance band (src/MapPoint.cc)."""
    m = MapState(MapConfig(max_keyframes=8, max_landmarks=32, max_kp=8,
                           n_levels=8, scale_factor=1.2))
    rng = np.random.RandomState(0)
    lm = m.add_landmarks(np.asarray([[0.0, 0.0, 5.0]], np.float32),
                         np.zeros((1, 8), np.uint32), first_kf=0)
    base = rng.randint(0, 2 ** 32, 8, dtype=np.uint64).astype(np.uint32)
    descs = np.tile(base, (3, 1))
    descs[1, 0] ^= 0x3        # 2-bit flip
    descs[2] = rng.randint(0, 2 ** 32, 8, dtype=np.uint64).astype(
        np.uint32)            # far outlier
    for j, tx in enumerate((-0.5, 0.0, 0.5)):
        n = 8
        lm_idx = np.full(n, -1, np.int64)
        lm_idx[0] = lm[0]
        desc = np.zeros((n, 8), np.uint32)
        desc[0] = descs[j]
        level = np.zeros(n, np.int32)
        level[0] = 2
        m.add_keyframe(
            Rcw=np.eye(3, dtype=np.float32),
            tcw=np.asarray([tx, 0, 0], np.float32),
            timestamp=j * 0.1, frame_id=j,
            uv=np.zeros((n, 2), np.float32), level=level, desc=desc,
            ur=np.full(n, -1.0, np.float32),
            depth=np.full(n, -1.0, np.float32),
            kp_valid=np.ones(n, bool), lm_idx=lm_idx)
    m.update_landmark_geometry(lm)
    # representative descriptor = one of the two near-identical ones
    d0 = int(np.bitwise_count(m.lm_desc[lm[0]] ^ base).sum())
    assert d0 <= 2, d0
    # normal points from the cameras toward the landmark (+z)
    assert m.lm_normal[lm[0]][2] > 0.9
    # band: ref KF center [0.5,0,0], landmark [0,0,5], level 2
    ref_dist = np.sqrt(0.5 ** 2 + 5 ** 2)
    assert abs(m.lm_max_dist[lm[0]] - ref_dist * 1.2 ** 2) < 1e-3
    # predict_scale: from the ref KF's own centre, level == ref level
    lvl = m.predict_scale(lm, np.asarray([0.5, 0, 0], np.float32))
    assert lvl[0] == 2, lvl
    # closer -> finer level (higher octave number = coarser in ORB terms:
    # closer means LARGER apparent scale -> higher predicted octave)
    lvl_close = m.predict_scale(lm, np.asarray([0, 0, 2.5], np.float32))
    assert lvl_close[0] > 2


def test_found_ratio_cull_scoped_to_probation():
    """MapPointCulling parity (LocalMapping.cc:351): the found-ratio
    cull applies ONLY while a landmark is in the probation list — an
    ESTABLISHED landmark whose found/visible ratio later dips below
    0.25 must survive (the r4 global cull erased established landmarks
    under fast rotational sweep and starved tracking of exactly the
    map it needed; measured in scripts/debug_lemniscate.py)."""
    import numpy as np
    from vieo_slam_tpu.backend.local_mapping import (
        LocalMapper, LocalMappingConfig)
    from vieo_slam_tpu.cameras import models as cm
    from vieo_slam_tpu.map.map_state import MapState

    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    from vieo_slam_tpu.map.map_state import MapConfig
    m = MapState(MapConfig())
    rng = np.random.RandomState(0)
    pw = rng.randn(20, 3).astype(np.float32) + [0, 0, 5]
    desc = rng.randint(0, 2 ** 32, (20, 8), np.uint64).astype(np.uint32)

    # KF 0 so cull bookkeeping has a frame of reference
    n_kp = 20
    m.add_keyframe(Rcw=np.eye(3, dtype=np.float32),
                   tcw=np.zeros(3, np.float32), timestamp=0.0, frame_id=0,
                   uv=np.zeros((n_kp, 2), np.float32),
                   level=np.zeros(n_kp, np.int32), desc=desc,
                   ur=np.full(n_kp, -1, np.float32),
                   depth=np.full(n_kp, -1, np.float32),
                   kp_valid=np.ones(n_kp, bool),
                   lm_idx=np.full(n_kp, -1, np.int32))
    mapper = LocalMapper(cam, 80.0, m, LocalMappingConfig())

    # established landmarks: NOT in mapper.recent_lms, terrible ratio
    ids_est = m.add_landmarks(pw[:10], desc[:10], first_kf=0)
    m.lm_visible[ids_est] = 40
    m.lm_found[ids_est] = 2            # ratio 0.05 << 0.25
    m.lm_n_obs[ids_est] = 5

    # probation landmarks with the same terrible ratio
    ids_new = m.add_landmarks(pw[10:], desc[10:], first_kf=3)
    m.lm_visible[ids_new] = 40
    m.lm_found[ids_new] = 2
    m.lm_n_obs[ids_new] = 5            # obs fine; ratio is the killer
    mapper.recent_lms.append((3, ids_new))

    mapper.cull_landmarks(k=4)
    assert m.lm_valid[ids_est].all(), "established landmarks culled"
    assert not m.lm_valid[ids_new].any(), "probation ratio cull missing"
