"""Place recognition at scale: multi-lap trajectory, 100+ keyframes.

VERDICT r2 #7: the 4096-word session vocabulary was only ever exercised
on one loop of one circle.  This builds a 3-lap figure-eight map with
keyframe culling off and measures the place-recognition stack directly:

  - retrieval recall / false-positive rate of the BoW keyframe database
    over every lap-2+ keyframe (scored WITHOUT the covisibility
    exclusion — on a drift-free synthetic map the tracker re-associates
    lap-1 landmarks as it re-enters, so the covisibility graph connects
    the laps and the end-to-end DetectLoop path correctly decides no
    correction is needed; retrieval quality is what must scale),
  - a FORCED loop closure at scale: geometric verification + the
    hierarchical pose graph (device cap far below the KF count =>
    skeleton + rigid re-attachment) on a true revisit pair, asserting
    every keyframe stays consistent afterwards,
  - end-to-end multi-lap map quality (KF ATE at mm level, 100+ KFs).

Reference: KeyFrameDatabase::DetectLoopCandidates
(src/KeyFrameDatabase.cc), LoopClosing::ComputeSim3/CorrectLoop
(src/LoopClosing.cc:308-627), OptimizeEssentialGraph (Optimizer.cc:2309).
"""

import numpy as np
import pytest

from vieo_slam_tpu.backend.local_mapping import LocalMappingConfig
from vieo_slam_tpu.backend.loop_closing import LoopCloser, LoopClosingConfig
from vieo_slam_tpu.cameras import models as cm
from vieo_slam_tpu.frontend.frame import make_frame_from_features
from vieo_slam_tpu.frontend.tracking import TrackerConfig
from vieo_slam_tpu.io.evaluate import ate
from vieo_slam_tpu.sim.world import (
    SyntheticWorld, WorldConfig, figure_eight_trajectory, trajectory_to_tcw,
)
from vieo_slam_tpu.system import System, SystemConfig

pytestmark = pytest.mark.slow

LAPS = 3
FRAMES_PER_LAP = 120
DT = 0.1
PERIOD = FRAMES_PER_LAP * DT


@pytest.fixture(scope="module")
def multiloop_run():
    cam = cm.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    bf = 400.0 * 0.2
    world = SyntheticWorld(WorldConfig(n_landmarks=6000, seed=9,
                                       extent=(10.0, 6.0, 3.0)))
    n = LAPS * FRAMES_PER_LAP
    ts = np.arange(n) * DT
    omega = 2 * np.pi / PERIOD
    # tangent heading: the viewing direction sweeps 360° per lap, so the
    # BoW signature of each place is heading-specific (the hard case)
    Rwc, twc, _, _ = figure_eight_trajectory(ts, a=3.0, b=1.0, omega=omega)
    Rcw, tcw = trajectory_to_tcw(Rwc, twc)

    sys_ = System(cam, bf, SystemConfig(
        tracker=TrackerConfig(kf_max_interval=3),
        mapper=LocalMappingConfig(kf_cull_min_map=10 ** 9)))
    # pose-graph device cap far below the KF count => any forced closure
    # exercises the hierarchical skeleton path
    lc = LoopCloser(cam, bf, sys_.map, LoopClosingConfig(
        min_kf_gap=30, max_pose_graph_kfs=48))
    sys_.loop_closer = lc

    rng = np.random.RandomState(3)
    for i in range(n):
        obs = world.observe(
            Rcw[i], tcw[i], cam, bf=bf, n_kp=400, pixel_noise=0.3,
            bit_flips=5, clutter=40, rng=rng, max_depth=12.0)
        frame = make_frame_from_features(
            obs["uv"], obs["level"], obs["angle"], obs["desc"],
            obs["valid"], ur=obs["ur"], depth=obs["depth"],
            timestamp=ts[i])
        sys_.track_frame(frame)
    return sys_, ts, twc


def _gt_pose_dist(m, ts, twc, a, b):
    ia = int(round(m.kf_timestamp[a] / DT))
    ib = int(round(m.kf_timestamp[b] / DT))
    return float(np.linalg.norm(twc[ia] - twc[ib]))


class TestPlaceRecognitionScale:
    def test_many_keyframes(self, multiloop_run):
        sys_, *_ = multiloop_run
        assert sys_.map.n_keyframes() >= 100, sys_.map.n_keyframes()

    def test_multilap_map_quality(self, multiloop_run):
        sys_, ts, twc = multiloop_run
        m = sys_.map
        kfs = m.keyframe_ids()
        p = np.stack([-(m.kf_Rcw[k].T @ m.kf_tcw[k]) for k in kfs])
        res = ate(m.kf_timestamp[kfs], p, ts, twc)
        assert res["rmse"] < 0.05, res

    def test_retrieval_recall_and_false_positives(self, multiloop_run):
        """For every lap-2+ keyframe, query the BoW database (raw
        scoring, no covisibility exclusion) and check the top candidates
        against ground truth: recall = a true revisit (GT distance
        < 0.8 m, at least one lap older) ranks in the top 5;
        FP = a top-3 candidate is far (> 2.5 m) — the lemniscate's
        centre crossing with a DIFFERENT heading must not fire."""
        sys_, ts, twc = multiloop_run
        lc = sys_.loop_closer
        m = sys_.map
        kfs = m.keyframe_ids()
        hits = misses = fps = queries = 0
        for k in kfs:
            tk = m.kf_timestamp[k]
            if tk < PERIOD + 1.0:
                continue           # lap 1: nothing to recall yet
            s = lc.db.scores(lc._bow_of(int(k)))
            # consider only keyframes at least 2/3 lap older
            old = kfs[m.kf_timestamp[kfs] < tk - 0.66 * PERIOD]
            if old.size == 0:
                continue
            order = old[np.argsort(-s[old])]
            queries += 1
            top5 = order[:5]
            d5 = [_gt_pose_dist(m, ts, twc, int(k), int(c)) for c in top5]
            if min(d5) < 0.8:
                hits += 1
            else:
                misses += 1
            for c in order[:3]:
                if _gt_pose_dist(m, ts, twc, int(k), int(c)) > 2.5:
                    fps += 1
        assert queries >= 40, queries
        recall = hits / queries
        fp_rate = fps / (3 * queries)
        assert recall >= 0.6, (recall, hits, queries)
        assert fp_rate <= 0.10, (fp_rate, fps, queries)

    def test_forced_closure_at_scale_hierarchical(self, multiloop_run):
        """Run geometric verification + CorrectLoop on a true revisit
        pair with the pose-graph cap far below the KF count: the
        skeleton + rigid re-attachment path must leave EVERY keyframe
        consistent (no silent truncation), with NavState velocities
        finite and the map quality preserved."""
        sys_, ts, twc = multiloop_run
        m = sys_.map
        lc = sys_.loop_closer
        kfs = m.keyframe_ids()
        # pick the latest KF and its best true revisit one lap earlier
        k = int(kfs[-1])
        tk = m.kf_timestamp[k]
        cands = [int(c) for c in kfs
                 if abs((tk - m.kf_timestamp[c]) - PERIOD) < 0.3]
        cands = [c for c in cands
                 if _gt_pose_dist(m, ts, twc, k, c) < 0.5]
        assert cands, "no ground-truth revisit pair found"
        closed = False
        for c in cands:
            if lc._try_close(k, int(c)):
                closed = True
                break
        assert closed, "geometric verification failed on true revisits"
        assert lc.n_loops_closed >= 1
        # every KF still near ground truth (full-coverage correction)
        kfs = m.keyframe_ids()
        p = np.stack([-(m.kf_Rcw[kk].T @ m.kf_tcw[kk]) for kk in kfs])
        res = ate(m.kf_timestamp[kfs], p, ts, twc)
        assert res["rmse"] < 0.05, res
        # NavStates stayed finite through the gauge correction
        assert np.isfinite(m.kf_vwb[kfs]).all()
        assert np.isfinite(m.kf_Rwb[kfs]).all()
        # temporal-chain relative poses stay smooth (no KF left behind
        # in the old gauge — adjacent KFs are ~0.1-0.3 s apart)
        for a, b in zip(kfs[:-1], kfs[1:]):
            dt_rel = np.linalg.norm(
                m.kf_tcw[b] - (m.kf_Rcw[b] @ m.kf_Rcw[a].T) @ m.kf_tcw[a])
            assert dt_rel < 1.0, (int(a), int(b), dt_rel)
