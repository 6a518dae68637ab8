"""System facade: the public entry point of the framework.

Equivalent of include/System.h / src/System.cc (System::System :484,
TrackStereo :615, TrackOdom :19, SaveTrajectoryTUM :780, Shutdown :765):
constructs and wires the pipeline stages, routes frames and odometry,
switches modes, saves maps and trajectories.

Concurrency model (replaces the reference's 4-thread + mutex design,
SURVEY.md §2.4): pipeline stages run as host-orchestrated jitted programs
against versioned map snapshots.  Tracking runs per frame; local mapping
runs synchronously at keyframe insertion (its device programs overlap
tracking's via JAX async dispatch); loop closing and GBA run on demand at
keyframe cadence.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import numpy as np

from .backend.local_mapping import LocalMapper, LocalMappingConfig
from .cameras import models as cm
from .frontend.frame import Frame
from .frontend.tracking import Tracker, TrackerConfig, TrackState  # noqa: F401
from .map.map_state import MapConfig, MapState
from .utils.metrics import metrics


class SensorMode(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


@dataclasses.dataclass
class SystemConfig:
    sensor: SensorMode = SensorMode.STEREO
    map: MapConfig = dataclasses.field(default_factory=MapConfig)
    tracker: TrackerConfig = dataclasses.field(default_factory=TrackerConfig)
    mapper: LocalMappingConfig = dataclasses.field(
        default_factory=LocalMappingConfig)
    localization_only: bool = False
    # Pipeline concurrency (the reference's Tracking/LocalMapping thread
    # split, SURVEY §2.4): when True, keyframe processing (local mapping,
    # loop closing, GBA) runs on a worker thread against map.lock'd
    # snapshots while tracking continues; map corrections reach the
    # tracker through pending_correction at the next frame boundary
    # (bMapUpdated semantics).  When False everything is synchronous.
    async_mapping: bool = False
    # Backend queue depth: how many keyframes tracking may run ahead of
    # the mapping worker before back-pressure blocks.  Depth 1 blocks
    # the tracker whenever two KFs arrive within one worker cycle,
    # costing the async pipeline its p99 latency win; depth 2 keeps the
    # lag bounded near the reference's SetAcceptKeyFrames semantics
    # (one in flight + one queued) without stalling tracking.  Measured
    # accuracy is depth-insensitive over 1..4 (the r3 async accuracy
    # gap was pipeline lag, not queue depth — scripts/debug_async_gap).
    kf_queue_depth: int = 2


class System:
    """Public API facade."""

    def __init__(self, cam: cm.Camera, bf: float,
                 cfg: Optional[SystemConfig] = None):
        self.cfg = cfg or SystemConfig()
        self.cam = cam
        self.bf = float(bf)
        self.map = MapState(self.cfg.map)
        self.tracker = Tracker(cam, bf, self.map, self.cfg.tracker)
        self.mapper = LocalMapper(cam, bf, self.map, self.cfg.mapper)
        self.loop_closer = None   # attached by loop/ module when enabled
        self._kf_queue = None
        self._worker = None
        self._worker_error = None
        # Map-gauge correction listeners: every sink gets
        # push_correction(R_old, t_old, R_new, t_new) under map.lock when
        # the worker moves a keyframe (the tracker by default; a VIO
        # frontend adds itself so its NavState follows the same gauge).
        self.correction_sinks = [self.tracker]
        # When True (set by a VIO frontend in async mode), track_frame
        # records a new keyframe in `deferred_kf` instead of dispatching
        # it — the frontend finishes its per-frame fusion first, then
        # calls dispatch_keyframe().  This reproduces the reference's
        # ordering, where TrackWithIMU runs before the KF reaches the
        # LocalMapping queue (Tracking.cc:950 state machine).
        self.defer_kf_dispatch = False
        self.deferred_kf = None
        # Background GBA slot (async mode): the reference's transient GBA
        # thread + mnFullBAIdx abort protocol (LoopClosing.cc:720-824).
        import threading
        self._gba_lock = threading.Lock()
        self._gba_thread = None
        self._gba_abort = None
        if self.cfg.async_mapping:
            self._start_worker()

    # ------------------------------------------------------------------

    def _start_worker(self):
        import queue
        import threading

        self._kf_queue = queue.Queue(maxsize=self.cfg.kf_queue_depth)
        self._worker = threading.Thread(
            target=self._worker_loop, name="local-mapping", daemon=True)
        self._worker.start()

    def _worker_loop(self):
        """LocalMapping+LoopClosing worker (the reference's backend
        threads, LocalMapping.cc:56 / LoopClosing.cc:93)."""
        while True:
            item = self._kf_queue.get()
            if item is None:
                self._kf_queue.task_done()
                return
            k, post_hook = item
            try:
                with self.map.lock:
                    R_old = self.map.kf_Rcw[k].copy()
                    t_old = self.map.kf_tcw[k].copy()
                self._process_keyframe_stage(k)
                if post_hook is not None:
                    # e.g. the VIO PRV window BA (the reference replaces
                    # the vision local BA with it inside the same
                    # LocalMapping thread, LocalMapping.cc:129-147).
                    post_hook(k)
                with self.map.lock:
                    R_new = self.map.kf_Rcw[k].copy()
                    t_new = self.map.kf_tcw[k].copy()
                    for sink in self.correction_sinks:
                        sink.push_correction(R_old, t_old, R_new, t_new)
            except Exception as e:       # surfaced on the next track call
                self._worker_error = e
            finally:
                self._kf_queue.task_done()

    def wait_idle(self):
        """Block until the mapping worker has drained its queue (the
        reference's CheckFinish/RequestStop handshake before save/GBA)."""
        if self._kf_queue is not None:
            self._kf_queue.join()
        with self._gba_lock:
            t = self._gba_thread
        if t is not None:
            t.join()
        if self._worker_error is not None:
            err, self._worker_error = self._worker_error, None
            raise err

    def _process_keyframe_stage(self, new_kf: int):
        """Backend work for one keyframe: local mapping, loop closing,
        follow-up GBA.  Runs inline (sync mode) or on the worker."""
        with metrics.timer("local_mapping"):
            self.mapper.process_keyframe(new_kf)
        if self.loop_closer is not None:
            with metrics.timer("loop_closing"):
                closed = self.loop_closer.process_keyframe(new_kf)
            if closed:
                # Loop closed: grind the pose-graph solution down with a
                # global BA (the reference's GBA thread,
                # LoopClosing::RunGlobalBundleAdjustment).  Async mode
                # runs it as an abortable background task so the mapping
                # worker keeps draining keyframes; sync mode inline.
                metrics.count("loops_closed")
                if self._kf_queue is not None:
                    self._request_gba()
                else:
                    with metrics.timer("gba"):
                        self.mapper.run_global_ba()

    def _request_gba(self):
        """Launch (or supersede) the background GBA.  A newer request
        aborts the in-flight solve — the reference bumps mnFullBAIdx and
        sets mbStopGBA (LoopClosing.cc:504-516); the aborted run discards
        its result and the fresh one sees the newer map."""
        import threading
        with self._gba_lock:
            if self._gba_abort is not None:
                self._gba_abort.set()
            abort = threading.Event()
            prev = self._gba_thread
            t = threading.Thread(target=self._gba_worker,
                                 args=(prev, abort), name="gba",
                                 daemon=True)
            self._gba_abort = abort
            self._gba_thread = t
            t.start()

    def _gba_worker(self, prev, abort):
        try:
            if prev is not None:
                prev.join()
            if abort.is_set():
                return
            with metrics.timer("gba"):
                ok = self.mapper.run_global_ba(
                    abort=abort, correction_sinks=self.correction_sinks)
            if not ok:
                metrics.count("gba_aborted")
        except Exception as e:    # surfaced on the next track call
            self._worker_error = e

    def track_frame(self, frame: Frame) -> TrackState:
        """Track one pre-built Frame (feature-level entry; image-level
        wrappers in frontend.frame build Frames from pixels)."""
        if self._worker_error is not None:
            err, self._worker_error = self._worker_error, None
            raise err
        with metrics.timer("frame"):
            with metrics.timer("track"):
                state = self.tracker.track(frame)
            if state == TrackState.LOST and self.loop_closer is not None:
                # Relocalization against the keyframe database
                # (Tracking::Relocalization path).
                from .frontend.relocalization import try_relocalize

                with metrics.timer("relocalize"), self.map.lock:
                    if try_relocalize(self, self.loop_closer, frame):
                        state = self.tracker.state
                        metrics.count("reloc_success")
                metrics.count("reloc_attempts")
            new_kf = self.tracker.last_new_kf
            if new_kf is not None and not self.cfg.localization_only:
                metrics.count("keyframes")
                if self.defer_kf_dispatch:
                    # A VIO frontend owns dispatch: it stores the fused
                    # NavState on the KF first, then calls
                    # dispatch_keyframe().
                    self.deferred_kf = new_kf
                elif self._kf_queue is not None:
                    # async: hand the KF to the worker; a full queue
                    # applies back-pressure like the reference's
                    # SetAcceptKeyFrames(false)
                    self._kf_queue.put((new_kf, None))
                else:
                    self._process_keyframe_stage(new_kf)
                    # Local BA may have moved the new KF (and the map):
                    # rebase the tracker's pose so the next prediction
                    # is map-consistent.
                    self.tracker.rebase_to_keyframe(new_kf)
        metrics.set_gauge("map_keyframes", int(self.map.n_keyframes()))
        metrics.set_gauge("map_landmarks", int(self.map.n_landmarks()))
        metrics.count(f"state_{state.name}")
        return state

    def dispatch_keyframe(self, post_hook=None):
        """Send the deferred keyframe to the backend (worker in async
        mode, inline otherwise).  `post_hook(k)` runs after local
        mapping/loop closing of that KF, in the same stage — the slot the
        reference's LocalMapping thread gives the PRV local BA."""
        k, self.deferred_kf = self.deferred_kf, None
        if k is None:
            return
        if self._kf_queue is not None:
            self._kf_queue.put((k, post_hook))
        else:
            self._process_keyframe_stage(k)
            if post_hook is not None:
                post_hook(k)
            self.tracker.rebase_to_keyframe(k)

    # ------------------------------------------------------------------

    def trajectory(self, optimized: bool = True):
        """Per-frame camera trajectory [(t, Rcw, tcw, state)].

        optimized=True recovers each frame pose by composing its stored
        frame-to-reference-KF relative transform with the reference
        keyframe's CURRENT pose (System::SaveTrajectoryTUM semantics,
        src/System.cc:780-860) — so local BA, loop corrections, and the
        final GBA retroactively improve the whole trajectory, the
        reference's with/without-full-BA A/B.  optimized=False returns
        the live poses as tracked."""
        if not optimized or not self.tracker.trajectory_rel:
            return self.tracker.trajectory
        out = []
        m = self.map
        for t, ref, R_cr, t_cr, state in self.tracker.trajectory_rel:
            if ref < 0:
                out.append((t, R_cr, t_cr, state))
                continue
            # erased reference KFs keep their last stored pose — an
            # approximation of the reference's spanning-tree walk for
            # bad parents (KeyFrame::GetParent accumulation)
            R_ref, t_ref = m.kf_Rcw[ref], m.kf_tcw[ref]
            Rcw = R_cr @ R_ref
            tcw = R_cr @ t_ref + t_cr
            out.append((t, Rcw, tcw, state))
        return out

    def trajectory_tum(self, optimized: bool = True) -> str:
        """TUM format: t x y z qx qy qz qw of Twc
        (System::SaveTrajectoryTUM)."""
        from .math import lie
        import jax.numpy as jnp
        lines = []
        for t, Rcw, tcw, state in self.trajectory(optimized):
            Rwc = Rcw.T
            twc = -Rwc @ tcw
            q = np.asarray(lie.quat_from_rotmat(jnp.asarray(Rwc)))
            lines.append(
                f"{t:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}"
            )
        return "\n".join(lines) + "\n"

    def save_trajectory_tum(self, path: str):
        with open(path, "w") as f:
            f.write(self.trajectory_tum())

    # ------------------------------------------------------------------

    def save_map(self, path: str):
        """System::SaveMap (src/System.cc:272): persist the sparse map."""
        from .io.serialization import save_map
        self.wait_idle()
        save_map(self.map, path)

    def load_map(self, path: str):
        """System::LoadMap + MAP_REUSE (src/System.cc:69-270, :578-586):
        replace the live map with the checkpoint, rebuild the
        place-recognition database from the loaded keyframes, and put the
        tracker into a lost-until-relocalized state so the next frame
        relocalizes against the loaded map."""
        from .io.serialization import load_map

        self.wait_idle()
        self.map = load_map(path)
        self.tracker.map = self.map
        self.mapper.map = self.map
        if self.loop_closer is not None:
            self.loop_closer.map = self.map
            self.loop_closer.rebuild_database()
        self.tracker.state = TrackState.LOST
        self.tracker.velocity = None
        self.tracker.last_kf_id = int(self.map.keyframe_ids()[-1]) \
            if self.map.n_keyframes() else -1

    def set_localization_mode(self, on: bool):
        """ActivateLocalizationMode / DeactivateLocalizationMode
        (System.cc:636-711 mode switch inside TrackStereo): tracking-only
        when on — no keyframes, no mapping."""
        self.cfg.localization_only = bool(on)

    def reset(self):
        """System::Reset: fresh map, tracker re-initializes."""
        self.wait_idle()
        self.deferred_kf = None
        self.map = MapState(self.cfg.map)
        old_tracker = self.tracker
        self.tracker = Tracker(self.cam, self.bf, self.map,
                               self.cfg.tracker)
        self.correction_sinks = [
            self.tracker if s is old_tracker else s
            for s in self.correction_sinks]
        self.mapper = LocalMapper(self.cam, self.bf, self.map,
                                  self.cfg.mapper)
        if self.loop_closer is not None:
            self.loop_closer.map = self.map
            self.loop_closer.db = None

    def final_global_ba(self):
        """System::FinalGBA (System.cc:24): one full-map BA at shutdown,
        the reference's with/without-full-BA A/B output."""
        self.wait_idle()
        self.mapper.run_global_ba(stage_iters=(10, 15))

    def metrics_report(self) -> dict:
        """Per-stage timing stats + event counters (the reference's
        mlog::Timer cumulative report + GetTrackingState poll API,
        System.h:131-136)."""
        return metrics.report()

    def shutdown(self, print_report: bool = False):
        """Flush pending device work (System::Shutdown); optionally print
        the per-stage timing report (stereo_euroc.cc:325-333 exit
        report)."""
        import jax
        self.wait_idle()
        if self._worker is not None:
            self._kf_queue.put(None)
            self._worker.join(timeout=30.0)
            self._worker = None
            self._kf_queue = None
        # Block on any async dispatches still in flight.
        jax.effects_barrier()
        if print_report:
            print(metrics.format_report())
