"""Visualization: map and frame drawers + a polling viewer.

Headless TPU-container equivalent of the reference's Pangolin/OpenCV GUI
(src/Viewer.cc Viewer::Run; src/MapDrawer.cc DrawMapPoints/DrawKeyFrames;
src/FrameDrawer.cc Update/DrawFrame): instead of an interactive window it
renders PNG snapshots with matplotlib (Agg) at a configurable keyframe
cadence — the artifacts the reference's menu buttons produce (camera view,
map view, localization-mode overlays) become files.

All drawing is host-side numpy on map snapshots; nothing here touches the
device path.
"""

from __future__ import annotations

import os

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


class MapDrawer:
    """3D map render: landmarks, keyframe frusta, trajectory
    (MapDrawer::DrawMapPoints :from src/MapDrawer.cc, DrawKeyFrames,
    DrawCurrentCamera)."""

    def __init__(self, frustum_scale: float = 0.1):
        self.frustum_scale = frustum_scale

    def _frustum(self, Rcw, tcw, s):
        """Wireframe pyramid of one camera in world coords."""
        Rwc = Rcw.T
        twc = -Rwc @ tcw
        pts_c = np.array([[0, 0, 0], [-s, -0.75 * s, s], [s, -0.75 * s, s],
                          [s, 0.75 * s, s], [-s, 0.75 * s, s]], np.float32)
        pts_w = pts_c @ Rwc.T + twc
        edges = [(0, 1), (0, 2), (0, 3), (0, 4),
                 (1, 2), (2, 3), (3, 4), (4, 1)]
        return pts_w, edges

    def draw(self, map_state, path: str, *, trajectory=None,
             current_pose=None, title: str = ""):
        plt = _plt()
        fig = plt.figure(figsize=(8, 6))
        ax = fig.add_subplot(111, projection="3d")
        lm = map_state.lm_pw[map_state.lm_valid]
        if len(lm):
            ax.scatter(lm[:, 0], lm[:, 1], lm[:, 2], s=0.5, c="k",
                       alpha=0.4, linewidths=0)
        s = self.frustum_scale
        for k in map_state.keyframe_ids():
            pts, edges = self._frustum(map_state.kf_Rcw[k],
                                       map_state.kf_tcw[k], s)
            for a, b in edges:
                ax.plot(*zip(pts[a], pts[b]), c="b", lw=0.5)
        if trajectory is not None and len(trajectory):
            p = np.asarray([-(R.T @ t) for _, R, t, _ in trajectory])
            ax.plot(p[:, 0], p[:, 1], p[:, 2], c="g", lw=1.0)
        if current_pose is not None:
            pts, edges = self._frustum(current_pose[0], current_pose[1],
                                       1.5 * s)
            for a, b in edges:
                ax.plot(*zip(pts[a], pts[b]), c="r", lw=1.2)
        if title:
            ax.set_title(title)
        ax.set_xlabel("x"), ax.set_ylabel("y"), ax.set_zlabel("z")
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path


class FrameDrawer:
    """Per-frame overlay: image + keypoints colored by tracking status
    (FrameDrawer::DrawFrame — green = tracked map point, blue = new)."""

    def draw(self, path: str, image, uv, tracked_mask=None, *,
             state: str = "", n_tracked: int | None = None):
        plt = _plt()
        image = np.asarray(image)
        fig, ax = plt.subplots(figsize=(8, 6))
        ax.imshow(image, cmap="gray" if image.ndim == 2 else None)
        uv = np.asarray(uv)
        if tracked_mask is None:
            tracked_mask = np.zeros(len(uv), bool)
        t = np.asarray(tracked_mask, bool)
        if (~t).any():
            ax.scatter(uv[~t, 0], uv[~t, 1], s=8, facecolors="none",
                       edgecolors="deepskyblue", linewidths=0.7)
        if t.any():
            ax.scatter(uv[t, 0], uv[t, 1], s=8, facecolors="none",
                       edgecolors="lime", linewidths=0.7)
        label = state
        if n_tracked is not None:
            label += f"  matches: {n_tracked}"
        if label:
            ax.text(4, 14, label, color="yellow", fontsize=10,
                    bbox=dict(facecolor="black", alpha=0.6, pad=2))
        ax.set_axis_off()
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return path


class Viewer:
    """Polling viewer (Viewer::Run): snapshot the map every N keyframes
    into out_dir.  Attach with `viewer.poll(system)` after each tracked
    frame (the reference's 3 ms GUI poll collapsed to keyframe cadence)."""

    def __init__(self, out_dir: str, every_n_kf: int = 5,
                 map_drawer: MapDrawer | None = None):
        self.out_dir = out_dir
        self.every_n_kf = every_n_kf
        self.map_drawer = map_drawer or MapDrawer()
        self._last_drawn = -1
        os.makedirs(out_dir, exist_ok=True)

    def poll(self, system) -> str | None:
        n = system.map.n_keyframes()
        if n == 0 or n == self._last_drawn or n % self.every_n_kf:
            return None
        self._last_drawn = n
        path = os.path.join(self.out_dir, f"map_{n:05d}.png")
        tr = system.tracker
        return self.map_drawer.draw(
            system.map, path, trajectory=tr.trajectory,
            current_pose=(tr.Rcw, tr.tcw),
            title=f"{n} KFs / {int(np.sum(system.map.lm_valid))} points")
