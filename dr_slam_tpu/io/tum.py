"""TUM RGB-D dataset loading.

Replaces the reference's LoadImages/associate parsing in
Examples/RGB-D/main.cc:138 (reads an ``associate.txt`` of
``t_rgb rgb/... t_depth depth/...`` rows) plus the 16U-depth conversion done
in Frame (divide by DepthMapFactor, src/Frame.cc around ComputeStereoFromRGBD).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np


@dataclass
class RGBDFrame:
    timestamp: float
    gray: np.ndarray       # (H, W) float32 in [0, 255]
    depth: np.ndarray      # (H, W) float32 meters, 0 = invalid
    rgb_path: str = ""
    depth_path: str = ""


def parse_associations(path: str) -> list[tuple[float, str, float, str]]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) >= 4:
                rows.append((float(parts[0]), parts[1], float(parts[2]), parts[3]))
    return rows


def associate(rgb_file: str, depth_file: str, max_dt: float = 0.02
              ) -> list[tuple[float, str, float, str]]:
    """Greedy nearest-timestamp association of rgb.txt/depth.txt listings
    (the role of the TUM associate.py tool the reference relies on)."""
    def read_listing(p):
        out = []
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                t, rel = line.split()[:2]
                out.append((float(t), rel))
        return out

    rgb = read_listing(rgb_file)
    depth = read_listing(depth_file)
    dts = np.array([d[0] for d in depth])
    rows, used = [], set()
    for t, rel in rgb:
        j = int(np.argmin(np.abs(dts - t)))
        if abs(dts[j] - t) < max_dt and j not in used:
            used.add(j)
            rows.append((t, rel, depth[j][0], depth[j][1]))
    return rows


def _load_gray(path: str) -> np.ndarray:
    from PIL import Image
    img = np.asarray(Image.open(path).convert("L"), dtype=np.float32)
    return img


def _load_depth(path: str, depth_factor: float) -> np.ndarray:
    from PIL import Image
    d = np.asarray(Image.open(path), dtype=np.float32)
    return d / depth_factor


class TUMDataset:
    """Iterates RGBDFrames from a TUM-format sequence directory."""

    def __init__(self, root: str, associations: str | None = None,
                 depth_factor: float = 5000.0):
        self.root = root
        self.depth_factor = depth_factor
        if associations is None:
            for cand in ("associate.txt", "associations.txt", "association.txt"):
                p = os.path.join(root, cand)
                if os.path.exists(p):
                    associations = p
                    break
        if associations is not None and os.path.exists(associations):
            self.rows = parse_associations(associations)
        else:
            self.rows = associate(os.path.join(root, "rgb.txt"),
                                  os.path.join(root, "depth.txt"))

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, i: int) -> RGBDFrame:
        t_rgb, rgb_rel, _, depth_rel = self.rows[i]
        rgb_path = os.path.join(self.root, rgb_rel)
        depth_path = os.path.join(self.root, depth_rel)
        return RGBDFrame(
            timestamp=t_rgb,
            gray=_load_gray(rgb_path),
            depth=_load_depth(depth_path, self.depth_factor),
            rgb_path=rgb_path,
            depth_path=depth_path,
        )

    def __iter__(self) -> Iterator[RGBDFrame]:
        for i in range(len(self)):
            yield self[i]


def export_tum_sequence(out_dir: str, poses_cw: Sequence[np.ndarray],
                        render_fn, depth_factor: float = 5000.0,
                        fps: float = 30.0, t0: float = 1000.0) -> str:
    """Write a TUM-format RGB-D sequence directory from rendered frames.

    Produces exactly the on-disk layout the reference's dataset runner
    consumes (Examples/RGB-D/main.cc:59-109 + the TUM associate protocol):
    ``rgb/*.png`` 8-bit grayscale, ``depth/*.png`` 16-bit sensor units
    (value = meters * DepthMapFactor, src/Tracking.cc:223 semantics),
    ``rgb.txt``/``depth.txt`` listings, ``associate.txt``, and
    ``groundtruth.txt`` (T_wc rows, ``t tx ty tz qx qy qz qw``).

    render_fn(i) -> (gray [0,255] float, depth meters float) arrays.
    Returns out_dir. Used to build hermetic dataset fixtures so the full
    PNG -> uint16 -> DepthMapFactor ingestion path is testable offline."""
    from PIL import Image

    from dr_slam_tpu.io.trajectory import pose_to_tum_row

    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    rgb_rows, depth_rows, assoc_rows, gt_rows = [], [], [], []
    for i, T_cw in enumerate(poses_cw):
        t = t0 + i / fps
        gray, depth = render_fn(i)
        gray = np.asarray(gray)
        depth = np.asarray(depth)
        g8 = np.clip(gray + 0.5, 0, 255).astype(np.uint8)
        d16 = np.clip(depth * depth_factor + 0.5, 0, 65535).astype(np.uint16)
        rgb_rel = f"rgb/{t:.6f}.png"
        depth_rel = f"depth/{t:.6f}.png"
        Image.fromarray(g8).save(os.path.join(out_dir, rgb_rel))
        Image.fromarray(d16).save(os.path.join(out_dir, depth_rel))
        rgb_rows.append(f"{t:.6f} {rgb_rel}")
        depth_rows.append(f"{t:.6f} {depth_rel}")
        assoc_rows.append(f"{t:.6f} {rgb_rel} {t:.6f} {depth_rel}")
        gt_rows.append(pose_to_tum_row(t, np.asarray(T_cw)))
    header = "# timestamp filename\n"
    with open(os.path.join(out_dir, "rgb.txt"), "w") as f:
        f.write(header + "\n".join(rgb_rows) + "\n")
    with open(os.path.join(out_dir, "depth.txt"), "w") as f:
        f.write(header + "\n".join(depth_rows) + "\n")
    with open(os.path.join(out_dir, "associate.txt"), "w") as f:
        f.write("\n".join(assoc_rows) + "\n")
    with open(os.path.join(out_dir, "groundtruth.txt"), "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n"
                + "\n".join(gt_rows) + "\n")
    return out_dir


def load_groundtruth(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Load TUM groundtruth.txt -> (timestamps (N,), poses (N,7) tx..qw)."""
    ts, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.split()]
            if len(vals) >= 8:
                ts.append(vals[0])
                poses.append(vals[1:8])
    return np.asarray(ts), np.asarray(poses)
