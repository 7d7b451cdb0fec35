#!/usr/bin/env python
"""Run DR-SLAM-TPU on a TUM RGB-D sequence (the reference's dataset runner,
Examples/RGB-D/main.cc + run_tum.sh): track every frame, save TUM-format
trajectories, and score ATE against groundtruth.txt when present."""

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence", help="TUM sequence directory")
    ap.add_argument("--config", default=None, help="reference-style YAML")
    ap.add_argument("--out", default="./output")
    ap.add_argument("--frames", type=int, default=0, help="limit (0=all)")
    ap.add_argument("--native-loader", action="store_true")
    ap.add_argument("--localization-only", action="store_true")
    ap.add_argument("--load-map", default=None)
    ap.add_argument("--save-map", default=None)
    args = ap.parse_args()

    from dr_slam_tpu.config import load_config, tum_freiburg3
    from dr_slam_tpu.io.metrics import ate_rmse
    from dr_slam_tpu.io.tum import TUMDataset, load_groundtruth
    from dr_slam_tpu.slam.system import System

    cfg = load_config(args.config) if args.config else tum_freiburg3()
    ds = TUMDataset(args.sequence, depth_factor=cfg.camera.depth_factor)
    n = min(len(ds), args.frames) if args.frames else len(ds)

    if args.out:
        os.makedirs(args.out, exist_ok=True)
    sysm = System(cfg, metrics_path=os.path.join(args.out, "metrics.jsonl")
                  if args.out else None)
    if args.load_map:
        sysm.load_map(args.load_map)
    if args.localization_only:
        sysm.activate_localization_mode()

    t0 = time.perf_counter()
    if args.native_loader:
        from dr_slam_tpu.io.native_loader import NativeTUMLoader
        loader = NativeTUMLoader(ds)
        for idx, ts, gray, depth in loader:
            if idx >= n:
                break
            res = sysm.track_rgbd(gray, depth, ts)
            if idx % 50 == 0:
                print(f"frame {idx} {res.state.name} inliers={res.n_inliers}",
                      file=sys.stderr)
        loader.close()
    else:
        for i in range(n):
            fr = ds[i]
            res = sysm.track_rgbd(fr.gray, fr.depth, fr.timestamp)
            if i % 50 == 0:
                print(f"frame {i} {res.state.name} inliers={res.n_inliers}",
                      file=sys.stderr)
    wall = time.perf_counter() - t0

    sysm.shutdown(save_dir=args.out)
    if args.save_map:
        sysm.save_map(args.save_map)

    summary = {"frames": n, "fps": round(n / wall, 2), **sysm.map_summary()}
    gt_path = os.path.join(args.sequence, "groundtruth.txt")
    if os.path.exists(gt_path):
        ts_gt, poses_gt = load_groundtruth(gt_path)
        est_ts = np.asarray([t for t, _ in sysm.tracker.trajectory])
        est = np.asarray([np.linalg.inv(T)[:3, 3]
                          for _, T in sysm.tracker.trajectory])
        # associate by nearest timestamp (evo_ape tum protocol)
        gt_assoc = []
        for t in est_ts:
            j = int(np.argmin(np.abs(ts_gt - t)))
            gt_assoc.append(poses_gt[j, :3])
        summary["ate_rmse_m"] = round(ate_rmse(est, np.asarray(gt_assoc)), 4)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
