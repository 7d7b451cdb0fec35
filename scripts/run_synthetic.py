#!/usr/bin/env python
"""End-to-end SLAM run on a synthetic Manhattan sequence with ATE scoring.

The TPU-native stand-in for the reference's run.sh + evo_ape protocol
(run.sh:2-3) while real TUM data is unavailable: render an exactly-posed
RGB-D sequence, track it, score ATE-RMSE internally."""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--trajectory", choices=["corridor", "loop"],
                    default="corridor")
    ap.add_argument("--out", default="/tmp/drslam_out")
    ap.add_argument("--depth-noise", action="store_true")
    ap.add_argument("--viewer", action="store_true")
    ap.add_argument("--live", type=int, default=None, metavar="PORT",
                    help="serve the live browser viewer on this port "
                         "(0 = any free port; printed at startup)")
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace here (SURVEY.md sec 5)")
    args = ap.parse_args()

    from dr_slam_tpu.config import tum_freiburg3
    from dr_slam_tpu.io import synthetic
    from dr_slam_tpu.io.metrics import ate_rmse, rpe
    from dr_slam_tpu.slam.system import System

    cfg = tum_freiburg3()
    make = (synthetic.corridor_trajectory if args.trajectory == "corridor"
            else synthetic.loop_trajectory)
    seq = synthetic.SyntheticSequence(make(args.frames), K4=cfg.camera.K4,
                                      depth_noise=args.depth_noise)
    sysm = System(cfg, use_viewer=args.viewer,
                  live_viewer=args.live is not None,
                  live_viewer_port=args.live or 0)
    if sysm._live is not None:
        print(f"live viewer: http://127.0.0.1:{sysm._live.port}/",
              file=sys.stderr)

    import contextlib
    import jax
    prof = (jax.profiler.trace(args.profile_dir) if args.profile_dir
            else contextlib.nullcontext())
    t_start = time.perf_counter()
    states = []
    with prof:
        for i in range(len(seq)):
            gray, depth = seq.render(i)
            res = sysm.track_rgbd(gray, depth, i / seq.fps)
            states.append(res.state.name)
            print(f"frame {i:4d} state={res.state.name} "
                  f"inliers={res.n_inliers} matches={res.n_matches} "
                  f"manhattan={res.manhattan_ok}", file=sys.stderr)
    wall = time.perf_counter() - t_start

    est = np.asarray([np.linalg.inv(T)[:3, 3]
                      for _, T in sysm.tracker.trajectory])
    gt_Twc = np.asarray([np.linalg.inv(p) for p in seq.poses_cw])
    gt = gt_Twc[:, :3, 3]
    n = min(len(est), len(gt))
    ate = ate_rmse(est[:n], gt[:n])
    est_T = np.asarray([np.linalg.inv(T) for _, T in sysm.tracker.trajectory])
    t_rpe, r_rpe = rpe(est_T[:n], gt_Twc[:n])

    import os
    os.makedirs(args.out, exist_ok=True)
    sysm.shutdown(save_dir=args.out)
    summary = {
        "frames": len(seq),
        "fps": round(len(seq) / wall, 2),
        "ate_rmse_m": round(float(ate), 4),
        "rpe_trans_m": round(float(t_rpe), 5),
        "rpe_rot_rad": round(float(r_rpe), 5),
        "lost_frames": states.count("LOST"),
        **sysm.map_summary(),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
