#!/usr/bin/env python
"""Closed-loop accuracy leg of the benchmark: ATE before/after loop closure.

The reference's whole validation protocol is trajectory scoring — run a
dataset sequence, save CameraTrajectory.txt, score with ``evo_ape tum``
(/root/reference/run.sh:2-3). BENCH_r*.json historically carried only fps;
this script gives the driver-visible artifact an accuracy anchor: a
240x320 circular sequence with a revisit leg, progressive gauge drift
injected mid-run (dr_slam_tpu.io.drift — the exact protocol validated by
tests/test_loop_closure.py), loop closing ON, scored with the in-repo
evo-equivalent ATE (Umeyama, fixed scale).

Prints ONE JSON line:
  {"ate_rmse_m": corrected, "ate_rmse_raw_m": raw, "loops_closed": N,
   "frames": N}

Run on CPU in a subprocess from bench.py (the loop-closure pipeline needs
per-frame host readbacks, which permanently degrade the axon TPU runtime —
see slam/device_loop.py header).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np
import jax.numpy as jnp


def main() -> None:
    from dr_slam_tpu.associate import vocabulary as voc
    from dr_slam_tpu.config import (CameraConfig, LineConfig, MapConfig,
                                    ORBConfig, SlamConfig)
    from dr_slam_tpu.frontend.frame import extract_frame
    from dr_slam_tpu.io import synthetic
    from dr_slam_tpu.io.drift import inject_progressive_drift
    from dr_slam_tpu.io.metrics import ate_rmse
    from dr_slam_tpu.slam.system import System

    cfg0 = SlamConfig(
        camera=CameraConfig(fx=267.7, fy=269.6, cx=160.0, cy=120.0,
                            width=320, height=240, bf=20.0),
        orb=ORBConfig(n_features=400, n_levels=4, max_keypoints=512),
        line=LineConfig(max_lines=32),
        map=MapConfig(max_points=4096, max_lines=512, max_planes=32,
                      max_keyframes=32, vocab_words=512),
    )
    # same narrowed windows as tests/test_loop_closure.py: the injected seam
    # must not partially reconnect through wide match windows
    cfg = cfg0.replace(tracking=dataclasses.replace(
        cfg0.tracking, run_kf_culling=False,
        motion_search_radius=15.0, local_search_radius=6.0,
        loop_consistency=1))

    poses = synthetic.loop_trajectory(200)
    poses = np.concatenate([poses, poses[:70]], 0)   # revisit the start
    seq = synthetic.SyntheticSequence(poses, K4=cfg.camera.K4,
                                      height=240, width=320)
    # place recognition needs a discriminative codebook; train a small one
    # on the sequence itself (the reference loads a pre-trained ORBvoc)
    descs = []
    for i in range(0, 200, 13):
        g_, d_ = seq.render(i)
        f_ = extract_frame(jnp.asarray(g_, jnp.float32),
                           jnp.asarray(d_, jnp.float32), cfg)
        descs.append(np.asarray(f_.kp.desc)[np.asarray(f_.kp.valid)])
    voc.set_vocabulary(voc.train_vocabulary(
        np.concatenate(descs, 0), n_words=cfg.map.vocab_words, n_iters=6))

    mpath = os.path.join(tempfile.mkdtemp(prefix="drslam_acc_"),
                         "metrics.jsonl")
    sysm = System(cfg, enable_loop_closing=True, metrics_path=mpath)
    for i in range(len(poses)):
        gray, depth = seq.render(i)
        sysm.track_rgbd(gray, np.asarray(depth), i / 30.0)
        if i == 120:
            inject_progressive_drift(sysm.tracker)
    sysm.tracker.flush()
    sysm.metrics.close()

    evs = [json.loads(line) for line in open(mpath)]
    loops = sum(1 for e in evs if "loop_closed" in str(e))
    gt = np.asarray([np.linalg.inv(p)[:3, 3] for p in poses])
    est_raw = np.asarray([np.linalg.inv(np.asarray(T))[:3, 3]
                          for _, T in sysm.tracker.trajectory])
    corr = sysm.tracker.corrected_trajectory()
    est_cor = np.asarray([np.linalg.inv(T)[:3, 3] for _, T in corr])
    print(json.dumps({
        "ate_rmse_m": round(float(ate_rmse(est_cor, gt)), 4),
        "ate_rmse_raw_m": round(float(ate_rmse(est_raw, gt)), 4),
        "loops_closed": int(loops),
        "frames": len(poses),
    }))


if __name__ == "__main__":
    main()
