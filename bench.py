"""Benchmark entry point. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: end-to-end RGB-D tracking frames/sec on a synthetic
640x480 Manhattan sequence (the reference's design point is a 30 fps camera,
Examples/RGB-D/TUM3.yaml:22; BASELINE.json north-star asks for >= 2x the
reference CPU fps, so vs_baseline is fps / 30 with 30 fps standing in for the
reference's real-time rate until measured reference numbers exist)."""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_frontend(n_frames: int = 30) -> float:
    from dr_slam_tpu.io import synthetic
    from dr_slam_tpu.ops import orb

    seq = synthetic.SyntheticSequence(synthetic.corridor_trajectory(n_frames))
    # pre-render frames to host so rendering isn't timed
    frames = [jnp.asarray(seq.render(i)[0]) for i in range(n_frames)]
    jax.block_until_ready(frames)
    # warmup / compile
    kp = orb.extract_orb(frames[0])
    jax.block_until_ready(kp)
    t0 = time.perf_counter()
    for f in frames:
        kp = orb.extract_orb(f)
    jax.block_until_ready(kp)
    dt = time.perf_counter() - t0
    return n_frames / dt


def bench_tracking(n_frames: int = 60) -> float | None:
    """Full SLAM tracking fps (once the pipeline exists)."""
    try:
        from dr_slam_tpu.slam.system import System
    except Exception:
        return None
    from dr_slam_tpu.config import tum_freiburg3
    from dr_slam_tpu.io import synthetic

    cfg = tum_freiburg3()
    seq = synthetic.SyntheticSequence(synthetic.corridor_trajectory(n_frames),
                                      K4=cfg.camera.K4)
    sys_ = System(cfg)
    frames = [seq[i] for i in range(n_frames)]
    # warmup must cover every jit: normal tracking AND a keyframe insertion
    # (first KF happens at min_frames) -- otherwise compiles land in the
    # timed region
    warm = min(cfg.tracking.min_frames + 3, n_frames - 10)
    for fr in frames[:warm]:
        sys_.track_rgbd(fr.gray, fr.depth, fr.timestamp)
    t0 = time.perf_counter()
    for fr in frames[warm:]:
        sys_.track_rgbd(fr.gray, fr.depth, fr.timestamp)
    sys_.block_until_ready()
    dt = time.perf_counter() - t0
    return (n_frames - warm) / dt


def main():
    fps = bench_tracking()
    if fps is not None:
        metric = "tracking_fps_synthetic_640x480"
    else:
        fps = bench_frontend()
        metric = "frontend_fps_synthetic_640x480"
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
