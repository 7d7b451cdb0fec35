#!/usr/bin/env python
"""Train the device BoW vocabulary (binary k-means over ORB descriptors).

Role of DBoW2's offline vocabulary build -- the reference loads a pre-trained
ORBvoc.txt (System.cc:51); here the codebook is trained on descriptors
harvested from rendered synthetic frames (or a TUM sequence directory with
--tum) and saved as an npz that dr_slam_tpu.associate.vocabulary.load_vocabulary
registers at runtime."""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=4096)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tum", default=None, help="TUM sequence dir (optional)")
    ap.add_argument("--out", default="dr_slam_tpu/data/vocab.npz")
    args = ap.parse_args()

    from dr_slam_tpu.associate.vocabulary import train_vocabulary
    from dr_slam_tpu.config import tum_freiburg3
    from dr_slam_tpu.frontend.frame import extract_frame
    from dr_slam_tpu.io import synthetic

    cfg = tum_freiburg3()
    descs = []
    if args.tum:
        from dr_slam_tpu.io.tum import TUMDataset
        ds = TUMDataset(args.tum, depth_factor=cfg.camera.depth_factor)
        for i in range(0, min(len(ds), args.frames)):
            fr = ds[i]
            f = extract_frame(fr.gray, fr.depth, cfg)
            descs.append(np.asarray(f.kp.desc)[np.asarray(f.kp.valid)])
    else:
        # five scene families (VERDICT r3 next-step 3): the two the
        # acceptance constants were first tuned on, the cluttered office,
        # and two NEW worlds (different room geometry => different texture
        # layout, Kinect-like depth noise) so the codebook is not
        # overfitted to one wall pattern
        room_small = synthetic.BoxRoom(xmax=2.6, ymax=2.2, zmax=3.4)
        room_hall = synthetic.BoxRoom(xmax=7.0, ymax=3.5, zmax=10.0)
        worlds = [
            # (poses, room, clutter boxes, quadratic depth noise)
            (synthetic.corridor_trajectory(args.frames), None, None, False),
            (synthetic.loop_trajectory(args.frames), None, None, False),
            (synthetic.loop_trajectory(args.frames), None,
             synthetic.office_clutter(n_boxes=6, seed=3), False),
            (synthetic.corridor_trajectory(args.frames, room=room_small,
                                           step=0.012), room_small,
             synthetic.office_clutter(room_small, n_boxes=4, seed=11), True),
            (synthetic.loop_trajectory(args.frames, room=room_hall),
             room_hall,
             synthetic.office_clutter(room_hall, n_boxes=8, seed=7), False),
        ]
        for poses, room, boxes, qnoise in worlds:
            kw = {}
            if room is not None:
                kw["room"] = room
            seq = synthetic.SyntheticSequence(
                poses, K4=cfg.camera.K4, boxes=boxes,
                depth_noise=qnoise, quadratic_noise=qnoise, **kw)
            for i in range(0, len(seq), 2):
                gray, depth = seq.render(i)
                f = extract_frame(gray, depth, cfg)
                descs.append(np.asarray(f.kp.desc)[np.asarray(f.kp.valid)])
    D = np.concatenate(descs, 0)
    print(f"training on {len(D)} descriptors -> {args.words} words")
    words = train_vocabulary(D, n_words=args.words, n_iters=args.iters)
    import os
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, words=words)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
