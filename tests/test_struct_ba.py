"""Planes and lines as first-class bundle-adjustment parameters (VERDICT r2
item 4; reference Optimizer.cc:2441-2562 LocalBA / :100-460 GBA edge set:
VertexPlane + EdgePlane/EdgeParallelPlane/EdgeVerticalPlane, 2-endpoint line
vertices + EdgeLineProjectXYZ)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dr_slam_tpu.geometry import se3
from dr_slam_tpu.optimize.global_ba import (BAProblem, StructBlocks,
                                            bundle_adjust, plane_retract)

K4 = (300.0, 300.0, 160.0, 120.0)


def _normalize_plane(p):
    p = p / np.linalg.norm(p[:3])
    return p * (1.0 if p[3] >= 0 else -1.0)


def _gt_world():
    rng = np.random.RandomState(3)
    # keyframes looking down +z from slightly different poses
    poses = []
    for k in range(4):
        T = np.eye(4, dtype=np.float32)
        th = 0.05 * k
        T[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                              [-np.sin(th), 0, np.cos(th)]], np.float32)
        T[:3, 3] = [0.15 * k, 0.02 * k, 0.0]
        poses.append(T)
    poses = np.stack(poses)
    pts = rng.uniform([-1.0, -0.8, 2.0], [1.0, 0.8, 4.0], (60, 3)
                      ).astype(np.float32)
    planes = np.stack([_normalize_plane(np.array([0.05, 0.02, -1.0, 3.5])),
                       _normalize_plane(np.array([1.0, 0.05, 0.1, 1.4]))]
                      ).astype(np.float32)
    lines = np.array([[-0.8, -0.5, 2.5, 0.9, -0.5, 2.5],
                      [-0.7, 0.4, 3.0, 0.8, 0.45, 3.1],
                      [0.2, -0.6, 2.2, 0.25, 0.7, 2.3]], np.float32)
    return poses, pts, planes, lines


def _observations(poses, pts, planes, lines):
    """Perfect observations of everything from every keyframe."""
    NK, NP, NF, NL = len(poses), len(pts), len(planes), len(lines)
    obs_kf = np.repeat(np.arange(NK, dtype=np.int32), NP)
    obs_pt = np.tile(np.arange(NP, dtype=np.int32), NK)
    Xc = np.einsum("mij,mj->mi", poses[obs_kf][:, :3, :3], pts[obs_pt]) \
        + poses[obs_kf][:, :3, 3]
    uv = np.stack([K4[0] * Xc[:, 0] / Xc[:, 2] + K4[2],
                   K4[1] * Xc[:, 1] / Xc[:, 2] + K4[3]], -1).astype(np.float32)
    # plane observations: camera-frame coefficients (direct kind)
    pobs_kf = np.repeat(np.arange(NK, dtype=np.int32), NF)
    pobs_pl = np.tile(np.arange(NF, dtype=np.int32), NK)
    pcoef = []
    for m in range(len(pobs_kf)):
        pc = np.asarray(se3.plane_to_camera(jnp.asarray(poses[pobs_kf[m]]),
                                            jnp.asarray(planes[pobs_pl[m]])))
        pcoef.append(pc)
    pcoef = np.stack(pcoef).astype(np.float32)
    # line observations: 2D line equation through the projected GT endpoints
    lobs_kf = np.repeat(np.arange(NK, dtype=np.int32), NL)
    lobs_ln = np.tile(np.arange(NL, dtype=np.int32), NK)
    leq, lep3 = [], []
    for m in range(len(lobs_kf)):
        T = poses[lobs_kf[m]]
        L = lines[lobs_ln[m]]
        s = T[:3, :3] @ L[:3] + T[:3, 3]
        e = T[:3, :3] @ L[3:] + T[:3, 3]
        us = np.array([K4[0] * s[0] / s[2] + K4[2], K4[1] * s[1] / s[2] + K4[3], 1.0])
        ue = np.array([K4[0] * e[0] / e[2] + K4[2], K4[1] * e[1] / e[2] + K4[3], 1.0])
        eq = np.cross(us, ue)
        eq = eq / np.linalg.norm(eq[:2])
        leq.append(eq)
        lep3.append(np.concatenate([s, e]))
    leq = np.stack(leq).astype(np.float32)
    lep3 = np.stack(lep3).astype(np.float32)
    return (obs_kf, obs_pt, uv, Xc[:, 2].astype(np.float32),
            pobs_kf, pobs_pl, pcoef, lobs_kf, lobs_ln, leq, lep3)


def _problem(poses, pts, planes, lines, obs, kf_free, pt_free,
             pl_free=True, ln_free=True):
    (obs_kf, obs_pt, uv, z, pobs_kf, pobs_pl, pcoef,
     lobs_kf, lobs_ln, leq, lep3) = obs
    NK, NF, NL = len(poses), len(planes), len(lines)
    struct = StructBlocks(
        pl_coef=jnp.asarray(planes),
        pl_free=jnp.full(NF, pl_free),
        pobs_kf=jnp.asarray(pobs_kf), pobs_pl=jnp.asarray(pobs_pl),
        pobs_coef=jnp.asarray(pcoef),
        pobs_kind=jnp.zeros(len(pobs_kf), jnp.int32),
        pobs_valid=jnp.ones(len(pobs_kf), bool),
        ln_ep=jnp.asarray(lines), ln_free=jnp.full(NL, ln_free),
        lobs_kf=jnp.asarray(lobs_kf), lobs_ln=jnp.asarray(lobs_ln),
        lobs_line=jnp.asarray(leq), lobs_ep3=jnp.asarray(lep3),
        lobs_valid=jnp.ones(len(lobs_kf), bool))
    return BAProblem(
        kf_pose=jnp.asarray(poses), pt_pos=jnp.asarray(pts),
        obs_kf=jnp.asarray(obs_kf), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv), obs_z=jnp.asarray(z),
        obs_inv_sigma2=jnp.ones(len(obs_kf)),
        obs_valid=jnp.ones(len(obs_kf), bool),
        kf_free=jnp.asarray(kf_free), pt_free=jnp.asarray(pt_free),
        struct=struct)


def test_perturbed_planes_lines_converge():
    """Fixed poses/points; perturbed plane + line parameters must converge
    back to ground truth through their observation edges alone."""
    poses, pts, planes, lines = _gt_world()
    obs = _observations(poses, pts, planes, lines)
    rng = np.random.RandomState(0)
    planes_bad = planes.copy()
    for f in range(len(planes)):
        planes_bad[f, :3] += 0.06 * rng.randn(3)
        planes_bad[f] = _normalize_plane(planes_bad[f] +
                                         np.array([0, 0, 0, 0.08 * rng.randn()]))
    lines_bad = lines + 0.05 * rng.randn(*lines.shape).astype(np.float32)
    p = _problem(poses, pts, planes_bad, lines_bad, obs,
                 kf_free=np.zeros(len(poses), bool),
                 pt_free=np.zeros(len(pts), bool))
    T, X, P, L = bundle_adjust(p, K4, n_gn_iters=8, n_cg_iters=30)
    P, L = np.asarray(P), np.asarray(L)
    for f in range(len(planes)):
        assert np.dot(P[f, :3], planes[f, :3]) > 0.9999, (f, P[f], planes[f])
        assert abs(P[f, 3] - planes[f, 3]) < 0.01, (f, P[f], planes[f])
    # line endpoints can slide ALONG the 3D line (projective null space);
    # check point-to-line distance of recovered endpoints to the GT line
    for l in range(len(lines)):
        d = lines[l, 3:] - lines[l, :3]
        d = d / np.linalg.norm(d)
        for ep in (L[l, :3], L[l, 3:]):
            v = ep - lines[l, :3]
            perp = v - np.dot(v, d) * d
            assert np.linalg.norm(perp) < 0.02, (l, ep, np.linalg.norm(perp))


def test_struct_edges_improve_pose_recovery():
    """Perturbed poses with plane+line edges must recover closer to GT than
    with a crippled point-only subset -- the structural-constraint thesis
    (README.md:3 of the reference) inside BA."""
    poses, pts, planes, lines = _gt_world()
    # keep only a few point observations so points alone underconstrain
    obs = _observations(poses, pts[:8], planes, lines)
    rng = np.random.RandomState(1)
    poses_bad = poses.copy()
    for k in range(1, len(poses)):
        xi = 0.02 * rng.randn(6).astype(np.float32)
        poses_bad[k] = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ poses_bad[k]
    kf_free = np.ones(len(poses), bool)
    kf_free[0] = False
    p = _problem(poses_bad, pts[:8], planes, lines, obs,
                 kf_free=kf_free, pt_free=np.zeros(8, bool),
                 pl_free=False, ln_free=False)
    T, X, P, L = bundle_adjust(p, K4, n_gn_iters=12, n_cg_iters=40)
    err = 0.0
    for k in range(len(poses)):
        d = np.asarray(T[k]) @ np.linalg.inv(poses[k])
        err = max(err, np.linalg.norm(d[:3, 3]))
    assert err < 5e-3, err


def test_reanchor_moves_planes_with_keyframes():
    """Loop correction must carry planes/lines with their reference
    keyframes (the reference leaves them stale -- LoopClosing.cc corrects
    points only)."""
    from dr_slam_tpu.config import SlamConfig
    from dr_slam_tpu.slam.loop_closing import _reanchor_map
    from dr_slam_tpu.slam.state import make_empty_state
    import dataclasses

    cfg = SlamConfig()
    cfg = cfg.replace(map=dataclasses.replace(
        cfg.map, max_points=64, max_keyframes=8, max_planes=8, max_lines=16))
    st = make_empty_state(cfg)
    plane = jnp.asarray([0.0, 0.0, 1.0, 2.0])  # wall z = -2? n.x + d = 0
    cloud = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (cfg.plane.cloud_points, 3)).astype(np.float32))
    cloud = cloud.at[:, 2].set(-2.0)  # points on the plane z=-2
    line = jnp.asarray([0.0, 0.0, -2.0, 1.0, 0.0, -2.0])
    st = st._replace(
        kf_valid=st.kf_valid.at[:2].set(True),
        kf_seq=st.kf_seq.at[:2].set(jnp.asarray([0, 1])),
        pl_coef=st.pl_coef.at[0].set(plane),
        pl_valid=st.pl_valid.at[0].set(True),
        pl_cloud=st.pl_cloud.at[0].set(cloud),
        pl_cloud_valid=st.pl_cloud_valid.at[0].set(True),
        pl_first_kf=st.pl_first_kf.at[0].set(1),
        ln_ep=st.ln_ep.at[0].set(line),
        ln_valid=st.ln_valid.at[0].set(True),
        ln_first_kf=st.ln_first_kf.at[0].set(1),
        pt_pos=st.pt_pos.at[0].set(jnp.asarray([0.0, 0.0, -2.0])),
        pt_valid=st.pt_valid.at[0].set(True),
        pt_first_kf=st.pt_first_kf.at[0].set(1),
    )
    # correction: keyframe 1 moves by a twist; landmarks must follow
    xi = jnp.asarray([0.05, -0.02, 0.1, 0.03, 0.01, -0.02])
    D = se3.se3_exp(xi)  # new T_cw[1] = D @ old
    new_poses = st.kf_pose.at[1].set(D @ st.kf_pose[1])
    out = _reanchor_map(st, new_poses)
    # A = inv(T_new) @ T_old = inv(D) for kf 1
    A = np.asarray(se3.inv_T(D))
    # point moved with A
    np.testing.assert_allclose(
        np.asarray(out.pt_pos[0]), A[:3, :3] @ np.array([0, 0, -2.0]) + A[:3, 3],
        atol=1e-5)
    # plane: transformed cloud points still lie on the transformed plane
    p_new = np.asarray(out.pl_coef[0])
    c_new = np.asarray(out.pl_cloud[0])
    resid = c_new @ p_new[:3] + p_new[3]
    assert np.abs(resid).max() < 1e-4, np.abs(resid).max()
    # line endpoints moved with A
    e_new = np.asarray(out.ln_ep[0])
    np.testing.assert_allclose(
        e_new[:3], A[:3, :3] @ np.array([0, 0, -2.0]) + A[:3, 3], atol=1e-5)


def test_kf_struct_tables_populate():
    """End-to-end: a short synthetic run must leave valid per-keyframe
    plane/line observation rows whose ids reference valid landmarks."""
    from dr_slam_tpu.io import synthetic
    from dr_slam_tpu.slam.system import System
    from tests.test_tracking_e2e import small_cfg

    cfg = small_cfg()
    seq = synthetic.SyntheticSequence(synthetic.corridor_trajectory(25),
                                      K4=cfg.camera.K4, height=240, width=320)
    sysm = System(cfg, enable_loop_closing=False)
    for i in range(25):
        g, d = seq.render(i)
        sysm.track_rgbd(g, np.asarray(d), i / 30.0)
    sysm.tracker.flush()
    st = sysm.tracker.map_state
    kf_valid = np.asarray(st.kf_valid)
    kf_pl = np.asarray(st.kf_pl)[kf_valid]
    kf_ln = np.asarray(st.kf_ln)[kf_valid]
    assert (kf_pl >= 0).sum() >= 2, kf_pl
    assert (kf_ln >= 0).sum() >= 4, kf_ln
    pl_valid = np.asarray(st.pl_valid)
    ln_valid = np.asarray(st.ln_valid)
    assert pl_valid[kf_pl[kf_pl >= 0]].all()
    assert ln_valid[kf_ln[kf_ln >= 0]].all()
    # plane re-anchor references are seated
    assert (np.asarray(st.pl_first_kf)[pl_valid] >= 0).all()
