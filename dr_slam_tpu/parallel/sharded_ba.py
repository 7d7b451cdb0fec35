"""Multi-chip scaling: sharded bundle adjustment + data-parallel tracking.

The reference has no distributed computing (SURVEY.md section 2.8) -- its
scaling axes are intra-frame threads and pipeline threads. The honest
TPU-native scaling axes are:

1. **Sharded global BA** (`sharded_bundle_adjust`): the observation axis of
   optimize/global_ba.py is embarrassingly parallel -- shard observations
   across the `obs` mesh axis, replicate the (small) pose/point parameter
   vectors, and let XLA turn the J^T(Jv) reductions of every CG iteration
   into psums over ICI. Maps that outgrow one chip's HBM shard for free.

   Memory model (what "outgrow" means here): the OBSERVATION tables
   dominate and shard -- a BAProblem row costs ~41 B (kf/pt ids, uv, z,
   info, valid), so 10M observations are ~410 MB total, ~26 MB/chip on a
   16-chip mesh. The REPLICATED parameters are 12 B/point + 64 B/keyframe
   plus the CG state (4 copies of the flattened parameter vector): even an
   extreme 10M-point / 10k-KF map replicates ~120 MB + ~480 MB CG state
   per chip -- a small fraction of one chip's HBM, and two orders of
   magnitude beyond anything an RGB-D SLAM map reaches (the reference's
   TUM runs top out near ~10^3 KFs / ~10^5 points). Parameter replication
   is therefore NOT the scaling wall at this problem class; if a map ever
   crossed it, the fix is sharding the landmark axis of the J^T r
   accumulation (segment-sum by point id aligned to a point sharding),
   which trades the psum for an all-to-all -- deliberately not implemented
   while no realizable map needs it. Validated at realistic capacity (240
   KFs, 123k-row observation table, struct blocks) by
   __graft_entry__.dryrun_multichip and
   tests/test_backend.py::test_sharded_ba_realistic_map.
2. **Data-parallel multi-sequence evaluation** (`batched_frontend`): N
   independent sequences tracked at once with frames sharded over `data`
   (the pmap/pjit analog of running N dataset runs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dr_slam_tpu.optimize.global_ba import (BAProblem, StructBlocks,
                                            bundle_adjust)


def make_mesh(n_devices: int | None = None, axis: str = "obs",
              devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh: requested {n} devices but only {len(devs)} are "
            f"available ({[str(d) for d in devs]}); a silently truncated "
            f"mesh would not exercise the multi-chip sharding paths")
    return Mesh(np.asarray(devs[:n]), axis_names=(axis,))


def shard_problem(p: BAProblem, mesh: Mesh, axis: str = "obs") -> BAProblem:
    """Pad the observation axis to the mesh size and place shardings:
    observations split across devices, parameters replicated."""
    n = mesh.shape[axis]
    M = p.obs_kf.shape[0]
    pad = (-M) % n

    def pad_obs(x, fill=0):
        if pad == 0:
            return x
        width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, width, constant_values=fill)

    obs_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    out = BAProblem(
        kf_pose=jax.device_put(p.kf_pose, rep),
        pt_pos=jax.device_put(p.pt_pos, rep),
        obs_kf=jax.device_put(pad_obs(p.obs_kf), obs_sh),
        obs_pt=jax.device_put(pad_obs(p.obs_pt), obs_sh),
        obs_uv=jax.device_put(pad_obs(p.obs_uv), obs_sh),
        obs_z=jax.device_put(pad_obs(p.obs_z), obs_sh),
        obs_inv_sigma2=jax.device_put(pad_obs(p.obs_inv_sigma2), obs_sh),
        obs_valid=jax.device_put(pad_obs(p.obs_valid, False), obs_sh),
        kf_free=jax.device_put(p.kf_free, rep),
        pt_free=jax.device_put(p.pt_free, rep),
    )
    if p.struct is not None:
        s = p.struct

        def pad_ax(x, fill=0):
            pd = (-x.shape[0]) % n
            if pd == 0:
                return x
            width = [(0, pd)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, width, constant_values=fill)

        out = out._replace(struct=StructBlocks(
            pl_coef=jax.device_put(s.pl_coef, rep),
            pl_free=jax.device_put(s.pl_free, rep),
            pobs_kf=jax.device_put(pad_ax(s.pobs_kf), obs_sh),
            pobs_pl=jax.device_put(pad_ax(s.pobs_pl), obs_sh),
            pobs_coef=jax.device_put(pad_ax(s.pobs_coef), obs_sh),
            pobs_kind=jax.device_put(pad_ax(s.pobs_kind), obs_sh),
            pobs_valid=jax.device_put(pad_ax(s.pobs_valid, False), obs_sh),
            ln_ep=jax.device_put(s.ln_ep, rep),
            ln_free=jax.device_put(s.ln_free, rep),
            lobs_kf=jax.device_put(pad_ax(s.lobs_kf), obs_sh),
            lobs_ln=jax.device_put(pad_ax(s.lobs_ln), obs_sh),
            lobs_line=jax.device_put(pad_ax(s.lobs_line), obs_sh),
            lobs_ep3=jax.device_put(pad_ax(s.lobs_ep3), obs_sh),
            lobs_valid=jax.device_put(pad_ax(s.lobs_valid, False), obs_sh),
        ))
    return out


def sharded_bundle_adjust(p: BAProblem, K4, mesh: Mesh, axis: str = "obs",
                          **kw):
    """bundle_adjust with observations sharded over the mesh. XLA inserts the
    ICI collectives (psum of J^T r / J^T J v partial sums) automatically from
    the sharding annotations -- no hand-written NCCL analog. Structural
    (plane/line) observation tables shard over the same axis."""
    p = shard_problem(p, mesh, axis)
    rep = NamedSharding(mesh, P())
    fn = jax.jit(
        functools.partial(bundle_adjust, **kw),
        out_shardings=(rep, rep) if p.struct is None else (rep,) * 4,
    )
    return fn(p, jnp.asarray(K4, dtype=jnp.float32))


def batched_frontend(imgs: jnp.ndarray, mesh: Mesh, axis: str = "data",
                     **orb_kw):
    """vmap the ORB front-end over a frame batch sharded across devices."""
    from dr_slam_tpu.ops import orb

    sh = NamedSharding(mesh, P(axis, None, None))
    imgs = jax.device_put(imgs, sh)

    def one(img):
        kp = orb.extract_orb(img, **orb_kw)
        return kp.uv, kp.desc, kp.valid

    return jax.jit(jax.vmap(one))(imgs)
