"""Data-parallel multi-sequence SLAM: N sequences tracked simultaneously,
one per mesh device.

The reference is strictly one-sequence-per-process (Examples/RGB-D/main.cc
drives a single dataset; parallel evaluation means launching N processes,
run_tum.sh). The TPU-native scaling axis SURVEY.md section 2.8 assigns to
data parallelism is exactly this: the device-resident tracking step
(slam/device_loop.py -- extraction, tracking, LOST recovery, keyframe
insertion with the full LocalMapping pass, all in ONE program) is a pure
function of (carry, frame), so N independent sequences batch over a
`jax.sharding.Mesh` with zero cross-talk and zero collectives.

`shard_map` rather than `vmap`: the per-frame program branches under
`lax.cond` (keyframe insertion, relocalization, init). vmap lowers cond to
select -- every sequence would pay the keyframe-insertion program every
frame. shard_map keeps each device's branches DYNAMIC, so a device whose
sequence is in steady state pays steady-state cost while another inserts a
keyframe, exactly like N independent single-chip runs -- because that is
what the mesh executes, 1:1, with no communication inserted.

Throughput therefore scales linearly in devices (embarrassingly parallel;
ICI idle), and the per-sequence math is IDENTICAL to DeviceLoopTracker --
tested bit-exact in tests/test_multi_seq.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import functools as _ft

try:
    # jax >= 0.8; check_vma=False because the per-device step closes over
    # unvarying literals inside fori_loop carries (Manhattan fixed-point),
    # which the varying-manual-axes checker rejects even though the
    # program is correct per device (the old check_rep=False semantics)
    from jax import shard_map as _shard_map
    shard_map = _ft.partial(_shard_map, check_vma=False)
except ImportError:                        # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map
    shard_map = _ft.partial(_shard_map, check_rep=False)

from dr_slam_tpu.config import SlamConfig
from dr_slam_tpu.slam.device_loop import (REC_SIZE, LoopCarry,
                                          device_track_step_impl,
                                          init_carry)


def stack_carries(cfg: SlamConfig, n: int, map_states=None) -> LoopCarry:
    """A LoopCarry pytree with a leading sequence axis of size n."""
    carries = [init_carry(cfg, None if map_states is None else map_states[i])
               for i in range(n)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *carries)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "axis",
                                    "localization_only"),
                   donate_argnums=(0,))
def multi_track_step(carries: LoopCarry, grays, depths, tss,
                     cfg: SlamConfig, mesh: Mesh, axis: str = "seq",
                     localization_only: bool = False):
    """One tracking step for every sequence at once.

    carries: LoopCarry with leading axis n; grays/depths: (n, H, W);
    tss: (n,). n must equal the mesh extent along `axis` (one sequence per
    device -- the point is per-device dynamic branching; see module
    docstring). Returns (carries', records (n, REC_SIZE))."""

    def one(carry, g, d, t):
        # block shape is (1, ...) per device: squeeze, step, re-expand
        c1 = jax.tree_util.tree_map(lambda x: x[0], carry)
        c2, rec = device_track_step_impl(c1, g[0], d[0], t[0], cfg,
                                         localization_only)
        return (jax.tree_util.tree_map(lambda x: x[None], c2), rec[None])

    spec = P(axis)
    fn = shard_map(one, mesh=mesh,
                   in_specs=(spec, spec, spec, spec),
                   out_specs=(spec, spec))
    return fn(carries, grays, depths, tss)


class MultiSequenceTracker:
    """Host shell: DeviceLoopTracker semantics over N sequences on a mesh.

    track() takes stacked frames (n, H, W) and performs ONE dispatch for
    all sequences; flush() reads everything back once and returns the
    per-sequence dicts DeviceLoopTracker.flush() would."""

    def __init__(self, cfg: SlamConfig, mesh: Mesh, axis: str = "seq",
                 map_states=None, localization_only: bool = False):
        n = mesh.shape[axis]
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self.n = n
        self.localization_only = bool(localization_only)
        sharding = NamedSharding(mesh, P(axis))
        self.carries = jax.device_put(stack_carries(cfg, n, map_states),
                                      sharding)
        self._records: list = []
        self._ts: list[np.ndarray] = []

    def track(self, grays, depths, timestamps):
        g = jnp.asarray(grays)
        d = jnp.asarray(depths)
        if g.dtype not in (jnp.uint8, jnp.float32):
            g = g.astype(jnp.float32)
        if not (d.dtype == jnp.float32
                or jnp.issubdtype(d.dtype, jnp.integer)):
            d = d.astype(jnp.float32)
        ts = jnp.asarray(np.asarray(timestamps, np.float32))
        self.carries, rec = multi_track_step(
            self.carries, g, d, ts, self.cfg, self.mesh, self.axis,
            self.localization_only)
        self._records.append(rec)
        self._ts.append(np.asarray(timestamps, np.float64))
        return rec

    def flush(self) -> list:
        """One readback; [dict per sequence] with records/trajectory/states
        (DeviceLoopTracker.flush layout)."""
        if not self._records:
            return [{"records": np.zeros((0, REC_SIZE), np.float32),
                     "trajectory": [], "states": [], "n_keyframes": 0}
                    for _ in range(self.n)]
        recs = np.asarray(jnp.stack(self._records))        # (T, n, REC)
        ts = np.stack(self._ts)                            # (T, n)
        kf_valid = np.asarray(self.carries.map_state.kf_valid)  # (n, NK)
        names = {0.0: "OK", 1.0: "LOST", 2.0: "NOT_INITIALIZED"}
        out = []
        for s in range(self.n):
            r = recs[:, s]
            out.append({
                "records": r,
                "trajectory": [(ts[t, s],
                                r[t, :16].reshape(4, 4).astype(np.float64))
                               for t in range(r.shape[0])],
                "states": [names.get(float(x[16]), "OK") for x in r],
                "n_keyframes": int(kf_valid[s].sum()),
            })
        return out
