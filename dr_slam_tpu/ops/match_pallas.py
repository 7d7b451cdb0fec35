"""Pallas TPU kernel: streaming gated top-2 Hamming matcher.

The projection matcher (slam/map_ops.match_points_projection, the TPU
rebuild of ORBmatcher::SearchByProjection, src/ORBmatcher.cc:46) scores
every keypoint against every candidate map point with a +/-1 descriptor
matmul, gates by projection window / pyramid level, and keeps the best and
second-best candidate per keypoint plus the best keypoint per candidate
(mutual check). The XLA path materializes a (K, C) f32 distance block per
4096-point chunk (16 MB at K=1024) that five separate reductions then
re-read -- HBM round trips the reductions don't need.

This kernel is the same computation as ONE streaming pass, flash-attention
style: grid over candidate tiles, the (K, 256) keypoint signs resident in
VMEM for the whole pass, one MXU matmul per tile, and the running
(best, second, argbest) state updated in VMEM scratch-free output buffers
that are revisited across sequential grid steps. The distance matrix never
exists outside VMEM. Tiles with no valid candidate skip their matmul under
@pl.when -- the tensor-core analog of the scan path's dead-chunk skip
(map_ops.py), at 8x finer granularity.

Bit-exactness: +/-1 bf16 inputs accumulate exactly in f32 (sums bounded by
256), gates and merges are the same f32 ops in the same order as the scan
path, and argmin tie-breaking (first minimum) matches jnp -- the CPU
equivalence test asserts exact equality against the scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# candidate-tile width: 512 columns x 1024 keypoints of f32 distances is
# 2 MB of VMEM live at once, comfortably inside the 16 MB budget next to
# the (K, 256) + (TC, 256) bf16 sign blocks
TILE_C = 512


def _kernel(kp_signs_ref, kp_meta_ref, pt_signs_ref, pt_meta_ref,
            best_ref, idx_ref, second_ref, colk_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        best_ref[...] = jnp.full_like(best_ref, jnp.inf)
        second_ref[...] = jnp.full_like(second_ref, jnp.inf)
        idx_ref[...] = jnp.zeros_like(idx_ref)

    tc = pt_meta_ref.shape[1]
    # 2D f32 slices throughout: Mosaic only supports minor-dim insertion
    # ([:, None]) on 32-bit types, so the bool gates are built by comparing
    # broadcast (K, 1) x (1, TC) f32 operands directly
    any_valid = jnp.any(pt_meta_ref[5:6, :] > 0.5)

    @pl.when(any_valid)
    def _compute():
        # MXU matmul; the candidate signs arrive pre-transposed (256, TC)
        # because Mosaic cannot re-layout the bf16 RHS inside the kernel,
        # and this Mosaic build rejects bf16 dot operands outright ("Bad
        # lhs type") -- upcast in VMEM, the sums stay exact integers
        dot = jnp.dot(kp_signs_ref[...].astype(jnp.float32),
                      pt_signs_ref[...].astype(jnp.float32),
                      preferred_element_type=jnp.float32)     # (K, TC)
        ham = (256.0 - dot) * 0.5

        kp_u = kp_meta_ref[:, 0:1]                            # (K, 1)
        kp_v = kp_meta_ref[:, 1:2]
        kp_oct = kp_meta_ref[:, 2:3]
        kp_ok = kp_meta_ref[:, 3:4]
        pt_u = pt_meta_ref[0:1, :]                            # (1, TC)
        pt_v = pt_meta_ref[1:2, :]
        rad = pt_meta_ref[2:3, :]
        lvl = pt_meta_ref[3:4, :]
        si = pt_meta_ref[4:5, :]
        vc = pt_meta_ref[5:6, :]

        du = jnp.abs(kp_u - pt_u)                             # (K, TC)
        dv = jnp.abs(kp_v - pt_v)
        gate = ((du < rad) & (dv < rad) & (vc > 0.5) & (kp_ok > 0.5))
        # octave levels are small ints stored in f32 (exact): the keypoint
        # must live within one pyramid level of the predicted one
        dlvl = jnp.abs(kp_oct - lvl)
        gate &= (dlvl <= 1.0) | (si < 0.5)
        D = jnp.where(gate, ham, jnp.inf)

        K = kp_signs_ref.shape[0]
        cmin = jnp.min(D, axis=1)                             # (K,)
        carg = jnp.argmin(D, axis=1).astype(jnp.int32)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (K, tc), 1)
        csec = jnp.min(jnp.where(col_ids == carg[:, None], jnp.inf, D),
                       axis=1)

        best = best_ref[0, :]
        second = second_ref[0, :]
        bidx = idx_ref[0, :]
        off = j * tc
        best_ref[0, :] = jnp.minimum(best, cmin)
        second_ref[0, :] = jnp.minimum(jnp.maximum(best, cmin),
                                       jnp.minimum(second, csec))
        idx_ref[0, :] = jnp.where(cmin < best, carg + off, bidx)
        colk_ref[0, :] = jnp.argmin(D, axis=0).astype(jnp.int32)

    @pl.when(~any_valid)
    def _skip():
        colk_ref[...] = jnp.zeros_like(colk_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gated_top2_hamming(kp_signs, kp_uv, kp_valid, kp_octave,
                       pt_signs, pt_uv, pt_rad, pt_lvl, pt_si, pt_valid,
                       interpret: bool = False):
    """Streaming gated top-2 Hamming match.

    kp_signs (K, 256) bf16 +/-1, kp_uv (K, 2) f32, kp_valid (K,) bool,
    kp_octave (K,) int/float (pass zeros with pt_si all-False to disable
    the level gate); pt_signs is (NC, 256) bf16 (transposed internally for
    the MXU), other pt_* are the candidate arrays, (NC, ...) with NC a
    multiple of TILE_C (pad with pt_valid=False).

    Returns (best_d (K,), best_i (K,) int32, second_d (K,),
    col_best_k (NC,) int32) -- identical to the scan path's per-chunk
    merge up to argmin TIE-BREAK order: when several candidates sit at the
    same exact Hamming distance, the compiled kernel may pick a different
    (equally minimal) winner than the scan (verified on-chip by
    scripts/check_pallas_tpu.py: zero distance divergences; only
    equal-distance ties differ). Interpret mode is bit-exact vs the scan
    merge in map_ops.match_points_projection.
    """
    K = kp_signs.shape[0]
    NC = pt_signs.shape[0]
    assert NC % TILE_C == 0, NC
    kp_meta = jnp.stack([
        kp_uv[:, 0].astype(jnp.float32), kp_uv[:, 1].astype(jnp.float32),
        kp_octave.astype(jnp.float32), kp_valid.astype(jnp.float32)],
        axis=1)                                               # (K, 4)
    pt_meta = jnp.stack([
        pt_uv[:, 0].astype(jnp.float32), pt_uv[:, 1].astype(jnp.float32),
        pt_rad.astype(jnp.float32), pt_lvl.astype(jnp.float32),
        pt_si.astype(jnp.float32), pt_valid.astype(jnp.float32)])

    grid = NC // TILE_C
    pt_signs_t = pt_signs.T                                   # (256, NC)
    best, idx, second, colk = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((K, 256), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, TILE_C), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, TILE_C), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_C), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.int32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((1, NC), jnp.int32),
        ),
        interpret=interpret,
    )(kp_signs, kp_meta, pt_signs_t, pt_meta)
    return best[0], idx[0], second[0], colk[0]
