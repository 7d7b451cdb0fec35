"""On-chip kernel check: compiled Mosaic matcher vs the XLA scan path.
All inputs generated with numpy on host; comparison on device; ONE scalar
readback at the very end.

Run on the real chip with the repo root AND the axon site on the path:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_pallas_tpu.py

Expected output: best_d_mismatch=0 idx_real=0 second_d=0 (any nonzero is a
real kernel divergence). idx_tie and colk MAY be small nonzero: the test
data deliberately plants duplicate descriptors, so several candidates tie
at the same exact Hamming distance and compiled-vs-scan argmin tie-break
order is unspecified (measured on a v5e: idx_tie=3 colk=18 of 918 matches,
all verified equal-distance ties; interpret mode on CPU is bit-exact)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp, time
from dr_slam_tpu.ops.match_pallas import TILE_C, gated_top2_hamming
from dr_slam_tpu.slam.map_ops import _match_scan_path
from dr_slam_tpu.ops.orb import bits_to_signs, unpack_bits

# pay the first-readback degrade UP FRONT: later readbacks then behave
# (slow dispatch, but no late-first-readback wedge)
import numpy as _np
_ = float(_np.asarray(jnp.ones(()) * 2.0))
print('warm readback done', flush=True)

rng = np.random.RandomState(0)
K, NC = 1024, 4096
kp_desc = rng.randint(0, 2**32, (K, 8), dtype=np.uint32)
kp_uv = rng.uniform(0, 640, (K, 2)).astype(np.float32)
kp_valid = rng.rand(K) < 0.9
kp_oct = rng.randint(0, 8, K).astype(np.int32)
pt_desc = rng.randint(0, 2**32, (NC, 8), dtype=np.uint32)
# make some candidates share descriptors with keypoints so real matches exist
share = rng.choice(NC, 600, replace=False)
pt_desc[share] = kp_desc[rng.choice(K, 600)]
pt_uv = rng.uniform(0, 640, (NC, 2)).astype(np.float32)
pt_uv[share] = kp_uv[rng.choice(K, 600)] + rng.uniform(-5, 5, (600, 2))
pt_rad = np.full(NC, 15.0, np.float32)
pt_lvl = rng.randint(0, 8, NC).astype(np.int32)
pt_si = rng.rand(NC) < 0.7
pt_valid = rng.rand(NC) < 0.8

@jax.jit
def scan_ref(kp_desc, kp_uv, kp_valid, kp_oct, pt_desc, pt_uv, pt_rad,
             pt_lvl, pt_si, pt_valid):
    b, i, s, colk, _, _ = _match_scan_path(
        kp_desc, kp_uv, kp_valid, kp_oct, pt_desc,
        jnp.zeros((NC,), jnp.float32), pt_uv, pt_rad, pt_lvl, pt_si,
        pt_valid, NC)
    return b, i, s, colk

@jax.jit
def pallas_path(kp_desc, kp_uv, kp_valid, kp_oct, pt_desc, pt_uv, pt_rad,
                pt_lvl, pt_si, pt_valid):
    signs_kp = bits_to_signs(unpack_bits(kp_desc))
    psigns = bits_to_signs(unpack_bits(pt_desc))
    return gated_top2_hamming(signs_kp, kp_uv, kp_valid, kp_oct, psigns,
                              pt_uv, pt_rad, pt_lvl, pt_si, pt_valid)

args = (kp_desc, kp_uv, kp_valid, kp_oct, pt_desc, pt_uv, pt_rad,
        pt_lvl, pt_si, pt_valid)
t0 = time.perf_counter()
b0, i0, s0, c0 = scan_ref(*args)
jax.block_until_ready(b0)
print(f"scan ran {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
b1, i1, s1, c1 = pallas_path(*args)
jax.block_until_ready(b1)
print(f"pallas ran {time.perf_counter()-t0:.1f}s", flush=True)

inf = ~jnp.isfinite(b0)
nb = jnp.sum(jnp.where(inf, 0.0, jnp.abs(b0 - b1)) > 0)
ns = jnp.sum(jnp.where(inf, 0.0, jnp.abs(
    s0 - jnp.where(jnp.isfinite(s0), s1, s0))) > 0)
nc = jnp.sum(c0 != c1)
# classify index mismatches: a row where both paths report the SAME best
# distance and the pallas-chosen candidate's exact Hamming distance equals
# it is a benign argmin TIE (two candidates at the same distance -- the
# test data plants duplicate descriptors, so ties are expected); anything
# else is a real kernel divergence.
imm = (i0 != i1) & ~inf
kp_s = bits_to_signs(unpack_bits(jnp.asarray(kp_desc)))
pt_s = bits_to_signs(unpack_bits(jnp.asarray(pt_desc)))
d_alt = (256.0 - jnp.einsum(
    "kb,kb->k", kp_s.astype(jnp.float32),
    pt_s[jnp.clip(i1, 0, NC - 1)].astype(jnp.float32))) * 0.5
tie = imm & (b0 == b1) & (d_alt == b0)
ni_tie = jnp.sum(tie)
ni_bad = jnp.sum(imm & ~tie)
n_match = jnp.sum(jnp.isfinite(b0))
# finish ALL device work before the first readback (the axon runtime
# degrades dispatch after readbacks; nothing is dispatched after this)
jax.block_until_ready((nb, ns, nc, ni_tie, ni_bad, n_match))
print(f"best_d_mismatch={int(nb)} idx_real={int(ni_bad)} "
      f"idx_tie={int(ni_tie)} colk={int(nc)} second_d={int(ns)} "
      f"finite_best={int(n_match)}", flush=True)
