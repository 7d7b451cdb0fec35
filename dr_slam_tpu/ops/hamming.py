"""Hamming-distance matching on the MXU.

The reference matchers (src/ORBmatcher.cc DescriptorDistance: 32x popcount
per pair, inside nested candidate loops) become one matmul: with descriptors
as +/-1 vectors s in {-1,+1}^256, dot(s_a, s_b) = 256 - 2*hamming, so a
(A,256)x(256,B) bf16 matmul scores every pair exactly (bf16 represents the
+/-1 inputs and f32 accumulation keeps integer sums exact up to 2^24)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dr_slam_tpu.ops.orb import bits_to_signs, unpack_bits


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distances from packed descriptors.

    desc_a (A, 8) uint32, desc_b (B, 8) uint32 -> (A, B) float32 in [0,256]."""
    sa = bits_to_signs(unpack_bits(desc_a))
    sb = bits_to_signs(unpack_bits(desc_b))
    dot = jnp.dot(sa, sb.T, preferred_element_type=jnp.float32)
    return (256.0 - dot) * 0.5


def hamming_matrix_signs(signs_a: jnp.ndarray, signs_b: jnp.ndarray) -> jnp.ndarray:
    """Same, from precomputed +/-1 (bf16) representations."""
    dot = jnp.dot(signs_a, signs_b.T, preferred_element_type=jnp.float32)
    return (256.0 - dot) * 0.5


def popcount_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Exact per-lane popcount (reference check for the matmul path)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def hamming_popcount(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming via XOR+popcount; O(A*B*8) VPU ops. Used for golden
    tests; the matmul path is the production one."""
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    return jnp.sum(popcount_u32(x), axis=-1).astype(jnp.int32)


def mutual_best_matches(dist: jnp.ndarray, max_dist: float,
                        ratio: float | None = None):
    """Row-best matches with optional Lowe ratio test and mutual check.

    Returns (match_idx (A,) int32 = best column or -1, best_dist (A,))."""
    best_j = jnp.argmin(dist, axis=1)
    a_idx = jnp.arange(dist.shape[0])
    best_d = dist[a_idx, best_j]
    ok = best_d <= max_dist
    if ratio is not None:
        masked = dist.at[a_idx, best_j].set(jnp.inf)
        second = jnp.min(masked, axis=1)
        ok &= best_d < ratio * second
    # mutual: column's best row must be this row
    best_i = jnp.argmin(dist, axis=0)
    ok &= best_i[best_j] == a_idx
    return jnp.where(ok, best_j, -1), best_d
