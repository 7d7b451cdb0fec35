"""Device bag-of-words vocabulary: descriptor->word assignment and BoW
scoring as MXU matmuls.

Role of the reference's DBoW2 ORBVocabulary + KeyFrameDatabase
(include/ORBVocabulary.h, src/KeyFrameDatabase.cc): the 1M-leaf k=10/L=6
vocabulary tree exists to make CPU descriptor->word assignment logarithmic;
on the MXU a FLAT codebook of W words is one (K,256)x(256,W) matmul, so the
tree disappears. Word centers are a deterministic random binary codebook
(random 256-bit strings are near-orthogonal under Hamming, giving a uniform
partition like a trained vocabulary's top levels; no external ORBvoc.txt
blob is needed -- the reference ships one, Vocabulary/ORBvoc.txt.tar.gz).

Scoring: L1-normalized tf vectors, similarity = 1 - 0.5*|v1 - v2|_1 (the
DBoW2 L1Scoring the reference uses), computed for all keyframes at once via
sum(min(v1, v2)) = batched elementwise min + reduce."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.ops.orb import bits_to_signs, unpack_bits


@functools.lru_cache(maxsize=4)
def _codebook_signs(n_words: int, seed: int = 3) -> np.ndarray:
    rng = np.random.RandomState(seed)
    bits = rng.rand(n_words, 256) > 0.5
    return (bits.astype(np.float32) * 2.0 - 1.0)


@functools.partial(jax.jit, static_argnames=("n_words",))
def compute_bow(desc: jnp.ndarray, valid: jnp.ndarray,
                n_words: int = 4096) -> jnp.ndarray:
    """(K, 8) uint32 packed descriptors -> (W,) L1-normalized tf vector."""
    signs = bits_to_signs(unpack_bits(desc))                  # (K, 256)
    cb = jnp.asarray(_codebook_signs(n_words), dtype=signs.dtype)
    dot = jnp.dot(signs, cb.T, preferred_element_type=jnp.float32)
    word = jnp.argmax(dot, -1)                                # min Hamming
    hist = jnp.zeros(n_words, dtype=jnp.float32).at[word].add(
        valid.astype(jnp.float32))
    return hist / jnp.maximum(jnp.sum(hist), 1e-6)


@jax.jit
def bow_scores(bow: jnp.ndarray, kf_bows: jnp.ndarray,
               kf_valid: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score of `bow` (W,) against all keyframes (NK, W) -> (NK,)."""
    s = 1.0 - 0.5 * jnp.sum(jnp.abs(bow[None] - kf_bows), -1)
    return jnp.where(kf_valid, s, -1.0)
