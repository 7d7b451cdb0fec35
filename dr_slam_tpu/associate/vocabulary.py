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


# Registered TRAINED codebooks by word count (set_vocabulary /
# load_vocabulary). A trained codebook replaces the random one for the same
# W -- the reference ships a k-means ORB vocabulary (ORBvoc.txt); random
# codebooks exercise the machinery but quantize real imagery worse.
_trained_signs: dict = {}


def set_vocabulary(packed_words: np.ndarray) -> None:
    """Register a trained codebook: (W, 8) uint32 packed 256-bit words."""
    bits = np.unpackbits(
        packed_words.astype("<u4").view(np.uint8), bitorder="little"
    ).reshape(packed_words.shape[0], 256)
    _trained_signs[packed_words.shape[0]] = (
        bits.astype(np.float32) * 2.0 - 1.0)


def load_vocabulary(path: str) -> None:
    """Load + register a codebook saved by train_vocabulary/save."""
    set_vocabulary(np.load(path)["words"])


def get_codebook_signs(n_words: int) -> np.ndarray:
    return _trained_signs.get(n_words, _codebook_signs(n_words))


def train_vocabulary(desc: np.ndarray, n_words: int = 4096,
                     n_iters: int = 8, seed: int = 5) -> np.ndarray:
    """Binary k-means over packed ORB descriptors -> (W, 8) uint32 words.

    Role of DBoW2's offline vocabulary training (the reference loads the
    pre-trained ORBvoc.txt, System.cc:51): centers are per-bit majority
    votes, assignment is Hamming argmin (as a +-1 matmul). Empty clusters
    reseed on the descriptor farthest from its center."""
    desc = np.asarray(desc)
    bits = np.unpackbits(desc.astype("<u4").view(np.uint8),
                         bitorder="little").reshape(desc.shape[0], 256)
    signs = bits.astype(np.float32) * 2.0 - 1.0
    rng = np.random.RandomState(seed)
    n = signs.shape[0]
    centers = signs[rng.choice(n, size=min(n_words, n), replace=False)]
    if centers.shape[0] < n_words:   # fewer descriptors than words: pad random
        centers = np.concatenate(
            [centers, _codebook_signs(n_words)[centers.shape[0]:]], 0)
    for _ in range(n_iters):
        dot = signs @ centers.T                       # (N, W)
        assign = np.argmax(dot, -1)
        dist = 0.5 * (256.0 - dot[np.arange(n), assign])
        for w in range(n_words):
            m = assign == w
            if m.any():
                centers[w] = np.where(signs[m].mean(0) >= 0.0, 1.0, -1.0)
            else:
                centers[w] = signs[np.argmax(dist)]
                dist[np.argmax(dist)] = -1.0
    words_bits = (centers > 0).astype(np.uint8)
    packed = np.packbits(words_bits, axis=-1, bitorder="little")
    return packed.view("<u4").astype(np.uint32)


def compute_bow(desc: jnp.ndarray, valid: jnp.ndarray,
                n_words: int = 4096) -> jnp.ndarray:
    """(K, 8) uint32 packed descriptors -> (W,) L1-normalized tf vector.

    Uses the registered trained codebook for `n_words` when one exists,
    the deterministic random one otherwise."""
    cb = jnp.asarray(get_codebook_signs(n_words), dtype=jnp.bfloat16)
    return _compute_bow(desc, valid, cb)


@jax.jit
def _compute_bow(desc, valid, cb) -> jnp.ndarray:
    signs = bits_to_signs(unpack_bits(desc))                  # (K, 256)
    n_words = cb.shape[0]
    dot = jnp.dot(signs, cb.T.astype(signs.dtype),
                  preferred_element_type=jnp.float32)
    word = jnp.argmax(dot, -1)                                # min Hamming
    hist = jnp.zeros(n_words, dtype=jnp.float32).at[word].add(
        valid.astype(jnp.float32))
    return hist / jnp.maximum(jnp.sum(hist), 1e-6)


def word_ids(desc: jnp.ndarray, n_words: int = 4096) -> jnp.ndarray:
    """(K, 8) packed descriptors -> (K,) vocabulary word assignment.

    Per-descriptor word ids are what DBoW2's FeatureVector carries for
    SearchByBoW (ORBmatcher.cc:160): candidate pairs are restricted to the
    same word, which both prunes aliasing on repetitive texture and keeps
    the search discriminative."""
    cb = jnp.asarray(get_codebook_signs(n_words), dtype=jnp.bfloat16)
    return _word_ids(desc, cb)


@jax.jit
def _word_ids(desc, cb) -> jnp.ndarray:
    signs = bits_to_signs(unpack_bits(desc))
    dot = jnp.dot(signs, cb.T.astype(signs.dtype),
                  preferred_element_type=jnp.float32)
    return jnp.argmax(dot, -1).astype(jnp.int32)


@jax.jit
def bow_scores(bow: jnp.ndarray, kf_bows: jnp.ndarray,
               kf_valid: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score of `bow` (W,) against all keyframes (NK, W) -> (NK,)."""
    s = 1.0 - 0.5 * jnp.sum(jnp.abs(bow[None] - kf_bows), -1)
    return jnp.where(kf_valid, s, -1.0)
