"""Discriminative place-recognition candidate selection.

Role of the reference's KeyFrameDatabase (src/KeyFrameDatabase.cc:76-199
DetectLoopCandidates, :201-280 DetectRelocalizationCandidates): raw BoW
scores against every keyframe are noisy -- self-similar environments score
near-uniformly -- so the reference layers three filters on top:

1. shared-word gate: only keyframes sharing > 0.8 * maxCommonWords words
   with the query survive (KeyFrameDatabase.cc:116-135);
2. per-keyframe min score (loop path only, LoopClosing.cc:135);
3. covisibility-group ACCUMULATION: each surviving keyframe's score is
   summed with the scores of its (up to 10) best covisible neighbors that
   also survived, and only groups whose accumulated score exceeds
   0.75 * bestAccScore are kept, represented by their best member
   (KeyFrameDatabase.cc:140-199).

The tree-based inverted file disappears on TPU: with a flat W-word codebook
the per-keyframe tf vectors already live as one (NK, W) matrix, so shared
words and L1 scores against ALL keyframes are two matmul-shaped reductions.
Group accumulation runs on host over the (small) surviving set."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def common_word_counts(bow: jnp.ndarray, kf_bows: jnp.ndarray,
                       kf_valid: jnp.ndarray) -> jnp.ndarray:
    """Number of vocabulary words present in BOTH the query and each
    keyframe: (W,) x (NK, W) -> (NK,) int32. Presence = nonzero tf."""
    q = (bow > 0).astype(jnp.float32)
    k = (kf_bows > 0).astype(jnp.float32)
    c = jnp.dot(k, q, preferred_element_type=jnp.float32)
    return jnp.where(kf_valid, c, 0.0).astype(jnp.int32)


def group_candidates(scores: np.ndarray, common: np.ndarray,
                     covis: np.ndarray, allowed: np.ndarray,
                     min_score: float = 0.0,
                     group_size: int = 10,
                     acc_ratio: float = 0.75) -> list[int]:
    """Accumulated covisibility-group candidate selection.

    scores:  (NK,) L1 BoW scores of the query against each keyframe.
    common:  (NK,) shared-word counts (common_word_counts).
    covis:   (NK, NK) covisibility counts (shared map points).
    allowed: (NK,) bool -- valid, non-excluded keyframes.

    Returns candidate keyframe ids, best-of-group representatives only,
    sorted by descending accumulated group score. Empty when nothing
    clears the shared-word + min-score gates."""
    scores = np.asarray(scores, dtype=np.float64)
    common = np.asarray(common)
    allowed = np.asarray(allowed, dtype=bool)
    if not allowed.any():
        return []
    max_common = int(common[allowed].max())
    if max_common == 0:
        return []
    # KeyFrameDatabase.cc:133: minCommonWords = 0.8f * maxCommonWords
    eligible = allowed & (common > 0.8 * max_common) & (scores >= min_score)
    idx = np.where(eligible)[0]
    if len(idx) == 0:
        return []
    covis = np.asarray(covis)
    acc = np.empty(len(idx))
    best_of_group = np.empty(len(idx), dtype=np.int64)
    elig_set = np.zeros(len(scores), dtype=bool)
    elig_set[idx] = True
    for n, i in enumerate(idx):
        # up to `group_size` best covisible neighbors of i that are ALSO
        # eligible candidates (GetBestCovisibilityKeyFrames(10) intersected
        # with lKFsSharingWords, KeyFrameDatabase.cc:152-168)
        row = np.where(elig_set, covis[i], -1)
        row[i] = -1
        nbr = np.argsort(-row)[:group_size]
        nbr = nbr[row[nbr] > 0]
        members = np.concatenate([[i], nbr])
        acc[n] = scores[members].sum()
        best_of_group[n] = members[np.argmax(scores[members])]
    keep = acc >= acc_ratio * acc.max()
    # one representative per group; dedupe keeping the highest acc score
    order = np.argsort(-acc[keep])
    reps: list[int] = []
    for n in np.where(keep)[0][order]:
        r = int(best_of_group[n])
        if r not in reps:
            reps.append(r)
    return reps
