"""Sharded place recognition: BoW scoring over keyframes split across a mesh.

The reference scans its DBoW2 inverted file serially on one CPU thread
(KeyFrameDatabase::DetectLoopCandidates, src/KeyFrameDatabase.cc:76-199).
The TPU rebuild already turns that scan into two matmul-shaped reductions
against the dense (NK, W) keyframe tf matrix (associate/keyframe_db.py);
this module scales the map axis: the keyframe rows are sharded over the
device mesh, every device scores its shard against the replicated query,
and XLA all-gathers the per-keyframe results over ICI.

Why it matters: the tf matrix is the largest per-keyframe ancillary table
(NK x W f32 = 64 MB at 4096 keyframes x 4096 words, growing linearly with
map size) and place-recognition scoring is the one whole-map scan that runs
at every keyframe (LoopClosing) and every relocalization attempt. Sharding
the keyframe axis makes both the memory and the scan bandwidth scale with
the mesh instead of one chip's HBM -- the same axis sharded_ba.py splits
for global BA (SURVEY section 2.8 / section 5 scaling story).

Equivalence with the single-device path is exact (same f32 reductions) and
asserted on the virtual 8-device mesh in tests/test_backend.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _scores_and_common(bow, kf_bows, kf_valid):
    """(W,), (NK, W), (NK,) -> L1 scores (NK,) f32, common words (NK,) i32.

    Same math as vocabulary.bow_scores + keyframe_db.common_word_counts,
    fused so the sharded pass reads each keyframe row once."""
    s = 1.0 - 0.5 * jnp.sum(jnp.abs(bow[None] - kf_bows), -1)
    scores = jnp.where(kf_valid, s, -1.0)
    q = (bow > 0).astype(jnp.float32)
    c = jnp.dot((kf_bows > 0).astype(jnp.float32), q,
                preferred_element_type=jnp.float32)
    common = jnp.where(kf_valid, c, 0.0).astype(jnp.int32)
    return scores, common


@functools.lru_cache(maxsize=8)
def _jitted_scores(rep: NamedSharding):
    """One compiled executable per mesh (replicated-output sharding)."""
    return jax.jit(_scores_and_common, out_shardings=(rep, rep))


def shard_keyframe_bows(kf_bows, kf_valid, mesh: Mesh, axis: str = "kf"):
    """Lay the (NK, W) tf matrix out row-sharded over the mesh (padding NK
    to the device count with invalid rows). Returns (kf_bows, kf_valid,
    NK_original); pass the result to sharded_place_scores. Do this ONCE per
    map update -- the big table then stays resident, one shard per device."""
    NK = kf_bows.shape[0]
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    pad = -NK % n
    if pad:
        kf_bows = jnp.pad(kf_bows, ((0, pad), (0, 0)))
        kf_valid = jnp.pad(kf_valid, (0, pad), constant_values=False)
    row = NamedSharding(mesh, P(axis, None))
    vec = NamedSharding(mesh, P(axis))
    return (jax.device_put(kf_bows, row), jax.device_put(kf_valid, vec), NK)


def sharded_place_scores(bow, sharded, mesh: Mesh):
    """Score one query BoW vector against every keyframe shard.

    bow: (W,) query tf vector (replicated to every device).
    sharded: the (kf_bows, kf_valid, NK) triple from shard_keyframe_bows.

    Returns (scores (NK,), common (NK,)) -- fully replicated outputs, so
    the host-side group accumulation (keyframe_db.group_candidates) reads
    them exactly as in the single-device path. XLA partitions the row
    reductions per shard and inserts the all-gather over ICI."""
    kf_bows, kf_valid, NK = sharded
    rep = NamedSharding(mesh, P())
    q = jax.device_put(jnp.asarray(bow, jnp.float32), rep)
    scores, common = _jitted_scores(rep)(q, kf_bows, kf_valid)
    return scores[:NK], common[:NK]
