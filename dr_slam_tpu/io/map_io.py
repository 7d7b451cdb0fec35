"""Map save/load (checkpoint/resume).

Capability of Map::Save / Map::Load (src/Map.cc:450-798): binary map
serialization of points, keyframes with descriptors and observation graph;
the reference persists points+keyframes only (planes/lines are NOT
serialized, SURVEY.md section 5). Here the whole MapState pytree round-trips
through one npz -- including planes, lines, BoW vectors and the Manhattan
frame, so resume is lossless (a strict superset of the reference)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.config import SlamConfig
from dr_slam_tpu.slam.state import MapState, make_empty_state


def save_map(path: str, state: MapState) -> None:
    np.savez_compressed(path, **{k: np.asarray(v)
                                 for k, v in state._asdict().items()})


def load_map(path: str, cfg: SlamConfig) -> MapState:
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    template = make_empty_state(cfg)
    fields = {}
    for k, tmpl in template._asdict().items():
        if k == "pt_desc_ring" and k not in data:
            # maps saved before the observation ring existed: seed every
            # ring slot with the stored distinctive descriptor
            ring = np.broadcast_to(data["pt_desc"][:, None, :], tmpl.shape)
            fields[k] = jnp.asarray(ring, dtype=tmpl.dtype)
            continue
        if k == "kf_word" and k not in data:
            # maps saved before the word-id cache existed: recompute the
            # per-feature vocabulary assignment from the stored descriptors
            from dr_slam_tpu.associate.vocabulary import word_ids
            NK, K = tmpl.shape
            w = word_ids(jnp.asarray(data["kf_desc"].reshape(NK * K, 8)),
                         cfg.map.vocab_words)
            fields[k] = w.reshape(NK, K).astype(tmpl.dtype)
            continue
        if k in ("pt_dist_min", "pt_dist_max") and k not in data:
            # maps saved before scale-invariance bounds existed: zeros mean
            # "no gate" in match_points_projection; re-observation refreshes
            # the band as tracking resumes
            fields[k] = tmpl
            continue
        arr = data[k]
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"map field {k}: saved shape {arr.shape} != configured "
                f"{tmpl.shape}; load with the same capacity config")
        fields[k] = jnp.asarray(arr, dtype=tmpl.dtype)
    return MapState(**fields)
