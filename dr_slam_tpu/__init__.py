"""DR-SLAM-TPU: a TPU-native (JAX/XLA/Pallas) RGB-D Manhattan-world SLAM framework.

A from-scratch rebuild of the capabilities of WangWen-Believer/DR-SLAM
(reference: /root/reference, C++/ORB-SLAM2 lineage) designed TPU-first:

- The per-frame front-end (ORB points, line segments, plane segmentation,
  surface normals) is a fused set of XLA/Pallas device programs over the
  frame tensors (reference: src/Frame.cc:124-134 runs 4 CPU threads).
- Manhattan-frame drift-free rotation tracking (reference:
  src/Tracking.cc:1336-1527) is a pure tensor op: cone masking + tangent
  projection + Gaussian mean shift, vmapped over the three axes.
- The g2o Levenberg-Marquardt back-end (reference: src/Optimizer.cc) becomes
  batched dense LM solves with point/line/plane residuals and a matrix-free
  PCG bundle adjustment that shards over a jax.sharding.Mesh.
- The map (reference: pointer graphs in src/Map.cc) is a functional pytree of
  fixed-capacity arrays with validity masks, advanced by jitted steps from a
  single-writer host orchestrator -- no mutexes.
- DBoW2 place recognition (reference: Thirdparty/DBoW2) becomes a device
  vocabulary: descriptor->word assignment and BoW scoring as MXU matmuls.
"""

__version__ = "0.1.0"

import os as _os


def _machine_fingerprint() -> str:
    """Short hash of what makes an XLA:CPU AOT artifact machine-specific.

    The working tree travels between hosts (driver, judge, TPU bench), and
    XLA:CPU cache entries embed code generated for the compiling host's CPU
    features -- loading one on a different machine SIGILLs/segfaults (this
    was the round-4 single-process pytest crash: stale cross-machine entries
    in .jax_cache). Keying the cache directory by CPU flags + jax version
    makes a foreign host's entries invisible instead of fatal."""
    import hashlib

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:
        import platform
        feats = platform.machine() + platform.processor()
    import jax
    return hashlib.sha256(
        (feats + jax.__version__).encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations to disk; the front-end/track jits are large
    (minutes to compile cold) and identical across runs. The directory is
    namespaced per machine fingerprint (see _machine_fingerprint)."""
    import jax

    cache_dir = path or _os.environ.get(
        "DR_SLAM_TPU_CACHE", _os.path.join(_os.path.dirname(__file__), "..",
                                           ".jax_cache"))
    cache_dir = _os.path.join(cache_dir, _machine_fingerprint())
    _os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax: cache is an optimization only


if _os.environ.get("DR_SLAM_TPU_DISABLE_CACHE", "0") != "1":
    enable_compilation_cache()


def _set_matmul_precision() -> None:
    """Geometry solves need f32 matmuls. The TPU MXU defaults f32 inputs to
    bf16 multiplication (8-bit mantissa), which corrupts Gauss-Newton
    Hessian assembly, plane moment aggregation and covariance PCA -- on-chip
    ATE was ~10x worse than the CPU tests (which force f32 in conftest)
    until this was pinned. Hot Hamming matmuls cast to bf16 EXPLICITLY
    (ops/orb.bits_to_signs) and keep their MXU speed."""
    import jax

    try:
        jax.config.update("jax_default_matmul_precision", "float32")
    except Exception:
        pass


_set_matmul_precision()
