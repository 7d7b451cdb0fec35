"""Configuration system.

Replaces the reference's two YAML mechanisms -- the eager loads in the
Tracking ctor (src/Tracking.cc:50-161) and the lazy Config::Get<T> singleton
(include/Config.h:17-24) -- with one typed, immutable config object that
accepts the SAME key names as the reference YAMLs (Examples/RGB-D/TUM3.yaml):
Camera.*, ORBextractor.*, Plane.*, Viewer.*, SavePath.*, plus DR-SLAM-TPU
specific capacity settings (all static so everything jit-compiles once).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import yaml


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    fx: float = 535.4
    fy: float = 539.2
    cx: float = 320.1
    cy: float = 247.6
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 640
    height: int = 480
    fps: float = 30.0
    bf: float = 40.0          # baseline * fx (reference Camera.bf)
    depth_factor: float = 5000.0  # DepthMapFactor (TUM 16U -> meters)
    th_depth: float = 40.0    # ThDepth: close/far point threshold in b units
    rgb: int = 1

    @property
    def K4(self):
        return (self.fx, self.fy, self.cx, self.cy)

    @property
    def baseline(self) -> float:
        return self.bf / self.fx

    @property
    def th_depth_m(self) -> float:
        """Close/far depth threshold in meters (mThDepth = mbf*ThDepth/fx,
        Tracking.cc:155): points nearer than this are 'close' — reliably
        triangulated from one RGB-D view — and drive the
        bNeedToInsertClose keyframe gate (Tracking.cc:2955)."""
        return self.bf * self.th_depth / self.fx


@dataclasses.dataclass(frozen=True)
class ORBConfig:
    n_features: int = 1000       # ORBextractor.nFeatures (TUM3.yaml:40)
    scale_factor: float = 1.2    # ORBextractor.scaleFactor
    n_levels: int = 8            # ORBextractor.nLevels
    ini_th_fast: int = 20        # ORBextractor.iniThFAST
    min_th_fast: int = 7         # ORBextractor.minThFAST
    # TPU-side static capacity (>= n_features, power-of-two padded).
    max_keypoints: int = 1024
    cell_size: int = 16          # grid cell for spatially-uniform selection
    patch_size: int = 31
    half_patch: int = 15


@dataclasses.dataclass(frozen=True)
class LineConfig:
    max_lines: int = 64          # reference keeps top-40 (LSDextractor.cpp:19)
    keep_top: int = 40
    min_length: float = 25.0     # pixels
    grad_threshold: float = 20.0
    n_samples: int = 32          # depth samples along segment for 3D fit
    ransac_iters: int = 64


@dataclasses.dataclass(frozen=True)
class PlaneConfig:
    # Reference Plane.* namespace (TUM3.yaml:79-98, read via Config::Get).
    association_ang_ref: float = 0.985     # cos 10deg  Plane.AssociationAngRef
    association_dis_ref: float = 0.05      # meters     Plane.AssociationDisRef
    vertical_threshold: float = 0.0871     # cos 85deg  Plane.VerticalThreshold
    parallel_threshold: float = 0.9962     # cos 5deg   Plane.ParallelThreshold
    angle_info: float = 0.5                # Plane.AngleInfo
    distance_info: float = 50.0            # Plane.DistanceInfo
    chi2: float = 100.0                    # Plane.Chi2
    vp_chi2: float = 50.0                  # Plane.VPChi2 (par/ver edges)
    max_point_dist: float = 0.1            # MaxPointDistanceFromPlane gate
    # TPU plane segmentation (PEAC/AHC-equivalent, tile-PCA).
    block: int = 8                 # pixels per tile side
    max_planes: int = 8            # planes kept per frame
    min_blocks: int = 10           # min member tiles (>=100 pts, Frame.cc:993)
    merge_angle_cos: float = 0.985
    merge_dist: float = 0.05
    mse_factor: float = 2.5e-3     # planarity MSE gate: (factor * z^2)^2
    max_depth: float = 5.0         # cap like PlaneExtractor.cpp:44
    cloud_points: int = 256        # stored per-plane sample cloud size
    # CAPE cylinder extraction (reference src/CAPE/CylinderSeg.cpp) -- OFF by
    # default, matching the reference shipping its call sites commented out
    # (Frame.cc:129-132)
    detect_cylinders: bool = False
    max_cylinders: int = 3


@dataclasses.dataclass(frozen=True)
class ManhattanConfig:
    cone_angle_normals: float = 0.2018   # rad (Tracking.cc:1234)
    cone_angle_lines: float = 0.1018     # rad (Tracking.cc:1260)
    mean_shift_kernel: float = 20.0      # exp(-20 ||x||^2) (Tracking.cc:1529)
    min_sn_ratio: float = 0.05           # minNumOfSN = |normals|/20
    n_iterations: int = 3                # fixed-point calls per frame
    converge_tol: float = 1e-3           # early-exit rotation delta (rad)


@dataclasses.dataclass(frozen=True)
class MapConfig:
    max_points: int = 32768
    max_lines: int = 4096
    max_planes: int = 128
    max_keyframes: int = 512
    max_kf_planes: int = 16    # plane observations per keyframe
    vocab_words: int = 4096    # device BoW vocabulary size
    desc_ring: int = 4         # stored descriptors per map point (median pick)


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    min_frames: int = 10        # mMinFrames (Tracking.cc:93)
    max_frames: int = 30        # mMaxFrames = fps (Tracking.cc:94)
    # NeedNewKeyFrame gates (Tracking.cc:2907-3039, RGB-D constants):
    kf_ref_ratio: float = 0.75       # thRefRatio (c2: inliers < ratio*ref)
    kf_collapse_ratio: float = 0.25  # c1c: inliers < 0.25*ref forces a KF
    # bNeedToInsertClose (Tracking.cc:2944-2964): tracked close points
    # < 100 AND untracked close points > 70 -- the reference's absolute
    # constants assume its 1000-feature budget; here they are expressed at
    # that budget and scaled by orb.n_features/1000 at the use sites, so
    # reduced-feature configs don't chain-insert keyframes while the map
    # warms up (the count of close points scales with the feature budget)
    kf_close_tracked_max: int = 100  # at a 1000-feature budget
    kf_close_untracked_min: int = 70 # at a 1000-feature budget
    kf_min_inliers: int = 15         # c2 floor: never insert below this
    # StereoInitialization floor (reference: >=500 depth-bearing features,
    # Tracking.cc:1549; here 200 at the default 1000-feature budget).
    # Configurable so reduced-budget configs (tiny test/dryrun worlds with
    # 64-keypoint tables) can initialize at all.
    init_min_depth_points: int = 200
    motion_search_radius: float = 28.0
    local_search_radius: float = 8.0    # stage-2 rematch window
    reloc_search_radius: float = 10.0
    # Candidate compaction in match_points_projection: gather in-frustum
    # point rows into a buffer this size before the descriptor matmul.
    # <= 0 disables (full-table matmul). Measured on the v5e chip the
    # full-table matmul and the compacted path are within run noise at the
    # 32k default capacity (dispatch-bound at ~0.3 ms/frame), so this
    # defaults off; it exists for bigger point capacities, where the
    # matmul eventually dominates.
    match_candidates: int = 0
    # Projection-matcher backend: "auto" runs the Pallas streaming top-2
    # kernel (ops/match_pallas.py) on the native TPU backend and the XLA
    # scan path elsewhere; True/False force it. The kernel is bit-exact vs
    # the scan path (tests/test_map_ops.py) and keeps the (K, C) distance
    # block in VMEM instead of HBM. On the axon-tunneled runtime it
    # compiles and runs but stays opt-in (see map_ops._resolve_pallas).
    pallas_matcher: object = "auto"
    # Use matched map lines as pose-optimization edges (the reference's
    # EdgeLineProjectXYZOnlyPose, include/EdgeLine.h:155). Round 1 gated
    # them out because the cell-grid line equations carried ~3 px of
    # perpendicular bias; the gradient-ridge subpixel refinement
    # (ops/lines.py) brings that under 0.05 px, so they are on by default.
    use_lines_in_pose: bool = True
    use_planes_in_pose: bool = True
    # Stage-1 solve with the rotation FIXED to the Manhattan prediction and
    # only translation optimized (the reference's TranslationWithMotionModel
    # / Optimizer::TranslationOptimization, Tracking.cc:2544 +
    # Optimizer.cc:3211). Off by default: the reference's ACTIVE path also
    # calls the full-SE3 solve (its TranslationEstimation calls are
    # commented out, Tracking.cc:356-373).
    translation_only_with_manhattan: bool = False
    use_ref_kf_anchor: bool = True    # BoW-word-bucketed (no brute-force aliasing)
    run_ba_on_keyframe: bool = True
    run_cull_on_keyframe: bool = True
    # LocalMapping completion (reference LocalMapping.cc):
    run_fuse_on_keyframe: bool = True       # SearchInNeighbors/Fuse (:1039)
    run_triangulation: bool = True          # CreateNewMapPoints (:309)
    run_kf_culling: bool = True             # KeyFrameCulling (:1226)
    fuse_dist: float = 0.05                 # 3D merge radius (m)
    # per-keyframe BA scope: local covisibility window (the reference's
    # LocalBundleAdjustment, Optimizer.cc:2067) instead of the whole map
    use_local_ba: bool = True
    local_ba_window: int = 8
    # plane/line parameters + edges inside BA (the reference's full
    # LocalBA/GBA edge set, Optimizer.cc:2441-2562)
    use_struct_in_ba: bool = True
    # One-frame-lag state machine: per-frame scalar decisions (LOST /
    # keyframe) are resolved at the start of the NEXT frame, so the hot
    # loop never blocks on a fresh device buffer (a fresh-buffer D2H costs
    # ~90 ms over the TPU tunnel; a completed one ~1 ms). Decisions lag by
    # exactly one frame; pose estimates are identical to synchronous mode.
    deferred_readback: bool = True
    # consecutive-detection consistency for loop closing (reference
    # mnCovisibilityConsistencyTh = 3, LoopClosing.cc; our geometric
    # verification -- Sim3 >= 12 inliers AND >= 12 reprojection inliers --
    # is far more discriminative than DBoW2-era gating, so fewer
    # confirmations are needed before attempting it)
    loop_consistency: int = 2


@dataclasses.dataclass(frozen=True)
class ViewerConfig:
    use_viewer: bool = False
    keyframe_size: float = 0.05
    point_size: float = 2.0
    camera_size: float = 0.08


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    orb: ORBConfig = dataclasses.field(default_factory=ORBConfig)
    line: LineConfig = dataclasses.field(default_factory=LineConfig)
    plane: PlaneConfig = dataclasses.field(default_factory=PlaneConfig)
    manhattan: ManhattanConfig = dataclasses.field(default_factory=ManhattanConfig)
    map: MapConfig = dataclasses.field(default_factory=MapConfig)
    tracking: TrackingConfig = dataclasses.field(default_factory=TrackingConfig)
    viewer: ViewerConfig = dataclasses.field(default_factory=ViewerConfig)
    save_path: str = "./output"

    def replace(self, **kw) -> "SlamConfig":
        return dataclasses.replace(self, **kw)


# Mapping from reference YAML keys (Examples/RGB-D/*.yaml) to config fields.
_YAML_MAP: Mapping[str, tuple] = {
    "Camera.fx": ("camera", "fx", float),
    "Camera.fy": ("camera", "fy", float),
    "Camera.cx": ("camera", "cx", float),
    "Camera.cy": ("camera", "cy", float),
    "Camera.k1": ("camera", "k1", float),
    "Camera.k2": ("camera", "k2", float),
    "Camera.p1": ("camera", "p1", float),
    "Camera.p2": ("camera", "p2", float),
    "Camera.k3": ("camera", "k3", float),
    "Camera.width": ("camera", "width", int),
    "Camera.height": ("camera", "height", int),
    "Camera.fps": ("camera", "fps", float),
    "Camera.bf": ("camera", "bf", float),
    "Camera.RGB": ("camera", "rgb", int),
    "ThDepth": ("camera", "th_depth", float),
    "DepthMapFactor": ("camera", "depth_factor", float),
    "ORBextractor.nFeatures": ("orb", "n_features", int),
    "ORBextractor.scaleFactor": ("orb", "scale_factor", float),
    "ORBextractor.nLevels": ("orb", "n_levels", int),
    "ORBextractor.iniThFAST": ("orb", "ini_th_fast", int),
    "ORBextractor.minThFAST": ("orb", "min_th_fast", int),
    "Plane.AssociationAngRef": ("plane", "association_ang_ref", float),
    "Plane.AssociationDisRef": ("plane", "association_dis_ref", float),
    "Plane.VerticalThreshold": ("plane", "vertical_threshold", float),
    "Plane.ParallelThreshold": ("plane", "parallel_threshold", float),
    "Plane.AngleInfo": ("plane", "angle_info", float),
    "Plane.DistanceInfo": ("plane", "distance_info", float),
    "Plane.Chi2": ("plane", "chi2", float),
    "Plane.VPChi2": ("plane", "vp_chi2", float),
    "Plane.MFVerticalThreshold": ("plane", "vertical_threshold", float),
    # TPU-side static capacities (no reference-YAML counterpart -- the
    # reference's maps grow unbounded on the heap; here fixed-capacity SoA
    # tables are the device-resident design, so runners need them tunable
    # from the same config file)
    "Map.MaxPoints": ("map", "max_points", int),
    "Map.MaxLines": ("map", "max_lines", int),
    "Map.MaxPlanes": ("map", "max_planes", int),
    "Map.MaxKeyFrames": ("map", "max_keyframes", int),
    "Map.VocabWords": ("map", "vocab_words", int),
    "ORBextractor.maxKeypoints": ("orb", "max_keypoints", int),
    "Line.MaxLines": ("line", "max_lines", int),
    "Viewer.KeyFrameSize": ("viewer", "keyframe_size", float),
    "Viewer.PointSize": ("viewer", "point_size", float),
    "Viewer.CameraSize": ("viewer", "camera_size", float),
}


def load_config(path_or_dict: Any = None, **overrides) -> SlamConfig:
    """Build a SlamConfig, optionally from a reference-style YAML file.

    Accepts the exact key names of the reference YAMLs (TUM3.yaml etc.), which
    may start with the OpenCV ``%YAML:1.0`` directive line."""
    cfg = SlamConfig()
    if path_or_dict is None:
        data = {}
    elif isinstance(path_or_dict, Mapping):
        data = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            text = f.read()
        if text.startswith("%YAML"):
            text = text.split("\n", 1)[1]
        data = yaml.safe_load(text) or {}

    groups: dict[str, dict] = {}
    for key, value in data.items():
        if key in _YAML_MAP:
            group, field, cast = _YAML_MAP[key]
            groups.setdefault(group, {})[field] = cast(value)
        elif key == "SavePath.path":
            cfg = cfg.replace(save_path=str(value))
    for group, fields in groups.items():
        cfg = cfg.replace(**{group: dataclasses.replace(getattr(cfg, group), **fields)})
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg


def tum_freiburg3() -> SlamConfig:
    """Preset matching Examples/RGB-D/TUM3.yaml."""
    return load_config({
        "Camera.fx": 535.4, "Camera.fy": 539.2,
        "Camera.cx": 320.1, "Camera.cy": 247.6,
        "Camera.width": 640, "Camera.height": 480,
        "Camera.fps": 30.0, "Camera.bf": 40.0,
        "DepthMapFactor": 5000.0,
        "ORBextractor.nFeatures": 1000,
        "ORBextractor.scaleFactor": 1.2,
        "ORBextractor.nLevels": 8,
        "ORBextractor.iniThFAST": 20,
        "ORBextractor.minThFAST": 7,
    })


def icl_nuim() -> SlamConfig:
    """Preset matching Examples/RGB-D/ICL.yaml camera model."""
    return load_config({
        "Camera.fx": 481.2, "Camera.fy": 480.0,
        "Camera.cx": 319.5, "Camera.cy": 239.5,
        "Camera.width": 640, "Camera.height": 480,
        "Camera.fps": 30.0, "Camera.bf": 40.0,
        "DepthMapFactor": 5000.0,
    })


def tum_freiburg1() -> SlamConfig:
    """Preset matching Examples/RGB-D/TUM1.yaml (fr1 sequences; strong
    radial distortion, so the undistortion path is exercised)."""
    return load_config({
        "Camera.fx": 517.306408, "Camera.fy": 516.469215,
        "Camera.cx": 318.643040, "Camera.cy": 255.313989,
        "Camera.k1": 0.262383, "Camera.k2": -0.953104,
        "Camera.p1": -0.005358, "Camera.p2": 0.002628,
        "Camera.k3": 1.163314,
        "Camera.width": 640, "Camera.height": 480,
        "Camera.fps": 30.0, "Camera.bf": 40.0,
        "DepthMapFactor": 5000.0,
    })


def tum_freiburg2() -> SlamConfig:
    """Preset matching Examples/RGB-D/TUM2.yaml (fr2 sequences; note the
    non-standard DepthMapFactor 5208)."""
    return load_config({
        "Camera.fx": 520.908620, "Camera.fy": 521.007327,
        "Camera.cx": 325.141442, "Camera.cy": 249.701764,
        "Camera.k1": 0.231222, "Camera.k2": -0.784899,
        "Camera.p1": -0.003257, "Camera.p2": -0.000105,
        "Camera.k3": 0.917205,
        "Camera.width": 640, "Camera.height": 480,
        "Camera.fps": 30.0, "Camera.bf": 40.0,
        "DepthMapFactor": 5208.0,
    })


def tamu() -> SlamConfig:
    """Preset matching Examples/RGB-D/TAMU.yaml (Kinect corridors)."""
    return load_config({
        "Camera.fx": 525.0, "Camera.fy": 525.0,
        "Camera.cx": 319.5, "Camera.cy": 239.5,
        "Camera.width": 640, "Camera.height": 480,
        "Camera.fps": 30.0, "Camera.bf": 40.0,
        "DepthMapFactor": 5000.0,
    })


def realsense() -> SlamConfig:
    """Preset matching Examples/RGB-D/Realsense.yaml (live D4xx capture;
    millimeter depth units)."""
    return load_config({
        "Camera.fx": 609.70550296798035, "Camera.fy": 609.09579671294716,
        "Camera.cx": 319.16667152289227, "Camera.cy": 235.58360480225772,
        "Camera.k1": 0.092615504465028850, "Camera.k2": -0.18082438825995681,
        "Camera.p1": -0.00065484100374765971,
        "Camera.p2": -0.00035829351558557421,
        "Camera.width": 640, "Camera.height": 480,
        "Camera.fps": 30.0, "Camera.bf": 40.0,
        "DepthMapFactor": 1000.0,
    })


def tartanair() -> SlamConfig:
    """Preset matching Examples/RGB-D/TartanAir.yaml (synthetic flight;
    ideal pinhole, millimeter depth units)."""
    return load_config({
        "Camera.fx": 320.0, "Camera.fy": 320.0,
        "Camera.cx": 320.0, "Camera.cy": 240.0,
        "Camera.width": 640, "Camera.height": 480,
        "Camera.fps": 30.0, "Camera.bf": 40.0,
        "DepthMapFactor": 1000.0,
    })
