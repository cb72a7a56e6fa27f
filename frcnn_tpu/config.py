"""Configuration system.

Rebuild of the reference's global-EasyDict config (reference
``lib/model/config.py:~1-400``, SURVEY.md #33) as an **immutable frozen
dataclass tree** with the same key names and defaults — those defaults encode
the algorithm (thresholds, sample counts, loss sigmas), so they are the
contract.  Differences from the reference, by design:

  * no global mutable state: ``cfg`` here is just the default instance; code
    takes a ``Config`` argument explicitly and ``jax.jit`` closes over it as a
    static (it is hashable).
  * layered overrides are functional: ``cfg_from_file(cfg, path)`` and
    ``cfg_from_list(cfg, ["TRAIN.LEARNING_RATE", "0.01", ...])`` return new
    Config objects (reference mutates ``__C`` in place).
  * a TPU-only section (``Config.TPU``) holds fixed-shape/bucketing knobs the
    reference does not need (it runs dynamic shapes on GPU).

All tuple-typed fields are tuples (never lists) so a Config is hashable.
"""

from __future__ import annotations

import dataclasses
import os
import os.path as osp
from dataclasses import dataclass, field
from typing import Any, Tuple


# ---------------------------------------------------------------------------
# Sections
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TrainConfig:
    # Reference lib/model/config.py:~L20-L140 (__C.TRAIN.*).
    LEARNING_RATE: float = 0.001
    MOMENTUM: float = 0.9
    WEIGHT_DECAY: float = 0.0001
    GAMMA: float = 0.1                      # lr decay factor at each STEPSIZE
    STEPSIZE: Tuple[int, ...] = (30000,)
    DISPLAY: int = 10                       # iters between stdout loss lines
    DOUBLE_BIAS: bool = True                # 2x lr on bias params
    BIAS_DECAY: bool = False                # weight-decay biases or not
    USE_GT: bool = False                    # include gt boxes in rois when sampling
    ASPECT_GROUPING: bool = False           # group portrait/landscape in shuffles
    SNAPSHOT_KEPT: int = 3
    SUMMARY_INTERVAL: int = 180             # seconds between TB summaries
    SCALES: Tuple[int, ...] = (600,)        # shorter-side target sizes
    MAX_SIZE: int = 1000                    # longer-side cap
    IMS_PER_BATCH: int = 1                  # reference asserts ==1; we allow >1
    SNAPSHOT_ITERS: int = 5000
    SNAPSHOT_PREFIX: str = "default"
    BATCH_SIZE: int = 128                   # RoIs sampled per image
    FG_FRACTION: float = 0.25
    FG_THRESH: float = 0.5
    BG_THRESH_HI: float = 0.5
    BG_THRESH_LO: float = 0.0               # tf/pytorch lineage value (py-faster-rcnn used 0.1)
    USE_FLIPPED: bool = True
    BBOX_REG: bool = True
    BBOX_THRESH: float = 0.5
    BBOX_NORMALIZE_TARGETS: bool = True
    BBOX_NORMALIZE_TARGETS_PRECOMPUTED: bool = True
    BBOX_INSIDE_WEIGHTS: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    BBOX_NORMALIZE_MEANS: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    BBOX_NORMALIZE_STDS: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    PROPOSAL_METHOD: str = "gt"
    TRIM_HEIGHT: int = 600
    TRIM_WIDTH: int = 600
    # RPN target hyperparameters (reference anchor_target_layer semantics).
    RPN_POSITIVE_OVERLAP: float = 0.7
    RPN_NEGATIVE_OVERLAP: float = 0.3
    RPN_CLOBBER_POSITIVES: bool = False
    RPN_FG_FRACTION: float = 0.5
    RPN_BATCHSIZE: int = 256
    RPN_NMS_THRESH: float = 0.7
    RPN_PRE_NMS_TOP_N: int = 12000
    RPN_POST_NMS_TOP_N: int = 2000
    RPN_POSITIVE_WEIGHT: float = -1.0
    USE_ALL_GT: bool = True
    # TPU-era additions (no reference counterpart; defaults keep parity):
    GRAD_CLIP: float = 0.0        # global-norm gradient clip (0 = off)
    WARMUP_ITERS: int = 0         # linear lr warmup steps (0 = off)
    WARMUP_FACTOR: float = 0.1    # starting lr fraction during warmup
    IMAGE_CACHE: bool = False     # memmap resized-image cache (data/cache.py)
    #                               skips per-epoch JPEG decode AND resize;
    #                               steady-state host work = pad-copy of
    #                               cached uint8 pixels
    NATIVE_PREP: bool = True      # C++ threaded decode/resize/pad worker
    #                               (native/data_prep.cc); bit-identical to
    #                               the cv2 python path, silent fallback


@dataclass(frozen=True)
class TestConfig:
    # Reference lib/model/config.py:~L140-L190 (__C.TEST.*).
    SCALES: Tuple[int, ...] = (600,)
    MAX_SIZE: int = 1000
    NMS: float = 0.3                        # per-class NMS threshold at test
    SVM: bool = False
    BBOX_REG: bool = True
    HAS_RPN: bool = True
    PROPOSAL_METHOD: str = "gt"
    RPN_NMS_THRESH: float = 0.7
    RPN_PRE_NMS_TOP_N: int = 6000
    RPN_POST_NMS_TOP_N: int = 300
    RPN_TOP_N: int = 5000                   # proposal_top_layer variant
    MODE: str = "nms"                       # 'nms' | 'top'
    MAX_PER_IMAGE: int = 100
    SCORE_THRESH: float = 0.05              # per-class score floor before NMS


@dataclass(frozen=True)
class ResNetConfig:
    # Reference lib/model/config.py (__C.RESNET.*).
    MAX_POOL: bool = False
    FIXED_BLOCKS: int = 1


@dataclass(frozen=True)
class MobileNetConfig:
    # Reference lib/model/config.py (__C.MOBILENET.*).
    REGU_DEPTH: bool = False
    FIXED_LAYERS: int = 5
    WEIGHT_DECAY: float = 0.00004
    DEPTH_MULTIPLIER: float = 1.0


@dataclass(frozen=True)
class FPNConfig:
    """Feature Pyramid Network (BASELINE.json config 3 — the one capability
    beyond the reference, which is single-level C4)."""

    OUT_CHANNELS: int = 256
    MIN_LEVEL: int = 2               # P2 (stride 4)
    MAX_LEVEL: int = 5               # P5 (stride 32); RPN also sees P6
    ANCHOR_SCALE: float = 8.0        # anchor size = scale * stride per level
    ROI_CANONICAL_SCALE: float = 224.0   # level assignment k0 reference size
    ROI_CANONICAL_LEVEL: int = 4
    PRE_NMS_PER_LEVEL_TRAIN: int = 2000
    PRE_NMS_PER_LEVEL_TEST: int = 1000


@dataclass(frozen=True)
class TPUConfig:
    """TPU-native additions (no reference counterpart).

    Fixed-shape execution needs static paddings; these knobs choose them.
    """

    # Image buckets (H, W) after aspect-preserving resize + zero pad; every
    # jitted graph is compiled per bucket.  Multiples of 2*FEAT_STRIDE.
    # Both orientations ship by default: a portrait VOC image (h > w,
    # ~1/3 of the dataset) resized to shorter-side-600 can be 1000 tall —
    # without the (1024, 608) bucket it would silently shrink to fit
    # 608 high (effective shorter side ~365 instead of 600, costing mAP).
    BUCKETS: Tuple[Tuple[int, int], ...] = ((608, 1024), (1024, 608))
    MAX_GT: int = 64                        # padded gt boxes per image
    NUM_DETECTIONS: int = 100               # padded final detections per image
    DTYPE: str = "bfloat16"                 # compute dtype for conv trunk
    # input scale applied after PIXEL_MEANS subtraction.  1.0 = reference
    # parity (raw Caffe-scale pixels; correct for pretrained backbones).
    # From-scratch training needs normalized inputs (e.g. 1/128) — raw-scale
    # pixels through random weights saturate/zero relu6 trunks.
    PIXEL_SCALE: float = 1.0
    ROI_SAMPLING_RATIO: int = 2             # RoIAlign samples per bin side
    USE_PALLAS: bool = True                 # Pallas kernels on TPU, jnp ref elsewhere
    # Exact threshold-select Pallas kernel for pre-NMS top-k on big anchor
    # rows (ops/pallas/select_kernel.py); kill switch like FUSED_RESNET_BLOCKS.
    THRESHOLD_SELECT: bool = True
    # Fused single-kernel Pallas bottleneck blocks for the bandwidth-bound
    # ResNet stages (ops/pallas/fused_block.py); auto-gated to stride-1 +
    # frozen-BN + bf16 + TPU, so this is a kill switch, not a promise.
    FUSED_RESNET_BLOCKS: bool = True
    MESH_AXIS: str = "data"                 # 1-D data-parallel mesh axis name
    REMAT: bool = False                     # jax.checkpoint the backbone
    PROFILE_DIR: str = ""                   # jax.profiler trace dir ("" = off)
    PROFILE_START: int = 10                 # profile steps [START, START+STEPS)
    PROFILE_STEPS: int = 5
    DEBUG_NANS: bool = False                # jax_debug_nans mode (slow)


@dataclass(frozen=True)
class Config:
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    TEST: TestConfig = field(default_factory=TestConfig)
    RESNET: ResNetConfig = field(default_factory=ResNetConfig)
    MOBILENET: MobileNetConfig = field(default_factory=MobileNetConfig)
    FPN: FPNConfig = field(default_factory=FPNConfig)
    TPU: TPUConfig = field(default_factory=TPUConfig)

    # Top-level keys (reference lib/model/config.py:~L190-L280).
    DEDUP_BOXES: float = 1.0 / 16.0
    # BGR order, Caffe ImageNet means — couples to pretrained-weight convention.
    PIXEL_MEANS: Tuple[float, ...] = (102.9801, 115.9465, 122.7717)
    RNG_SEED: int = 3
    EPS: float = 1e-14
    EXP_DIR: str = "default"
    USE_GPU_NMS: bool = True                # kept for CLI compat; unused on TPU
    POOLING_MODE: str = "align"             # 'align' | 'pool' | 'crop'
    POOLING_SIZE: int = 7
    ANCHOR_SCALES: Tuple[float, ...] = (8.0, 16.0, 32.0)
    ANCHOR_RATIOS: Tuple[float, ...] = (0.5, 1.0, 2.0)
    FEAT_STRIDE: Tuple[int, ...] = (16,)
    ROOT_DIR: str = osp.abspath(osp.join(osp.dirname(__file__), ".."))
    DATA_DIR: str = ""
    MATLAB: str = "matlab"

    def __post_init__(self):
        if not self.DATA_DIR:
            object.__setattr__(self, "DATA_DIR", osp.join(self.ROOT_DIR, "data"))

    # -- convenience -------------------------------------------------------
    @property
    def num_anchors(self) -> int:
        return len(self.ANCHOR_SCALES) * len(self.ANCHOR_RATIOS)


# The default config instance.  Unlike the reference's global ``cfg`` this is
# immutable; use cfg_from_file / cfg_from_list / dataclasses.replace to derive.
cfg = Config()


def default_config() -> Config:
    return Config()


# ---------------------------------------------------------------------------
# Layered overrides (reference cfg_from_file / cfg_from_list semantics)
# ---------------------------------------------------------------------------


def _coerce(old: Any, new: Any, key: str) -> Any:
    """Type-checked coercion mirroring the reference's _merge_a_into_b."""
    if isinstance(old, bool):
        if isinstance(new, bool):
            return new
        if isinstance(new, str):
            if new.lower() in ("true", "1", "yes"):
                return True
            if new.lower() in ("false", "0", "no"):
                return False
        raise ValueError(f"cannot coerce {new!r} to bool for key {key}")
    if isinstance(old, int) and not isinstance(old, bool):
        if isinstance(new, float) and new != int(new):
            raise ValueError(f"refusing float→int narrowing for key {key}: {new}")
        return int(new)
    if isinstance(old, float):
        return float(new)
    if isinstance(old, str):
        return str(new)
    if isinstance(old, tuple):
        if isinstance(new, str):
            import ast

            try:
                new = ast.literal_eval(new)
            except (ValueError, SyntaxError):
                raise ValueError(f"cannot parse {new!r} as a sequence for key {key}")
        if not isinstance(new, (list, tuple)):
            raise ValueError(f"cannot coerce {new!r} to tuple for key {key}")
        seq = list(new)
        if old and isinstance(old[0], tuple):  # tuple-of-tuples (e.g. BUCKETS)
            return tuple(tuple(int(v) for v in item) for item in seq)
        elem = type(old[0]) if old else float
        return tuple(elem(v) for v in seq)
    raise ValueError(f"unsupported config field type {type(old)} for key {key}")


def _parse_scalar(s: str) -> Any:
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def set_by_path(config: Config, dotted_key: str, value: Any) -> Config:
    """Return a new Config with ``dotted_key`` (e.g. 'TRAIN.LEARNING_RATE') set."""
    parts = dotted_key.split(".")

    def rec(node, parts):
        name = parts[0]
        if not hasattr(node, name):
            raise KeyError(f"unknown config key: {dotted_key}")
        old = getattr(node, name)
        if len(parts) == 1:
            return dataclasses.replace(node, **{name: _coerce(old, value, dotted_key)})
        return dataclasses.replace(node, **{name: rec(old, parts[1:])})

    return rec(config, parts)


def cfg_from_list(config: Config, kv_list) -> Config:
    """Reference ``cfg_from_list`` (--set K V pairs on the CLI)."""
    if len(kv_list) % 2 != 0:
        raise ValueError("--set expects K V pairs")
    for k, v in zip(kv_list[0::2], kv_list[1::2]):
        config = set_by_path(config, k, _parse_scalar(v) if isinstance(v, str) else v)
    return config


def cfg_from_file(config: Config, filename: str) -> Config:
    """Reference ``cfg_from_file``: deep-merge a YAML file of overrides."""
    import yaml

    with open(filename) as f:
        data = yaml.safe_load(f) or {}

    def rec(config, prefix, node):
        for k, v in node.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                config = rec(config, key + ".", v)
            else:
                config = set_by_path(config, key, v)
        return config

    return rec(config, "", data)


# ---------------------------------------------------------------------------
# Output directories (reference get_output_dir / get_output_tb_dir)
# ---------------------------------------------------------------------------


def get_output_dir(config: Config, imdb_name: str, tag: str | None = None) -> str:
    out = osp.join(config.ROOT_DIR, "output", config.EXP_DIR, imdb_name, tag or "default")
    os.makedirs(out, exist_ok=True)
    return out


def get_output_tb_dir(config: Config, imdb_name: str, tag: str | None = None) -> str:
    out = osp.join(config.ROOT_DIR, "tensorboard", config.EXP_DIR, imdb_name, tag or "default")
    os.makedirs(out, exist_ok=True)
    return out
