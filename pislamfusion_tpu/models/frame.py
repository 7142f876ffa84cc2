"""Frame and MapPoint host-side containers.

Equivalents of the reference's MapFrame/MapPoint implementations
(GSLAM-DIYSLAM/src/MapFrame.{h,cpp}, MapPoint.{h,cpp}): a frame carries its
camera, image, padded feature arrays (the device-side products of
`ops.features`), unprojected rays, the keypoint->mappoint assignment, GPS,
and its pose; a map point carries position/normal/color/descriptor and a
bidirectionally-consistent observation dict.

Host containers hold numpy; device arrays are materialized per kernel call.
The reference's 32x32 feature grid (MapFrame.cpp:226-304 getFeaturesInArea)
is unnecessary here: windowed search is a dense [N, M] mask on the MXU
(ops.matching.window_mask).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from ..core.camera import Camera


@dataclasses.dataclass
class Frame:
    id: int
    timestamp: float
    camera: Camera
    image: Optional[np.ndarray] = None          # [H, W] gray or [H, W, 3]
    color: Optional[np.ndarray] = None          # [H, W, 3] for the mosaic
    xy: Optional[np.ndarray] = None             # [N, 2] keypoints (px)
    desc: Optional[np.ndarray] = None           # [N, D] (256 bits / 128 f32)
    desc_kind: str = "orb"
    angle: Optional[np.ndarray] = None          # [N]
    octave: Optional[np.ndarray] = None         # [N]
    response: Optional[np.ndarray] = None       # [N]
    valid: Optional[np.ndarray] = None          # [N] bool
    rays: Optional[np.ndarray] = None           # [N, 3] unprojected (z=1)
    pose_c2w: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32))
    kp2mp: Optional[np.ndarray] = None          # [N] int64 mappoint id or -1
    gps_lla: Optional[np.ndarray] = None        # (lon, lat, alt)
    gps_enu: Optional[np.ndarray] = None        # local-frame xyz
    gps_acc: float = 5.0
    is_keyframe: bool = False
    # keyframe connection weights: {frame_id: shared point count}
    connections: Dict[int, int] = dataclasses.field(default_factory=dict)
    # lazy BoW word set (MapFrame.cpp:156-209 lazy BoW via global vocab)
    bow_words: Optional[np.ndarray] = None
    image_path: Optional[str] = None   # source file (dataset frames)

    def set_features(self, feats: dict, kind: str):
        """Install padded feature arrays (from ops.features.*_detect)."""
        self.xy = np.asarray(feats["xy"], np.float32)
        self.desc = np.asarray(feats["desc"])
        self.angle = np.asarray(feats["angle"], np.float32)
        self.octave = np.asarray(feats["octave"], np.int32)
        self.response = np.asarray(feats["response"], np.float32)
        self.valid = np.asarray(feats["valid"], bool)
        self.desc_kind = kind
        self.rays = np.asarray(self.camera.unproject(self.xy), np.float32)
        self.kp2mp = np.full(len(self.xy), -1, np.int64)

    @property
    def n_kp(self) -> int:
        return 0 if self.xy is None else len(self.xy)

    def n_tracked(self) -> int:
        return 0 if self.kp2mp is None else int((self.kp2mp >= 0).sum())

    def median_depth(self, points_xyz: np.ndarray) -> float:
        """Median depth of given world points in this camera
        (MapFrame::getMedianDepth, MapFrame.cpp:135-154). Host numpy — this
        runs in per-keyframe bookkeeping, no device round trip."""
        from ..utils import host_se3 as hse3
        if len(points_xyz) == 0:
            return 1.0
        pc = hse3.se3_apply(hse3.se3_inv(self.pose_c2w), points_xyz)
        z = pc[:, 2]
        z = z[z > 0]
        return float(np.median(z)) if len(z) else 1.0


@dataclasses.dataclass
class MapPoint:
    id: int
    position: np.ndarray                         # [3]
    descriptor: np.ndarray                       # [D]
    normal: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    color: np.ndarray = dataclasses.field(
        default_factory=lambda: np.full(3, 128, np.uint8))
    ref_frame: int = -1
    observations: Dict[int, int] = dataclasses.field(default_factory=dict)
    bad: bool = False
    created_at_kf: int = 0                       # for culling bookkeeping

    def n_obs(self) -> int:
        return len(self.observations)
