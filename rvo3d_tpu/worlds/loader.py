"""World artifact loading.

Ingests the reference's world format (reference: env_base.load_data,
env_base.py:26-47; schema produced by path_planning_main.py:199-205):

  <world>/data_1.json : {drone_num, map_size, waypoints_list, n_points_list,
                         building_list}
  <world>/E3d.npy, E3d_safe.npy : float occupancy grids (0 free, 1 occupied,
                                  0.5 safety margin in _safe)

The occupancy grids are host-side planning artifacts only — the training
step never consults them (SURVEY §3.2 quirk) — so they are loaded lazily
and kept off-device.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import numpy as np

from rvo3d_tpu.env.state import WorldSpec, make_world_spec


@dataclasses.dataclass
class WorldData:
    """Host-side world record (pre-padding)."""

    name: str
    drone_num: int
    map_size: List[float]
    waypoints_list: List[List[List[float]]]
    n_points_list: List[int]
    building_list: List[List[float]]
    base_dir: Optional[str] = None

    _e3d: Optional[np.ndarray] = dataclasses.field(default=None, repr=False)
    _e3d_safe: Optional[np.ndarray] = dataclasses.field(default=None, repr=False)

    @property
    def e3d(self) -> Optional[np.ndarray]:
        if self._e3d is None and self.base_dir:
            path = os.path.join(self.base_dir, "E3d.npy")
            if os.path.exists(path):
                self._e3d = np.load(path)
        return self._e3d

    @property
    def e3d_safe(self) -> Optional[np.ndarray]:
        if self._e3d_safe is None and self.base_dir:
            path = os.path.join(self.base_dir, "E3d_safe.npy")
            if os.path.exists(path):
                self._e3d_safe = np.load(path)
        return self._e3d_safe

    def spec(self, *, radius: float = 0.2, priority: float = 5.0,
             vel_max: float = 1.0, pad_waypoints: int | None = None,
             pad_buildings: int | None = None, dtype=np.float32) -> WorldSpec:
        return make_world_spec(
            self.waypoints_list,
            self.building_list,
            self.map_size,
            radius=radius,
            priority=priority,
            vel_max=vel_max,
            pad_waypoints=pad_waypoints,
            pad_buildings=pad_buildings,
            dtype=dtype,
        )

    def save(self, out_dir: str) -> None:
        """Write the data_1.json schema (and grids if present)."""
        os.makedirs(out_dir, exist_ok=True)
        payload = {
            "drone_num": self.drone_num,
            "map_size": list(self.map_size),
            "waypoints_list": self.waypoints_list,
            "n_points_list": self.n_points_list,
            "building_list": self.building_list,
        }
        with open(os.path.join(out_dir, "data_1.json"), "w") as f:
            json.dump(payload, f)
        if self._e3d is not None:
            np.save(os.path.join(out_dir, "E3d.npy"), self._e3d)
        if self._e3d_safe is not None:
            np.save(os.path.join(out_dir, "E3d_safe.npy"), self._e3d_safe)


def load_world_dir(base_dir: str, name: Optional[str] = None) -> WorldData:
    json_path = os.path.join(base_dir, "data_1.json")
    with open(json_path, "r") as f:
        data = json.load(f)
    return WorldData(
        name=name or os.path.basename(os.path.normpath(base_dir)),
        drone_num=int(data.get("drone_num", 0)),
        map_size=data.get("map_size", []),
        waypoints_list=data.get("waypoints_list", []),
        n_points_list=data.get("n_points_list", []),
        building_list=data.get("building_list", []),
        base_dir=base_dir,
    )


def load_world(name: str) -> WorldData:
    """Resolve a world by registry name or by path. Unlike the reference's
    hard-coded base_dir (env_base.py:15), selection is explicit."""
    from rvo3d_tpu.worlds.registry import resolve_world

    return resolve_world(name)
