"""World registry: name -> directory resolution.

Search order:
  1. explicitly registered names (register_world)
  2. $RVO3D_WORLD_PATH (colon-separated directories)
  3. <repo>/worlds_data
  4. the read-only reference fixture directory, if present (used by the
     parity test-suite; never written to)
"""

from __future__ import annotations

import os
from typing import Dict, List

from rvo3d_tpu.worlds.loader import WorldData, load_world_dir

_REGISTRY: Dict[str, str] = {}

_REFERENCE_WORLDS = "/root/reference/uaisa_env/world"


def register_world(name: str, base_dir: str) -> None:
    _REGISTRY[name] = base_dir


def world_search_paths() -> List[str]:
    paths = []
    env = os.environ.get("RVO3D_WORLD_PATH", "")
    paths.extend([p for p in env.split(":") if p])
    repo_worlds = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "worlds_data")
    paths.append(repo_worlds)
    if os.path.isdir(_REFERENCE_WORLDS):
        paths.append(_REFERENCE_WORLDS)
    return paths


def resolve_world(name: str) -> WorldData:
    if name in _REGISTRY:
        return load_world_dir(_REGISTRY[name], name)
    if os.path.isdir(name) and os.path.exists(os.path.join(name, "data_1.json")):
        return load_world_dir(name)
    for root in world_search_paths():
        cand = os.path.join(root, name)
        if os.path.exists(os.path.join(cand, "data_1.json")):
            return load_world_dir(cand, name)
    raise FileNotFoundError(
        f"world '{name}' not found; searched registry + {world_search_paths()}"
    )
