from rvo3d_tpu.worlds.loader import load_world, load_world_dir, WorldData
from rvo3d_tpu.worlds.registry import register_world, world_search_paths

__all__ = [
    "load_world",
    "load_world_dir",
    "WorldData",
    "register_world",
    "world_search_paths",
]
