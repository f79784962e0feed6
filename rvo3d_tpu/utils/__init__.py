from rvo3d_tpu.utils.heuristic import waypoint_controller

__all__ = ["waypoint_controller"]
