from rvo3d_tpu.render.plot import ScenePlotter, record_trajectory
from rvo3d_tpu.render.gif import frames_to_gif

__all__ = ["ScenePlotter", "record_trajectory", "frames_to_gif"]
