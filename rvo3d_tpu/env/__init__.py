from rvo3d_tpu.env import geometry, rvo, reward, state
from rvo3d_tpu.env.env import DroneEnv

__all__ = ["geometry", "rvo", "reward", "state", "DroneEnv"]
