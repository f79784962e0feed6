from rvo3d_tpu.models.actor_critic import ActorCritic, PolicyStep
from rvo3d_tpu.models.encoder import NeighborEncoder

__all__ = ["ActorCritic", "PolicyStep", "NeighborEncoder"]
