"""rvo3d_tpu — TPU-native 3D multi-UAV RVO collision-avoidance MARL framework.

A brand-new JAX/XLA/pjit framework with the capabilities of the reference
ZSHCRWY25/3DRVO-MARL-CollisionAvoidance repository: a 3D structured-airspace
drone simulator (waypoint routes, cylinder buildings, 3D reciprocal velocity
obstacle cones) coupled to a multi-agent PPO trainer (GRU neighbor encoder,
Gaussian actor-critic, GAE-lambda).

Unlike the reference (a single-process Python object soup), the environment
here is a pure-functional fixed-shape PyTree stepped by jitted functions;
agents and env instances are array axes, sharded over TPU device meshes.

Layout:
  env/       vectorized environment core: geometry, RVO cones, rewards, step
  worlds/    world format loaders, registry, offline generation pipeline
  models/    Flax policy networks (masked GRU/biGRU encoder, actor-critic)
  algo/      PPO learner, GAE, rollout, trainer, evaluator
  parallel/  mesh construction and sharding specs
  ops/       Pallas TPU kernels for hot paths
  utils/     checkpointing, metrics, rng, profiling
  render/    host-side rendering/GIF tooling (decoupled from the env)
"""

__version__ = "0.1.0"
