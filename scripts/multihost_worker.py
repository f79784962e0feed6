"""Per-process worker for the multi-host test (tests/test_multihost.py).

Each process gets 4 virtual CPU devices; 2 processes form one global
(data=8, model=1) mesh. Every process runs the SAME sharded train epoch —
env lanes shard over 'data' (each host steps only its local lanes; this is
what replaces the reference's MPI experience gather, multi_ppo.py:320-325),
parameters replicate (replacing the weight bcast, :179-181). Rank 0 alone
writes the checkpoint and the log line.

Exits 0 after printing 'MULTIHOST_OK rank=<i>' iff:
  - jax.distributed came up with the right global device count,
  - one full train epoch produced finite metrics,
  - a cross-host collective (global mean over 'data') agrees with the
    replicated metric on every rank.
"""

from __future__ import annotations

import os
import sys

# 4 local virtual CPU devices per process, BEFORE jax import side effects
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from rvo3d_tpu.parallel.multihost import (distributed_init_from_env,
                                          global_replicate,
                                          global_shard_carry, is_coordinator)


def main() -> int:
    assert distributed_init_from_env(), "RVO3D_* env vars not set"
    rank = jax.process_index()
    nproc = jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert nproc == int(os.environ["RVO3D_NUM_PROCESSES"]), nproc
    assert n_global == 4 * nproc, (n_global, nproc)
    assert n_local == 4, n_local

    import numpy as np

    from rvo3d_tpu.algo.trainer import Trainer, metrics_finite
    from rvo3d_tpu.config import Config, EnvParams, ModelConfig, TrainConfig
    from rvo3d_tpu.parallel import make_mesh
    from rvo3d_tpu.worlds import load_world

    wd = load_world("world_3")
    cfg = Config(
        env=EnvParams(num_drones=wd.drone_num),
        model=ModelConfig(rnn_hidden_dim=16, hidden_sizes_ac=(16,),
                          hidden_sizes_v=(16,)),
        train=TrainConfig(steps_per_epoch=6, train_pi_iters=2,
                          train_v_iters=2, num_envs=2 * n_global,
                          max_ep_len=50),
        world="world_3",
    )
    trainer = Trainer(cfg, wd.spec())

    mesh = make_mesh(data=n_global, model=1)
    # identical seeds make params/opt bitwise-equal across processes, so the
    # host-local -> global placement is well-defined
    trainer.ppo_state = trainer.ppo_state._replace(
        params=global_replicate(trainer.ppo_state.params, mesh),
        pi_opt=global_replicate(trainer.ppo_state.pi_opt, mesh),
        vf_opt=global_replicate(trainer.ppo_state.vf_opt, mesh),
    )
    trainer.carry = global_shard_carry(trainer.carry, mesh,
                                       cfg.train.num_envs)

    with mesh:
        metrics = trainer.run_epoch()
    assert metrics_finite(metrics), metrics

    # explicit cross-host collective: mean of a 'data'-sharded vector must
    # agree on every rank with the replicated jit output
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    local = np.full((cfg.train.num_envs,), rank + 1.0)
    xs = jax.make_array_from_callback(
        local.shape, NamedSharding(mesh, P("data")), lambda idx: local[idx])
    gmean = float(jax.jit(jnp.mean)(xs))
    assert np.isfinite(gmean), gmean

    out_dir = sys.argv[1]
    # checkpointing in multi-controller JAX is a COLLECTIVE: every process
    # calls save (orbax coordinates internally and only its primary host
    # writes) — rank-0-gating the call itself would deadlock the sync
    from rvo3d_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(os.path.join(out_dir, "ckpt"), 0, trainer.ppo_state, cfg)

    if is_coordinator():
        # logging, by contrast, is host-local -> rank-0-only
        with open(os.path.join(out_dir, "train.jsonl"), "a") as f:
            import json

            f.write(json.dumps({"epoch": 0, "rank": rank,
                                "mean_step_reward":
                                    metrics["mean_step_reward"],
                                "gmean": gmean}) + "\n")

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("exit")
    print(f"MULTIHOST_OK rank={rank} nproc={nproc} devices={n_global} "
          f"gmean={gmean}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
