"""Conflict-state approximation-error diagnostic (round 5, committed form).

RESULTS.md's round-5 closing diagnostic measured, for the world_8 product
clone, that at VO-flagged conflict states the clone's per-component action
error exceeds the expert's own dodge labels — i.e. the noisy-success gap is
a class-imbalance approximation error at exactly the states that decide
episodes. That measurement was ad-hoc; this script is the reproducible
version, and the instrument for judging the conflict-weighted-BC lever.

Method: load a trained run's checkpoint, roll the CLONE's own mean policy
on the noise channel (control noise exactly as the noisy eval injects it,
drone.py:79-82,163-165 semantics), relabel every visited state with the
run's own expert (rvo + margin/slowdown as trained), and split the stream
by conflict flag (any VO neighbor flagged in the observation mask):

  - frac_conflict           share of visited states that are conflicts
  - rms_err_{conflict,cruise}  per-component RMS of (clone mean - expert)
  - rms_label_conflict      per-component RMS of the expert's own commands
                            at conflict states (the dodge signal size)

A clone whose rms_err_conflict >= rms_label_conflict cannot express the
dodge; driving that ratio below ~1 is the point of --bc_conflict_weight.

Usage:
  JAX_PLATFORMS=cpu python scripts/conflict_diag.py RUN_DIR WORLD \
      [--ckpt_epoch N] [--margin M] [--slowdown] [--steps T] [--envs E]
Writes runs/bc_evals/conflict_diag_<run>_<epoch>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rvo3d_tpu.algo.bc import collect_demos
from rvo3d_tpu.algo.trainer import Trainer
from rvo3d_tpu.config import EnvParams
from rvo3d_tpu.utils.checkpoint import load_config, restore_checkpoint
from rvo3d_tpu.worlds import load_world


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("world")
    ap.add_argument("--ckpt_epoch", type=int, default=None)
    ap.add_argument("--margin", type=float, default=None)
    ap.add_argument("--slowdown", action="store_true")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    wd = load_world(args.world)
    world = wd.spec()
    cfg = load_config(args.run_dir)
    p = EnvParams(num_drones=wd.drone_num)
    trainer = Trainer(cfg, world)
    state, epoch = restore_checkpoint(os.path.join(args.run_dir, "ckpt"),
                                      trainer.ppo_state,
                                      epoch=args.ckpt_epoch)
    params = state.params
    ac = trainer.ac
    print(f"diagnosing {args.run_dir} @ epoch {epoch} "
          f"(action_mode={cfg.train.action_mode})", flush=True)

    def behavior_fn(obs_self, obs_nbr, obs_mask):
        mu, _, _ = ac.apply(params, obs_self, obs_nbr, obs_mask)
        return mu

    # clone-driven rollout on the control-noise channel; expert relabels
    obs_self, obs_nbr, obs_mask, target = collect_demos(
        world, p, args.envs, args.steps, jax.random.PRNGKey(args.seed),
        expert="rvo", action_mode=cfg.train.action_mode,
        expert_margin=args.margin, behavior_fn=behavior_fn,
        expert_slowdown=args.slowdown, env_noise=True)

    mu, _, _ = ac.apply(params, obs_self, obs_nbr, obs_mask)
    mu = np.asarray(mu)
    target = np.asarray(target)
    conflict = np.asarray(jnp.any(obs_mask, -1))
    err = mu - target

    def rms(x, m):
        m = m.astype(bool)
        if not m.any():
            return [float("nan")] * x.shape[1]
        return [float(v) for v in
                np.sqrt(np.mean(x[m] ** 2, axis=0)).round(4)]

    report = {
        "run_dir": args.run_dir,
        "epoch": int(epoch),
        "world": args.world,
        "expert_margin": args.margin,
        "expert_slowdown": bool(args.slowdown),
        "states": int(conflict.size),
        "frac_conflict": round(float(conflict.mean()), 5),
        "rms_err_conflict": rms(err, conflict),
        "rms_err_cruise": rms(err, ~conflict),
        "rms_label_conflict": rms(target, conflict),
        "rms_err_conflict_all": round(
            float(np.sqrt(np.mean(err[conflict] ** 2)))
            if conflict.any() else float("nan"), 4),
    }
    out = args.out or os.path.join(
        "runs", "bc_evals",
        f"conflict_diag_{os.path.basename(args.run_dir.rstrip('/'))}"
        f"_{epoch}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1), flush=True)
    print(f"-> {out}", flush=True)


if __name__ == "__main__":
    main()
