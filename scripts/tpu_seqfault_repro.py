"""Minimized repro + bisect harness for the sequential-update TPU fault.

Round-4 observation (RESULTS.md "Platform fault"): the reference-faithful
sequential per-agent PPO update program — lax.fori_loop over agents, each
trip running a KL-early-stop lax.while_loop of policy steps then a fori of
value steps (rvo3d_tpu/algo/ppo.py:ppo_update, mirroring reference
train/policy/multi_ppo.py:341-377) — reproducibly dies with
`UNAVAILABLE: TPU device error` at N=8 drones / E=256 envs on the axon
backend, while the SAME data through the batched joint update trains to
100 %. This script turns that from an anecdote into an artifact:

  python scripts/tpu_seqfault_repro.py            # run all variants
  python scripts/tpu_seqfault_repro.py --variant seq_full   # one, in-process

Each variant runs in its OWN SUBPROCESS (serially — one TPU client at a
time), so a device fault kills the child, not the harness; pass/fail per
variant is recorded in tpu_seqfault.json at the repo root. The variants
bisect along: sequential-vs-batched schedule, while_loop-vs-none,
agent-count, env-count, update-count. Synthetic rollout data (no env) is
used so the env step program is out of the frame entirely.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

T = 300  # steps_per_epoch (reference schedule)

# variant -> TrainConfig overrides + data shape
VARIANTS = {
    # the faulting composition: sequential fori-over-agents x KL while_loop,
    # full-batch iterations, reference world_8 scale
    "seq_full": dict(N=8, E=256, batched=False, pi_iters=20, v_iters=50),
    # same data, batched joint update (the production workaround) — control
    "batched": dict(N=8, E=256, batched=True, pi_iters=20, v_iters=50,
                    minibatch=16384),
    # ablate the KL while_loop (value fori only)
    "seq_no_pi": dict(N=8, E=256, batched=False, pi_iters=0, v_iters=50),
    # ablate the value fori (pi while_loop only)
    "seq_no_vf": dict(N=8, E=256, batched=False, pi_iters=20, v_iters=0),
    # shrink the agent axis (w4 scale)
    "seq_n4": dict(N=4, E=256, batched=False, pi_iters=20, v_iters=50),
    # shrink the env axis
    "seq_e64": dict(N=8, E=64, batched=False, pi_iters=20, v_iters=50),
    # fewer fori-over-agent trips
    "seq_upd2": dict(N=8, E=256, batched=False, pi_iters=20, v_iters=50,
                     max_update_num=2),
}


def run_variant(name: str) -> None:
    """One synthetic ppo_update at the variant's shape; exits 0 on success."""
    spec = VARIANTS[name]
    import jax
    import jax.numpy as jnp

    from rvo3d_tpu.algo.ppo import (AgentData, PPOState, make_optimizers,
                                    ppo_update)
    from rvo3d_tpu.config import ModelConfig, TrainConfig
    from rvo3d_tpu.models import ActorCritic

    N, E = spec["N"], spec["E"]
    cfg = TrainConfig(
        train_pi_iters=spec["pi_iters"], train_v_iters=spec["v_iters"],
        target_kl=0.01, pi_lr=1e-6, vf_lr=5e-5,
        batched_update=spec.get("batched", False),
        minibatch=spec.get("minibatch", 0),
        max_update_num=spec.get("max_update_num", 10),
    )
    ac = ActorCritic(ModelConfig())  # biGRU-256 flagship
    key = jax.random.PRNGKey(0)
    params = ac.init(key, jnp.zeros((1, 12)), jnp.zeros((1, 10, 9)),
                     jnp.zeros((1, 10), bool))
    pi_tx, vf_tx = make_optimizers(cfg, params)
    state = PPOState(params, pi_tx.init(params), vf_tx.init(params))

    ks = jax.random.split(key, 9)
    data = AgentData(
        obs_self=jax.random.normal(ks[0], (T, E, N, 12)),
        obs_nbr=jax.random.normal(ks[1], (T, E, N, 10, 9)),
        obs_mask=jax.random.bernoulli(ks[2], 0.5, (T, E, N, 10)),
        act=jax.random.uniform(ks[3], (T, E, N, 3), minval=-1, maxval=1),
        adv=jax.random.normal(ks[4], (T, E, N)),
        ret=jax.random.normal(ks[5], (T, E, N)),
        logp=jax.random.normal(ks[6], (T, E, N)) - 3.0,
        val=jax.random.normal(ks[7], (T, E, N)),
    )
    upd = jax.jit(lambda s, d, k: ppo_update(ac, cfg, pi_tx, vf_tx, s, d, k))
    t0 = time.time()
    state, metrics = upd(state, data, ks[8])
    jax.block_until_ready(state.params)
    import numpy as np

    assert np.all(np.isfinite(np.asarray(metrics.v_loss))), metrics
    print(f"{name}: OK in {time.time() - t0:.1f}s "
          f"(pi_iters={np.asarray(metrics.pi_iters).tolist()})")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None)
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--out", default=os.path.join(ROOT, "tpu_seqfault.json"))
    args = ap.parse_args()

    if args.variant:
        run_variant(args.variant)
        return 0

    results = []
    for name in VARIANTS:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--variant", name],
                capture_output=True, text=True, timeout=args.timeout,
                cwd=ROOT,
            )
            rc, out = proc.returncode, (proc.stdout + proc.stderr)
        except subprocess.TimeoutExpired as exc:
            rc = -9
            out = ((exc.stdout or "") + (exc.stderr or "")
                   + "\n[harness] TIMEOUT")
        tail = out.strip().splitlines()[-8:]
        entry = {
            "variant": name,
            "spec": VARIANTS[name],
            "ok": rc == 0,
            "returncode": rc,
            "seconds": round(time.time() - t0, 1),
            "device_fault": ("UNAVAILABLE" in out or "device error" in out),
            "tail": tail,
        }
        results.append(entry)
        print(json.dumps(entry, indent=1), flush=True)

    payload = {
        "T": T,
        "jax_platform": _platform(),
        "results": results,
        "summary": {r["variant"]: ("ok" if r["ok"] else
                                   ("device_fault" if r["device_fault"]
                                    else f"rc={r['returncode']}"))
                    for r in results},
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}")
    return 0


def _platform() -> str:
    # do NOT import jax in the orchestrator: that would attach a second
    # TPU client alongside the child's (one-client rule — a second process
    # attaching mid-compile wedges both at the relay)
    return os.environ.get("JAX_PLATFORMS", "default (container TPU pin)")


if __name__ == "__main__":
    raise SystemExit(main())
