"""PolicyServer inference benchmark on the real TPU: act() latency and
throughput at serving batch sizes, lax.scan vs Pallas GRU encoder.

The reference's serving analogue is post_train.load_policy's per-call
torch closure driven one observation at a time (post_train.py:61-74,
with per-action latency timers at :65-70 that are collected but never
reported). Here inference is a jitted batched function; this script
reports the numbers the reference never did. Writes serving_bench.json.

Usage: python scripts/serving_bench.py [B ...]   (default 1 256 4096 32768)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from rvo3d_tpu.config import ModelConfig
    from rvo3d_tpu.models import ActorCritic
    from rvo3d_tpu.serving import PolicyServer

    Bs = [int(a) for a in sys.argv[1:]] or [1, 256, 4096, 32768]
    nm = 10
    results = {"device": str(jax.devices()[0]), "batches": {}}

    for use_pallas in (False, True):
        mc = ModelConfig(use_pallas_gru=use_pallas)
        ac = ActorCritic(mc)
        key = jax.random.PRNGKey(0)
        params = ac.init(key, jnp.zeros((1, 12)), jnp.zeros((1, nm, 9)),
                         jnp.zeros((1, nm), bool))
        srv = PolicyServer(ac, params, nm=nm)
        tag = "pallas" if use_pallas else "scan"
        for B in Bs:
            ks = jax.random.split(jax.random.PRNGKey(B), 3)
            obs_self = jax.random.normal(ks[0], (B, 12), jnp.float32)
            obs_nbr = jax.random.normal(ks[1], (B, nm, 9), jnp.float32)
            obs_mask = jax.random.bernoulli(ks[2], 0.5, (B, nm))
            a = srv.act(obs_self, obs_nbr, obs_mask)   # compile
            jax.block_until_ready(a)
            n_iter = 50 if B <= 4096 else 20
            t0 = time.perf_counter()
            for _ in range(n_iter):
                a = srv.act(obs_self, obs_nbr, obs_mask)
            jax.block_until_ready(a)
            dt = (time.perf_counter() - t0) / n_iter
            row = results["batches"].setdefault(str(B), {})
            row[f"latency_ms_{tag}"] = round(dt * 1e3, 3)
            row[f"actions_per_sec_{tag}"] = round(B / dt, 1)
            print(f"B={B:6d} {tag:6s}: {dt * 1e3:7.3f} ms/call, "
                  f"{B / dt:,.0f} actions/s", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "serving_bench.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
