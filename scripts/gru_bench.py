"""Pallas GRU microbenchmark on real TPU (VERDICT round-2 item 4: prove or
drop ops/pallas_gru.py). Times masked_gru_scan vs the lax.scan path at
rollout shapes (B = E*N flattened agents, biGRU-256 over nm=10 neighbor
slots), forward-only (the rollout/eval/serving hot path the kernel serves).

Usage: python scripts/gru_bench.py [E ...]   (default 4096 16384)
Writes gru_bench.json at the repo root.
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


def time_fn(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from rvo3d_tpu.ops.pallas_gru import (gru_scan_reference, masked_gru_scan,
                                          pallas_available)

    N, NM, IN, H = 8, 10, 9, 256
    results = {"device": str(jax.devices()[0]),
               "pallas_available": pallas_available(), "shapes": {}}
    Es = [int(a) for a in sys.argv[1:]] or [4096, 16384]

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    w_ih = jax.random.normal(ks[0], (IN, 3 * H)) * 0.05
    w_hh = jax.random.normal(ks[1], (H, 3 * H)) * 0.05
    b_ih = jax.random.normal(ks[2], (3 * H,)) * 0.05
    b_hh = jax.random.normal(ks[3], (3 * H,)) * 0.05

    for E in Es:
        B = E * N
        xs = jax.random.normal(ks[4], (NM, B, IN))
        mask = (jax.random.uniform(ks[5], (NM, B)) < 0.7).astype(jnp.float32)

        scan_fn = jax.jit(lambda x, m: gru_scan_reference(
            x, m > 0, w_ih, w_hh, b_ih, b_hh))
        pallas_fn = jax.jit(lambda x, m: masked_gru_scan(
            x, m, w_ih, w_hh, b_ih, b_hh))

        t_scan = time_fn(scan_fn, xs, mask)
        t_pallas = time_fn(pallas_fn, xs, mask)
        # correctness cross-check at bench shapes
        err = float(jnp.max(jnp.abs(scan_fn(xs, mask)
                                    - pallas_fn(xs, mask))))
        row = {"B": B, "scan_ms": round(t_scan * 1e3, 3),
               "pallas_ms": round(t_pallas * 1e3, 3),
               "speedup": round(t_scan / t_pallas, 3),
               "max_abs_err": err}
        results["shapes"][f"E{E}"] = row
        print(f"E={E} (B={B}): scan {row['scan_ms']} ms, "
              f"pallas {row['pallas_ms']} ms, speedup {row['speedup']}x, "
              f"err {err:.2e}", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "gru_bench.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
