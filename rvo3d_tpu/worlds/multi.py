"""Multi-scenario batching: different worlds in different env lanes.

The BASELINE config ladder tops out at a "multi-scenario mix sharded over
hosts" — one vectorized batch where lane e steps scenario world_idx[e].
WorldSpec is already a pure PyTree consumed by pure functions, so mixing
scenarios is data, not code: stack K specs along a leading axis (padded to
common waypoint/building counts), gather one spec per lane, and vmap the
step over (world, state, action).

All stacked worlds must share the drone count N (the agent axis is a
static shape); waypoint and building axes pad automatically.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rvo3d_tpu.env.state import WorldSpec


def stack_worlds(specs: Sequence[WorldSpec]) -> WorldSpec:
    """Stack K WorldSpecs into one with a leading scenario axis K."""
    n = {int(s.num_drones) for s in specs}
    if len(n) != 1:
        raise ValueError(f"all worlds must share drone count, got {sorted(n)}")
    if any(s.spheres is not None for s in specs):
        if not all(s.spheres is not None
                   and s.spheres.count == specs[0].spheres.count
                   for s in specs):
            raise ValueError("sphere counts must match across stacked worlds")

    w_max = max(s.waypoints.shape[1] for s in specs)
    b_max = max(s.buildings.shape[0] for s in specs)

    def pad_wps(s: WorldSpec):
        w = np.asarray(s.waypoints)
        if w.shape[1] < w_max:
            tail = np.repeat(w[:, -1:, :], w_max - w.shape[1], axis=1)
            w = np.concatenate([w, tail], axis=1)
        return w

    def pad_b(s: WorldSpec):
        b = np.asarray(s.buildings)
        m = np.asarray(s.building_mask)
        if b.shape[0] < b_max:
            b = np.concatenate(
                [b, np.zeros((b_max - b.shape[0], 4), b.dtype)], axis=0)
            m = np.concatenate([m, np.zeros(b_max - m.shape[0], bool)])
        return b, m

    bs, ms = zip(*(pad_b(s) for s in specs))
    spheres = None
    if specs[0].spheres is not None:
        spheres = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *(s.spheres for s in specs))
    return WorldSpec(
        waypoints=jnp.stack([jnp.asarray(pad_wps(s)) for s in specs]),
        n_points=jnp.stack([s.n_points for s in specs]),
        route_len=jnp.stack([s.route_len for s in specs]),
        buildings=jnp.stack([jnp.asarray(b) for b in bs]),
        building_mask=jnp.stack([jnp.asarray(m) for m in ms]),
        map_size=jnp.stack([s.map_size for s in specs]),
        radius=jnp.stack([s.radius for s in specs]),
        priority=jnp.stack([s.priority for s in specs]),
        vel_max=jnp.stack([s.vel_max for s in specs]),
        spheres=spheres,
    )


def reverse_routes(spec: WorldSpec) -> WorldSpec:
    """Scenario variant with every route flown end-to-start (same map,
    same buildings, same polyline length — a distinct traffic pattern for
    multi-scenario training). Host-side: reverses only each drone's
    n_points valid waypoints and re-pads by repeating the new last one,
    so the padding invariant of make_world_spec is preserved."""
    wps = np.asarray(spec.waypoints).copy()
    npts = np.asarray(spec.n_points)
    for i in range(wps.shape[0]):
        k = int(npts[i])
        wps[i, :k] = wps[i, :k][::-1]
        wps[i, k:] = wps[i, k - 1]
    return spec._replace(waypoints=jnp.asarray(wps))


def worlds_for_lanes(stacked: WorldSpec, world_idx) -> WorldSpec:
    """Gather a per-lane WorldSpec (leaves [E, ...]) from a stacked spec.

    Host-side / concrete-only: ``world_idx`` must be a concrete array
    (np.ndarray or unjitted jnp array) — the leaves are materialized via
    np.asarray, so calling this with a tracer (inside jit/vmap) raises
    TracerArrayConversionError by design. Build lane worlds once at setup,
    not on a traced path (ADVICE r3)."""
    # host-side numpy gather: runs once at setup with concrete indices, and
    # avoids the axon TPU backend's miscompiled small-gather lowering
    # (see env/state.py:_wp_select).
    idx = np.asarray(world_idx, np.int32)
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x)[idx]), stacked)


class MultiWorldEnv:
    """Batched env where lane e runs its own world (leaves [E, ...])."""

    def __init__(self, specs: Sequence[WorldSpec], world_idx, params,
                 dtype=jnp.float32):
        from rvo3d_tpu.env.env import observe, reset, reset_where, step

        self.params = params
        self.dtype = dtype
        stacked = stack_worlds(specs)
        self.lane_worlds = worlds_for_lanes(stacked, world_idx)
        self.num_envs = len(np.asarray(world_idx))

        self._step = jax.jit(jax.vmap(
            lambda w, s, a: step(w, s, a, params)))
        self._observe = jax.jit(jax.vmap(
            lambda w, s: observe(w, s, params)))
        self._reset_where = jax.jit(jax.vmap(
            lambda w, s, m: reset_where(w, s, m)))
        self._reset = jax.vmap(lambda w: reset(w, params, dtype))

    def reset_batch(self):
        state = self._reset(self.lane_worlds)
        out, state = self._observe(self.lane_worlds, state)
        return state, out

    def step_batch(self, state, actions):
        return self._step(self.lane_worlds, state, actions)

    def observe_batch(self, state):
        return self._observe(self.lane_worlds, state)

    def reset_where_batch(self, state, mask):
        return self._reset_where(self.lane_worlds, state, mask)
