"""Pallas TPU kernel: fused masked-GRU scan over the neighbor axis.

The policy encoder runs a GRU over nm=10 neighbor slots for every agent in
every env lane (models/encoder.py). As a lax.scan this is 2*nm small
matmuls with the carry bouncing through HBM between steps; this kernel
holds the carry and both weight matrices in VMEM for the whole sequence —
one kernel launch per batch tile, gates computed on the MXU, the mask
applied as a lane select.

Shapes (B = flattened batch of agents, S = nm slots):
  xs    [S, B, IN]   neighbor features (IN = 9)
  mask  [S, B]       slot validity (float 0/1)
  w_ih  [IN, 3H], w_hh [H, 3H], b_ih [3H], b_hh [3H]  (torch gate order r,z,n)
  out   [B, H]

The backward pass recomputes through the pure-JAX scan (custom_vjp), so
gradients are exact while the forward hot path (rollout, eval, serving)
runs the fused kernel. Falls back to the scan automatically off-TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

TILE_B = 256


def pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _gru_cell(h, x, m, w_ih, w_hh, b_ih, b_hh):
    gi = x @ w_ih + b_ih
    gh = h @ w_hh + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    new = (1.0 - z) * n + z * h
    return jnp.where(m[..., None] > 0, new, h)


def gru_scan_reference(xs, mask, w_ih, w_hh, b_ih, b_hh):
    """Pure-JAX semantics (identical to models/encoder._GRUCore)."""
    h0 = jnp.zeros(xs.shape[1:-1] + (w_hh.shape[0],), xs.dtype)

    def body(h, inp):
        x, m = inp
        return _gru_cell(h, x, m, w_ih, w_hh, b_ih, b_hh), None

    hn, _ = jax.lax.scan(body, h0, (xs, mask))
    return hn


def _kernel(xs_ref, mask_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref,
            out_ref, *, seq_len: int, hidden: int):
    import jax.experimental.pallas as pl  # noqa: F401

    w_ih = w_ih_ref[:]
    w_hh = w_hh_ref[:]
    b_ih = b_ih_ref[:]
    b_hh = b_hh_ref[:]

    def body(t, h):
        x = xs_ref[t]
        m = mask_ref[t]
        gi = jnp.dot(x, w_ih, preferred_element_type=jnp.float32) + b_ih
        gh = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
        i_r, i_z, i_n = (gi[:, :hidden], gi[:, hidden:2 * hidden],
                         gi[:, 2 * hidden:])
        h_r, h_z, h_n = (gh[:, :hidden], gh[:, hidden:2 * hidden],
                         gh[:, 2 * hidden:])
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        new = (1.0 - z) * n + z * h
        return jnp.where(m[:, None] > 0, new, h)

    h = jnp.zeros_like(out_ref)
    h = jax.lax.fori_loop(0, seq_len, body, h)
    out_ref[:] = h


_INTERPRET = False  # tests flip this to run the kernel off-TPU


def _pallas_forward(xs, mask, w_ih, w_hh, b_ih, b_hh):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, b, in_dim = xs.shape
    hidden = w_hh.shape[0]
    tile = min(TILE_B, b)
    grid = (pl.cdiv(b, tile),)

    return pl.pallas_call(
        functools.partial(_kernel, seq_len=s, hidden=hidden),
        out_shape=jax.ShapeDtypeStruct((b, hidden), xs.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, tile, in_dim), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, hidden), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(xs, mask, w_ih, w_hh, b_ih, b_hh)


@jax.custom_vjp
def masked_gru_scan(xs, mask, w_ih, w_hh, b_ih, b_hh):
    """Fused forward on TPU; exact scan semantics everywhere."""
    if pallas_available() or _INTERPRET:
        return _pallas_forward(xs, mask, w_ih, w_hh, b_ih, b_hh)
    return gru_scan_reference(xs, mask, w_ih, w_hh, b_ih, b_hh)


def _fwd(xs, mask, w_ih, w_hh, b_ih, b_hh):
    out = masked_gru_scan(xs, mask, w_ih, w_hh, b_ih, b_hh)
    return out, (xs, mask, w_ih, w_hh, b_ih, b_hh)


def _bwd(res, g):
    xs, mask, w_ih, w_hh, b_ih, b_hh = res
    # exact gradients by differentiating the scan reference (recompute)
    _, vjp = jax.vjp(gru_scan_reference, xs, mask, w_ih, w_hh, b_ih, b_hh)
    grads = vjp(g)
    # mask is boolean/float validity — no useful gradient
    return (grads[0], None, grads[2], grads[3], grads[4], grads[5])


masked_gru_scan.defvjp(_fwd, _bwd)
