"""Masked recurrent neighbor encoder.

The reference encodes the variable-length list of flagged VO neighbors
(<= nm blocks of 9 numbers) with a torch GRU/biGRU/LSTM, padding+packing
ragged batches (reference: train/policy/policy_rnn_ac.py:75-168). Here the
neighbor axis is a fixed [nm] tensor with a validity mask and the RNN is a
`lax.scan` whose carry only advances on valid slots — numerically identical
to running the torch RNN over just the packed valid prefix, with static
shapes that jit/vmap over thousands of agents.

Semantics notes:
  - valid slots sit at the END of the [nm] axis in ascending urgency (the
    env's layout); the masked scan skips leading padding, so the carry sees
    exactly the reference's sequence order.
  - zero valid slots: the reference feeds ONE all-zero 9-vector
    (ir_gym.py:211-213 -> obs_rnn with mov_len=1). The encoder reproduces
    this by activating the last (zero-padded) slot when the mask is empty.
  - biGRU sums the two directional final hidden states
    (policy_rnn_ac.py:120-122); LSTM uses h_n only.
  - cell equations and initialization match torch defaults exactly
    (uniform(-1/sqrt(H), 1/sqrt(H)) on every RNN weight), so learning
    curves are comparable within seed variance.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_rnn_init(hidden_dim: int):
    bound = 1.0 / jnp.sqrt(jnp.asarray(hidden_dim, jnp.float32))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _GRUCore(nn.Module):
    """One direction of a torch-layout GRU: packed gate order (r, z, n),
    h' = (1-z)*n + z*h with n = tanh(W_in x + b_in + r*(W_hn h + b_hn)).
    With use_pallas the whole masked scan runs as one fused TPU kernel
    (ops/pallas_gru.py) — identical semantics, exact custom-VJP gradients."""

    input_dim: int
    hidden_dim: int
    use_pallas: bool = False
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        h = self.hidden_dim
        init = torch_rnn_init(h)
        pdt, cdt = self.param_dtype, self.compute_dtype
        w_ih = self.param("w_ih", init, (self.input_dim, 3 * h), pdt)
        w_hh = self.param("w_hh", init, (h, 3 * h), pdt)
        b_ih = self.param("b_ih", init, (3 * h,), pdt)
        b_hh = self.param("b_hh", init, (3 * h,), pdt)
        xs = xs.astype(cdt)
        w_ih, w_hh = w_ih.astype(cdt), w_hh.astype(cdt)
        b_ih, b_hh = b_ih.astype(cdt), b_hh.astype(cdt)

        if self.use_pallas:
            from rvo3d_tpu.ops.pallas_gru import masked_gru_scan

            lead = xs.shape[1:-1]
            xs2 = xs.reshape(xs.shape[0], -1, xs.shape[-1])
            m2 = mask.astype(xs.dtype).reshape(mask.shape[0], -1)
            out = masked_gru_scan(xs2, m2, w_ih, w_hh, b_ih, b_hh)
            return out.reshape(lead + (h,))

        def cell(hid, inp):
            x, m = inp
            gi = x @ w_ih + b_ih
            gh = hid @ w_hh + b_hh
            i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            new = (1.0 - z) * n + z * hid
            new = jnp.where(m[..., None], new, hid)
            return new, None

        h0 = jnp.zeros(xs.shape[1:-1] + (h,), xs.dtype)
        hn, _ = jax.lax.scan(cell, h0, (xs, mask))
        return hn


class _LSTMCore(nn.Module):
    """One direction of a torch-layout LSTM (gate order i, f, g, o)."""

    input_dim: int
    hidden_dim: int
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        h = self.hidden_dim
        init = torch_rnn_init(h)
        pdt, cdt = self.param_dtype, self.compute_dtype
        w_ih = self.param("w_ih", init, (self.input_dim, 4 * h), pdt)
        w_hh = self.param("w_hh", init, (h, 4 * h), pdt)
        b_ih = self.param("b_ih", init, (4 * h,), pdt)
        b_hh = self.param("b_hh", init, (4 * h,), pdt)
        xs = xs.astype(cdt)
        w_ih, w_hh = w_ih.astype(cdt), w_hh.astype(cdt)
        b_ih, b_hh = b_ih.astype(cdt), b_hh.astype(cdt)

        def cell(carry, inp):
            hid, c = carry
            x, m = inp
            g = x @ w_ih + b_ih + hid @ w_hh + b_hh
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            gg = jnp.tanh(gg)
            c_new = f * c + i * gg
            h_new = o * jnp.tanh(c_new)
            keep = m[..., None]
            return (jnp.where(keep, h_new, hid), jnp.where(keep, c_new, c)), None

        shape = xs.shape[1:-1] + (h,)
        z = jnp.zeros(shape, xs.dtype)
        (hn, _), _ = jax.lax.scan(cell, (z, z), (xs, mask))
        return hn


class NeighborEncoder(nn.Module):
    """[self_state (12), neighbors (nm, 9), mask (nm)] -> LayerNorm(concat
    (self_state, h_rnn)). Mirrors rnn_Reader (policy_rnn_ac.py:75-168)."""

    state_dim: int = 12
    input_dim: int = 9
    hidden_dim: int = 256
    mode: str = "biGRU"  # 'GRU' | 'biGRU' | 'LSTM'
    use_pallas: bool = False
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, self_state: jnp.ndarray, neighbors: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
        # neighbors: [..., nm, 9]; mask: [..., nm] bool.
        # Empty mask -> activate the final zero-padded slot (the reference's
        # single zero-row input).
        nm = neighbors.shape[-2]
        any_valid = jnp.any(mask, axis=-1, keepdims=True)
        last_slot = jax.nn.one_hot(nm - 1, nm, dtype=bool)
        mask = jnp.where(any_valid, mask, last_slot)

        # scan over the nm axis: move it to the front
        xs = jnp.moveaxis(neighbors, -2, 0)       # [nm, ..., 9]
        ms = jnp.moveaxis(mask, -1, 0)            # [nm, ...]

        dts = dict(param_dtype=self.param_dtype,
                   compute_dtype=self.compute_dtype)
        if self.mode == "GRU":
            hn = _GRUCore(self.input_dim, self.hidden_dim,
                          use_pallas=self.use_pallas, name="fwd",
                          **dts)(xs, ms)
        elif self.mode == "biGRU":
            h_f = _GRUCore(self.input_dim, self.hidden_dim,
                           use_pallas=self.use_pallas, name="fwd",
                           **dts)(xs, ms)
            h_b = _GRUCore(self.input_dim, self.hidden_dim,
                           use_pallas=self.use_pallas, name="bwd",
                           **dts)(
                xs[::-1], ms[::-1]
            )
            hn = h_f + h_b                         # hidden-sum (policy_rnn_ac.py:121-122)
        elif self.mode == "LSTM":
            hn = _LSTMCore(self.input_dim, self.hidden_dim, name="fwd",
                           **dts)(xs, ms)
        else:
            raise ValueError(f"unknown rnn mode {self.mode}")

        feat = jnp.concatenate([self_state.astype(hn.dtype), hn], axis=-1)
        # torch LayerNorm eps (1e-5), not the flax default (1e-6)
        feat = nn.LayerNorm(name="ln", epsilon=1e-5)(feat)  # policy_rnn_ac.py:94-95,:124-127
        return feat
