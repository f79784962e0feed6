"""Pallas kernel tests (interpret mode on the CPU mesh): the fused masked
GRU must match the pure-JAX scan bit-for-bit in semantics, and its custom
VJP must match autodiff through the scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rvo3d_tpu.ops.pallas_gru as pg

S, B, IN, H = 10, 64, 9, 32


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((S, B, IN)), jnp.float32)
    mask = jnp.asarray(rng.random((S, B)) > 0.4, jnp.float32)
    w_ih = jnp.asarray(rng.standard_normal((IN, 3 * H)) * 0.1, jnp.float32)
    w_hh = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.1, jnp.float32)
    b_ih = jnp.asarray(rng.standard_normal(3 * H) * 0.1, jnp.float32)
    b_hh = jnp.asarray(rng.standard_normal(3 * H) * 0.1, jnp.float32)
    return xs, mask, w_ih, w_hh, b_ih, b_hh


def test_pallas_gru_matches_scan(data, monkeypatch):
    ref = pg.gru_scan_reference(*data)
    monkeypatch.setattr(pg, "_INTERPRET", True)
    out = pg._pallas_forward(*data)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_gru_ragged_tile(data, monkeypatch):
    """Batch not divisible by the tile size still computes every row."""
    xs, mask, w_ih, w_hh, b_ih, b_hh = data
    monkeypatch.setattr(pg, "TILE_B", 48)  # 64 = 48 + 16 remainder
    monkeypatch.setattr(pg, "_INTERPRET", True)
    out = pg._pallas_forward(xs, mask, w_ih, w_hh, b_ih, b_hh)
    ref = pg.gru_scan_reference(xs, mask, w_ih, w_hh, b_ih, b_hh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_custom_vjp_matches_autodiff(data):
    xs, mask, w_ih, w_hh, b_ih, b_hh = data

    def loss_custom(w_ih, w_hh, xs):
        return jnp.sum(pg.masked_gru_scan(xs, mask, w_ih, w_hh, b_ih, b_hh) ** 2)

    def loss_ref(w_ih, w_hh, xs):
        return jnp.sum(pg.gru_scan_reference(xs, mask, w_ih, w_hh, b_ih, b_hh) ** 2)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(w_ih, w_hh, xs)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(w_ih, w_hh, xs)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
