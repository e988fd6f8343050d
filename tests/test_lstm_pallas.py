"""Pallas-fused two-layer LSTM (ops/lstm_pallas.py) vs the lax.scan path.

Interpret mode on the CPU test backend. The contract: lstm2_pallas is a
drop-in for models.fhvae.run_lstm on two-layer equal-width stacks — same
outputs AND same gradients (custom VJP with a reverse-time Pallas kernel),
including ragged batch sizes that force padding to the batch-tile multiple.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.models.fhvae import init_lstm_stack, run_lstm
from pytorch_scalablefhvae_tpu.ops.lstm_pallas import lstm2_pallas


def _params(key, d_in=12, hid=16):
    return init_lstm_stack(jax.random.PRNGKey(key), d_in, (hid, hid))


@pytest.mark.parametrize("B,T", [(8, 5), (13, 7), (32, 20)])
def test_forward_matches_scan(B, T):
    p = _params(0)
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, 12), jnp.float32)
    seq_ref, h_ref = run_lstm(p, xs)
    seq, h = lstm2_pallas(p, xs, block_batch=16, interpret=True)
    assert seq.shape == seq_ref.shape and h.shape == h_ref.shape
    np.testing.assert_allclose(np.asarray(seq), np.asarray(seq_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_scan():
    p = _params(2)
    B, T = 8, 6
    xs = jax.random.normal(jax.random.PRNGKey(3), (B, T, 12), jnp.float32)
    # loss touches both outputs (full sequence + last hidden) with distinct
    # weights so every cotangent path through the custom VJP is exercised
    wseq = jax.random.normal(jax.random.PRNGKey(4), (B, T, 16), jnp.float32)

    def loss(fn, p, xs):
        seq, h = fn(p, xs)
        return jnp.sum(seq * wseq) + 2.0 * jnp.sum(jnp.tanh(h))

    g_ref = jax.grad(lambda p, x: loss(run_lstm, p, x), argnums=(0, 1))(p, xs)
    g = jax.grad(
        lambda p, x: loss(
            lambda pp, xx: lstm2_pallas(pp, xx, block_batch=8, interpret=True),
            p, x,
        ),
        argnums=(0, 1),
    )(p, xs)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_gradients_ragged_batch():
    """B=13 pads to the 8-row tile multiple; padded-row grads must not leak."""
    p = _params(5)
    B, T = 13, 4
    xs = jax.random.normal(jax.random.PRNGKey(6), (B, T, 12), jnp.float32)

    def loss(fn, x):
        seq, h = fn(p, x)
        return jnp.sum(seq**2) + jnp.sum(h**2)

    g = jax.grad(lambda x: loss(
        lambda pp, xx: lstm2_pallas(pp, xx, block_batch=8, interpret=True), x
    ))(xs)
    g_ref = jax.grad(lambda x: loss(run_lstm, x))(xs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=2e-5, rtol=2e-5)


def test_mesh_sharded_step_equivalence():
    """FHVAE mesh training with the Pallas recurrence == the scan path.

    The kernel sits inside a GSPMD-partitioned program on real multichip
    runs; this pins that composition (and its numerics) on the virtual
    (4, 2) mesh."""
    from pytorch_scalablefhvae_tpu.models import FHVAE
    from pytorch_scalablefhvae_tpu.parallel.mesh import make_mesh
    from pytorch_scalablefhvae_tpu.parallel.sharded_step import (
        make_sharded_train_step,
    )
    from pytorch_scalablefhvae_tpu.train.step import (
        create_train_state,
        make_optimizer,
    )

    mesh = make_mesh((4, 2))
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((16, 6, 12)).astype(np.float32)
    seq = rng.integers(0, 12, (16,)).astype(np.int32)
    ns = np.full((16,), 5.0, np.float32)
    wt = np.ones((16,), np.float32)
    losses, params = [], []
    for lp in ["always", "never"]:
        model = FHVAE(input_size=6 * 12, num_seqs=12, feat_dim=12,
                      z1_hus=(8, 8), z2_hus=(8, 8), x_hus=(8, 8),
                      z1_dim=4, z2_dim=4, lstm_pallas=lp,
                      num_seqs_padded=12, shard_mesh=mesh)
        opt = make_optimizer(1e-3, 0.95, 0.999)
        state = create_train_state(model, opt, seed=0)
        step = make_sharded_train_step(model, opt, 10.0, mesh)
        state, m = step(state, feats, seq, ns, wt)
        state, m = step(state, feats, seq, ns, wt)
        losses.append(float(np.asarray(m["loss"])))
        params.append(state.params)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params[0]), jax.tree.leaves(params[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_compute_dtype_projection():
    """cdt=bfloat16 only affects the hoisted input projection; recurrence is
    fp32 in the kernel (vs per-step casts in the scan path), so outputs agree
    to bf16 tolerance."""
    p = _params(7)
    xs = jax.random.normal(jax.random.PRNGKey(8), (8, 5, 12), jnp.float32)
    seq_ref, _ = run_lstm(p, xs)
    seq, _ = lstm2_pallas(p, xs, cdt=jnp.bfloat16, block_batch=8, interpret=True)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(seq_ref),
                               atol=0.05, rtol=0.05)
