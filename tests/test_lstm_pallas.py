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

pytestmark = pytest.mark.slow  # compile-heavy: interpret-mode Pallas kernels


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
                      lstm_mm_dtype="float32",
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


def test_tm_const_x_matches_broadcast():
    """Decoder mode: a [B, 4H] constant per-step input must equal feeding
    the broadcast [T, B, 4H] explicitly — fwd and grads (the backward
    accumulates dxg1 across time in the revisited output block)."""
    from pytorch_scalablefhvae_tpu.ops.lstm_pallas import lstm2_pallas_tm

    p = _params(9, d_in=16, hid=16)
    B, T = 8, 6
    xg = jax.random.normal(jax.random.PRNGKey(10), (B, 64), jnp.float32)

    def loss(xg_in, const):
        a = xg_in if const else jnp.broadcast_to(xg_in[None], (T, B, 64))
        tops, h = lstm2_pallas_tm(p, a, T=T, block_batch=8, interpret=True)
        return jnp.sum(tops**2) + jnp.sum(jnp.tanh(h)), (tops, h)

    (l_c, (tops_c, h_c)), g_c = jax.value_and_grad(
        loss, has_aux=True)(xg, True)
    (l_b, (tops_b, h_b)), g_b = jax.value_and_grad(
        loss, has_aux=True)(xg, False)
    np.testing.assert_allclose(np.asarray(tops_c), np.asarray(tops_b),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h_c), np.asarray(h_b),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(l_c), float(l_b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_b),
                               atol=2e-5, rtol=2e-5)


def test_mm_dtype_bf16_close():
    """bfloat16 matmul operands (fp32 carries) track the fp32 path to bf16
    tolerance, fwd + grad — the numerics contract of the TPU-default mode."""
    p = _params(11)
    B, T = 8, 5
    xs = jax.random.normal(jax.random.PRNGKey(12), (B, T, 12), jnp.float32)

    def loss(x, mm):
        seq, h = lstm2_pallas(p, x, block_batch=8, interpret=True,
                              mm_dtype=mm)
        return jnp.sum(seq**2) + jnp.sum(h**2)

    l32, g32 = jax.value_and_grad(loss)(xs, None)
    l16, g16 = jax.value_and_grad(loss)(xs, jnp.bfloat16)
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.03)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               atol=0.05, rtol=0.05)


def test_fused_apply_matches_generic():
    """FHVAE._apply_fused (time-major whole-model path) == the generic
    encode/decode path: same outputs and same gradients at fp32."""
    from pytorch_scalablefhvae_tpu.models import FHVAE

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 6, 12)), jnp.float32)
    seq = jnp.asarray(rng.integers(0, 5, (8,)), jnp.int32)
    ns = jnp.full((8,), 4.0, jnp.float32)
    key = jax.random.PRNGKey(42)

    outs, grads = [], []
    for lp in ["always", "never"]:
        model = FHVAE(input_size=6 * 12, num_seqs=5, feat_dim=12,
                      z1_hus=(8, 8), z2_hus=(8, 8), x_hus=(8, 8),
                      z1_dim=4, z2_dim=4, lstm_pallas=lp,
                      lstm_mm_dtype="float32")
        params = model.init(jax.random.PRNGKey(0))
        if lp == "always":
            assert model._fused_ready(params, 8, 6)

        def loss(p):
            o = model.apply(p, x, seq, ns, key, sample=True)
            return -jnp.mean(o.lower_bound + 10.0 * o.log_qy), o

        (l, o), g = jax.value_and_grad(loss, has_aux=True)(params)
        outs.append((l, o))
        grads.append(g)
    for field in ("lower_bound", "log_qy", "log_px_z", "neg_kld_z1",
                  "neg_kld_z2", "log_pmu2", "z1_mu", "z2_mu", "x_mu",
                  "x_logvar"):
        a = np.asarray(getattr(outs[0][1], field))
        b = np.asarray(getattr(outs[1][1], field))
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5,
                                   err_msg=field)
    np.testing.assert_allclose(float(outs[0][0]), float(outs[1][0]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


def test_compute_dtype_projection():
    """cdt is accepted for run_lstm interface parity but ignored: the input
    projection runs INSIDE the proj-fused kernel at fp32 (mm_dtype governs
    casting), so even cdt=bfloat16 matches the fp32 scan path tightly."""
    p = _params(7)
    xs = jax.random.normal(jax.random.PRNGKey(8), (8, 5, 12), jnp.float32)
    seq_ref, _ = run_lstm(p, xs)
    seq, _ = lstm2_pallas(p, xs, cdt=jnp.bfloat16, block_batch=8, interpret=True)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(seq_ref),
                               atol=1e-5, rtol=1e-5)


def test_proj_xgc_matches_composed():
    """lstm2_pallas_tm_proj with an xgc block == projecting [x, z] through
    the stack the composed way (run_lstm on the concat), fwd + grads —
    the z1-encoder contract: w rows [:D] project x in-kernel, rows [D:D+Z]
    project z into xgc, and dxgc carries the z-path gradient."""
    from pytorch_scalablefhvae_tpu.ops.lstm_pallas import lstm2_pallas_tm_proj

    D, Z, H, B, T = 10, 4, 16, 13, 6  # ragged B forces batch-tile padding
    p = init_lstm_stack(jax.random.PRNGKey(9), D + Z, (H, H))
    x = jax.random.normal(jax.random.PRNGKey(10), (T, B, D), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(11), (B, Z), jnp.float32)
    wseq = jax.random.normal(jax.random.PRNGKey(12), (T, B, H), jnp.float32)

    def composed(p, x, z):
        xs = jnp.concatenate(
            [jnp.swapaxes(x, 0, 1),
             jnp.broadcast_to(z[:, None], (B, T, Z))], axis=-1)
        seq, h = run_lstm(p, xs)
        return jnp.swapaxes(seq, 0, 1), h

    def fused(p, x, z):
        c1 = p["cells"][0]
        xgc = z @ c1["w"][D : D + Z] + c1["b"]
        return lstm2_pallas_tm_proj(p, x, xgc, T=T, block_batch=8,
                                    interpret=True)

    for name, want, got in zip(
        ("tops", "h"), composed(p, x, z), fused(p, x, z)
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5, err_msg=name)

    def loss(fn, p, x, z):
        tops, h = fn(p, x, z)
        return jnp.sum(tops * wseq) + 2.0 * jnp.sum(jnp.tanh(h))

    g_ref = jax.grad(lambda p, x, z: loss(composed, p, x, z),
                     argnums=(0, 1, 2))(p, x, z)
    g = jax.grad(lambda p, x, z: loss(fused, p, x, z),
                 argnums=(0, 1, 2))(p, x, z)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_vmem_gate_models_projection_input_width(monkeypatch):
    """The auto-mode VMEM gate must model the projection-fused kernel's
    extra residency — the [d_in, 4H] x-projection weight/grad/accumulator
    blocks and the streamed x/dx blocks — or a wide-feature model (e.g.
    D=512 spectrograms) passes the gate and then fails Mosaic compilation
    at runtime, exactly the failure the fallback exists to prevent."""
    from pytorch_scalablefhvae_tpu.models import FHVAE
    from pytorch_scalablefhvae_tpu.ops.lstm_pallas import (
        LSTM2_VMEM_BUDGET,
        lstm2_vmem_bytes,
    )

    # the estimator grows by exactly the proj terms
    base = lstm2_vmem_bytes(128, 256)
    proj = lstm2_vmem_bytes(128, 256, d_in=512)
    assert proj - base == 4 * (3 * 512 * 512 + 2 * 256 * 2 * 512)

    # a width where the hid-only estimate fits but the proj estimate
    # does not: hid=128 alone is ~3.4 MB; d_in=2048 adds ~21 MB
    assert lstm2_vmem_bytes(128, 256) <= LSTM2_VMEM_BUDGET
    assert lstm2_vmem_bytes(128, 256, d_in=2048) > LSTM2_VMEM_BUDGET

    # ... and _fused_ready / encode_z2 auto-gating must reject it
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    wide = FHVAE(input_size=6 * 2048, num_seqs=5, feat_dim=2048,
                 z1_hus=(128, 128), z2_hus=(128, 128), x_hus=(128, 128),
                 z1_dim=4, z2_dim=4, lstm_pallas="auto")
    params = jax.eval_shape(lambda: wide.init(jax.random.PRNGKey(0)))
    assert not wide._fused_ready(params, 256, 6)
    narrow = FHVAE(input_size=6 * 80, num_seqs=5, feat_dim=80,
                   z1_hus=(128, 128), z2_hus=(128, 128), x_hus=(128, 128),
                   z1_dim=4, z2_dim=4, lstm_pallas="auto")
    params = jax.eval_shape(lambda: narrow.init(jax.random.PRNGKey(0)))
    assert narrow._fused_ready(params, 256, 6)
