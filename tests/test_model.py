"""Model math tests: Gaussian closed forms vs scipy, ELBO assembly,
discriminative objective, gradient flow (regression tests for reference
defects B7/B8/B9), and both model families' forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from pytorch_scalablefhvae_tpu.config import ModelConfig
from pytorch_scalablefhvae_tpu.models import FHVAE, SimpleFHVAE, build_model
from pytorch_scalablefhvae_tpu.models.base import (
    discriminative_log_qy,
    loss_from_outputs,
)
from pytorch_scalablefhvae_tpu.models.layers import kld, log_gauss

B, T, F = 8, 20, 24
NUM_SEQS = 12


@pytest.fixture(scope="module")
def model():
    return SimpleFHVAE(input_size=T * F, num_seqs=NUM_SEQS)


@pytest.fixture(scope="module")
def params(model):
    return model.init(jax.random.PRNGKey(0))


def batch(rng):
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    seq_idx = rng.integers(0, NUM_SEQS, B).astype(np.int32)
    nsegs = rng.integers(5, 30, B).astype(np.float32)
    return x, seq_idx, nsegs


class TestGaussMath:
    def test_log_gauss_matches_scipy(self, rng):
        x = rng.standard_normal(50)
        mu = rng.standard_normal(50)
        logvar = rng.standard_normal(50)
        ours = np.asarray(log_gauss(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(logvar)))
        ref = scipy.stats.norm.logpdf(x, loc=mu, scale=np.exp(0.5 * logvar))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_kld_matches_closed_form(self, rng):
        """KL(N(m1,v1) || N(m2,v2)) standard closed form."""
        m1, m2 = rng.standard_normal(20), rng.standard_normal(20)
        lv1, lv2 = rng.standard_normal(20), rng.standard_normal(20)
        v1, v2 = np.exp(lv1), np.exp(lv2)
        ref = 0.5 * (np.log(v2 / v1) + (v1 + (m1 - m2) ** 2) / v2 - 1.0)
        ours = np.asarray(kld(jnp.asarray(m1), jnp.asarray(lv1), jnp.asarray(m2), jnp.asarray(lv2)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_kld_zero_for_identical(self):
        z = jnp.zeros(5)
        np.testing.assert_allclose(np.asarray(kld(z, z, z, z)), 0.0, atol=1e-7)


class TestDiscriminative:
    def test_matches_naive_log_softmax(self, rng):
        z2_mu = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
        table = jnp.asarray(rng.standard_normal((NUM_SEQS, 16)), jnp.float32)
        seq_idx = jnp.asarray(rng.integers(0, NUM_SEQS, B), jnp.int32)
        pz2_logvar = float(np.log(0.25))

        ours = np.asarray(discriminative_log_qy(z2_mu, table, seq_idx, pz2_logvar))

        # naive: full [B, N, d] broadcast (simple_fhvae.py:119-122 logits)
        from scipy.special import logsumexp

        diff = np.asarray(z2_mu)[:, None, :] - np.asarray(table)[None, :, :]
        logits = -np.sum(diff**2, -1) / (2 * np.exp(pz2_logvar))
        ref = logits[np.arange(B), np.asarray(seq_idx)] - logsumexp(logits, axis=1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_log_qy_is_log_probability(self, rng):
        z2_mu = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
        table = jnp.asarray(rng.standard_normal((NUM_SEQS, 16)), jnp.float32)
        seq_idx = jnp.zeros(B, jnp.int32)
        out = np.asarray(discriminative_log_qy(z2_mu, table, seq_idx, 0.0))
        assert (out <= 0).all()


class TestSimpleFHVAE:
    def test_output_shapes(self, model, params, rng):
        x, seq_idx, nsegs = batch(rng)
        out = model.apply(params, x, seq_idx, nsegs, jax.random.PRNGKey(1))
        for field in ("lower_bound", "log_qy", "log_px_z", "neg_kld_z1", "neg_kld_z2", "log_pmu2"):
            assert getattr(out, field).shape == (B,), field
        assert out.z1_mu.shape == (B, 16)
        assert out.z2_mu.shape == (B, 16)
        assert out.x_mu.shape == (B, T, F)

    def test_deterministic_given_key(self, model, params, rng):
        x, seq_idx, nsegs = batch(rng)
        k = jax.random.PRNGKey(3)
        a = model.apply(params, x, seq_idx, nsegs, k)
        b = model.apply(params, x, seq_idx, nsegs, k)
        np.testing.assert_array_equal(np.asarray(a.lower_bound), np.asarray(b.lower_bound))

    def test_elbo_terms_consistent(self, model, params, rng):
        x, seq_idx, nsegs = batch(rng)
        out = model.apply(params, x, seq_idx, nsegs, jax.random.PRNGKey(1))
        lb = np.asarray(out.log_px_z + out.neg_kld_z1 + out.neg_kld_z2 + out.log_pmu2 / nsegs)
        np.testing.assert_allclose(np.asarray(out.lower_bound), lb, rtol=1e-5)

    def test_gradients_reach_all_params(self, model, params, rng):
        """Decoder and mu2 table must receive gradients (B7/B8 regression)."""
        x, seq_idx, nsegs = batch(rng)
        weight = jnp.ones(B)

        def loss_fn(p):
            out = model.apply(p, x, seq_idx, nsegs, jax.random.PRNGKey(2))
            return loss_from_outputs(out, weight, alpha=10.0)[0]

        grads = jax.grad(loss_fn)(params)
        # decoder grads nonzero (B8: reference detached the decoder)
        dec_g = np.abs(np.asarray(grads["dec_gauss"]["mu"]["w"])).max()
        assert dec_g > 0
        # mu2 rows for sequences in the batch get gradients (B7)
        mu2_g = np.asarray(grads["mu2_table"])
        touched = np.unique(np.asarray(seq_idx))
        assert np.abs(mu2_g[touched]).max() > 0
        # every other param leaf has a gradient
        for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
            assert np.isfinite(np.asarray(leaf)).all(), path

    def test_masked_loss_ignores_padding(self, model, params, rng):
        x, seq_idx, nsegs = batch(rng)
        out = model.apply(params, x, seq_idx, nsegs, jax.random.PRNGKey(5))
        w_full = jnp.ones(B)
        w_half = jnp.asarray([1.0] * (B // 2) + [0.0] * (B // 2))
        loss_half, _ = loss_from_outputs(out, w_half, 10.0)
        # recompute loss over just the first half manually
        manual = -np.mean(
            np.asarray(out.lower_bound + 10.0 * out.log_qy)[: B // 2]
        )
        np.testing.assert_allclose(float(loss_half), manual, rtol=1e-5)

    def test_build_model_factory(self):
        cfg = ModelConfig()
        m = build_model("simple_fhvae", T * F, cfg, NUM_SEQS)
        assert isinstance(m, SimpleFHVAE)
        m2 = build_model("fhvae", T * F, cfg, NUM_SEQS, feat_dim=F)
        assert isinstance(m2, FHVAE)
        with pytest.raises(ValueError):
            build_model("nope", T * F, cfg, NUM_SEQS)


@pytest.mark.slow
class TestRecurrentFHVAE:
    def test_forward_shapes_and_grads(self, rng):
        model = FHVAE(input_size=T * F, num_seqs=NUM_SEQS, feat_dim=F,
                      z1_hus=(32, 32), z2_hus=(32, 32), x_hus=(32, 32))
        params = model.init(jax.random.PRNGKey(0))
        x, seq_idx, nsegs = batch(rng)
        out = model.apply(params, x, seq_idx, nsegs, jax.random.PRNGKey(1))
        assert out.lower_bound.shape == (B,)
        assert out.x_mu.shape == (B, T, F)

        def loss_fn(p):
            o = model.apply(p, x, seq_idx, nsegs, jax.random.PRNGKey(2))
            return loss_from_outputs(o, jnp.ones(B), 10.0)[0]

        grads = jax.grad(loss_fn)(params)
        assert np.abs(np.asarray(grads["dec_lstm"]["cells"][0]["w"])).max() > 0
        assert np.abs(np.asarray(grads["z2_lstm"]["cells"][0]["w"])).max() > 0

    def test_decode_generates(self, rng):
        model = FHVAE(input_size=T * F, num_seqs=NUM_SEQS, feat_dim=F,
                      z1_hus=(32,), z2_hus=(32,), x_hus=(32,))
        params = model.init(jax.random.PRNGKey(0))
        z1 = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
        z2 = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
        x_mu, x_logvar, x_sample = model.decode(params, z1, z2, jax.random.PRNGKey(1),
                                                sample=True, num_frames=T)
        assert x_mu.shape == (4, T, F)
        assert np.isfinite(np.asarray(x_sample)).all()


@pytest.mark.slow
class TestScanUnroll:
    def test_unroll_factor_does_not_change_lstm_math(self, rng):
        """scan_unroll is a scheduling knob (XLA software-pipelining of the
        short recurrence), never a semantics change."""
        import jax

        from pytorch_scalablefhvae_tpu.models.fhvae import init_lstm_stack, run_lstm

        p = init_lstm_stack(jax.random.PRNGKey(0), 12, (16, 16))
        xs = jnp.asarray(rng.standard_normal((4, 20, 12)), jnp.float32)
        seq1, h1 = run_lstm(p, xs, unroll=1)
        for unroll in (4, 7, 20, 50):  # 50 > T: clamped to full unroll
            sequ, hu = run_lstm(p, xs, unroll=unroll)
            np.testing.assert_allclose(np.asarray(sequ), np.asarray(seq1),
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(hu), np.asarray(h1),
                                       rtol=1e-6, atol=1e-6)


class TestWavefrontLSTM:
    def test_wavefront_matches_numpy_oracle(self, rng):
        """The wavefront schedule (layer-2 step t-1 advanced with layer-1
        step t) is the SAME math as a plain sequential 2-layer LSTM."""
        import jax
        import jax.numpy as jnp

        from pytorch_scalablefhvae_tpu.models.fhvae import (
            init_lstm_stack,
            run_lstm_wavefront2,
        )

        p = init_lstm_stack(jax.random.PRNGKey(0), 8, (16, 16))

        def sig(v):
            return 1.0 / (1.0 + np.exp(-v))

        def np_lstm(p, xs):
            seq = xs
            for cell in p["cells"]:
                w, b = np.asarray(cell["w"]), np.asarray(cell["b"])
                hid = w.shape[1] // 4
                d = w.shape[0] - hid
                h = np.zeros((xs.shape[0], hid), np.float32)
                c = np.zeros_like(h)
                outs = []
                for t in range(seq.shape[1]):
                    g = seq[:, t] @ w[:d] + h @ w[d:] + b
                    i, f, gg, o = np.split(g, 4, axis=-1)
                    c = sig(f) * c + sig(i) * np.tanh(gg)
                    h = sig(o) * np.tanh(c)
                    outs.append(h)
                seq = np.stack(outs, 1)
            return seq, h

        xs = rng.standard_normal((4, 7, 8)).astype(np.float32)
        want_seq, want_h = np_lstm(p, xs)
        got_seq, got_h = run_lstm_wavefront2(p, jnp.asarray(xs))
        np.testing.assert_allclose(np.asarray(got_seq), want_seq,
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_h), want_h,
                                   rtol=2e-5, atol=1e-6)

    def test_run_lstm_dispatches_and_matches_generic(self, rng):
        """run_lstm's 2-layer fast path == the generic per-layer path (forced
        by a 3-layer stack truncated to compare on the first two layers is
        not possible; instead compare against the same cells run one layer
        at a time through the generic path)."""
        import jax
        import jax.numpy as jnp

        from pytorch_scalablefhvae_tpu.models.fhvae import (
            init_lstm_stack,
            run_lstm,
        )

        p = init_lstm_stack(jax.random.PRNGKey(1), 6, (12, 12))
        xs = jnp.asarray(rng.standard_normal((3, 9, 6)).astype(np.float32))
        # generic path, one single-layer stack at a time (never hits the
        # 2-layer wavefront dispatch)
        mid, _ = run_lstm({"cells": p["cells"][:1]}, xs)
        want_seq, want_h = run_lstm({"cells": p["cells"][1:]}, mid)
        got_seq, got_h = run_lstm(p, xs)
        np.testing.assert_allclose(np.asarray(got_seq), np.asarray(want_seq),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                                   rtol=2e-5, atol=1e-6)


class TestEncodeZ2:
    """encode_z2 (the MAP passes' cheap trunk) == encode()["z2_mu"]."""

    def test_simple_fhvae(self, rng):
        m = SimpleFHVAE(input_size=20 * 8, num_seqs=3,
                        z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                        z1_dim=4, z2_dim=4)
        p = m.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.standard_normal((5, 20, 8)).astype(np.float32))
        want = m.encode(p, x, jax.random.PRNGKey(1), sample=False)["z2_mu"]
        np.testing.assert_allclose(np.asarray(m.encode_z2(p, x)),
                                   np.asarray(want), rtol=1e-6, atol=1e-7)

    @pytest.mark.parametrize("lp", ["never", "always"])
    def test_fhvae(self, rng, lp):
        m = FHVAE(input_size=6 * 12, num_seqs=3, feat_dim=12,
                  z1_hus=(8, 8), z2_hus=(8, 8), x_hus=(8, 8),
                  z1_dim=4, z2_dim=4, lstm_pallas=lp,
                  lstm_mm_dtype="float32")
        p = m.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.standard_normal((4, 6, 12)).astype(np.float32))
        want = m.encode(p, x, jax.random.PRNGKey(1), sample=False)["z2_mu"]
        np.testing.assert_allclose(np.asarray(m.encode_z2(p, x)),
                                   np.asarray(want), rtol=2e-5, atol=1e-6)
