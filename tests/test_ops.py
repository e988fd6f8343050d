"""Pallas kernel tests (interpret mode on CPU) against the jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.models.base import discriminative_log_qy
from pytorch_scalablefhvae_tpu.ops.discriminative import discriminative_log_qy_pallas

PZ2_LOGVAR = float(np.log(0.25))


def make_inputs(rng, B=16, D=16, N=300):
    z2 = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    table = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    seq = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    return z2, table, seq


class TestStreamingDiscriminative:
    @pytest.mark.parametrize("N", [100, 128, 129, 300, 1000])
    def test_forward_matches_reference(self, rng, N):
        z2, table, seq = make_inputs(rng, N=N)
        ref = discriminative_log_qy(z2, table, seq, PZ2_LOGVAR)
        got = discriminative_log_qy_pallas(z2, table, seq, PZ2_LOGVAR, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_gradients_match_reference(self, rng):
        z2, table, seq = make_inputs(rng, N=300)

        def loss_ref(z2, table):
            return jnp.sum(jnp.cos(discriminative_log_qy(z2, table, seq, PZ2_LOGVAR)))

        def loss_pal(z2, table):
            return jnp.sum(jnp.cos(
                discriminative_log_qy_pallas(z2, table, seq, PZ2_LOGVAR, True)
            ))

        gr_z2, gr_tab = jax.grad(loss_ref, argnums=(0, 1))(z2, table)
        gp_z2, gp_tab = jax.grad(loss_pal, argnums=(0, 1))(z2, table)
        np.testing.assert_allclose(np.asarray(gp_z2), np.asarray(gr_z2), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gp_tab), np.asarray(gr_tab), rtol=1e-3, atol=1e-4)

    def test_log_probabilities_negative(self, rng):
        z2, table, seq = make_inputs(rng, N=200)
        out = np.asarray(discriminative_log_qy_pallas(z2, table, seq, PZ2_LOGVAR, True))
        assert (out <= 1e-5).all()

    def test_extreme_logits_stable(self, rng):
        """Large-magnitude table rows must not overflow the online LSE."""
        z2, table, seq = make_inputs(rng, N=256)
        table = table.at[0].set(100.0)
        out = np.asarray(discriminative_log_qy_pallas(z2, table, seq, PZ2_LOGVAR, True))
        ref = np.asarray(discriminative_log_qy(z2, table, seq, PZ2_LOGVAR))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)
