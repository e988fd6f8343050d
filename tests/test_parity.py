"""Numerical parity: JAX model vs an independent torch implementation.

BASELINE.md's north star is dev lower-bound parity with the PyTorch
reference. The reference itself cannot run (SURVEY.md §8), so parity is
checked against an independently-written torch implementation of the
*intended* math: identical weights are loaded into both models, sampling is
disabled (posterior means), and every ELBO term plus the discriminative
log-probability must agree to float32 tolerance.
"""

import numpy as np
import pytest
import torch

import jax

from pytorch_scalablefhvae_tpu.models import SimpleFHVAE

B, T, F = 12, 20, 16
NUM_SEQS = 9
Z = 8
H = 24
PZ2_VAR = 0.25


def torch_forward(params, x, seq_idx, nsegs):
    """Reference-intent FHVAE forward in torch (fp64), means only."""
    t = lambda a: torch.from_numpy(np.asarray(a)).double()

    def mlp(h, layers):
        for lay in layers:
            h = torch.relu(h @ t(lay["w"]) + t(lay["b"]))
        return h

    def head(p, h):
        mu = h @ t(p["mu"]["w"]) + t(p["mu"]["b"])
        lv = h @ t(p["logvar"]["w"]) + t(p["logvar"]["b"])
        lv = 9.0 * torch.tanh(lv / 9.0)
        return mu, lv

    x_t = t(x)
    flat = x_t.reshape(B, -1)
    h2 = mlp(flat, params["z2_pre"]["layers"])
    z2_mu, z2_lv = head(params["z2_gauss"], h2)
    h1 = mlp(torch.cat([flat, z2_mu], -1), params["z1_pre"]["layers"])
    z1_mu, z1_lv = head(params["z1_gauss"], h1)
    hd = mlp(torch.cat([z1_mu, z2_mu], -1), params["dec_pre"]["layers"])
    x_mu, x_lv = head(params["dec_gauss"], hd)
    x_mu = x_mu.reshape(B, T, F)
    x_lv = x_lv.reshape(B, T, F)

    table = t(params["mu2_table"])
    mu2 = table[torch.from_numpy(seq_idx).long()]

    log2pi = float(np.log(2 * np.pi))
    pz2_lv = float(np.log(PZ2_VAR))
    log_pmu2 = (-0.5 * (log2pi + mu2**2)).sum(-1)
    kld2 = (-0.5 * (1 + z2_lv - pz2_lv - ((z2_mu - mu2) ** 2 + z2_lv.exp()) / PZ2_VAR)).sum(-1)
    kld1 = (-0.5 * (1 + z1_lv - (z1_mu**2 + z1_lv.exp()))).sum(-1)
    log_px = (-0.5 * (log2pi + x_lv + (x_t - x_mu) ** 2 / x_lv.exp())).sum((1, 2))
    lb = log_px - kld1 - kld2 + log_pmu2 / t(nsegs)

    logits = -((z2_mu.unsqueeze(1) - table.unsqueeze(0)) ** 2).sum(-1) / (2 * PZ2_VAR)
    log_qy = torch.log_softmax(logits, -1)[torch.arange(B), torch.from_numpy(seq_idx).long()]
    return {
        "lower_bound": lb.numpy(),
        "log_qy": log_qy.numpy(),
        "log_px_z": log_px.numpy(),
        "neg_kld_z1": (-kld1).numpy(),
        "neg_kld_z2": (-kld2).numpy(),
        "log_pmu2": log_pmu2.numpy(),
    }


class TestCrossFrameworkParity:
    def test_all_terms_match_torch(self, rng):
        model = SimpleFHVAE(input_size=T * F, num_seqs=NUM_SEQS,
                            z1_hus=(H, H), z2_hus=(H, H), x_hus=(H, H),
                            z1_dim=Z, z2_dim=Z, pz2_std=0.5)
        params = model.init(jax.random.PRNGKey(3))
        np_params = jax.tree_util.tree_map(np.asarray, params)

        x = rng.standard_normal((B, T, F)).astype(np.float32)
        seq_idx = rng.integers(0, NUM_SEQS, B).astype(np.int32)
        nsegs = rng.integers(3, 20, B).astype(np.float32)

        out = model.apply(params, x, seq_idx, nsegs, jax.random.PRNGKey(0),
                          sample=False)
        ref = torch_forward(np_params, x, seq_idx, nsegs)

        for name in ("log_px_z", "neg_kld_z1", "neg_kld_z2", "log_pmu2",
                     "log_qy", "lower_bound"):
            ours = np.asarray(getattr(out, name), dtype=np.float64)
            np.testing.assert_allclose(
                ours, ref[name], rtol=5e-4, atol=5e-4,
                err_msg=f"term {name} diverges from torch implementation",
            )

    def test_lower_bound_parity_within_1e_minus3(self, rng):
        """North-star tolerance: mean LB within 1e-3 relative."""
        model = SimpleFHVAE(input_size=T * F, num_seqs=NUM_SEQS,
                            z1_hus=(H, H), z2_hus=(H, H), x_hus=(H, H),
                            z1_dim=Z, z2_dim=Z)
        params = model.init(jax.random.PRNGKey(9))
        np_params = jax.tree_util.tree_map(np.asarray, params)
        x = rng.standard_normal((B, T, F)).astype(np.float32)
        seq_idx = rng.integers(0, NUM_SEQS, B).astype(np.int32)
        nsegs = np.full(B, 10.0, np.float32)
        out = model.apply(params, x, seq_idx, nsegs, jax.random.PRNGKey(0), sample=False)
        ref = torch_forward(np_params, x, seq_idx, nsegs)
        ours = float(np.mean(np.asarray(out.lower_bound)))
        theirs = float(np.mean(ref["lower_bound"]))
        assert abs(ours - theirs) / abs(theirs) < 1e-3


class TestTrainingParity:
    def test_adam_training_trajectories_match_torch(self, rng):
        """BASELINE's north star, strengthened to training: from identical
        weights and data, N deterministic (posterior-mean) Adam steps in JAX
        and in an independent torch implementation produce the same loss
        trajectory to fp32 tolerance."""
        import optax

        ALPHA, LR, STEPS = 10.0, 1e-3, 5
        model = SimpleFHVAE(input_size=T * F, num_seqs=NUM_SEQS,
                            z1_hus=(H, H), z2_hus=(H, H), x_hus=(H, H),
                            z1_dim=Z, z2_dim=Z, pz2_std=0.5, use_pallas="never")
        params = model.init(jax.random.PRNGKey(5))
        np_params = jax.tree_util.tree_map(np.asarray, params)

        batches = []
        for _ in range(STEPS):
            batches.append((
                rng.standard_normal((B, T, F)).astype(np.float32),
                rng.integers(0, NUM_SEQS, B).astype(np.int32),
                np.full(B, 10.0, np.float32),
            ))

        # ---- JAX side: plain Adam (no grad clip), sample=False ----
        opt = optax.adam(LR, b1=0.95, b2=0.999)
        opt_state = opt.init(params)

        import jax.numpy as jnp

        @jax.jit
        def step(params, opt_state, x, seq, nsegs):
            def loss_fn(p):
                out = model.apply(p, x, seq, nsegs, jax.random.PRNGKey(0),
                                  sample=False)
                return -jnp.mean(out.lower_bound + ALPHA * out.log_qy)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        jax_losses = []
        p = params
        for x, seq, nsegs in batches:
            p, opt_state, loss = step(p, opt_state, x, seq, nsegs)
            jax_losses.append(float(loss))

        # ---- torch side: same weights, same math, torch.optim.Adam ----
        flat, treedef = jax.tree_util.tree_flatten(np_params)
        t_leaves = [torch.nn.Parameter(torch.from_numpy(np.array(a)))
                    for a in flat]
        t_params = jax.tree_util.tree_unflatten(treedef, t_leaves)
        optim = torch.optim.Adam(t_leaves, lr=LR, betas=(0.95, 0.999))

        def t_mlp(h, layers):
            for lay in layers:
                h = torch.relu(h @ lay["w"] + lay["b"])
            return h

        def t_head(pp, h):
            mu = h @ pp["mu"]["w"] + pp["mu"]["b"]
            lv = 9.0 * torch.tanh((h @ pp["logvar"]["w"] + pp["logvar"]["b"]) / 9.0)
            return mu, lv

        def t_loss(x, seq_idx, nsegs):
            x_t = torch.from_numpy(x)
            flat_x = x_t.reshape(B, -1)
            h2 = t_mlp(flat_x, t_params["z2_pre"]["layers"])
            z2_mu, z2_lv = t_head(t_params["z2_gauss"], h2)
            h1 = t_mlp(torch.cat([flat_x, z2_mu], -1), t_params["z1_pre"]["layers"])
            z1_mu, z1_lv = t_head(t_params["z1_gauss"], h1)
            hd = t_mlp(torch.cat([z1_mu, z2_mu], -1), t_params["dec_pre"]["layers"])
            x_mu, x_lv = t_head(t_params["dec_gauss"], hd)
            x_mu, x_lv = x_mu.reshape(B, T, F), x_lv.reshape(B, T, F)
            table = t_params["mu2_table"]
            idx = torch.from_numpy(seq_idx).long()
            mu2 = table[idx]
            log2pi = float(np.log(2 * np.pi))
            log_pmu2 = (-0.5 * (log2pi + mu2**2)).sum(-1)
            kld2 = (-0.5 * (1 + z2_lv - float(np.log(PZ2_VAR))
                            - ((z2_mu - mu2) ** 2 + z2_lv.exp()) / PZ2_VAR)).sum(-1)
            kld1 = (-0.5 * (1 + z1_lv - (z1_mu**2 + z1_lv.exp()))).sum(-1)
            log_px = (-0.5 * (log2pi + x_lv + (x_t - x_mu) ** 2 / x_lv.exp())).sum((1, 2))
            lb = log_px - kld1 - kld2 + log_pmu2 / torch.from_numpy(nsegs)
            logits = -((z2_mu.unsqueeze(1) - table.unsqueeze(0)) ** 2).sum(-1) / (2 * PZ2_VAR)
            log_qy = torch.log_softmax(logits, -1)[torch.arange(B), idx]
            return -(lb + ALPHA * log_qy).mean()

        torch_losses = []
        for x, seq, nsegs in batches:
            loss = t_loss(x, seq, nsegs)
            optim.zero_grad()
            loss.backward()
            optim.step()
            torch_losses.append(float(loss))

        np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3,
                                   err_msg="training trajectories diverged")
        # the trajectory actually descends
        assert jax_losses[-1] < jax_losses[0]
