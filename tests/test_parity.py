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

        # >= 50 steps: long enough to surface slow drift (a wrong-sign or
        # mis-scaled term stays inside tolerance for a handful of steps)
        ALPHA, LR, STEPS = 10.0, 1e-3, 50
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


# ---- recurrent FHVAE (models/fhvae.py) vs torch nn.LSTM -------------------
#
# The reference's full model is a stub (/root/reference/fhvae.py:5-14); the
# intended recurrent math (arXiv 1709.07902 §3.1) is pinned here against
# torch's OWN LSTM implementation: identical weights are mapped into
# torch.nn.LSTM (same (i, f, g, o) gate order; our single fused bias maps to
# bias_ih, with bias_hh zeroed — and excluded from the optimizer so the two
# parameterizations stay gradient-equivalent), and every ELBO term plus a
# 50-step Adam trajectory must agree.


def torch_lstm_module(cells) -> torch.nn.LSTM:
    """torch.nn.LSTM initialized from our stacked-cell weights.

    Our cell stores one fused ``w [d_in+h, 4h]`` (x rows on top, h rows
    below) and one bias; torch splits both per direction. Gate order is
    (input, forget, cell, output) in BOTH frameworks.
    """
    hid = cells[0]["w"].shape[1] // 4
    d_in = cells[0]["w"].shape[0] - hid
    lstm = torch.nn.LSTM(d_in, hid, num_layers=len(cells), batch_first=True)
    lstm = lstm.double()
    with torch.no_grad():
        for k, c in enumerate(cells):
            w = torch.from_numpy(np.asarray(c["w"])).double()
            b = torch.from_numpy(np.asarray(c["b"])).double()
            di = w.shape[0] - hid
            getattr(lstm, f"weight_ih_l{k}").copy_(w[:di].T)
            getattr(lstm, f"weight_hh_l{k}").copy_(w[di:].T)
            getattr(lstm, f"bias_ih_l{k}").copy_(b)
            getattr(lstm, f"bias_hh_l{k}").zero_()
    return lstm


def t_head(pp, h):
    """fp64 mirror of layers.gauss_head (means path, tanh-bounded logvar)."""
    t = lambda a: (a if isinstance(a, torch.Tensor)
                   else torch.from_numpy(np.asarray(a)).double())
    mu = h @ t(pp["mu"]["w"]) + t(pp["mu"]["b"])
    lv = 9.0 * torch.tanh((h @ t(pp["logvar"]["w"]) + t(pp["logvar"]["b"])) / 9.0)
    return mu, lv


def torch_recurrent_forward(modules, params, x, seq_idx, nsegs, pz2_var):
    """Posterior-mean forward of the recurrent FHVAE in torch fp64.

    ``modules`` holds the three nn.LSTM stacks (built once so the training
    test can optimize their parameters); heads/table come from ``params``
    (numpy leaves or torch Parameters — t_head handles both).
    """
    t = lambda a: (a if isinstance(a, torch.Tensor)
                   else torch.from_numpy(np.asarray(a)).double())
    x_t = torch.from_numpy(np.asarray(x)).double()
    Bq, Tq, Fq = x_t.shape

    _, (h_n, _) = modules["z2"](x_t)
    z2_mu, z2_lv = t_head(params["z2_gauss"], h_n[-1])

    z1_in = torch.cat([x_t, z2_mu.unsqueeze(1).expand(-1, Tq, -1)], -1)
    _, (h_n, _) = modules["z1"](z1_in)
    z1_mu, z1_lv = t_head(params["z1_gauss"], h_n[-1])

    z = torch.cat([z1_mu, z2_mu], -1).unsqueeze(1).expand(-1, Tq, -1)
    tops, _ = modules["dec"](z)
    x_mu, x_lv = t_head(params["dec_gauss"], tops.reshape(Bq * Tq, -1))
    x_mu, x_lv = x_mu.reshape(Bq, Tq, Fq), x_lv.reshape(Bq, Tq, Fq)

    table = t(params["mu2_table"])
    idx = torch.from_numpy(np.asarray(seq_idx)).long()
    mu2 = table[idx]
    log2pi = float(np.log(2 * np.pi))
    log_pmu2 = (-0.5 * (log2pi + mu2**2)).sum(-1)
    kld2 = (-0.5 * (1 + z2_lv - float(np.log(pz2_var))
                    - ((z2_mu - mu2) ** 2 + z2_lv.exp()) / pz2_var)).sum(-1)
    kld1 = (-0.5 * (1 + z1_lv - (z1_mu**2 + z1_lv.exp()))).sum(-1)
    log_px = (-0.5 * (log2pi + x_lv + (x_t - x_mu) ** 2 / x_lv.exp())).sum((1, 2))
    lb = log_px - kld1 - kld2 + log_pmu2 / torch.from_numpy(np.asarray(nsegs))
    logits = -((z2_mu.unsqueeze(1) - table.unsqueeze(0)) ** 2).sum(-1) / (2 * pz2_var)
    log_qy = torch.log_softmax(logits, -1)[torch.arange(Bq), idx]
    return {
        "lower_bound": lb, "log_qy": log_qy, "log_px_z": log_px,
        "neg_kld_z1": -kld1, "neg_kld_z2": -kld2, "log_pmu2": log_pmu2,
    }


def make_recurrent(**kw):
    from pytorch_scalablefhvae_tpu.models.fhvae import FHVAE

    return FHVAE(input_size=T * F, num_seqs=NUM_SEQS,
                 z1_hus=(H, H), z2_hus=(H, H), x_hus=(H, H),
                 z1_dim=Z, z2_dim=Z, pz2_std=0.5, feat_dim=F,
                 use_pallas="never", lstm_pallas="never", scan_unroll=1, **kw)


@pytest.mark.slow
class TestRecurrentCrossFrameworkParity:
    def test_all_terms_match_torch_lstm(self, rng):
        model = make_recurrent()
        params = model.init(jax.random.PRNGKey(3))
        np_params = jax.tree_util.tree_map(np.asarray, params)

        x = rng.standard_normal((B, T, F)).astype(np.float32)
        seq_idx = rng.integers(0, NUM_SEQS, B).astype(np.int32)
        nsegs = rng.integers(3, 20, B).astype(np.float32)

        out = model.apply(params, x, seq_idx, nsegs, jax.random.PRNGKey(0),
                          sample=False)
        modules = {
            "z2": torch_lstm_module(np_params["z2_lstm"]["cells"]),
            "z1": torch_lstm_module(np_params["z1_lstm"]["cells"]),
            "dec": torch_lstm_module(np_params["dec_lstm"]["cells"]),
        }
        ref = torch_recurrent_forward(modules, np_params, x, seq_idx, nsegs,
                                      PZ2_VAR)
        for name in ("log_px_z", "neg_kld_z1", "neg_kld_z2", "log_pmu2",
                     "log_qy", "lower_bound"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, name), dtype=np.float64),
                ref[name].detach().numpy(), rtol=5e-4, atol=5e-4,
                err_msg=f"recurrent term {name} diverges from torch nn.LSTM",
            )

    def test_adam_training_trajectories_match_torch(self, rng):
        """50 deterministic Adam steps: JAX recurrent FHVAE vs torch
        nn.LSTM + torch.optim.Adam from identical weights. bias_hh stays
        frozen at zero and out of the optimizer so torch's two-bias
        parameterization remains gradient-equivalent to our fused bias."""
        import optax

        import jax.numpy as jnp

        ALPHA, LR, STEPS = 10.0, 1e-3, 50
        model = make_recurrent()
        params = model.init(jax.random.PRNGKey(5))
        np_params = jax.tree_util.tree_map(np.asarray, params)

        batches = [(
            rng.standard_normal((B, T, F)).astype(np.float32),
            rng.integers(0, NUM_SEQS, B).astype(np.int32),
            np.full(B, 10.0, np.float32),
        ) for _ in range(STEPS)]

        opt = optax.adam(LR, b1=0.95, b2=0.999)
        opt_state = opt.init(params)

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

        modules = {
            "z2": torch_lstm_module(np_params["z2_lstm"]["cells"]),
            "z1": torch_lstm_module(np_params["z1_lstm"]["cells"]),
            "dec": torch_lstm_module(np_params["dec_lstm"]["cells"]),
        }
        head_params = {
            hp: {
                sub: {kk: torch.nn.Parameter(
                    torch.from_numpy(np.array(np_params[hp][sub][kk])).double())
                    for kk in ("w", "b")}
                for sub in ("mu", "logvar")
            }
            for hp in ("z2_gauss", "z1_gauss", "dec_gauss")
        }
        table = torch.nn.Parameter(
            torch.from_numpy(np.array(np_params["mu2_table"])).double())
        t_params = dict(head_params, mu2_table=table)
        trainable = [table]
        for hp in head_params.values():
            for sub in hp.values():
                trainable.extend(sub.values())
        for m in modules.values():
            trainable.extend(
                p for n, p in m.named_parameters() if "bias_hh" not in n)
        optim = torch.optim.Adam(trainable, lr=LR, betas=(0.95, 0.999))

        torch_losses = []
        for x, seq, nsegs in batches:
            out = torch_recurrent_forward(modules, t_params, x, seq, nsegs,
                                          PZ2_VAR)
            loss = -(out["lower_bound"] + ALPHA * out["log_qy"]).mean()
            optim.zero_grad()
            loss.backward()
            optim.step()
            torch_losses.append(float(loss))

        np.testing.assert_allclose(
            jax_losses, torch_losses, rtol=2e-3,
            err_msg="recurrent training trajectories diverged")
        assert jax_losses[-1] < jax_losses[0]
