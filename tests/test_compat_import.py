"""Reference .tar checkpoint import (compat.load_reference_checkpoint).

Builds a torch module with the REFERENCE's exact module/parameter naming
(simple_fhvae.py:8-37,127-244), saves the reference checkpoint schema
(utils.py:116-152), imports it, and checks:

- every weight lands in the right pytree slot (torch [out,in] -> ours [in,out]);
- the imported encoder reproduces the torch oracle's z2_mu exactly;
- the converted npz resumes through the real training loop (--finetune flow).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

D, H, Z = 20 * 8, 24, 6  # input_size, hidden width, latent dim
NUM_SEQS = 5


class _VarLinear(torch.nn.Module):  # reference VariableLinearLayer naming
    def __init__(self, d_in, d_out):
        super().__init__()
        self.linear = torch.nn.Linear(d_in, d_out)

    def forward(self, x):
        return torch.relu(self.linear(x))


class _PreEnc(torch.nn.Module):  # LatentSeg/SeqPreEncoder + PreDecoder naming
    def __init__(self, d_in, hus):
        super().__init__()
        self.fc1 = _VarLinear(d_in, hus[0])
        self.fc2 = _VarLinear(hus[0], hus[1])

    def forward(self, x):
        return self.fc2(self.fc1(x))


class _Gauss(torch.nn.Module):  # GaussianLayer naming
    def __init__(self, d_in, dim):
        super().__init__()
        self.mulayer = torch.nn.Linear(d_in, dim)
        self.logvar_layer = torch.nn.Linear(d_in, dim)


class _RefModel(torch.nn.Module):
    """Reference SimpleFHVAE module layout (simple_fhvae.py:31-36 order)."""

    def __init__(self):
        super().__init__()
        self.z1_pre_encoder = _PreEnc(D + Z, (H, H))
        self.z2_pre_encoder = _PreEnc(D, (H, H))
        self.z1_gauss_layer = _Gauss(H, Z)
        self.z2_gauss_layer = _Gauss(H, Z)
        self.pre_decoder = _PreEnc(2 * Z, (H, H))
        self.dec_gauss_layer = _Gauss(H, D)


@pytest.fixture(scope="module")
def saved_tar(tmp_path_factory):
    torch.manual_seed(7)
    model = _RefModel()
    ckpt = {
        "best_val_lb": -123.0,
        "best_epoch": 4,
        "epoch": 6,
        "model_type": "simple_fhvae",
        "model_params": ([H, H], [H, H], Z, Z, [H, H]),
        "optimizer": {},
        "state_dict": model.state_dict(),
        "summary_vals": {},
        "values": {"train_loss_results": {"0": 1.0}},
    }
    path = tmp_path_factory.mktemp("ref") / "simple_fhvae_ref_e6.tar"
    torch.save(ckpt, path)
    return path, model


class TestImport:
    def test_weights_land_correctly(self, saved_tar):
        from pytorch_scalablefhvae_tpu.compat import load_reference_checkpoint

        path, tmodel = saved_tar
        model, params, meta = load_reference_checkpoint(path, NUM_SEQS)
        assert model.input_size == D
        assert meta["epoch"] == 6 and meta["best_epoch"] == 4
        sd = tmodel.state_dict()
        np.testing.assert_array_equal(
            params["z2_pre"]["layers"][0]["w"],
            sd["z2_pre_encoder.fc1.linear.weight"].numpy().T,
        )
        np.testing.assert_array_equal(
            params["z1_pre"]["layers"][1]["b"],
            sd["z1_pre_encoder.fc2.linear.bias"].numpy(),
        )
        np.testing.assert_array_equal(
            params["dec_gauss"]["logvar"]["w"],
            sd["dec_gauss_layer.logvar_layer.weight"].numpy().T,
        )
        assert params["mu2_table"].shape == (NUM_SEQS, Z)
        assert (params["mu2_table"] == 0).all()

    def test_encoder_matches_torch_oracle(self, saved_tar, rng):
        """z2_mu through the imported params == the torch modules' output
        (deterministic path: no sampling, no logvar bound involved)."""
        import jax

        from pytorch_scalablefhvae_tpu.compat import load_reference_checkpoint

        path, tmodel = saved_tar
        model, params, _ = load_reference_checkpoint(path, NUM_SEQS)
        x = rng.standard_normal((4, 20, 8)).astype(np.float32)

        with torch.no_grad():
            h = tmodel.z2_pre_encoder(torch.from_numpy(x.reshape(4, -1)))
            want = tmodel.z2_gauss_layer.mulayer(h).numpy()

        enc = model.encode(jax.tree_util.tree_map(np.asarray, params),
                           x.reshape(4, -1).reshape(4, 20, 8),
                           jax.random.PRNGKey(0), sample=False)
        np.testing.assert_allclose(np.asarray(enc["z2_mu"]), want,
                                   rtol=1e-5, atol=1e-6)

    def test_unknown_key_raises(self, saved_tar, tmp_path):
        from pytorch_scalablefhvae_tpu.compat import load_reference_checkpoint

        path, tmodel = saved_tar
        bad = dict(torch.load(path, weights_only=False))
        bad["state_dict"] = dict(bad["state_dict"],
                                 **{"mystery.weight": torch.zeros(2, 2)})
        bad_path = tmp_path / "bad.tar"
        torch.save(bad, bad_path)
        with pytest.raises(ValueError, match="Unrecognized"):
            load_reference_checkpoint(bad_path, NUM_SEQS)

    def test_fhvae_rejected(self, saved_tar, tmp_path):
        from pytorch_scalablefhvae_tpu.compat import load_reference_checkpoint

        path, _ = saved_tar
        bad = dict(torch.load(path, weights_only=False), model_type="fhvae")
        bad_path = tmp_path / "fh.tar"
        torch.save(bad, bad_path)
        with pytest.raises(ValueError, match="stub"):
            load_reference_checkpoint(bad_path, NUM_SEQS)


class TestConvertAndResume:
    def test_npz_roundtrip_and_finetune(self, saved_tar, tmp_path):
        """Converted checkpoint loads through the standard npz loader and
        seeds a finetune (weights only, fresh schedule)."""
        from pytorch_scalablefhvae_tpu.compat import (
            import_reference_checkpoint,
            load_reference_checkpoint,
        )
        from pytorch_scalablefhvae_tpu.models.simple_fhvae import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train import checkpoint as ckpt_mod
        from pytorch_scalablefhvae_tpu.train.step import (
            create_train_state,
            make_optimizer,
        )

        path, _ = saved_tar
        npz = import_reference_checkpoint(path, tmp_path, NUM_SEQS)
        assert npz.exists()

        model, params, _ = load_reference_checkpoint(path, NUM_SEQS)
        optimizer = make_optimizer(1e-3, 0.95, 0.999)
        template = create_train_state(model, optimizer, seed=1)
        state, meta = ckpt_mod.load_checkpoint(npz, template, finetune=True)
        assert meta["start_epoch"] == 0  # finetune semantics
        np.testing.assert_array_equal(
            np.asarray(state.params["z2_pre"]["layers"][0]["w"]),
            params["z2_pre"]["layers"][0]["w"],
        )
