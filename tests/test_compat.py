"""Reference-API compatibility shim tests."""

import numpy as np

import jax

from pytorch_scalablefhvae_tpu import compat
from pytorch_scalablefhvae_tpu.utils.manifest import write_scp


def build_split(tmp_path, rng, lens=(40, 30), dim=8):
    feats, lend = {}, {}
    for i, l in enumerate(lens):
        k = f"spk{i}_utt{i}"
        arr = rng.standard_normal((l, dim)).astype(np.float32)
        p = tmp_path / f"{k}.npy"
        np.save(p, arr)
        feats[k] = str(p)
        lend[k] = l
    write_scp(tmp_path / "feats.scp", feats)
    write_scp(tmp_path / "len.scp", lend)
    return tmp_path / "feats.scp", tmp_path / "len.scp"


class TestDatasetShims:
    def test_reference_constructor_and_getitem(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        ds = compat.NumpyDataset(feat_scp, len_scp, 20, None, 20, 8, False)
        idx, feat, nsegs = ds[0]
        assert feat.shape == (20, 8)
        assert nsegs >= 1
        assert ds.seqlist == ["spk0_utt0", "spk1_utt1"]
        assert compat.KaldiDataset is compat.NumpyDataset


class TestAudioUtilsShim:
    def test_orientation_matches_reference(self, rng):
        """Reference AudioUtils returns (bins, frames) (utils.py:178-180)."""
        y = rng.standard_normal(8000).astype(np.float32)
        m = compat.AudioUtils.to_melspec(y, 16000)
        assert m.shape[0] == 80  # mels first, like the reference
        s = compat.AudioUtils.rstft(y, 16000)
        assert s.shape[0] == 201
        c = compat.AudioUtils.stft(y, 16000)
        assert np.iscomplexobj(c) and c.shape[0] == 201  # phase preserved


class TestLossFunction:
    def test_sign_and_value(self):
        lb = np.array([-10.0, -20.0])
        log_qy = np.array([-1.0, -3.0])
        loss = float(compat.loss_function(lb, log_qy, alpha=2.0))
        assert np.isclose(loss, -np.mean(lb + 2.0 * log_qy))
        assert loss > 0


class TestEstimateMu2Dict:
    def test_returns_keyed_dict(self, tmp_path, rng):
        from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE

        feat_scp, len_scp = build_split(tmp_path, rng)
        ds = compat.NumpyDataset(feat_scp, len_scp, 20, None, 20, 8, False)
        loader = SegmentLoader(ds, batch_size=4, shuffle=False, seed=0)
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=ds.num_seqs,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        params = model.init(jax.random.PRNGKey(0))
        d = compat.estimate_mu2_dict(model, params, loader)
        assert set(d) == {0, 1}  # keyed by sequence index (reference contract)
        assert d[0].shape == (4,)


class TestImportedValuesConvert:
    def test_reference_values_lists_become_epoch_keyed(self):
        """The reference's 'values' history (lists / inconsistent, defect
        B11) must convert to MetricHistory's epoch-keyed schema on import —
        persisting it verbatim crashed plain (non-finetune) resumes."""
        from pytorch_scalablefhvae_tpu.compat import _convert_reference_values
        from pytorch_scalablefhvae_tpu.train.metrics import MetricHistory

        raw = {
            "train_loss_results": [1.5, 1.2, 1.0],
            "val_loss_results": {0: 2.0, "1": 1.8},
            "lower_bound_results": object(),   # unconvertible: dropped
        }
        vals = _convert_reference_values(raw)
        hist = MetricHistory(vals)  # must not raise
        assert hist.values["train_loss_results"] == {0: 1.5, 1: 1.2, 2: 1.0}
        assert hist.values["val_loss_results"] == {0: 2.0, 1: 1.8}
        assert _convert_reference_values(None) == {}
        assert _convert_reference_values([1, 2]) == {}
