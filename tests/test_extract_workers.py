"""Process-pool extraction fan-out (features/extract.py num_workers).

The reference parallelized extraction with Pool(3) over splits
(preprocess_data.py:45) and Pool(8) for FLAC conversion; this framework fans
out over utterances instead. The contract: pooled output is byte-identical
to sequential (per-utterance seeded dither, manifest order preserved).
"""

import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.corpus.synthetic import make_synthetic_corpus
from pytorch_scalablefhvae_tpu.features.extract import prepare_kaldi, prepare_numpy
from pytorch_scalablefhvae_tpu.utils.manifest import read_scp


@pytest.fixture(scope="module")
def wav_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    make_synthetic_corpus(root)
    return root


def _load_all(feat_scp):
    from pytorch_scalablefhvae_tpu.data.feature_store import _load_feat

    return {k: _load_feat(str(v)) for k, v in read_scp(feat_scp).items()}


class TestPooledExtraction:
    def test_numpy_pool_matches_sequential(self, wav_corpus, tmp_path):
        seq_dir, pool_dir = tmp_path / "seq", tmp_path / "pool"
        for d in (seq_dir, pool_dir):
            d.mkdir()
            (d / "train").mkdir()
            (d / "train" / "wav.scp").write_text(
                (wav_corpus / "train" / "wav.scp").read_text())
        _, (_, f_seq, l_seq) = prepare_numpy(
            "synthetic", "train", seq_dir, verbose=False)
        _, (_, f_pool, l_pool) = prepare_numpy(
            "synthetic", "train", pool_dir, verbose=False, num_workers=2)
        a, b = _load_all(f_seq), _load_all(f_pool)
        assert list(a) == list(b)  # manifest order preserved
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
        assert [ln.split()[1] for ln in l_seq.read_text().splitlines()] == \
               [ln.split()[1] for ln in l_pool.read_text().splitlines()]

    def test_kaldi_pool_matches_sequential(self, wav_corpus, tmp_path):
        seq_dir, pool_dir = tmp_path / "seq", tmp_path / "pool"
        for d in (seq_dir, pool_dir):
            (d / "train").mkdir(parents=True)
            (d / "train" / "wav.scp").write_text(
                (wav_corpus / "train" / "wav.scp").read_text())
        conf = tmp_path / "fbank.conf"
        conf.write_text("--num-mel-bins=40\n--sample-frequency=16000\n"
                        "--dither=1.0\n--window-type=hamming\n")
        _, (_, ark_a, scp_a, _) = prepare_kaldi(
            seq_dir, "train", conf, verbose=False)
        _, (_, ark_b, scp_b, _) = prepare_kaldi(
            pool_dir, "train", conf, verbose=False, num_workers=2)
        a, b = _load_all(scp_a), _load_all(scp_b)
        assert list(a) == list(b)
        for k in a:
            # dither streams are seeded per utterance key, so pooled ==
            # sequential bit-for-bit
            np.testing.assert_array_equal(a[k], b[k])
