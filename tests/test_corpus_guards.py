"""Guard-rail tests: sample-rate mismatch (Kaldi parity) and LibriSpeech
subset-discovery failures must surface loudly, not as empty datasets."""

import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.corpus.librispeech import (
    process_librispeech,
    write_split_scp,
)
from pytorch_scalablefhvae_tpu.features.extract import prepare_kaldi
from pytorch_scalablefhvae_tpu.utils.audio_io import write_wav
from pytorch_scalablefhvae_tpu.utils.manifest import write_scp


def test_prepare_kaldi_raises_on_sample_rate_mismatch(tmp_path):
    # an 8 kHz wav against a 16 kHz conf: Kaldi's compute-fbank-feats errors
    # on this; silently overriding the true rate would produce wrong
    # frame/mel geometry
    y = np.sin(np.linspace(0, 100, 8000)).astype(np.float32)
    wav = write_wav(tmp_path / "wav" / "a.wav", y, 8000)
    (tmp_path / "train").mkdir()
    write_scp(tmp_path / "train" / "wav.scp", {"a": str(wav)})
    conf = tmp_path / "fbank.conf"
    conf.write_text("--sample-frequency=16000\n--num-mel-bins=80\n--dither=0\n")
    with pytest.raises(ValueError, match="Sample rate mismatch"):
        prepare_kaldi(tmp_path, "train", conf, verbose=False, use_native=False)


def test_librispeech_missing_subset_warns(tmp_path):
    root = tmp_path / "LibriSpeech"
    have = root / "dev-clean" / "84" / "121123"
    have.mkdir(parents=True)
    y = np.zeros(1600, np.float32)
    write_wav(have / "84-121123-0000.wav", y, 16000)
    with pytest.warns(UserWarning, match="does not exist"):
        n = write_split_scp(root, tmp_path / "out" / "wav.scp",
                            ["dev-clean", "dev-othre"])  # typo'd subset
    assert n == 1


def test_librispeech_empty_split_raises(tmp_path):
    root = tmp_path / "LibriSpeech"
    root.mkdir()
    with pytest.warns(UserWarning):
        with pytest.raises(ValueError, match="zero utterances"):
            process_librispeech(root, tmp_path / "out")
