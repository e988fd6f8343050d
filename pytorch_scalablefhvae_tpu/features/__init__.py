from pytorch_scalablefhvae_tpu.features.mel import mel_filterbank  # noqa: F401
from pytorch_scalablefhvae_tpu.features.dsp_numpy import (  # noqa: F401
    energy_vad,
    log_melspec,
    log_spectrogram,
    stft_mag,
)
