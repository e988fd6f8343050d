from pytorch_scalablefhvae_tpu.corpus.timit import process_timit  # noqa: F401
from pytorch_scalablefhvae_tpu.corpus.librispeech import process_librispeech  # noqa: F401
from pytorch_scalablefhvae_tpu.corpus.synthetic import make_synthetic_corpus  # noqa: F401
