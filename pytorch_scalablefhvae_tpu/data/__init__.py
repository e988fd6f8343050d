from pytorch_scalablefhvae_tpu.data.feature_store import FeatureStore  # noqa: F401
from pytorch_scalablefhvae_tpu.data.segments import SegmentDataset, make_segments  # noqa: F401
from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader  # noqa: F401
