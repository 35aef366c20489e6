from .dataset import (  # noqa: F401
    DATASET_STREAMS,
    DeepfakeDataset,
    DeepfakeInferenceDataset,
    collate_batch, collate_train_streams,
    linear_resample_np,
)
from .loader import DataLoader  # noqa: F401
from . import metadata  # noqa: F401
