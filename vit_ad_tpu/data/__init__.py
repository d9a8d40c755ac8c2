"""Data layer: MVTec/BTAD directory-contract datasets and device-fed loaders."""

from vit_ad_tpu.data.files import join_to_file_list, train_valid_split  # noqa: F401
from vit_ad_tpu.data.dataset import AnomalyDataset  # noqa: F401
from vit_ad_tpu.data.loader import DataPipeline  # noqa: F401
