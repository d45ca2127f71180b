"""Host-side data pipeline: paired transforms, list-file dataset, loader."""

from semseg_tpu.data import transform
from semseg_tpu.data.dataset import SemData, Uint8Wire, make_dataset
from semseg_tpu.data.loader import DataLoader

__all__ = ["transform", "SemData", "Uint8Wire", "make_dataset", "DataLoader"]
