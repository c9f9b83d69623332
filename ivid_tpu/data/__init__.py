from ivid_tpu.data.base import (
    BaseDataset,
    SRDataset,
    SyntheticRGBD,
    SyntheticRGBDSR,
    SyntheticRGBDWarp,
    WarpDataset,
)
from ivid_tpu.data.imagenet import ImageNet, ImageNetSR, ImageNetWarp
from ivid_tpu.data.collect import collect_data
from ivid_tpu.data.loader import DataLoader
from ivid_tpu.data.warp_host import HostWarpDataset
from ivid_tpu.data.single_category import (
    SingleCategory,
    SingleCategorySR,
    SingleCategoryWarp,
)

DATASETS = {
    "ImageNet": ImageNet,
    "ImageNetSR": ImageNetSR,
    "ImageNetWarp": ImageNetWarp,
    "SingleCategory": SingleCategory,
    "SingleCategorySR": SingleCategorySR,
    "SingleCategoryWarp": SingleCategoryWarp,
    "SyntheticRGBD": SyntheticRGBD,
    "SyntheticRGBDSR": SyntheticRGBDSR,
    "SyntheticRGBDWarp": SyntheticRGBDWarp,
}

__all__ = ["DATASETS", "DataLoader", "HostWarpDataset", "collect_data"] + list(
    DATASETS
)
