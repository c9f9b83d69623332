"""Single-category (unlabeled flat-directory) RGBD dataset
(reference: datasets/SingleCategory.py:8-82)."""

from __future__ import annotations

import glob
import json
import os

from ivid_tpu.data.base import BaseDataset, SRDataset, WarpDataset


class SingleCategory(BaseDataset):
    def get_fileinfo(self):
        cache = os.path.join(self.root_path, "dataset.json")
        if os.path.isfile(cache):
            info = json.load(open(cache))
            self.images = info["images"]
            self.depths = info["depths"]
            return
        self.images = sorted(
            os.path.relpath(p, self.root_path)
            for p in glob.glob(os.path.join(self.root_path, "images", "*.*"))
        )
        assert self.images, "Can't find data; check the dataset path"
        self.depths = [
            os.path.join(
                "depths",
                os.path.basename(f).rsplit(".", 1)[0] + ".npz",
            )
            for f in self.images
        ]
        json.dump({"images": self.images, "depths": self.depths}, open(cache, "w"))


class SingleCategorySR(SRDataset, SingleCategory):
    pass


class SingleCategoryWarp(WarpDataset, SingleCategory):
    pass
