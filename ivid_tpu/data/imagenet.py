"""ImageNet RGBD dataset: wnid-foldered images + depth npz files
(reference: datasets/ImageNet.py:8-89)."""

from __future__ import annotations

import glob
import json
import os

from ivid_tpu.data.base import BaseDataset, SRDataset, WarpDataset


class ImageNet(BaseDataset):
    def get_fileinfo(self):
        cache = os.path.join(self.root_path, "dataset.json")
        if os.path.isfile(cache):
            info = json.load(open(cache))
            self.labels = info["labels"]
            self.images = info["images"]
            self.depths = info["depths"]
            return
        labels = sorted(os.listdir(os.path.join(self.root_path, "images")))
        assert labels, "Can't find data; check the dataset path"
        self.images, self.depths = [], []
        for label in labels:
            found = [
                os.path.relpath(p, self.root_path)
                for p in glob.glob(os.path.join(self.root_path, "images", label, "*.JPEG"))
            ]
            self.images += found
            self.depths += [
                os.path.join("depths", label, os.path.basename(f).replace("JPEG", "npz"))
                for f in found
            ]
        self.labels = {c: i for i, c in enumerate(labels)}
        json.dump(
            {"labels": self.labels, "images": self.images, "depths": self.depths},
            open(cache, "w"),
        )


class ImageNetSR(SRDataset, ImageNet):
    pass


class ImageNetWarp(WarpDataset, ImageNet):
    pass
