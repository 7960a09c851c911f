"""Manifest generators (tools/make_manifests.py) against synthetic dataset
trees; outputs must parse with unirestore_tpu.data.manifest."""

import json
import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

from unirestore_tpu.data.manifest import ImageData, parse_triplet

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import make_manifests as MM  # noqa: E402


def _img(path, hw=(8, 10)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((*hw, 3), np.uint8)).save(path)
    return path


def test_df2kost(tmp_path):
    root = str(tmp_path)
    for i in range(3):
        _img(os.path.join(root, "DIV2K_train_HR", f"{i:04d}.png"))
    _img(os.path.join(root, "Flickr2K", "f1.png"))
    _img(os.path.join(root, "DIV2K_valid_HR", "0801.png"))
    _img(os.path.join(root, "DIV2K_valid_HR_sev3", "0801.png"))
    MM.df2kost(types.SimpleNamespace(root=root, val_lq="DIV2K_valid_HR_sev3"))
    train = ImageData(os.path.join(root, "train.list"))
    assert len(train) == 4
    lq, hq, ann, fname = parse_triplet(train[0])
    assert lq is None and hq and ann is None
    val = ImageData(os.path.join(root, "val.list"))
    lq, hq, _, _ = parse_triplet(val[0])
    assert lq and hq and os.path.basename(lq) == os.path.basename(hq)


def test_cityscapes_and_foggy(tmp_path):
    cs = str(tmp_path / "Cityscapes")
    fog = str(tmp_path / "Foggy")
    for dset in ("train", "val"):
        img = _img(os.path.join(cs, "leftImg8bit", dset, "aachen",
                                f"aachen_000000_{dset}_leftImg8bit.png"))
        _img(img.replace("leftImg8bit", "gtFine")[:-4] + "_labelIds.png")
        for beta in ("0.01", "0.02", "0.005"):
            _img(os.path.join(
                fog, "leftImg8bit_foggyDBF", dset, "aachen",
                f"aachen_000000_{dset}_leftImg8bit_foggy_beta_{beta}.png"))
    MM.cityscapes(types.SimpleNamespace(root=cs, val_lq="val_sev3"))
    rows = ImageData(os.path.join(cs, "train.list"))
    lq, hq, ann, _ = parse_triplet(rows[0])
    assert lq is None and "gtFine" in ann and ann.endswith("_labelIds.png")

    MM.foggycityscapes(types.SimpleNamespace(root=fog, clean=cs))
    rows = ImageData(os.path.join(fog, "train.list"))
    assert len(rows[0]) == 5  # fog1 fog2 fog3 clean label
    assert "beta_0.01" in rows[0][0] and "beta_0.005" in rows[0][2]
    assert os.path.exists(rows[0][0])


def test_cub(tmp_path):
    root = str(tmp_path)
    _img(os.path.join(root, "images", "001.Black_footed_Albatross",
                      "b1.jpg"))
    _img(os.path.join(root, "images", "002.Laysan_Albatross", "b2.jpg"))
    with open(os.path.join(root, "images.txt"), "w") as f:
        f.write("1 001.Black_footed_Albatross/b1.jpg\n"
                "2 002.Laysan_Albatross/b2.jpg\n")
    with open(os.path.join(root, "train_test_split.txt"), "w") as f:
        f.write("1 1\n2 0\n")
    with open(os.path.join(root, "image_class_labels.txt"), "w") as f:
        f.write("1 1\n2 2\n")
    MM.cub(types.SimpleNamespace(root=root, val_lq=None))
    train = ImageData(os.path.join(root, "train.list"))
    val = ImageData(os.path.join(root, "val.list"))
    assert len(train) == 1 and len(val) == 1
    assert parse_triplet(train[0])[2] == "0"  # 0-indexed label
    assert parse_triplet(val[0])[2] == "1"


def test_coco(tmp_path):
    root = str(tmp_path)
    _img(os.path.join(root, "val2017", "000001.jpg"), hw=(20, 30))
    inst = {
        "images": [{"id": 1, "file_name": "000001.jpg", "width": 30,
                    "height": 20}],
        "annotations": [{"image_id": 1, "category_id": 18, "iscrowd": 0,
                         "bbox": [2, 3, 10, 8]}],
        "categories": [{"id": 18, "name": "dog",
                        "supercategory": "animal"}],
    }
    os.makedirs(os.path.join(root, "annotations"))
    with open(os.path.join(root, "annotations",
                           "instances_val2017.json"), "w") as f:
        json.dump(inst, f)
    MM.coco(types.SimpleNamespace(root=root, split="val2017"))
    rows = ImageData(os.path.join(root, "val.list"))
    lq, hq, ann, _ = parse_triplet(rows[0])
    assert lq is None and hq.endswith("000001.jpg")
    with open(ann) as f:
        doc = json.load(f)
    assert doc["object1"]["name"] == "dog"
    assert doc["object1"]["bndbox"] == {"xmin": 2, "ymin": 3, "xmax": 12,
                                        "ymax": 11}
    assert doc["num_obj"] == 1
