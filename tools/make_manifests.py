"""Offline manifest (.list) generators for every dataset family.

TPU-native port of the reference's ``dataset/*/process_*.py`` scripts: each
subcommand walks a dataset layout on disk and writes the ``.list`` manifests
consumed by unirestore_tpu.data.manifest. Row formats:

    ir/cls/det:  "<lq-or-None> <hq-or-None> <ann-or-None>"
    seg (foggy): "<fog1> <fog2> <fog3> <clean> <labelIds>"
    seg (plain): "<lq-or-None> <clean-or-None> <labelIds>"

Usage:
    python tools/make_manifests.py df2kost  <root> [--val-lq DIV2K_valid_HR_sev3]
    python tools/make_manifests.py imagenet <root> --train-meta meta/train.json \
        --val-meta meta/val_sub_2.json [--val-lq valsub2_sev3_img]
    python tools/make_manifests.py cub <CUB_200_2011-root> [--val-lq val_corruption]
    python tools/make_manifests.py cityscapes <root> [--val-lq val_sev3]
    python tools/make_manifests.py foggycityscapes <foggy-root> --clean <cityscapes-root>
    python tools/make_manifests.py acdc <root>
    python tools/make_manifests.py zurich <root>
    python tools/make_manifests.py coco <root> --split val2017
    python tools/make_manifests.py rtts <root>

References: dataset/PIR/process_div.py, Classification/process_ImageNet1k.py,
process_CUB.py, Segmentation/process_{cityscapes,foggycityscapes,acdc,
Zurich}.py, Detection/process_det.py.
"""

from __future__ import annotations

import argparse
import json
import os
from glob import glob

IMG_EXTS = (".png", ".jpg", ".jpeg", ".JPEG", ".bmp", ".webp")


def _images(root):
    out = [p for p in sorted(glob(os.path.join(root, "**", "*.*"),
                                  recursive=True))
           if p.endswith(IMG_EXTS)]
    if not out:
        raise SystemExit(f"no images under {root}")
    return out


def _write(path, rows):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(" ".join(str(c) for c in r) for r in rows) + "\n")
    print(f"wrote {path} ({len(rows)} rows)")


def df2kost(args):
    """DIV2K+Flickr2K+OST train; DIV2K valid + pre-degraded LQ val."""
    rows = []
    for d in ("DIV2K_train_HR", "Flickr2K", "OST"):
        p = os.path.join(args.root, d)
        if os.path.isdir(p):
            rows += [(None, hq, None) for hq in _images(p)]
    _write(os.path.join(args.root, "train.list"), rows)
    val_hq = _images(os.path.join(args.root, "DIV2K_valid_HR"))
    lq_dir = os.path.join(args.root, args.val_lq)
    _write(os.path.join(args.root, "val.list"),
           [(os.path.join(lq_dir, os.path.basename(h)), h, None)
            for h in val_hq])


def imagenet(args):
    """meta json {image-relpath-stem: label} -> list rows."""
    def rows_from(meta, folder, lq_dir=None):
        with open(meta) as f:
            data = json.load(f)
        rows = []
        for name, label in data.items():
            clean = glob(os.path.join(folder, f"{name}.*"))
            if not clean:
                continue
            lq = None
            if lq_dir:
                hit = glob(os.path.join(lq_dir,
                                        f"{os.path.basename(name)}.*"))
                lq = hit[0] if hit else None
            rows.append((lq, clean[0], label))
        return rows

    train_dir = os.path.join(args.root, "ILSVRC/Data/CLS-LOC/train")
    val_dir = os.path.join(args.root, "ILSVRC/Data/CLS-LOC/val")
    if args.train_meta:
        _write(os.path.join(args.root, "train.list"),
               rows_from(os.path.join(args.root, args.train_meta), train_dir))
    if args.val_meta:
        lq = os.path.join(args.root, args.val_lq) if args.val_lq else None
        _write(os.path.join(args.root, "val.list"),
               rows_from(os.path.join(args.root, args.val_meta), val_dir, lq))


def cub(args):
    """CUB_200_2011 images.txt / train_test_split.txt / image_class_labels."""
    def table(name):
        out = {}
        with open(os.path.join(args.root, name)) as f:
            for line in f:
                k, v = line.strip().split()
                out[k] = v
        return out

    id2img = table("images.txt")
    split = table("train_test_split.txt")
    id2label = table("image_class_labels.txt")
    img_rt = os.path.join(args.root, "images")
    train, val = [], []
    for i, rel in id2img.items():
        label = int(id2label[i]) - 1  # 1-indexed -> 0-indexed
        clean = os.path.join(img_rt, rel)
        if split[i] == "1":
            train.append((None, clean, label))
        else:
            lq = os.path.join(args.root, args.val_lq, rel) \
                if args.val_lq else None
            val.append((lq, clean, label))
    _write(os.path.join(args.root, "train.list"), train)
    _write(os.path.join(args.root, "val.list"), val)


def _cs_label(img):
    return img.replace("leftImg8bit", "gtFine")[:-4] + "_labelIds.png"


def cityscapes(args):
    for dset in ("train", "val"):
        imgs = _images(os.path.join(args.root, "leftImg8bit", dset))
        rows = []
        for item in imgs:
            lq = item.replace(f"leftImg8bit/{dset}", args.val_lq) \
                if (dset == "val" and args.val_lq) else None
            rows.append((lq, item, _cs_label(item)))
        _write(os.path.join(args.root, f"{dset}.list"), rows)


def foggycityscapes(args):
    for dset in ("train", "val"):
        clean_rt = os.path.join(args.clean, "leftImg8bit", dset)
        foggy_rt = os.path.join(args.root, "leftImg8bit_foggyDBF", dset)
        rows = []
        for item in _images(clean_rt):
            city = os.path.basename(os.path.dirname(item))
            stem = os.path.basename(item)[:-4]
            fogs = [os.path.join(foggy_rt, city,
                                 f"{stem}_foggy_beta_{beta}.png")
                    for beta in ("0.01", "0.02", "0.005")]
            rows.append((*fogs, item, _cs_label(item)))
        _write(os.path.join(args.root, f"{dset}.list"), rows)


def acdc(args):
    for de_type in ("fog", "night", "rain", "snow"):
        for dset in ("train", "val"):
            folder = os.path.join(args.root, "rgb_anon", de_type, dset)
            if not os.path.isdir(folder):
                continue
            rows = []
            for item in _images(folder):
                label = os.path.join(
                    os.path.dirname(item).replace("rgb_anon", "gt"),
                    os.path.basename(item).replace("rgb_anon",
                                                   "gt_labelIds"))
                rows.append((item, None, label))
            _write(os.path.join(args.root, f"{dset}_{de_type}.list"), rows)


def zurich(args):
    meta = os.path.join(args.root, "lists_file_names",
                        "RGB_testv2_filenames.txt")
    rows = []
    with open(meta) as f:
        for line in f:
            item = os.path.join(args.root, line.strip().split()[0])
            rows.append((item, None, item.replace("RGB", "gt_labelIds")))
    _write(os.path.join(args.root, "val.list"), rows)


def _coco_to_json_anns(instances, img_dir, out_dir):
    """COCO instances json -> per-image VOC-style json (process_det.py)."""
    with open(instances) as f:
        coco = json.load(f)
    cats = {c["id"]: c for c in coco["categories"]}
    per_img = {im["id"]: dict(im, objects=[]) for im in coco["images"]}
    for ann in coco["annotations"]:
        if ann.get("iscrowd"):
            continue
        per_img[ann["image_id"]]["objects"].append(ann)
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for im in per_img.values():
        img_path = os.path.join(img_dir, im["file_name"])
        if not im["objects"] or not os.path.exists(img_path):
            continue
        doc = {"filename": im["file_name"],
               "size": {"width": im["width"], "height": im["height"],
                        "depth": 3},
               "num_obj": len(im["objects"])}
        for i, ann in enumerate(im["objects"], 1):
            x, y, w, h = ann["bbox"]
            doc[f"object{i}"] = {
                "name": cats[ann["category_id"]]["name"],
                "supercategory": cats[ann["category_id"]]["supercategory"],
                "category_id": ann["category_id"],
                "bndbox": {"xmin": int(x), "ymin": int(y),
                           "xmax": int(x + w), "ymax": int(y + h)},
            }
        ann_path = os.path.join(out_dir,
                                os.path.splitext(im["file_name"])[0]
                                + ".json")
        with open(ann_path, "w") as f:
            json.dump(doc, f)
        rows.append((None, img_path, ann_path))
    return rows


def coco(args):
    split = args.split
    rows = _coco_to_json_anns(
        os.path.join(args.root, "annotations", f"instances_{split}.json"),
        os.path.join(args.root, split),
        os.path.join(args.root, f"annotations_json_{split}"))
    name = "train.list" if "train" in split else "val.list"
    _write(os.path.join(args.root, name), rows)


def rtts(args):
    """RTTS (hazy, VOC xml converted to per-image json offline)."""
    imgs = _images(os.path.join(args.root, "JPEGImages"))
    rows = []
    for item in imgs:
        ann = os.path.join(args.root, "Annotations_json",
                           os.path.splitext(os.path.basename(item))[0]
                           + ".json")
        rows.append((item, None, ann if os.path.exists(ann) else None))
    _write(os.path.join(args.root, "val.list"), rows)


def main():
    ap = argparse.ArgumentParser(__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("df2kost", df2kost), ("imagenet", imagenet),
                     ("cub", cub), ("cityscapes", cityscapes),
                     ("foggycityscapes", foggycityscapes), ("acdc", acdc),
                     ("zurich", zurich), ("coco", coco), ("rtts", rtts)):
        p = sub.add_parser(name)
        p.add_argument("root")
        p.set_defaults(fn=fn)
        if name == "df2kost":
            p.add_argument("--val-lq", default="DIV2K_valid_HR_sev3")
        if name == "imagenet":
            p.add_argument("--train-meta", default="meta/train.json")
            p.add_argument("--val-meta", default="meta/val_sub_2.json")
            p.add_argument("--val-lq", default="valsub2_sev3_img")
        if name == "cub":
            p.add_argument("--val-lq", default=None)
        if name == "cityscapes":
            p.add_argument("--val-lq", default="val_sev3")
        if name == "foggycityscapes":
            p.add_argument("--clean", required=True)
        if name == "coco":
            p.add_argument("--split", default="val2017")
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
