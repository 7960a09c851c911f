import json
import os

import numpy as np
import pytest
from PIL import Image

from unirestore_tpu.data import datasets as DS
from unirestore_tpu.data import datasets_det as DDET
from unirestore_tpu.data.corruption import (CORRUPTION_NAMES, corrupt,
                                            init_corruption_function)
from unirestore_tpu.data.engine import DatasetEngine
from unirestore_tpu.data.loader import DataLoader, WeightedMixture, collate
from unirestore_tpu.data.manifest import ImageData


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    """Synthetic dataset tree + manifests."""
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)

    def save_img(path, hw=(80, 96)):
        arr = (rng.uniform(size=(*hw, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(path)
        return str(path)

    def save_mask(path, hw=(80, 96)):
        arr = rng.integers(0, 34, size=hw).astype(np.uint8)
        Image.fromarray(arr, mode="L").save(path)
        return str(path)

    dd = {}
    # IR
    lines = []
    for i in range(4):
        hq = save_img(root / f"ir_hq{i}.png")
        lq = save_img(root / f"ir_lq{i}.png")
        lines.append(f"{lq} {hq} None")
    ir_list = root / "ir.list"
    ir_list.write_text("\n".join(lines))
    dd["DIVF2KOST"] = {"train": str(ir_list), "val": str(ir_list)}
    # CLS
    lines = []
    for i in range(4):
        hq = save_img(root / f"cls{i}.png")
        lines.append(f"None {hq} {i % 3}")
    cls_list = root / "cls.list"
    cls_list.write_text("\n".join(lines))
    dd["ImageNet"] = {"train": str(cls_list), "val": str(cls_list)}
    # SEG (5-field foggy rows)
    lines = []
    for i in range(3):
        fogs = [save_img(root / f"fog{i}_{k}.png") for k in range(3)]
        hq = save_img(root / f"seg_hq{i}.png")
        m = save_mask(root / f"seg_m{i}.png")
        lines.append(" ".join(fogs + [hq, m]))
    seg_list = root / "seg.list"
    seg_list.write_text("\n".join(lines))
    dd["FoggyCityscapes"] = {"train": str(seg_list), "val": str(seg_list)}
    dd["Cityscapes"] = {"train": str(seg_list), "val": str(seg_list)}
    # DET
    lines = []
    for i in range(3):
        hq = save_img(root / f"det{i}.png", hw=(100, 120))
        ann = {"object1": {"name": "person",
                           "bndbox": {"xmin": 10, "ymin": 10, "xmax": 60,
                                      "ymax": 70}},
               "object2": {"name": "car",
                           "bndbox": {"xmin": 30, "ymin": 20, "xmax": 110,
                                      "ymax": 90}}}
        ann_p = root / f"det{i}.json"
        ann_p.write_text(json.dumps(ann))
        lines.append(f"None {hq} {ann_p}")
    det_list = root / "det.list"
    det_list.write_text("\n".join(lines))
    dd["COCO"] = {"train": str(det_list), "val": str(det_list)}
    dd["RTTS"] = {"test": str(det_list)}
    return dd


def test_corruption_subsets():
    assert len(init_corruption_function("common")) == 16  # 15 + clean
    assert len(init_corruption_function("validation")) == 5
    assert init_corruption_function("clean") == ["clean"]
    img = (np.random.rand(48, 48, 3) * 255).astype(np.uint8)
    out = corrupt(img, 3, "gaussian_noise")
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)


def test_ir_corrupt_dataset(fixtures):
    ds = DS.IRCorruptDataset(ImageData(fixtures["DIVF2KOST"]["train"]),
                             resolution=64, is_train=True)
    s = ds.__getitem__(0)
    assert s["lq"].shape == (64, 64, 3) and s["hq"].shape == (64, 64, 3)
    assert s["task"] == "ir" and 0.0 <= s["lq"].min() <= s["lq"].max() <= 1.0
    # determinism: same index+epoch -> same sample
    s2 = ds.__getitem__(0)
    np.testing.assert_array_equal(s["lq"], s2["lq"])
    s3 = ds.__getitem__(0, epoch=1)
    assert not np.array_equal(s["lq"], s3["lq"])


def test_cls_dataset(fixtures):
    ds = DS.CLSCorruptDataset(ImageData(fixtures["ImageNet"]["train"]),
                              resolution=64, is_train=True)
    s = ds.__getitem__(1)
    assert s["gt"] in (0, 1, 2) and s["task"] == "cls"
    assert s["lq"].shape == (64, 64, 3)


def test_seg_dataset_foggy_rows(fixtures):
    ds = DS.CityscapesCorruptDataset(
        ImageData(fixtures["FoggyCityscapes"]["train"]), resolution=64,
        is_train=True)
    s = ds.__getitem__(0)
    assert s["gt"].shape == (64, 64)
    ids = np.unique(s["gt"])
    assert all((0 <= i < 19) or i == 255 for i in ids)


def test_det_dataset_box_aug(fixtures):
    ds = DDET.CoCoCorruptDataset(ImageData(fixtures["COCO"]["train"]),
                                 resolution=64, is_train=True)
    s = ds.__getitem__(0)
    assert s["lq"].shape == (64, 64, 3)
    assert s["gt"]["boxes"].shape[1] == 4 and len(s["gt"]["labels"]) >= 1
    assert (s["gt"]["boxes"][:, 2] > s["gt"]["boxes"][:, 0]).all()
    assert s["gt"]["boxes"].max() <= 64


def test_weighted_mixture_ratios(fixtures):
    a = DS.IRCorruptDataset(ImageData(fixtures["DIVF2KOST"]["train"]),
                            resolution=64)
    b = DS.CLSCorruptDataset(ImageData(fixtures["ImageNet"]["train"]),
                             resolution=64)
    mix = WeightedMixture([a, b], weights=[1, 10], seed=0)
    counts = [0, 0]
    for _ in range(500):
        ds_idx, _ = mix.sample_index()
        counts[ds_idx] += 1
    assert counts[1] > counts[0] * 5  # ~10:1


def test_loader_batching_and_prefetch(fixtures):
    ds = DS.IRPairDataset(ImageData(fixtures["DIVF2KOST"]["val"]),
                          resolution=64, is_train=False)
    dl = DataLoader(ds, batch_size=2, num_workers=1)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["lq"].shape == (2, 80, 96, 3)
    assert batches[0]["task"] == "ir"


def test_threaded_loader_matches_sync(fixtures):
    """Worker-pool prefetch must yield the SAME stream as the synchronous
    iterator (sampling on the consumer thread, per-sample RNGs installed
    thread-locally for corruption)."""
    import numpy as np

    ds = DS.IRCorruptDataset(ImageData(fixtures["DIVF2KOST"]["train"]),
                             resolution=64)
    sync = list(DataLoader(ds, batch_size=2, num_workers=0, shuffle=True,
                           seed=7))
    par = list(DataLoader(ds, batch_size=2, num_workers=4, shuffle=True,
                          seed=7))
    assert len(sync) == len(par)
    for a, b in zip(sync, par):
        assert a["fname"] == b["fname"]
        np.testing.assert_array_equal(a["lq"], b["lq"])
        np.testing.assert_array_equal(a["hq"], b["hq"])


def test_engine_mtl_loaders(fixtures):
    eng = DatasetEngine(task="mtl", train={"type": "all", "resolution": 64,
                                           "batch_size": 1},
                        val={"type": "val", "batch_size": 1},
                        dataset_dict=fixtures, num_workers=0)
    tl = eng.train_dataloader()
    it = iter(tl)
    tasks = set()
    for _ in range(12):
        b = next(it)
        tasks.add(b["task"])
    assert tasks.issubset({"ir", "cls", "seg"}) and len(tasks) >= 2
    vls = eng.val_dataloader()
    assert len(vls) == 3


def test_engine_noise_sigma_protocol(fixtures):
    """The AWGN eval protocol (reference dataset_ir.py:259-267) runs at
    sigma in {15, 25, 50}: a noise_sigma list yields one loader per level,
    and higher sigma yields noisier lq."""
    import numpy as np

    def engine(sig):
        val = {"type": "noise", "val_list": ["DIVF2KOST"], "batch_size": 1}
        if sig != "default":
            val["noise_sigma"] = sig
        return DatasetEngine(task="ir", train={"type": "div2kost",
                                               "resolution": 64},
                             val=val, dataset_dict=fixtures, num_workers=0)

    # default pins sigma=50 (reference data/__init__.py:273)
    dl = engine("default").val_dataloader()
    assert dl.source.sigmas == [50]
    # per-level list -> one loader per sigma
    loaders = engine([15, 25, 50]).val_dataloader()
    assert [l.source.sigmas for l in loaders] == [[15], [25], [50]]
    noise_power = []
    for dl in loaders:
        b = next(iter(dl))
        noise_power.append(float(np.mean((b["lq"] - b["hq"]) ** 2)))
    assert noise_power[0] < noise_power[1] < noise_power[2]
    # explicit null -> per-sample random choice over all three levels
    dl = engine(None).val_dataloader()
    assert dl.source.sigmas == [15, 25, 50]


def test_infinite_mixture_fresh_augmentation_per_visit(fixtures):
    """An infinite mixture stream must NOT pin the per-sample seed: each
    revisit of the same image gets a fresh deterministic augmentation
    (loader._draw counter — the whole-run seed is still reproducible)."""
    ds = DS.IRCorruptDataset(ImageData(fixtures["DIVF2KOST"]["train"]),
                             resolution=64, is_train=True)
    mix = WeightedMixture([ds], weights=[1], seed=0)
    dl = DataLoader(mix, batch_size=1, drop_last=True)
    by_name = {}
    fresh = 0
    it = iter(dl)
    for _ in range(12):
        b = next(it)
        name = b["fname"][0]
        if name in by_name:
            if not np.array_equal(by_name[name], b["lq"]):
                fresh += 1
        else:
            by_name[name] = b["lq"]
    assert fresh > 0, "revisits replayed bit-identical augmentation"
    # reproducibility: a fresh identically-seeded loader yields the same
    # stream
    dl2 = DataLoader(WeightedMixture([ds], weights=[1], seed=0),
                     batch_size=1, drop_last=True)
    it2 = iter(dl2)
    first = next(iter(DataLoader(WeightedMixture([ds], weights=[1], seed=0),
                                 batch_size=1, drop_last=True)))
    np.testing.assert_array_equal(next(it2)["lq"], first["lq"])


def test_mixture_batches_are_task_homogeneous(fixtures):
    """batch_size > 1 over a multi-task mixture: the dataset is drawn once
    per batch, so batches never mix tasks (the reference pins batch_size 1
    for MTL; task-grouped batches keep the mixture ratio in expectation
    while staying one-jitted-step-per-task)."""
    a = DS.IRCorruptDataset(ImageData(fixtures["DIVF2KOST"]["train"]),
                            resolution=64)
    b = DS.CLSCorruptDataset(ImageData(fixtures["ImageNet"]["train"]),
                             resolution=64)
    mix = WeightedMixture([a, b], weights=[1, 3], seed=0)
    dl = DataLoader(mix, batch_size=4, drop_last=True)
    tasks = []
    it = iter(dl)
    for _ in range(20):
        tasks.append(next(it)["task"])  # collate raises on mixed batches
    assert {"ir", "cls"} == set(tasks)  # both tasks appear


def test_collate_rejects_mixed_tasks():
    s = {"lq": np.zeros((4, 4, 3), np.float32), "hq": None, "gt": None,
         "fname": "x"}
    with pytest.raises(ValueError, match="mixed-task"):
        collate([{**s, "task": "ir"}, {**s, "task": "cls"}])


def test_shuffle_epoch_advances_on_early_break(fixtures):
    ds = DS.IRPairDataset(ImageData(fixtures["DIVF2KOST"]["val"]),
                          resolution=64, is_train=False)
    dl = DataLoader(ds, batch_size=1, shuffle=True)
    first_a = next(iter(dl))["fname"]  # break after one batch
    orders = [first_a]
    for _ in range(4):
        orders.append(next(iter(dl))["fname"])
    assert any(o != first_a for o in orders), \
        "early-broken iteration replayed the identical shuffle order"


def test_cityscapes_encode_ignores_out_of_range():
    from unirestore_tpu.data.datasets import encode_cityscapes_target
    mask = np.array([[0, 7, 33, 34, 255]], np.int64)
    enc = encode_cityscapes_target(mask)
    assert enc[0, 0] == 255 and enc[0, 1] == 0 and enc[0, 2] == 18
    assert enc[0, 3] == 255 and enc[0, 4] == 255  # ignore, not 'bicycle'


def test_unknown_crp_mode_fails_fast(fixtures):
    with pytest.raises(ValueError, match="subset"):
        DS.IRCorruptDataset(ImageData(fixtures["DIVF2KOST"]["train"]),
                            resolution=64, crp_mode="wether")


def test_fog_level_crp_modes_construct(fixtures):
    """fog1/2/3 are fog-LEVEL selectors (the seg foggy-val protocol,
    engine.py val.type -> crp_mode), NOT corruption subsets — they must
    construct and pick the matching fog variant from 5-field rows."""
    for mode, want in (("fog1", 0), ("fog2", 1), ("fog3", 2)):
        ds = DS.CityscapesPairDataset(
            ImageData(fixtures["FoggyCityscapes"]["val"]),
            resolution=64, is_train=False, crp_mode=mode)
        assert ds.corruption_funcs == []
        rec = ds.dataset[0]
        if len(rec) == 5:  # fixture rows carry the 3 fog variants
            s = ds[0]
            assert s["task"] == "seg" and s["lq"].ndim == 3
