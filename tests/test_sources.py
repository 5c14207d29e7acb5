"""Real-data source formats: CIFAR pickle and class-folder trees."""

import os
import pickle

import numpy as np

from libcontinual_tpu.data.source import load_source
from libcontinual_tpu.data.continual import build_stream


def test_binary_cifar100_pickle(tmp_path):
    root = tmp_path / "cifar"
    os.makedirs(root / "cifar-100-python")
    rng = np.random.RandomState(0)
    n = 40
    data = rng.randint(0, 255, (n, 3072), np.uint8)
    labels = (np.arange(n) % 4).tolist()
    for split in ("train", "test"):
        with open(root / "cifar-100-python" / split, "wb") as f:
            pickle.dump({"data": data, "fine_labels": labels}, f)
    cfg = {"dataset": "binary_cifar100", "data_root": str(root)}
    src = load_source(cfg, "train")
    assert src["images"].shape == (n, 32, 32, 3)
    assert src["images"].dtype == np.uint8
    # channel planes decoded in R,G,B order
    assert (src["images"][0, :, :, 0].ravel() == data[0][:1024]).all()
    assert src["labels"].max() == 3


def test_tinyimagenet_wnid_names(tmp_path):
    """Folder datasets with wnid class dirs get human class names (reference
    core/data/dataset.py:57-60 + dataset_reqs/tinyimagenet_classes.txt) so
    CLIP text prompts say 'Egyptian Mau', not 'n02124075'."""
    from PIL import Image

    root = tmp_path / "tiny"
    rng = np.random.RandomState(2)
    for split in ("train", "test"):
        for wnid in ("n02124075", "n04540053"):
            d = root / split / wnid
            os.makedirs(d)
            for i in range(3):
                Image.fromarray(rng.randint(0, 255, (8, 8, 3), np.uint8)).save(
                    d / f"{i}.png"
                )
    cfg = {"dataset": "tiny-imagenet", "data_root": str(root)}
    src = load_source(cfg, "train")
    assert src["class_names"] == ["Egyptian Mau", "volleyball"]


def test_tinyimagenet_canonical_layout(tmp_path):
    """Canonical tiny-imagenet-200 tree (nested images/ dirs + val
    annotations), the layout continuum's TinyImageNet200 feeds the
    reference's array-injection path (reference core/data/dataset.py:36-77):
    train labels follow sorted-wnid order; the eval split is val/ resolved
    through val_annotations.txt; the task split follows the seeded
    python-random class order with contiguous remapped labels."""
    import random

    from PIL import Image

    root = tmp_path / "tiny-imagenet-200"
    wnids = ["n04540053", "n02124075", "n01443537"]  # deliberately unsorted
    rng = np.random.RandomState(3)
    for w in wnids:
        d = root / "train" / w / "images"
        os.makedirs(d)
        for i in range(4):
            Image.fromarray(rng.randint(0, 255, (8, 8, 3), np.uint8)).save(
                d / f"{w}_{i}.JPEG"
            )
    os.makedirs(root / "val" / "images")
    lines = []
    for i, w in enumerate(wnids * 2):
        fname = f"val_{i}.JPEG"
        Image.fromarray(rng.randint(0, 255, (8, 8, 3), np.uint8)).save(
            root / "val" / "images" / fname
        )
        lines.append(f"{fname}\t{w}\t0\t0\t8\t8")
    (root / "val" / "val_annotations.txt").write_text("\n".join(lines))

    cfg = {
        "dataset": "tiny-imagenet", "data_root": str(root),
        "task_num": 3, "init_cls_num": 1, "inc_cls_num": 1, "seed": 7,
    }
    src = load_source(cfg, "train")
    # labels by sorted wnid: n01443537=0, n02124075=1, n04540053=2
    assert src["images"].shape == (12, 8, 8, 3)
    assert np.array_equal(np.sort(np.unique(src["labels"])), [0, 1, 2])
    assert src["class_names"] == ["goldfish", "Egyptian Mau", "volleyball"]

    src_test = load_source(cfg, "test")
    assert src_test["images"].shape == (6, 8, 8, 3)
    assert np.bincount(src_test["labels"]).tolist() == [2, 2, 2]

    # end-to-end split: reference dataset.py:38-43 shuffles range(C) with
    # python's random module seeded by config seed
    order = list(range(3))
    random.Random(7).shuffle(order)
    stream, m = build_stream(cfg, "train")
    for t in range(3):
        td = stream.task(t)
        assert len(td) == 4 and (td.labels == t).all()
    # the class placed at new label t is order[t]
    for t, orig in enumerate(order):
        assert int(m[orig]) == t
    test_stream, _ = build_stream(cfg, "test", m)
    assert [len(td) for td in test_stream.tasks_up_to(2)] == [2, 2, 2]


def test_folder_dataset(tmp_path):
    from PIL import Image

    root = tmp_path / "ds"
    rng = np.random.RandomState(1)
    for split in ("train", "test"):
        for cls in ("apple", "banana"):
            d = root / split / cls
            os.makedirs(d)
            for i in range(6):
                arr = rng.randint(0, 255, (16, 16, 3), np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    cfg = {
        "dataset": "myfolder", "data_root": str(root), "task_num": 2,
        "init_cls_num": 1, "inc_cls_num": 1, "seed": 0,
        "class_order": [0, 1],
    }
    stream, m = build_stream(cfg, "train")
    assert stream.task(0).images.shape == (6, 16, 16, 3)
    assert stream.class_names == ["apple", "banana"]
    test_stream, _ = build_stream(cfg, "test", m)
    assert len(test_stream.tasks_up_to(1)) == 2
