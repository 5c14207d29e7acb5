"""Dataset sources: load a whole split into host memory as uint8 arrays.

Storage contract: ``{"images": uint8 (N, H, W, 3), "labels": int32 (N,),
"class_names": [str]}`` with labels in the *original* (unpermuted) class ids.
Class permutation happens in :mod:`libcontinual_tpu.data.continual`.

Supported formats (mirroring reference core/data/dataset.py:232-304):
  * ``folder``: ``data_root/{train,test}/<class_name>/*.{jpg,png,...}``
  * ``binary_cifar100``: raw CIFAR pickle at ``data_root/cifar-100-python/{train,test}``
  * ``synthetic``: deterministic generated data (for tests/benchmarks and
    machines without datasets) — class-conditional patterns + noise so models
    can genuinely learn and CL dynamics (forgetting etc.) are observable.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from libcontinual_tpu.registry import DATASETS

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def wnid_to_name_table() -> Dict[str, str]:
    """TinyImageNet wnid -> human class name (vendored public WordNet data,
    same table the reference ships as dataset_reqs/tinyimagenet_classes.txt
    and applies at core/data/dataset.py:57-60). CLIP text prompts need real
    names — 'a photo of a n01443537' would tank zero-shot transfer."""
    path = os.path.join(os.path.dirname(__file__), "tinyimagenet_classes.txt")
    table = {}
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 2:
                table[parts[0]] = parts[1]
    return table


def _humanize_class_names(class_names: List[str]) -> List[str]:
    """Map wnid directory names (n########) to readable names when possible."""
    if not any(n.startswith("n") and n[1:].isdigit() for n in class_names):
        return class_names
    table = wnid_to_name_table()
    return [table.get(n, n) for n in class_names]


def _load_folder(data_root: str, mode: str, storage_size: Optional[int]) -> Dict:
    from PIL import Image

    split_dir = os.path.join(data_root, mode)
    class_names = sorted(
        d for d in os.listdir(split_dir) if os.path.isdir(os.path.join(split_dir, d))
    )
    images: List[np.ndarray] = []
    labels: List[int] = []
    for label, cls in enumerate(class_names):
        cls_dir = os.path.join(split_dir, cls)
        for fname in sorted(os.listdir(cls_dir)):
            if os.path.splitext(fname)[1].lower() not in IMG_EXTS:
                continue
            img = Image.open(os.path.join(cls_dir, fname)).convert("RGB")
            if storage_size:
                img = img.resize((storage_size, storage_size), Image.BILINEAR)
            images.append(np.asarray(img, dtype=np.uint8))
            labels.append(label)
    if not images:
        raise FileNotFoundError(f"no images under {split_dir}")
    return {
        "images": np.stack(images),
        "labels": np.asarray(labels, np.int32),
        "class_names": _humanize_class_names(class_names),
    }


def _load_binary_cifar100(data_root: str, mode: str) -> Dict:
    path = os.path.join(data_root, "cifar-100-python", mode)
    with open(path, "rb") as f:
        raw = pickle.load(f, encoding="latin1")
    data = np.asarray(raw["data"], np.uint8).reshape(-1, 3, 32, 32)
    images = data.transpose(0, 2, 3, 1).copy()  # CHW planes -> HWC
    labels = np.asarray(raw["fine_labels"], np.int32)
    return {
        "images": images,
        "labels": labels,
        "class_names": [str(i) for i in range(int(labels.max()) + 1)],
    }


def make_synthetic(
    num_classes: int = 100,
    per_class: int = 100,
    image_size: int = 32,
    seed: int = 0,
    noise: float = 0.35,
    sample_seed: Optional[int] = None,
) -> Dict:
    """Deterministic learnable synthetic data.

    Each class gets a smooth random pattern; samples are the pattern plus
    noise and a random shift, so a convnet separates classes quickly but not
    trivially, and forgetting across tasks is measurable.

    ``seed`` fixes the class prototypes (must be shared between train and
    test splits); ``sample_seed`` varies the noise/shift draw per split.
    """
    proto_rng = np.random.RandomState(seed)
    rng = np.random.RandomState(seed if sample_seed is None else sample_seed)
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32) / image_size
    protos = []
    for _ in range(num_classes):
        freq = proto_rng.uniform(1.0, 4.0, size=(2, 3))
        phase = proto_rng.uniform(0, 2 * np.pi, size=(2, 3))
        amp = proto_rng.uniform(0.5, 1.0, size=3)
        p = 0.5 + 0.25 * (
            amp * np.sin(2 * np.pi * freq[0] * yy[..., None] + phase[0])
            + amp * np.sin(2 * np.pi * freq[1] * xx[..., None] + phase[1])
        )
        protos.append(p)
    protos = np.stack(protos)  # (C, H, W, 3)

    n = num_classes * per_class
    labels = np.repeat(np.arange(num_classes), per_class).astype(np.int32)
    base = protos[labels]
    shifts = rng.randint(-3, 4, size=(n, 2))
    imgs = np.empty_like(base)
    for i in range(n):  # small; host-side generation only happens once
        imgs[i] = np.roll(base[i], tuple(shifts[i]), axis=(0, 1))
    imgs = imgs + rng.randn(n, image_size, image_size, 3).astype(np.float32) * noise
    images = np.clip(imgs * 255.0, 0, 255).astype(np.uint8)
    order = rng.permutation(n)
    return {
        "images": images[order],
        "labels": labels[order],
        "class_names": [f"class_{i}" for i in range(num_classes)],
    }


def _load_tiny_imagenet(data_root: str, mode: str, storage_size: Optional[int]) -> Dict:
    """Canonical tiny-imagenet-200 layout, as continuum's ``TinyImageNet200``
    reads it for the reference's array-injection path (reference
    core/data/dataset.py:36-77):

      * train: ``train/<wnid>/images/*.JPEG`` (labels by sorted wnid)
      * test:  ``val/images/*.JPEG`` + ``val/val_annotations.txt``
        (filename -> wnid; continuum uses the val split as the eval split
        since the test split is unlabeled)

    Falls back to the generic folder layout when the canonical one is absent
    (restructured checkouts keep working). The per-task array slicing the
    reference does by injecting ``scenario._x/_y`` into a ``SingleDataset``
    shell (dataset.py:65-68) is native here: tasks ARE array slices
    (data/continual.py TaskData), split by the seeded python-random class
    order (continual.py build_stream).
    """
    from PIL import Image

    train_dir = os.path.join(data_root, "train")
    val_ann = os.path.join(data_root, "val", "val_annotations.txt")
    if not (os.path.isdir(train_dir) and os.path.isfile(val_ann)):
        return _load_folder(data_root, mode, storage_size)

    wnids = sorted(
        d for d in os.listdir(train_dir) if os.path.isdir(os.path.join(train_dir, d))
    )
    wnid_to_label = {w: i for i, w in enumerate(wnids)}

    pairs: List = []  # (path, label)
    if mode == "train":
        for w in wnids:
            img_dir = os.path.join(train_dir, w, "images")
            if not os.path.isdir(img_dir):  # tolerate flattened class dirs
                img_dir = os.path.join(train_dir, w)
            for fname in sorted(os.listdir(img_dir)):
                if os.path.splitext(fname)[1].lower() in IMG_EXTS:
                    pairs.append((os.path.join(img_dir, fname), wnid_to_label[w]))
    else:
        img_dir = os.path.join(data_root, "val", "images")
        with open(val_ann) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 2 and parts[1] in wnid_to_label:
                    pairs.append(
                        (os.path.join(img_dir, parts[0]), wnid_to_label[parts[1]])
                    )
        pairs.sort()
    if not pairs:
        raise FileNotFoundError(f"no tiny-imagenet images under {data_root} ({mode})")

    images, labels = [], []
    for path, label in pairs:
        img = Image.open(path).convert("RGB")
        if storage_size:
            img = img.resize((storage_size, storage_size), Image.BILINEAR)
        images.append(np.asarray(img, dtype=np.uint8))
        labels.append(label)
    return {
        "images": np.stack(images),
        "labels": np.asarray(labels, np.int32),
        "class_names": _humanize_class_names(wnids),
    }


@DATASETS.register("folder")
def folder_source(config: Dict, mode: str) -> Dict:
    return _load_folder(config["data_root"], mode, config.get("storage_size"))


@DATASETS.register("tiny-imagenet")
def tiny_imagenet_source(config: Dict, mode: str) -> Dict:
    return _load_tiny_imagenet(config["data_root"], mode, config.get("storage_size"))


@DATASETS.register("binary_cifar100")
def binary_cifar100_source(config: Dict, mode: str) -> Dict:
    return _load_binary_cifar100(config["data_root"], mode)


@DATASETS.register("synthetic")
def synthetic_source(config: Dict, mode: str) -> Dict:
    num_classes = config.get("num_classes") or (
        config["init_cls_num"] + config["inc_cls_num"] * (config["task_num"] - 1)
    )
    per_class = config.get(
        "per_class", 100 if mode == "train" else 20
    )
    base = config.get("seed", 0)
    return make_synthetic(
        num_classes=num_classes,
        per_class=per_class,
        # storage_size decouples the STORED geometry from the model's
        # resize target (real datasets store file geometry; e.g. CIFAR 32
        # resized in-graph to a ViT's 224): synthetic mirrors that when a
        # config wants to exercise the resize path
        image_size=config.get("storage_size") or config.get("image_size", 32),
        seed=base,
        sample_seed=base + (0 if mode == "train" else 10_000),
    )


def load_source(config: Dict, mode: str) -> Dict:
    """Resolve the dataset source for a config.

    ``dataset: synthetic`` or a missing/placeholder ``data_root`` selects the
    synthetic source; ``binary_cifar100`` selects the pickle reader; anything
    else is treated as a folder dataset (cifar100, imagenet-r, tiny-imagenet
    folder layouts all load this way).
    """
    name = config.get("dataset", "cifar100")
    data_root = os.path.expanduser(str(config.get("data_root", "")))
    config = dict(config, data_root=data_root)
    if name == "synthetic":
        return DATASETS.get("synthetic")(config, mode)
    if not data_root or not os.path.exists(data_root):
        # a real dataset was requested but its root is absent: refuse rather
        # than silently training on synthetic data that LOOKS like results
        raise FileNotFoundError(
            f"dataset '{name}' requested but data_root "
            f"{data_root!r} does not exist; set dataset: synthetic for the "
            "no-download smoke path"
        )
    if name == "binary_cifar100":
        return DATASETS.get("binary_cifar100")(config, mode)
    if name == "tiny-imagenet":
        return DATASETS.get("tiny-imagenet")(config, mode)
    return DATASETS.get("folder")(config, mode)
