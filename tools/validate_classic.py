"""Synthetic-data CL-dynamics validation for the classic family
(the VALIDATION.md round-1 table, now a checked-in tool).

20 classes, 5 tasks x 4 classes, 100 img/class synthetic set,
cifar_resnet20, 10 epochs/task, SGD 0.05 cosine. Prints one markdown row
per method. Validates dynamics, not paper-table numbers (no real data in
this image).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def base_cfg():
    from libcontinual_tpu.config import Config
    return Config(overrides={
        "dataset": "synthetic", "data_root": "", "image_size": 32,
        "task_num": 5, "init_cls_num": 4, "inc_cls_num": 4,
        "epoch": 10, "batch_size": 16, "per_class": 100, "seed": 7,
        "val_per_epoch": 0, "testing_times": 1, "dtype": "float32",
        "mesh": {"data": 1, "model": 1},
        "backbone": {"name": "cifar_resnet20", "kwargs": {}},
        "train_trfms": [{"RandomHorizontalFlip": {}},
                        {"Normalize": {"mean": [0.5]*3, "std": [0.25]*3}}],
        "test_trfms": [{"Normalize": {"mean": [0.5]*3, "std": [0.25]*3}}],
        "buffer": {"name": "LinearBuffer",
                   "kwargs": {"buffer_size": 0, "batch_size": 16, "strategy": "random"}},
        "optimizer": {"name": "SGD", "kwargs": {"lr": 0.05, "momentum": 0.9}},
        "lr_scheduler": {"name": "CosineAnnealingLR", "kwargs": {"T_max": 10}},
        "warmup": 0,
    }).get_config_dict()


COMMON = {"num_class": 20, "feat_dim": 64, "init_cls_num": 4,
          "inc_cls_num": 4, "task_num": 5}

METHODS = [
    ("Finetune", "Finetune", {}, 0, "random"),
    # two lambda points per regularizer: the strong one shows the stability
    # extreme, the moderate one must beat Finetune's last-avg to demonstrate
    # the stability-plasticity tradeoff actually works
    ("EWC (lam=500)", "EWC", {"lamda": 500.0}, 0, "random"),
    ("EWC (lam=10)", "EWC", {"lamda": 10.0}, 0, "random"),
    ("LwF (lam=1)", "LWF", {"lamda": 1.0}, 0, "random"),
    ("LwF (lam=3)", "LWF", {"lamda": 3.0}, 0, "random"),
    ("WA (buffer 200)", "WA", {}, 200, "random"),
    ("iCaRL (buffer 200)", "ICarl", {}, 200, "herding"),
]


def main():
    from _validate_common import cli_args, header, run_row

    args = cli_args()
    print(f"dtype={args.dtype} seeds={args.seeds} (seed0={args.seed0})")
    header(args.seeds)
    for label, name, kwargs, buf, strat in METHODS:
        if args.only and args.only.lower() not in label.lower():
            continue
        cfg = base_cfg()
        cfg["dtype"] = args.dtype
        cfg["classifier"] = {"name": name, "kwargs": {**COMMON, **kwargs}}
        cfg["buffer"] = {"name": "LinearBuffer",
                         "kwargs": {"buffer_size": buf, "batch_size": 16,
                                    "strategy": strat}}
        run_row(label, cfg, args.seeds, args.seed0)


if __name__ == "__main__":
    main()
