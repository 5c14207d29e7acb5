"""Synthetic-data CL-dynamics validation for the prompt/LoRA/adapter families
(companion to the classic-family table in VALIDATION.md).

20 classes, 5 tasks x 4 classes, 100 img/class synthetic set, tiny test ViT
(64-dim, frozen for prompt methods), 10 epochs/task, Adam 0.01. Prints one
markdown row per method. No real datasets or pretrained weights exist in
this image; this validates the *dynamics*, not paper-table numbers.
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
        "backbone": {"name": "vit_tiny_test", "kwargs": {}},
        "train_trfms": [{"RandomHorizontalFlip": {}},
                        {"Normalize": {"mean": [0.5]*3, "std": [0.25]*3}}],
        "test_trfms": [{"Normalize": {"mean": [0.5]*3, "std": [0.25]*3}}],
        "buffer": {"name": "LinearBuffer",
                   "kwargs": {"buffer_size": 0, "batch_size": 16, "strategy": "random"}},
        "optimizer": {"name": "Adam", "kwargs": {"lr": 0.01}},
        "lr_scheduler": {"name": "Constant"}, "warmup": 0,
    }).get_config_dict()


COMMON = {"num_class": 20, "feat_dim": 64, "init_cls_num": 4,
          "inc_cls_num": 4, "task_num": 5}

METHODS = [
    ("Finetune(ViT)", "Finetune", {}, {}),
    ("L2P", "L2P", {"prompt_length": 3, "pool_size": 6, "top_k": 2,
                    "pull_constraint_coeff": 0.1}, {}),
    ("DualPrompt", "DualPrompt", {"e_prompt_length": 4, "g_prompt_length": 4,
                                  "pool_size": 5}, {}),
    ("CodaPrompt", "CodaPrompt", {"prompt_length": 4, "pool_size": 10,
                                  "mu": 0.1}, {}),
    ("InfLoRA", "InfLoRA", {"lame": 1.0, "lamb": 0.95, "total_sessions": 5,
                            "rank": 4}, {"rank": 4, "embd_dim": 64}),
    ("SD-LoRA", "SD_LoRA", {"init_mag": 1.0}, {"rank": 4, "embd_dim": 64}),
    ("RanPAC", "RanPAC", {"M": 64}, {"adapter_dim": 8}),
]


def main():
    from _validate_common import cli_args, header, run_row

    args = cli_args()
    print(f"dtype={args.dtype} seeds={args.seeds} (seed0={args.seed0})")
    header(args.seeds)
    for label, name, kwargs, bkw in METHODS:
        if args.only and args.only.lower() not in label.lower():
            continue
        cfg = base_cfg()
        cfg["dtype"] = args.dtype
        if name == "Finetune":
            cfg["classifier"] = {"name": name,
                                 "kwargs": {"num_class": 20, "feat_dim": 64}}
        else:
            cfg["classifier"] = {"name": name, "kwargs": {**COMMON, **kwargs}}
        if bkw:
            cfg["backbone"] = {"name": "vit_tiny_test", "kwargs": bkw}
        run_row(label, cfg, args.seeds, args.seed0)


if __name__ == "__main__":
    main()
