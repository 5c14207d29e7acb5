#!/usr/bin/env python
"""Export a trained run's inference program as a deployable StableHLO blob.

Usage:
    python tools/export_serving.py --config finetune-synth \
        [--ckpt-dir DIR] [--out model.shlo] [--batch 32 | --batch dyn] \
        [--platforms tpu,cpu] [--weights-as-args]

Loads the config (and, if given, the checkpoint at the last completed task
boundary), then writes a single self-contained artifact; serve it with:

    from libcontinual_tpu.serving import ServingModel
    model = ServingModel.load(open("model.shlo", "rb").read())
    logits = model(images)        # (B, H, W, C) float32 raw images
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--out", default="model.shlo")
    ap.add_argument("--batch", default="32")
    ap.add_argument("--platforms", default="tpu,cpu")
    ap.add_argument("--weights-as-args", action="store_true")
    ap.add_argument("--overrides", nargs="*", default=[])
    args = ap.parse_args()

    import libcontinual_tpu.methods  # noqa: F401
    from run_trainer import parse_overrides, resolve_config
    from libcontinual_tpu.config import Config
    from libcontinual_tpu.core.trainer import Trainer
    from libcontinual_tpu.serving import export_from_trainer

    cfg = Config(resolve_config(args.config),
                 overrides=parse_overrides(args.overrides)).get_config_dict()
    if args.ckpt_dir:
        cfg["checkpoint"] = {"enable": True, "dir": args.ckpt_dir}
    tr = Trainer(cfg)  # auto-resumes from the checkpoint dir if present
    blob = export_from_trainer(
        tr,
        batch_size=None if args.batch == "dyn" else int(args.batch),
        bake_weights=not args.weights_as_args,
        platforms=tuple(args.platforms.split(",")),
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out}: {len(blob)} bytes, platforms={args.platforms}")


if __name__ == "__main__":
    main()
