#!/usr/bin/env python
"""CLI entry point (reference run_trainer.py, minus the nvidia-smi GPU picker:
device selection on TPU is the mesh config).

    python run_trainer.py --config finetune [--seed N] [--overrides k=v ...]

The config name is glob-resolved under ./configs/** like the reference
resolves under ./config/** (reference run_trainer.py:29-34).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

from libcontinual_tpu.config import Config
from libcontinual_tpu.core.trainer import Trainer


def resolve_config(name: str) -> str:
    if os.path.isfile(name):
        return name
    for root in ("configs", "config"):
        hits = sorted(
            glob.glob(os.path.join(root, "**", name + ".yaml"), recursive=True)
        ) + sorted(glob.glob(os.path.join(root, "**", name), recursive=True))
        if len(hits) == 1:
            return hits[0]
        if len(hits) > 1:
            raise SystemExit(f"ambiguous config '{name}': {hits}")
    raise SystemExit(f"config '{name}' not found under ./configs or ./config")


def parse_overrides(items):
    out = {}
    for it in items or []:
        k, _, v = it.partition("=")
        try:
            import yaml

            out[k] = yaml.safe_load(v)
        except Exception:
            out[k] = v
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", "-c", required=True)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--overrides", nargs="*", default=None,
                   help="extra key=value config overrides")
    args = p.parse_args(argv)

    overrides = parse_overrides(args.overrides)
    if args.seed is not None:
        overrides["seed"] = args.seed
    config = Config(resolve_config(args.config), overrides=overrides).get_config_dict()
    trainer = Trainer(config)
    trainer.train_loop()


if __name__ == "__main__":
    main()
