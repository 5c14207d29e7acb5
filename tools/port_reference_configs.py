#!/usr/bin/env python3
"""Port missing reference sweep configs into configs/.

Reads each named reference YAML (anchors resolved, scientific floats parsed
with the same resolver the config system uses), strips its ``includes:`` and
re-emits the hyperparameters in this repo's config style (our header chain,
no anchors, explicit values). Hyperparameters are intentionally identical —
they are the published per-paper settings the reproduce/ accuracy tables
were generated with (BASELINE.md); the YAML schema is a compatibility
contract (SURVEY.md §2.7).

Usage: python tools/port_reference_configs.py <ref_config_dir> <out_dir> [rel ...]
With no rel paths, ports every reference config missing from out_dir.
"""

from __future__ import annotations

import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from libcontinual_tpu.config.config import _Loader  # noqa: E402

HEADERS = ["headers/data.yaml", "headers/device.yaml", "headers/model.yaml",
           "headers/optimizer.yaml", "headers/test.yaml"]

# reference files that are dead/unused fragments — documented in PARITY.md
SKIP = {"tam.yaml"}


class _Dumper(yaml.SafeDumper):
    def ignore_aliases(self, data):
        return True


def port_one(ref_root: str, out_root: str, rel: str) -> bool:
    src = os.path.join(ref_root, rel)
    dst = os.path.join(out_root, rel)
    with open(src, encoding="utf-8") as f:
        data = yaml.load(f.read(), Loader=_Loader) or {}
    data.pop("includes", None)
    is_fragment = "classifier" not in data
    out = {} if is_fragment else {"includes": list(HEADERS)}
    out.update(data)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w", encoding="utf-8") as f:
        f.write(f"# ported from reference config/{rel} (hyperparameters as published)\n")
        yaml.dump(out, f, Dumper=_Dumper, sort_keys=False, default_flow_style=False)
    return True


def main():
    ref_root, out_root = sys.argv[1], sys.argv[2]
    rels = sys.argv[3:]
    if not rels:
        for dirpath, _, files in os.walk(ref_root):
            for fn in files:
                if not fn.endswith(".yaml"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, fn), ref_root)
                if rel in SKIP or os.path.exists(os.path.join(out_root, rel)):
                    continue
                rels.append(rel)
    for rel in sorted(rels):
        port_one(ref_root, out_root, rel)
        print("ported", rel)


if __name__ == "__main__":
    main()
