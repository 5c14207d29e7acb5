"""Persistent XLA compilation cache.

First compiles through this image's remote-compile tunnel take minutes for a
ViT-B program; the on-disk cache makes every later process reuse them.

The cache directory is namespaced by a host fingerprint (CPU feature set):
XLA:CPU AOT executables are machine-code specialized to the compiling
host's features, and loading them on a different host triggers
"could lead to execution errors such as SIGILL" loader warnings — entries
from a previous machine must not be served to this one.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_tag() -> str:
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = line
                    break
    except OSError:
        pass
    h = hashlib.sha256(
        (platform.machine() + feats).encode()
    ).hexdigest()[:10]
    return f"host-{h}"


def enable(path: str = "/root/.jax_cache") -> None:
    try:
        import jax

        path = os.path.join(path, _host_tag())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
