"""Persistent XLA compilation cache.

First compiles through this image's remote-compile tunnel take minutes for a
ViT-B program; the on-disk cache makes every later process reuse them."""

from __future__ import annotations

import os


def enable(path: str = "/root/.jax_cache") -> None:
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
