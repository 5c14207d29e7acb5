"""Deterministic seeding (reference core/utils/utils.py:56-75).

JAX is deterministic by construction given a PRNG key; the host-side RNG state
(numpy/python random, used for class orders, epoch permutations fallbacks) is
seeded here.
"""

from __future__ import annotations

import os
import random

import numpy as np


def init_seed(seed: int = 0, deterministic: bool = True) -> None:
    random.seed(seed)
    np.random.seed(seed)
    # affects CHILD processes only — hash randomization of the running
    # interpreter is fixed at startup (nothing in this framework depends on
    # str-hash order; this mirrors the reference's utils.py init_seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    # XLA on TPU is deterministic for a fixed program + seed; nothing further
    # to toggle (the reference flips cudnn benchmark/deterministic flags here).
    del deterministic
