"""Deterministic seeding (reference utils.py:9-17).

JAX is functionally deterministic given explicit PRNG keys; the remaining
ambient state is numpy/python RNG used by host-side data prep.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_random_seed(seed: int) -> np.random.Generator:
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return np.random.default_rng(seed)
