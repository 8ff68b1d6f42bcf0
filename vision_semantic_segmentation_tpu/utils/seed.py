"""Reproducibility helpers (ref `/root/reference/src/network/core/utils/torch_util.py:7-16`).

JAX is functionally deterministic: randomness flows through explicit
``jax.random`` keys, so "seeding the framework" reduces to seeding python /
numpy (for host-side data augmentation) and deriving one root PRNG key.
"""
from __future__ import annotations

import random
from typing import Optional

import jax
import numpy as np


def set_random_seed(seed: int) -> Optional[jax.Array]:
    """Seed python/numpy and return a root JAX PRNG key.

    A negative seed is a no-op (reference semantics) and returns ``None``.
    """
    if seed is None or seed < 0:
        return None
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
