"""Global seeding with the reference's determinism contract.

The reference calls `pl.seed_everything(1)` (train.py:117): seed python `random`, numpy,
and the framework RNG. JAX RNG is functional, so we additionally return a root
`jax.random.PRNGKey` to be threaded through the program.
"""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 1):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import jax

    return jax.random.PRNGKey(seed)
