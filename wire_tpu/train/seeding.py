"""Global determinism helper — the counterpart of modules/setup.py's
seed_everything (setup.py:7-13), adapted to JAX's functional RNG: seeds the
host-side numpy/python streams (used by the noise model and burst
generation) and returns the root jax PRNG key every fit derives from.

JAX computations are deterministic given the key; there is no cudnn-style
nondeterminism to pin.
"""
from __future__ import annotations

import os
import random

import numpy as np
import jax


def seed_everything(seed: int = 0):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.key(seed)
