"""Seeding utilities.

Counterpart of the reference's ``set_random_seed`` (utils.py:206-211) and the
seeded-worker machinery. JAX randomness is functional (explicit PRNG keys
threaded everywhere), so only the host-side numpy/python RNGs need global
seeding; device-side determinism comes for free from the key discipline.
"""

from __future__ import annotations

import random

import numpy as np


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed % 2**32)


def rng_for(seed: int, *stream: int) -> np.random.Generator:
    """Independent numpy generator for a named stream (sampler id, worker id,
    …) — the functional analogue of the reference's per-worker seeding
    (utils.py:640-646, task_dataset.py:815-821)."""
    return np.random.default_rng(np.random.SeedSequence([seed, *stream]))
