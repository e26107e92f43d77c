"""On-chip test tier: unlike tests/ (which pins the CPU backend for
determinism), this suite runs on whatever accelerator the process sees —
the real TPU under axon.  Run with:  python -m pytest tests_tpu -q

Kept small: compiled-kernel numerics that bench.py depends on.  Skipped
automatically when no TPU is attached.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="no TPU attached")
        for item in items:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
