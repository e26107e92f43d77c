"""Pallas backend compatibility helpers.

Pallas TPU kernels compile natively on TPU; on the CPU backend (used by the
test suite's virtual 8-device mesh) they must run in interpreter mode.
"""

from __future__ import annotations

import functools

import jax


@functools.cache
def pallas_interpret_mode() -> bool:
    """True when Pallas kernels must run interpreted (non-TPU backend)."""
    try:
        return jax.default_backend() != "tpu"
    except RuntimeError:  # pragma: no cover - no backend at all
        return True
