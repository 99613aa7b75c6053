"""Global host RNG with context-managed swapping.

API parity with the reference ``safelife/random.py``: a module-global
``numpy.random.Generator`` plus ``set_rng``/``get_rng``/``coinflip``. Where
the reference also re-seeds its C extension's bit-generator pointer, we pass
explicit seeds into the native annealer instead (drawn from this generator),
preserving the same reproducible-seeding contract: one ``SeedSequence``
drives everything derived from a level.
"""

import contextlib

import numpy as np

_rng = np.random.default_rng()


def get_rng():
    return _rng


@contextlib.contextmanager
def set_rng(rng):
    """Temporarily swap the global generator."""
    global _rng
    old = _rng
    _rng = rng
    try:
        yield rng
    finally:
        _rng = old


def coinflip(p, size=None):
    """Boolean sample(s) with probability ``p`` of True."""
    return _rng.random(size) < p
