"""
Shared gating for the Pallas fast paths.

Every Pallas-vs-XLA dispatch in the package funnels through
:func:`enabled`, so the three control knobs compose consistently:

- real TPU backend -> compiled Mosaic kernels (production);
- ``DESTRIPE_NO_PALLAS=1`` -> force the XLA formulation everywhere
  (numerics-identical; used for A/B checks and as an escape hatch);
- ``DESTRIPE_PALLAS_INTERPRET=1`` -> run the Pallas kernels in
  interpreter mode on ANY backend. This exists for CI: the CPU test
  suite can execute the exact production kernel graph (banded DWT,
  fused notch->delta, histogram, median — including their wiring in
  ops/filter.py) without a TPU attached.
"""

from __future__ import annotations

import os

import jax

__all__ = ["interpret_forced", "no_pallas", "enabled", "interpret_default"]


def interpret_forced() -> bool:
    return os.environ.get("DESTRIPE_PALLAS_INTERPRET", "0") == "1"


def no_pallas() -> bool:
    return os.environ.get("DESTRIPE_NO_PALLAS", "0") == "1"


def enabled() -> bool:
    """Should Pallas kernels be used at all (compiled or interpreted)?"""
    if no_pallas():
        return False
    return jax.default_backend() == "tpu" or interpret_forced()


def interpret_default(interpret: bool) -> bool:
    """Resolve a kernel's ``interpret`` argument against the env override."""
    return bool(interpret) or interpret_forced()
