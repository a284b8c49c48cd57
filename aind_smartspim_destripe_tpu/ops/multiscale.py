"""
Multiscale pyramid reduction: 2x2x2 windowed mean on device.

Equivalent of the reference's xarray_multiscale.reducers.windowed_mean with
``preserve_dtype=True`` (zarr_destriper.py:399-405): the input is cropped to
dimensions divisible by the scale factors, averaged over non-overlapping
windows, and cast back to the input dtype (truncation for integers).

On TPU this is a single fused reshape+reduce — no Dask cluster required; the
runtime pipeline applies it slab-by-slab while streaming.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["windowed_mean", "windowed_mean_np"]


@partial(jax.jit, static_argnames=("factors", "preserve_dtype"))
def windowed_mean(
    x: jax.Array,
    factors: Tuple[int, ...] = (2, 2, 2),
    preserve_dtype: bool = True,
) -> jax.Array:
    """Non-overlapping windowed mean over the trailing ``len(factors)`` axes
    (leading axes pass through). Crops to divisible extents."""
    nf = len(factors)
    lead = x.shape[: x.ndim - nf]
    tail = x.shape[x.ndim - nf :]
    cropped = tuple((s // f) * f for s, f in zip(tail, factors))
    sl = (slice(None),) * len(lead) + tuple(slice(0, c) for c in cropped)
    x = x[sl]

    new_shape = list(lead)
    red_axes = []
    for i, (c, f) in enumerate(zip(cropped, factors)):
        new_shape.extend([c // f, f])
        red_axes.append(len(lead) + 2 * i + 1)
    y = x.reshape(new_shape).astype(jnp.float32).mean(axis=tuple(red_axes))
    if preserve_dtype:
        y = y.astype(x.dtype)
    return y


def windowed_mean_np(x: np.ndarray, factors=(2, 2, 2), preserve_dtype=True):
    """numpy twin (host-side fallback / test oracle)."""
    nf = len(factors)
    lead = x.shape[: x.ndim - nf]
    tail = x.shape[x.ndim - nf :]
    cropped = tuple((s // f) * f for s, f in zip(tail, factors))
    sl = (slice(None),) * len(lead) + tuple(slice(0, c) for c in cropped)
    x = x[sl]
    new_shape = list(lead)
    red_axes = []
    for i, (c, f) in enumerate(zip(cropped, factors)):
        new_shape.extend([c // f, f])
        red_axes.append(len(lead) + 2 * i + 1)
    y = x.reshape(new_shape).astype(np.float64).mean(axis=tuple(red_axes))
    return y.astype(x.dtype) if preserve_dtype else y
