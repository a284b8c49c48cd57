"""
Pallas TPU kernel: exact row medians without sorting.

XLA computes the inpainting median (ops/filter.py) by sorting every
coefficient row — ~12 ms/step at production batch, the last hot non-matmul
stage. This kernel finds the k-th smallest element per row by a 32-step
radix bisection over the *bit representation* of the floats:

  key = sortable_uint32(x)      (IEEE-754 trick: monotone in float order)
  greedily build the largest v (MSB->LSB) with  #(key < v) <= k
  -> v is exactly the k-th smallest key; invert the transform.

Each of the 32 steps is one vectorized compare + row-sum in VMEM, so the
data is read once from HBM and the whole selection is VPU work — ~64 ops
per element instead of a bitonic sort's hundreds plus its HBM traffic.
Even-length rows run two selections (k and k+1) and average, matching
numpy/jnp.median exactly (the companion values are actual row elements).

Lane padding uses +inf, which maps to the largest keys and never enters the
k-th statistics for k < n.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["row_median_batch", "available"]

_ROWS = 256  # rows per grid step (large: amortizes per-step overhead)


def available() -> bool:
    return jax.default_backend() == "tpu"


def _sortable_keys(x):
    u = pltpu.bitcast(x, jnp.uint32)
    sign = u >> 31
    mask = jnp.where(
        sign == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000)
    )
    return u ^ mask


def _keys_to_float(k):
    sign = k >> 31  # 1 => originally non-negative
    u = jnp.where(sign == 1, k ^ jnp.uint32(0x80000000), ~k)
    return pltpu.bitcast(u, jnp.float32)


def _kth_smallest(key, k: int):
    """(ROWS, Wp) uint32 keys -> (ROWS, 1) the k-th smallest key per row."""
    cur = jnp.zeros((key.shape[0], 1), jnp.uint32)
    for bit in range(31, -1, -1):
        cand = cur | jnp.uint32(1 << bit)
        cnt = jnp.sum((key < cand).astype(jnp.int32), axis=1, keepdims=True)
        cur = jnp.where(cnt <= k, cand, cur)
    return cur


def _make_kernel(k1: int, k2: int):
    def kernel(x_ref, out_ref):
        x = x_ref[0]  # (ROWS, Wp)
        key = _sortable_keys(x)
        v1 = _keys_to_float(_kth_smallest(key, k1))
        if k2 != k1:
            v2 = _keys_to_float(_kth_smallest(key, k2))
            med = (v1 + v2) * 0.5
        else:
            med = v1
        out_ref[0] = jnp.broadcast_to(med, out_ref.shape[1:])

    return kernel


def row_median_batch(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Exact medians over the last axis of (..., n): returns (..., 1)."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    rows = int(np.prod(lead)) if lead else 1
    rp = -(-rows // _ROWS) * _ROWS
    wp = -(-n // 128) * 128

    flat = x.reshape(rows, n).astype(jnp.float32)
    flat = jnp.pad(
        flat,
        [(0, rp - rows), (0, wp - n)],
        constant_values=jnp.inf,
    ).reshape(rp // _ROWS, _ROWS, wp)

    k2 = n // 2
    k1 = (n - 1) // 2
    out = pl.pallas_call(
        _make_kernel(k1, k2),
        grid=(rp // _ROWS,),
        in_specs=[
            pl.BlockSpec((1, _ROWS, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROWS, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp // _ROWS, _ROWS, 128), jnp.float32),
        interpret=interpret,
    )(flat)
    meds = out[:, :, 0].reshape(rp)[:rows]
    return meds.reshape(lead + (1,)).astype(x.dtype)
