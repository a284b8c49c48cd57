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

from . import pallas_env

__all__ = ["row_median_batch", "row_median_masked", "available"]

_ROWS = 256  # rows per grid step (large: amortizes per-step overhead)


def available() -> bool:
    return pallas_env.enabled()


def _rows_per(rows: int, wp: int) -> int:
    """Row-tile height: the _ROWS default capped so the double-buffered
    (rows_per, wp) f32 input block stays inside ~12 MiB of the 16 MiB
    scoped-VMEM stack. Production bands (wp <= 1024) keep the measured 256;
    Y-halo-tier bands (wp up to 8320+ at 16k-wide planes) shrink — the
    selection is per-row, so tiling never changes the result."""
    cap = max(8, int(12 * 2**20) // (wp * 4 * 2) // 8 * 8)
    return min(min(_ROWS, cap), -(-rows // 8) * 8)


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


def _make_kernel(k1: int, k2: int, n: int, masked: bool = False):
    def kernel(*refs):
        if masked:
            thr_ref, x_ref, out_ref = refs
            b = pl.program_id(0)
            thr = thr_ref[b, 0]
            x = x_ref[0]  # (ROWS, Wp)
            # inpainting median runs over the *background* row: coefficients
            # above the stripe threshold are zeroed (reference
            # filtering.py:199-204), here without materializing that array.
            # sqrt(x*x) (not |x|) matches the reference's rounded compare.
            x = jnp.where(jnp.sqrt(x * x) > thr, 0.0, x)
        else:
            x_ref, out_ref = refs
            x = x_ref[0]  # (ROWS, Wp)
        key = _sortable_keys(x)
        if x.shape[-1] != n:
            # ragged lane tail: block padding reads undefined values — force
            # them to the maximal key, which never enters the k-th statistic
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            key = jnp.where(lane < n, key, jnp.uint32(0xFFFFFFFF))
        k_v1 = _kth_smallest(key, k1)
        v1 = _keys_to_float(k_v1)
        if k2 != k1:
            # (k1+1)-th statistic in ONE extra pass instead of a second
            # 32-step bisection: it is v1 itself when v1 is duplicated past
            # rank k2, else the smallest key strictly above v1.
            cnt_le = jnp.sum((key <= k_v1).astype(jnp.int32), axis=1,
                             keepdims=True)
            # Mosaic has no uint32 min; flip the sign bit (order-preserving
            # uint32 -> int32 bijection), reduce in int32, flip back.
            ikey = pltpu.bitcast(key ^ jnp.uint32(0x80000000), jnp.int32)
            nxt_i = jnp.min(
                jnp.where(key > k_v1, ikey, jnp.int32(0x7FFFFFFF)),
                axis=1, keepdims=True,
            )
            nxt = pltpu.bitcast(nxt_i, jnp.uint32) ^ jnp.uint32(0x80000000)
            k_v2 = jnp.where(cnt_le >= k2 + 1, k_v1, nxt)
            med = (v1 + _keys_to_float(k_v2)) * 0.5
        else:
            med = v1
        out_ref[0] = jnp.broadcast_to(med, out_ref.shape[1:])

    return kernel


def row_median_batch(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Exact medians over the last axis of (..., n): returns (..., 1).

    Runs directly on the native (..., rows, n) layout: ragged row/lane tails
    are handled by Pallas block padding plus an in-kernel lane mask, so no
    host-graph reshape/pad of the (multi-hundred-MB) coefficient array is
    materialized (the round-1 version spent ~2 ms/step on pads alone)."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    if x.ndim == 1:
        x3 = x.astype(jnp.float32)[None, None]
    elif x.ndim == 2:
        x3 = x.astype(jnp.float32)[None]
    else:
        x3 = x.reshape((-1,) + x.shape[-2:]).astype(jnp.float32)
    nb, rows, _ = x3.shape
    wp = -(-n // 128) * 128
    rows_per = _rows_per(rows, wp)
    n_row_blocks = -(-rows // rows_per)

    k2 = n // 2
    k1 = (n - 1) // 2
    out = pl.pallas_call(
        _make_kernel(k1, k2, n),
        grid=(nb, n_row_blocks),
        in_specs=[
            pl.BlockSpec((1, rows_per, wp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_per, 128), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (nb, n_row_blocks * rows_per, 128), jnp.float32
        ),
        interpret=pallas_env.interpret_default(interpret),
    )(x3)
    meds = out[:, :rows, 0]
    return meds.reshape(lead + (1,)).astype(x.dtype)


def row_median_masked(x: jax.Array, thr: jax.Array,
                      interpret: bool = False,
                      raw: bool = False) -> jax.Array:
    """Per-row median of ``where(|x| > thr, 0, x)`` for a (B, rows, n) batch
    with per-plane thresholds ``thr`` (B,) — the inpainting background median
    with the masking fused in-kernel, so the background array never hits
    HBM. Returns (B, rows, 1); with ``raw=True`` the kernel's padded
    (B, R>=rows, 128) output (each median broadcast over 128 lanes) is
    returned unsliced so downstream Pallas consumers can block it without
    an XLA relayout."""
    B, rows, n = x.shape
    wp = -(-n // 128) * 128
    rows_per = _rows_per(rows, wp)
    n_row_blocks = -(-rows // rows_per)

    k2 = n // 2
    k1 = (n - 1) // 2
    out = pl.pallas_call(
        _make_kernel(k1, k2, n, masked=True),
        grid=(B, n_row_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (B, 1) thresholds
            pl.BlockSpec((1, rows_per, wp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_per, 128), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_row_blocks * rows_per, 128), jnp.float32
        ),
        interpret=pallas_env.interpret_default(interpret),
    )(thr.reshape(B, 1).astype(jnp.float32), x.astype(jnp.float32))
    if raw:
        return out
    return out[:, :rows, 0:1]
