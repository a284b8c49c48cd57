"""
Pallas TPU kernel: batched 256-bin histograms for the Otsu threshold.

The XLA formulation (broadcast-compare-reduce, otsu.py) costs ~512 VPU ops
per element and measures ~17 ms/step at production batch — the second
hottest stage of the destripe kernel. This kernel splits the 8-bit bin index
into high/low nibbles and computes the histogram as a 16x16 one-hot OUTER
PRODUCT on the MXU:

    hist[16*h + l] = sum_n [hi_n == h] * [lo_n == l]
                   = (HiOneHot^T @ LoOneHot)[h, l]

so each element costs ~32 VPU compare ops to build the two (tile, 16) bf16
one-hots in VMEM plus negligible MXU work. Counts are exact: one-hot
products are 0/1 and accumulate in float32 (exact below 2^24).

Bin-index math reproduces otsu.py bit-for-bit: idx = (x - lo) / span * 256,
floored and clipped. Lane padding is NaN: NaN indices compare False in both
one-hots and contribute nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_env
from .pallas_band import _load_f32

__all__ = ["histogram256_batch", "available"]

_ROWS = 64  # tile rows per grid step (on-chip sweep at (64,1600,2000):
# 8 -> 7.60 ms, 16 -> 6.33, 32 -> 5.88, 64 -> 5.51, 128 -> 5.68, 256 -> 5.93;
# bigger tiles amortize per-program grid/DMA overhead until unroll bloat wins)


def available() -> bool:
    return pallas_env.enabled()


def _make_kernel(H: int, W: int, rows: int, square: bool,
                 dyn_rows: bool = False):
    def kernel(*refs):
        if dyn_rows:
            stats_ref, rb_ref, x_ref, out_ref = refs
        else:
            stats_ref, x_ref, out_ref = refs
        b = pl.program_id(0)
        t = pl.program_id(1)

        lo = stats_ref[b, 0]
        span = stats_ref[b, 1]

        x = _load_f32(x_ref[0])  # (ROWS, Wp); raw uint16 converts in-kernel
        # (exact: every 16-bit value is representable in f32), halving the
        # streamed block vs a host-side f32 cast that materializes the plane
        if square:
            x = x * x  # bin on x^2 without materializing it in HBM
        idx = jnp.floor((x - lo) / span * 256.0)
        idx = jnp.clip(idx, 0.0, 255.0)
        if x.shape[1] != W:
            # ragged lane tail (block padding reads undefined values):
            # NaN indices compare False in both one-hots
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            idx = jnp.where(lane < W, idx, jnp.nan)
        hi = jnp.floor(idx / 16.0)
        lo16 = idx - hi * 16.0

        # Mosaic supports no in-kernel reshapes: walk the ROWS sublanes, build
        # (16, Wp) one-hots by broadcast compare, and contract over lanes on
        # the MXU. bf16 one-hot products are exact 0/1; accumulation is f32.
        bins = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0).astype(jnp.float32)

        part = jnp.zeros((16, 16), jnp.float32)
        for r in range(x.shape[0]):  # static unroll (ROWS is small)
            hi_r = hi[r : r + 1, :]
            if dyn_rows:
                # dynamic valid-row bound (Y-halo row shards: only the last
                # shard carries mesh-divisibility pad rows, so the bound is
                # a per-call runtime scalar, not a static shape property):
                # poison rows at/past it exactly like the static tail
                valid = (t * rows + r) < rb_ref[0]
                hi_r = jnp.where(valid, hi_r, jnp.nan)
            elif H % rows:
                # ragged row tail: poison the whole row's indices
                valid = (t * rows + r) < H
                hi_r = jnp.where(valid, hi_r, jnp.nan)
            hi_oh = (bins == hi_r).astype(jnp.bfloat16)  # (16, Wp)
            lo_oh = (bins == lo16[r : r + 1, :]).astype(jnp.bfloat16)
            part = part + jax.lax.dot_general(
                hi_oh,
                lo_oh,
                dimension_numbers=(((1,), (1,)), ((), ())),  # contract lanes
                preferred_element_type=jnp.float32,
            )

        @pl.when(t == 0)
        def _():
            out_ref[0] = part

        @pl.when(t != 0)
        def _():
            out_ref[0] = out_ref[0] + part

    return kernel


def histogram256_batch(x: jax.Array, lo: jax.Array, span: jax.Array,
                       square: bool = False,
                       rows: int = _ROWS,
                       row_bound: "jax.Array | None" = None,
                       interpret: bool = False) -> jax.Array:
    """Per-plane 256-bin histograms.

    x: (B, H, W) float32 or raw uint16 (converted in-kernel — exact, and
    half the HBM read of a materialized f32 cast); lo/span: (B,) plane min
    and (max - min, guarded), always float32.
    With ``square=True`` the histogram is over x**2, squared in-kernel (the
    Otsu input) — saves materializing the squared array. Ragged tails are
    masked in-kernel, so the input is never padded/copied. Returns (B, 256)
    float32 counts, bit-identical binning to otsu.histogram_fixed_bins.

    ``row_bound``: optional (1,) int32 DYNAMIC valid-row count — rows at or
    past it contribute nothing (same poisoning as the static ragged tail).
    Used by the Y-halo tier, where a row shard's mesh-divisibility padding
    is a runtime property of the device, not of the array shape.
    """
    B, H, W = x.shape
    Wp = -(-W // 128) * 128
    dyn_rows = row_bound is not None
    # Narrow planes underfill the MXU contraction: the kernel issues one
    # (16, Wp) dot per SUBLANE row, so dot-issue + one-hot-build overhead
    # scales with row count, not elements (measured on chip: the 204x254
    # level-2 band cost 1.06 ms vs 1.30 ms for the 16x bigger level-0 band).
    # Binning is position-independent and NaN input elements self-mask (a
    # NaN bin index compares False in both one-hots — the kernel's own
    # ragged-tail mechanism), so fold `1024 // Wp` rows into one 1024-lane
    # row on the XLA side. Counts are bit-identical: one-hot sums are exact
    # 0/1 accumulation in any order. Precondition: finite input (wavelet
    # coefficients are; NaNs would silently drop from the counts either way).
    # Gated at fold >= 4 (Wp <= 256): the pad+relayout copy costs a full
    # HBM round trip of the plane, which on-chip measurement shows only the
    # narrow bands repay (level-2 204x254: 1.06 -> ~0.4 ms; the 403x503
    # fold-2 level LOST ~0.7 ms net to its 53 MB copy — headline 10514 ->
    # 10394 MPix/s with fold-2 included).
    if 0 < Wp <= 256 and not dyn_rows:
        # (the lane fold re-groups rows, which would break a dynamic
        # row bound; halo-tier bands are wide and never fold anyway)
        fold = 1024 // Wp
        Hf = -(-H // fold) * fold
        x = jnp.pad(
            x.astype(jnp.float32),
            ((0, 0), (0, Hf - H), (0, Wp - W)),
            constant_values=jnp.nan,
        ).reshape(B, Hf // fold, fold * Wp)
        H, W = x.shape[1], x.shape[2]
        Wp = W
    stats = jnp.stack([lo, span], axis=-1).astype(jnp.float32)  # (B, 2)

    rows = min(rows, -(-H // 8) * 8)  # don't exceed the (8-aligned) plane
    n_tiles = -(-H // rows)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # full (B, 2) stats table
    ]
    ins = [stats]
    if dyn_rows:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        ins.append(row_bound.reshape(1).astype(jnp.int32))
    in_specs.append(
        pl.BlockSpec(
            (1, rows, Wp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        )
    )
    ins.append(x)
    out = pl.pallas_call(
        _make_kernel(H, W, rows, square, dyn_rows=dyn_rows),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 16, 16), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 16, 16), jnp.float32),
        interpret=pallas_env.interpret_default(interpret),
    )(*ins)
    return out.reshape(B, 256)
