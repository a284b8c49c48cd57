"""
Pallas TPU kernel: fused per-level notch filtering -> synthesis delta.

Replaces the XLA tail of the per-level filter chain (reference
filtering.py:195-217 — mask, row-median inpaint, packed-FFT notch multiply,
foreground/background recombine) with ONE kernel that emits the synthesis
delta ``ch_filtered - ch`` directly:

  stripes   = sqrt(ch^2) > thr[b]          (the reference's rounded compare)
  inpainted = where(stripes, row_med, ch)
  filtered  = inpainted @ notch_op[sel[b]]
  delta     = where(stripes, 0, filtered - ch)

Two structural wins over the XLA formulation (both verified on-trace):

- The cells/no-cells notch operator is chosen PER PLANE by a
  scalar-prefetch block index, so each plane multiplies only its own
  operator — half the MXU FLOPs of the dense path, which must compute both
  bands and select afterwards (XLA cannot gather a per-plane operator
  without materializing B copies).
- The mask/inpaint/recombine/subtract element-wise chain runs in VMEM, so
  neither the double-wide ``both`` product nor the intermediate filtered
  band ever hits HBM.

Numerics: the matmul uses the same host-split bf16 hi/lo 3-dot accumulation
as ops/pallas_band (== lax.Precision.HIGH); the element-wise chain is
bit-identical to the XLA path (``where`` with the same predicate). The
destripe golden gate (60 dB, measured 86-103 dB) covers it end to end.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from typing import Optional

from . import pallas_env
from .pallas_band import _dot3, _split_bf16, split_bf16_np
from .pallas_median import _keys_to_float, _kth_smallest, _sortable_keys

__all__ = [
    "available",
    "stacked_notch_operators",
    "notch_delta",
    "notch_select_chunked",
]


def available() -> bool:
    return pallas_env.enabled()


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _wrap_imap(n_out: int, n_in: int):
    """Input block index map over the batch grid axis: identity when output
    and input batches match, wrap-around (``b mod n_in``) when the kernel
    emits several output variants per input plane."""
    if n_out == n_in:
        return lambda b, t, sel_ref, thr_ref: (b, t, 0)
    return lambda b, t, sel_ref, thr_ref: (b % n_in, t, 0)


def stacked_notch_operators(
    bc: np.ndarray, bn: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack the cells/no-cells notch operators (w, w) into a lane-padded
    (2, wp, wp) pair of bf16 hi/lo arrays, transposed for ``x @ op`` (the
    dense path's ``matmul(inpainted, bc.T)`` orientation). Index 0 = cells,
    1 = no-cells; zero padding keeps garbage lanes out of the contraction.
    """
    w = bc.shape[0]
    wp = _cdiv(w, 128) * 128
    st = np.zeros((2, wp, wp), dtype=np.float32)
    st[0, :w, :w] = bc.T
    st[1, :w, :w] = bn.T
    return split_bf16_np(st)


def notch_delta(
    ch: jax.Array,  # (B, h, w) f32 detail band
    med_raw: Optional[jax.Array],  # (B, R, 128) f32 row medians, or None
    thr: jax.Array,  # (B,) f32 per-plane stripe threshold
    sel_idx: jax.Array,  # (B,) int32: 0 = cells operator, 1 = no-cells
    op_blocks: Tuple[jax.Array, jax.Array],  # (hi, lo) bf16 (2, wp, wp)
    rows_tile: Optional[int] = None,  # single-band default 256 (on-chip
    # full-step sweep at B=64 1600x2000: 64 -> 21.85 ms, 128 -> 19.73,
    # 256 -> 19.63); DUAL (wrapped-batch) calls default 128 — with the
    # round-5 stacked-blend change XLA's VMEM prefetch of the blend's
    # operands overlaps this kernel's window and the 256-row tile
    # overflows Mosaic's 16 MiB scoped stack by 1.9 MiB (measured
    # 2026-08-19; 128 restores ~2 MiB of headroom)
    interpret: bool = False,
) -> jax.Array:
    """Fused mask -> inpaint -> per-plane notch matmul -> delta. Returns
    (B, h, w) float32, the per-level correction ``ch_filtered - ch``.

    ``med_raw=None`` computes the inpainting row medians IN-KERNEL (the
    radix-bisection selection of ops/pallas_median.py over the masked rows
    already resident in VMEM) — one less kernel launch and one less full
    read of the band. Passing a precomputed ``row_median_masked(...,
    raw=True)`` array instead reproduces the two-kernel split.

    The output batch is ``thr.shape[0]`` — when it is a multiple k of the
    input batch, output plane ``b`` reads input plane ``b mod B`` (the block
    index map wraps), so one resident band yields k filtered variants
    without materializing a concatenated copy in HBM. The dual-band filter
    uses k=2: same coefficients, two notch operators/thresholds."""
    B, h, w = ch.shape
    n_out = int(thr.shape[0])
    if n_out % B:
        raise ValueError(f"output batch {n_out} not a multiple of input {B}")
    if rows_tile is None:
        rows_tile = 256 if n_out == B else 128
    oph, opl = op_blocks
    wp = oph.shape[-1]
    n_rt = _cdiv(h, rows_tile)
    with_med = med_raw is not None
    if with_med and med_raw.shape[1] < n_rt * rows_tile and \
            med_raw.shape[1] < h:
        raise ValueError("median array shorter than the band")
    k2 = w // 2
    k1 = (w - 1) // 2

    def kernel(*refs):
        if with_med:
            sel_ref, thr_ref, oph_ref, opl_ref, ch_ref, med_ref, o_ref = refs
        else:
            sel_ref, thr_ref, oph_ref, opl_ref, ch_ref, o_ref = refs
        b = pl.program_id(0)
        t = thr_ref[b]
        x = ch_ref[0]  # (rows_tile, wp)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(lane < w, x, 0.0)  # zero block-padding garbage
        # sqrt(x*x), not |x|: the reference compares the rounded
        # sqrt-of-square (filtering.py:188,195)
        stripes = jnp.sqrt(x * x) > t
        if with_med:
            med = med_ref[0][:, 0:1]
        else:
            # inpainting median of the masked row, computed in-VMEM
            # (reference filtering.py:199-204; numerics identical to
            # ops/pallas_median._make_kernel(masked=True))
            bg = jnp.where(stripes, 0.0, x)
            key = _sortable_keys(bg)
            key = jnp.where(lane < w, key, jnp.uint32(0xFFFFFFFF))
            k_v1 = _kth_smallest(key, k1)
            v1 = _keys_to_float(k_v1)
            if k2 != k1:
                cnt_le = jnp.sum((key <= k_v1).astype(jnp.int32), axis=1,
                                 keepdims=True)
                ikey = pltpu.bitcast(
                    key ^ jnp.uint32(0x80000000), jnp.int32
                )
                nxt_i = jnp.min(
                    jnp.where(key > k_v1, ikey, jnp.int32(0x7FFFFFFF)),
                    axis=1, keepdims=True,
                )
                nxt = pltpu.bitcast(nxt_i, jnp.uint32) ^ jnp.uint32(
                    0x80000000
                )
                k_v2 = jnp.where(cnt_le >= k2 + 1, k_v1, nxt)
                med = (v1 + _keys_to_float(k_v2)) * 0.5
            else:
                med = v1
        inpainted = jnp.where(stripes, med, x)
        ih, il = _split_bf16(inpainted)
        filtered = _dot3(ih, il, oph_ref[0], opl_ref[0], ((1,), (0,)))
        o_ref[0] = jnp.where(stripes, 0.0, filtered - x)

    in_specs = [
        pl.BlockSpec((1, wp, wp),
                     lambda b, t, sel_ref, thr_ref: (sel_ref[b], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, wp, wp),
                     lambda b, t, sel_ref, thr_ref: (sel_ref[b], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows_tile, wp), _wrap_imap(n_out, B),
                     memory_space=pltpu.VMEM),
    ]
    ins = [oph, opl, ch]
    if with_med:
        in_specs.append(
            pl.BlockSpec((1, rows_tile, 128), _wrap_imap(n_out, B),
                         memory_space=pltpu.VMEM)
        )
        ins.append(med_raw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        # batch outermost: the operator block index changes only when the
        # plane (and its classification) changes, so the 2-4 MB operator
        # DMA amortizes over all row tiles of a plane
        grid=(n_out, n_rt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows_tile, wp),
                               lambda b, t, sel_ref, thr_ref: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, h, w), jnp.float32),
        interpret=pallas_env.interpret_default(interpret),
    )(sel_idx.astype(jnp.int32), thr.astype(jnp.float32), *ins)


def _chunk_tiles(wp: int) -> Tuple[int, int]:
    """(col_tile, rows_tile) for :func:`notch_select_chunked` from a
    scoped-VMEM budget. Column chunks are maximized FIRST: with the grid
    ordered (plane, col chunk, row tile) the operator streams through HBM
    exactly once per plane while the input band re-streams once per column
    chunk, so fewer/wider chunks directly cut the only redundant traffic
    (band bytes << operator bytes at halo widths). Rows come second (MXU
    shape/dispatch efficiency only). The budget counts the double-buffered
    input/operator/output blocks plus the kernel's in-VMEM temporaries
    (the lane-masked f32 copy and the bf16 hi/lo pair of the input
    block)."""
    budget = int(
        os.environ.get("DESTRIPE_NOTCH_CHUNK_VMEM", str(13 * 2**20))
    )
    for ct in (512, 384, 256, 128):
        for rt in (256, 192, 128, 64, 32):
            need = (
                2 * rt * wp * 4  # input blocks (double-buffered)
                + 2 * 2 * wp * ct * 2  # operator hi+lo bf16 blocks
                + 2 * rt * ct * 4  # output blocks
                + rt * wp * 4  # masked f32 copy
                + rt * wp * 2 * 2  # bf16 hi/lo split pair
            )
            if need <= budget:
                return ct, rt
    return 128, 32  # pathological width: smallest tiles, let Mosaic judge


def notch_select_chunked(
    x: jax.Array,  # (B, h, w) f32 inpainted band
    sel_idx: jax.Array,  # (B,) int32: 0 = cells operator, 1 = no-cells
    op_blocks: Tuple[jax.Array, jax.Array],  # (hi, lo) bf16 (2, wp, wp)
    rows_tile: Optional[int] = None,
    col_tile: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Per-plane-selected notch product ``x @ op[sel[b]]`` with the
    operator CHUNKED over output columns — the halo-width form of the
    per-plane selection that :func:`notch_delta` keeps resident (a 16 MiB
    scoped-VMEM operator bank stops fitting past w ~ 1.4k; a W=8192 plane's
    finest band needs ~68 MB). Returns (B, h, w) float32.

    Same structural win as the resident kernel: each plane multiplies only
    its own operator (scalar-prefetch bank index), half the MXU FLOPs and
    half the operator HBM traffic of the dense compute-both-bands matmul
    (parallel/halo.py's fallback, measured 3.77 ms of the 16.56 ms W=8192
    B=4 halo step). The mask/inpaint/delta element-wise chain stays in XLA:
    recomputing it per column chunk would pay n_chunks VPU passes for the
    one fused pass XLA already emits.

    Numerics: the same host-split bf16 hi/lo 3-dot accumulation
    (== lax.Precision.HIGH) as every banded kernel; output tiles are each
    ONE full-contraction dot, so results are bit-identical across any
    (rows_tile, col_tile) choice (no accumulation splits)."""
    B, h, w = x.shape
    oph, opl = op_blocks
    wp = oph.shape[-1]
    if rows_tile is None or col_tile is None:
        ct0, rt0 = _chunk_tiles(wp)
        # clamp to the (lane/sublane-rounded) band extents: a tile wider
        # than the whole band just pads the block for nothing
        col_tile = col_tile or min(ct0, wp)
        rows_tile = rows_tile or min(rt0, _cdiv(h, 8) * 8)
    n_rt = _cdiv(h, rows_tile)
    n_c = _cdiv(w, col_tile)

    def kernel(sel_ref, oph_ref, opl_ref, x_ref, o_ref):
        xb = x_ref[0]  # (rows_tile, wp)
        if w < wp:
            # zero the block-padding lanes: OOB reads are unspecified and
            # the operator's zero pad rows only absorb FINITE garbage
            lane = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 1)
            xb = jnp.where(lane < w, xb, 0.0)
        xh, xl = _split_bf16(xb)
        o_ref[0] = _dot3(xh, xl, oph_ref[0], opl_ref[0], ((1,), (0,)))

    op_spec = pl.BlockSpec(
        (1, wp, col_tile),
        lambda b, c, t, sel_ref: (sel_ref[b], 0, c),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # plane outermost (operator bank fixed per plane), column chunks
        # middle, row tiles innermost: the operator chunk is revisited
        # across all row tiles (one stream per plane) and the input block
        # re-fetches per (chunk, tile) — the cheaper of the two re-reads
        grid=(B, n_c, n_rt),
        in_specs=[
            op_spec,
            op_spec,
            pl.BlockSpec((1, rows_tile, wp),
                         lambda b, c, t, sel_ref: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_tile, col_tile),
                               lambda b, c, t, sel_ref: (b, t, c),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, h, w), jnp.float32),
        interpret=pallas_env.interpret_default(interpret),
    )(sel_idx.astype(jnp.int32), oph, opl, x)
