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

__all__ = ["available", "stacked_notch_operators", "notch_delta"]


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
