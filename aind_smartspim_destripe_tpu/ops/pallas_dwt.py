"""
Pallas TPU kernels for the banded DWT analysis pass.

Motivation (measured, see SURVEY/BENCH notes): the dense-operator DWT wastes
n/flen ~ 300x FLOPs but keeps the MXU busy; the XLA-level blocked
formulation cuts FLOPs 5-15x but loses everything to window materialization
and transposes (a bare (64,1600,2000) swapaxes measures ~51 ms on this
chip). A Pallas kernel removes both costs: overlapping input windows are
DMA'd straight from HBM into VMEM (no materialized copies, no transposes)
and multiplied by one small shift-invariant operator block on the MXU.

Kernel shape (rows pass, i.e. along axis -2):
  1-D grid over (B * nq) steps: each step DMAs ext[b, 2R*q : 2R*q+K, :Wp]
  into a double-buffered VMEM slot (the next window's DMA overlaps the
  current dot), computes M^T @ tile on the MXU with manual bf16x3
  accumulation (Mosaic exposes only DEFAULT/HIGHEST dot precisions; bf16x3
  reproduces lax.Precision.HIGH), and writes R lowpass + R highpass rows.

Status (measured on the attached v5e, B=64 x 1600 x 2000): 43.8 ms vs
41.8 ms for the dense-operator einsum — the FLOP advantage (5.5x fewer) is
real but both paths sit ~2x above the memory-bandwidth ideal, dominated by
the extension materialization and per-step overheads, so the dense path
stays the default. This kernel is the scaffold for pushing the whole
per-level filter chain (mask/median/notch) into one fused Pallas program.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavelets import Wavelet, dwt_coeff_len

__all__ = ["an_pass_rows", "available"]

_R = 128  # output rows per filter per grid step


def available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return jax.default_backend() in ("tpu", "cpu")
    except Exception:  # pragma: no cover
        return False


@lru_cache(maxsize=None)
def _block_operator(wavelet_name: str) -> np.ndarray:
    """(2R, K) operator: K = 2R + flen - 2 extended rows -> R lowpass rows
    followed by R highpass rows."""
    from .wavelets import wavelet as get_wavelet

    wav = get_wavelet(wavelet_name)
    flen = wav.flen
    K = 2 * _R + flen - 2
    K = -(-K // 8) * 8  # Mosaic DMA slices must be sublane(8)-aligned
    lo_rev = wav.dec_lo[::-1]
    hi_rev = wav.dec_hi[::-1]
    M = np.zeros((2 * _R, K), dtype=np.float32)
    for r in range(_R):
        for i in range(flen):
            M[r, 2 * r + i] += lo_rev[i]
            M[_R + r, 2 * r + i] += hi_rev[i]
    return M


def _make_kernel(nq: int, total: int):
    def kernel(mhi_ref, mlo_ref, x_hbm, lo_ref, hi_ref, scratch, sems):
        step = pl.program_id(0)
        K = scratch.shape[1]

        def dma_for(s, slot):
            b = s // nq
            q = s % nq
            return pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(q * 2 * _R, K), :],
                scratch.at[slot],
                sems.at[slot],
            )

        # warm-up: first step issues its own DMA
        @pl.when(step == 0)
        def _():
            dma_for(0, 0).start()

        # prefetch the next window while this one computes
        @pl.when(step + 1 < total)
        def _():
            dma_for(step + 1, (step + 1) % 2).start()

        dma_for(step, step % 2).wait()

        # bf16x3 accumulation (== lax.Precision.HIGH, which Mosaic doesn't
        # expose): x = x_hi + x_lo in bf16, drop the lo*lo term.
        x = scratch[step % 2]
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def dot(m, v):
            return jax.lax.dot_general(
                m,
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        out = dot(mhi_ref[...], x_hi) + dot(mhi_ref[...], x_lo) + dot(
            mlo_ref[...], x_hi
        )
        lo_ref[0, ...] = out[:_R]
        hi_ref[0, ...] = out[_R:]

    return kernel


def an_pass_rows(x: jax.Array, wav: Wavelet, interpret: bool = False):
    """One analysis pass along axis -2 of ``x`` (B, H, W) -> (lo, hi) each
    (B, L, W), L = (H + flen - 1) // 2. Columns are untouched. Double-buffered:
    the window DMA for step k+1 overlaps the MXU dot of step k."""
    flen = wav.flen
    B, H, W = x.shape
    L = dwt_coeff_len(H, flen)
    nq = -(-L // _R)
    K = -(-(2 * _R + flen - 2) // 8) * 8

    # symmetric extension + phase shift + padding so every window DMA and
    # the lane dimension are in-bounds/aligned
    ext = jnp.pad(x, [(0, 0), (flen - 1, flen - 1), (0, 0)], mode="symmetric")
    ext = ext[:, 1:, :]
    rows_needed = 2 * _R * nq + K
    if ext.shape[1] < rows_needed:
        ext = jnp.pad(ext, [(0, 0), (0, rows_needed - ext.shape[1]), (0, 0)])
    Wp = -(-W // 128) * 128
    if Wp != W:
        ext = jnp.pad(ext, [(0, 0), (0, 0), (0, Wp - W)])

    M = _block_operator(wav.name)
    M_hi = jnp.asarray(M.astype(np.float32)).astype(jnp.bfloat16)
    M_lo = (jnp.asarray(M) - M_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    total = B * nq
    lo, hi = pl.pallas_call(
        _make_kernel(nq, total),
        grid=(total,),
        in_specs=[
            pl.BlockSpec((2 * _R, K), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * _R, K), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # whole array; manual DMA
        ],
        out_specs=(
            pl.BlockSpec(
                (1, _R, Wp), lambda s: (s // nq, s % nq, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _R, Wp), lambda s: (s // nq, s % nq, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nq * _R, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, nq * _R, Wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, K, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(M_hi, M_lo, ext)
    return lo[:, :L, :W], hi[:, :L, :W]
