"""
Pallas TPU kernels: blocked banded-operator matmuls for the DWT hot passes.

The dense per-geometry DWT operators (ops/wavelets.py) keep the MXU busy but
multiply ~99.6% zeros: an analysis operator row has only ``flen`` nonzeros.
Earlier attempts to exploit the band lost everything to data movement — both
are recorded negative results, not viable alternatives:

- XLA polyphase/strided-slice formulations relayout whole arrays (a bare
  swapaxes of (64,1600,2000) costs ~51 ms on v5e; measured 107-216 ms per
  pass vs ~42 ms dense);
- a window-DMA Pallas kernel (double-buffered HBM->VMEM copies per sliding
  window, deleted round 3; history: ``git log -- */ops/pallas_dwt.py``) was
  bound by misaligned copies (window starts are not 8-row aligned) and an
  XLA-materialized symmetric extension, measuring 43.8 ms vs 41.8 ms dense
  for the rows pass.

This module uses a layout that avoids both failure modes:

- each grid step holds the FULL contraction axis of its tile in VMEM
  (always affordable: the longest axis is ~2048 lanes), and
- the banded operator is pre-sliced on the host into per-output-block
  windows (:func:`blocked_operator`), so the kernel runs a few small ALIGNED
  in-VMEM slices ``x[s : s + w_win] @ block`` instead of one dense matmul —
  4-6x fewer MXU FLOPs at production geometry. Window starts follow a
  closed-form ``clip(stride*idx - pad, 0, smax)`` shared between the host
  blocking and the kernel, and :func:`blocked_operator` verifies exactly
  that every nonzero of each output block falls inside its window.

Numerics: operands are split hi/lo into bfloat16 and accumulated in float32
over three dots (hi@hi + hi@lo + lo@hi), reproducing XLA's HIGH matmul
precision (the dense path's setting); one window spans the whole band of an
output element, so each output is still a single short dot — only the
(zero) tail of the contraction is regrouped. The destripe golden gate
(60 dB, measured 86-102 dB) covers the path end to end.

Replaces (reference filtering.py:176,221 — pywt wavedec2/waverec2 passes):
- :func:`an_x_lowpass_log1p` — log(1.0+x) -> lowpass x-pass (analysis)
- :func:`an_y_pass` — lowpass+highpass y-pass (analysis)
- :func:`syn_y_pass` — stacked [cA-correction; cH-delta] y synthesis
- :func:`syn_x_exp` — lowpass x synthesis + ``exp(xlog + corr) + 1.0``
  (optionally fused with the flat-field epilogue, reference
  filtering.py:222,338-414)
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_env

__all__ = [
    "available",
    "blocked_operator",
    "an_x_lowpass_log1p",
    "an_x_lowpass_chunked",
    "an_y_pass",
    "syn_y_pass",
    "syn_x_exp",
    "syn_x_exp_chunked",
]


def available() -> bool:
    """Can the kernels run here? True on TPU, or anywhere when
    DESTRIPE_PALLAS_INTERPRET=1 forces interpreter mode (pallas_env)."""
    return pallas_env.enabled()


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _rup(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def window_starts(
    n_blocks: int, stride: int, pad: int, smax: int
) -> Tuple[int, ...]:
    """Closed-form window starts: ``clip(stride*i - pad, 0, smax)``."""
    return tuple(min(max(stride * i - pad, 0), smax) for i in range(n_blocks))


def blocked_operator(
    A: np.ndarray, r_out: int, w_win: int, starts: Tuple[int, ...],
    row_blocks: Optional[Tuple[Tuple[int, int], ...]] = None,
) -> np.ndarray:
    """Slice a banded dense operator ``A (m, n)`` into per-output-block
    windows.

    ``row_blocks`` lists the (start, stop) output-row ranges per block
    (default: consecutive ``r_out`` rows). Block ``i`` keeps contraction
    columns ``[starts[i], starts[i] + w_win)``; raises if any nonzero falls
    outside (the window formula must cover the band). Returns blocks shaped
    ``(n_blocks, w_win, rows_per_block)`` — transposed so kernels compute
    ``x_window @ block``.
    """
    m, n = A.shape
    if row_blocks is None:
        row_blocks = tuple(
            (i * r_out, min((i + 1) * r_out, m))
            for i in range(_cdiv(m, r_out))
        )
    rows_per = max(b - a for a, b in row_blocks)
    blocks = np.zeros((len(row_blocks), w_win, rows_per), dtype=np.float32)
    for i, ((a, b), s) in enumerate(zip(row_blocks, starts)):
        rows = A[a:b]
        nz = np.nonzero(np.any(rows != 0.0, axis=0))[0]
        if nz.size and (int(nz[0]) < s or int(nz[-1]) >= s + w_win):
            raise ValueError(
                f"band of output block {i} ({nz[0]}..{nz[-1]}) outside "
                f"window [{s}, {s + w_win})"
            )
        lo, hi = s, min(s + w_win, n)
        blocks[i, : hi - lo, : b - a] = rows[:, lo:hi].T
    return blocks


def _split_bf16(x):
    """In-KERNEL hi/lo bf16 split (Mosaic compiles this faithfully).

    Never emit this split at the XLA level: under
    ``--xla_allow_excess_precision`` (set in production TPU environments)
    XLA folds ``x - f32(bf16(x))`` to zero, silently degrading the 3-pass
    accumulation to single-pass bf16 (measured: 2.2e-5 -> 1.1e-3 rel).
    Operator splits are therefore done on the HOST (:func:`split_bf16_np`).
    """
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def split_bf16_np(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side round-to-nearest hi/lo bf16 split (numpy + ml_dtypes)."""
    import ml_dtypes

    a = np.asarray(a, dtype=np.float32)
    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _load_f32(x):
    """In-kernel conversion to float32. Mosaic has no unsigned->float cast,
    so uint16 goes via an int16 bitcast, sign-extending int32 upcast, and a
    0xFFFF mask (exact for all 16-bit values)."""
    if x.dtype == jnp.uint16:
        i = jax.lax.bitcast_convert_type(x, jnp.int16).astype(jnp.int32)
        return (i & 0xFFFF).astype(jnp.float32)
    return x.astype(jnp.float32)


def _dot3(xh, xl, bh, bl, dims):
    """f32 accumulation over three bf16 dots == lax.Precision.HIGH."""

    def d(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    return d(xh, bh) + d(xh, bl) + d(xl, bh)


# ---------------------------------------------------------------------------
# K1: analysis x-pass, lowpass only, log(1.0 + x) fused
# ---------------------------------------------------------------------------


def an_x_lowpass_log1p(
    x: jax.Array,  # (B, H, W) uint16/float32 raw planes
    blocks: Tuple[jax.Array, jax.Array],  # host-split (hi, lo) bf16
    starts: Tuple[int, ...],
    out_w: int,
    rows_tile: Optional[int] = None,
    log1p: bool = True,
    cls_cut: Optional[float] = None,
    interpret: bool = False,
):
    """``log(1.0 + x) @ A_x_lo^T`` — the finest-level analysis x-pass with
    the log-space transform fused (reference filtering.py:175-176). The
    contraction is over lanes; window starts are 128-aligned so the in-VMEM
    slices are free. ``blocks``: (hi, lo) bf16 windows from
    :func:`split_bf16_np`, shaped (nc, w_win, r_out). ``log1p=False`` skips
    the log transform (deeper analysis levels consume cA already in log
    space). Returns (B, H, out_w) float32.

    With ``cls_cut`` (the exact f32 classifier breakpoint,
    filter._classifier_cut_f32) a second array (B, n_row_tiles, 8, 512) is
    returned carrying the per-tile classifier partial reductions in lane
    groups of 128: [fg_cnt | bg_cnt | fg_sum | bg_sum] over the RAW values
    — so the per-plane cells classifier costs no extra read of the batch.
    Sum over axis 1 at [:, :, 0, lane] for lane in 0/128/256/384 (the
    sublane dim is store-alignment padding)."""
    B, H, W = x.shape
    bh, bl = blocks
    nc, w_win, r_out = bh.shape
    w_pad = _rup(W, 128)
    if rows_tile is None:
        # float32 input doubles the streamed block vs uint16; 320 rows
        # overflows the 16 MB scoped-vmem stack there by ~0.2 MB (observed
        # on the dual-band / f32-loader path), so shrink the tile.
        rows_tile = (
            320 if np.issubdtype(np.dtype(x.dtype), np.integer) else 256
        )
    n_rt = _cdiv(H, rows_tile)
    stats = cls_cut is not None
    # Boundary-block lane padding is undefined. Integer garbage stays finite
    # (0 * finite = 0 through the zero operator tail) but float garbage can
    # be NaN/Inf, which would poison the dot — mask it. Ragged ROWS need no
    # mask for the matmul (the contraction is over lanes, so garbage rows
    # stay in their own output rows and the partial store discards them) —
    # but the stats reductions must exclude both padding axes.
    mask_lanes = W != w_pad and not np.issubdtype(
        np.dtype(x.dtype), np.integer
    )

    def kernel(*refs):
        if stats:
            bh_ref, bl_ref, x_ref, o_ref, st_ref = refs
            t_idx = pl.program_id(1)
        else:
            bh_ref, bl_ref, x_ref, o_ref = refs
        xt = _load_f32(x_ref[0])
        lane = jax.lax.broadcasted_iota(jnp.int32, xt.shape, 1)
        if mask_lanes:
            xt = jnp.where(lane < W, xt, 0.0)
        if stats:
            valid = lane < W
            if H % rows_tile:
                row = jax.lax.broadcasted_iota(jnp.int32, xt.shape, 0)
                valid = valid & (t_idx * rows_tile + row < H)
            m = (xt >= jnp.float32(cls_cut)) & valid
            mb = (~m) & valid
            fg_cnt = jnp.sum(m.astype(jnp.float32))
            bg_cnt = jnp.sum(mb.astype(jnp.float32))
            fg_sum = jnp.sum(jnp.where(m, xt, 0.0))
            bg_sum = jnp.sum(jnp.where(mb, xt, 0.0))
            # (8, 512) tile: sublane dim padded to 8 for the store rule
            sl = jax.lax.broadcasted_iota(
                jnp.int32, st_ref.shape[2:], 1
            ) // 128
            st_ref[0, 0] = jnp.where(
                sl == 0, fg_cnt,
                jnp.where(sl == 1, bg_cnt,
                          jnp.where(sl == 2, fg_sum, bg_sum)),
            )
        if log1p:
            xt = jnp.log(1.0 + xt)
        xh, xl = _split_bf16(xt)
        for c in range(nc):
            s = starts[c]
            o_ref[0, :, c * r_out : (c + 1) * r_out] = _dot3(
                xh[:, s : s + w_win], xl[:, s : s + w_win],
                bh_ref[c], bl_ref[c], ((1,), (0,)),
            )

    out_specs = [
        pl.BlockSpec((1, rows_tile, nc * r_out), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [jax.ShapeDtypeStruct((B, H, out_w), jnp.float32)]
    if stats:
        out_specs.append(
            pl.BlockSpec((1, 1, 8, 512), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((B, n_rt, 8, 512), jnp.float32)
        )

    res = pl.pallas_call(
        kernel,
        grid=(B, n_rt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_tile, w_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if stats else out_specs[0],
        out_shape=tuple(out_shapes) if stats else out_shapes[0],
        interpret=pallas_env.interpret_default(interpret),
    )(bh, bl, x)
    return res


# ---------------------------------------------------------------------------
# K2: analysis y-pass (lowpass + highpass together)
# ---------------------------------------------------------------------------


def an_y_pass(
    x: jax.Array,  # (B, H, W) f32 — the x-pass output
    blocks: Tuple[jax.Array, jax.Array],  # host-split (hi, lo) bf16;
    # shaped (nr, w_win, 2*r_out) with [:, :, :r_out] the lowpass half
    stride: int,
    pad: int,
    out_h: int,
    col_tile: int = 256,
    stats: bool = False,
    interpret: bool = False,
):
    """One analysis pass along axis -2: returns (lo, hi), each
    (B, out_h, W). Contraction is over sublanes; windows are dynamic
    ``pl.ds`` slices with the shared closed-form start.

    With ``stats=True`` a third array (B, n_col_tiles, 8, 256) is returned:
    lanes [0:128) hold the per-tile min of ``|hi|`` and [128:256) the max —
    computed on the detail values while they are still in registers, so the
    Otsu bin range (min/max of the absolute coefficients, ops/otsu.py)
    never costs a full re-read of the band from HBM. Reduce over axis 1 at
    [:, :, 0, 0] / [:, :, 0, 128] for the per-plane range (the sublane dim
    is store-alignment padding)."""
    B, H, W = x.shape
    bh, bl = blocks
    nr, w_win, r2 = bh.shape
    r_out = r2 // 2
    n_ct = _cdiv(W, col_tile)
    if w_win > H:
        # mirror syn_y_pass: with the window taller than the input, the
        # closed-form starts would clamp to a negative smax and the Python
        # slice below would silently wrap from the end of the array
        raise ValueError(f"window rows {w_win} > input rows {H}")
    smax = H - w_win
    # static per-block window starts (the same closed form as the builder);
    # static slices need no Mosaic alignment proofs, and unrolling the
    # out-row blocks into one program per (batch, col-tile) lets the ragged
    # final block use an exact-width store
    starts = window_starts(nr, stride, pad, smax)

    def kernel(*refs):
        if stats:
            bh_ref, bl_ref, x_ref, lo_ref, hi_ref, mm_ref = refs
            c = pl.program_id(1)
        else:
            bh_ref, bl_ref, x_ref, lo_ref, hi_ref = refs
        xt = x_ref[0]
        mn = jnp.float32(np.inf)
        mx = jnp.float32(-np.inf)
        for r in range(nr):
            s = starts[r]
            xh, xl = _split_bf16(xt[s : s + w_win, :])
            # operator first so the result lands (2*r_out, ct) row-major
            out = _dot3(bh_ref[r], bl_ref[r], xh, xl, ((0,), (0,)))
            n = min(r_out, out_h - r * r_out)
            lo_ref[0, r * r_out : r * r_out + n, :] = out[:n]
            hi_ref[0, r * r_out : r * r_out + n, :] = out[r_out : r_out + n]
            if stats:
                # |cH| extrema while the tile is in registers. Ragged final
                # col tile: lanes >= W carry garbage — exclude them.
                a = jnp.abs(out[r_out : r_out + n])
                lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
                valid = (c * col_tile + lane) < W
                mn = jnp.minimum(
                    mn, jnp.min(jnp.where(valid, a, jnp.float32(np.inf)))
                )
                mx = jnp.maximum(
                    mx, jnp.max(jnp.where(valid, a, jnp.float32(-np.inf)))
                )
        if stats:
            lane = jax.lax.broadcasted_iota(
                jnp.int32, mm_ref.shape[2:], 1
            )
            mm_ref[0, 0] = jnp.where(lane < 128, mn, mx)

    out_specs = [
        pl.BlockSpec((1, out_h, col_tile), lambda b, c: (b, 0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, out_h, col_tile), lambda b, c: (b, 0, c),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, out_h, W), jnp.float32),
        jax.ShapeDtypeStruct((B, out_h, W), jnp.float32),
    ]
    if stats:
        out_specs.append(
            pl.BlockSpec((1, 1, 8, 256), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((B, n_ct, 8, 256), jnp.float32)
        )

    res = pl.pallas_call(
        kernel,
        grid=(B, n_ct),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, col_tile), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=pallas_env.interpret_default(interpret),
    )(bh, bl, x)
    return res


# ---------------------------------------------------------------------------
# K3: y synthesis of the correction (stacked [cA-corr; cH-delta])
# ---------------------------------------------------------------------------


def syn_y_pass(
    corr: Optional[jax.Array],  # (B, L, W) f32 or None (coarsest level)
    delta: jax.Array,  # (B, L, W) f32
    blocks_lo,  # host-split (hi, lo) bf16 (nt, w_win, r_out) — cA windows
    blocks_hi,  # host-split (hi, lo) bf16 (nt, w_win, r_out) — cH windows
    stride: int,
    pad: int,
    out_h: int,
    col_tile: int = 512,  # on-chip full-step sweep: 128 -> 19.77 ms,
    # 256 -> 19.65, 512 -> 19.59 (benchmarks/kernel_sweep.py k3col)
    interpret: bool = False,
) -> jax.Array:
    """One synthesis pass along axis -2 of the correction pyramid:
    ``S_y[:, :L] @ corr + S_y[:, L:] @ delta`` (reference waverec2 row
    pass). ``corr=None`` skips the cA half (coarsest level: the correction
    starts at zero). Returns (B, out_h, W) float32.

    ``col_tile`` is clamped so the double-buffered block working set
    (n_in input tiles of L rows + one output tile of out_h rows, f32)
    stays inside Mosaic's 16 MiB scoped-VMEM stack: at the production
    1600x2000 geometry the 512 default sums to ~13 MiB, but a 2048x2048
    plane (BASELINE config 1) reaches 16.06 MiB and the compiler rejects
    the program — measured on chip 2026-08-19, the clamp halves it to 256
    there (and only there; the sweep-tuned 512 is kept whenever it fits)."""
    B, L, W = delta.shape
    bh_h, bh_l = blocks_hi
    nt, w_win, r_out = bh_h.shape
    n_in = 1 if corr is None else 2
    # Budget ALL scoped-VMEM residents, not just the streamed blocks: the
    # operator tensors (hi+lo bf16 per input half) live in VMEM for the
    # whole call, and each window contributes a (w_win, col_tile) bf16
    # hi/lo split temporary pair.
    op_bytes = 2 * n_in * int(bh_h.size) * 2  # (hi, lo) x (cH[, cA]) bf16
    # double-buffered f32 bytes per column of tile width + split temps
    bytes_per_col = 2 * 4 * (L * n_in + out_h) + 2 * 2 * w_win
    budget = int(15.7 * 2**20)
    while col_tile > 128 and op_bytes + col_tile * bytes_per_col > budget:
        col_tile //= 2
    if op_bytes + col_tile * bytes_per_col > budget:
        # 128 floor hit while still over budget: surface it instead of
        # letting Mosaic's scoped-VMEM check fail with a bare compile error
        import warnings

        warnings.warn(
            f"syn_y_pass: col_tile floored at 128 but the working set "
            f"({(op_bytes + col_tile * bytes_per_col) / 2**20:.1f} MiB: "
            f"operators {op_bytes / 2**20:.1f} + blocks) still exceeds the "
            f"~{budget / 2**20:.1f} MiB scoped-VMEM budget; Mosaic may "
            f"reject this geometry (L={L}, out_h={out_h}, n_in={n_in})"
        )
    n_ct = _cdiv(W, col_tile)
    if w_win > L:
        raise ValueError("window wider than the coefficient axis — use the "
                         "dense path for tiny levels")
    # windows clamp to the LOGICAL extent L (slices must stay in-bounds);
    # the boundary start is generally not 8-aligned, so out-row blocks are
    # statically unrolled into one program per (batch, col-tile)
    smax = L - w_win
    starts = window_starts(nt, stride, pad, smax)

    with_corr = corr is not None
    if with_corr:
        bl_h, bl_l = blocks_lo

    def kernel(*refs):
        if with_corr:
            bhh, bhl, blh, bll, corr_ref, delta_ref, o_ref = refs
        else:
            bhh, bhl, delta_ref, o_ref = refs
        for t in range(nt):
            s = starts[t]

            def half(x_ref, b_hi_ref, b_lo_ref):
                xh, xl = _split_bf16(x_ref[0, s : s + w_win, :])
                return _dot3(
                    b_hi_ref[t], b_lo_ref[t], xh, xl, ((0,), (0,)),
                )  # (r_out, col_tile)

            out = half(delta_ref, bhh, bhl)
            if with_corr:
                out = out + half(corr_ref, blh, bll)
            n = min(r_out, out_h - t * r_out)
            o_ref[0, t * r_out : t * r_out + n, :] = out[:n]

    ins = [bh_h, bh_l] + ([bl_h, bl_l, corr] if with_corr else []) + [delta]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    if with_corr:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        in_specs += [pl.BlockSpec((1, L, col_tile), lambda b, c: (b, 0, c),
                                  memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec((1, L, col_tile), lambda b, c: (b, 0, c),
                              memory_space=pltpu.VMEM)]

    return pl.pallas_call(
        kernel,
        grid=(B, n_ct),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, out_h, col_tile),
                               lambda b, c: (b, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_h, W), jnp.float32),
        interpret=pallas_env.interpret_default(interpret),
    )(*ins)


# ---------------------------------------------------------------------------
# K4: x synthesis + exp(xlog + corr) + 1.0 (+ optional flat-field epilogue)
# ---------------------------------------------------------------------------


def syn_x_exp(
    stacked: jax.Array,  # (B, H, L) f32 — y-synthesized correction
    images: Optional[jax.Array],  # (B, H, W) original planes, or None
    blocks,  # host-split (hi, lo) bf16 (nc, w_win, r_out), lane contraction
    starts: Tuple[int, ...],
    out_w: int,
    flat: Optional[jax.Array] = None,  # (H, W) f32
    dark: Optional[jax.Array] = None,  # (H, W) f32
    wrap: bool = False,
    rows_tile: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Synthesis x-pass, optionally fused with the filter epilogue.

    Computes ``corr = stacked @ S_x_lo^T`` blockwise. With ``images`` it
    returns ``exp(log(1.0 + images) + corr) + 1.0`` (reference
    filtering.py:222's exact ``exp(y) + 1.0`` quirk) — float32 output. With
    ``flat``/``dark`` it additionally applies the flat-field correction
    (darkfield subtract clamped at 0, flatfield divide, clip) -> uint16
    in-kernel (reference filtering.py:338-414); with ``wrap=True`` it
    instead applies the zarr-style modulo-2^16 cast -> uint16 (reference
    zarr_destriper.py:336 float-into-uint16-store parity). Either fused
    epilogue saves one full-image HBM round trip. With ``images=None`` it
    returns the bare correction (deeper synthesis levels, whose output
    feeds the next finer level's stacking).
    """
    B, H, L = stacked.shape
    bh, bl = blocks
    nc, w_win, r_out = bh.shape
    L_pad = _rup(L, 128)
    with_img = images is not None
    # images may hold fewer planes than the correction batch (dual-band: two
    # corrections per plane); the image block index then wraps modulo its
    # own batch, so the raw planes are read in place rather than duplicated
    B_img = B if images is None else int(images.shape[0])
    if with_img and B % B_img:
        raise ValueError(f"correction batch {B} not a multiple of image "
                         f"batch {B_img}")
    with_flat = flat is not None
    if with_flat and wrap:
        raise ValueError("flat-field and wrap epilogues are exclusive")
    if (with_flat or wrap) and not with_img:
        raise ValueError("epilogues need the original images")
    if rows_tile is None:
        if with_flat:
            # flat/dark blocks roughly double the per-program footprint;
            # 320 rows overflows the 16 MB scoped-vmem stack (observed 23M)
            rows_tile = 160
        else:
            # Size the tile from the streamed bytes/row (double-buffered
            # blocks), leaving ~4 MB of the 16 MB scoped-vmem stack for the
            # resident operators (~3.1 MB) and register temps. An all-f32
            # call at 320 rows measures 16.52 MB — just over the limit.
            img_b = 0 if images is None else np.dtype(images.dtype).itemsize
            out_b = 2 if wrap else 4
            per_row = (L_pad * 4 + nc * r_out * (img_b + out_b)) * 2
            rows_tile = next(
                (rt for rt in (320, 256, 160, 128)
                 if per_row * rt <= 12 * 2**20), 96
            )
    n_rt = _cdiv(H, rows_tile)

    def kernel(*refs):
        if with_flat:
            bh_ref, bl_ref, st_ref, img_ref, f_ref, d_ref, o_ref = refs
        elif with_img:
            bh_ref, bl_ref, st_ref, img_ref, o_ref = refs
        else:
            bh_ref, bl_ref, st_ref, o_ref = refs
        xt = st_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, xt.shape, 1)
        xt = jnp.where(lane < L, xt, 0.0)  # lane padding garbage
        xh, xl = _split_bf16(xt)
        for c in range(nc):
            s = starts[c]
            corr = _dot3(
                xh[:, s : s + w_win], xl[:, s : s + w_win],
                bh_ref[c], bl_ref[c], ((1,), (0,)),
            )  # (rows_tile, r_out)
            if not with_img:
                o_ref[0, :, c * r_out : (c + 1) * r_out] = corr
                continue
            img = _load_f32(img_ref[0, :, c * r_out : (c + 1) * r_out])
            y = jnp.exp(jnp.log(1.0 + img) + corr) + 1.0
            if with_flat:
                # exact ops/flatfield.flatfield_correction semantics
                d = d_ref[:, c * r_out : (c + 1) * r_out]
                y = jnp.where(y <= d, 0.0, y - d)
                y = y / f_ref[:, c * r_out : (c + 1) * r_out]
                # Mosaic can't lower f32->u16 directly; i32 hop is exact
                # for clipped values and truncates toward zero like numpy
                y = jnp.clip(y, 0.0, 65535.0).astype(jnp.int32).astype(
                    jnp.uint16
                )
            elif wrap:
                # zarr-store parity: numpy wrap cast, not XLA saturation
                y = jnp.mod(jnp.trunc(y).astype(jnp.int32), 65536).astype(
                    jnp.uint16
                )
            o_ref[0, :, c * r_out : (c + 1) * r_out] = y

    ins = ([bh, bl, stacked] + ([images] if with_img else [])
           + ([flat, dark] if with_flat else []))
    # Grid order (n_rt, B): the batch axis iterates FASTEST, so the
    # flat/dark blocks (whose index map ignores b) are fetched once per row
    # tile instead of once per program — without this they dominate the
    # kernel's HBM traffic (2 x 1.3 MB x B x n_rt per step).
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows_tile, L_pad), lambda t, b: (b, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    if with_img:
        img_imap = (
            (lambda t, b: (b, t, 0)) if B_img == B
            else (lambda t, b: (b % B_img, t, 0))
        )
        in_specs += [
            pl.BlockSpec((1, rows_tile, nc * r_out), img_imap,
                         memory_space=pltpu.VMEM),
        ]
    if with_flat:
        in_specs += [
            pl.BlockSpec((rows_tile, nc * r_out), lambda t, b: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, nc * r_out), lambda t, b: (t, 0),
                         memory_space=pltpu.VMEM),
        ]

    return pl.pallas_call(
        kernel,
        grid=(n_rt, B),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows_tile, nc * r_out),
                               lambda t, b: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, H, out_w), jnp.uint16 if (with_flat or wrap) else jnp.float32
        ),
        interpret=pallas_env.interpret_default(interpret),
    )(*ins)


# ---------------------------------------------------------------------------
# Width-adaptive chunked wrappers (Y-halo tier: planes up to 16k+ wide)
# ---------------------------------------------------------------------------

# Scoped-VMEM working-set target for one chunked x-kernel call. Mosaic's
# stack is 16 MiB; leave headroom for the in-kernel bf16 split temporaries
# and Mosaic's own spill slack.
_X_VMEM_BUDGET = int(
    os.environ.get("DESTRIPE_X_VMEM_BUDGET", str(int(11.5 * 2**20)))
)


def _plan_x_chunks(
    nc: int,
    w_win: int,
    r_out: int,
    starts: Tuple[int, ...],
    in_item: int,
    out_cols_item: int,
    rows_cap: int,
    budget: Optional[int] = None,
):
    """Split a blocked x operator of ``nc`` column blocks into chunks whose
    per-call scoped-VMEM working set fits ``budget``: the (hi, lo) bf16
    operator chunk is VMEM-resident for the whole call while the input span
    and output-column row blocks are double-buffered. At production widths
    this returns one chunk (the plain kernels); at Y-halo widths (8k-16k+)
    the operator alone would blow the 16 MiB scoped stack, so the call is
    tiled over output-column groups at the XLA level (the per-element math
    is identical — only store grouping changes, so chunked == unchunked
    bit-for-bit). Returns ``(chunks, rows_tile)`` with chunks a list of
    ``(c0, ng)`` block ranges."""
    if budget is None:
        budget = _X_VMEM_BUDGET
    ng = nc
    rows = 0
    while True:
        op_bytes = ng * w_win * r_out * 2 * 2  # (hi, lo) bf16, resident
        # the widest input lane span any chunk of ng blocks covers
        span = max(
            starts[min(c0 + ng, nc) - 1] + w_win - starts[c0]
            for c0 in range(0, nc, ng)
        )
        per_row = 2 * (span * in_item + ng * r_out * out_cols_item)
        rows = (budget - op_bytes) // per_row if op_bytes < budget else 0
        rows = min(rows_cap, rows // 8 * 8)
        if rows >= 32 or ng == 1:
            break
        ng = -(-ng // 2)
    if rows < 8:
        raise ValueError(
            f"x-kernel working set infeasible even at one column block: "
            f"ng={ng}, rows={rows} (span {span}, budget {budget})"
        )
    chunks = [(c0, min(ng, nc - c0)) for c0 in range(0, nc, ng)]
    return chunks, int(rows)


def an_x_lowpass_chunked(
    x: jax.Array,  # (B, H, W) uint16/float32
    blocks: Tuple[jax.Array, jax.Array],
    starts: Tuple[int, ...],
    out_w: int,
    log1p: bool = True,
    interpret: bool = False,
    budget: Optional[int] = None,
):
    """:func:`an_x_lowpass_log1p` with the operator tiled over output-column
    chunks so arbitrarily wide planes fit the scoped-VMEM stack (the Y-halo
    tier's per-shard x analysis pass; reference filtering.py:175-176 at
    beyond-HBM widths). Bit-identical to the unchunked kernel: each output
    element is one window dot either way. No stats side channel — chunks
    overlap in input lanes, so per-chunk partial reductions would double
    count; the halo route computes its per-plane statistics with psum'd
    reductions outside instead."""
    B, H, Wx = x.shape
    bh, bl = blocks
    nc, w_win, r_out = bh.shape
    in_item = np.dtype(x.dtype).itemsize
    rows_cap = 320 if np.issubdtype(np.dtype(x.dtype), np.integer) else 256
    chunks, rows_tile = _plan_x_chunks(
        nc, w_win, r_out, starts, in_item, 4, rows_cap, budget
    )
    if len(chunks) == 1:
        return an_x_lowpass_log1p(
            x, blocks, starts, out_w, rows_tile=rows_tile, log1p=log1p,
            interpret=interpret,
        )
    outs = []
    for c0, ng in chunks:
        s0 = starts[c0]
        send = min(starts[c0 + ng - 1] + w_win, Wx)
        xs = jax.lax.slice_in_dim(x, s0, send, axis=2)
        st_rel = tuple(s - s0 for s in starts[c0 : c0 + ng])
        ow = min(ng * r_out, out_w - c0 * r_out)
        outs.append(an_x_lowpass_log1p(
            xs, (bh[c0 : c0 + ng], bl[c0 : c0 + ng]), st_rel, ow,
            rows_tile=rows_tile, log1p=log1p, interpret=interpret,
        ))
    return jnp.concatenate(outs, axis=-1)


def syn_x_exp_chunked(
    stacked: jax.Array,  # (B, H, L) f32
    images: Optional[jax.Array],
    blocks: Tuple[jax.Array, jax.Array],
    starts: Tuple[int, ...],
    out_w: int,
    flat: Optional[jax.Array] = None,
    dark: Optional[jax.Array] = None,
    wrap: bool = False,
    interpret: bool = False,
    budget: Optional[int] = None,
) -> jax.Array:
    """:func:`syn_x_exp` with the operator tiled over output-column chunks
    (the Y-halo tier's per-shard x synthesis + fused exp / flat-field / wrap
    epilogue at beyond-HBM widths). The epilogue inputs (images, flat, dark)
    are sliced to each chunk's output columns; numerics are bit-identical to
    the unchunked kernel."""
    B, H, L = stacked.shape
    bh, bl = blocks
    nc, w_win, r_out = bh.shape
    with_img = images is not None
    with_flat = flat is not None
    img_item = 0 if images is None else np.dtype(images.dtype).itemsize
    out_item = 2 if (with_flat or wrap) else 4
    out_cols_item = out_item + img_item + (8 if with_flat else 0)
    chunks, rows_tile = _plan_x_chunks(
        nc, w_win, r_out, starts, 4, out_cols_item,
        160 if with_flat else 320, budget,
    )
    if len(chunks) == 1:
        return syn_x_exp(
            stacked, images, blocks, starts, out_w, flat=flat, dark=dark,
            wrap=wrap, rows_tile=rows_tile, interpret=interpret,
        )
    outs = []
    for c0, ng in chunks:
        s0 = starts[c0]
        send = min(starts[c0 + ng - 1] + w_win, L)
        ss = jax.lax.slice_in_dim(stacked, s0, send, axis=2)
        st_rel = tuple(s - s0 for s in starts[c0 : c0 + ng])
        ow = min(ng * r_out, out_w - c0 * r_out)
        o0 = c0 * r_out
        img_s = (
            jax.lax.slice_in_dim(images, o0, o0 + ow, axis=2)
            if with_img else None
        )
        flat_s = (
            jax.lax.slice_in_dim(flat, o0, o0 + ow, axis=1)
            if with_flat else None
        )
        dark_s = (
            jax.lax.slice_in_dim(dark, o0, o0 + ow, axis=1)
            if with_flat else None
        )
        outs.append(syn_x_exp(
            ss, img_s, (bh[c0 : c0 + ng], bl[c0 : c0 + ng]), st_rel, ow,
            flat=flat_s, dark=dark_s, wrap=wrap, rows_tile=rows_tile,
            interpret=interpret,
        ))
    return jnp.concatenate(outs, axis=-1)
