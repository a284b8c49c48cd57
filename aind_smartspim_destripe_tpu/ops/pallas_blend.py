"""
Pallas TPU kernel: fused dual-band blend — sigmoid foreground fraction,
17x17 box smoothing, and the per-pixel band mix in ONE pass.

The XLA formulation (ops/dual_band.py: sigmoid -> two lax.reduce_window
box passes -> fore*frac + back*(1-frac)) moves the full-resolution frac
array through HBM five times (~29 ms of the ~65 ms dual step at production
geometry, trace-measured round 3). This kernel reads x (edge-padded once in
XLA), fore, back and writes the blended output — one read per operand, one
write, everything else in VMEM:

  frac   = sigmoid((x_pad - center_b) / crossover)   (center per plane)
  smooth = box17_rows(box17_cols(frac)) / 289
  out    = fore * smooth + back * (1 - smooth)

Numerics vs the XLA path: identical stencil and edge-replicate semantics
(the caller pads x with mode="edge"; padding x then applying the monotone
elementwise sigmoid equals padding frac). The only difference is summation
order and a single /289 in place of two /17 — sub-ulp on a soft mask in
[0, 1]; the dual-band integration gate (>=60 dB) covers it end to end.

Row windows: output row tile [t*rt, t*rt+rt) needs padded rows
[t*rt, t*rt+rt+16) — the tile start is rt-aligned, so TWO consecutive
rt-row blocks (t, t+1, clamped at the top) cover every window with no
unaligned block starts. Garbage rows past the padded extent only feed
output rows that the ragged final store discards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_env
from .pallas_band import _load_f32

__all__ = ["available", "blend_smooth_mix"]

RADIUS = 8
K = 2 * RADIUS + 1


def available() -> bool:
    return pallas_env.enabled()


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def blend_smooth_mix(
    x: jax.Array,  # (B, H, W) f32 — or raw uint16 — planes
    fore: jax.Array,  # (B, H, W) f32 foreground band — or, with back=None,
    # the STACKED (2B, H, W) band pair straight from destripe_batch(dual=
    # True) ([:B] = foreground, [B:] = background)
    back: jax.Array,  # (B, H, W) f32 background band, or None (stacked)
    centers: jax.Array,  # (B,) f32 sigmoid centers
    crossover: float,
    rows_tile: int = 64,  # on-chip dual-step sweep 2026-08-19: 32 -> 54.74
    # ms, 48 -> 54.38, 64 -> 54.16 (optimum), 96 -> 54.21; 128 overflows
    # scoped VMEM (25 MB vs the 16 MB limit)
    interpret: bool = False,
) -> jax.Array:
    """With ``back=None`` both band blocks are read from the one stacked
    buffer by block index (foreground plane ``b``, background ``b + B``) —
    the round-5 dual-step trace showed XLA materializing the
    ``both[:B]``/``both[B:]`` split as a 2x-full-plane copy fusion
    (5.1 ms/step, ~980 MB of HBM traffic at B=64 production geometry) that
    this indexing removes. Outputs are bit-identical either way.

    With uint16 ``x`` the edge pad stays uint16 and the kernel converts
    in-VMEM (exact — the sigmoid sees identical f32 bits), halving the
    padded plane's HBM write and the kernel's double-block read vs a
    host-graph f32 cast."""
    B, H, W = x.shape
    # one edge pad in XLA (cheap, fused with the upstream cast); sigmoid is
    # monotone elementwise so pad-then-sigmoid == sigmoid-then-pad
    xp = jnp.pad(x, ((0, 0), (RADIUS, RADIUS), (RADIUS, RADIUS)), mode="edge")
    Hp, Wp = H + 2 * RADIUS, W + 2 * RADIUS
    n_rt = _cdiv(H, rows_tile)
    n_blk = _cdiv(Hp, rows_tile)
    inv_cross = 1.0 / float(crossover)
    inv_k2 = 1.0 / float(K * K)

    def box17(v, axis, out_len):
        # log-tree sliding sum: each shifted slice is a full VPU copy, so
        # 17 naive taps cost 17 relayouts — the doubling tree does it in 5
        # (s_{2k}[i] = s_k[i] + s_k[i+k] -> 16-window in 4 steps + 1 tap)
        s = v
        for k in (1, 2, 4, 8):
            if axis == 1:
                s = s[:, : s.shape[1] - k] + s[:, k:]
            else:
                s = s[: s.shape[0] - k] + s[k:]
        if axis == 1:
            return s[:, :out_len] + v[:, K - 1 : K - 1 + out_len]
        return s[:out_len] + v[K - 1 : K - 1 + out_len]

    def kernel(c_ref, x0_ref, x1_ref, f_ref, b_ref, o_ref):
        b = pl.program_id(0)
        c = c_ref[b]
        # frac rows [t*rt, t*rt + rt + 16) of the padded plane; slice the
        # assembled window down to rt+16 rows (sublane-aligned for rt % 8
        # == 0) so the sigmoid + rows pass don't run on 2*rt rows
        xa = jnp.concatenate([x0_ref[0], x1_ref[0]], axis=0)
        xa = _load_f32(xa[: rows_tile + K - 1])
        frac = 1.0 / (1.0 + jnp.exp(-(xa - c) * inv_cross))
        rs = box17(frac, 1, W)          # rows pass (lanes)
        sm = box17(rs, 0, rows_tile) * inv_k2  # cols pass (sublanes)
        o_ref[0] = f_ref[0] * sm + b_ref[0] * (1.0 - sm)

    clamp_blk = lambda t: jnp.minimum(t, n_blk - 1)  # noqa: E731
    stacked = back is None
    if stacked:
        if fore.shape[0] != 2 * B:
            raise ValueError(
                f"stacked band pair must hold 2B={2 * B} planes, got "
                f"{fore.shape[0]}"
            )
        back = fore
        b_imap = lambda b, t, c: (b + B, t, 0)  # noqa: E731
    else:
        b_imap = lambda b, t, c: (b, t, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_rt),
            in_specs=[
                pl.BlockSpec((1, rows_tile, Wp), lambda b, t, c: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows_tile, Wp),
                             lambda b, t, c: (b, clamp_blk(t + 1), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows_tile, W), lambda b, t, c: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows_tile, W), b_imap,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows_tile, W),
                                   lambda b, t, c: (b, t, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        interpret=pallas_env.interpret_default(interpret),
    )(centers.astype(jnp.float32), xp, xp, fore, back)
