"""
Pallas TPU kernel: fused dual-band blend — sigmoid foreground fraction,
17x17 box smoothing, and the per-pixel band mix in ONE pass.

The XLA formulation (ops/dual_band.py: sigmoid -> two lax.reduce_window
box passes -> fore*frac + back*(1-frac)) moves the full-resolution frac
array through HBM five times (~29 ms of the ~65 ms dual step at production
geometry, trace-measured round 3). This kernel reads x, fore, back and
writes the blended output — ONE read per operand, one write, everything
else in VMEM:

  frac   = sigmoid((x - center_b) / crossover)   (center per plane)
  smooth = box17_rows(box17_cols(frac)) / 289
  out    = fore * smooth + back * (1 - smooth)

Numerics vs the XLA path: identical stencil and edge-replicate semantics
(edge replication commutes with the monotone elementwise sigmoid and with
the per-row lane pass, so replicating the row-pass output equals padding x
with mode="edge" first). The only difference is summation order and a
single /289 in place of two /17 — sub-ulp on a soft mask in [0, 1]; the
dual-band integration gate (>=60 dB) covers it end to end.

Row windows (carry-scratch schedule): output tile t needs box rows
[t*rt - 8, t*rt + rt + 8). Instead of edge-padding x in XLA and fetching
every row block twice (as `mid` then `next` of consecutive grid steps —
~1.9 GB/step of avoidable HBM traffic at B=64 production geometry,
round-5 trace: pad fusion 1.3 ms + pad concatenate 1.3 ms + layout copy
1.3 ms + the doubled block stream), the grid runs ONE EXTRA step per plane
and carries the row-pass output in VMEM scratch: step t loads x block t
once, computes its lane (row) pass, and emits output tile t-1 from
[tail8 of tile t-2 | tile t-1 | head8 of tile t]. Edge replication happens
on the scratch rows (bit-equal to padding x, see above); both pads and the
double read disappear from HBM entirely.
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
    # ms, 48 -> 54.38, 64 -> 54.16 (optimum), 96 -> 54.21 (padded-input
    # kernel; the carry-scratch kernel re-swept flat within noise)
    interpret: bool = False,
) -> jax.Array:
    """With ``back=None`` both band blocks are read from the one stacked
    buffer by block index (foreground plane ``b``, background ``b + B``) —
    the round-5 dual-step trace showed XLA materializing the
    ``both[:B]``/``both[B:]`` split as a 2x-full-plane copy fusion
    (5.1 ms/step, ~980 MB of HBM traffic at B=64 production geometry) that
    this indexing removes. Outputs are bit-identical either way.

    With uint16 ``x`` the kernel converts in-VMEM (exact — the sigmoid sees
    identical f32 bits), halving the plane read vs a host-graph f32 cast.
    """
    if rows_tile < 2 * RADIUS:
        raise ValueError(f"rows_tile must be >= {2 * RADIUS}")
    B, H, W = x.shape
    n_rt = _cdiv(H, rows_tile)
    inv_cross = 1.0 / float(crossover)
    inv_k2 = 1.0 / float(K * K)
    rt = rows_tile

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

    def kernel(c_ref, x_ref, f_ref, b_ref, o_ref, rs_prev, tail8):
        b = pl.program_id(0)
        t = pl.program_id(1)
        c = c_ref[b]

        # lane (row) pass of THIS tile: sigmoid, edge-replicate the 8
        # boundary columns in-VMEM (pad-frac == sigmoid-of-padded-x), then
        # the 17-tap tree along lanes. At t == n_rt the x block index is
        # clamped (re-resident, no refetch) and rs is dead — see head8.
        frac = 1.0 / (1.0 + jnp.exp(-(_load_f32(x_ref[0]) - c) * inv_cross))
        frac = jnp.concatenate(
            [
                jnp.broadcast_to(frac[:, :1], (rt, RADIUS)),
                frac,
                jnp.broadcast_to(frac[:, -1:], (rt, RADIUS)),
            ],
            axis=1,
        )
        rs = box17(frac, 1, W)  # (rt, W)
        # ragged final tile: rows past the plane end replicate the last
        # valid row (== edge-padding x before the elementwise chain), so
        # every window a later output tile assembles sees replicated rows
        valid = jnp.minimum(H - t * rt, rt)
        vfix = jnp.maximum(valid, 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
        # Mosaic has no value dynamic_slice: pick row vfix-1 by one-hot
        # select + sublane sum (exact — one positive row plus zeros; where,
        # not multiply, so NaN/Inf garbage rows past the plane end cannot
        # poison the sum)
        last_valid = jnp.sum(
            jnp.where(rows == vfix - 1, rs, 0.0), axis=0, keepdims=True
        )
        rs = jnp.where(rows >= vfix, jnp.broadcast_to(last_valid, (rt, W)), rs)

        @pl.when(t > 0)
        def _emit():
            # output tile t-1 from [tail8 | rs_prev | head8]; past the last
            # tile head8 replicates the plane's final row-pass row (rs_prev
            # already carries the ragged fix-up, so row rt-1 IS row H-1)
            head8 = jnp.where(
                t == n_rt,
                jnp.broadcast_to(rs_prev[rt - 1 : rt], (RADIUS, W)),
                rs[:RADIUS],
            )
            win = jnp.concatenate([tail8[:], rs_prev[:], head8], axis=0)
            sm = box17(win, 0, rt) * inv_k2  # cols pass (sublanes)
            o_ref[0] = f_ref[0] * sm + b_ref[0] * (1.0 - sm)

        @pl.when(t == 0)
        def _init():
            # rows [-8, 0) of the box input = top edge replication
            tail8[:] = jnp.broadcast_to(rs[:1], (RADIUS, W))
            rs_prev[:] = rs

        @pl.when((t > 0) & (t < n_rt))
        def _carry():
            tail8[:] = rs_prev[rt - RADIUS :]
            rs_prev[:] = rs

    clamp_x = lambda b, t, c: (b, jnp.minimum(t, n_rt - 1), 0)  # noqa: E731
    prev = lambda t: jnp.maximum(t - 1, 0)  # noqa: E731
    stacked = back is None
    if stacked:
        if fore.shape[0] != 2 * B:
            raise ValueError(
                f"stacked band pair must hold 2B={2 * B} planes, got "
                f"{fore.shape[0]}"
            )
        back = fore
        b_imap = lambda b, t, c: (b + B, prev(t), 0)  # noqa: E731
    else:
        b_imap = lambda b, t, c: (b, prev(t), 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_rt + 1),
            in_specs=[
                pl.BlockSpec((1, rt, W), clamp_x, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rt, W), lambda b, t, c: (b, prev(t), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rt, W), b_imap, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rt, W),
                                   lambda b, t, c: (b, prev(t), 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rt, W), jnp.float32),
                pltpu.VMEM((RADIUS, W), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        interpret=pallas_env.interpret_default(interpret),
    )(centers.astype(jnp.float32), x, fore, back)
