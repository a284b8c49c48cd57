"""
Y-axis (row) halo sharding for the banded DWT passes — the workload's
sequence-parallel analog (SURVEY.md §5 "Long-context / sequence
parallelism"): when a plane is too large for one chip's HBM, its rows are
sharded across the mesh and each analysis/synthesis pass exchanges a halo
of boundary rows over ICI instead of gathering the plane.

Design (operator-slice formulation, consistent with the dense-banded MXU
path in ops/wavelets.py rather than a tap-loop translation):

- A global banded operator ``OP`` (analysis_operator / synthesis_operator)
  is split by OUTPUT rows across devices. Each device's row block touches a
  CONTIGUOUS input-row range [c0_d, c0_d + Wc) (bandedness + the symmetric
  fold staying within flen of the edges), precomputed on host.
- Each device assembles [prev device's bottom K rows | own rows | next
  device's top K rows] with two `ppermute`s (K = max halo over devices),
  dynamic-slices its window at c0_d, and runs ONE dense matmul with its
  operator slice — so the sharded pass is MXU work plus a K-row ICI
  exchange, not a re-layout.
- Global edge folding is already folded INTO the operator entries
  (ops/wavelets.py:_fold_symmetric), and every window stays inside [0, N),
  so the wrap-around garbage rows a circular ppermute delivers to the edge
  devices are never read.
- Coarse levels whose per-device coefficient rows would drop below the
  halo are computed REPLICATED (their bands are tiny — a few hundred KB —
  so the gather is noise next to the finest level's matmuls); the sharded
  finest levels carry ~94% of the FLOPs and all of the memory pressure.

Operator memory scaling (honest accounting): the sharded Y operators cost
O(H²/D) total across the mesh (each device holds a (M/D, H/D + 2K) slice).
The X axis is never sharded (each device's row shard runs its x-passes
locally, whole-width), and its operators are width-gated: below
``DESTRIPE_BANDED_X_MIN_W`` (default derived from a ~3 GiB operator-byte
budget, ~20k — a memory gate; the dense forms measured faster at every
width that fits HBM, see :func:`banded_x_min_w_default`) the levels use
the dense (W/2, W) matmul
operators and (w, 2w) notch matrices that the unsharded kernel uses —
bit-identical numerics, MXU-optimal at production widths —
while levels at or above it never build those O(W²) matrices at all:
analysis/synthesis run the blocked shift-invariant x-passes
(ops/wavelets.an_lo_pass_last / syn_lo_pass_last, O(flen) operator bytes)
and the notch runs spectrally (ops/fft_notch.apply_notch_fft, O(W log W)).
X-operator memory is therefore O(1) in plane width on the banded tier;
what remains scaling is the Y-operator slices (O(H²/D)) and the row
shards themselves.

:func:`destripe_y_sharded` runs the full production filter semantics on
this layout — multi-level, per-plane float16-sigmoid classifier, per-plane
Otsu thresholds, masked-median inpainting, delta synthesis, and the
flat-field / wrap epilogues (reference filtering.py:139-224 at level=None)
— and is selected automatically by ``runtime.pipeline.make_device_step``
when a plane exceeds ``DESTRIPE_HALO_THRESHOLD_BYTES`` (the production
1600x2000 planes are ~12.8 MB and shard over the plane axis instead).
Exactness is gated on the 8-device CPU mesh against the unsharded kernel
(tests/test_halo_sharding.py).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import fft_notch
from ..ops import pallas_band
from ..ops import pallas_env
from ..ops import wavelets as W
from ..ops.filter import (
    _PALLAS_MIN_PX,
    DestripePlan,
    _filter_level,
    classify_planes,
    normalize_flat_dark,
    wrap_cast,
)
from ..ops.otsu import otsu_from_counts, threshold_otsu_batch

__all__ = [
    "banded_apply_y_sharded",
    "banded_x_min_w_default",
    "dual_band_destripe_y_sharded",
    "dwt2_y_sharded",
    "idwt2_y_sharded",
    "destripe_y_sharded",
    "halo_constants",
]


def banded_x_min_w_default() -> int:
    """Plane width (samples) at which the halo kernel's x-axis operators
    switch from the dense matmul forms to the O(1)-operator-memory banded/
    spectral forms.

    The gate is a MEMORY gate, not a speed crossover: the on-chip sweep
    (benchmarks/kernel_sweep.py bandedx, v5e 2026-08-19) measured the
    dense forms FASTER at every width that fits — banded/dense wall ratio
    1.25x at W=2048, 1.38x at 4096, 1.60x at 8192, 1.84x at 16384 — the
    blocked shift-invariant x-passes and spectral notch never out-run the
    MXU's dense matmuls; their O(W^2) FLOP "waste" is cheaper than the
    banded tier's relayouts and rfft. (This falsified the round-3
    assumption of a FLOP-driven crossover by 8192.) What DOES scale with
    W^2 is operator bytes, so the default is DERIVED from an explicit
    operator-byte budget instead of a hard-coded width: a level of input
    width w carries ~6w^2 f32 bytes of dense x operators (an_x_lo
    (w/2, w) = 2w^2, syn_x_lo (w, w/2) = 2w^2, notch_cat (w/2, w) = 2w^2)
    and the coarser levels add a geometric ~4/3 tail, ~8w^2 total. The
    default budget ``DESTRIPE_DENSE_X_BUDGET_BYTES`` = 3 GiB yields a gate
    of ~20k: it admits the measured 16384 (~2.1 GB, dense 1.84x faster
    than banded) and bounds the *unmeasured* band above it at an explicit
    ~3 GB of HBM instead of letting widths up to 32768 build ~8.6 GB and
    OOM a 16 GB v5e. ``DESTRIPE_BANDED_X_MIN_W`` still overrides the
    derived gate directly."""
    env = os.environ.get("DESTRIPE_BANDED_X_MIN_W")
    if env is not None:
        return int(env)
    budget = int(
        os.environ.get("DESTRIPE_DENSE_X_BUDGET_BYTES", str(3 * 2**30))
    )
    # largest width whose ~8w^2-byte dense x-operator set fits the budget;
    # levels at or above gate = that width + 1 take the banded tier
    return int(np.sqrt(budget / 8.0)) + 1


class OpShards(NamedTuple):
    """Device-sharded form of one banded operator: the per-device operator
    slices plus the gather metadata. Arrays may be numpy (host planning) or
    jax (device arguments through a jit boundary)."""

    slices: jax.Array  # (D, Mq, Wc) per-device operator slice
    c0s: jax.Array  # (D,) input-column start of each device's window
    row_idx: jax.Array  # (M,) global gather dropping per-block pad rows


def _plan_op_shards(OP: np.ndarray, N: int, D: int):
    """Split a banded (M, N) operator into D row blocks; returns
    (OpShards-of-numpy, halo K, padded N).

    Output rows are assigned PROPORTIONALLY (device d gets rows
    [floor(d*M/D), floor((d+1)*M/D))), which keeps each block's input window
    aligned with the device's own input shard for any band slope (stride-2
    analysis, stride-1/2 synthesis) — an even ceil(M/D) split drifts by
    ~2 rows per device and the halo would grow with the device count."""
    OP = np.asarray(OP)
    if N % D:
        # pad input rows to a multiple of the mesh axis; the matching zero
        # operator columns keep the result exact
        N_pad = -(-N // D) * D
        OP = np.pad(OP, [(0, 0), (0, N_pad - N)])
        N = N_pad
    M = OP.shape[0]
    Nq = N // D
    r0 = [M * d // D for d in range(D + 1)]
    Mq = max(r0[d + 1] - r0[d] for d in range(D))

    starts, widths = [], []
    for d in range(D):
        rows = OP[r0[d] : r0[d + 1]]
        nz = np.nonzero(np.any(rows != 0.0, axis=0))[0]
        if len(nz):
            starts.append(int(nz[0]))
            widths.append(int(nz[-1]) + 1 - int(nz[0]))
        else:
            starts.append(min(d * Nq, N - 1))
            widths.append(1)
    Wc = min(max(widths), N)
    slices = np.zeros((D, Mq, Wc), OP.dtype)
    c0s = np.zeros((D,), np.int32)
    row_idx = np.concatenate(
        [np.arange(r0[d], r0[d + 1]) - r0[d] + d * Mq for d in range(D)]
    ).astype(np.int32)
    K = 0
    for d in range(D):
        c0 = max(0, min(starts[d], N - Wc))
        c0s[d] = c0
        rows = OP[r0[d] : r0[d + 1], c0 : c0 + Wc]
        slices[d, : rows.shape[0]] = rows
        K = max(K, d * Nq - c0, (c0 + Wc) - (d + 1) * Nq, 0)
    return OpShards(slices, c0s, row_idx), K, N


def _apply_shards(
    x: jax.Array,  # (B, N_pad, W), rows shardable over mesh[axis]
    shards: OpShards,
    halo: int,  # static: ppermute payload rows (>= planned K)
    mesh: Mesh,
    axis: str,
) -> jax.Array:
    """``OP @ x`` along the row axis from a precomputed shard plan: halo
    exchange + one dense per-shard matmul. Returns (B, M, W), row-sharded."""
    D = mesh.shape[axis]
    Nq = x.shape[1] // D
    fwd = [(i, (i + 1) % D) for i in range(D)]
    bwd = [(i, (i - 1) % D) for i in range(D)]

    def local(xl, op_l, c0_l):
        d = jax.lax.axis_index(axis)
        top = jax.lax.ppermute(xl[:, -halo:, :], axis, fwd)  # prev's bottom
        bot = jax.lax.ppermute(xl[:, :halo, :], axis, bwd)  # next's top
        assembled = jnp.concatenate([top, xl, bot], axis=1)
        # assembled covers global rows [d*Nq - halo, (d+1)*Nq + halo)
        start = c0_l[0] - (d * Nq - halo)
        win = jax.lax.dynamic_slice_in_dim(
            assembled, start, op_l.shape[-1], 1
        )
        return jnp.einsum("rw,bwx->brx", op_l[0], win, precision=W._PRECISION)

    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(axis, None, None), P(axis)),
        out_specs=P(None, axis, None),
        # the body's only collectives are the two explicit ppermutes and the
        # outputs are genuinely device-varying; vma tracking adds nothing
        check_vma=False,
    )(x, jnp.asarray(shards.slices), jnp.asarray(shards.c0s))
    # drop per-block padding rows (proportional blocks may be uneven)
    return out[:, jnp.asarray(shards.row_idx)]


def banded_apply_y_sharded(
    x: jax.Array,  # (B, N, W), shardable on axis 1
    OP: np.ndarray,  # (M, N) banded operator (numpy, host)
    mesh: Mesh,
    axis: str,
) -> jax.Array:
    """Compute ``OP @ x`` along the row axis with x row-sharded over
    ``mesh[axis]``, planning the operator shards on the fly (eager
    convenience; jitted callers precompute via :func:`halo_constants` so the
    operator slices enter as device arguments). Returns (B, M, W)."""
    D = mesh.shape[axis]
    N = x.shape[1]
    shards, K, N_pad = _plan_op_shards(OP, N, D)
    assert K <= N_pad // D, (
        f"halo {K} exceeds shard height {N_pad // D}: too many devices "
        f"for {N} rows"
    )
    if N_pad != N:
        x = jnp.pad(x, [(0, 0), (0, N_pad - N), (0, 0)])
    return _apply_shards(x, shards, max(K, 1), mesh, axis)


def dwt2_y_sharded(
    x: jax.Array, wavelet_name: str, mesh: Mesh, axis: str = "z"
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
    """One 2-D analysis level with the Y (row) axis sharded over the mesh:
    sharded y-pass via halo exchange, then the x-pass locally per shard
    (columns are never sharded — the FFT/notch axis stays on-chip).
    Matches ops/wavelets.dwt2 on gathered output."""
    B, H, Wd = x.shape
    wav = W.wavelet(wavelet_name)
    A_y = W.analysis_operator(H, wav.name)
    L_y = A_y.shape[0] // 2
    lo_y = banded_apply_y_sharded(x, A_y[:L_y], mesh, axis)
    hi_y = banded_apply_y_sharded(x, A_y[L_y:], mesh, axis)

    A_x = W.analysis_operator(Wd, wav.name)
    L_x = A_x.shape[0] // 2
    P_ = W._PRECISION
    ca = jnp.einsum("bhw,iw->bhi", lo_y, A_x[:L_x], precision=P_)
    cv = jnp.einsum("bhw,iw->bhi", lo_y, A_x[L_x:], precision=P_)
    ch = jnp.einsum("bhw,iw->bhi", hi_y, A_x[:L_x], precision=P_)
    cd = jnp.einsum("bhw,iw->bhi", hi_y, A_x[L_x:], precision=P_)
    return ca, (ch, cv, cd)


def idwt2_y_sharded(
    ca: jax.Array,
    details: Tuple[jax.Array, jax.Array, jax.Array],
    wavelet_name: str,
    mesh: Mesh,
    axis: str = "z",
    out_shape: Tuple[int, int] = None,
) -> jax.Array:
    """Inverse of :func:`dwt2_y_sharded` (one level): local x-synthesis per
    shard, then the y-synthesis as two halo-sharded banded applications
    (lowpass and highpass halves of the synthesis operator)."""
    ch, cv, cd = details
    B, L_yc, L_xc = ca.shape
    wav = W.wavelet(wavelet_name)

    S_x = W.synthesis_operator(L_xc, wav.name)  # (out_w, 2L_x)
    if out_shape is not None:
        S_x = S_x[: out_shape[1]]
    P_ = W._PRECISION
    lo_y = jnp.einsum(
        "bhw,ow->bho", jnp.concatenate([ca, cv], axis=-1), S_x, precision=P_
    )
    hi_y = jnp.einsum(
        "bhw,ow->bho", jnp.concatenate([ch, cd], axis=-1), S_x, precision=P_
    )

    S_y = W.synthesis_operator(L_yc, wav.name)  # (out_h, 2L_y)
    if out_shape is not None:
        S_y = S_y[: out_shape[0]]
    out = banded_apply_y_sharded(lo_y, S_y[:, :L_yc], mesh, axis)
    out = out + banded_apply_y_sharded(hi_y, S_y[:, L_yc:], mesh, axis)
    return out


# ---------------------------------------------------------------------------
# Production filter on the Y-sharded layout
# ---------------------------------------------------------------------------


def _plan_x_blocks(plan: DestripePlan):
    """Blocked banded x-axis operators for the per-shard Pallas tier of
    :func:`destripe_y_sharded` — the round-5 lever for the beyond-HBM halo
    route (ROADMAP round-4 decision tree item 2): x-passes are row-local,
    so each row shard can run the SAME blocked banded-operator kernels the
    plane path uses (ops/pallas_band.py K1/K4) instead of the dense
    O(W^2)-FLOP x matmuls that dominate the dense tier at 4k-16k widths.
    Operator memory is O(W) (a few MB at 16k vs ~540 MB dense f32), and the
    kernels chunk themselves over output columns to fit scoped VMEM
    (pallas_band.an_x_lowpass_chunked / syn_x_exp_chunked).

    Returns ``((k1_arrays, k4_arrays), (k1_static, k4_static))``: K1 keyed
    by analysis level (finest first), K4 by synthesis index (coarsest
    first). Levels too narrow for the window formulas (or whose band
    escapes the closed-form windows — blocked_operator verifies coverage
    exactly) are simply absent and fall back to the dense einsum."""
    wav = W.wavelet(plan.wavelet)
    rup = lambda a, b: -(-a // b) * b  # noqa: E731
    cdiv = lambda a, b: -(-a // b)  # noqa: E731
    split = pallas_band.split_bf16_np
    k1_arrays, k1_static = {}, {}
    k4_arrays, k4_static = {}, {}
    w_cur = plan.width
    for lvl in range(plan.n_levels):
        L_w = plan.ladder[-1 - lvl][1]
        smax = rup(w_cur, 128) - 384
        if smax >= 0 and w_cur >= 560:
            try:
                starts = pallas_band.window_starts(
                    cdiv(L_w, 128), 256, 128, smax
                )
                A = W.analysis_operator(w_cur, wav.name)
                k1_arrays[lvl] = split(pallas_band.blocked_operator(
                    A[:L_w], 128, 384, starts
                ))
                k1_static[lvl] = {"starts": starts, "out_w": L_w}
            except ValueError:  # band wider than the window: dense fallback
                pass
        w_cur = L_w
    for i in range(plan.n_levels):
        L_x = plan.ladder[i][1]
        tw = plan.ladder[i + 1][1] if i + 1 < plan.n_levels else plan.width
        smax = rup(L_x, 128) - 384
        if smax >= 0 and tw >= 560:
            try:
                starts = pallas_band.window_starts(
                    cdiv(tw, 256), 128, 128, smax
                )
                S = W.synthesis_operator(L_x, wav.name)[:tw, :L_x]
                k4_arrays[i] = split(pallas_band.blocked_operator(
                    S, 256, 384, starts
                ))
                k4_static[i] = {"starts": starts, "out_w": tw}
            except ValueError:
                pass
    return (k1_arrays, k4_arrays), (k1_static, k4_static)


def halo_constants(plan: DestripePlan, n_devices: int,
                   x_blocks: Optional[bool] = None,
                   notch_blocks: Optional[bool] = None):
    """Host-side shard planning for :func:`destripe_y_sharded` at one
    geometry/mesh size: per level, the OpShards of the analysis y lo/hi and
    synthesis y lo/hi operators. With ``x_blocks`` (default: auto — when
    the Pallas kernels can run here) the pytrees also carry the blocked
    banded x operators of the per-shard Pallas tier under the string keys
    ``"xk1"``/``"xk4"`` (:func:`_plan_x_blocks`); the integer keys stay the
    per-level y shard plans. Returns ``(arrays, static)``:

    - ``arrays``: a pytree of numpy arrays — pass it THROUGH the jit
      boundary as an argument (device-resident), like ``plan.constants()``;
      at beyond-HBM geometry the summed slices are ~1/D of the dense
      operators, the dominant operand.
    - ``static``: per-level python metadata (halo rows, padded input rows,
      whether the level runs sharded at all) — close over it at trace time;
      it sizes the ppermute payloads so it must stay static.

    A level runs sharded only when every one of its four operators' halos
    fits inside one device's row shard; coarser levels fall back to
    replicated compute (their bands are tiny)."""
    # banded_x_min_w=1: only the Y operators are read here — never build
    # the O(W^2) dense x/notch matrices just to plan row shards
    dense = plan.constants(dense_only=True, banded_x_min_w=1)
    D = int(n_devices)
    arrays: dict = {}
    static: dict = {}
    for lvl in range(plan.n_levels):
        an_y = dense["an_y"][lvl]
        syn_y = dense["syn_y"][plan.n_levels - 1 - lvl]  # same level, syn order
        L_h = an_y.shape[0] // 2
        N_in = an_y.shape[1]
        ops = {
            "an_lo": (an_y[:L_h], N_in),
            "an_hi": (an_y[L_h:], N_in),
            "syn_lo": (syn_y[:, : syn_y.shape[1] // 2], syn_y.shape[1] // 2),
            "syn_hi": (syn_y[:, syn_y.shape[1] // 2 :], syn_y.shape[1] // 2),
        }
        lvl_arrays, lvl_static, feasible = {}, {}, True
        for name, (OP, N) in ops.items():
            shards, K, N_pad = _plan_op_shards(OP, N, D)
            if K > N_pad // D:
                feasible = False
                break
            lvl_arrays[name] = shards
            lvl_static[name] = {"halo": max(K, 1), "n_pad": N_pad}
        if not feasible:
            # coarser operators only shrink further: every deeper level is
            # replicated too, so stop planning here
            static[lvl] = None
            break
        # STRING keys: the arrays pytree crosses jit/device_put boundaries,
        # and tree flattening cannot sort mixed int/str dict keys once the
        # "xk1"/"xk4" groups join the per-level y plans
        arrays[str(lvl)] = lvl_arrays
        static[lvl] = lvl_static
    if x_blocks is None:
        x_blocks = pallas_env.enabled()
    if x_blocks:
        (a1, a4), (s1, s4) = _plan_x_blocks(plan)
        if a1:
            arrays["xk1"] = {str(k): v for k, v in a1.items()}
            static["xk1"] = s1
        if a4:
            arrays["xk4"] = {str(k): v for k, v in a4.items()}
            static["xk4"] = s4
        # Stacked per-plane-selectable notch operator banks for the chunked
        # scalar-prefetch kernel (ops/pallas_notch.notch_select_chunked):
        # HALF the notch FLOPs + operator traffic of the dense
        # compute-both-bands matmul — the single largest sync op of the
        # halo step (3.77 ms of 16.56 at W=8192 B=4, ROADMAP round-5
        # session 5). Built per coarsest-first level where the band clears
        # the Pallas pay-off gate AND the level is below the dense-x memory
        # gate (width-gated levels keep the spectral notch: the stacked
        # bank costs the same O(w^2) HBM bytes the gate exists to bound).
        # Dual mode never reads these (its static band split already
        # multiplies one operator per half) — dual callers pass
        # ``notch_blocks=False`` so the banks don't ride device memory.
        if notch_blocks is None:
            notch_blocks = True
        from ..ops import pallas_notch

        gate = banded_x_min_w_default()
        wav_n = W.wavelet(plan.wavelet)
        w_in = []
        w_cur = plan.width
        for _ in range(plan.n_levels):
            w_in.append(w_cur)
            w_cur = W.dwt_coeff_len(w_cur, wav_n.flen)
        skip = [
            not (
                notch_blocks
                and lh * lw >= _PALLAS_MIN_PX
                and w_in[plan.n_levels - 1 - i] < gate
            )
            for i, (lh, lw) in enumerate(plan.ladder)
        ]
        if not all(skip):
            nb_arrays, nb_static = {}, {}
            for i, pair in enumerate(plan.notch_matrices(skip=skip)):
                if pair is None:
                    continue
                nb_arrays[str(i)] = pallas_notch.stacked_notch_operators(
                    *pair
                )
                nb_static[i] = {"w": plan.ladder[i][1]}
            arrays["notch"] = nb_arrays
            static["notch"] = nb_static
    return arrays, static


def _apply_planned(x, arrs, meta, mesh, axis):
    n_pad = meta["n_pad"]
    if x.shape[1] != n_pad:
        x = jnp.pad(x, [(0, 0), (0, n_pad - x.shape[1]), (0, 0)])
    return _apply_shards(x, OpShards(*arrs), meta["halo"], mesh, axis)


def _apply_planned_pair(x, arrs, meta, mesh, axis):
    """The analysis lo/hi y-passes consume the SAME input rows, so one
    halo exchange serves both: a single ppermute pair and ONE assembled
    window (the concatenate materializes a full copy of the local shard —
    the dominant per-pass HBM cost at halo geometry) feed two operator
    matmuls. Bit-identical to two :func:`_apply_shards` calls: the shared
    halo is the max of the two plans' halos, and each operator still
    dynamic-slices its own exact window out of the assembled rows.
    Returns ``(lo, hi)``."""
    n_pad = meta["an_lo"]["n_pad"]
    if x.shape[1] != n_pad:
        x = jnp.pad(x, [(0, 0), (0, n_pad - x.shape[1]), (0, 0)])
    sh_lo = OpShards(*arrs["an_lo"])
    sh_hi = OpShards(*arrs["an_hi"])
    halo = max(meta["an_lo"]["halo"], meta["an_hi"]["halo"])
    D = mesh.shape[axis]
    Nq = x.shape[1] // D
    fwd = [(i, (i + 1) % D) for i in range(D)]
    bwd = [(i, (i - 1) % D) for i in range(D)]

    def local(xl, lo_op, lo_c0, hi_op, hi_c0):
        d = jax.lax.axis_index(axis)
        top = jax.lax.ppermute(xl[:, -halo:, :], axis, fwd)
        bot = jax.lax.ppermute(xl[:, :halo, :], axis, bwd)
        assembled = jnp.concatenate([top, xl, bot], axis=1)
        base = d * Nq - halo
        outs = []
        for op_l, c0_l in ((lo_op, lo_c0), (hi_op, hi_c0)):
            win = jax.lax.dynamic_slice_in_dim(
                assembled, c0_l[0] - base, op_l.shape[-1], 1
            )
            outs.append(jnp.einsum(
                "rw,bwx->brx", op_l[0], win, precision=W._PRECISION
            ))
        return tuple(outs)

    lo, hi = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(axis, None, None), P(axis),
                  P(axis, None, None), P(axis)),
        out_specs=(P(None, axis, None), P(None, axis, None)),
        check_vma=False,
    )(x, jnp.asarray(sh_lo.slices), jnp.asarray(sh_lo.c0s),
      jnp.asarray(sh_hi.slices), jnp.asarray(sh_hi.c0s))
    return (lo[:, jnp.asarray(sh_lo.row_idx)],
            hi[:, jnp.asarray(sh_hi.row_idx)])


# ---------------------------------------------------------------------------
# Per-shard Pallas tier: row-local kernels inside shard_map, per-plane
# statistics psum'd outside (ROADMAP round-4 decision tree item 2)
# ---------------------------------------------------------------------------


def _pad_rows_mult(a: jax.Array, mult: int, value=0) -> jax.Array:
    """Zero-pad (by default) the ROW axis (1 for 3-D, 0 for 2-D) up to a
    multiple of ``mult`` — shard_map requires evenly divisible sharded
    extents. Row-local kernels map pad rows to pad output rows (cropped or
    sliced away by the caller), and the y shard plans carry matching zero
    operator columns, so the padding never reaches real outputs."""
    ax = 1 if a.ndim == 3 else 0
    h = a.shape[ax]
    hp = -(-h // mult) * mult
    if hp == h:
        return a
    pad = [(0, 0)] * a.ndim
    pad[ax] = (0, hp - h)
    return jnp.pad(a, pad, constant_values=value)


def _k1_sharded(a, blocks, meta, mesh, axis, log1p):
    """Per-shard blocked banded analysis x-pass (pallas_band K1, chunked):
    rows sharded over the mesh, no collectives (the contraction is over
    lanes). Input rows must already be a mesh multiple."""
    bh, bl = jnp.asarray(blocks[0]), jnp.asarray(blocks[1])

    def local(al, bhl, bll):
        return pallas_band.an_x_lowpass_chunked(
            al, (bhl, bll), meta["starts"], meta["out_w"], log1p=log1p
        )

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=P(None, axis, None), check_vma=False,
    )(a, bh, bl)


def _k4_sharded(stacked, images, blocks, meta, mesh, axis,
                flat=None, dark=None, wrap=False):
    """Per-shard blocked banded synthesis x-pass (pallas_band K4, chunked),
    optionally fused with the exp / flat-field / wrap epilogue. All inputs
    row-sharded (flat/dark over their leading axis); rows must already be
    mesh multiples."""
    bh, bl = jnp.asarray(blocks[0]), jnp.asarray(blocks[1])
    with_img = images is not None
    with_flat = flat is not None
    args = [stacked, bh, bl]
    specs = [P(None, axis, None), P(), P()]
    if with_img:
        args.append(images)
        specs.append(P(None, axis, None))
    if with_flat:
        args += [flat, dark]
        specs += [P(axis, None), P(axis, None)]

    def local(st, bhl, bll, *rest):
        img = rest[0] if with_img else None
        fl, dk = (rest[-2], rest[-1]) if with_flat else (None, None)
        return pallas_band.syn_x_exp_chunked(
            st, img, (bhl, bll), meta["starts"], meta["out_w"],
            flat=fl, dark=dk, wrap=wrap,
        )

    return shard_map(
        local, mesh=mesh, in_specs=tuple(specs),
        out_specs=P(None, axis, None), check_vma=False,
    )(*args)


def _otsu_sharded(ch: jax.Array, mesh: Mesh, axis: str,
                  square: bool = True) -> jax.Array:
    """Per-plane Otsu thresholds (``square=True``: over ``ch**2``, squared
    in-kernel with the bin range from the |ch| extrema — the filter's Otsu
    input; ``square=False``: over the values — the dual blend's Otsu) with
    the band's rows sharded: shard-local extrema -> pmin/pmax (exact: the
    min of minima IS the global min), shard-local Pallas 256-bin histograms
    with the mesh-divisibility pad rows excluded by a dynamic row bound ->
    psum, then the shared threshold tail (ops/otsu.otsu_from_counts)
    replicated. Binning is bit-identical to the unsharded kernel; the
    count psum adds D shard partials (each exact below 2^24) instead of
    the grid's sequential accumulation — at least as accurate, and Otsu
    bin effects of f32 count rounding at >16 MPix bands are the
    already-documented cross-formulation mechanism."""
    from ..ops.pallas_hist import histogram256_batch

    D = mesh.shape[axis]
    rows_valid = ch.shape[1]
    ch_p = _pad_rows_mult(ch, D)

    def local(chl):
        d = jax.lax.axis_index(axis)
        hl = chl.shape[1]
        nvalid = jnp.clip(rows_valid - d * hl, 0, hl)
        row = jax.lax.broadcasted_iota(jnp.int32, chl.shape, 1)
        valid = row < nvalid
        a = jnp.abs(chl) if square else chl
        lo_a = jax.lax.pmin(
            jnp.min(jnp.where(valid, a, jnp.inf), axis=(1, 2)), axis
        )
        hi_a = jax.lax.pmax(
            jnp.max(jnp.where(valid, a, -jnp.inf), axis=(1, 2)), axis
        )
        if square:
            lo, hi = lo_a * lo_a, hi_a * hi_a
        else:
            lo, hi = lo_a, hi_a
        span = hi - lo
        safe_span = jnp.where(span > 0, span, 1.0)
        counts = histogram256_batch(
            chl, lo, safe_span, square=square,
            row_bound=jnp.reshape(nvalid, (1,)),
        )
        counts = jax.lax.psum(counts, axis)
        return otsu_from_counts(counts, lo, hi)

    return shard_map(
        local, mesh=mesh, in_specs=(P(None, axis, None),),
        out_specs=P(), check_vma=False,
    )(ch_p)


def _notch_sharded(inpainted: jax.Array, sel_idx: jax.Array, blocks,
                   mesh: Mesh, axis: str) -> jax.Array:
    """Row-sharded per-plane-selected notch product
    (pallas_notch.notch_select_chunked): the contraction is over lanes, so
    shards need no collectives; mesh-divisibility pad rows map to garbage
    output rows that are cropped here. Each plane multiplies only its own
    operator bank (scalar-prefetch selection) — half the MXU FLOPs and
    operator HBM traffic of the dense compute-both-bands matmul this
    replaces."""
    from ..ops import pallas_notch

    bh, bl = jnp.asarray(blocks[0]), jnp.asarray(blocks[1])
    D = mesh.shape[axis]
    rows = inpainted.shape[1]
    x_p = _pad_rows_mult(inpainted, D)

    def local(xl, bhl, bll, sel_l):
        return pallas_notch.notch_select_chunked(xl, sel_l, (bhl, bll))

    out = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P(), P()),
        out_specs=P(None, axis, None), check_vma=False,
    )(x_p, bh, bl, sel_idx)
    return out[:, :rows]


def _median_sharded(ch: jax.Array, thr: jax.Array, mesh: Mesh,
                    axis: str) -> jax.Array:
    """Row-sharded masked inpainting medians (pallas_median radix
    bisection): the median is row-local, so shards need no collectives;
    pad rows produce garbage medians in their own (cropped) rows."""
    from ..ops.pallas_median import row_median_masked

    D = mesh.shape[axis]
    rows = ch.shape[1]
    ch_p = _pad_rows_mult(ch, D)

    def local(chl, thr_l):
        return row_median_masked(chl, thr_l)

    out = shard_map(
        local, mesh=mesh, in_specs=(P(None, axis, None), P()),
        out_specs=P(None, axis, None), check_vma=False,
    )(ch_p, thr)
    return out[:, :rows]


def destripe_y_sharded(
    x: jax.Array,  # (B, H, W) uint16/float, rows shardable over the mesh
    mesh: Mesh,
    plan: DestripePlan,
    consts=None,  # plan.constants(dense_only=True) pytree (device arg)
    halo_arrays=None,  # halo_constants arrays pytree (device arg)
    halo_static=None,  # halo_constants static dict (trace-time)
    *,
    axis: str = "z",
    microscope_high_int: float = 2700.0,
    flat: Optional[jax.Array] = None,
    dark: Optional[jax.Array] = None,
    wrap: bool = False,
    banded_x_min_w: Optional[int] = None,
    dual: bool = False,
) -> jax.Array:
    """Full-semantics destripe with the ROW axis sharded over the mesh
    (reference filtering.py:139-224): per-plane float16-sigmoid classifier,
    multi-level analysis (sharded y-passes via halo exchange, local
    x-passes), per-plane Otsu + masked-median inpainting + notch filtering
    of every cH band, delta synthesis, and the flat-field / wrap epilogue.
    Matches ``destripe_batch`` on gathered output (<= 1 uint16 LSB; XLA
    vectorizes reductions differently per shard extent).

    For planes that exceed a single chip's memory — the production path
    shards over planes instead (runtime/pipeline.py) and selects this one
    above ``DESTRIPE_HALO_THRESHOLD_BYTES``. Levels whose coefficient rows
    no longer cover the halo run replicated (see :func:`halo_constants`);
    the filter math is the dense XLA formulation (no Pallas programs —
    those assume whole-plane blocks in one chip's VMEM). Levels at or
    above ``banded_x_min_w`` (default :func:`banded_x_min_w_default`) run
    their x-passes in the banded/spectral O(1)-operator-memory forms —
    the dense x operators for those levels are never built (``consts``
    carries ``None`` there; see module docstring).

    ``dual=True`` mirrors ``destripe_batch(dual=True)`` on the sharded
    layout: the classifier is skipped, analysis / per-plane Otsu /
    inpainting statistics run once per plane, only the notch products and
    delta synthesis double, and the result is the raw ``(2B, H, W)``
    float32 band pair (``[:B]`` = cells/foreground config, ``[B:]`` =
    no-cells/background); epilogues are disallowed — blend first
    (:func:`dual_band_destripe_y_sharded`)."""
    if x.shape[-2:] != (plan.height, plan.width):
        # _apply_planned silently zero-pads a short row axis up to its
        # planned shard length, which would fold zeros into the bottom
        # boundary coefficients instead of erroring like destripe_batch
        raise ValueError(
            f"plan geometry {(plan.height, plan.width)} != data "
            f"{x.shape[-2:]}"
        )
    if flat is not None and wrap:
        raise ValueError("flat-field and wrap epilogues are exclusive")
    if dual and (flat is not None or dark is not None or wrap):
        raise ValueError(
            "dual mode returns both float32 bands; blend them before "
            "applying a flat-field or wrap epilogue"
        )
    if consts is None:
        if banded_x_min_w is None:
            banded_x_min_w = banded_x_min_w_default()
        consts = plan.constants(dense_only=True, banded_x_min_w=banded_x_min_w)
    if halo_static is None:
        halo_arrays, halo_static = halo_constants(plan, mesh.shape[axis])
    flat, dark = normalize_flat_dark(plan.height, plan.width, flat, dark)
    # follow wavelets._PRECISION (default HIGH) so a set_matmul_precision
    # override applies to EVERY matmul in this kernel, not just the sharded
    # y-passes/_apply_shards and blocked x-passes that already honor it —
    # a half-applied override would break the halo-vs-dense parity gates
    P_ = W._PRECISION

    # --- per-shard Pallas tier gate (ROADMAP round-4 decision item 2) ---
    # When the Pallas kernels can run, the row-local hot work runs INSIDE
    # shard_map on each row shard: blocked banded x-passes (K1/K4, chunked
    # for scoped VMEM at 8k-16k+ widths), Pallas Otsu histograms and masked
    # inpainting medians; per-plane statistics are psum'd across shards.
    # The dense-XLA formulation below remains the fallback (CPU tests, the
    # DESTRIPE_HALO_PALLAS=0 kill switch) and the parity reference.
    use_px = (
        pallas_env.enabled()
        and os.environ.get("DESTRIPE_HALO_PALLAS", "1") != "0"
    )
    k1s = (halo_static.get("xk1") if use_px else None) or {}
    k4s = (halo_static.get("xk4") if use_px else None) or {}
    fin = plan.n_levels - 1
    # fully-fused IO: level-0 K1 ingests the raw planes (log1p fused) and
    # the finest K4 fuses exp + the epilogue — log1p(x) is never
    # materialized in HBM (two full-plane round trips saved)
    fuse_io = plan.n_levels > 0 and 0 in k1s and fin in k4s
    D_mesh = mesh.shape[axis]

    xf = x.astype(jnp.float32)
    B0 = x.shape[0]
    if plan.n_levels == 0:
        out0 = jnp.exp(jnp.log(1.0 + xf)) + 1.0
        if dual:
            out0 = jnp.concatenate([out0, out0], axis=0)
    else:
        xlog = None if fuse_io else jnp.log(1.0 + xf)
        if dual:
            # both configs on every plane, selected by batch half (same
            # contract as destripe_batch: first half = cells slot)
            is_cells = jnp.arange(2 * B0) < B0
        else:
            is_cells = classify_planes(xf, microscope_high_int)

        def y_apply(a, lvl, which):
            meta = halo_static.get(lvl)
            if meta is not None:
                return _apply_planned(
                    a, halo_arrays[str(lvl)][which], meta[which], mesh, axis
                )
            # replicated coarse level: dense einsum on the (tiny) band
            an_y = jnp.asarray(consts["an_y"][lvl])
            syn_y = jnp.asarray(consts["syn_y"][plan.n_levels - 1 - lvl])
            L_h = an_y.shape[0] // 2
            OP = {
                "an_lo": an_y[:L_h],
                "an_hi": an_y[L_h:],
                "syn_lo": syn_y[:, : syn_y.shape[1] // 2],
                "syn_hi": syn_y[:, syn_y.shape[1] // 2 :],
            }[which]
            return jnp.einsum("ih,bhw->biw", OP, a, precision=P_)

        # analysis, finest -> coarsest (x-lowpass first: it halves the width
        # while the y-pass expands it — same order as destripe_batch). The
        # Pallas tier runs the blocked banded K1 per row shard (x-passes
        # are row-local: no collectives); levels whose dense x operator was
        # width-gated away (None) use the blocked shift-invariant lowpass
        # pass instead (O(flen) operator).
        wav_obj = W.wavelet(plan.wavelet)
        chs = []
        a = x if fuse_io else xlog
        for lvl in range(plan.n_levels):
            xk1 = k1s.get(lvl)
            an_x_lo = consts["an_x_lo"][lvl]
            if xk1 is not None:
                a_p = _pad_rows_mult(a, D_mesh)
                lox_w = _k1_sharded(
                    a_p, halo_arrays["xk1"][str(lvl)], xk1, mesh, axis,
                    log1p=(fuse_io and lvl == 0),
                )
                if (halo_static.get(lvl) is None
                        and lox_w.shape[1] != a.shape[1]):
                    # replicated coarse y level: the dense einsum needs the
                    # exact row extent (sharded levels re-pad to the same
                    # mesh multiple anyway, so they keep the padded rows)
                    lox_w = lox_w[:, : a.shape[1]]
            elif an_x_lo is None:
                lox_w = W.an_lo_pass_last(a, wav_obj)
            else:
                lox_w = jnp.einsum(
                    "bhw,jw->bhj", a, jnp.asarray(an_x_lo), precision=P_
                )
            meta_y = halo_static.get(lvl)
            if meta_y is not None:
                # sharded level: ONE halo exchange + assembled window
                # serves both analysis y-passes (bit-identical to two)
                a, hi_b = _apply_planned_pair(
                    lox_w, halo_arrays[str(lvl)], meta_y, mesh, axis
                )
                chs.append(hi_b)
            else:
                chs.append(y_apply(lox_w, lvl, "an_hi"))
                a = y_apply(lox_w, lvl, "an_lo")

        # filter every cH band, coarsest first. On the Pallas tier the
        # per-plane Otsu runs as psum'd shard-local Pallas histograms and
        # the inpainting medians as the row-local Pallas radix bisection
        # (the where-formulation — identical numerics to the plane path's
        # fused kernel); the notch product stays a row-sharded XLA matmul
        # (GSPMD: lane contraction, no collectives). Small levels and the
        # dense fallback keep the exact dense formulation. Width-gated
        # levels (notch matrix None) apply the identical packed-gain
        # spectral map via rfft instead of the O(w^2) matmul operator.
        sigmas = plan.notch_sigmas()
        deltas = []
        HI = jax.lax.Precision.HIGH  # _filter_level's notch precision
        # per-plane-selected chunked notch banks (single-band only: the
        # dual path's static band split already multiplies one operator
        # per half). Keyed by the same coarsest-first level index j.
        nb_group = (halo_arrays.get("notch") or {}) if use_px else {}
        for j, (ch, bm_cat) in enumerate(
            zip(reversed(chs), consts["notch_cat"])
        ):
            if bm_cat is None:
                sig_c, sig_n = sigmas[j]

                def notch_apply(rows, _sc=sig_c, _sn=sig_n):
                    return jnp.concatenate(
                        [
                            fft_notch.apply_notch_fft(rows, _sc),
                            fft_notch.apply_notch_fft(rows, _sn),
                        ],
                        axis=-1,
                    )

                bm_dev = None
            else:
                notch_apply = None
                bm_dev = jnp.asarray(bm_cat)
            big = (
                use_px
                and ch.dtype == jnp.float32
                and ch.shape[-2] * ch.shape[-1] >= _PALLAS_MIN_PX
            )
            if big:
                otsu1 = jnp.sqrt(_otsu_sharded(ch, mesh, axis, square=True))
                w_b = ch.shape[-1]
                if dual:
                    # ONE Otsu per input plane shared by both bands,
                    # tiled to the doubled batch (same contract as
                    # destripe_batch's dual path)
                    otsu_sqrt = jnp.tile(otsu1, 2)
                    ch = jnp.concatenate([ch, ch], axis=0)
                else:
                    otsu_sqrt = otsu1
                max_thr = jnp.where(
                    is_cells,
                    plan.cells.max_threshold,
                    plan.no_cells.max_threshold,
                )
                threshold = jnp.minimum(max_thr, otsu_sqrt)
                med = _median_sharded(ch, threshold, mesh, axis)
                # sqrt(ch*ch), not |ch|: the reference's rounded compare
                stripes = jnp.sqrt(ch * ch) > threshold[:, None, None]
                inpainted = jnp.where(stripes, med, ch)
                if not dual and str(j) in nb_group:
                    # chunked per-plane operator selection (half the notch
                    # FLOPs of the dense both-bands product below)
                    sel = jnp.where(is_cells, 0, 1).astype(jnp.int32)
                    filtered = _notch_sharded(
                        inpainted, sel, nb_group[str(j)], mesh, axis
                    )
                elif bm_dev is None:
                    both = notch_apply(inpainted)
                    filtered = jnp.where(
                        is_cells[:, None, None],
                        both[..., :w_b], both[..., w_b:],
                    )
                elif dual:
                    # the band split is STATIC in dual mode (first half =
                    # cells), so each half multiplies only its own
                    # operator — half the notch FLOPs of the
                    # compute-both-then-select dense formulation
                    filtered = jnp.concatenate([
                        jnp.matmul(
                            inpainted[:B0], bm_dev[:, :w_b], precision=HI
                        ),
                        jnp.matmul(
                            inpainted[B0:], bm_dev[:, w_b:], precision=HI
                        ),
                    ], axis=0)
                else:
                    both = jnp.matmul(inpainted, bm_dev, precision=HI)
                    filtered = jnp.where(
                        is_cells[:, None, None],
                        both[..., :w_b], both[..., w_b:],
                    )
                deltas.append(jnp.where(stripes, 0.0, filtered - ch))
                continue
            if dual:
                # ONE Otsu per input plane shared by both bands (the
                # stripe threshold depends only on the coefficients, not
                # the sigma), tiled to the doubled batch — identical
                # numerics to destripe_batch's dense dual path
                otsu_sqrt = jnp.tile(
                    jnp.sqrt(threshold_otsu_batch(ch * ch, pallas=False)), 2
                )
                ch = jnp.concatenate([ch, ch], axis=0)
            else:
                otsu_sqrt = None
            deltas.append(
                _filter_level(
                    ch,
                    is_cells,
                    bm_dev,
                    plan.cells.max_threshold,
                    plan.no_cells.max_threshold,
                    otsu_sqrt=otsu_sqrt,
                    pallas=False,
                    notch_apply=notch_apply,
                )
                - ch
            )

        # delta synthesis, coarsest -> finest. The Pallas tier runs the
        # blocked banded K4 per row shard; at the finest level (fuse_io)
        # the kernel fuses exp + the flat-field / wrap epilogue against the
        # raw planes and the function returns from inside the loop.
        corr = None
        for i, delta in enumerate(deltas):
            lvl = plan.n_levels - 1 - i
            L_h = consts["an_y"][lvl].shape[0] // 2
            stacked = y_apply(delta, lvl, "syn_hi")
            if corr is not None:
                stacked = stacked + y_apply(corr[:, :L_h, :], lvl, "syn_lo")
            xk4 = k4s.get(i)
            if xk4 is not None:
                st_p = _pad_rows_mult(stacked, D_mesh)
                blocks4 = halo_arrays["xk4"][str(i)]
                if i == fin and fuse_io:
                    imgs_p = _pad_rows_mult(x, D_mesh)
                    if flat is not None:
                        # pad flat with ones / dark with zeros: the pad
                        # rows' outputs are cropped, but 0/0 NaNs in them
                        # would trip debug nan checks
                        out_u16 = _k4_sharded(
                            st_p, imgs_p, blocks4, xk4, mesh, axis,
                            flat=_pad_rows_mult(flat, D_mesh, value=1.0),
                            dark=_pad_rows_mult(dark, D_mesh),
                        )
                        return out_u16[:, : plan.height]
                    out_f = _k4_sharded(
                        st_p, imgs_p, blocks4, xk4, mesh, axis, wrap=wrap,
                    )
                    # wrap=True: fused uint16 wrap cast; otherwise the raw
                    # exp(log1p(x) + corr) + 1.0 float32 planes (the dual
                    # bands and the bare-f32 contract)
                    return out_f[:, : plan.height]
                corr = _k4_sharded(st_p, None, blocks4, xk4, mesh, axis)
                if i == fin:
                    # finest level reached without the fused ingest (xlog
                    # was materialized): crop the mesh padding back off
                    corr = corr[:, : plan.height]
                # non-final levels keep the padded rows: the next stacking
                # slices corr[:, :L_h] off the front anyway
                continue
            syn_x_lo = consts["syn_x_lo"][i]
            if syn_x_lo is None:
                tw = (
                    plan.ladder[i + 1][1]
                    if i + 1 < plan.n_levels
                    else plan.width
                )
                corr = W.syn_lo_pass_last(stacked, wav_obj, tw)
            else:
                corr = jnp.einsum(
                    "biw,jw->bij", stacked, jnp.asarray(syn_x_lo),
                    precision=P_,
                )
        if dual:
            # both bands' corrections apply to the same log-space input
            xlog = jnp.concatenate([xlog, xlog], axis=0)
        out0 = jnp.exp(xlog + corr) + 1.0

    if flat is not None:
        from ..ops.flatfield import flatfield_correction

        return flatfield_correction(out0, flat, dark)
    if wrap:
        return wrap_cast(out0)
    return out0


def dual_band_destripe_y_sharded(
    x: jax.Array,  # (B, H, W) uint16/float, rows shardable over the mesh
    mesh: Mesh,
    plan: DestripePlan,
    consts=None,
    halo_arrays=None,
    halo_static=None,
    *,
    axis: str = "z",
    crossover: float = 100.0,
    threshold: float = -1.0,
    smooth_radius: int = 8,
    flat: Optional[jax.Array] = None,
    dark: Optional[jax.Array] = None,
    wrap: bool = False,
    banded_x_min_w: Optional[int] = None,
) -> jax.Array:
    """Dual-band destripe (BASELINE config 2) on the row-sharded layout:
    the Y-halo form of :func:`ops.dual_band.dual_band_destripe_batch`.

    Both bands come from ONE row-sharded decomposition
    (:func:`destripe_y_sharded` with ``dual=True``); the blend then runs in
    the plain XLA formulation — per-plane Otsu (or fixed ``threshold``)
    sigmoid fraction, edge-replicated box smooth, band mix — which GSPMD
    partitions over the same row sharding (the box smooth's window crosses
    shard boundaries via the partitioner's own halo exchange; the fused
    Pallas blend kernel is whole-plane-in-VMEM and never selected here).
    The flat-field / wrap epilogue applies to the blended plane, matching
    the plane-sharded dual step (runtime/pipeline.py)."""
    from ..ops.dual_band import blend_bands_xla, check_crossover

    check_crossover(crossover)
    if flat is not None and wrap:
        raise ValueError("flat-field and wrap epilogues are exclusive")
    # paired-or-absent + extent normalization up front — a dark passed
    # without flat must raise here, not be silently dropped
    flat, dark = normalize_flat_dark(plan.height, plan.width, flat, dark)

    b = x.shape[0]
    xf = x.astype(jnp.float32)
    both = destripe_y_sharded(
        x, mesh, plan, consts, halo_arrays, halo_static, axis=axis,
        banded_x_min_w=banded_x_min_w, dual=True,
    )
    fore, back = both[:b], both[b:]

    if not isinstance(threshold, jax.core.Tracer) and threshold >= 0:
        # fixed-threshold config: skip the full-plane Otsu pass entirely
        # (a wasted min/max + 256-bin histogram over a beyond-HBM plane)
        centers = jnp.full((b,), threshold, jnp.float32)
    else:
        if (
            pallas_env.enabled()
            and os.environ.get("DESTRIPE_HALO_PALLAS", "1") != "0"
            and xf.shape[-2] * xf.shape[-1] >= _PALLAS_MIN_PX
        ):
            # row-sharded Pallas histograms + psum (identical binning to
            # the XLA formulation; see _otsu_sharded)
            otsu_centers = _otsu_sharded(xf, mesh, axis, square=False)
        else:
            otsu_centers = threshold_otsu_batch(xf, pallas=False)
        centers = jnp.where(
            threshold < 0, otsu_centers,
            jnp.full_like(otsu_centers, threshold),
        )
    blended = blend_bands_xla(
        xf, fore, back, centers, crossover, smooth_radius
    )

    if flat is not None:
        from ..ops.flatfield import flatfield_correction

        return flatfield_correction(blended, flat, dark)
    if wrap:
        return wrap_cast(blended)
    return blended
