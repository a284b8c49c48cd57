"""
Y-axis (row) halo sharding for the banded DWT passes — the workload's
sequence-parallel analog (SURVEY.md §5 "Long-context / sequence
parallelism"): when a plane is too large for one chip's HBM/VMEM, its rows
are sharded across the mesh and each analysis/synthesis pass exchanges a
halo of boundary rows over ICI instead of gathering the plane.

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

The production pipeline shards over planes (a 1600x2000 plane is ~12.8 MB
— far below HBM), so this path exists for the beyond-HBM geometry case and
as the scaling mechanism the mesh design calls for; exactness is tested on
the 8-device CPU mesh against the unsharded operators.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import wavelets as W

__all__ = [
    "banded_apply_y_sharded",
    "dwt2_y_sharded",
    "idwt2_y_sharded",
    "destripe_y_sharded",
]


def _plan_op_shards(OP: np.ndarray, N: int, D: int):
    """Split a banded (M, N) operator into D row blocks; returns the stacked
    per-device slices, their input-column starts, the global row-gather
    index, the padded block row count, and the halo K.

    Output rows are assigned PROPORTIONALLY (device d gets rows
    [floor(d*M/D), floor((d+1)*M/D))), which keeps each block's input window
    aligned with the device's own input shard for any band slope (stride-2
    analysis, stride-1/2 synthesis) — an even ceil(M/D) split drifts by
    ~2 rows per device and the halo would grow with the device count."""
    M = OP.shape[0]
    assert N % D == 0, f"input rows {N} must divide the mesh axis {D}"
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
    assert K <= Nq, (
        f"halo {K} exceeds shard height {Nq}: too many devices for {N} rows"
    )
    return slices, c0s, row_idx, Mq, K


def banded_apply_y_sharded(
    x: jax.Array,  # (B, N, W), shardable on axis 1
    OP: np.ndarray,  # (M, N) banded operator (numpy, host)
    mesh: Mesh,
    axis: str,
) -> jax.Array:
    """Compute ``OP @ x`` along the row axis with x row-sharded over
    ``mesh[axis]``: halo exchange + one dense per-shard matmul. Returns
    (B, M, W), row-sharded."""
    D = mesh.shape[axis]
    B, N, Wd = x.shape
    M = OP.shape[0]
    OP = np.asarray(OP)
    if N % D:
        # pad input rows to a multiple of the mesh axis; the matching
        # zero operator columns keep the result exact
        N_pad = -(-N // D) * D
        x = jnp.pad(x, [(0, 0), (0, N_pad - N), (0, 0)])
        OP = np.pad(OP, [(0, 0), (0, N_pad - N)])
        N = N_pad
    slices, c0s, row_idx, Mq, K = _plan_op_shards(OP, N, D)
    Nq = N // D
    halo = max(K, 1)  # ppermute payloads must be non-empty

    fwd = [(i, (i + 1) % D) for i in range(D)]
    bwd = [(i, (i - 1) % D) for i in range(D)]

    def local(xl, op_l, c0_l):
        d = jax.lax.axis_index(axis)
        top = jax.lax.ppermute(xl[:, -halo:, :], axis, fwd)  # prev's bottom
        bot = jax.lax.ppermute(xl[:, :halo, :], axis, bwd)  # next's top
        assembled = jnp.concatenate([top, xl, bot], axis=1)
        # assembled covers global rows [d*Nq - halo, (d+1)*Nq + halo)
        start = c0_l[0] - (d * Nq - halo)
        win = jax.lax.dynamic_slice_in_dim(assembled, start, slices.shape[2], 1)
        return jnp.einsum(
            "rw,bwx->brx", op_l[0], win, precision=W._PRECISION
        )

    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(axis, None, None), P(axis)),
        out_specs=P(None, axis, None),
        check_rep=False,
    )(x, jnp.asarray(slices), jnp.asarray(c0s))
    # drop per-block padding rows (proportional blocks may be uneven)
    return out[:, jnp.asarray(row_idx)]


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
        "bhw,ow->bho",
        jnp.concatenate([ca, cv], axis=-1),
        S_x,
        precision=P_,
    )
    hi_y = jnp.einsum(
        "bhw,ow->bho",
        jnp.concatenate([ch, cd], axis=-1),
        S_x,
        precision=P_,
    )

    S_y = W.synthesis_operator(L_yc, wav.name)  # (out_h, 2L_y)
    if out_shape is not None:
        S_y = S_y[: out_shape[0]]
    out = banded_apply_y_sharded(lo_y, S_y[:, :L_yc], mesh, axis)
    out = out + banded_apply_y_sharded(hi_y, S_y[:, L_yc:], mesh, axis)
    return out


def destripe_y_sharded(
    x: jax.Array,  # (B, H, W) float32/uint16, rows shardable over the mesh
    mesh: Mesh,
    sigma: float,
    max_threshold: float,
    wavelet_name: str = "db3",
    axis: str = "z",
) -> jax.Array:
    """Single-level log-space destripe with the ROW axis sharded over the
    mesh (reference filtering.py:139-224 semantics at level=1): sharded
    analysis via halo exchange, per-plane Otsu/median/notch on the
    row-sharded cH band (the per-plane reductions lower to mesh collectives
    through sharding propagation), sharded synthesis. For planes that exceed
    a single chip's memory; the production path shards over planes instead.
    """
    from ..ops import fft_notch
    from ..ops.filter import FilterConfig, _filter_level

    B, H, Wd = x.shape
    xlog = jnp.log(1.0 + x.astype(jnp.float32))
    ca, (ch, cv, cd) = dwt2_y_sharded(xlog, wavelet_name, mesh, axis)

    s = ch.shape[1] * sigma / min(H, Wd)
    bmat = jnp.asarray(
        fft_notch.packed_notch_matrix(ch.shape[2], float(s)).astype(np.float32).T
    )
    bmat_cat = jnp.concatenate([bmat, bmat], axis=1)
    all_cells = jnp.ones((B,), bool)
    ch_f = _filter_level(ch, all_cells, bmat_cat, max_threshold, max_threshold)

    rec = idwt2_y_sharded(ca, (ch_f, cv, cd), wavelet_name, mesh, axis,
                          out_shape=(H, Wd))
    return jnp.exp(rec) + 1.0
