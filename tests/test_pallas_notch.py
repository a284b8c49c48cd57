"""Fused notch->delta kernel (ops/pallas_notch.py) vs the dense XLA
formulation of _filter_level, in interpreter mode on the CPU backend."""

import numpy as np
import jax.numpy as jnp
import pytest

from aind_smartspim_destripe_tpu.ops import fft_notch
from aind_smartspim_destripe_tpu.ops import pallas_notch as pn


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    B, h, w = 3, 96, 250
    ch = (rng.normal(size=(B, h, w)) * 2.0).astype(np.float32)
    bc = fft_notch.packed_notch_matrix(w, 12.0).astype(np.float32)
    bn = fft_notch.packed_notch_matrix(w, 40.0).astype(np.float32)
    thr = np.array([1.5, 0.8, 2.5], np.float32)
    sel = np.array([0, 1, 0], np.int32)  # cells, no-cells, cells
    return ch, bc, bn, thr, sel


def _dense_delta(ch, bc, bn, thr, sel):
    """Float64 reference of the fused kernel's contract."""
    out = np.empty_like(ch, dtype=np.float64)
    for b in range(ch.shape[0]):
        x = ch[b].astype(np.float64)
        stripes = np.sqrt(
            (ch[b] * ch[b]).astype(np.float32)
        ).astype(np.float64) > thr[b]
        bg = np.where(stripes, 0.0, x)
        med = np.median(bg, axis=-1, keepdims=True)
        inp = np.where(stripes, med, x)
        op = (bc if sel[b] == 0 else bn).astype(np.float64)
        filt = inp @ op.T
        out[b] = np.where(stripes, 0.0, filt - x)
    return out


def test_stacked_operators_reconstruct(case):
    ch, bc, bn, thr, sel = case
    hi, lo = pn.stacked_notch_operators(bc, bn)
    w = bc.shape[0]
    rec = hi.astype(np.float64) + lo.astype(np.float64)
    # hi/lo bf16 reconstruction is exact to ~2^-16 relative
    np.testing.assert_allclose(rec[0, :w, :w], bc.T, atol=3e-5)
    np.testing.assert_allclose(rec[1, :w, :w], bn.T, atol=3e-5)
    assert np.all(rec[:, w:, :] == 0) and np.all(rec[:, :, w:] == 0)


def test_notch_delta_inkernel_median(case):
    """med_raw=None computes the masked row medians in-kernel — results
    must be IDENTICAL to passing the precomputed median array."""
    ch, bc, bn, thr, sel = case
    from aind_smartspim_destripe_tpu.ops.pallas_median import (
        row_median_masked,
    )

    ops = pn.stacked_notch_operators(bc, bn)
    med_raw = row_median_masked(
        jnp.asarray(ch), jnp.asarray(thr), interpret=True, raw=True
    )
    with_med = np.asarray(pn.notch_delta(
        jnp.asarray(ch), med_raw, jnp.asarray(thr), jnp.asarray(sel),
        ops, interpret=True,
    ))
    inkernel = np.asarray(pn.notch_delta(
        jnp.asarray(ch), None, jnp.asarray(thr), jnp.asarray(sel),
        ops, interpret=True,
    ))
    np.testing.assert_array_equal(with_med, inkernel)


def test_notch_delta_matches_dense(case):
    ch, bc, bn, thr, sel = case
    from aind_smartspim_destripe_tpu.ops.pallas_median import (
        row_median_masked,
    )

    ops = pn.stacked_notch_operators(bc, bn)
    med_raw = row_median_masked(
        jnp.asarray(ch), jnp.asarray(thr), interpret=True, raw=True
    )
    got = pn.notch_delta(
        jnp.asarray(ch), med_raw, jnp.asarray(thr), jnp.asarray(sel),
        ops, interpret=True,
    )
    want = _dense_delta(ch, bc, bn, thr, sel)
    assert got.shape == ch.shape and got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
    # masked (stripe) pixels must be exactly zero, not approximately
    stripes = np.abs(ch) > thr[:, None, None]
    assert np.all(np.asarray(got)[stripes] == 0.0)


def test_notch_select_chunked_matches_dense(case):
    """Chunked per-plane selection == the dense x @ op[sel] product (the
    halo route's replacement for the compute-both-bands matmul)."""
    ch, bc, bn, thr, sel = case
    ops = pn.stacked_notch_operators(bc, bn)
    got = np.asarray(pn.notch_select_chunked(
        jnp.asarray(ch), jnp.asarray(sel), ops, interpret=True,
    ))
    want = np.stack([
        ch[b].astype(np.float64)
        @ (bc if sel[b] == 0 else bn).astype(np.float64).T
        for b in range(ch.shape[0])
    ])
    assert got.shape == ch.shape and got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_notch_select_chunked_tile_invariance(case):
    """Every output tile is ONE full-contraction dot, so results must be
    bit-identical across any (rows_tile, col_tile) choice."""
    ch, bc, bn, thr, sel = case
    ops = pn.stacked_notch_operators(bc, bn)
    a = np.asarray(pn.notch_select_chunked(
        jnp.asarray(ch), jnp.asarray(sel), ops,
        rows_tile=32, col_tile=128, interpret=True,
    ))
    b = np.asarray(pn.notch_select_chunked(
        jnp.asarray(ch), jnp.asarray(sel), ops,
        rows_tile=96, col_tile=256, interpret=True,
    ))
    np.testing.assert_array_equal(a, b)


def test_notch_select_chunked_lane_aligned():
    """Width already a lane multiple (no in-kernel pad masking path)."""
    rng = np.random.default_rng(3)
    B, h, w = 2, 64, 256
    ch = (rng.normal(size=(B, h, w)) * 2.0).astype(np.float32)
    bc = fft_notch.packed_notch_matrix(w, 10.0).astype(np.float32)
    bn = fft_notch.packed_notch_matrix(w, 30.0).astype(np.float32)
    sel = np.array([1, 0], np.int32)
    ops = pn.stacked_notch_operators(bc, bn)
    got = np.asarray(pn.notch_select_chunked(
        jnp.asarray(ch), jnp.asarray(sel), ops, interpret=True,
    ))
    want = np.stack([
        ch[b].astype(np.float64)
        @ (bc if sel[b] == 0 else bn).astype(np.float64).T
        for b in range(B)
    ])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
