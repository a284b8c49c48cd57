"""Pallas one-hot MXU histogram kernel: interpret-mode equivalence."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
jnp = jax.numpy

from aind_smartspim_destripe_tpu.ops.otsu import (
    histogram_fixed_bins,
    threshold_otsu,
    threshold_otsu_batch,
)
from aind_smartspim_destripe_tpu.ops.pallas_hist import histogram256_batch


@pytest.mark.parametrize("shape", [(2, 16, 128), (3, 13, 130), (1, 64, 100)])
def test_histogram_matches_xla(shape):
    rng = np.random.default_rng(0)
    x = (rng.normal(size=shape) ** 2).astype(np.float32)
    lo = x.reshape(shape[0], -1).min(axis=1)
    hi = x.reshape(shape[0], -1).max(axis=1)
    span = np.where(hi > lo, hi - lo, 1.0)
    got = np.asarray(
        histogram256_batch(jnp.asarray(x), jnp.asarray(lo), jnp.asarray(span),
                           interpret=True)
    )
    for b in range(shape[0]):
        want, _ = histogram_fixed_bins(jnp.asarray(x[b]))
        np.testing.assert_array_equal(got[b], np.asarray(want))
        assert got[b].sum() == x[b].size  # NaN padding contributed nothing


@pytest.mark.parametrize("rows", [8, 24, 64, 1024])
def test_histogram_rows_knob_bit_identical(rows):
    """The tile-rows knob (retuned 8->64 on chip) must not change counts —
    including rows larger than the plane (clamped) and ragged row tails."""
    rng = np.random.default_rng(7)
    x = (rng.normal(size=(2, 52, 130)) ** 2).astype(np.float32)
    lo = x.reshape(2, -1).min(axis=1)
    hi = x.reshape(2, -1).max(axis=1)
    span = np.where(hi > lo, hi - lo, 1.0)
    args = (jnp.asarray(x), jnp.asarray(lo), jnp.asarray(span))
    want = np.asarray(histogram256_batch(*args, rows=8, interpret=True))
    got = np.asarray(histogram256_batch(*args, rows=rows, interpret=True))
    np.testing.assert_array_equal(got, want)
    assert got.sum() == x.size


def test_histogram_narrow_fold_production_level2():
    """The lane-fold fast path (Wp < 1024 planes refolded to 1024-lane rows)
    must keep counts bit-identical at the production level-2 band geometry
    (204 x 254: fold factor 4, ragged rows AND lanes)."""
    rng = np.random.default_rng(5)
    x = rng.normal(scale=3.0, size=(3, 204, 254)).astype(np.float32)
    lo = x.reshape(3, -1).min(axis=1)
    hi = x.reshape(3, -1).max(axis=1)
    span = np.where(hi > lo, hi - lo, 1.0)
    got = np.asarray(
        histogram256_batch(jnp.asarray(x), jnp.asarray(lo), jnp.asarray(span),
                           interpret=True)
    )
    for b in range(3):
        want, _ = histogram_fixed_bins(jnp.asarray(x[b]))
        np.testing.assert_array_equal(got[b], np.asarray(want))
    assert got.sum() == x.size


def test_threshold_otsu_batch_fallback_matches_single():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(4, 32, 40)) ** 2).astype(np.float32)
    got = np.asarray(threshold_otsu_batch(jnp.asarray(x)))
    want = np.asarray(jax.vmap(threshold_otsu)(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_constant_plane():
    x = jnp.full((2, 8, 128), 5.0)
    th = np.asarray(threshold_otsu_batch(x))
    np.testing.assert_allclose(th, [5.0, 5.0])


def test_histogram_square_mode_matches_squared_input():
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.pallas_hist import histogram256_batch

    rng = np.random.default_rng(11)
    x = rng.normal(scale=4.0, size=(3, 21, 203)).astype(np.float32)
    sq = x * x
    lo = np.square(np.abs(x).min(axis=(1, 2)))
    hi = np.square(np.abs(x).max(axis=(1, 2)))
    span = np.where(hi - lo > 0, hi - lo, 1.0).astype(np.float32)
    got = np.asarray(
        histogram256_batch(jnp.asarray(x), jnp.asarray(lo.astype(np.float32)),
                           jnp.asarray(span), square=True, interpret=True)
    )
    want = np.asarray(
        histogram256_batch(jnp.asarray(sq), jnp.asarray(lo.astype(np.float32)),
                           jnp.asarray(span), square=False, interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    assert got.sum(axis=1).tolist() == [21 * 203] * 3  # ragged tails masked


def test_histogram_uint16_ingest_bitexact():
    """Raw uint16 input converts in-kernel (exact) — counts must be
    bit-identical to the f32-cast input, at a ragged lane width (the NaN
    lane poisoning runs on the post-conversion f32 indices) and through
    the narrow-band lane fold (which casts on the XLA side)."""
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.pallas_hist import histogram256_batch

    rng = np.random.default_rng(12)
    for shape in ((2, 37, 301), (2, 50, 200)):  # wide-ragged and folded
        x16 = rng.integers(0, 65536, size=shape, dtype=np.uint16)
        xf = x16.astype(np.float32)
        lo = xf.min(axis=(1, 2))
        span = np.maximum(xf.max(axis=(1, 2)) - lo, 1.0).astype(np.float32)
        got = np.asarray(histogram256_batch(
            jnp.asarray(x16), jnp.asarray(lo), jnp.asarray(span),
            interpret=True,
        ))
        want = np.asarray(histogram256_batch(
            jnp.asarray(xf), jnp.asarray(lo), jnp.asarray(span),
            interpret=True,
        ))
        np.testing.assert_array_equal(got, want, err_msg=f"shape={shape}")
        assert got.sum(axis=1).tolist() == [shape[1] * shape[2]] * shape[0]


def test_threshold_otsu_batch_uint16_matches_f32(monkeypatch):
    """threshold_otsu_batch on raw uint16 (integer range reduce + uncast
    kernel ingest) must be bit-identical to the f32-cast call on both the
    Pallas and the vmapped-XLA paths."""
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(13)
    x16 = rng.integers(0, 5000, size=(3, 40, 260), dtype=np.uint16)
    xf = jnp.asarray(x16.astype(np.float32))
    for pallas in (True, False):
        kw = {"pallas": pallas}
        got = np.asarray(threshold_otsu_batch(jnp.asarray(x16), **kw))
        want = np.asarray(threshold_otsu_batch(xf, **kw))
        np.testing.assert_array_equal(got, want, err_msg=f"pallas={pallas}")
